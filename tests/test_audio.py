"""WAV codec + audio operators (sources/audio.py, operators/multimodal.py)."""
from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from proj_spark.operators.multimodal import audio_features, resample_audio
from proj_spark.sources.audio import (
    decode_wav,
    encode_wav,
    generate_audio,
    synth_pcm,
)


def test_wav_is_a_real_wav_file():
    """The stdlib wave reader (an independent RIFF parser) must open
    our bytes — proving the codec is the real container format."""
    pcm = synth_pcm(7, 1234)
    blob = encode_wav(pcm, 8000)
    with wave.open(io.BytesIO(blob)) as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == 8000
        assert w.getnframes() == 1234
        frames = np.frombuffer(w.readframes(1234), dtype="<i2")
    assert (frames == pcm).all()


def test_roundtrip_and_chunk_walk():
    pcm = synth_pcm(3, 999)  # odd length exercises word-alignment
    rate, got = decode_wav(encode_wav(pcm, 44100))
    assert rate == 44100 and (got == pcm).all()
    # an extra chunk between fmt and data must be skipped
    blob = bytearray(encode_wav(pcm, 8000))
    extra = b"LIST" + (5).to_bytes(4, "little") + b"abcde\x00"  # padded
    insert_at = 12 + 8 + 16  # after fmt chunk
    patched = bytes(blob[:insert_at]) + extra + bytes(blob[insert_at:])
    patched = (
        patched[:4]
        + (len(patched) - 8).to_bytes(4, "little")
        + patched[8:]
    )
    rate, got = decode_wav(patched)
    assert rate == 8000 and (got == pcm).all()


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")
    # stereo is unsupported -> clear error, not silence
    pcm = synth_pcm(1, 100)
    blob = bytearray(encode_wav(pcm, 8000))
    blob[22] = 2  # channels field
    with pytest.raises(ValueError):
        decode_wav(bytes(blob))


def test_audio_features_integer_exact(spark):
    df = generate_audio(spark, 6, rate=8000)
    feats = {r.media_id: r for r in audio_features(df).collect()}
    assert len(feats) == 6
    for i in range(6):
        s = synth_pcm(i, 4000 + (i % 5) * 2000).astype(np.int64)
        r = feats[f"a{i:09d}"]
        assert r.rate == 8000
        assert r.n_samples == s.shape[0]
        assert r.duration_ms == s.shape[0] * 1000 // 8000
        assert r.energy == int((s * s).sum())
        assert r.peak == int(np.abs(s).max())
        assert r.zero_crossings == int(((s[1:] * s[:-1]) < 0).sum())


def test_resample_halves_and_identity(spark):
    df = generate_audio(spark, 2, rate=8000)
    down = {r.media_id: r for r in resample_audio(df, 4000).collect()}
    for r in down.values():
        assert r.rate == 4000 and r.fmt == "wav"
    src = {r.media_id: r for r in df.collect()}
    for mid, r in down.items():
        assert r.n_samples == round(src[mid].n_samples / 2)
        # output decodes again (re-encoded real WAV)
        rate, pcm = decode_wav(bytes(r.bytes))
        assert rate == 4000 and pcm.shape[0] == r.n_samples
    # identity resample reproduces the exact samples
    same = resample_audio(df, 8000).collect()
    for r in same:
        _, pcm = decode_wav(bytes(r.bytes))
        _, orig = decode_wav(bytes(src[r.media_id].bytes))
        assert (pcm == orig).all()


def test_resample_preserves_linear_ramp():
    ramp = np.linspace(-1000, 1000, 101).astype(np.int16)
    blob = encode_wav(ramp, 1000)
    # in-process check of the same interp the operator applies
    rate, pcm = decode_wav(blob)
    t = np.arange(201, dtype=np.float64) * (rate / 2000)
    res = np.interp(t, np.arange(101, dtype=np.float64), pcm)
    assert abs(res[100] - pcm[50]) <= 1  # midpoint hits the source sample
