"""Baseline JPEG codec (sources/jpeg.py): bitstream structure,
roundtrip PSNR, determinism, edge shapes, and the end-to-end
MJPEG-in-AVI video lane (real container + real codec -> pixels)."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from proj_spark.sources.images import (
    decode_image,
    encode_image,
    psnr_db,
    synth_pixels,
)
from proj_spark.sources.jpeg import (
    _UNZZ,
    _ZZ,
    decode_jpeg,
    encode_jpeg,
)


def test_roundtrip_psnr_above_contract():
    """input_hint gate: lossy decode within PSNR >= 40 dB (q98 lands
    ~43.6 on the high-noise fixtures, 3+ dB of margin)."""
    for idx in range(30):
        px = synth_pixels(idx, 32, 32)
        assert psnr_db(px, decode_jpeg(encode_jpeg(px))) >= 40.0


def test_encoder_is_deterministic():
    px = synth_pixels(11, 32, 32)
    assert encode_jpeg(px) == encode_jpeg(px)


def test_marker_structure_is_jfif():
    """The stream must be a standard JFIF file: SOI, APP0('JFIF'),
    DQT, SOF0, DHT, SOS markers in order, EOI last — openable by any
    stock JPEG reader."""
    data = encode_jpeg(synth_pixels(0, 16, 16))
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
    markers = []
    pos = 2
    while pos < len(data) - 2:
        assert data[pos] == 0xFF
        m = data[pos + 1]
        markers.append(m)
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        if m == 0xDA:  # SOS: entropy data follows
            break
        pos += 2 + ln
    assert markers[:2] == [0xE0, 0xDB]
    assert 0xC0 in markers and markers.count(0xC4) == 4 and markers[-1] == 0xDA


def test_zigzag_is_the_standard_permutation():
    # spot-check the spec's published first/last entries
    assert _ZZ[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert _ZZ[-6:].tolist() == [61, 54, 47, 55, 62, 63]
    assert sorted(_ZZ.tolist()) == list(range(64))
    assert (_ZZ[_UNZZ] == np.arange(64)).all()


def test_odd_dimensions_and_grayscale():
    for w, h in [(17, 13), (5, 5), (1, 1), (33, 80), (64, 48)]:
        px = synth_pixels(3, w, h)
        dec = decode_jpeg(encode_jpeg(px))
        assert dec.shape == (h, w, 3)
        assert psnr_db(px, dec) >= 38.0  # tiny images amortize less
    g = synth_pixels(9, 24, 24)[:, :, 0]
    dg = decode_jpeg(encode_jpeg(g))
    assert dg.shape == g.shape and psnr_db(g, dg) >= 38.0


def test_subsampled_modes_roundtrip():
    """4:2:2 / 4:2:0 (what stock encoders emit): smooth content decodes
    at high fidelity; shapes survive non-MCU-aligned dims; grayscale is
    unaffected by the chroma mode."""
    yy, xx = np.mgrid[0:40, 0:56]
    smooth = np.stack(
        [np.clip(xx * 3, 0, 255), np.clip(yy * 4, 0, 255), np.clip(xx + yy, 0, 255)],
        axis=-1,
    ).astype(np.uint8)
    for mode, floor in (("444", 50.0), ("422", 45.0), ("420", 42.0)):
        data = encode_jpeg(smooth, 95, subsampling=mode)
        dec = decode_jpeg(data)
        assert dec.shape == smooth.shape
        assert psnr_db(smooth, dec) >= floor, mode
        assert data == encode_jpeg(smooth, 95, subsampling=mode)  # deterministic
    # odd, non-MCU-aligned dims keep their shape through 2x2 sampling
    px = synth_pixels(1, 33, 47)
    assert decode_jpeg(encode_jpeg(px, 98, subsampling="420")).shape == (47, 33, 3)
    g = synth_pixels(2, 20, 20)[:, :, 0]
    assert psnr_db(g, decode_jpeg(encode_jpeg(g, 98, subsampling="420"))) >= 38.0
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(px, 98, subsampling="411")


def test_restart_markers_roundtrip():
    """DRI/RSTn streams (what camera MJPEG emits): decoded pixels are
    bit-identical to the same image coded without restarts, for
    intervals splitting at every MCU, mid-stream, and past the end."""
    px = synth_pixels(3, 48, 40)  # 30 MCUs at 4:4:4
    plain = decode_jpeg(encode_jpeg(px, 98))
    for ri in (1, 2, 7, 30, 100):
        data = encode_jpeg(px, 98, restart_interval=ri)
        if ri < 30:
            assert b"\xff\xdd" in data  # DRI present
        assert np.array_equal(decode_jpeg(data), plain), f"ri={ri}"
    # restarts compose with subsampling
    px2 = synth_pixels(9, 64, 48)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(px2, 95, subsampling="420", restart_interval=3)),
        decode_jpeg(encode_jpeg(px2, 95, subsampling="420")),
    )


def test_flat_image_near_exact():
    flat = np.full((16, 16, 3), 128, np.uint8)
    assert psnr_db(flat, decode_jpeg(encode_jpeg(flat))) >= 50.0


def test_decoder_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    # progressive (SOF2) must be rejected, not mis-decoded
    data = bytearray(encode_jpeg(synth_pixels(0, 8, 8)))
    idx = data.find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(data))


def test_decode_image_sniffs_real_jpeg_and_legacy_ljpg():
    from proj_spark.sources.images import encode_ljpg

    px = synth_pixels(4, 32, 32)
    real = encode_image(px, "jpeg")
    assert real[:2] == b"\xff\xd8"
    assert psnr_db(px, decode_image(real, "jpeg")) >= 40.0
    legacy = encode_ljpg(px)
    assert psnr_db(px, decode_image(legacy, "jpeg")) >= 40.0


def test_decoder_never_hangs_on_mutations():
    """Robustness: truncations and byte flips of a valid stream either
    decode to SOME image or raise promptly (ValueError / struct or
    index errors) — never hang or crash the interpreter.  Deterministic
    mutation schedule, no RNG."""
    base = encode_jpeg(synth_pixels(7, 24, 24), 95)
    candidates = []
    for cut in range(1, len(base), max(len(base) // 23, 1)):  # truncations
        candidates.append(base[:cut])
    for pos in range(2, len(base), max(len(base) // 37, 1)):  # bit flips
        mutated = bytearray(base)
        mutated[pos] ^= 0x5A
        candidates.append(bytes(mutated))
    survived = 0
    for data in candidates:
        try:
            px = decode_jpeg(data)
            assert px.dtype == np.uint8
            survived += 1
        except (ValueError, IndexError):
            # the two controlled failure modes: explicit validation
            # (ValueError) or running off the bit/byte arrays
            # (IndexError).  Anything else is a real bug.
            pass
    # flips landing in entropy data still decode (garbage pixels are
    # fine — lossy garbage in, garbage out); structural damage raises
    assert 0 < survived < len(candidates)


def test_mjpeg_avi_lane_end_to_end(spark):
    """The video lane, fully real: JPEG-encode frames, wrap in a real
    RIFF/AVI container, sample via the Spark operator, decode the
    sampled MJPEG payloads back to pixels within the PSNR gate."""
    from proj_spark.operators.multimodal import sample_frames
    from proj_spark.sources.avi import write_avi_mjpeg

    src = [synth_pixels(i, 16, 16) for i in range(12)]
    payload = write_avi_mjpeg([encode_jpeg(f) for f in src], 16, 16)
    df = spark.createDataFrame([Row(media_id="m0", bytes=payload, fmt="avi")])
    out = sample_frames(df, every_n=5).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in out] == [0, 5, 10]
    for r in out:
        assert r.fmt == "mjpg"
        dec = decode_image(bytes(r.bytes), r.fmt)
        assert dec.shape == (16, 16, 3)
        assert psnr_db(src[r.frame_idx], dec) >= 40.0
