"""Synthetic audio table + REAL WAV (RIFF PCM16) codec plumbing.

Mirrors ``sources/images.py``: payloads are deterministic
f(media_id) so any partition regenerates independently and payload
invariants are checkable without storing originals; the codec is a
real container format — these bytes open in any standard WAV reader
(stdlib ``wave`` included) — built here with struct+numpy because the
container ships no audio libraries.

Schema produced by ``generate_audio``: media_id:string, bytes:binary
(RIFF/WAVE, PCM16 mono), rate:int, n_samples:int, fmt:string('wav').

The waveform is an integer LCG sequence
    s_k = ((A * (seed + 1) + B * k) mod 65536) - 32768
— pure int64 math, so decoded-sample invariants (energy, peak,
zero crossings) are EXACTLY reproducible by any engine with 64-bit
integers (the DuckDB oracle recomputes them from the same formula; no
float transcendentals to drift by an ulp).

All per-row work runs vectorized inside mapInPandas (Arrow batches):
generation is spark.range -> mapInPandas, executor-evaluated, no
driver loop.
"""
from __future__ import annotations

import struct
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# LCG waveform constants (shared with the SQL oracle in
# __spark_entry__._audio_features_oracle — keep in sync)
PCM_A = 2654435761
PCM_B = 40503


def synth_pcm(seed: int, n: int) -> np.ndarray:
    """Deterministic int16 mono waveform of length n for ``seed``."""
    k = np.arange(n, dtype=np.int64)
    v = (PCM_A * (np.int64(seed) + 1) + PCM_B * k) % 65536 - 32768
    return v.astype(np.int16)


def encode_wav(pcm: np.ndarray, rate: int) -> bytes:
    """int16 mono samples -> a standard RIFF/WAVE PCM16 file."""
    if pcm.dtype != np.int16:
        raise ValueError(f"encode_wav wants int16 samples, got {pcm.dtype}")
    data = pcm.tobytes()  # little-endian on all supported platforms
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ",
        16,  # PCM fmt chunk size
        1,  # audio format: PCM
        1,  # channels: mono
        rate,
        rate * 2,  # byte rate = rate * block align
        2,  # block align = channels * 16/8
        16,  # bits per sample
    )
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(b: bytes) -> Tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 mono -> (rate, int16 samples).

    Walks the chunk list (so readers that insert e.g. LIST chunks
    still parse); validates the magic, PCM format, mono, 16-bit."""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = None
    pcm = None
    while pos + 8 <= len(b):
        tag, size = struct.unpack_from("<4sI", b, pos)
        pos += 8
        if tag == b"fmt ":
            afmt, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", b, pos)
            if afmt != 1 or ch != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: format={afmt} channels={ch} bits={bits}"
                )
        elif tag == b"data":
            pcm = np.frombuffer(b, dtype="<i2", count=size // 2, offset=pos)
        pos += size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    return int(rate), pcm


def audio_for_ids(
    ids: DataFrame,
    rate: int = 8000,
    n_samples_of=lambda i: 4000 + (i % 5) * 2000,
    id_col: str = "id",
) -> DataFrame:
    """Deterministic audio rows for an arbitrary long-id column:
    media_id ('a' + zero-padded id), bytes (real WAV), rate,
    n_samples, fmt.  Executor-parallel mapInPandas over ``ids``."""
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("bytes", BinaryType()),
            StructField("rate", IntegerType()),
            StructField("n_samples", IntegerType()),
            StructField("fmt", StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b[id_col].to_numpy():
                ns = int(n_samples_of(int(i)))
                wav = encode_wav(synth_pcm(int(i), ns), rate)
                rows.append((f"a{int(i):09d}", wav, rate, ns, "wav"))
            yield pd.DataFrame(
                rows, columns=["media_id", "bytes", "rate", "n_samples", "fmt"]
            )

    return ids.select(id_col).mapInPandas(gen, schema)


def generate_audio(
    spark: SparkSession,
    n: int,
    rate: int = 8000,
    n_samples_of=lambda i: 4000 + (i % 5) * 2000,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic audio table over ids 0..n-1 (see audio_for_ids)."""
    rng = spark.range(n, numPartitions=partitions) if partitions else spark.range(n)
    return audio_for_ids(rng, rate=rate, n_samples_of=n_samples_of)
