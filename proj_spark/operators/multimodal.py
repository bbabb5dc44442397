"""Multimodal (image/audio/video) column operators.

Binary payloads stay opaque through shuffles (SURVEY.md §1.2) and are
decoded only inside Arrow-batched UDFs.  The PNG, baseline JPEG
(ITU-T T.81, sources/jpeg.py), WAV/PCM16 audio (sources/audio.py),
and RIFF/AVI container (sources/avi.py) codecs are all real —
standard formats any reader opens; the MJPEG-in-AVI video lane is
decodable to pixels end-to-end.  Video codecs that genuinely need
native libraries absent from this container (H.264 etc.) raise
NotImplementedError at the single decode call site — the Spark-side
plumbing (schemas, batching, partitioning) is real and tested either
way.

Scale notes:
- all operators are narrow mapInPandas passes: parallelism = input
  partitions, no shuffle; the bytes column never moves twice (join on
  ids first, re-attach payloads last — SURVEY.md §7 'what's hard' e).
- output images are re-encoded with the same codec family so payload
  invariants (PSNR gate) remain checkable downstream.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.images import (
    average_phash,
    decode_image,
    encode_image,
    encode_png,
)

_FEAT_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("luma_hist", ArrayType(LongType())),
        StructField("phash", LongType()),
        StructField("edge_energy", DoubleType()),
    ]
)


def extract_features(df: DataFrame, bits_hist: int = 16) -> DataFrame:
    """Decode each payload and emit vectorized image features: channel
    means, a luma histogram, the perceptual hash, and a gradient
    energy score (the 'feature-extract' stage of a curation pipeline).
    """

    luma_w = np.array([0.299, 0.587, 0.114])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            # per-image decode is inherently a Python loop (variable
            # shapes), but iterate raw column arrays — iterrows builds
            # a Series per row and was the measured drag (round-2
            # review); the numpy math below is vectorized per image
            for iid, raw, fmt in zip(
                b["image_id"].to_numpy(),
                b["bytes"].to_numpy(),
                b["fmt"].to_numpy(),
            ):
                px = decode_image(raw, fmt).astype(np.float64)
                luma = px @ luma_w
                hist = np.histogram(luma, bins=bits_hist, range=(0, 256))[0]
                gy, gx = np.gradient(luma)
                out.append(
                    (
                        iid,
                        float(px[:, :, 0].mean()),
                        float(px[:, :, 1].mean()),
                        float(px[:, :, 2].mean()),
                        hist.tolist(),
                        average_phash(px.astype(np.uint8)),
                        float(np.sqrt(gx * gx + gy * gy).mean()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "image_id", "mean_r", "mean_g", "mean_b",
                    "luma_hist", "phash", "edge_energy",
                ],
            )

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, _FEAT_SCHEMA)


_RESIZE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, re-encoded with the input's codec
    family (the standard thumbnailing stage)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for iid, raw, fmt in zip(
                b["image_id"].to_numpy(),
                b["bytes"].to_numpy(),
                b["fmt"].to_numpy(),
            ):
                px = decode_image(raw, fmt)
                h, w, _ = px.shape
                yi = np.clip((np.arange(out_h) * h) // out_h, 0, h - 1)
                xi = np.clip((np.arange(out_w) * w) // out_w, 0, w - 1)
                small = px[np.ix_(yi, xi)]
                data = encode_image(small, fmt)
                out.append((iid, data, out_w, out_h, fmt))
            yield pd.DataFrame(out, columns=["image_id", "bytes", "w", "h", "fmt"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, _RESIZE_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("bytes", BinaryType()),
        StructField("fmt", StringType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling — every ``every_n``-th frame as a row.

    Two real container formats:
    - ``avi``: true RIFF/AVI parsing (``sources/avi.py``, pure-python,
      public spec) — extracts the compressed frame payloads of the
      video stream (e.g. MJPEG bitstreams) with their codec fourcc as
      the output fmt.  MJPEG frames ('mjpg') decode to pixels via the
      real baseline JPEG decoder (``sources/jpeg.py``) through
      ``decode_image``; other codecs (H.264 etc.) raise there.
    - ``fakevid``: the deterministic test container (length-prefixed
      PNG frames), fully decodable end-to-end.
    Any other fmt raises NotImplementedError (explicit stub per the
    build brief).
    """
    import struct

    from ..sources.avi import read_avi_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for mid, data, fmt in zip(
                b["media_id"].to_numpy(),
                b["bytes"].to_numpy(),
                b["fmt"].to_numpy(),
            ):
                if fmt == "avi":
                    for idx, frame, codec in read_avi_frames(bytes(data)):
                        if idx % every_n == 0:
                            out.append((mid, idx, frame, codec))
                    continue
                if fmt != "fakevid":
                    raise NotImplementedError(
                        f"video codec {fmt!r} requires libav/ffmpeg "
                        "(not available in this container)"
                    )
                pos = 0
                idx = 0
                while pos < len(data):
                    (ln,) = struct.unpack_from(">I", data, pos)
                    frame = data[pos + 4 : pos + 4 + ln]
                    if idx % every_n == 0:
                        out.append((mid, idx, bytes(frame), "png"))
                    pos += 4 + ln
                    idx += 1
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "bytes", "fmt"])

    return df.select("media_id", "bytes", "fmt").mapInPandas(run, _FRAME_SCHEMA)


def make_fakevid(frames: list[np.ndarray]) -> bytes:
    """Build a 'fakevid' payload: length-prefixed PNG frames."""
    import struct

    parts = []
    for px in frames:
        data = encode_png(px)
        parts.append(struct.pack(">I", len(data)) + data)
    return b"".join(parts)


def phash_dedup_pairs(
    df: DataFrame, max_hamming: int = 6, pair_cap: int = 10000
) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual-hash hamming distance.

    Buckets by the 4 x 16-bit phash quarters (pigeonhole: exact-quarter
    matching guarantees recall for hamming <= 3; the standard trade at
    corpus scale), verifies with bit_count.  Per-(quarter, bucket)
    MEMBERSHIP is capped at ``pair_cap`` by id order, so one bucket
    emits at most pair_cap*(pair_cap-1)/2 pairs — bounded, but
    quadratic in the cap (the default 10000 allows ~5e7 pairs from one
    degenerate bucket).  Size pair_cap to the pair budget of the run;
    for radius-0 (exact perceptual duplicate) clustering use
    :func:`exact_phash_pairs` instead — it is O(n) and exact.  Native
    expressions; no Python.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    q = [
        (F.shiftrightunsigned(F.col("phash"), 16 * i).bitwiseAND(F.lit(0xFFFF))).alias(
            f"q{i}"
        )
        for i in range(4)
    ]
    s = df.select(F.col("image_id").alias("id"), F.col("phash").alias("sig"), *q)
    exploded = None
    for i in range(4):
        e = s.select(
            F.lit(i).alias("band"), F.col(f"q{i}").alias("bk"),
            F.col("id"), F.col("sig"),
        )
        exploded = e if exploded is None else exploded.unionByName(e)
    w = Window.partitionBy("band", "bk").orderBy("id")
    exploded = exploded.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= pair_cap
    )
    a = exploded.select("band", "bk", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = exploded.select("band", "bk", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, on=["band", "bk"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def exact_phash_pairs(df: DataFrame) -> DataFrame:
    """Exact perceptual-duplicate pairs (hamming == 0) as STAR edges:
    per identical phash, (min image_id, other member) — O(n) output
    where the within-bucket pair join is O(n^2/buckets).  For
    connected-components clustering a star is equivalent to the clique
    at radius 0 (every member connects to the hub, so the component is
    identical); pairwise hamming beyond the hub is trivially 0, so no
    information is lost.  This is the generator a thumbnail-farm
    corpus needs — one hash shared by 10^6 rows emits 10^6-1 edges,
    not 5*10^11."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("phash")
    hub = F.min("image_id").over(w)
    return (
        df.select("image_id", "phash")
        .withColumn("id_a", hub)
        .where(F.col("id_a") != F.col("image_id"))
        .select(
            "id_a",
            F.col("image_id").alias("id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )


_QUALITY_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("blur_var", DoubleType()),
        StructField("contrast", DoubleType()),
        StructField("entropy_bits", DoubleType()),
        StructField("saturation", DoubleType()),
    ]
)


def image_quality(df: DataFrame) -> DataFrame:
    """Per-image quality signals for curation gating (the image-side
    analog of text quality_score — the classic pre-training filters):

    - ``blur_var``: variance of the 4-neighbor Laplacian of luma (the
      standard blur detector — low variance = soft/blurry; LAION-style
      pipelines gate on it)
    - ``contrast``: luma standard deviation
    - ``entropy_bits``: Shannon entropy of the 256-bin luma histogram
      (near-0 for flat/synthetic fills, ~7.5+ for natural content)
    - ``saturation``: mean of (max(R,G,B) - min(R,G,B)) — near-0 flags
      grayscale or washed-out content

    Narrow mapInPandas, per-image numpy; no shuffle."""
    luma_w = np.array([0.299, 0.587, 0.114])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for iid, raw, fmt in zip(
                b["image_id"].to_numpy(),
                b["bytes"].to_numpy(),
                b["fmt"].to_numpy(),
            ):
                px = decode_image(raw, fmt).astype(np.float64)
                luma = px @ luma_w
                lap = (
                    4.0 * luma[1:-1, 1:-1]
                    - luma[:-2, 1:-1]
                    - luma[2:, 1:-1]
                    - luma[1:-1, :-2]
                    - luma[1:-1, 2:]
                )
                hist = np.histogram(luma, bins=256, range=(0.0, 256.0))[0]
                p = hist[hist > 0] / hist.sum()
                out.append(
                    (
                        iid,
                        float(lap.var()) if lap.size else 0.0,
                        float(luma.std()),
                        float(-(p * np.log2(p)).sum()),
                        float((px.max(axis=2) - px.min(axis=2)).mean()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "image_id", "blur_var", "contrast", "entropy_bits", "saturation",
                ],
            )

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, _QUALITY_SCHEMA)


_AUDIO_FEAT_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("energy", LongType()),
        StructField("peak", LongType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_features(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Decode WAV payloads (REAL RIFF/PCM16 codec, sources/audio.py)
    and emit integer-exact features: total energy (sum of squared
    samples), peak amplitude, strict-sign zero crossings, duration.

    Integer features mean the values are engine-reproducible to the
    bit — the DuckDB oracle recomputes them from the generator
    formula with BIGINT math.  Narrow mapInPandas pass; the payload
    column never shuffles."""
    from ..sources.audio import decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            mids = b["media_id"].to_numpy()
            blobs = b[bytes_col].to_numpy()
            rows = []
            for mid, blob in zip(mids, blobs):
                rate, pcm = decode_wav(bytes(blob))
                s = pcm.astype(np.int64)
                rows.append(
                    (
                        mid,
                        rate,
                        s.shape[0],
                        s.shape[0] * 1000 // rate,
                        int((s * s).sum()),
                        int(np.abs(s).max(initial=0)),
                        int(((s[1:] * s[:-1]) < 0).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "rate",
                    "n_samples",
                    "duration_ms",
                    "energy",
                    "peak",
                    "zero_crossings",
                ],
            )

    return df.select("media_id", bytes_col).mapInPandas(run, _AUDIO_FEAT_SCHEMA)


_AUDIO_OUT_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


def resample_audio(df: DataFrame, out_rate: int, bytes_col: str = "bytes") -> DataFrame:
    """Linear-interpolation resample to ``out_rate``, re-encoded as
    WAV so downstream decode invariants keep holding.  Same narrow
    shape as resize_images: decode -> numpy -> re-encode per batch."""
    from ..sources.audio import decode_wav, encode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"].to_numpy(), b[bytes_col].to_numpy()):
                rate, pcm = decode_wav(bytes(blob))
                n_out = max(int(round(pcm.shape[0] * out_rate / rate)), 1)
                t_out = np.arange(n_out, dtype=np.float64) * (rate / out_rate)
                res = np.interp(
                    t_out, np.arange(pcm.shape[0], dtype=np.float64), pcm
                )
                out = np.clip(np.rint(res), -32768, 32767).astype(np.int16)
                rows.append(
                    (mid, encode_wav(out, out_rate), out_rate, n_out, "wav")
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "bytes", "rate", "n_samples", "fmt"]
            )

    return df.select("media_id", bytes_col).mapInPandas(run, _AUDIO_OUT_SCHEMA)


_AUGMENT_OPS = ("hflip", "vflip", "rot90", "rot180", "rot270", "crop_center")


def augment_images(
    df: DataFrame,
    op: str = "hflip",
    crop_frac: float = 0.75,
) -> DataFrame:
    """Deterministic image augmentation over the REAL codecs (decode
    -> numpy view transform -> re-encode with the input's codec
    family): horizontal/vertical flip, k*90-degree rotation, center
    crop.  Same narrow mapInPandas shape as resize_images — payloads
    never shuffle, parallelism = input partitions.  Determinism
    matters for resumability: re-running a partition reproduces
    identical augmented bytes."""
    if op not in _AUGMENT_OPS:
        raise ValueError(f"op {op!r} not in {_AUGMENT_OPS}")
    if not 0.0 < crop_frac <= 1.0:
        raise ValueError(
            f"crop_frac {crop_frac} outside (0, 1] — a frac > 1 would "
            "silently wrap to a negative slice offset"
        )

    def _apply(px: np.ndarray) -> np.ndarray:
        if op == "hflip":
            return px[:, ::-1]
        if op == "vflip":
            return px[::-1, :]
        if op == "rot90":
            return np.rot90(px, 1)
        if op == "rot180":
            return np.rot90(px, 2)
        if op == "rot270":
            return np.rot90(px, 3)
        h, w, _ = px.shape
        ch, cw = max(int(h * crop_frac), 1), max(int(w * crop_frac), 1)
        y0, x0 = (h - ch) // 2, (w - cw) // 2
        return px[y0 : y0 + ch, x0 : x0 + cw]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for iid, raw, fmt in zip(
                b["image_id"].to_numpy(),
                b["bytes"].to_numpy(),
                b["fmt"].to_numpy(),
            ):
                px = _apply(decode_image(raw, fmt))
                px = np.ascontiguousarray(px)
                data = encode_image(px, fmt)
                out.append((iid, data, px.shape[1], px.shape[0], fmt))
            yield pd.DataFrame(out, columns=["image_id", "bytes", "w", "h", "fmt"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, _RESIZE_SCHEMA)
