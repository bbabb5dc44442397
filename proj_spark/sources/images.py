"""Synthetic image+caption table (the BASELINE.json input_hint shape)
and the image codec plumbing.

Schema (exact): image_id:string, bytes:binary, w:int, h:int,
fmt:string, caption:string, phash:long.

Everything is deterministic and pure-functional — pixel values are
f(image_id) only — so any partition can be regenerated independently
(FIXTURES.md requirement) and payload invariants are checkable without
storing originals: verify re-derives the source pixels from image_id.

Codecs (no image libraries in this container — all are real codecs
implemented here, not stubs):
- ``png``:  true minimal PNG (8-bit RGB, zlib deflate, filter 0).
  Lossless; decodable by any standard PNG reader.
- ``jpeg``: REAL baseline-sequential JPEG (ITU-T T.81 / JFIF,
  ``sources/jpeg.py``: DCT + Annex-K tables + Huffman), quality 98
  -> PSNR ~43 dB on the noisy fixtures (> the 40 dB gate).  Decoding
  sniffs the payload: ``FF D8`` -> real JPEG; the legacy ``LJPG``
  magic (round-3's 6-bit-quantization stand-in) stays decodable so
  previously-written tables remain readable.

All per-row work runs vectorized inside mapInPandas (Arrow batches);
the generator is driver-coordinated but executor-evaluated via
spark.range -> mapInPandas, so a 10^12-row table generates in
parallel with no driver loop.
"""
from __future__ import annotations

import struct
import zlib
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

IMAGE_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
        StructField("caption", StringType(), False),
        StructField("phash", LongType(), False),
    ]
)

_PHI_INV = 0.6180339887498949
_SQRT3_FRAC = 0.7320508075688772  # sqrt(3)-1; phi^-2 is 1-phi^-1 (dependent!)


# ------------------------------------------------------------------ pixels
def _seed_of(idx: int) -> int:
    """Stable 64-bit seed from the row index (splitmix64 finalizer)."""
    z = (idx + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _splitmix64_vec(z: np.ndarray) -> np.ndarray:
    """Vectorized :func:`_seed_of` (uint64 modular arithmetic)."""
    with np.errstate(over="ignore"):
        z = (z + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def synth_pixels(idx: int, w: int = 32, h: int = 32) -> np.ndarray:
    """Deterministic RGB uint8 image: gradient + seeded noise."""
    rng = np.random.default_rng(_seed_of(idx))
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int16)
    noise = rng.integers(-32, 33, size=(h, w, 3), dtype=np.int16)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def average_phash(px: np.ndarray) -> int:
    """64-bit average hash: 8x8 block-mean luma thresholded at its
    mean; bit i = block i brighter than average.  Signed int64."""
    luma = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = luma.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    blocks = luma[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).flatten()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    # map to signed int64
    return v - (1 << 64) if v >= (1 << 63) else v


# ------------------------------------------------------------------- codecs
def encode_png(px: np.ndarray) -> bytes:
    """Minimal real PNG: 8-bit RGB, no interlace, filter 0 rows."""
    h, w, _ = px.shape
    raw = b"".join(b"\x00" + px[r].tobytes() for r in range(h))
    comp = zlib.compress(raw, 6)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", comp)
        + chunk(b"IEND", b"")
    )


def _png_unfilter(rows: np.ndarray, h: int, w: int) -> np.ndarray:
    """Reverse PNG scanline filters 0-4 (RFC 2083 §6) for 8-bit RGB.
    rows: (h, 1+3w) uint8 — filter byte + filtered scanline."""
    bpp, stride = 3, w * 3
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        f = int(rows[r, 0])
        line = rows[r, 1:].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r else np.zeros(stride, np.int32)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need the left pixel
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0  # left
                b = int(prev[i])  # above
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:  # Paeth
                    c = int(prev[i - bpp]) if i >= bpp else 0  # upper-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[r] = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    if bytes(data[:8]) != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    w = h = 0
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bit, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
            if not (bit == 8 and color == 2):
                raise ValueError("only 8-bit RGB PNGs supported")
            if interlace:
                raise ValueError("interlaced (Adam7) PNGs unsupported")
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    if (rows[:, 0] == 0).all():  # fast path: what encode_png emits
        return rows[:, 1:].reshape(h, w, 3).copy()
    return _png_unfilter(rows, h, w).reshape(h, w, 3)


_LJPG_MAGIC = b"LJPG"
_QBITS = 6  # 6-bit quantization -> ~46 dB PSNR (PSNR>=40 contract)


def encode_ljpg(px: np.ndarray) -> bytes:
    """Deterministic lossy codec (JPEG stand-in — see module doc)."""
    h, w, _ = px.shape
    q = (px.astype(np.uint16) >> (8 - _QBITS)).astype(np.uint8)
    comp = zlib.compress(q.tobytes(), 6)
    return _LJPG_MAGIC + struct.pack(">HHB", w, h, _QBITS) + comp


def decode_ljpg(data: bytes) -> np.ndarray:
    if bytes(data[:4]) != _LJPG_MAGIC:
        raise ValueError("not an LJPG payload")
    w, h, qbits = struct.unpack(">HHB", data[4:9])
    q = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8).reshape(h, w, 3)
    shift = 8 - qbits
    # dequantize to bin centers
    return ((q.astype(np.uint16) << shift) | (1 << (shift - 1))).clip(0, 255).astype(np.uint8)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpg", "mjpg"):
        # sniff: real JPEG (FF D8) vs the legacy LJPG stand-in payload
        if bytes(data[:2]) == b"\xff\xd8":
            from .jpeg import decode_jpeg

            return decode_jpeg(bytes(data))
        return decode_ljpg(data)
    raise NotImplementedError(f"unknown image format {fmt!r}")


def encode_image(px: np.ndarray, fmt: str) -> bytes:
    """Encode with the named codec family (png lossless / jpeg lossy)."""
    if fmt == "png":
        return encode_png(px)
    if fmt in ("jpeg", "jpg", "mjpg"):
        from .jpeg import encode_jpeg

        return encode_jpeg(px)
    raise NotImplementedError(f"unknown image format {fmt!r}")


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# --------------------------------------------------------------- generator
def generate_images(
    spark: SparkSession,
    n: int,
    w: int = 32,
    h: int = 32,
    partitions: int | None = None,
    hot_fraction: float = 0.2,
    hot_cell: tuple[float, float] = (-118.25, 34.05),
) -> DataFrame:
    """Deterministic image table of ``n`` rows (executor-parallel).

    caption embeds the derived centroid's zoom-12 tile so caption
    equality also pins the geography.  ``hot_fraction`` of rows get
    phash values whose derived centroid lands in one hot cell
    (FIXTURES.md skew knob) — done by construction inside the caption/
    centroid derivation, not by mutating phash (phash stays the true
    pixel hash; skew rows carry an explicit hot marker in image_id
    row-index space: idx % int(1/hot_fraction) == 0).
    """
    parts = partitions or max(8, n // 25_000)
    base = spark.range(0, n, 1, parts)
    hot_mod = int(round(1.0 / hot_fraction)) if hot_fraction > 0 else 0
    hot_lon, hot_lat = hot_cell

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for idx in b["id"].to_numpy():
                idx = int(idx)
                px = synth_pixels(idx, w, h)
                fmt = "png" if idx % 2 == 0 else "jpeg"
                data = encode_image(px, fmt)
                ph = average_phash(px)
                lon, lat = centroid_of(ph, idx, hot_mod, hot_lon, hot_lat)
                image_id = f"img{idx:012d}"
                caption = f"caption for {image_id} at {lon:.6f},{lat:.6f}"
                rows.append((image_id, data, w, h, fmt, caption, ph))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    return base.mapInPandas(gen, IMAGE_SCHEMA)


def centroid_of(
    phash: int, idx: int, hot_mod: int, hot_lon: float, hot_lat: float
) -> tuple[float, float]:
    """Derived geographic key (FIXTURES.md §1): CONUS window from
    golden-ratio fractions of splitmix64(idx) XOR phash; every
    hot_mod-th row resamples into the hot cell (+-0.005 deg jitter).

    phash alone is a PERCEPTUAL hash — near-dup images collide by
    design, so it is too low-entropy to spread geography; mixing the
    row key keeps the derivation deterministic and re-derivable from
    (image_id, phash) while distributing centroids uniformly."""
    key = _seed_of(idx) ^ (phash & 0xFFFFFFFFFFFFFFFF)
    # use 32-bit halves: a full 64-bit value times a float has no
    # fractional bits left (product >> 2^53), so frac() would be 0
    u = float(key & 0xFFFFFFFF) * _PHI_INV % 1.0
    v = float((key >> 32) & 0xFFFFFFFF) * _SQRT3_FRAC % 1.0
    if hot_mod and idx % hot_mod == 0:
        return hot_lon + (u - 0.5) * 0.01, hot_lat + (v - 0.5) * 0.01
    return -125.0 + 58.0 * u, 25.0 + 24.0 * v


_CENTROID_SCHEMA = StructType(
    [StructField("lon", DoubleType()), StructField("lat", DoubleType())]
)


def with_centroids(df: DataFrame, hot_fraction: float = 0.2,
                   hot_cell: tuple[float, float] = (-118.25, 34.05)) -> DataFrame:
    """Append derived (lon, lat) columns — parses them back out of the
    caption-free path: recompute from phash + row idx (image_id)."""
    hot_mod = int(round(1.0 / hot_fraction)) if hot_fraction > 0 else 0
    hot_lon, hot_lat = hot_cell

    @F.pandas_udf(_CENTROID_SCHEMA)
    def _c(it: Iterator[Tuple[pd.Series, ...]]) -> Iterator[pd.DataFrame]:
        for id_s, ph_s in it:
            ids = id_s.str.slice(3).astype(np.int64).to_numpy()
            ph = ph_s.to_numpy(np.int64).astype(np.uint64)
            key = _splitmix64_vec(ids.astype(np.uint64)) ^ ph
            lo = (key & np.uint64(0xFFFFFFFF)).astype(np.float64)
            hi = ((key >> np.uint64(32)) & np.uint64(0xFFFFFFFF)).astype(np.float64)
            u = (lo * _PHI_INV) % 1.0
            v = (hi * _SQRT3_FRAC) % 1.0
            lon = -125.0 + 58.0 * u
            lat = 25.0 + 24.0 * v
            if hot_mod:
                hot = ids % hot_mod == 0
                lon = np.where(hot, hot_lon + (u - 0.5) * 0.01, lon)
                lat = np.where(hot, hot_lat + (v - 0.5) * 0.01, lat)
            yield pd.DataFrame({"lon": lon, "lat": lat})

    out = df.withColumn("_ll", _c("image_id", "phash"))
    return out.withColumn("lon", F.col("_ll.lon")).withColumn("lat", F.col("_ll.lat")).drop("_ll")


_VERIFY_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("psnr_db", DoubleType()),
        StructField("caption_ok", BooleanType()),
        StructField("pixels_ok", BooleanType()),
    ]
)


def _payload_verdicts(b: pd.DataFrame, min_psnr: float):
    """Per-batch decode + invariant check; returns (psnr, caption_ok,
    pixels_ok) lists aligned with the batch rows."""
    psnrs: list[float] = []
    cap_oks: list[bool] = []
    pix_oks: list[bool] = []
    # per-image decode is inherently a Python loop, but iterate
    # raw column arrays (iterrows builds a Series per row)
    for iid, w, h, data, fmt, caption in zip(
        b["image_id"].to_numpy(),
        b["w"].to_numpy(),
        b["h"].to_numpy(),
        b["bytes"].to_numpy(),
        b["fmt"].to_numpy(),
        b["caption"].to_numpy(),
    ):
        idx = int(iid[3:])
        src = synth_pixels(idx, int(w), int(h))
        try:
            dec = decode_image(data, fmt)
            p = psnr_db(src, dec)
            if fmt == "png":
                pix_ok = bool(np.array_equal(src, dec))
            else:
                pix_ok = bool(p >= min_psnr)
        except Exception:
            # truncated/corrupt payload: the codecs raise on bad
            # magic/structure (fuzz-hardened); at ingest that is a
            # REJECT row, not a task failure — one bad blob must not
            # abort a 10^12-row job
            p, pix_ok = -1.0, False
        psnrs.append(float(min(p, 1e9)))
        cap_oks.append(bool(caption.startswith(f"caption for {iid} at ")))
        pix_oks.append(pix_ok)
    return psnrs, cap_oks, pix_oks


def verify_payloads(df: DataFrame, min_psnr: float = 40.0) -> DataFrame:
    """Per-row payload invariant check (input_hint contract): decode
    bytes, regenerate source pixels from image_id, PSNR >= 40 dB for
    lossy / exact for png, caption equality against the derivation."""

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            psnrs, cap_oks, pix_oks = _payload_verdicts(b, min_psnr)
            yield pd.DataFrame(
                {
                    "image_id": b["image_id"].to_numpy(),
                    "psnr_db": psnrs,
                    "caption_ok": cap_oks,
                    "pixels_ok": pix_oks,
                }
            )

    return df.mapInPandas(check, _VERIFY_SCHEMA)


def gate_payloads(
    df: DataFrame, min_psnr: float = 40.0, keep_bytes: bool = False
) -> DataFrame:
    """verify_payloads with the input row carried through: ONE
    mapInPandas pass emits every input column plus the verdict columns
    (psnr_db, caption_ok, pixels_ok), so an ingest pipeline filters on
    the verdict without joining the verdicts back to the rows.  That
    join would be fine in batch but is a stream-stream join in
    Structured Streaming (stateful, watermark-bound); the fused pass
    keeps the gate stateless and therefore stream-safe.

    ``keep_bytes=False`` drops the payload from the OUTPUT batches
    (decode still reads it): a gate that forwards verdicts + metadata
    downstream shouldn't re-ship the blob through every later shuffle.
    """
    out_fields = [f for f in df.schema.fields if keep_bytes or f.name != "bytes"]
    schema = StructType(
        out_fields
        + [
            StructField("psnr_db", DoubleType()),
            StructField("caption_ok", BooleanType()),
            StructField("pixels_ok", BooleanType()),
        ]
    )
    out_cols = [f.name for f in out_fields]

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            psnrs, cap_oks, pix_oks = _payload_verdicts(b, min_psnr)
            out = b[out_cols].copy()
            out["psnr_db"] = psnrs
            out["caption_ok"] = cap_oks
            out["pixels_ok"] = pix_oks
            yield out

    return df.mapInPandas(check, schema)


def generate_points(spark: SparkSession, n: int, partitions: int | None = None,
                    hot_fraction: float = 0.2,
                    hot_cell: tuple[float, float] = (-118.25, 34.05)) -> DataFrame:
    """Payload-free point view of the image table at scale — the
    SCALING-benchmark fixture.

    Produces exactly the (image_id, phash, lon, lat) columns a pruned
    scan of the wide table yields, with the same centroid law
    (splitmix64(idx) XOR phash -> golden-ratio fractions -> CONUS
    window + hot cell), but with a deterministic 64-bit surrogate in
    place of the pixel phash: XORing one uniform 64-bit stream with
    another leaves the distribution unchanged, so tile occupancy,
    skew, and aggregate cardinalities match the pixel-derived table —
    only the payload (never read by the flagship's pruned scan) is
    absent.  Pixel-encoding 256M+ rows is a fixture cost the scaling
    measurement does not need to pay.
    """
    hot_mod = int(round(1.0 / hot_fraction)) if hot_fraction > 0 else 0
    hot_lon, hot_lat = hot_cell
    parts = partitions or max(8, n // 2_000_000)
    base = spark.range(0, n, 1, parts)

    @F.pandas_udf(
        StructType(
            [
                StructField("image_id", StringType()),
                StructField("phash", LongType()),
                StructField("lon", DoubleType()),
                StructField("lat", DoubleType()),
            ]
        )
    )
    def _gen(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for id_s in it:
            ids = id_s.to_numpy(np.int64).astype(np.uint64)
            # phash surrogate: an independent deterministic 64-bit
            # stream (offset domain so it never equals _seed_of(idx))
            ph = _splitmix64_vec(ids ^ np.uint64(0xA5A5A5A5A5A5A5A5))
            key = _splitmix64_vec(ids) ^ ph
            lo = (key & np.uint64(0xFFFFFFFF)).astype(np.float64)
            hi = ((key >> np.uint64(32)) & np.uint64(0xFFFFFFFF)).astype(np.float64)
            u = (lo * _PHI_INV) % 1.0
            v = (hi * _SQRT3_FRAC) % 1.0
            lon = -125.0 + 58.0 * u
            lat = 25.0 + 24.0 * v
            if hot_mod:
                hot = ids % np.uint64(hot_mod) == 0
                lon = np.where(hot, hot_lon + (u - 0.5) * 0.01, lon)
                lat = np.where(hot, hot_lat + (v - 0.5) * 0.01, lat)
            yield pd.DataFrame(
                {
                    "image_id": pd.Series(ids).map("img{:012d}".format),
                    "phash": ph.astype(np.int64),
                    "lon": lon,
                    "lat": lat,
                }
            )

    return base.select(_gen("id").alias("_r")).select("_r.*")
