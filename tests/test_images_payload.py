"""Image source + codec tests: payload invariants (input_hint: PSNR
>= 40dB for lossy, exact for png, caption equality), determinism, and
survival through shuffle/repartition."""
from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from proj_spark.sources.images import (
    average_phash,
    centroid_of,
    decode_image,
    decode_png,
    encode_ljpg,
    encode_png,
    generate_images,
    psnr_db,
    synth_pixels,
    verify_payloads,
    with_centroids,
)


def test_png_roundtrip_exact():
    for idx in (0, 7, 123):
        px = synth_pixels(idx)
        assert np.array_equal(decode_png(encode_png(px)), px)


def test_ljpg_psnr_above_contract():
    for idx in range(20):
        px = synth_pixels(idx)
        dec = decode_image(encode_ljpg(px), "jpeg")
        assert psnr_db(px, dec) >= 40.0


def test_png_decoder_handles_all_filter_types():
    """Stock encoders pick filters 1-4 adaptively; build a PNG whose
    every scanline uses a chosen filter (forward-filtering here in the
    test) and check decode recovers the exact pixels."""
    import struct
    import zlib

    px = synth_pixels(5, 19, 7)  # odd width exercises per-pixel loops
    h, w, _ = px.shape
    bpp, stride = 3, w * 3

    def fwd_filter(f: int) -> bytes:
        flat = px.reshape(h, stride).astype(np.int32)
        out = bytearray()
        for r in range(h):
            line = flat[r]
            prev = flat[r - 1] if r else np.zeros(stride, np.int32)
            filt = np.zeros(stride, np.int32)
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                filt[i] = (int(line[i]) - pred) & 0xFF
            out += bytes([f]) + filt.astype(np.uint8).tobytes()
        return bytes(out)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    for f in range(5):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(fwd_filter(f)))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(data), px), f"filter {f}"


def test_phash_deterministic_and_64bit():
    px = synth_pixels(42)
    assert average_phash(px) == average_phash(px.copy())
    assert -(1 << 63) <= average_phash(px) < (1 << 63)


def test_generate_images_schema_and_payloads(spark):
    imgs = generate_images(spark, 300, partitions=3)
    assert [f.name for f in imgs.schema.fields] == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
    ]
    v = verify_payloads(imgs)
    bad = v.where(~F.col("caption_ok") | ~F.col("pixels_ok")).count()
    assert bad == 0


def test_payloads_survive_repartition_and_join(spark):
    """input_hint invariant after any repartition round-trip."""
    imgs = with_centroids(generate_images(spark, 200, partitions=2))
    shuffled = imgs.repartition(7, "phash").join(
        imgs.select("image_id"), on="image_id", how="inner"
    )
    v = verify_payloads(shuffled)
    assert v.where(~F.col("caption_ok") | ~F.col("pixels_ok")).count() == 0


def test_centroid_python_numpy_parity(spark):
    imgs = with_centroids(generate_images(spark, 150, partitions=2))
    for r in imgs.select("image_id", "phash", "lon", "lat").collect():
        lon, lat = centroid_of(r.phash, int(r.image_id[3:]), 5, -118.25, 34.05)
        assert lon == r.lon and lat == r.lat


def test_generation_is_partition_independent(spark):
    a = generate_images(spark, 100, partitions=1).select("image_id", "phash", "caption")
    b = generate_images(spark, 100, partitions=9).select("image_id", "phash", "caption")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_hot_cell_skew_fraction(spark):
    imgs = with_centroids(generate_images(spark, 500, partitions=4), hot_fraction=0.2)
    hot = imgs.where(
        (F.abs(F.col("lon") + 118.25) < 0.01) & (F.abs(F.col("lat") - 34.05) < 0.01)
    ).count()
    assert hot == 100
