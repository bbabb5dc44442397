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
