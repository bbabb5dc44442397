"""Multimodal operators: feature extraction, resize, frame sampling
(fakevid container + explicit stub), phash near-dup pairs."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from proj_spark.operators.multimodal import (
    extract_features,
    make_fakevid,
    phash_dedup_pairs,
    resize_images,
    sample_frames,
)
from proj_spark.sources.images import decode_image, generate_images, synth_pixels


def test_extract_features(spark):
    imgs = generate_images(spark, 40, partitions=2)
    feats = extract_features(imgs).collect()
    assert len(feats) == 40
    for r in feats:
        assert 0.0 <= r.mean_r <= 255.0
        assert len(r.luma_hist) == 16
        assert sum(r.luma_hist) == 32 * 32
        assert r.edge_energy > 0.0
    # png rows: phash from decoded pixels must equal the stored phash
    stored = {r.image_id: r.phash for r in imgs.select("image_id", "phash", "fmt").where(F.col("fmt") == "png").collect()}
    got = {r.image_id: r.phash for r in feats}
    for iid, ph in stored.items():
        assert got[iid] == ph


def test_resize_images_roundtrip(spark):
    imgs = generate_images(spark, 10, partitions=1)
    small = resize_images(imgs, 8, 8).collect()
    for r in small:
        px = decode_image(r.bytes, r.fmt)
        assert px.shape == (8, 8, 3)


def test_sample_frames_fakevid(spark):
    frames = [synth_pixels(i, 16, 16) for i in range(25)]
    payload = make_fakevid(frames)
    df = spark.createDataFrame([Row(media_id="vid0", bytes=payload, fmt="fakevid")])
    out = sample_frames(df, every_n=10).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in out] == [0, 10, 20]
    assert np.array_equal(decode_image(out[1].bytes, "png"), frames[10])


def test_sample_frames_real_codec_is_stubbed(spark):
    df = spark.createDataFrame([Row(media_id="vid1", bytes=b"\x00\x00", fmt="mp4")])
    with pytest.raises(Exception, match="NotImplementedError|libav|ffmpeg"):
        sample_frames(df).collect()


def test_avi_writer_reader_roundtrip():
    """Pure-python AVI container (sources/avi.py): writer output parses
    back to the exact frame payloads with the MJPG fourcc, and the
    writer is byte-deterministic."""
    from proj_spark.sources.avi import read_avi_frames, write_avi_mjpeg

    frames = [bytes([i]) * (50 + 7 * i) for i in range(9)]  # odd sizes too
    data = write_avi_mjpeg(frames, width=16, height=16, fps=25)
    assert data == write_avi_mjpeg(frames, width=16, height=16, fps=25)
    got = list(read_avi_frames(data))
    assert [g[0] for g in got] == list(range(9))
    assert [g[1] for g in got] == frames
    assert all(g[2] == "mjpg" for g in got)
    with pytest.raises(ValueError, match="RIFF"):
        list(read_avi_frames(b"not an avi"))


def test_sample_frames_avi(spark):
    """fmt='avi' media rows flow through the REAL container parser in
    the Spark lane; sampled rows carry the stream codec as fmt."""
    from proj_spark.sources.avi import write_avi_mjpeg

    frames = [bytes([i]) * 64 for i in range(25)]
    payload = write_avi_mjpeg(frames, width=8, height=8)
    df = spark.createDataFrame(
        [
            Row(media_id="avi0", bytes=payload, fmt="avi"),
            Row(media_id="fv0", bytes=make_fakevid([synth_pixels(0, 8, 8)]), fmt="fakevid"),
        ]
    )
    out = sample_frames(df, every_n=10).orderBy("media_id", "frame_idx").collect()
    avi_rows = [r for r in out if r.media_id == "avi0"]
    assert [r.frame_idx for r in avi_rows] == [0, 10, 20]
    assert [bytes(r.bytes) for r in avi_rows] == [frames[0], frames[10], frames[20]]
    assert all(r.fmt == "mjpg" for r in avi_rows)
    assert [r.fmt for r in out if r.media_id == "fv0"] == ["png"]


def test_image_quality_signals(spark):
    """Blur variance orders sharp above smoothed; grayscale content
    scores ~zero saturation; flat fill scores ~zero entropy."""
    from proj_spark.operators.multimodal import image_quality
    from proj_spark.sources.images import encode_png

    sharp = synth_pixels(0, 32, 32)
    # 3x3 box-blur of the same image (valid region padded by edges)
    f = sharp.astype(np.float64)
    blurred = f.copy()
    blurred[1:-1, 1:-1] = sum(
        f[1 + dy : 31 + dy, 1 + dx : 31 + dx]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    ) / 9.0
    blurred = blurred.astype(np.uint8)
    gray = np.repeat(sharp[:, :, :1], 3, axis=2)
    flat = np.full((32, 32, 3), 77, np.uint8)
    rows = [
        Row(image_id=n, bytes=encode_png(p), fmt="png")
        for n, p in [("sharp", sharp), ("blur", blurred), ("gray", gray), ("flat", flat)]
    ]
    out = {r.image_id: r for r in image_quality(spark.createDataFrame(rows)).collect()}
    assert out["sharp"].blur_var > 2.0 * out["blur"].blur_var
    assert out["gray"].saturation < 1e-9
    assert out["flat"].entropy_bits < 1e-9 and out["flat"].contrast < 1e-9
    assert out["sharp"].entropy_bits > 5.0


def test_phash_dedup_pairs_finds_identical_images(spark):
    # rows 2k and 2k+1 with identical pixels -> identical phash
    rows = []
    for k in range(10):
        ph = int(np.int64(k * 1234567 + 42))
        rows.append(Row(image_id=f"a{k}", phash=ph))
        rows.append(Row(image_id=f"b{k}", phash=ph))
    # plus distinct decoys far apart in hamming space
    rng = np.random.default_rng(0)
    for k in range(20):
        rows.append(Row(image_id=f"z{k}", phash=int(rng.integers(-(2**62), 2**62))))
    df = spark.createDataFrame(rows)
    pairs = {(r.id_a, r.id_b) for r in phash_dedup_pairs(df, max_hamming=2).collect()}
    for k in range(10):
        assert (f"a{k}", f"b{k}") in pairs


def test_exact_phash_pairs_star_equals_clique_components(spark):
    """Radius-0 star edges give the SAME connected components as the
    full clique from phash_dedup_pairs(max_hamming=0), with O(n)
    edges: the funnel's 20k-image clique-pair OOM regression guard."""
    from proj_spark.operators.components import dedup_groups
    from proj_spark.operators.multimodal import exact_phash_pairs

    rows = []
    for k in range(6):  # 6 groups of 5 identical phashes + 10 loners
        ph = int(np.int64(k * 987654321 + 7))
        for j in range(5):
            rows.append(Row(image_id=f"g{k}_{j}", phash=ph))
    for k in range(10):
        rows.append(Row(image_id=f"solo{k}", phash=int(np.int64(10**12 + 31 * k))))
    df = spark.createDataFrame(rows)

    star = exact_phash_pairs(df)
    assert star.count() == 6 * 4  # hub->member, no clique blowup

    def groups(pairs):
        out = dedup_groups(
            df.select("image_id"), pairs, id_col="image_id", a="id_a", b="id_b"
        )
        return {r.image_id: r.group_id for r in out.collect()}

    clique = phash_dedup_pairs(df, max_hamming=0)
    assert groups(star) == groups(clique)


class TestAugment:
    def test_flip_involution_and_rot_cycle(self, spark):
        from proj_spark.operators.multimodal import augment_images
        from proj_spark.sources.images import decode_image, generate_images

        from proj_spark.sources.images import psnr_db

        imgs = generate_images(spark, 6).cache()
        fmts = {r.image_id: r.fmt for r in imgs.select("image_id", "fmt").collect()}
        orig = {
            r.image_id: decode_image(bytes(r.bytes), r.fmt)
            for r in imgs.collect()
        }
        # hflip twice == identity on decoded pixels: exact for png;
        # for the real JPEG codec each re-encode is a fresh lossy
        # roundtrip, so assert high fidelity (double roundtrip at q98
        # measures ~41 dB) instead of bit equality
        once = augment_images(imgs, "hflip")
        twice = {
            r.image_id: decode_image(bytes(r.bytes), r.fmt)
            for r in augment_images(once, "hflip").collect()
        }
        for iid, px in orig.items():
            if fmts[iid] == "png":
                assert (twice[iid] == px).all()
            else:
                assert psnr_db(twice[iid], px) >= 38.0
        # rot90 then rot270 == identity; rot90 swaps dimensions
        r90 = augment_images(imgs, "rot90").cache()
        for r in r90.collect():
            assert (r.w, r.h) == (orig[r.image_id].shape[0], orig[r.image_id].shape[1])
        back = {
            r.image_id: decode_image(bytes(r.bytes), r.fmt)
            for r in augment_images(r90, "rot270").collect()
        }
        for iid, px in orig.items():
            if fmts[iid] == "png":
                assert (back[iid] == px).all()
            else:
                assert psnr_db(back[iid], px) >= 38.0

    def test_center_crop_dims_and_content(self, spark):
        import numpy as np

        from proj_spark.operators.multimodal import augment_images
        from proj_spark.sources.images import decode_image, generate_images

        imgs = generate_images(spark, 3)
        orig = {
            r.image_id: decode_image(bytes(r.bytes), r.fmt) for r in imgs.collect()
        }
        out = augment_images(imgs, "crop_center", crop_frac=0.5)
        for r in out.collect():
            src = orig[r.image_id]
            h, w, _ = src.shape
            assert (r.h, r.w) == (h // 2, w // 2)
            got = decode_image(bytes(r.bytes), r.fmt)
            y0, x0 = (h - h // 2) // 2, (w - w // 2) // 2
            ref = src[y0 : y0 + h // 2, x0 : x0 + w // 2]
            if r.fmt == "png":
                assert (got == ref).all()
            else:  # lossy family: one fresh JPEG roundtrip on the crop
                from proj_spark.sources.images import psnr_db

                assert psnr_db(got, ref) >= 40.0

    def test_unknown_op_rejected(self, spark):
        import pytest

        from proj_spark.operators.multimodal import augment_images
        from proj_spark.sources.images import generate_images

        with pytest.raises(ValueError):
            augment_images(generate_images(spark, 1), "zoom")
