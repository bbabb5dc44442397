"""WebDataset tar-shard sink/source (sources/webdataset.py)."""
from __future__ import annotations

import glob
import os
import tarfile

from proj_spark.sources.images import decode_image, generate_images
from proj_spark.sources.webdataset import (
    read_webdataset_shards,
    write_webdataset_shards,
)


def test_shards_are_real_tars_and_roundtrip(spark, tmp_path):
    out = str(tmp_path / "wds")
    imgs = generate_images(spark, 25).repartition(3).cache()
    n = write_webdataset_shards(imgs, out, rows_per_shard=10)
    paths = sorted(glob.glob(os.path.join(out, "shard-*.tar")))
    assert len(paths) == n and n >= 3
    # stdlib tarfile (an independent reader) opens every shard and
    # finds paired members
    seen = set()
    for p in paths:
        with tarfile.open(p) as t:
            names = t.getnames()
            stems = {os.path.splitext(x)[0] for x in names}
            for s in stems:
                assert f"{s}.txt" in names
                seen.add(s)
    assert len(seen) == 25
    # full roundtrip: payload bytes and captions survive exactly
    back = read_webdataset_shards(spark, out)
    orig = {r.image_id: r for r in imgs.collect()}
    got = {r.image_id: r for r in back.collect()}
    assert set(got) == set(orig)
    for iid, r in got.items():
        assert bytes(r.bytes) == bytes(orig[iid].bytes)
        assert r.caption == orig[iid].caption
        assert r.fmt == orig[iid].fmt
        decode_image(bytes(r.bytes), r.fmt)  # still decodable


def test_shard_bytes_are_deterministic(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    imgs = generate_images(spark, 8).coalesce(1).cache()
    write_webdataset_shards(imgs, a)
    write_webdataset_shards(imgs, b)
    fa = sorted(glob.glob(os.path.join(a, "*.tar")))
    fb = sorted(glob.glob(os.path.join(b, "*.tar")))
    assert len(fa) == len(fb) == 1
    assert open(fa[0], "rb").read() == open(fb[0], "rb").read()
