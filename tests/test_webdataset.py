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


def test_balanced_shards_bound_and_deterministic(spark, tmp_path):
    """Size-balanced export: per-shard payload stays within
    target + one max row (greedy-with-overflow), the assignment is
    partitioning-invariant, and the roundtrip is exact — on a corpus
    whose row sizes are deliberately skewed."""
    import pandas as pd

    from proj_spark.sources.webdataset import write_webdataset_shards_balanced

    rows = []
    for i in range(60):
        size = 40_000 if i % 10 == 0 else 1_000  # 40x size skew
        rows.append((f"im{i:04d}", bytes([i % 251]) * size, "png", f"cap {i}"))
    pdf = pd.DataFrame(rows, columns=["image_id", "bytes", "fmt", "caption"])
    df = spark.createDataFrame(pdf)

    target = 50_000
    out_a = str(tmp_path / "a")
    n_a = write_webdataset_shards_balanced(
        df.repartition(2), out_a, target_bytes=target, n_buckets=4
    )
    paths = sorted(glob.glob(os.path.join(out_a, "shard-*.tar")))
    assert len(paths) == n_a and n_a >= 2
    max_row = 40_000 + len("cap 0") + 2
    seen = set()
    for p in paths:
        with tarfile.open(p) as t:
            members = t.getmembers()
            payload = sum(m.size for m in members if not m.name.endswith(".txt"))
            caps = sum(m.size for m in members if m.name.endswith(".txt"))
            assert payload + caps < target + max_row, (p, payload + caps)
            seen.update(
                os.path.splitext(m.name)[0] for m in members if m.name.endswith(".txt")
            )
    assert len(seen) == 60
    # same input under different partitioning -> identical shard map
    out_b = str(tmp_path / "b")
    n_b = write_webdataset_shards_balanced(
        df.repartition(7), out_b, target_bytes=target, n_buckets=4
    )
    assert n_b == n_a
    names_a = sorted(os.path.basename(p) for p in paths)
    names_b = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(out_b, "shard-*.tar"))
    )
    assert names_a == names_b
    for name in names_a:
        with tarfile.open(os.path.join(out_a, name)) as ta, tarfile.open(
            os.path.join(out_b, name)
        ) as tb:
            assert ta.getnames() == tb.getnames()
    # roundtrip
    back = read_webdataset_shards(spark, out_a)
    got = {r.image_id: bytes(r.bytes) for r in back.collect()}
    assert got == {f"im{i:04d}": bytes(rows[i][1]) for i in range(60)}
