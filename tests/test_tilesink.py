"""Tile-keyed thumbnail export (operators/tilesink.py): both graft
axes composed — centroid -> web-mercator tile, payload -> thumbnail,
per-tile WebDataset shards + manifest."""
from __future__ import annotations

import os
import tarfile

import numpy as np
from pyspark.sql import functions as F

from proj_spark.functions.expressions import tile_x, tile_y
from proj_spark.operators.tilesink import tile_thumbnails
from proj_spark.sources.images import (
    decode_image,
    generate_images,
    with_centroids,
)


def test_tile_thumbnails_end_to_end(spark, tmp_path):
    out = str(tmp_path / "tiles")
    imgs = with_centroids(generate_images(spark, 120, partitions=3)).cache()
    manifest = tile_thumbnails(imgs, out, zoom=5, thumb=8).collect()

    # every image accounted for, tile keys match the expression lane
    assert sum(r.n for r in manifest) == 120
    expected = {
        (r.tx, r.ty): r.n
        for r in imgs.select(
            tile_x("lon", 5).alias("tx"), tile_y("lat", 5).alias("ty")
        )
        .groupBy("tx", "ty")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {(r.tile_x, r.tile_y): r.n for r in manifest}
    assert got == expected

    # tile directories hold real tar shards; thumbnails decode at 8x8
    # and captions ride along
    fmts = {r.image_id: r.fmt for r in imgs.select("image_id", "fmt").collect()}
    checked = 0
    for r in manifest[:5]:
        assert r.shard_dir.startswith(out)
        shards = [f for f in os.listdir(r.shard_dir) if f.endswith(".tar")]
        assert shards and not any(f.endswith(".tmp") for f in os.listdir(r.shard_dir))
        with tarfile.open(os.path.join(r.shard_dir, shards[0])) as t:
            names = t.getnames()
            imgs_in = [n for n in names if not n.endswith(".txt")]
            for name in imgs_in[:2]:
                iid = name.rsplit(".", 1)[0]
                data = t.extractfile(name).read()
                px = decode_image(data, fmts[iid])
                assert px.shape == (8, 8, 3)
                cap = t.extractfile(f"{iid}.txt").read().decode()
                assert cap.startswith(f"caption for {iid} at ")
                checked += 1
    assert checked > 0

    # deterministic tar bytes: zero mtimes everywhere
    for r in manifest[:2]:
        for f in os.listdir(r.shard_dir):
            with tarfile.open(os.path.join(r.shard_dir, f)) as t:
                assert all(m.mtime == 0 for m in t.getmembers())


def test_image_funnel_tool(spark, tmp_path):
    """Image curation funnel (tools/example_image_pipeline.py): runs
    in-session, funnel counts are monotone, export count equals the
    canonical keep, shards land on disk (invariants assert inside)."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    from example_image_pipeline import run as funnel_run

    out = funnel_run(spark, 200, str(tmp_path / "funnel"))
    f = out["funnel"]
    assert f["ingest"] == 200 and f["payload_verified"] == 200
    assert 0 < f["canonical"] <= f["quality_gated"]
    assert f["thumbnails_exported"] == f["canonical"]


def test_tile_thumbnails_shuffle_carries_no_wide_payload(spark, tmp_path):
    """Plan gate: the tile repartition must shuffle the THUMBNAIL
    payload, not the original — i.e. the resize MapInPandas ('run')
    sits BELOW the REPARTITION exchange in the physical plan, so the
    bytes column entering the shuffle is already 8x8-sized.  The wide
    source bytes never cross an exchange."""
    imgs = with_centroids(generate_images(spark, 30, partitions=2))
    manifest = tile_thumbnails(imgs, str(tmp_path / "t"), zoom=4, thumb=8)
    plan = manifest._jdf.queryExecution().executedPlan().toString()
    shuffle_at = plan.index("REPARTITION_BY_NUM")
    resize_at = plan.index("MapInPandas run(")
    assert resize_at > shuffle_at, "resize must execute below the tile shuffle"
    np.testing.assert_equal(sum(r.n for r in manifest.collect()), 30)
