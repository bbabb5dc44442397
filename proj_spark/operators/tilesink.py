"""Tile-keyed thumbnail export — the two graft axes composed.

The pipeline a map-serving or training-data team actually runs over
the 10^12-row image table: derive each image's web-mercator tile from
its centroid (axis A, the geospatial lane), thumbnail the payload
with its own codec family (axis B, the image lane), and emit
WebDataset tar shards grouped by tile so a consumer can fetch one
tile's imagery as one object.

Plan shape at scale (SURVEY §7 'what's hard' e): the tile is computed
from (lon, lat) only — the bytes column never enters the exchange.
Payloads are re-attached by image_id AFTER the repartition, so the
shuffle moves (id, tile) pairs, not binaries; the decode→resize→
encode pass and the tar write are both partition-local.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import tile_x, tile_y
from .multimodal import resize_images


def tile_thumbnails(
    imgs: DataFrame,
    out_dir: str,
    zoom: int = 8,
    thumb: int = 8,
    shards_partitions: int | None = None,
) -> DataFrame:
    """Thumbnail every image and write per-tile WebDataset shards.

    ``imgs`` needs (image_id, bytes, fmt, caption, lon, lat) — i.e.
    the input_hint table after ``with_centroids``.  Returns the
    per-tile manifest (tile_x, tile_y, n, shard_dir) that was written
    alongside the shards (the consumer-facing index).  The plan is
    lazy like any DataFrame — shards are written when the caller acts
    on the returned manifest (count/collect/write).

    Output layout: ``out_dir/z{zoom}/{tx}_{ty}/shard-*.tar`` — one
    directory per tile, so object-store listing prefixes map to map
    tiles (how tile servers and dataloaders both want it).
    """
    keyed = imgs.select(
        "image_id",
        tile_x("lon", zoom).alias("tx"),
        tile_y("lat", zoom).alias("ty"),
        "caption",
    )
    small = resize_images(imgs, thumb, thumb)  # narrow; payload stays put
    # shuffle ids+tiles only; re-attach the (small) thumbnail payload last
    joined = keyed.join(small.select("image_id", "bytes", "fmt"), "image_id")
    parts = shards_partitions or max(imgs.sparkSession.sparkContext.defaultParallelism, 8)
    tiled = joined.repartition(parts, "tx", "ty").sortWithinPartitions(
        "tx", "ty", "image_id"
    )

    def _write_partition(it):
        import io
        import tarfile

        import pandas as pd

        counts: dict[tuple[int, int], int] = {}
        open_tars: dict[tuple[int, int], tuple] = {}

        def _tar_for(tx: int, ty: int):
            key = (tx, ty)
            if key not in open_tars:
                d = os.path.join(out_dir, f"z{zoom}", f"{tx}_{ty}")
                os.makedirs(d, exist_ok=True)
                # one shard per (tile, partition): deterministic name
                path = os.path.join(d, f"shard-p{pidx[0]:05d}.tar")
                tmp = path + ".tmp"
                open_tars[key] = (tarfile.open(tmp, "w"), tmp, path)
            return open_tars[key][0]

        def _add(t, name: str, data: bytes):
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0  # deterministic shards
            t.addfile(info, io.BytesIO(data))

        pidx = [None]
        for batch in it:
            if pidx[0] is None:
                from pyspark import TaskContext

                pidx[0] = TaskContext.get().partitionId()
            for iid, tx, ty, caption, data, fmt in zip(
                batch["image_id"].to_numpy(),
                batch["tx"].to_numpy(),
                batch["ty"].to_numpy(),
                batch["caption"].to_numpy(),
                batch["bytes"].to_numpy(),
                batch["fmt"].to_numpy(),
            ):
                tx, ty = int(tx), int(ty)
                t = _tar_for(tx, ty)
                ext = "png" if fmt == "png" else "jpg"
                _add(t, f"{iid}.{ext}", bytes(data))
                _add(t, f"{iid}.txt", str(caption).encode("utf-8"))
                counts[(tx, ty)] = counts.get((tx, ty), 0) + 1
        for (tx, ty), (t, tmp, path) in open_tars.items():
            t.close()
            os.replace(tmp, path)  # atomic publish (idempotent retries)
        yield pd.DataFrame(
            [
                (tx, ty, n, os.path.join(out_dir, f"z{zoom}", f"{tx}_{ty}"))
                for (tx, ty), n in sorted(counts.items())
            ],
            columns=["tile_x", "tile_y", "n", "shard_dir"],
        )

    manifest = tiled.mapInPandas(
        _write_partition,
        "tile_x long, tile_y long, n long, shard_dir string",
    )
    # tiles can span partitions only if repartition splits a key — it
    # cannot (hash partitioning is per-key) — so the rollup is a pure
    # formality that also forces the write to execute exactly once
    out = (
        manifest.groupBy("tile_x", "tile_y", "shard_dir")
        .agg(F.sum("n").alias("n"))
        .select("tile_x", "tile_y", "n", "shard_dir")
    )
    return out
