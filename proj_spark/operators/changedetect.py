"""Raster change detection: per-tile diff of two co-gridded epochs.

The EO monitoring primitive: given the same tiled raster extent at
two acquisition times, find where it changed — per tile, the count of
pixels whose absolute difference exceeds a threshold, the total
absolute difference, and a position-weighted checksum of the change
MASK (so a spatially-shifted change pattern is distinguished from an
equal-sized one, exactly).

Scale shape: ONE equi-join on the tile key (sx, sy) brings the two
epochs' payload buffers together — at 100 TB both raster tables are
written bucketed by tile key, so this join is co-located and
shuffle-free; here it is a plain hash join whose shuffled payload is
exactly the two rasters once each (no fan: tile keys are unique per
epoch).  The pixel work is one narrow mapInPandas after the join;
fingerprints are exact integers, so the aggregate is
order-independent and the DuckDB oracle replays every pixel of both
epochs via the LCG closed forms.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType


def diff_tiles(a: DataFrame, b: DataFrame, tile_px: int, threshold: int) -> DataFrame:
    """(sx, sy, n_changed, abs_diff, mask_cks) per tile.

    ``a`` and ``b`` need (sx, sy, bytes) with tile_px*tile_px uint8
    payloads on the SAME grid; mask_cks weights changed pixel (x, y)
    by (y*tile_px + x + 1)."""
    ts = tile_px
    w = np.arange(ts * ts, dtype=np.int64).reshape(ts, ts) + 1

    j = a.select("sx", "sy", "bytes").withColumnRenamed("bytes", "_ba").join(
        b.select("sx", "sy", "bytes").withColumnRenamed("bytes", "_bb"),
        on=["sx", "sy"],
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for sx, sy, ba, bb in zip(
                batch["sx"], batch["sy"], batch["_ba"], batch["_bb"]
            ):
                va = np.frombuffer(ba, dtype=np.uint8).reshape(ts, ts).astype(np.int64)
                vb = np.frombuffer(bb, dtype=np.uint8).reshape(ts, ts).astype(np.int64)
                d = np.abs(va - vb)
                mask = d > threshold
                rows.append(
                    (
                        int(sx),
                        int(sy),
                        int(mask.sum()),
                        int(d.sum()),
                        int((mask * w).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["sx", "sy", "n_changed", "abs_diff", "mask_cks"]
            )

    schema = StructType(
        [StructField(c, LongType()) for c in
         ("sx", "sy", "n_changed", "abs_diff", "mask_cks")]
    )
    return j.mapInPandas(run, schema)


def diff_oracle_sql(
    width: int,
    height: int,
    tile_px: int,
    threshold: int,
    mul_a: int,
    add_a: int,
    mul_b: int,
    add_b: int,
) -> str:
    """DuckDB mirror: both LCG closed forms per pixel, identical
    threshold mask and integer fingerprints."""
    ts = tile_px
    n_sx, n_sy = width // ts, height // ts
    gidx = f"(sy * {ts} + y) * {width} + sx * {ts} + x"
    va = f"((({gidx}) * {mul_a} + {add_a}) % 4294967296) // 16777216"
    vb = f"((({gidx}) * {mul_b} + {add_b}) % 4294967296) // 16777216"
    return f"""
WITH t AS (
  SELECT tid % {n_sx} AS sx, tid // {n_sx} AS sy
  FROM (SELECT unnest(range({n_sx * n_sy})) AS tid)
),
px AS (
  SELECT sx, sy, xs.x, ys.y,
         abs(CAST({va} AS BIGINT) - CAST({vb} AS BIGINT)) AS d
  FROM t, range({ts}) xs(x), range({ts}) ys(y)
)
SELECT sx, sy,
       CAST(sum(CASE WHEN d > {threshold} THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(sum(d) AS BIGINT) AS abs_diff,
       CAST(sum(CASE WHEN d > {threshold} THEN y * {ts} + x + 1 ELSE 0 END) AS BIGINT) AS mask_cks
FROM px GROUP BY sx, sy
"""
