"""Best-pixel temporal composite (cloud-free mosaic).

The standard Earth-observation reduction: a tile is observed T times
(different acquisition dates), each observation carrying a per-pixel
validity mask (cloud/shadow/nodata); the composite keeps, per pixel,
the value from the LATEST valid observation (max-t rule — the
deterministic form of "most recent cloud-free pixel").  Pixels valid
in no observation compose to 0 and are counted.

Physical shape: one shuffle keyed on the tile id; each group holds
exactly the tile's T observations (bounded by the revisit count, so —
like pyramid/warp groups — skew-proof); the per-group reduction is a
vectorized argmax over the (T, px, px) stack, no per-pixel Python.

Exactness: values and masks are integers and the max-t selection is a
total order, so (n_filled, px_sum, px_cks, t_sum) are exact int64 —
a SQL engine replaying the same per-pixel rule reproduces them
bit-for-bit.  ``t_sum`` (sum of the chosen observation time per filled
pixel) pins WHICH observation won, not just the winning value.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("bytes", BinaryType()),
        StructField("n_filled", LongType()),
        StructField("px_sum", LongType()),
        StructField("px_cks", LongType()),
        StructField("t_sum", LongType()),
    ]
)


def best_pixel_composite(obs: DataFrame, tile_px: int) -> DataFrame:
    """Compose observations (x:long, y:long, t:long, bytes:binary,
    mask:binary — both raw uint8 tile_px² rasters; mask nonzero =
    INVALID pixel) into one tile per (x, y) by the max-t valid rule."""
    ts = tile_px

    def compose(pdf: pd.DataFrame) -> pd.DataFrame:
        x = int(pdf["x"].iloc[0])
        y = int(pdf["y"].iloc[0])
        order = pdf.sort_values("t", kind="mergesort")
        out = np.zeros((ts, ts), dtype=np.uint8)
        won_t = np.full((ts, ts), -1, dtype=np.int64)
        # ascending t: later valid observations overwrite earlier ones,
        # which IS the max-t rule
        for r in order.itertuples():
            v = np.frombuffer(r.bytes, dtype=np.uint8).reshape(ts, ts)
            m = np.frombuffer(r.mask, dtype=np.uint8).reshape(ts, ts)
            ok = m == 0
            out[ok] = v[ok]
            won_t[ok] = int(r.t)
        filled = won_t >= 0
        out[~filled] = 0
        lidx = (
            np.arange(ts)[:, None] * ts + np.arange(ts)[None, :]
        ).astype(np.int64)
        w = 1 + (lidx % 997)
        v64 = out.astype(np.int64)
        return pd.DataFrame(
            {
                "x": [x],
                "y": [y],
                "bytes": [out.tobytes()],
                "n_filled": [int(filled.sum())],
                "px_sum": [int(v64.sum())],
                "px_cks": [int((v64 * w).sum())],
                "t_sum": [int(won_t[filled].sum())],
            }
        )

    return obs.groupBy("x", "y").applyInPandas(compose, _OUT_SCHEMA)


# ----------------------------------------------------- fixture builder
def lcg_observations(
    spark,
    n_x: int,
    n_y: int,
    n_t: int,
    tile_px: int,
    cloud_mod: int = 5,
    partitions: int = 8,
) -> DataFrame:
    """Deterministic observation stack: for tile (x, y) at time t,
    pixel (i, j) with global index gidx = ((y*n_x + x)*n_t + t)*px² +
    j*px + i has value ``lcg(gidx) >> 24`` and is CLOUDED (invalid)
    iff ``lcg(gidx + 7777777) % cloud_mod == 0`` — the closed forms
    the SQL oracle evaluates; lcg(k) = (k*2654435761 + 99991) mod 2^32.
    """
    ts = tile_px

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for rid in b["id"]:
                rid = int(rid)
                t = rid % n_t
                tile = rid // n_t
                x, y = tile % n_x, tile // n_x
                jj = np.arange(ts, dtype=np.int64)[:, None]
                ii = np.arange(ts, dtype=np.int64)[None, :]
                gidx = ((y * n_x + x) * n_t + t) * ts * ts + jj * ts + ii
                v = (((gidx * 2654435761 + 99991) % (1 << 32)) >> 24).astype(
                    np.uint8
                )
                m = (
                    ((gidx + 7777777) * 2654435761 + 99991) % (1 << 32) % cloud_mod
                    == 0
                ).astype(np.uint8)
                rows.append((x, y, t, v.tobytes(), m.tobytes()))
            yield pd.DataFrame(rows, columns=["x", "y", "t", "bytes", "mask"])

    schema = StructType(
        [
            StructField("x", LongType()),
            StructField("y", LongType()),
            StructField("t", LongType()),
            StructField("bytes", BinaryType()),
            StructField("mask", BinaryType()),
        ]
    )
    return spark.range(n_x * n_y * n_t, numPartitions=partitions).mapInPandas(
        make, schema
    )


def composite_oracle_sql(
    n_x: int, n_y: int, n_t: int, tile_px: int, cloud_mod: int = 5
) -> str:
    """DuckDB mirror: per-pixel max-t-valid selection over the same
    LCG closed forms, aggregated to the exact-integer 4-tuple."""
    px2 = tile_px * tile_px
    gidx = f"((y * {n_x} + x) * {n_t} + t) * {px2} + lidx"
    val = f"(({gidx}) * 2654435761 + 99991) % 4294967296 // 16777216"
    cloud = f"((({gidx}) + 7777777) * 2654435761 + 99991) % 4294967296 % {cloud_mod} = 0"
    return f"""
WITH px AS (
  SELECT xx.range AS x, yy.range AS y, tt.range AS t, ll.range AS lidx
  FROM range({n_x}) xx, range({n_y}) yy, range({n_t}) tt, range({px2}) ll
),
valid AS (
  SELECT x, y, lidx, max(t) AS won_t
  FROM px WHERE NOT ({cloud}) GROUP BY 1, 2, 3
),
chosen AS (
  SELECT g.x, g.y, g.lidx,
         CASE WHEN v.won_t IS NULL THEN 0
              ELSE (((g.y * {n_x} + g.x) * {n_t} + v.won_t) * {px2} + g.lidx)
                   * 2654435761 + 99991 END AS raw,
         v.won_t
  FROM (SELECT DISTINCT x, y, lidx FROM px) g
  LEFT JOIN valid v ON v.x = g.x AND v.y = g.y AND v.lidx = g.lidx
)
SELECT x, y,
       CAST(count(won_t) AS BIGINT) AS n_filled,
       CAST(sum(CASE WHEN won_t IS NULL THEN 0
                     ELSE raw % 4294967296 // 16777216 END) AS BIGINT) AS px_sum,
       CAST(sum((CASE WHEN won_t IS NULL THEN 0
                      ELSE raw % 4294967296 // 16777216 END)
                * (1 + lidx % 997)) AS BIGINT) AS px_cks,
       CAST(coalesce(sum(won_t), 0) AS BIGINT) AS t_sum
FROM chosen GROUP BY x, y
"""
