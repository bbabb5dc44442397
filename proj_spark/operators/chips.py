"""Training-chip extraction: fixed-size image chips cut from a tiled
raster by AOI bounding box.

The standard ML-dataset step for geospatial imagery: given 10^6..10^9
chip requests (detection labels, sample sites) against a continental
tile pyramid, emit one out_px × out_px image per request, resampled
(nearest-neighbor) over the request's bbox.  The per-pixel map is the
pure affine

    lon_j = lon_w + (j + 0.5) * (lon_e - lon_w) / out_px
    lat_i = lat_n - (i + 0.5) * (lat_n - lat_s) / out_px

— no transcendentals at all, so unlike the web-mercator warp the chip
lane is exactly reproducible in ANY engine evaluating the same
rational expression tree (the DuckDB oracle checks every pixel through
the integer checksum triple).

Physical shape (same family as operators/warp.py):
- the chip table (small relative to the raster) computes its source
  tile ranges as pure expressions and broadcasts; the tile side (the
  big side) never shuffles for the join;
- one shuffle groups each chip's overlapping tiles (fan bounded by
  ceil(bbox/tile)^2 — validated against ``max_fan``);
- per-group assembly is one vectorized numpy gather.
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
    StringType,
    StructField,
    StructType,
)

from .warp import LatLonGrid, fused_group_map

_OUT_SCHEMA = StructType(
    [
        StructField("chip_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("n_valid", LongType()),
        StructField("px_sum", LongType()),
        StructField("px_cks", LongType()),
    ]
)


def extract_chips(
    tiles: DataFrame,
    chips: DataFrame,
    grid: LatLonGrid,
    out_px: int = 64,
    max_fan: int = 64,
    fused: bool = True,
) -> DataFrame:
    """``chips``: (chip_id string, lon_w, lat_s, lon_e, lat_n double,
    with lon_w < lon_e, lat_s < lat_n); ``tiles``: (sx, sy, bytes) raw
    uint8 tile_px² rasters on ``grid``.  Returns one row per chip that
    overlaps ≥ 1 source tile; pixels outside the grid extent are 0 and
    excluded from ``n_valid``.  ``fused=True`` routes the per-chip
    kernel through :func:`warp.fused_group_map` (no per-group Arrow
    framing); ``fused=False`` keeps plain applyInPandas — identical
    output, asserted in tests."""
    ts = grid.tile_px
    step_x = grid.dlon * ts
    step_y = grid.dlat * ts
    n_sx = (grid.width + ts - 1) // ts
    n_sy = (grid.height + ts - 1) // ts

    sx_lo = F.greatest(
        F.floor((F.col("lon_w") - F.lit(grid.lon0)) / F.lit(step_x)), F.lit(0)
    ).cast("long")
    sx_hi = F.least(
        F.floor((F.col("lon_e") - F.lit(grid.lon0)) / F.lit(step_x)),
        F.lit(n_sx - 1),
    ).cast("long")
    sy_lo = F.greatest(
        F.floor((F.lit(grid.lat0) - F.col("lat_n")) / F.lit(step_y)), F.lit(0)
    ).cast("long")
    sy_hi = F.least(
        F.floor((F.lit(grid.lat0) - F.col("lat_s")) / F.lit(step_y)),
        F.lit(n_sy - 1),
    ).cast("long")
    cand = (
        chips.where(
            (F.col("lon_e") > F.lit(grid.lon0))
            & (F.col("lon_w") < F.lit(grid.lon_max))
            & (F.col("lat_n") > F.lit(grid.lat_min))
            & (F.col("lat_s") < F.lit(grid.lat0))
        )
        .withColumn("_fan", (sx_hi - sx_lo + 1) * (sy_hi - sy_lo + 1))
        .withColumn("sx", F.explode(F.sequence(sx_lo, sx_hi)))
        .withColumn("sy", F.explode(F.sequence(sy_lo, sy_hi)))
        .select("chip_id", "lon_w", "lat_s", "lon_e", "lat_n", "_fan", "sx", "sy")
    )
    joined = tiles.join(F.broadcast(cand), on=["sx", "sy"], how="inner")

    g = grid
    opx = out_px

    def assemble(pdf: pd.DataFrame) -> tuple:
        fan = int(pdf["_fan"].iloc[0])
        if fan > max_fan:
            raise ValueError(
                f"chip {pdf['chip_id'].iloc[0]!r} spans {fan} source tiles "
                f"> max_fan={max_fan}; shrink the bbox or coarsen the grid"
            )
        lon_w = float(pdf["lon_w"].iloc[0])
        lat_s = float(pdf["lat_s"].iloc[0])
        lon_e = float(pdf["lon_e"].iloc[0])
        lat_n = float(pdf["lat_n"].iloc[0])
        srcs = {
            (int(r.sx), int(r.sy)): np.frombuffer(r.bytes, dtype=np.uint8).reshape(
                g.tile_px, g.tile_px
            )
            for r in pdf.itertuples()
        }
        jj = np.arange(opx, dtype=np.float64)
        lon_t = lon_w + (jj + 0.5) * (lon_e - lon_w) / opx
        ii = np.arange(opx, dtype=np.float64)
        lat_t = lat_n - (ii + 0.5) * (lat_n - lat_s) / opx
        gx = np.floor((lon_t - g.lon0) / g.dlon).astype(np.int64)
        gy = np.floor((g.lat0 - lat_t) / g.dlat).astype(np.int64)
        vx = (gx >= 0) & (gx < g.width)
        vy = (gy >= 0) & (gy < g.height)
        valid = vy[:, None] & vx[None, :]
        gxm = np.clip(gx, 0, g.width - 1)
        gym = np.clip(gy, 0, g.height - 1)
        sxq = (gxm[None, :] // g.tile_px) + np.zeros((opx, 1), dtype=np.int64)
        syq = (gym[:, None] // g.tile_px) + np.zeros((1, opx), dtype=np.int64)
        vals = np.zeros((opx, opx), dtype=np.uint8)
        for (sx, sy), arr in srcs.items():
            m = (sxq == sx) & (syq == sy)
            if not m.any():
                continue
            rows, cols = np.nonzero(m)
            vals[rows, cols] = arr[
                gym[rows] - sy * g.tile_px, gxm[cols] - sx * g.tile_px
            ]
        vals[~valid] = 0
        lidx = (np.arange(opx)[:, None] * opx + np.arange(opx)[None, :]).astype(
            np.int64
        )
        w = 1 + (lidx % 997)
        v64 = vals.astype(np.int64)
        return (
            pdf["chip_id"].iloc[0],
            vals.tobytes(),
            int(valid.sum()),
            int(v64.sum()),
            int((v64 * w).sum()),
        )

    cols = ["chip_id", "bytes", "n_valid", "px_sum", "px_cks"]
    if fused:
        return fused_group_map(joined, ["chip_id"], assemble, cols, _OUT_SCHEMA)
    return joined.groupBy("chip_id").applyInPandas(
        lambda pdf: pd.DataFrame([assemble(pdf)], columns=cols), _OUT_SCHEMA
    )


def chips_oracle_sql(
    chips: list[tuple[str, float, float, float, float]],
    grid: LatLonGrid,
    out_px: int = 64,
) -> str:
    """DuckDB mirror: per-pixel affine mapping with the identical
    rational expression trees over a VALUES chip table + the lcg_tiles
    pixel closed form (warp.lcg_tiles), aggregated to the exact triple.
    Chips fully outside the grid extent are excluded (no tile join)."""
    vals = ",".join(
        f"('{cid}', {w!r}, {s!r}, {e!r}, {n!r})" for cid, w, s, e, n in chips
    )
    lon = f"(lon_w + (px + 0.5) * (lon_e - lon_w) / {out_px})"
    lat = f"(lat_n - (py + 0.5) * (lat_n - lat_s) / {out_px})"
    gx = f"CAST(floor((({lon}) - {grid.lon0!r}) / {grid.dlon!r}) AS BIGINT)"
    gy = f"CAST(floor(({grid.lat0!r} - ({lat})) / {grid.dlat!r}) AS BIGINT)"
    return f"""
WITH c0 AS (
  SELECT chip_id, CAST(c1 AS DOUBLE) AS lon_w, CAST(c2 AS DOUBLE) AS lat_s,
         CAST(c3 AS DOUBLE) AS lon_e, CAST(c4 AS DOUBLE) AS lat_n
  FROM (VALUES {vals}) AS t(chip_id, c1, c2, c3, c4)
),
c AS (
  SELECT * FROM c0
  WHERE lon_e > {grid.lon0!r} AND lon_w < {grid.lon_max!r}
    AND lat_n > {grid.lat_min!r} AND lat_s < {grid.lat0!r}
),
m AS (
  SELECT chip_id, y.range * {out_px} + x.range AS lidx,
         {gx.replace('px', 'x.range').replace('py', 'y.range')} AS gx,
         {gy.replace('px', 'x.range').replace('py', 'y.range')} AS gy
  FROM c, range(0, {out_px}) x, range(0, {out_px}) y
),
v AS (
  SELECT chip_id, lidx,
         CASE WHEN gx >= 0 AND gx < {grid.width} AND gy >= 0 AND gy < {grid.height}
              THEN 1 ELSE 0 END AS ok,
         CASE WHEN gx >= 0 AND gx < {grid.width} AND gy >= 0 AND gy < {grid.height}
              THEN ((gy * {grid.width} + gx) * 2654435761 + 12345) % 4294967296 // 16777216
              ELSE 0 END AS val
  FROM m
)
SELECT chip_id,
       CAST(sum(ok) AS BIGINT) AS n_valid,
       CAST(sum(val) AS BIGINT) AS px_sum,
       CAST(sum(val * (1 + lidx % 997)) AS BIGINT) AS px_cks
FROM v GROUP BY chip_id
"""
