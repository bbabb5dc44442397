"""Image augmentation lane: dihedral (rot90/flip/transpose) tile ops.

Training-data pipelines augment imagery with the 8 elements of the
dihedral group D4 — the lossless, exactly-invertible augmentations
(unlike crops/color jitter there is no resampling, so the pipeline
can be verified pixel-exactly).  This operator applies a
DETERMINISTIC per-tile op (op = (sx*3 + sy) mod 8) to real ndarray
pixel buffers and emits an exact-integer fingerprint per output tile:
plain sum, position-weighted sum (catches any index-mapping mistake —
a transposed or off-by-one output changes the weighted sum even when
the plain sum is identical), and the four corners.

Scale shape: pure narrow mapInPandas over the tile rows — the payload
bytes never shuffle, there is NO exchange at all before the caller's
aggregate; each tile is O(tile_px^2) local numpy work.  This is the
same decode-transform-fingerprint shape the JPEG payload lane uses
(operators/multimodal.py), with the LCG raster standing in for
decoded pixels so the DuckDB oracle can replay every output pixel via
the closed-form source-index mapping.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (API symmetry)
from pyspark.sql.types import LongType, StructField, StructType

#: op id -> human name, in (sx*3 + sy) % 8 order
D4_OPS = (
    "identity",
    "rot90",
    "rot180",
    "rot270",
    "fliplr",
    "flipud",
    "transpose",
    "antitranspose",
)


def _apply(v: np.ndarray, op: int) -> np.ndarray:
    if op == 0:
        return v
    if op == 1:
        return np.rot90(v)
    if op == 2:
        return np.rot90(v, 2)
    if op == 3:
        return np.rot90(v, 3)
    if op == 4:
        return np.fliplr(v)
    if op == 5:
        return np.flipud(v)
    if op == 6:
        return v.T
    return np.rot90(v, 2).T  # anti-transpose


def augment_tiles(tiles: DataFrame, tile_px: int) -> DataFrame:
    """(sx, sy, op, sum_v, wsum, c00, c10, c01, c11) per input tile.

    ``tiles`` needs (sx, sy, bytes) with bytes = tile_px*tile_px uint8
    row-major pixels (lcg_tiles shape, or any decoded grayscale tile).
    wsum weights output pixel (x, y) by (y*tile_px + x + 1).
    """
    ts = tile_px
    w = np.arange(ts * ts, dtype=np.int64).reshape(ts, ts) + 1

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for sx, sy, buf in zip(b["sx"], b["sy"], b["bytes"]):
                v = np.frombuffer(buf, dtype=np.uint8).reshape(ts, ts)
                op = (int(sx) * 3 + int(sy)) % 8
                o = _apply(v, op).astype(np.int64)
                rows.append(
                    (
                        int(sx),
                        int(sy),
                        op,
                        int(o.sum()),
                        int((o * w).sum()),
                        int(o[0, 0]),
                        int(o[0, ts - 1]),
                        int(o[ts - 1, 0]),
                        int(o[ts - 1, ts - 1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "sx", "sy", "op", "sum_v", "wsum", "c00", "c10", "c01", "c11",
                ],
            )

    schema = StructType(
        [StructField(c, LongType()) for c in
         ("sx", "sy", "op", "sum_v", "wsum", "c00", "c10", "c01", "c11")]
    )
    return tiles.mapInPandas(run, schema)


def augment_oracle_sql(width: int, height: int, tile_px: int) -> str:
    """DuckDB mirror: for every output pixel of every tile, the D4
    source-index mapping, the LCG closed-form pixel value, and the
    identical integer fingerprint aggregate."""
    ts = tile_px
    n_sx, n_sy = width // ts, height // ts
    # source LOCAL coords (gx_l, gy_l) for output (x, y) under each op
    gx_l = f"""CASE op
      WHEN 0 THEN x WHEN 1 THEN {ts - 1} - y WHEN 2 THEN {ts - 1} - x
      WHEN 3 THEN y WHEN 4 THEN {ts - 1} - x WHEN 5 THEN x
      WHEN 6 THEN y ELSE {ts - 1} - y END"""
    gy_l = f"""CASE op
      WHEN 0 THEN y WHEN 1 THEN x WHEN 2 THEN {ts - 1} - y
      WHEN 3 THEN {ts - 1} - x WHEN 4 THEN y WHEN 5 THEN {ts - 1} - y
      WHEN 6 THEN x ELSE {ts - 1} - x END"""
    gidx = f"(sy * {ts} + ({gy_l})) * {width} + sx * {ts} + ({gx_l})"
    v = f"((({gidx}) * 2654435761 + 12345) % 4294967296) // 16777216"
    return f"""
WITH t AS (
  SELECT tid % {n_sx} AS sx, tid // {n_sx} AS sy,
         (tid % {n_sx}) * 3 + tid // {n_sx} AS op0
  FROM (SELECT unnest(range({n_sx * n_sy})) AS tid)
),
px AS (
  SELECT sx, sy, op0 % 8 AS op, xs.x, ys.y
  FROM t, range({ts}) xs(x), range({ts}) ys(y)
),
val AS (
  SELECT sx, sy, op, x, y, CAST({v} AS BIGINT) AS pv FROM px
)
SELECT sx, sy, CAST(op AS BIGINT) AS op,
       CAST(sum(pv) AS BIGINT) AS sum_v,
       CAST(sum(pv * (y * {ts} + x + 1)) AS BIGINT) AS wsum,
       CAST(min(CASE WHEN x = 0 AND y = 0 THEN pv END) AS BIGINT) AS c00,
       CAST(min(CASE WHEN x = {ts - 1} AND y = 0 THEN pv END) AS BIGINT) AS c10,
       CAST(min(CASE WHEN x = 0 AND y = {ts - 1} THEN pv END) AS BIGINT) AS c01,
       CAST(min(CASE WHEN x = {ts - 1} AND y = {ts - 1} THEN pv END) AS BIGINT) AS c11
FROM val GROUP BY sx, sy, op
"""
