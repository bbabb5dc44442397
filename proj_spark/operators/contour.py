"""Marching-squares contour extraction over a tiled raster.

The raster→vector primitive the inventory still lacked: given a tiled
uint8 raster and an iso level, classify every 2×2 pixel cell into its
marching-squares case (4 corner bits → 0..15) and count the contour
segments the case emits (cases 0/15: none; the two saddle cases 5/10:
two; every other case: one).  This is the kernel under isoline maps,
terrain contours, and mask-boundary vectorization.

Scale shape: the 2×2 window at a tile's right/bottom border needs ONE
pixel column/row of the E/S/SE neighbors, so the halo is even leaner
than the 3×3 Sobel stencil (`stencil.py`): each tile ships its full
body to itself plus its FIRST column west, FIRST row north and
top-left pixel north-west — 3 addressed fragments of ~tile_px bytes
against Sobel's 8, shuffle volume ~1.03× the raster.  One bounded
(≤4-fragment) group assembly per tile, then pure integer numpy.

Cell ownership: tile (x, y) owns cells whose TOP-LEFT pixel lies in
the tile, except the global last pixel column/row (a cell needs all
four corners in-grid — no synthetic halo values, unlike Sobel's
zero-padding, because a contour case from fabricated corners would be
a fabricated contour).

Everything is integer (corner bits, case ids, a position-weighted
case checksum), so the DuckDB oracle replaying the 4 LCG closed forms
per cell reproduces the per-tile triples bit-for-bit.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .warp import fused_group_map

_FRAG_SCHEMA = StructType(
    [
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("dx", IntegerType()),
        StructField("dy", IntegerType()),
        StructField("frag", BinaryType()),
    ]
)

_OUT_SCHEMA = StructType(
    [
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("n_crossed", LongType()),
        StructField("n_segs", LongType()),
        StructField("case_cks", LongType()),
    ]
)

# segments emitted per marching-squares case: saddles (5, 10) emit 2
_SEGS_PER_CASE = np.array(
    [0, 1, 1, 1, 1, 2, 1, 1, 1, 1, 2, 1, 1, 1, 1, 0], dtype=np.int64
)


def contour_tiles(
    tiles: DataFrame, tile_px: int, n_x: int, n_y: int, iso: int
) -> DataFrame:
    """``tiles``: (x:long, y:long, bytes: raw uint8 tile_px²) on an
    n_x × n_y grid.  Returns per tile (n_crossed = cells whose case is
    neither 0 nor 15, n_segs = total contour segments, case_cks =
    Σ case · (1 + local_cell_idx % 997))."""
    ts = tile_px

    def emit_frags(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                x, y = int(r.x), int(r.y)
                v = np.frombuffer(r.bytes, dtype=np.uint8).reshape(ts, ts)
                rows.append((x, y, 0, 0, r.bytes))
                if x > 0:  # first column -> west neighbor's right halo
                    rows.append((x - 1, y, 1, 0, v[:, 0].tobytes()))
                if y > 0:  # first row -> north neighbor's bottom halo
                    rows.append((x, y - 1, 0, 1, v[0, :].tobytes()))
                if x > 0 and y > 0:  # top-left pixel -> NW corner halo
                    rows.append((x - 1, y - 1, 1, 1, v[:1, 0].tobytes()))
            yield pd.DataFrame(rows, columns=["x", "y", "dx", "dy", "frag"])

    frags = tiles.mapInPandas(emit_frags, _FRAG_SCHEMA)

    def march(pdf: pd.DataFrame) -> tuple:
        x = int(pdf["x"].iloc[0])
        y = int(pdf["y"].iloc[0])
        # cells owned by this tile: top-left pixel in-tile, all four
        # corners in-grid — edge tiles simply own fewer cells
        cw = ts if x + 1 < n_x else ts - 1
        ch = ts if y + 1 < n_y else ts - 1
        if cw == 0 or ch == 0:
            return (x, y, 0, 0, 0)
        pad = np.zeros((ts + 1, ts + 1), dtype=np.int64)
        for r in pdf.itertuples():
            a = np.frombuffer(r.frag, dtype=np.uint8)
            dx, dy = int(r.dx), int(r.dy)
            if dx == 0 and dy == 0:
                pad[:ts, :ts] = a.reshape(ts, ts)
            elif dy == 0:
                pad[:ts, ts] = a
            elif dx == 0:
                pad[ts, :ts] = a
            else:
                pad[ts, ts] = a[0]
        b = (pad >= iso).astype(np.int64)
        case = (
            b[:ch, :cw]
            + 2 * b[:ch, 1 : cw + 1]
            + 4 * b[1 : ch + 1, 1 : cw + 1]
            + 8 * b[1 : ch + 1, :cw]
        )
        lidx = np.arange(ch, dtype=np.int64)[:, None] * ts + np.arange(
            cw, dtype=np.int64
        )[None, :]
        wgt = 1 + (lidx % 997)
        crossed = (case != 0) & (case != 15)
        return (
            x,
            y,
            int(crossed.sum()),
            int(_SEGS_PER_CASE[case].sum()),
            int((case * wgt).sum()),
        )

    cols = ["x", "y", "n_crossed", "n_segs", "case_cks"]
    return fused_group_map(frags, ["x", "y"], march, cols, _OUT_SCHEMA)


def contour_oracle_sql(
    width: int, height: int, tile_px: int, iso: int, mul: int, add: int
) -> str:
    """DuckDB mirror: evaluate the LCG closed form at the cell's four
    corners, rebuild the case id and the identical integer triple."""
    ts = tile_px

    def v(ax, ay):
        gidx = f"(({ay}) * {width} + ({ax}))"
        return f"(CASE WHEN ((({gidx}) * {mul} + {add}) % 4294967296) // 16777216 >= {iso} THEN 1 ELSE 0 END)"

    case = (
        f"({v('gx', 'gy')} + 2 * {v('gx + 1', 'gy')}"
        f" + 4 * {v('gx + 1', 'gy + 1')} + 8 * {v('gx', 'gy + 1')})"
    )
    return f"""
WITH cell AS (
  SELECT xs.gx, ys.gy, {case} AS c,
         xs.gx // {ts} AS x, ys.gy // {ts} AS y,
         1 + ((ys.gy % {ts}) * {ts} + (xs.gx % {ts})) % 997 AS wgt
  FROM range({width - 1}) xs(gx), range({height - 1}) ys(gy)
)
SELECT x, y,
       CAST(sum(CASE WHEN c NOT IN (0, 15) THEN 1 ELSE 0 END) AS BIGINT) AS n_crossed,
       CAST(sum(CASE WHEN c IN (0, 15) THEN 0 WHEN c IN (5, 10) THEN 2 ELSE 1 END) AS BIGINT) AS n_segs,
       CAST(sum(c * wgt) AS BIGINT) AS case_cks
FROM cell GROUP BY x, y
"""
