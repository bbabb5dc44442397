"""Tiled raster stencils with halo exchange (Sobel edge magnitude).

Neighborhood operators (gradient/slope/hillshade/edge detection) are
the canonical distributed-raster computation: a 3×3 kernel at a tile's
border needs ONE pixel of each neighboring tile, so the naive plan
ships every tile to its 8 neighbors (9× shuffle amplification).  The
correct pattern — implemented here — is HALO EXCHANGE: each tile ships
only its 1-px edge strips (4×tile_px bytes) and corner pixels (4
bytes) to the neighbors that need them, plus its full body to itself,
for a shuffle volume of ~1.06× the input instead of 9×.

Pipeline: one narrow mapInPandas emits the 9 addressed fragments per
tile; one bounded-group shuffle (≤ 9 fragments per target — skew-proof
like pyramid/warp groups) assembles the (tile_px+2)² padded canvas
(outside-grid halo = 0, the documented boundary rule) and applies the
kernel as pure integer numpy slicing.

Kernel: Sobel, mag = |gx| + |gy| clamped to 255 —
    gx = (E column sums, weights 1/2/1) − (W column sums)
    gy = (S row sums,    weights 1/2/1) − (N row sums)
All arithmetic is int64 on uint8 inputs, so (n_hi, mag_sum, mag_cks)
are exact and a SQL engine evaluating the same 12-term expression per
pixel (with values from the lcg closed form and the same zero-outside
rule) reproduces them bit-for-bit.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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
        StructField("dx", IntegerType()),   # fragment origin relative to target
        StructField("dy", IntegerType()),
        StructField("frag", BinaryType()),
    ]
)

_OUT_SCHEMA = StructType(
    [
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("bytes", BinaryType()),
        StructField("n_hi", LongType()),
        StructField("mag_sum", LongType()),
        StructField("mag_cks", LongType()),
    ]
)


def halo_fragments(
    tiles: DataFrame, tile_px: int, n_x: int, n_y: int
) -> DataFrame:
    """One narrow ``mapInPandas``: each tile addresses its full body to
    itself plus 1-px edge strips / corner pixels to the neighbors that
    need them — the shared front half of every 3×3 stencil here
    (Sobel, Horn slope/aspect).  Shuffle volume ~1.06× input."""
    ts = tile_px

    def emit_frags(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                x, y = int(r.x), int(r.y)
                v = np.frombuffer(r.bytes, dtype=np.uint8).reshape(ts, ts)
                # self: full body
                rows.append((x, y, 0, 0, r.bytes))
                # edge strips to lateral neighbors (origin offset dx/dy
                # tells the assembler WHERE the fragment sits)
                if x + 1 < n_x:
                    rows.append((x + 1, y, -1, 0, v[:, -1].tobytes()))
                if x > 0:
                    rows.append((x - 1, y, 1, 0, v[:, 0].tobytes()))
                if y + 1 < n_y:
                    rows.append((x, y + 1, 0, -1, v[-1, :].tobytes()))
                if y > 0:
                    rows.append((x, y - 1, 0, 1, v[0, :].tobytes()))
                # corner pixels to diagonal neighbors
                if x + 1 < n_x and y + 1 < n_y:
                    rows.append((x + 1, y + 1, -1, -1, v[-1:, -1].tobytes()))
                if x > 0 and y + 1 < n_y:
                    rows.append((x - 1, y + 1, 1, -1, v[-1:, 0].tobytes()))
                if x + 1 < n_x and y > 0:
                    rows.append((x + 1, y - 1, -1, 1, v[:1, -1].tobytes()))
                if x > 0 and y > 0:
                    rows.append((x - 1, y - 1, 1, 1, v[:1, 0].tobytes()))
            yield pd.DataFrame(rows, columns=["x", "y", "dx", "dy", "frag"])

    return tiles.mapInPandas(emit_frags, _FRAG_SCHEMA)


def assemble_pad(pdf: pd.DataFrame, ts: int) -> tuple:
    """Rebuild one target tile's (ts+2)² padded canvas from its ≤9
    addressed fragments (outside-grid halo = 0).  Returns (x, y, pad
    int64)."""
    x = int(pdf["x"].iloc[0])
    y = int(pdf["y"].iloc[0])
    pad = np.zeros((ts + 2, ts + 2), dtype=np.int64)
    for r in pdf.itertuples():
        a = np.frombuffer(r.frag, dtype=np.uint8)
        dx, dy = int(r.dx), int(r.dy)
        if dx == 0 and dy == 0:
            pad[1 : ts + 1, 1 : ts + 1] = a.reshape(ts, ts)
        elif dy == 0:  # vertical strip from an E/W neighbor
            col = 0 if dx == -1 else ts + 1
            pad[1 : ts + 1, col] = a
        elif dx == 0:  # horizontal strip from an N/S neighbor
            row = 0 if dy == -1 else ts + 1
            pad[row, 1 : ts + 1] = a
        else:  # corner pixel
            pad[0 if dy == -1 else ts + 1, 0 if dx == -1 else ts + 1] = a[0]
    return x, y, pad


def sobel_tiles(
    tiles: DataFrame,
    tile_px: int,
    n_x: int,
    n_y: int,
    hi_thresh: int = 128,
) -> DataFrame:
    """``tiles``: (x:long, y:long, bytes:binary raw uint8 tile_px²) on
    an n_x × n_y tile grid.  Returns per tile the Sobel edge-magnitude
    raster (uint8, clamped 255) and the exact-integer triple
    (n_hi = pixels with mag > hi_thresh, mag_sum, position-weighted
    mag_cks)."""
    ts = tile_px
    frags = halo_fragments(tiles, ts, n_x, n_y)

    def convolve(pdf: pd.DataFrame) -> tuple:
        x, y, pad = assemble_pad(pdf, ts)
        e = pad[0:-2, 2:] + 2 * pad[1:-1, 2:] + pad[2:, 2:]
        w = pad[0:-2, 0:-2] + 2 * pad[1:-1, 0:-2] + pad[2:, 0:-2]
        s = pad[2:, 0:-2] + 2 * pad[2:, 1:-1] + pad[2:, 2:]
        n = pad[0:-2, 0:-2] + 2 * pad[0:-2, 1:-1] + pad[0:-2, 2:]
        mag = np.abs(e - w) + np.abs(s - n)
        out = np.minimum(mag, 255).astype(np.uint8)
        lidx = (np.arange(ts)[:, None] * ts + np.arange(ts)[None, :]).astype(
            np.int64
        )
        wgt = 1 + (lidx % 997)
        m64 = out.astype(np.int64)
        return (
            x,
            y,
            out.tobytes(),
            int((m64 > hi_thresh).sum()),
            int(m64.sum()),
            int((m64 * wgt).sum()),
        )

    cols = ["x", "y", "bytes", "n_hi", "mag_sum", "mag_cks"]
    return fused_group_map(frags, ["x", "y"], convolve, cols, _OUT_SCHEMA)


def sobel_oracle_sql(
    n_x: int, n_y: int, tile_px: int, hi_thresh: int = 128
) -> str:
    """DuckDB mirror over the warp.lcg_tiles closed form: the same
    12-term Sobel per pixel with zero outside the grid, clamped,
    aggregated per tile to the exact triple."""
    ts = tile_px
    w, h = n_x * ts, n_y * ts

    def v(ax, ay):
        gidx = f"(({ay}) * {w} + ({ax}))"
        val = f"(({gidx}) * 2654435761 + 12345) % 4294967296 // 16777216"
        return (
            f"(CASE WHEN ({ax}) >= 0 AND ({ax}) < {w} AND ({ay}) >= 0 AND ({ay}) < {h} "
            f"THEN {val} ELSE 0 END)"
        )

    a, b = "gxg", "gyg"
    e = f"({v(f'{a}+1', f'{b}-1')} + 2 * {v(f'{a}+1', b)} + {v(f'{a}+1', f'{b}+1')})"
    ww = f"({v(f'{a}-1', f'{b}-1')} + 2 * {v(f'{a}-1', b)} + {v(f'{a}-1', f'{b}+1')})"
    s = f"({v(f'{a}-1', f'{b}+1')} + 2 * {v(a, f'{b}+1')} + {v(f'{a}+1', f'{b}+1')})"
    n = f"({v(f'{a}-1', f'{b}-1')} + 2 * {v(a, f'{b}-1')} + {v(f'{a}+1', f'{b}-1')})"
    return f"""
WITH px AS (
  SELECT xx.range AS x, yy.range AS y, i.range AS px, j.range AS py,
         xx.range * {ts} + i.range AS gxg,
         yy.range * {ts} + j.range AS gyg
  FROM range({n_x}) xx, range({n_y}) yy, range({ts}) i, range({ts}) j
),
m AS (
  SELECT x, y, py * {ts} + px AS lidx,
         least(abs({e} - {ww}) + abs({s} - {n}), 255) AS mag
  FROM px
)
SELECT x, y,
       CAST(sum(CASE WHEN mag > {hi_thresh} THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
       CAST(sum(mag) AS BIGINT) AS mag_sum,
       CAST(sum(mag * (1 + lidx % 997)) AS BIGINT) AS mag_cks
FROM m GROUP BY x, y
"""


_HORN_SCHEMA = StructType(
    [StructField("x", LongType()), StructField("y", LongType())]
    + [
        StructField(c, LongType())
        for c in ("n_flat", "n_steep", "slope_sum", "oct_cks")
    ]
    + [StructField(f"o{i}", LongType()) for i in range(8)]
)


def _aspect_octant(p: np.ndarray, qn: np.ndarray) -> np.ndarray:
    """45°-sector aspect from the gradient (p eastward, qn northward):
    sectors [0,45),[45,90),…,[315,360) — every boundary is a 45°
    multiple, so classification is PURE INTEGER comparisons (no atan2,
    bit-identical in any engine).  Flat (p=qn=0) returns -1."""
    ap, aq = np.abs(p), np.abs(qn)
    oct_ = np.select(
        [
            (p > 0) & (qn >= 0) & (aq < ap),
            (p > 0) & (qn >= 0),
            (p <= 0) & (qn > 0) & (ap < aq),
            (p <= 0) & (qn > 0),
            (p < 0) & (qn <= 0) & (aq < ap),
            (p < 0) & (qn <= 0),
            (p >= 0) & (qn < 0) & (ap < aq),
            (p >= 0) & (qn < 0),
        ],
        [0, 1, 2, 3, 4, 5, 6, 7],
        default=-1,
    )
    return oct_.astype(np.int64)


def horn_tiles(
    tiles: DataFrame,
    tile_px: int,
    n_x: int,
    n_y: int,
    steep_thresh: int = 96,
) -> DataFrame:
    """Horn's method slope/aspect over a tiled integer DEM (the
    terrain-analysis sibling of :func:`sobel_tiles`, same halo
    exchange).  Per pixel the Horn 3×3 gradient numerators
    p = (E₁+2E₂+E₃) − (W…), q = (S…) − (N…) are exact int64; per tile
    returns (n_flat, n_steep = p²+q² > thresh², slope_sum = Σ(p²+q²),
    position-weighted octant checksum, and the 8-sector aspect
    histogram o0..o7 — sector boundaries at 45° multiples make the
    classification integer-exact, no atan2).  Outside-grid halo = 0,
    the sobel boundary rule."""
    ts = tile_px
    frags = halo_fragments(tiles, ts, n_x, n_y)
    t2 = steep_thresh * steep_thresh

    def kernel(pdf: pd.DataFrame) -> tuple:
        x, y, pad = assemble_pad(pdf, ts)
        e = pad[0:-2, 2:] + 2 * pad[1:-1, 2:] + pad[2:, 2:]
        w = pad[0:-2, 0:-2] + 2 * pad[1:-1, 0:-2] + pad[2:, 0:-2]
        s = pad[2:, 0:-2] + 2 * pad[2:, 1:-1] + pad[2:, 2:]
        n = pad[0:-2, 0:-2] + 2 * pad[0:-2, 1:-1] + pad[0:-2, 2:]
        p = e - w
        qn = n - s  # northward gradient
        s2 = p * p + qn * qn
        oct_ = _aspect_octant(p, qn)
        lidx = (
            np.arange(ts)[:, None] * ts + np.arange(ts)[None, :]
        ).astype(np.int64)
        wgt = 1 + (lidx % 997)
        flat = oct_ < 0
        hist = [int((oct_ == i).sum()) for i in range(8)]
        return (
            x,
            y,
            int(flat.sum()),
            int((s2 > t2).sum()),
            int(s2.sum()),
            int(((oct_ + 1) * wgt * ~flat).sum()),
            *hist,
        )

    cols = ["x", "y", "n_flat", "n_steep", "slope_sum", "oct_cks"] + [
        f"o{i}" for i in range(8)
    ]
    return fused_group_map(frags, ["x", "y"], kernel, cols, _HORN_SCHEMA)


def horn_oracle_sql(
    n_x: int, n_y: int, tile_px: int, steep_thresh: int = 96
) -> str:
    """DuckDB mirror of :func:`horn_tiles` over the warp.lcg_tiles
    closed form: identical integer gradient numerators, the same
    45°-boundary CASE octant, identical rollup."""
    ts = tile_px
    w, h = n_x * ts, n_y * ts

    def v(ax, ay):
        gidx = f"(({ay}) * {w} + ({ax}))"
        val = f"(({gidx}) * 2654435761 + 12345) % 4294967296 // 16777216"
        return (
            f"(CASE WHEN ({ax}) >= 0 AND ({ax}) < {w} AND ({ay}) >= 0 AND ({ay}) < {h} "
            f"THEN {val} ELSE 0 END)"
        )

    a, b = "gxg", "gyg"
    e = f"({v(f'{a}+1', f'{b}-1')} + 2 * {v(f'{a}+1', b)} + {v(f'{a}+1', f'{b}+1')})"
    ww = f"({v(f'{a}-1', f'{b}-1')} + 2 * {v(f'{a}-1', b)} + {v(f'{a}-1', f'{b}+1')})"
    s = f"({v(f'{a}-1', f'{b}+1')} + 2 * {v(a, f'{b}+1')} + {v(f'{a}+1', f'{b}+1')})"
    n = f"({v(f'{a}-1', f'{b}-1')} + 2 * {v(a, f'{b}-1')} + {v(f'{a}+1', f'{b}-1')})"
    t2 = steep_thresh * steep_thresh
    octs = [
        f"sum(CASE WHEN oct = {i} THEN 1 ELSE 0 END)" for i in range(8)
    ]
    oct_cols = ",\n       ".join(
        f"CAST({e_} AS BIGINT) AS o{i}" for i, e_ in enumerate(octs)
    )
    return f"""
WITH px AS (
  SELECT xx.range AS x, yy.range AS y, i.range AS px, j.range AS py,
         xx.range * {ts} + i.range AS gxg,
         yy.range * {ts} + j.range AS gyg
  FROM range({n_x}) xx, range({n_y}) yy, range({ts}) i, range({ts}) j
),
g AS (
  SELECT x, y, py * {ts} + px AS lidx,
         {e} - {ww} AS p, {n} - {s} AS qn
  FROM px
),
m AS (
  SELECT x, y, lidx, p, qn, p * p + qn * qn AS s2,
         CASE
           WHEN p = 0 AND qn = 0 THEN -1
           WHEN p > 0 AND qn >= 0 AND abs(qn) < abs(p) THEN 0
           WHEN p > 0 AND qn >= 0 THEN 1
           WHEN p <= 0 AND qn > 0 AND abs(p) < abs(qn) THEN 2
           WHEN p <= 0 AND qn > 0 THEN 3
           WHEN p < 0 AND qn <= 0 AND abs(qn) < abs(p) THEN 4
           WHEN p < 0 AND qn <= 0 THEN 5
           WHEN p >= 0 AND qn < 0 AND abs(p) < abs(qn) THEN 6
           ELSE 7
         END AS oct
  FROM g
)
SELECT x, y,
       CAST(sum(CASE WHEN oct = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_flat,
       CAST(sum(CASE WHEN s2 > {t2} THEN 1 ELSE 0 END) AS BIGINT) AS n_steep,
       CAST(sum(s2) AS BIGINT) AS slope_sum,
       CAST(sum(CASE WHEN oct >= 0 THEN (oct + 1) * (1 + lidx % 997) ELSE 0 END) AS BIGINT) AS oct_cks,
       {oct_cols}
FROM m GROUP BY x, y
"""
