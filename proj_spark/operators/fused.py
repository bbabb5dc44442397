"""Fused reproject -> point-in-polygon -> tile-rollup kernel.

The composed flagship plan (transform pandas UDF -> broadcast PIP
join -> tile exprs -> hash aggregate) is already one narrow stage plus
one tiny exchange, but at high core counts a single box exposes its
real cost center: every row crosses the JVM<->Python Arrow boundary
once (~3 memcpy passes through socket buffers) and then flows through
the interpreted higher-order first-match filter and the JVM hash
aggregate — several hundred bytes of memory traffic per row for ~40
bytes of payload.  Measured on the bench box, the numpy math itself
sustains ~6M rows/s/core with near-perfect multicore scaling, while
the composed stage saturates shared DRAM bandwidth at ~16M rows/s
TOTAL regardless of cores.

This operator fuses the whole per-row pipeline into ONE
``mapInPandas`` kernel with an in-Python partial aggregate:

  scan(lon, lat) -> [numpy: datum/projection transform (the same
  compiled ``plans.pipeline`` closure the ``transform`` operator
  ships), first-match ray-cast PIP (same formula as
  ``spatial_join._inside_expr``), slippy tile indices (same formula as
  ``functions.expressions.tile_x/tile_y``), np.unique partial
  aggregate] -> (packed key, count) -> one tiny exchange -> final sum.

Per task the Arrow return path carries |distinct (tile, poly)| rows —
bounded by the tile/polygon universe, NOT the input size — so the
JVM-side work after the scan is O(distinct keys).  This is map-side
combine pushed into the Python worker: the 10^12-row plan reads the
two coordinate columns, streams them through numpy once, and shuffles
a few thousand longs.

Semantics are IDENTICAL to the composed operators (asserted by
tests/test_fused.py and the ``fused_pip_tiles`` oracle query):
- transform: same compiled plan closure, same deg<->rad wrappers as
  ``functions.transform.transform_udf`` (bit-identical doubles).
- PIP: first containing polygon in input order wins (reference
  grid-list semantics, src/pj_apply_gridshift.c:143); the even-odd
  eastward ray cast is the same arithmetic expression as the native
  path, evaluated in float64 either way.  The exact-bbox prefilter
  admits a superset of the cell-cover candidates of
  ``point_in_polygon_join`` and the ray cast rejects the difference,
  so assignments match exactly.
- tiles: same clamp+floor arithmetic as ``expressions.tile_x/tile_y``
  (including ``lat / 180 * pi`` matching java.lang.Math.toRadians).

Scale notes: the polygon set ships inside the closure (same size
class as the broadcast cover table); the per-poly vectorized loop is
O(|polys in bbox range|) per batch, the right physical plan for the
flagship regime (<= ~10^3 polygons).  For very large polygon sets use
the cell-bucketed ``point_in_polygon_join``, which bounds per-point
candidates by cover-cell occupancy instead.
"""
from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..crs import CRS
from ..kernels import xmath as m
from ..plans.pipeline import build_plan

# packed rollup key layout: tx << 40 | ty << 20 | (poly_seq + 1)
_TY_SHIFT = 20
_TX_SHIFT = 40
_MASK = (1 << 20) - 1
_INVALID_KEY = -1  # non-finite transformed coordinate
# cap on accumulated (key, count) entries per task before re-merging
_MERGE_CAP = 4_000_000


def _poly_arrays(polys) -> list[tuple]:
    """[(poly_id, closed ring [(lon, lat), ...])] -> per-poly numpy
    edge arrays + bbox, in first-match priority order."""
    out = []
    for seq, (pid, ring) in enumerate(polys):
        xs = np.asarray([p[0] for p in ring], dtype=np.float64)
        ys = np.asarray([p[1] for p in ring], dtype=np.float64)
        out.append(
            (
                seq,
                pid,
                xs[:-1].copy(),  # x1
                ys[:-1].copy(),  # y1
                xs[1:].copy(),  # x2
                ys[1:].copy(),  # y2
                float(xs.min()),
                float(xs.max()),
                float(ys.min()),
                float(ys.max()),
            )
        )
    return out


def _raycast_inside(lon, lat, x1, y1, x2, y2) -> np.ndarray:
    """Even-odd eastward ray cast, same arithmetic as the native
    expression in spatial_join._inside_expr (float64 both ways)."""
    lo = lon[:, None]
    la = lat[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        crosses = ((y1 > la) != (y2 > la)) & (
            lo < (x2 - x1) * (la - y1) / (y2 - y1) + x1
        )
    return (crosses.sum(axis=1) % 2) == 1


def _tile_xy(lon, lat, zoom: int):
    """Slippy tile indices, mirroring expressions.tile_x/tile_y
    (F.radians == Math.toRadians == d / 180 * pi)."""
    n = float(2.0 ** float(zoom))
    tx = np.floor((lon + 180.0) / 360.0 * n)
    np.clip(tx, 0.0, n - 1.0, out=tx)
    t = np.tan(lat / 180.0 * np.pi)
    asinh_t = np.log(t + np.sqrt(t * t + 1.0))
    ty = np.floor((1.0 - asinh_t / math.pi) / 2.0 * n)
    np.clip(ty, 0.0, n - 1.0, out=ty)
    return tx, ty


def _make_kernel(src, dst, polys, zoom: int, id_mode: bool):
    src = CRS.from_proj4(src) if isinstance(src, str) else src
    dst = CRS.from_proj4(dst) if isinstance(dst, str) else dst
    plan = build_plan(src, dst)
    src_ll, dst_ll = src.is_latlong, dst.is_latlong
    parrays = _poly_arrays(polys)

    def _shift(x, y):
        # identical sequence of float64 ops to transform_udf
        if src_ll:
            x *= m.DEG_TO_RAD
            y *= m.DEG_TO_RAD
        xo, yo, _ = plan(x, y, None)
        if dst_ll:
            xo = xo * m.RAD_TO_DEG
            yo = yo * m.RAD_TO_DEG
        return xo, yo

    def _assign(lon, lat):
        """first-match poly_seq per point; -1 = miss."""
        res = np.full(lon.shape[0], -1, dtype=np.int64)
        for seq, _pid, x1, y1, x2, y2, bw, be, bs, bn in parrays:
            cand = (res < 0) & (lon >= bw) & (lon <= be) & (lat >= bs) & (lat <= bn)
            if not cand.any():
                continue
            ix = np.flatnonzero(cand)
            inside = _raycast_inside(lon[ix], lat[ix], x1, y1, x2, y2)
            res[ix[inside]] = seq
        return res

    def rollup(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys_acc: list[np.ndarray] = []
        cnts_acc: list[np.ndarray] = []

        def _merged():
            k = np.concatenate(keys_acc)
            c = np.concatenate(cnts_acc)
            uk, inv = np.unique(k, return_inverse=True)
            uc = np.zeros(uk.shape[0], dtype=np.int64)
            np.add.at(uc, inv, c)
            return uk, uc

        n_acc = 0
        for b in batches:
            x = b["lon"].to_numpy(dtype=np.float64, copy=True)
            y = b["lat"].to_numpy(dtype=np.float64, copy=True)
            lon, lat = _shift(x, y)
            ok = np.isfinite(lon) & np.isfinite(lat)
            key = np.full(lon.shape[0], _INVALID_KEY, dtype=np.int64)
            if ok.any():
                glon = lon[ok] if not ok.all() else lon
                glat = lat[ok] if not ok.all() else lat
                seq = _assign(glon, glat)
                tx, ty = _tile_xy(glon, glat, zoom)
                gk = (
                    (tx.astype(np.int64) << _TX_SHIFT)
                    | (ty.astype(np.int64) << _TY_SHIFT)
                    | (seq + 1)
                )
                if ok.all():
                    key = gk
                else:
                    key[ok] = gk
            uk, uc = np.unique(key, return_counts=True)
            keys_acc.append(uk)
            cnts_acc.append(uc)
            n_acc += uk.shape[0]
            if n_acc > _MERGE_CAP:
                uk, uc = _merged()
                keys_acc, cnts_acc, n_acc = [uk], [uc], uk.shape[0]
        if keys_acc:
            uk, uc = _merged()
            yield pd.DataFrame({"key": uk, "n": uc})

    def rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            x = b["lon"].to_numpy(dtype=np.float64, copy=True)
            y = b["lat"].to_numpy(dtype=np.float64, copy=True)
            lon, lat = _shift(x, y)
            seq = _assign(lon, lat)
            tx, ty = _tile_xy(lon, lat, zoom)
            ok = np.isfinite(lon) & np.isfinite(lat)
            out = pd.DataFrame(
                {
                    "id": b["id"].to_numpy(),
                    "tile_x": pd.array(
                        np.where(ok, tx, 0).astype(np.int64), dtype="Int64"
                    ),
                    "tile_y": pd.array(
                        np.where(ok, ty, 0).astype(np.int64), dtype="Int64"
                    ),
                    "poly_seq": pd.array(seq, dtype="Int64"),
                }
            )
            out.loc[~ok, ["tile_x", "tile_y"]] = pd.NA
            out.loc[seq < 0, "poly_seq"] = pd.NA
            yield out

    return rows if id_mode else rollup


def reproject_pip_tile_rollup(
    df: DataFrame,
    src,
    dst,
    polys,
    zoom: int,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Fused flagship rollup: (tile_x, tile_y, poly_seq, n) at ``zoom``
    over reprojected points, first-match polygon assignment included.

    ``polys``: [(poly_id, closed ring [(lon, lat), ...])] in priority
    order.  poly_seq is null for points in no polygon; tile_x/tile_y
    are null for points the transform could not map (NaN sentinel).
    """
    if not 0 <= zoom <= 19:
        raise ValueError(f"zoom {zoom} outside packed-key range [0, 19]")
    kernel = _make_kernel(src, dst, polys, zoom, id_mode=False)
    partial = df.select(
        F.col(lon).cast("double").alias("lon"), F.col(lat).cast("double").alias("lat")
    ).mapInPandas(kernel, "key long, n long")
    total = partial.groupBy("key").agg(F.sum("n").alias("n"))
    valid = F.col("key") >= 0
    ps = F.col("key").bitwiseAND(F.lit(_MASK))
    return total.select(
        F.when(valid, F.shiftright("key", _TX_SHIFT)).alias("tile_x"),
        F.when(valid, F.shiftright("key", _TY_SHIFT).bitwiseAND(F.lit(_MASK))).alias(
            "tile_y"
        ),
        F.when(valid & (ps > 0), ps - 1).alias("poly_seq"),
        "n",
    )


def reproject_pip_tile_rows(
    df: DataFrame,
    src,
    dst,
    polys,
    zoom: int,
    id_col: str,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-row fused assignment: (id, tile_x, tile_y, poly_seq) —
    the user-facing form of the fused kernel (keeps the row key,
    skips the partial aggregate)."""
    if not 0 <= zoom <= 19:
        raise ValueError(f"zoom {zoom} outside packed-key range [0, 19]")
    kernel = _make_kernel(src, dst, polys, zoom, id_mode=True)
    id_type = dict(zip(df.schema.names, df.schema))[id_col].dataType.simpleString()
    out = df.select(
        F.col(id_col).alias("id"),
        F.col(lon).cast("double").alias("lon"),
        F.col(lat).cast("double").alias("lat"),
    ).mapInPandas(kernel, f"id {id_type}, tile_x long, tile_y long, poly_seq long")
    return out.withColumnRenamed("id", id_col)
