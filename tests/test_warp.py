"""Raster warp (plate-carrée -> web-mercator tiles): pixel-exact
parity with a single-process numpy reference, extent/zero-fill edges,
and the physical plan (broadcast candidate map, one shuffle)."""
from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from proj_spark.operators.warp import (
    LatLonGrid,
    lcg_tiles,
    out_tile_range,
    warp_to_webmerc,
)

GRID = LatLonGrid(
    lon0=-120.0, lat0=48.0, dlon=0.02, dlat=0.02, width=256, height=256, tile_px=64
)
ZOOM = 6
OPX = 64


def _lcg_raster(grid: LatLonGrid) -> np.ndarray:
    gx = np.arange(grid.width, dtype=np.int64)[None, :]
    gy = np.arange(grid.height, dtype=np.int64)[:, None]
    gidx = gy * grid.width + gx
    return (((gidx * 2654435761 + 12345) % (1 << 32)) >> 24).astype(np.uint8)


def _reference_warp(grid: LatLonGrid, zoom: int, opx: int):
    """Single-process warp of every output tile over the full raster."""
    full = _lcg_raster(grid)
    n_px = float((1 << zoom) * opx)
    tx0, tx1, ty0, ty1 = out_tile_range(grid, zoom)
    out = {}
    for tx in range(tx0, tx1 + 1):
        for ty in range(ty0, ty1 + 1):
            xs = (tx * opx + np.arange(opx, dtype=np.float64)) + 0.5
            lon = xs / n_px * 360.0 - 180.0
            ys = (ty * opx + np.arange(opx, dtype=np.float64)) + 0.5
            t = math.pi * (1.0 - 2.0 * ys / n_px)
            lat = np.arctan((np.exp(t) - np.exp(-t)) * 0.5) * (180.0 / math.pi)
            gx = np.floor((lon - grid.lon0) / grid.dlon).astype(np.int64)
            gy = np.floor((grid.lat0 - lat) / grid.dlat).astype(np.int64)
            valid = ((gy >= 0) & (gy < grid.height))[:, None] & (
                (gx >= 0) & (gx < grid.width)
            )[None, :]
            vals = np.zeros((opx, opx), dtype=np.uint8)
            gxm = np.clip(gx, 0, grid.width - 1)
            gym = np.clip(gy, 0, grid.height - 1)
            vals[:, :] = full[gym[:, None], gxm[None, :]]
            vals[~valid] = 0
            if valid.any():
                out[(tx, ty)] = (vals, int(valid.sum()))
    return out


@pytest.fixture(scope="module")
def warped(spark):
    tiles = lcg_tiles(spark, GRID, partitions=4)
    df = warp_to_webmerc(spark, tiles, GRID, ZOOM, OPX)
    return {(r["tx"], r["ty"]): r for r in df.collect()}


def test_pixel_exact_vs_reference(warped):
    ref = _reference_warp(GRID, ZOOM, OPX)
    # every reference tile with any valid pixel must exist and match
    for key, (vals, n_valid) in ref.items():
        assert key in warped, key
        got = np.frombuffer(warped[key]["bytes"], dtype=np.uint8).reshape(OPX, OPX)
        assert np.array_equal(got, vals), key
        assert warped[key]["n_valid"] == n_valid
    # and nothing extra beyond all-invalid tiles
    for key, r in warped.items():
        if key not in ref:
            assert r["n_valid"] == 0


def test_checksums_match_bytes(warped):
    w = 1 + (
        np.arange(OPX * OPX, dtype=np.int64).reshape(OPX, OPX) % 997
    )
    for r in warped.values():
        v = np.frombuffer(r["bytes"], dtype=np.uint8).reshape(OPX, OPX).astype(
            np.int64
        )
        assert r["px_sum"] == int(v.sum())
        assert r["px_cks"] == int((v * w).sum())


def test_missing_source_tile_zero_fills(spark):
    tiles = lcg_tiles(spark, GRID, partitions=4).where(
        ~((F.col("sx") == 0) & (F.col("sy") == 0))
    )
    df = warp_to_webmerc(spark, tiles, GRID, ZOOM, OPX)
    got = {(r["tx"], r["ty"]): r for r in df.collect()}
    full = _lcg_raster(GRID)
    full[0:64, 0:64] = 0  # the dropped tile's footprint reads as zero
    # recompute the reference with the hole and compare one tile that
    # overlaps it: (0,0) source tile holds the NW corner of the grid
    ref = _reference_warp(GRID, ZOOM, OPX)
    changed = 0
    for key, r in got.items():
        v = np.frombuffer(r["bytes"], dtype=np.uint8).reshape(OPX, OPX)
        if key in ref and not np.array_equal(v, ref[key][0]):
            changed += 1
            # every differing pixel must now be zero
            diff = v != ref[key][0]
            assert (v[diff] == 0).all()
    assert changed >= 1


def test_plan_broadcasts_candidates_single_shuffle(spark):
    tiles = lcg_tiles(spark, GRID, partitions=4)
    df = warp_to_webmerc(spark, tiles, GRID, ZOOM, OPX)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # the only hash exchange is the groupBy on the output tile
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_fused_equals_applyinpandas(spark):
    """The fused group-map path (default) and the plain applyInPandas
    path must produce identical tiles."""
    tiles = lcg_tiles(spark, GRID, partitions=4)
    a = {
        (r["tx"], r["ty"]): (r["bytes"], r["n_valid"], r["px_sum"], r["px_cks"])
        for r in warp_to_webmerc(spark, tiles, GRID, ZOOM, OPX, fused=True).collect()
    }
    b = {
        (r["tx"], r["ty"]): (r["bytes"], r["n_valid"], r["px_sum"], r["px_cks"])
        for r in warp_to_webmerc(spark, tiles, GRID, ZOOM, OPX, fused=False).collect()
    }
    assert a == b


# ----------------------------------------------------- bilinear lane
def _reference_bilinear(grid: LatLonGrid, zoom: int, opx: int):
    """Single-process reference: full-raster bilinear per output tile."""
    from proj_spark.operators.warp import _merc_lat_deg

    full = _lcg_raster(grid).astype(np.float64)
    n_px = float((1 << zoom) * opx)
    tx0, tx1, ty0, ty1 = out_tile_range(grid, zoom)
    out = {}
    for tx in range(tx0, tx1 + 1):
        for ty in range(ty0, ty1 + 1):
            xs = (tx * opx + np.arange(opx, dtype=np.float64)) + 0.5
            lon = xs / n_px * 360.0 - 180.0
            ys = (ty * opx + np.arange(opx, dtype=np.float64)) + 0.5
            lat = _merc_lat_deg(ys / n_px)
            fx = (lon - grid.lon0) / grid.dlon - 0.5
            fy = (grid.lat0 - lat) / grid.dlat - 0.5
            vx = (fx >= 0.0) & (fx <= float(grid.width - 1))
            vy = (fy >= 0.0) & (fy <= float(grid.height - 1))
            valid = vy[:, None] & vx[None, :]
            x0 = np.clip(np.floor(fx), 0, grid.width - 2).astype(np.int64)
            y0 = np.clip(np.floor(fy), 0, grid.height - 2).astype(np.int64)
            dx = (fx - x0)[None, :]
            dy = (fy - y0)[:, None]
            v00 = full[y0[:, None], x0[None, :]]
            v10 = full[y0[:, None], (x0 + 1)[None, :]]
            v01 = full[(y0 + 1)[:, None], x0[None, :]]
            v11 = full[(y0 + 1)[:, None], (x0 + 1)[None, :]]
            v = (v00 * (1.0 - dx) + v10 * dx) * (1.0 - dy) + (
                v01 * (1.0 - dx) + v11 * dx
            ) * dy
            q = np.floor(v * 16.0).astype(np.int64)
            q[~valid] = 0
            lidx = np.arange(opx)[:, None] * opx + np.arange(opx)[None, :]
            w = 1 + (lidx % 997)
            out[(tx, ty)] = (int(valid.sum()), int(q.sum()), int((q * w).sum()))
    return out


def test_bilinear_matches_reference(spark):
    """The distributed tile-group path (canvas mosaic, widened
    candidates) equals the single-process full-raster bilinear —
    proves cross-tile supports are assembled correctly."""
    from proj_spark.operators.warp import warp_bilinear_tiles

    tiles = lcg_tiles(spark, GRID, partitions=4)
    got = {
        (r["tx"], r["ty"]): (r["n_valid"], r["q_sum"], r["q_cks"])
        for r in warp_bilinear_tiles(spark, tiles, GRID, ZOOM, OPX).collect()
    }
    ref = _reference_bilinear(GRID, ZOOM, OPX)
    assert got == ref


def test_bilinear_plan_broadcast_single_shuffle(spark):
    from proj_spark.operators.warp import warp_bilinear_tiles

    tiles = lcg_tiles(spark, GRID, partitions=4)
    df = warp_bilinear_tiles(spark, tiles, GRID, ZOOM, OPX)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_bilinear_constant_raster_is_exact(spark):
    """On a constant raster, bilinear == the constant everywhere valid
    (weights sum to 1): q must be exactly 16*c for every valid pixel."""
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from proj_spark.operators.warp import warp_bilinear_tiles

    ts = GRID.tile_px
    n_sx, n_sy = GRID.width // ts, GRID.height // ts
    c = 7
    rows = [
        (sx, sy, bytes([c] * (ts * ts)))
        for sx in range(n_sx)
        for sy in range(n_sy)
    ]
    schema = StructType(
        [
            StructField("sx", LongType()),
            StructField("sy", LongType()),
            StructField("bytes", BinaryType()),
        ]
    )
    tiles = spark.createDataFrame(rows, schema)
    for r in warp_bilinear_tiles(spark, tiles, GRID, ZOOM, OPX).collect():
        assert r["q_sum"] == 16 * c * r["n_valid"]
