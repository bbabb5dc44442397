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
