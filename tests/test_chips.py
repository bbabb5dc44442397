"""Chip extraction: pixel-exact parity with a single-process
reference, outside-extent exclusion, fan guard, and plan shape."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from proj_spark.operators.chips import extract_chips
from proj_spark.operators.warp import LatLonGrid, lcg_tiles

GRID = LatLonGrid(
    lon0=-120.0, lat0=48.0, dlon=0.02, dlat=0.02, width=256, height=256, tile_px=64
)
OPX = 48


def _chips():
    out = []
    s = 4242
    for i in range(12):
        vals = []
        for _ in range(4):
            s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            vals.append((s >> 11) / float(1 << 53))
        w = GRID.lon0 - 0.4 + (GRID.width * GRID.dlon + 0.4) * vals[0]
        sl = GRID.lat_min - 0.4 + (GRID.height * GRID.dlat + 0.4) * vals[1]
        out.append(
            (f"chip{i:03d}", w, sl, w + 0.3 + 1.2 * vals[2], sl + 0.3 + 1.2 * vals[3])
        )
    out.append(("chip_out", 10.0, 10.0, 11.0, 11.0))  # fully outside
    return out


def _lcg_raster():
    gx = np.arange(GRID.width, dtype=np.int64)[None, :]
    gy = np.arange(GRID.height, dtype=np.int64)[:, None]
    gidx = gy * GRID.width + gx
    return (((gidx * 2654435761 + 12345) % (1 << 32)) >> 24).astype(np.uint8)


def _reference():
    full = _lcg_raster()
    out = {}
    for cid, w, s, e, n in _chips():
        if not (e > GRID.lon0 and w < GRID.lon_max and n > GRID.lat_min and s < GRID.lat0):
            continue
        jj = np.arange(OPX, dtype=np.float64)
        lon = w + (jj + 0.5) * (e - w) / OPX
        ii = np.arange(OPX, dtype=np.float64)
        lat = n - (ii + 0.5) * (n - s) / OPX
        gx = np.floor((lon - GRID.lon0) / GRID.dlon).astype(np.int64)
        gy = np.floor((GRID.lat0 - lat) / GRID.dlat).astype(np.int64)
        valid = ((gy >= 0) & (gy < GRID.height))[:, None] & (
            (gx >= 0) & (gx < GRID.width)
        )[None, :]
        vals = full[
            np.clip(gy, 0, GRID.height - 1)[:, None],
            np.clip(gx, 0, GRID.width - 1)[None, :],
        ].copy()
        vals[~valid] = 0
        out[cid] = (vals, int(valid.sum()))
    return out


@pytest.fixture(scope="module")
def chip_rows(spark):
    tiles = lcg_tiles(spark, GRID, partitions=4)
    chips = spark.createDataFrame(
        _chips(), "chip_id string, lon_w double, lat_s double, lon_e double, lat_n double"
    )
    return {r["chip_id"]: r for r in extract_chips(tiles, chips, GRID, OPX).collect()}


def test_pixel_exact_vs_reference(chip_rows):
    ref = _reference()
    assert set(chip_rows) == set(ref)  # chip_out excluded
    for cid, (vals, n_valid) in ref.items():
        got = np.frombuffer(chip_rows[cid]["bytes"], dtype=np.uint8).reshape(OPX, OPX)
        assert np.array_equal(got, vals), cid
        assert chip_rows[cid]["n_valid"] == n_valid


def test_fan_guard(spark):
    tiles = lcg_tiles(spark, GRID, partitions=2)
    big = spark.createDataFrame(
        [("huge", GRID.lon0, GRID.lat_min, GRID.lon_max, GRID.lat0)],
        "chip_id string, lon_w double, lat_s double, lon_e double, lat_n double",
    )
    with pytest.raises(Exception, match="max_fan"):
        extract_chips(tiles, big, GRID, OPX, max_fan=4).collect()


def test_plan_broadcasts_chips_single_shuffle(spark):
    tiles = lcg_tiles(spark, GRID, partitions=4)
    chips = spark.createDataFrame(
        _chips(), "chip_id string, lon_w double, lat_s double, lon_e double, lat_n double"
    )
    df = extract_chips(tiles, chips, GRID, OPX)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_fused_equals_applyinpandas(spark):
    tiles = lcg_tiles(spark, GRID, partitions=4)
    chips = spark.createDataFrame(
        _chips(), "chip_id string, lon_w double, lat_s double, lon_e double, lat_n double"
    )
    a = {r["chip_id"]: tuple(r) for r in extract_chips(tiles, chips, GRID, OPX, fused=True).collect()}
    b = {r["chip_id"]: tuple(r) for r in extract_chips(tiles, chips, GRID, OPX, fused=False).collect()}
    assert a == b
