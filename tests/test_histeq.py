"""Per-tile histogram equalization (operators/histeq.py): numpy
reference parity, the flat-tile convention, full-range output, and the
zero-exchange plan contract."""
from __future__ import annotations

import numpy as np

from proj_spark.operators.histeq import equalize_tiles

TS = 8


def _rows(spark, tiles):
    return spark.createDataFrame(
        [(x, y, bytearray(v.tobytes())) for x, y, v in tiles],
        ["x", "y", "bytes"],
    )


def _reference(v):
    npx = v.size
    hist = np.bincount(v.ravel(), minlength=256).astype(np.int64)
    cdf = np.cumsum(hist)
    cmin = int(cdf[np.nonzero(hist)[0][0]])
    if npx == cmin:
        pix = np.zeros(npx, dtype=np.int64)
    else:
        pix = ((cdf - cmin) * 255 // (npx - cmin))[v.ravel()]
    wgt = 1 + (np.arange(npx, dtype=np.int64) % 997)
    return int((hist > 0).sum()), int(pix.sum()), int((pix * wgt).sum())


def test_matches_numpy_reference(spark):
    rng = np.random.default_rng(5)
    tiles = [(x, y, rng.integers(0, 255, (TS, TS)).astype(np.uint8))
             for x in range(3) for y in range(2)]
    got = {
        (r["x"], r["y"]): (r["n_bins"], r["eq_sum"], r["eq_cks"])
        for r in equalize_tiles(_rows(spark, tiles), TS).collect()
    }
    assert got == {(x, y): _reference(v) for x, y, v in tiles}


def test_flat_tile_maps_to_zero(spark):
    t = [(0, 0, np.full((TS, TS), 77, dtype=np.uint8))]
    r = equalize_tiles(_rows(spark, t), TS).collect()[0]
    assert (r["n_bins"], r["eq_sum"], r["eq_cks"]) == (1, 0, 0)


def test_two_level_tile_spans_full_range(spark):
    # half the pixels at 100, half at 101: eq must be {0, 255}
    v = np.full((TS, TS), 100, dtype=np.uint8)
    v[: TS // 2] = 101
    r = equalize_tiles(_rows(spark, [(0, 0, v)]), TS).collect()[0]
    n = TS * TS // 2
    assert r["n_bins"] == 2 and r["eq_sum"] == 255 * n
    assert (r["n_bins"], r["eq_sum"], r["eq_cks"]) == _reference(v)


def test_monotone_ramp_is_identityish(spark):
    # a 0..255-spanning ramp equalizes to (rank-based) near-identity:
    # max pixel always maps to 255, min to 0
    v = np.arange(TS * TS, dtype=np.int64) % 256
    v = v.astype(np.uint8).reshape(TS, TS)
    ref = _reference(v)
    r = equalize_tiles(_rows(spark, [(0, 0, v)]), TS).collect()[0]
    assert (r["n_bins"], r["eq_sum"], r["eq_cks"]) == ref


def test_zero_exchange_plan(spark):
    t = [(0, 0, np.zeros((TS, TS), dtype=np.uint8))]
    plan = (
        equalize_tiles(_rows(spark, t), TS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
