"""Change detection: numpy reference parity, identical-epoch zero
case, threshold semantics, and mask-position sensitivity."""
from __future__ import annotations

import numpy as np
import pytest

TS = 8


def _tile(seed):
    return (
        np.random.default_rng(seed).integers(0, 255, (TS, TS)).astype(np.uint8)
    )


def _rows(spark, tiles):
    return spark.createDataFrame(
        [(sx, sy, bytearray(v.tobytes())) for sx, sy, v in tiles],
        ["sx", "sy", "bytes"],
    )


def test_matches_numpy_reference(spark):
    from proj_spark.operators.changedetect import diff_tiles

    thr = 20
    tiles_a = [(x, y, _tile(x * 10 + y)) for x in range(3) for y in range(2)]
    tiles_b = [(x, y, _tile(x * 10 + y + 100)) for x in range(3) for y in range(2)]
    got = {
        (r["sx"], r["sy"]): (r["n_changed"], r["abs_diff"], r["mask_cks"])
        for r in diff_tiles(_rows(spark, tiles_a), _rows(spark, tiles_b), TS, thr).collect()
    }
    w = np.arange(TS * TS, dtype=np.int64).reshape(TS, TS) + 1
    for (sx, sy, va), (_, _, vb) in zip(tiles_a, tiles_b):
        d = np.abs(va.astype(np.int64) - vb.astype(np.int64))
        m = d > thr
        assert got[(sx, sy)] == (int(m.sum()), int(d.sum()), int((m * w).sum()))


def test_identical_epochs_report_zero(spark):
    from proj_spark.operators.changedetect import diff_tiles

    t = [(0, 0, _tile(1))]
    out = diff_tiles(_rows(spark, t), _rows(spark, t), TS, 0).collect()
    assert (out[0]["n_changed"], out[0]["abs_diff"], out[0]["mask_cks"]) == (0, 0, 0)


def test_threshold_is_strict(spark):
    from proj_spark.operators.changedetect import diff_tiles

    va = np.zeros((TS, TS), dtype=np.uint8)
    vb = np.full((TS, TS), 5, dtype=np.uint8)
    out = diff_tiles(
        _rows(spark, [(0, 0, va)]), _rows(spark, [(0, 0, vb)]), TS, 5
    ).collect()
    assert out[0]["n_changed"] == 0 and out[0]["abs_diff"] == 5 * TS * TS


def test_mask_checksum_is_position_sensitive(spark):
    from proj_spark.operators.changedetect import diff_tiles

    base = np.zeros((TS, TS), dtype=np.uint8)
    b1, b2 = base.copy(), base.copy()
    b1[0, 0] = 200  # one changed pixel at (0,0)
    b2[3, 4] = 200  # one changed pixel elsewhere
    o1 = diff_tiles(_rows(spark, [(0, 0, base)]), _rows(spark, [(0, 0, b1)]), TS, 10).collect()[0]
    o2 = diff_tiles(_rows(spark, [(0, 0, base)]), _rows(spark, [(0, 0, b2)]), TS, 10).collect()[0]
    assert o1["n_changed"] == o2["n_changed"] == 1
    assert o1["mask_cks"] != o2["mask_cks"]
