"""D4 augmentation: per-op numpy parity on an asymmetric tile,
fingerprint sensitivity, and full-group coverage."""
from __future__ import annotations

import numpy as np
import pytest


def _fingerprint(o, ts):
    w = np.arange(ts * ts, dtype=np.int64).reshape(ts, ts) + 1
    o = o.astype(np.int64)
    return (
        int(o.sum()),
        int((o * w).sum()),
        int(o[0, 0]),
        int(o[0, ts - 1]),
        int(o[ts - 1, 0]),
        int(o[ts - 1, ts - 1]),
    )


def test_all_eight_ops_match_numpy(spark):
    from proj_spark.operators.augment import _apply, augment_tiles

    ts = 8
    base = (np.arange(ts * ts, dtype=np.int64) * 37 % 251).astype(np.uint8)
    v = base.reshape(ts, ts)
    # tiles (sx, sy) chosen so (sx*3 + sy) % 8 hits every op exactly once
    coords = [(0, 0), (0, 1), (0, 2), (1, 0), (0, 4), (1, 2), (2, 0), (1, 4)]
    ops = [(sx * 3 + sy) % 8 for sx, sy in coords]
    assert sorted(ops) == list(range(8))
    rows = [(sx, sy, bytearray(v.tobytes())) for sx, sy in coords]
    df = spark.createDataFrame(rows, ["sx", "sy", "bytes"])
    got = {
        (r["sx"], r["sy"]): r for r in augment_tiles(df, ts).collect()
    }
    for (sx, sy), op in zip(coords, ops):
        r = got[(sx, sy)]
        exp = _fingerprint(_apply(v, op), ts)
        assert r["op"] == op
        assert (r["sum_v"], r["wsum"], r["c00"], r["c10"], r["c01"], r["c11"]) == exp


def test_weighted_sum_distinguishes_ops(spark):
    """The plain sum is op-invariant; the weighted sum must not be."""
    from proj_spark.operators.augment import _apply

    ts = 8
    v = (np.arange(ts * ts, dtype=np.int64) * 37 % 251).astype(np.uint8).reshape(ts, ts)
    prints = {op: _fingerprint(_apply(v, op), ts) for op in range(8)}
    sums = {p[0] for p in prints.values()}
    wsums = {p[1] for p in prints.values()}
    assert len(sums) == 1
    assert len(wsums) == 8


def test_ops_are_involutions_or_inverses(spark):
    from proj_spark.operators.augment import _apply

    ts = 8
    v = np.random.default_rng(5).integers(0, 255, (ts, ts)).astype(np.uint8)
    # rot90 o rot270 = id; each flip/transpose is an involution
    assert np.array_equal(_apply(_apply(v, 1), 3), v)
    for op in (2, 4, 5, 6, 7):
        assert np.array_equal(_apply(_apply(v, op), op), v)
