"""Segment-intersection join: exactness vs brute force, strict
proper-crossing semantics (touch/collinear excluded), the fan guard,
and cross-cell pairs deduping to one row."""
from __future__ import annotations

import pytest


def _lcg_segments(n, seed, span=0.8):
    out, s = [], seed
    for i in range(n):
        vals = []
        for _ in range(4):
            s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            vals.append((s >> 11) / float(1 << 53))
        x = -10.0 + 20.0 * vals[0]
        y = -10.0 + 20.0 * vals[1]
        out.append((i, x, y, x + span * (vals[2] - 0.5) * 2, y + span * (vals[3] - 0.5) * 2))
    return out


def _ccw(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _brute(sa, sb):
    out = set()
    for aid, ax1, ay1, ax2, ay2 in sa:
        for bid, bx1, by1, bx2, by2 in sb:
            d1 = _ccw(ax1, ay1, ax2, ay2, bx1, by1)
            d2 = _ccw(ax1, ay1, ax2, ay2, bx2, by2)
            d3 = _ccw(bx1, by1, bx2, by2, ax1, ay1)
            d4 = _ccw(bx1, by1, bx2, by2, ax2, ay2)
            if d1 * d2 < 0 and d3 * d4 < 0:
                out.add((aid, bid))
    return out


def test_matches_bruteforce(spark):
    from proj_spark.operators.segments import segment_intersection_join

    sa = _lcg_segments(300, seed=11)
    sb = _lcg_segments(300, seed=77)
    da = spark.createDataFrame(sa, "seg_id long, x1 double, y1 double, x2 double, y2 double")
    db = spark.createDataFrame(sb, "seg_id long, x1 double, y1 double, x2 double, y2 double")
    got = {
        (r["a_id"], r["b_id"])
        for r in segment_intersection_join(da, db, res=6).collect()
    }
    want = _brute(sa, sb)
    assert got == want
    assert len(want) > 20  # the fixture actually produces crossings


def test_touch_and_collinear_excluded(spark):
    from proj_spark.operators.segments import segment_intersection_join

    da = spark.createDataFrame(
        [(0, 0.0, 0.0, 1.0, 0.0)],
        "seg_id long, x1 double, y1 double, x2 double, y2 double",
    )
    db = spark.createDataFrame(
        [
            (0, 0.5, 0.0, 0.5, 1.0),    # T-touch at (0.5, 0) -> excluded
            (1, 0.25, 0.0, 0.75, 0.0),  # collinear overlap -> excluded
            (2, 0.5, -0.5, 0.5, 0.5),   # proper crossing
        ],
        "seg_id long, x1 double, y1 double, x2 double, y2 double",
    )
    got = {
        (r["a_id"], r["b_id"])
        for r in segment_intersection_join(da, db, res=6).collect()
    }
    assert got == {(0, 2)}


def test_cross_cell_pair_dedupes(spark):
    """Two long-ish crossing segments spanning several cells must emit
    ONE pair."""
    from proj_spark.operators.segments import segment_intersection_join

    da = spark.createDataFrame(
        [(0, -2.0, 0.1, 2.0, 0.1)],
        "seg_id long, x1 double, y1 double, x2 double, y2 double",
    )
    db = spark.createDataFrame(
        [(0, -1.9, -1.0, 1.9, 1.0)],
        "seg_id long, x1 double, y1 double, x2 double, y2 double",
    )
    rows = segment_intersection_join(da, db, res=7).collect()
    assert len(rows) == 1


def test_fan_guard(spark):
    from proj_spark.operators.segments import segment_intersection_join

    da = spark.createDataFrame(
        [(0, -170.0, -80.0, 170.0, 80.0)],
        "seg_id long, x1 double, y1 double, x2 double, y2 double",
    )
    with pytest.raises(Exception):
        segment_intersection_join(da, da, res=6, max_cells=4).collect()
