"""Nearest-boundary distance join (operators/boundary.py): exact
scalar replay, inline/join-path equivalence, tie-break totality, and
the zero-exchange inline plan."""
import math

import pytest

from proj_spark.functions.expressions import DEG_TO_RAD, EARTH_RADIUS_M
from proj_spark.operators.boundary import _edge_rows, boundary_distance_join

SQUARE = [(-100.0, 35.0), (-95.0, 35.0), (-95.0, 40.0), (-100.0, 40.0), (-100.0, 35.0)]
OTHER = [(p[0] + 12.0, p[1]) for p in SQUARE]
POLYS = [("a", SQUARE), ("b", OTHER)]


def _dist_mm(lon, lat, x1, y1, x2, y2):
    m = DEG_TO_RAD * EARTH_RADIUS_M
    cl = math.cos(lat * DEG_TO_RAD)
    ax, ay = (x1 - lon) * m * cl, (y1 - lat) * m
    bx, by = (x2 - lon) * m * cl, (y2 - lat) * m
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    t = 0.0 if len2 == 0.0 else min(max(-(ax * dx + ay * dy) / len2, 0.0), 1.0)
    px, py = ax + t * dx, ay + t * dy
    return math.floor(math.sqrt(px * px + py * py) * 1000.0)


def _replay(lon, lat):
    best = None
    for s, i, p, x1, y1, x2, y2 in _edge_rows(POLYS):
        cand = (_dist_mm(lon, lat, x1, y1, x2, y2), s, i, p)
        if best is None or cand < best:
            best = cand
    return best[3], best[0]


PTS = [
    (1, -97.0, 37.0),    # inside a: south edge nearest
    (2, -94.0, 37.5),    # between the squares
    (3, -120.0, 50.0),   # far northwest: clamps to a vertex
    (4, -85.5, 35.0),    # ON b's south edge: distance 0
]


def test_matches_scalar_replay_inline_and_join(spark):
    df = spark.createDataFrame(PTS, "pk long, lon double, lat double")
    exp = {pk: _replay(lon, lat) for pk, lon, lat in PTS}
    inline = boundary_distance_join(df, POLYS)
    joined = boundary_distance_join(df, POLYS, point_id="pk", inline_cap=0)
    for out in (inline, joined):
        got = {r.pk: (r.nearest_poly, r.dist_mm) for r in out.collect()}
        assert got == exp
    assert exp[4][1] == 0  # on-edge point is exactly 0 mm


def test_tie_break_is_first_match_order(spark):
    # equidistant between a's east edge and b's west edge: a wins (lower seq)
    mid = (-95.0 + -88.0) / 2.0
    df = spark.createDataFrame([(1, mid, 37.0)], "pk long, lon double, lat double")
    r = boundary_distance_join(df, POLYS).collect()[0]
    assert r.nearest_poly == "a"


def test_inline_plan_has_zero_exchange(spark):
    df = spark.createDataFrame(PTS, "pk long, lon double, lat double")
    plan = (
        boundary_distance_join(df, POLYS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_join_path_broadcasts_and_aggregates_once(spark):
    df = spark.createDataFrame(PTS, "pk long, lon double, lat double")
    plan = (
        boundary_distance_join(df, POLYS, point_id="pk", inline_cap=0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_validation(spark):
    df = spark.createDataFrame(PTS, "pk long, lon double, lat double")
    with pytest.raises(ValueError):
        boundary_distance_join(df, [])
    with pytest.raises(ValueError):
        boundary_distance_join(df, POLYS, inline_cap=0)  # no point_id
