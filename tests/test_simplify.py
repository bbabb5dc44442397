"""Douglas-Peucker simplification (operators/simplify.py): collinear
removal, tolerance respect, determinism, degenerate guard, narrow
plan, and closure invariants."""
import numpy as np
import pytest

from proj_spark.operators.simplify import (
    M_PER_DEG,
    dp_keep_indices,
    simplify_ring,
    simplify_rings,
)

SQ = [(-100.0, 35.0), (-95.0, 35.0), (-95.0, 40.0), (-100.0, 40.0), (-100.0, 35.0)]


def _with_midpoints(ring, bump_deg=0.0):
    out = []
    for (ax, ay), (bx, by) in zip(ring[:-1], ring[1:]):
        out.append((ax, ay))
        out.append(((ax + bx) / 2 + bump_deg, (ay + by) / 2 + bump_deg))
    out.append(ring[-1])
    return out


def test_collinear_midpoints_removed_and_bumps_kept():
    dense = _with_midpoints(SQ)
    assert simplify_ring(dense, tol_m=1.0) == SQ
    # a 0.1-deg bump (~11 km) survives a 1 km tolerance on every edge
    bumped = _with_midpoints(SQ, bump_deg=0.1)
    out = simplify_ring(bumped, tol_m=1000.0)
    assert len(out) == len(bumped)
    # ...and is flattened away by a 50 km tolerance
    assert simplify_ring(bumped, tol_m=50_000.0) == SQ


def test_closure_and_validation():
    assert simplify_ring(SQ, 10.0)[0] == simplify_ring(SQ, 10.0)[-1]
    with pytest.raises(ValueError):
        simplify_ring(SQ[:-1], 10.0)  # open ring


def test_degenerate_guard_keeps_original():
    tiny = [(0.0, 0.0), (1e-7, 0.0), (1e-7, 1e-7), (0.0, 0.0)]
    assert simplify_ring(tiny, tol_m=1000.0) == tiny


def test_dp_tie_takes_lowest_index():
    # two equal-distance candidates: index 1 must win the split
    xs = np.array([0.0, 1.0, 2.0, 3.0])
    ys = np.array([0.0, 1.0, 1.0, 0.0])
    keep = dp_keep_indices(xs, ys, tol_scaled=0.5)
    assert 1 in keep


def test_dataframe_op_matches_scalar_and_is_narrow(spark):
    dense = _with_midpoints(SQ, bump_deg=0.02)
    rows = [
        {"poly_id": f"p{i}", "ring": [{"lon": x + i, "lat": y} for x, y in dense]}
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "poly_id string, ring array<struct<lon:double,lat:double>>"
    )
    out = simplify_rings(df.repartition(4), tol_m=5000.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    got = {r.poly_id: ([(p.lon, p.lat) for p in r.ring], r.n_in, r.n_out)
           for r in out.collect()}
    for i in range(6):
        exp = simplify_ring([(x + i, y) for x, y in dense], 5000.0)
        ring, n_in, n_out = got[f"p{i}"]
        assert ring == exp
        assert n_in == len(dense) and n_out == len(exp)
