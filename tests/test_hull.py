"""Convex hull / farthest pair: hull reduction vs brute force,
degenerate groups, plan shape (two bounded applyInPandas stages)."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from proj_spark.operators.hull import _hull_farthest, _monotone_chain


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _brute(points):
    """points: list of (id, x, y). Max-(d2, smallest pair) incl self."""
    best = None
    for i, (ia, xa, ya) in enumerate(points):
        for ib, xb, yb in points[i:]:
            d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
            a, b = min(ia, ib), max(ia, ib)
            key = (-d2, a, b)
            if best is None or key < best:
                best = key
    return (-best[0], best[1], best[2])


class TestMonotoneChain:
    def test_square_with_interior(self):
        xs = np.array([0.0, 2.0, 2.0, 0.0, 1.0, 1.2])
        ys = np.array([0.0, 0.0, 2.0, 2.0, 1.0, 0.7])
        ids = np.arange(6)
        hx, hy, hid = _monotone_chain(xs, ys, ids)
        assert sorted(hid.tolist()) == [0, 1, 2, 3]

    def test_collinear_midpoints_dropped(self):
        xs = np.array([0.0, 1.0, 2.0, 3.0])
        ys = np.array([0.0, 0.0, 0.0, 0.0])
        hx, hy, hid = _monotone_chain(xs, ys, np.arange(4))
        assert sorted(hid.tolist()) == [0, 3]

    def test_duplicates_keep_min_id(self):
        xs = np.array([0.0, 0.0, 1.0])
        ys = np.array([0.0, 0.0, 1.0])
        hx, hy, hid = _monotone_chain(xs, ys, np.array([9, 4, 7]))
        assert 4 in hid.tolist() and 9 not in hid.tolist()

    def test_farthest_ties_pick_smallest_pair(self):
        # unit square: both diagonals have d2 = 2
        xs = np.array([0.0, 1.0, 1.0, 0.0])
        ys = np.array([0.0, 0.0, 1.0, 1.0])
        a, b, d2 = _hull_farthest(xs, ys, np.array([10, 11, 12, 13]))
        assert (a, b, d2) == (10, 12, 2.0)


class TestGroupDiameter:
    def test_matches_bruteforce(self, spark):
        from proj_spark.operators.hull import group_diameter

        rng = np.random.RandomState(7)
        rows = [
            (int(g), int(i), float(rng.uniform(-10, 10)), float(rng.uniform(-5, 5)))
            for g in range(4)
            for i in range(g * 200, g * 200 + 120)
        ]
        df = spark.createDataFrame(rows, "g long, id long, x double, y double")
        got = {
            r.group_id: (r.a_id, r.b_id, r.d2)
            for r in group_diameter(df, group="g").collect()
        }
        pts = {}
        for g, i, x, y in rows:
            pts.setdefault(g, []).append((i, x, y))
        for g, plist in pts.items():
            d2, a, b = _brute(plist)
            assert got[g][:2] == (a, b), g
            assert got[g][2] == pytest.approx(d2, rel=1e-12)

    def test_singleton_and_coincident_groups(self, spark):
        from proj_spark.operators.hull import group_diameter

        rows = [
            (0, 5, 1.0, 1.0),                       # singleton
            (1, 11, 2.0, 2.0), (1, 12, 2.0, 2.0),   # all coincident
            (2, 21, 0.0, 0.0), (2, 22, 3.0, 4.0),
        ]
        df = spark.createDataFrame(rows, "g long, id long, x double, y double")
        got = {r.group_id: (r.a_id, r.b_id, r.d2) for r in group_diameter(df, group="g").collect()}
        assert got[0] == (5, 5, 0.0)
        assert got[1] == (11, 11, 0.0)
        assert got[2] == (21, 22, 25.0)

    def test_plan_two_group_stages(self, spark):
        from proj_spark.operators.hull import group_diameter

        df = spark.range(1000).select(
            (F.col("id") % 5).alias("g"),
            F.col("id").alias("id"),
            (F.col("id") % 97).cast("double").alias("x"),
            (F.col("id") % 89).cast("double").alias("y"),
        )
        plan = _plan(group_diameter(df, group="g"))
        assert plan.count("FlatMapGroupsInPandas") == 2, plan
        assert plan.count("Exchange hashpartitioning") == 2, plan


class TestGroupHull:
    def test_hull_vertices_and_order(self, spark):
        from proj_spark.operators.hull import group_hull

        rows = [
            (0, 1, 0.0, 0.0), (0, 2, 4.0, 0.0), (0, 3, 4.0, 3.0),
            (0, 4, 0.0, 3.0), (0, 5, 2.0, 1.0),  # interior
        ]
        df = spark.createDataFrame(rows, "g long, id long, x double, y double")
        out = sorted(group_hull(df, group="g").collect(), key=lambda r: r.seq)
        assert [r.id for r in out] == [1, 2, 3, 4]  # ccw from lexicographic min
        assert [r.seq for r in out] == [0, 1, 2, 3]

    def test_salted_partials_preserve_hull(self, spark):
        """The two-stage reduction must equal the single-pass hull."""
        from proj_spark.operators.hull import group_hull

        rng = np.random.RandomState(3)
        rows = [
            (0, int(i), float(rng.uniform(0, 100)), float(rng.uniform(0, 50)))
            for i in range(500)
        ]
        df = spark.createDataFrame(rows, "g long, id long, x double, y double")
        got = {r.id for r in group_hull(df, group="g", salt_parts=16).collect()}
        xs = np.array([r[2] for r in rows])
        ys = np.array([r[3] for r in rows])
        ids = np.array([r[1] for r in rows])
        _, _, hid = _monotone_chain(xs, ys, ids)
        assert got == set(hid.tolist())


class TestHullProperties:
    """Hypothesis property tests on the pure numpy kernels (no Spark):
    the hull reduction must never change the farthest-pair answer."""

    def test_random_clouds_hull_reduction_is_lossless(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(
            st.lists(
                st.tuples(
                    st.integers(0, 10_000),
                    st.floats(-180, 180, allow_nan=False, width=32),
                    st.floats(-90, 90, allow_nan=False, width=32),
                ),
                min_size=1,
                max_size=60,
            )
        )
        def check(points):
            # dedup ids (hypothesis may repeat them); keep first
            seen, rows = set(), []
            for i, x, y in points:
                if i not in seen:
                    seen.add(i)
                    rows.append((i, float(x), float(y)))
            ids = np.array([r[0] for r in rows], dtype=np.int64)
            xs = np.array([r[1] for r in rows])
            ys = np.array([r[2] for r in rows])
            hx, hy, hid = _monotone_chain(xs, ys, ids)
            a, b, d2 = _hull_farthest(hx, hy, hid)
            bd2, ba, bb = _brute(rows)
            # the reduction NEVER loses distance ...
            assert d2 == bd2
            # ... and the returned pair achieves it exactly (the id
            # tie-break matches brute force unless an INTERIOR point
            # ties the max through float rounding — documented caveat)
            pos = {i: (x, y) for i, x, y in rows}
            (ax, ay), (bx, by) = pos[a], pos[b]
            assert (ax - bx) * (ax - bx) + (ay - by) * (ay - by) == bd2
            tied = [
                (i1, i2)
                for n1, (i1, x1, y1) in enumerate(rows)
                for i2, x2, y2 in rows[n1:]
                if (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2) == bd2
            ]
            if len(tied) == 1:
                assert (a, b) == (ba, bb)

        check()

    def test_hull_is_convex_and_minimal(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=100, deadline=None)
        @given(
            st.lists(
                st.tuples(
                    st.floats(-100, 100, allow_nan=False, width=16),
                    st.floats(-100, 100, allow_nan=False, width=16),
                ),
                min_size=3,
                max_size=40,
            )
        )
        def check(points):
            xs = np.array([p[0] for p in points], dtype=np.float64)
            ys = np.array([p[1] for p in points], dtype=np.float64)
            hx, hy, hid = _monotone_chain(xs, ys, np.arange(len(xs)))
            m = len(hx)
            if m < 3:
                return  # degenerate (collinear/coincident) — covered elsewhere
            # ccw convexity: every consecutive triple turns strictly left
            for i in range(m):
                j, k = (i + 1) % m, (i + 2) % m
                cross = (hx[j] - hx[i]) * (hy[k] - hy[i]) - (hy[j] - hy[i]) * (
                    hx[k] - hx[i]
                )
                assert cross > 0
            # every input point inside or on the hull (left of every edge)
            for px, py in zip(xs, ys):
                for i in range(m):
                    j = (i + 1) % m
                    cross = (hx[j] - hx[i]) * (py - hy[i]) - (hy[j] - hy[i]) * (
                        px - hx[i]
                    )
                    assert cross >= 0

        check()
