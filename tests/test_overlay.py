"""bbox / interval overlap joins: exactly-once semantics vs brute
force, reference-point dedup (no distinct shuffle), guard rails."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _boxes(spark, n: int, seed: int):
    return spark.range(n).select(
        F.col("id").alias("box_id"),
        ((F.col("id") * 37 + seed) % 560 / 10.0 - 125.0).alias("x0"),
        ((F.col("id") * 59 + seed) % 230 / 10.0 + 25.0).alias("y0"),
    ).select(
        "box_id", "x0", "y0",
        (F.col("x0") + 0.3 + (F.col("box_id") % 7) / 10.0).alias("x1"),
        (F.col("y0") + 0.3 + (F.col("box_id") % 5) / 10.0).alias("y1"),
    )


def _brute_pairs(rows_a, rows_b):
    out = set()
    for a in rows_a:
        for b in rows_b:
            if a.x0 < b.x1 and b.x0 < a.x1 and a.y0 < b.y1 and b.y0 < a.y1:
                out.add((a.box_id, b.box_id))
    return out


class TestBBoxOverlay:
    def test_matches_bruteforce_exactly_once(self, spark):
        from proj_spark.operators.overlay import bbox_overlap_join

        a, b = _boxes(spark, 300, 1), _boxes(spark, 300, 2)
        got = bbox_overlap_join(a, b, res=6).collect()
        pairs = [(r.a_id, r.b_id) for r in got]
        assert len(pairs) == len(set(pairs)), "reference-point dedup emitted a pair twice"
        assert set(pairs) == _brute_pairs(a.collect(), b.collect())

    def test_intersection_geometry(self, spark):
        from proj_spark.operators.overlay import bbox_overlap_join

        a = spark.createDataFrame(
            [(1, 0.0, 0.0, 2.0, 2.0)], "box_id long, x0 double, y0 double, x1 double, y1 double"
        )
        b = spark.createDataFrame(
            [(7, 1.0, 1.5, 3.0, 4.0)], "box_id long, x0 double, y0 double, x1 double, y1 double"
        )
        [r] = bbox_overlap_join(a, b, res=6).collect()
        assert (r.ix0, r.iy0, r.ix1, r.iy1) == (1.0, 1.5, 2.0, 2.0)
        assert r.area == pytest.approx(0.5)

    def test_touching_edges_are_not_overlap(self, spark):
        from proj_spark.operators.overlay import bbox_overlap_join

        a = spark.createDataFrame(
            [(1, 0.0, 0.0, 1.0, 1.0)], "box_id long, x0 double, y0 double, x1 double, y1 double"
        )
        b = spark.createDataFrame(
            [(2, 1.0, 0.0, 2.0, 1.0)], "box_id long, x0 double, y0 double, x1 double, y1 double"
        )
        assert bbox_overlap_join(a, b, res=6).count() == 0

    def test_plan_no_distinct_two_exchanges(self, spark):
        from proj_spark.operators.overlay import bbox_overlap_join

        plan = _plan(bbox_overlap_join(_boxes(spark, 2000, 1), _boxes(spark, 2000, 2), res=6))
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
        # one shuffle per side for the cell-key join and NOTHING else —
        # the reference-point filter replaces the pair distinct()
        assert plan.count("Exchange hashpartitioning") <= 2, plan
        n_joins = sum(
            plan.count(j)
            for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
        )
        assert n_joins == 1, plan

    def test_max_cells_guard_raises(self, spark):
        from proj_spark.operators.overlay import bbox_overlap_join

        big = spark.createDataFrame(
            [(1, -100.0, 30.0, -20.0, 49.0)],
            "box_id long, x0 double, y0 double, x1 double, y1 double",
        )
        with pytest.raises(Exception, match="max_cells"):
            bbox_overlap_join(big, big, res=6).collect()


class TestIntervalOverlap:
    def _ivs(self, spark, n, seed):
        return spark.range(n).select(
            F.col("id").alias("iv_id"),
            ((F.col("id") * 131 + seed) % 100000).cast("double").alias("t0"),
        ).withColumn("t1", F.col("t0") + 50.0 + (F.col("iv_id") % 41) * 100.0)

    def test_matches_bruteforce_exactly_once(self, spark):
        from proj_spark.operators.overlay import interval_overlap_join

        a, b = self._ivs(spark, 400, 3), self._ivs(spark, 400, 17)
        got = interval_overlap_join(a, b, bucket=3600, max_buckets=8).collect()
        pairs = [(r.a_id, r.b_id) for r in got]
        assert len(pairs) == len(set(pairs))
        brute = {
            (x.iv_id, y.iv_id)
            for x in a.collect()
            for y in b.collect()
            if x.t0 < y.t1 and y.t0 < x.t1
        }
        assert set(pairs) == brute
        for r in got:
            assert r.overlap > 0

    def test_plan_no_distinct(self, spark):
        from proj_spark.operators.overlay import interval_overlap_join

        plan = _plan(
            interval_overlap_join(self._ivs(spark, 400, 3), self._ivs(spark, 400, 17))
        )
        assert plan.count("Exchange hashpartitioning") <= 2, plan

    def test_max_buckets_guard(self, spark):
        from proj_spark.operators.overlay import interval_overlap_join

        long_iv = spark.createDataFrame(
            [(1, 0.0, 1e6)], "iv_id long, t0 double, t1 double"
        )
        with pytest.raises(Exception, match="max_buckets"):
            interval_overlap_join(long_iv, long_iv, bucket=3600, max_buckets=8).collect()
