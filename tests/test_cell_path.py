"""cell_path: run-length cell visits, revisit numbering, one-shuffle plan."""
from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, lon double, lat double"
    )


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_runs_collapse_and_revisits_renumber(spark):
    from proj_spark.operators.trajectory import cell_path

    # user 1: cell A (2 pings) -> cell B (1) -> back to A (1): 3 visits
    rows = [
        (1, _t(0), 10, -100.0, 40.0),
        (1, _t(1), 11, -100.001, 40.001),  # same res-7 cell
        (1, _t(2), 12, -90.0, 35.0),
        (1, _t(3), 13, -100.0, 40.0),      # revisit -> NEW seq
        (2, _t(0), 20, -80.0, 30.0),       # single-ping user
    ]
    out = {
        (r.user, r.seq): (r.cell, r.n_pings)
        for r in cell_path(_df(spark, rows), res=7, tie="event_id").collect()
    }
    assert len(out) == 4
    assert out[(1, 0)][1] == 2
    assert out[(1, 1)][1] == 1
    assert out[(1, 2)][0] == out[(1, 0)][0]  # revisit = same cell, new seq
    assert out[(2, 0)][1] == 1


def test_tie_break_makes_equal_ts_deterministic(spark):
    from proj_spark.operators.trajectory import cell_path

    rows = [
        (1, _t(0), 2, -90.0, 35.0),
        (1, _t(0), 1, -100.0, 40.0),  # same ts, smaller event_id -> first
    ]
    out = sorted(
        cell_path(_df(spark, rows), res=7, tie="event_id").collect(),
        key=lambda r: r.seq,
    )
    from proj_spark.functions import expressions as E

    [c0] = (
        _df(spark, rows[1:])
        .select(E.cell_id("lon", "lat", 7).alias("c"))
        .collect()
    )
    assert out[0].cell == c0.c  # event_id=1's cell leads


def test_plan_single_shuffle(spark):
    from proj_spark.operators.trajectory import cell_path

    df = spark.range(10_000).select(
        (F.col("id") % 50).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("event_id"),
        (F.col("id") % 360 - 180.0).cast("double").alias("lon"),
        (F.col("id") % 140 - 70.0).cast("double").alias("lat"),
    )
    plan = (
        cell_path(df, res=7, tie="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the run groupBy must reuse the window's hash partitioning on
    # user_id — exactly one exchange end-to-end
    assert plan.count("Exchange hashpartitioning") == 1, plan
