"""Spherical navigation functions: cross-track / along-track vs
closed-form cases and the haversine fast path."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from proj_spark.functions.navigation import EARTH_RADIUS_M


def _one(spark, rlon1, rlat1, rlon2, rlat2, plon, plat):
    from proj_spark.functions import navigation as NAV

    df = spark.createDataFrame(
        [(rlon1, rlat1, rlon2, rlat2, plon, plat)],
        "rlon1 double, rlat1 double, rlon2 double, rlat2 double, plon double, plat double",
    )
    cols = [F.col(c) for c in ("rlon1", "rlat1", "rlon2", "rlat2", "plon", "plat")]
    [r] = df.select(
        NAV.cross_track_m(*cols).alias("dxt"),
        NAV.along_track_m(*cols).alias("dat"),
        NAV.bearing(F.col("rlon1"), F.col("rlat1"), F.col("rlon2"), F.col("rlat2")).alias("brg"),
    ).collect()
    return r


def test_point_on_route_has_zero_cross_track(spark):
    r = _one(spark, 0.0, 0.0, 10.0, 0.0, 5.0, 0.0)
    assert abs(r.dxt) < 1e-6
    # along-track on the equator is exact arc length
    assert r.dat == pytest.approx(math.radians(5.0) * EARTH_RADIUS_M, rel=1e-12)


def test_cross_track_sign_right_positive(spark):
    # route west->east along the equator; a point NORTH of it is LEFT
    # of the course -> negative; SOUTH is right -> positive
    north = _one(spark, 0.0, 0.0, 10.0, 0.0, 5.0, 1.0)
    south = _one(spark, 0.0, 0.0, 10.0, 0.0, 5.0, -1.0)
    assert south.dxt > 0 > north.dxt
    assert north.dxt == pytest.approx(-south.dxt, rel=1e-9)
    # |dxt| on a meridian offset from the equator route = arc of latitude
    assert abs(north.dxt) == pytest.approx(math.radians(1.0) * EARTH_RADIUS_M, rel=1e-9)


def test_bearing_cardinal_directions(spark):
    east = _one(spark, 0.0, 0.0, 10.0, 0.0, 1.0, 0.0)
    assert east.brg == pytest.approx(math.pi / 2, rel=1e-12)
    north = _one(spark, 0.0, 0.0, 0.0, 10.0, 0.0, 1.0)
    assert north.brg == pytest.approx(0.0, abs=1e-12)


def test_sql_mirror_matches_spark(spark):
    """The DuckDB-dialect mirrors evaluate to the same values."""
    import duckdb

    from proj_spark.functions import navigation as NAV

    args = ("-100.0", "35.0", "-80.0", "42.0", "-95.0", "40.0")
    got = duckdb.sql(
        f"SELECT {NAV.cross_track_sql(*args)} AS dxt, {NAV.along_track_sql(*args)} AS dat"
    ).fetchone()
    r = _one(spark, -100.0, 35.0, -80.0, 42.0, -95.0, 40.0)
    assert r.dxt == pytest.approx(got[0], abs=1e-6)
    assert r.dat == pytest.approx(got[1], abs=1e-6)


def test_is_pure_codegen_no_udf(spark):
    from proj_spark.functions import navigation as NAV

    df = spark.range(100).select(
        (F.col("id") % 50 - 100.0).cast("double").alias("plon"),
        (F.col("id") % 20 + 30.0).cast("double").alias("plat"),
    )
    out = df.select(
        NAV.cross_track_m(
            F.lit(-100.0), F.lit(35.0), F.lit(-80.0), F.lit(42.0),
            F.col("plon"), F.col("plat"),
        ).alias("dxt")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # codegen stages print as "*(n)" in the executed-plan string
    assert "*(1)" in plan or "WholeStageCodegen" in plan
