"""Trajectory statistics (operators/trajectory.py): exact values on a
hand-built track, degenerate entities, tie determinism, partition
invariance, and the one-shuffle plan contract."""
import datetime as dt
import math

from pyspark.sql import functions as F

from proj_spark.operators.trajectory import trajectory_stats

EARTH = 6371008.8


def _hav_m(lon1, lat1, lon2, lat2):
    p = math.pi / 180.0
    h = (
        math.sin((lat2 - lat1) * p * 0.5) ** 2
        + math.cos(lat1 * p) * math.cos(lat2 * p) * math.sin((lon2 - lon1) * p * 0.5) ** 2
    )
    return 2.0 * EARTH * math.asin(math.sqrt(min(h, 1.0)))


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_exact_values_on_hand_track(spark):
    # user 1: three fixes west->east along the equator-ish; user 2: one fix
    rows = [
        (1, _t(0), 10, -100.0, 40.0),
        (1, _t(10), 11, -99.0, 40.0),
        (1, _t(20), 12, -99.0, 41.0),
        (2, _t(5), 20, -80.0, 30.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, lon double, lat double")
    got = {
        r.user: r.asDict()
        for r in trajectory_stats(df, tie="event_id").collect()
    }
    s1 = math.floor(_hav_m(-100.0, 40.0, -99.0, 40.0) * 10.0)
    s2 = math.floor(_hav_m(-99.0, 40.0, -99.0, 41.0) * 10.0)
    net = math.floor(_hav_m(-100.0, 40.0, -99.0, 41.0) * 10.0)
    assert got[1]["n_points"] == 3 and got[1]["n_steps"] == 2
    assert got[1]["path_dm"] == s1 + s2
    assert got[1]["max_step_dm"] == max(s1, s2)
    assert got[1]["net_dm"] == net
    # single-point entity: zero path, max sentinel -1, net 0
    assert got[2]["n_points"] == 1 and got[2]["n_steps"] == 0
    assert got[2]["path_dm"] == 0 and got[2]["max_step_dm"] == -1
    assert got[2]["net_dm"] == 0


def test_tie_break_makes_equal_timestamps_deterministic(spark):
    # two fixes share a timestamp; event_id orders them B-then-C
    rows = [
        (1, _t(0), 1, 0.0, 0.0),
        (1, _t(1), 3, 1.0, 0.0),
        (1, _t(1), 2, 0.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, lon double, lat double")
    r = trajectory_stats(df, tie="event_id").collect()[0]
    s1 = math.floor(_hav_m(0.0, 0.0, 0.0, 1.0) * 10.0)
    s2 = math.floor(_hav_m(0.0, 1.0, 1.0, 0.0) * 10.0)
    assert r.path_dm == s1 + s2
    # last fix by (ts, event_id) is (1.0, 0.0)
    assert r.net_dm == math.floor(_hav_m(0.0, 0.0, 1.0, 0.0) * 10.0)


def test_partition_invariance(spark):
    rows = [
        (u, _t(i), u * 1000 + i, -100.0 + 0.01 * i * (u + 1), 35.0 + 0.003 * i)
        for u in range(5)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, lon double, lat double")
    a = sorted(
        map(tuple, trajectory_stats(df.repartition(1), tie="event_id").collect())
    )
    b = sorted(
        map(tuple, trajectory_stats(df.repartition(13), tie="event_id").collect())
    )
    assert a == b


def test_single_shuffle_plan(spark):
    """Window + groupBy share the entity hash partitioning: exactly one
    hash-partitioning exchange end to end."""
    df = spark.createDataFrame(
        [(1, _t(0), 1, 0.0, 0.0)],
        "user_id long, ts timestamp, event_id long, lon double, lat double",
    )
    plan = trajectory_stats(df, tie="event_id")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


# ---------------------------------------------------------- stay points
def _tm(m, s=0):
    return dt.datetime(2024, 1, 1, 0, m, s)


def test_stay_points_hand_track(spark):
    from proj_spark.operators.trajectory import stay_points

    # user 1 dwells at (-100, 40) for 700s (3 pings), hops cells, then
    # a short 100s revisit that must be filtered out
    rows = [
        (1, _t(0), 1, -100.0, 40.0),
        (1, _t(5), 2, -100.001, 40.001),
        (1, _tm(11, 40), 3, -100.002, 40.002),  # 700s after first
        (1, _tm(12, 0), 4, -80.0, 30.0),  # different cell
        (1, _tm(12, 10), 5, -80.0, 30.0),  # 10s dwell: filtered
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, lon double, lat double"
    )
    out = stay_points(df, res=7, min_dwell_s=600, user="user_id", tie="event_id").collect()
    assert len(out) == 1
    r = out[0]
    assert r["user"] == 1 and r["seq"] == 0 and r["n_pings"] == 3
    assert r["dwell_s"] == 700
    assert r["qlon_sum"] == sum(math.floor(x * 1e6) for x in (-100.0, -100.001, -100.002))
    assert r["qlat_sum"] == sum(math.floor(x * 1e6) for x in (40.0, 40.001, 40.002))


def test_stay_points_cell_revisit_is_a_new_stay(spark):
    from proj_spark.operators.trajectory import stay_points

    # dwell -> move away -> come back and dwell again: two stay rows
    rows = [
        (1, _t(0), 1, -100.0, 40.0),
        (1, _tm(11, 0), 2, -100.0, 40.0),
        (1, _tm(12, 0), 3, -80.0, 30.0),
        (1, _tm(13, 0), 4, -100.0, 40.0),
        (1, _tm(24, 0), 5, -100.0, 40.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, lon double, lat double"
    )
    out = sorted(
        stay_points(df, res=7, min_dwell_s=600, user="user_id", tie="event_id").collect(),
        key=lambda r: r["seq"],
    )
    assert [r["seq"] for r in out] == [0, 2]
    assert out[0]["cell"] == out[1]["cell"]


def test_stay_points_partition_invariance(spark):
    from proj_spark.operators.trajectory import stay_points

    rows = [
        (u, _tm(i % 60, (i * 7) % 60), u * 1000 + i,
         -100.0 + 0.5 * ((u + i // 20) % 5), 35.0 + 0.4 * (i // 30))
        for u in range(4)
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, lon double, lat double"
    )
    a = sorted(map(tuple, stay_points(df.repartition(1), res=7, min_dwell_s=60, user="user_id", tie="event_id").collect()))
    b = sorted(map(tuple, stay_points(df.repartition(13), res=7, min_dwell_s=60, user="user_id", tie="event_id").collect()))
    assert a == b and len(a) > 0


def test_stay_points_single_shuffle_plan(spark):
    from proj_spark.operators.trajectory import stay_points

    df = spark.createDataFrame(
        [(1, _t(0), 1, 0.0, 0.0)],
        "user_id long, ts timestamp, event_id long, lon double, lat double",
    )
    plan = (
        stay_points(df, res=7, min_dwell_s=600, user="user_id", tie="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
