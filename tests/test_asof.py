"""Generic as-of join: reference parity, equal-ts visibility, misses,
tolerance, and partitioning invariance."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proj_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", 10.0, "a"),
            ("u1", 20.0, "b"),
            ("u1", 5.0, "c"),    # before any right row -> miss
            ("u2", 50.0, "d"),
            ("u3", 7.0, "e"),    # key with no right rows at all
        ],
        "k string, t double, tag string",
    )
    right = spark.createDataFrame(
        [
            ("u1", 10.0, 100),   # equal ts: visible to left(u1, 10)
            ("u1", 15.0, 150),
            ("u2", 1.0, 10),
        ],
        "k string, t double, v int",
    )
    return left, right


def test_semantics(spark, frames):
    left, right = frames
    got = {
        r["tag"]: (r["asof_ts"], r["v"])
        for r in asof_join(left, right, key="k", ts="t").collect()
    }
    assert got == {
        "a": (10.0, 100),   # right row AT the left ts is visible
        "b": (15.0, 150),   # latest preceding
        "c": (None, None),  # nothing at or before
        "d": (1.0, 10),
        "e": (None, None),  # key absent on the right
    }


def test_tolerance(spark, frames):
    left, right = frames
    got = {
        r["tag"]: r["v"]
        for r in asof_join(left, right, key="k", ts="t", tolerance=10.0).collect()
    }
    # u2's match is 49 s old -> nulled; u1's stay (age 0 and 5)
    assert got == {"a": 100, "b": 150, "c": None, "d": None, "e": None}


def test_partitioning_invariance(spark, frames):
    left, right = frames
    a = sorted(map(tuple, asof_join(left.repartition(7), right.repartition(5), "k", "t").collect()))
    b = sorted(map(tuple, asof_join(left.coalesce(1), right.coalesce(1), "k", "t").collect()))
    assert a == b


def test_matches_duckdb_native_asof(spark):
    """Cross-engine: the union+window formulation equals DuckDB's
    NATIVE ASOF JOIN on a 2000-row LCG fixture."""
    import duckdb

    rows_l, rows_r, s = [], [], 5150
    for i in range(2000):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        u = (s >> 11) / float(1 << 53)
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        v = (s >> 11) / float(1 << 53)
        k = f"k{i % 37}"
        if i % 3:
            rows_l.append((k, round(1000.0 * u, 6), i))
        else:
            rows_r.append((k, round(1000.0 * v, 6), i))
    left = spark.createDataFrame(rows_l, "k string, t double, lid long")
    right = spark.createDataFrame(rows_r, "k string, t double, rid long")
    got = {
        r["lid"]: (r["asof_ts"], r["rid"])
        for r in asof_join(left, right, key="k", ts="t").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE l(k VARCHAR, t DOUBLE, lid BIGINT); "
        "CREATE TABLE r(k VARCHAR, t DOUBLE, rid BIGINT)"
    )
    con.executemany("INSERT INTO l VALUES (?,?,?)", rows_l)
    con.executemany("INSERT INTO r VALUES (?,?,?)", rows_r)
    want = {
        lid: (ats, rid)
        for lid, ats, rid in con.execute(
            "SELECT l.lid, r.t, r.rid FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.t >= r.t"
        ).fetchall()
    }
    assert got == want


def test_plan_single_shuffle(spark, frames):
    """The as-of plan must shuffle exactly once (the window partition
    on the key) — no join replication, no range explosion."""
    left, right = frames
    df = asof_join(left, right, key="k", ts="t")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
