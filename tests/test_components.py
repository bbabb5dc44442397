"""Connected components / dedup groups (operators/components.py).

Reference: a plain Python union-find over the same edges.
"""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from proj_spark.operators.components import connected_components, dedup_groups


def _union_find(edges, nodes=None):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for x in list(parent) + list(nodes or []):
        out[x] = find(x)
    return out


def _check(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.component for r in connected_components(df).collect()
    }
    want = _union_find(edges)
    assert got == want
    return got


def test_random_graph_matches_union_find(spark):
    rng = np.random.default_rng(42)
    edges = [
        (int(rng.integers(0, 500)), int(rng.integers(0, 500))) for _ in range(400)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    _check(spark, edges)


def test_chain_converges_logarithmically(spark):
    # a 64-node path is the worst diameter case; pointer jumping must
    # still converge well inside max_iter
    edges = [(i, i + 1) for i in range(63)]
    got = _check(spark, edges)
    assert set(got.values()) == {0}


def test_two_cliques_and_a_bridge(spark):
    edges = (
        [(i, j) for i in range(5) for j in range(i + 1, 5)]
        + [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
        + [(4, 10)]
    )
    got = _check(spark, edges)
    assert set(got.values()) == {0}


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(1, 1), (2, 3), (3, 2), (2, 3)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    # self loops don't merge anything, but a node appearing only in a
    # self pair still gets its singleton output row (docstring contract)
    assert got == {1: 1, 2: 2, 3: 2}


def test_string_ids(spark):
    df = spark.createDataFrame(
        [("d3", "d1"), ("d2", "d3"), ("x9", "x8")], "id_a string, id_b string"
    )
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == {"d1": "d1", "d2": "d1", "d3": "d1", "x8": "x8", "x9": "x8"}


def test_dedup_groups_canonical_flag(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", f"text {i}") for i in range(6)], "doc_id string, text string"
    )
    pairs = spark.createDataFrame(
        [("d1", "d3"), ("d3", "d5")], "id_a string, id_b string"
    )
    out = dedup_groups(docs, pairs).collect()
    groups = {r.doc_id: (r.group_id, r.is_canonical) for r in out}
    assert groups == {
        "d0": ("d0", True),
        "d1": ("d1", True),
        "d2": ("d2", True),
        "d3": ("d1", False),
        "d4": ("d4", True),
        "d5": ("d1", False),
    }
    # keep-canonical filter drops exactly the non-minimal dups
    kept = [r.doc_id for r in out if r.is_canonical]
    assert sorted(kept) == ["d0", "d1", "d2", "d4"]


def test_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0
    docs = spark.createDataFrame([(1,), (2,)], "doc_id bigint")
    out = dedup_groups(docs, pairs, id_col="doc_id").collect()
    assert all(r.group_id == r.doc_id and r.is_canonical for r in out)


def test_canonical_by_quality(spark):
    from pyspark.sql import functions as F

    from proj_spark.operators.components import canonical_by

    df = spark.createDataFrame(
        [
            ("d1", "g1", 0.2),
            ("d2", "g1", 0.9),  # best quality wins over min id
            ("d3", "g1", 0.9),  # tie -> min id among the tied
            ("d4", "g2", 0.1),  # singleton group: canonical
        ],
        "doc_id string, group_id string, quality double",
    )
    out = {
        r.doc_id: r.is_canonical
        for r in canonical_by(df, order_cols=[F.col("quality").desc()]).collect()
    }
    assert out == {"d1": False, "d2": True, "d3": False, "d4": True}


def test_one_spark_job_per_round(spark):
    """Regression gate for the one-action-per-round shape (r3 task 6 /
    round-4 review): the lazy ``localCheckpoint(eager=False)`` must be
    materialized BY the convergence count, not by a separate eager job.
    With AQE off every action is exactly one job, so jobs-in-group ==
    rounds; the old ``eager=True`` + ``limit(1).count()`` shape would
    record 2x."""
    import uuid

    sc = spark.sparkContext
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    rounds = {"n": 0}

    def counting_count(self):
        rounds["n"] += 1
        return real_count(self)

    group = f"cc-jobcount-{uuid.uuid4().hex[:8]}"
    edges = [(i, i + 1) for i in range(16)] + [(100, 101), (101, 102)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    cls = type(df)  # the classic runtime class, not the API base
    real_count = cls.count
    cls.count = counting_count
    try:
        sc.setJobGroup(group, "cc job-count gate")
        connected_components(df).count()  # final count = 1 extra action
    finally:
        cls.count = real_count
        sc.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    # rounds["n"] includes the final materializing count -> actions ==
    # (convergence rounds) + 1; every action is one job, none extra.
    assert rounds["n"] >= 3  # the chain needs >1 round, sanity
    assert len(jobs) == rounds["n"], (len(jobs), rounds["n"])
