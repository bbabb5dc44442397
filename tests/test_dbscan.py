"""DBSCAN: exactness vs a single-process reference implementation,
determinism under repartitioning, and the three classic point roles
(core / border / noise) on a constructed fixture."""
from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from proj_spark.operators.dbscan import dbscan, eps_neighbor_pairs

EPS_M = 120_000.0
MIN_PTS = 4


def _pts(n=400, seed=99):
    out = []
    s = seed
    for i in range(n):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        u = (s >> 11) / float(1 << 53)
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        v = (s >> 11) / float(1 << 53)
        out.append((i, -125.0 + 58.0 * u, 25.0 + 24.0 * v))
    return out


def _hav(a, b):
    R = 6371008.8
    la1, la2 = math.radians(a[2]), math.radians(b[2])
    dla = (la2 - la1) / 2
    dlo = (math.radians(b[1]) - math.radians(a[1])) / 2
    h = math.sin(dla) ** 2 + math.cos(la1) * math.cos(la2) * math.sin(dlo) ** 2
    return 2 * R * math.asin(math.sqrt(min(h, 1.0)))


def _reference_dbscan(pts, eps_m, min_pts):
    n = len(pts)
    nbrs = {p[0]: set() for p in pts}
    for i in range(n):
        for j in range(i + 1, n):
            if _hav(pts[i], pts[j]) <= eps_m:
                nbrs[pts[i][0]].add(pts[j][0])
                nbrs[pts[j][0]].add(pts[i][0])
    core = {i for i, s in nbrs.items() if len(s) + 1 >= min_pts}
    # CC over core-core edges, label = min core id
    lab = {i: i for i in core}

    def find(x):
        while lab[x] != x:
            lab[x] = lab[lab[x]]
            x = lab[x]
        return x

    for i in core:
        for j in nbrs[i]:
            if j in core:
                a, b = find(i), find(j)
                if a != b:
                    lab[max(a, b)] = min(a, b)
    cluster = {}
    for i in core:
        cluster[i] = find(i)
    out = {}
    for i, _, _ in pts:
        if i in core:
            out[i] = (cluster[i], True)
        else:
            cands = [cluster[j] for j in nbrs[i] if j in core]
            out[i] = (min(cands) if cands else -1, False)
    return out


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame(_pts(), "id long, lon double, lat double")


def test_matches_reference(spark, fixture_df):
    got = {
        r["id"]: (r["cluster"], r["is_core"])
        for r in dbscan(fixture_df, EPS_M, MIN_PTS).collect()
    }
    want = _reference_dbscan(_pts(), EPS_M, MIN_PTS)
    assert got == want
    # the fixture must actually exercise all three roles
    roles = {(c == -1, core) for c, core in want.values()}
    assert (True, False) in roles, "no noise in fixture"
    assert (False, True) in roles, "no core in fixture"
    assert (False, False) in roles, "no border in fixture"


def test_partitioning_invariance(spark, fixture_df):
    a = dbscan(fixture_df.repartition(17), EPS_M, MIN_PTS).collect()
    b = dbscan(fixture_df.coalesce(1), EPS_M, MIN_PTS).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pairs_symmetric_and_exact(spark, fixture_df):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in eps_neighbor_pairs(fixture_df, EPS_M).collect()
    }
    pts = _pts()
    want = set()
    for i in range(len(pts)):
        for j in range(len(pts)):
            if i != j and _hav(pts[i], pts[j]) <= EPS_M:
                want.add((pts[i][0], pts[j][0]))
    assert pairs == want
