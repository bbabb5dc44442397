"""SSSP Bellman-Ford relaxation (operators/network.py) vs Dijkstra and
the capped recursive-CTE oracle."""
import heapq

import duckdb
import pytest
from pyspark.sql import functions as F

from proj_spark.operators.network import (
    lattice_edges,
    lattice_edges_sql,
    sssp,
    sssp_oracle_sql,
)

NX, NY, SRC = 12, 9, 0


def _dijkstra(edges, src):
    adj = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    dist = {src: 0}
    pq = [(0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, 1 << 62):
            continue
        for v, w in adj.get(u, ()):
            if d + w < dist.get(v, 1 << 62):
                dist[v] = d + w
                heapq.heappush(pq, (d + w, v))
    return dist


@pytest.fixture(scope="module")
def edges(spark):
    return lattice_edges(spark, NX, NY)


def test_fixture_matches_sql_closed_form(spark, edges):
    se = sorted(tuple(int(v) for v in r) for r in edges.collect())
    oe = sorted(
        tuple(int(v) for v in r)
        for r in duckdb.sql(lattice_edges_sql(NX, NY)).fetchall()
    )
    assert se == oe
    # weights span the full 1..9 range (non-degenerate fixture)
    ws = {w for _, _, w in se}
    assert ws == set(range(1, 10))


def test_sssp_matches_dijkstra(spark, edges):
    got = {int(r["node"]): int(r["dist"]) for r in sssp(edges, SRC).collect()}
    want = _dijkstra([tuple(r) for r in edges.collect()], SRC)
    assert got == want
    assert len(got) == NX * NY  # lattice is connected


def test_sssp_matches_recursive_oracle(spark, edges):
    got = sorted(
        (int(r["node"]), int(r["dist"])) for r in sssp(edges, SRC).collect()
    )
    want = sorted(
        (int(a), int(b))
        for a, b in duckdb.sql(sssp_oracle_sql(NX, NY, SRC)).fetchall()
    )
    assert got == want


def test_directed_vs_undirected(spark):
    """A one-way chain: forward distances exist, backward don't."""
    e = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 7)], "u long, v long, w long"
    )
    fwd = {r["node"]: r["dist"] for r in sssp(e, 0, directed=True).collect()}
    assert fwd == {0: 0, 1: 5, 2: 12}
    back = {r["node"]: r["dist"] for r in sssp(e, 2, directed=True).collect()}
    assert back == {2: 0}  # source only; upstream unreachable


def test_unreachable_absent(spark):
    e = spark.createDataFrame(
        [(0, 1, 3), (5, 6, 1)], "u long, v long, w long"
    )
    got = {r["node"]: r["dist"] for r in sssp(e, 0).collect()}
    assert got == {0: 0, 1: 3}


def test_nearest_facility_matches_multisource_dijkstra(spark, edges):
    from proj_spark.operators.network import facility_oracle_sql, nearest_facility

    srcs = [0, 57, 101]
    got = sorted(
        (int(r["node"]), int(r["dist"]), int(r["fac"]))
        for r in nearest_facility(edges, srcs).collect()
    )
    # multi-source Dijkstra with lexicographic (dist, fac) labels
    adj = {}
    for u, v, w in (tuple(r) for r in edges.collect()):
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    lab = {s: (0, s) for s in srcs}
    pq = [(0, s, s) for s in srcs]
    heapq.heapify(pq)
    while pq:
        d, f, u = heapq.heappop(pq)
        if (d, f) > lab.get(u, (1 << 62, 1 << 62)):
            continue
        for v, w in adj.get(u, ()):
            c = (d + w, f)
            if c < lab.get(v, (1 << 62, 1 << 62)):
                lab[v] = c
                heapq.heappush(pq, (c[0], c[1], v))
    want = sorted((n, d, f) for n, (d, f) in lab.items())
    assert got == want
    ora = sorted(
        tuple(int(v) for v in r)
        for r in duckdb.sql(facility_oracle_sql(NX, NY, srcs)).fetchall()
    )
    assert got == ora
    # every facility claims a non-empty catchment
    facs = {f for _, _, f in got}
    assert facs == set(srcs)
