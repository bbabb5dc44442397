"""kNN join: k-ring cell expansion + haversine ranking (+ optional
geodesic refinement), per the north rule.

Two implementations:

- :func:`knn_join_bruteforce` — exact oracle.  Broadcast the (small)
  query side, evaluate haversine for every (candidate, query) pair as
  a native expression, window top-k.  No Python; one shuffle (the
  window partitionBy query_id).  Right at 10^12 candidate rows iff the
  query set is small (cost = |candidates| x |queries| distance evals).

- :func:`knn_join` — the scale path.  Candidates carry a cell id;
  queries explode their k-ring (functions/expressions.cell_neighbors)
  and broadcast-join candidates on cell, so each candidate row is
  touched only by nearby queries.  Guarantee: after ranking, a query's
  k-th distance must not exceed the ring's guaranteed coverage radius
  (distance from the query to the ring boundary); queries that fail
  the guarantee (or found < k) are re-run brute-force.  The fallback
  set is tiny, so the expected cost is ~|candidates touched by rings|.

Determinism: ties broken by (dist, neighbor_id) — total order, stable
under any partitioning (the Spark analog of multistresstest's bitwise
reproducibility requirement).
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import expressions as E

EARTH_M = E.EARTH_RADIUS_M


def _topk(pairs: DataFrame, query_id: str, k: int) -> DataFrame:
    w = Window.partitionBy(query_id).orderBy(F.col("dist_m").asc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def knn_join_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    q_id: str = "query_id",
    q_lon: str = "q_lon",
    q_lat: str = "q_lat",
    c_id: str = "cand_id",
    c_lon: str = "c_lon",
    c_lat: str = "c_lat",
) -> DataFrame:
    """Exact kNN via broadcast cross join + window top-k."""
    q = queries.select(
        F.col(q_id).alias("query_id"),
        F.col(q_lon).alias("_qlon"),
        F.col(q_lat).alias("_qlat"),
    )
    c = candidates.select(
        F.col(c_id).alias("neighbor_id"),
        F.col(c_lon).alias("_clon"),
        F.col(c_lat).alias("_clat"),
    )
    pairs = c.crossJoin(F.broadcast(q)).withColumn(
        "dist_m", E.haversine_m("_qlon", "_qlat", "_clon", "_clat")
    )
    return _topk(pairs, "query_id", k).select("query_id", "neighbor_id", "rank", "dist_m")


def knn_join(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    res: int = 6,
    ring: int = 1,
    q_id: str = "query_id",
    q_lon: str = "q_lon",
    q_lat: str = "q_lat",
    c_id: str = "cand_id",
    c_lon: str = "c_lon",
    c_lat: str = "c_lat",
    verify_cover: bool = True,
) -> DataFrame:
    """Cell-pruned kNN with brute-force fallback for uncovered queries.

    The candidate side computes one cell id (narrow); the query side
    (small) explodes its (2*ring+1)^2 k-ring and is broadcast, so the
    big side never shuffles for the join.
    """
    c = candidates.select(
        F.col(c_id).alias("neighbor_id"),
        F.col(c_lon).alias("_clon"),
        F.col(c_lat).alias("_clat"),
    ).withColumn("_ccell", E.cell_id("_clon", "_clat", res))

    q = queries.select(
        F.col(q_id).alias("query_id"),
        F.col(q_lon).alias("_qlon"),
        F.col(q_lat).alias("_qlat"),
    )
    q_cells = q.withColumn(
        "_cell", F.explode(E.cell_neighbors(E.cell_id("_qlon", "_qlat", res), res, k=ring))
    )

    pairs = c.join(F.broadcast(q_cells), c["_ccell"] == q_cells["_cell"], "inner").withColumn(
        "dist_m", E.haversine_m("_qlon", "_qlat", "_clon", "_clat")
    )
    ranked = _topk(pairs, "query_id", k).select("query_id", "neighbor_id", "rank", "dist_m")

    if not verify_cover:
        return ranked

    # coverage radius: ring of R cells guarantees correctness iff the
    # k-th neighbor is closer than `ring` whole cells in the tightest
    # direction.  Cell height is 180/2^res deg everywhere; cell width
    # shrinks with cos(lat) — height is the binding dimension and
    # longitude compression only enlarges the safe radius, so use
    # ring * cell_height_m as the conservative bound.
    cell_h_m = math.pi * EARTH_M * (180.0 / (1 << res)) / 180.0
    safe_m = ring * cell_h_m

    per_q = ranked.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("_n"), F.max("dist_m").alias("_maxd")
    )
    bad_q = per_q.where((F.col("_n") < k) | (F.col("_maxd") > safe_m)).select("query_id")
    bad_queries = q.join(F.broadcast(bad_q), on="query_id", how="inner")

    good = ranked.join(F.broadcast(bad_q), on="query_id", how="left_anti")
    redo = knn_join_bruteforce(
        bad_queries,
        candidates,
        k=k,
        q_id="query_id",
        q_lon="_qlon",
        q_lat="_qlat",
        c_id=c_id,
        c_lon=c_lon,
        c_lat=c_lat,
    )
    return good.unionByName(redo)
