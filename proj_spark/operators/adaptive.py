"""Adaptive quadtree binning: equi-load spatial partitioning.

Fixed-resolution cells skew badly at 10^12 rows (one city cell holds
millions of image centroids, the ocean holds none).  The standard cure
is a quadtree cut: every point is binned at the SHORTEST quadkey
prefix whose total point count is ≤ ``cap`` (never splitting further
than ``max_level``), so dense regions get deep small bins and sparse
regions stay coarse — bounded work per bin, which is exactly the
partitioning story AQE cannot infer statically.

Closed form, not iterative: a point's candidate bins are its quadkey
prefixes, one per level.  Counting points per (level, prefix) is ONE
aggregation over the level-exploded quadkeys, and the chosen bin is
the minimum satisfying level per point — no driver loop, no recursive
splitting, and the result is partitioning-invariant (a pure function
of the dataset's multiset of quadkeys).  An SQL engine replays it
with the same two aggregates.

Scale shape: explode fan is (max_level+1), counts table is at most
the number of OCCUPIED prefixes (≤ 4^max_level but bounded by data),
and the per-point choice is a broadcast-join + min — per-point cost
O(levels), never O(points²).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import expressions as E


def adaptive_bins(
    points: DataFrame,
    cap: int,
    max_level: int = 8,
    id_col: str = "id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """(id, bin, level) per point: ``bin`` is the chosen quadkey
    prefix ('' = the whole world at level 0), ``level`` its length;
    the shortest prefix with count ≤ cap, else the point's full
    ``max_level`` quadkey."""
    tx = E.tile_x(lon, max_level)
    ty = E.tile_y(lat, max_level)
    pts = points.select(
        F.col(id_col).alias("id"),
        E.quadkey(tx, ty, max_level).alias("_qk"),
    )
    lvl = F.explode(F.sequence(F.lit(0), F.lit(max_level))).alias("level")
    pref = pts.select("id", "_qk", lvl).withColumn(
        "prefix", F.expr("substring(_qk, 1, level)")
    )
    counts = pref.groupBy("level", "prefix").agg(F.count(F.lit(1)).alias("n"))
    ok = counts.where(F.col("n") <= cap).select(
        "level", "prefix", F.lit(True).alias("_ok")
    )
    chosen = (
        pref.join(F.broadcast(ok), on=["level", "prefix"], how="left")
        .groupBy("id", "_qk")
        .agg(F.min(F.when(F.col("_ok"), F.col("level"))).alias("_lvl"))
    )
    return chosen.select(
        "id",
        F.when(F.col("_lvl").isNull(), F.col("_qk"))
        .otherwise(F.expr("substring(_qk, 1, _lvl)"))
        .alias("bin"),
        F.coalesce(F.col("_lvl"), F.lit(max_level)).cast("long").alias("level"),
    )
