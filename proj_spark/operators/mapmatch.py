"""Map-matching: snap points to the nearest line segment within a radius.

The GPS-trace / road-network primitive: for every ping, find the
nearest segment (road edge, coastline edge, flight leg) within
``radius``, plus the along-segment parameter t of the foot point —
the building block for route attribution and trajectory snapping.

Scale shape: the BIG side (10^12 points) is never exploded — each
point carries exactly its own cell key.  The fan lives on the small
side: every segment is registered in each cell its bbox EXPANDED BY
THE RADIUS covers (cell size = radius, so a segment of length L costs
~(L/radius + 3)^2 index rows — bounded for short network edges).
Completeness: if dist(p, seg) <= radius then seg's expanded bbox
contains p, hence seg is registered in p's cell — no candidate is
missed.  One equi-join on the cell key, exact point-to-segment
distance, then one groupBy(point) min(struct(d2, seg_id)) — the same
arg-min-with-total-order trick the kNN lane uses, so ties are
deterministic.

All geometry is planar lon/lat and pure +,-,*,/ arithmetic
(IEEE-exact, bit-identical across engines); the DuckDB oracle
re-derives the result by brute force over ALL segments, so the gate
also proves the cell cover loses nothing.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D2Q = 1e12  # quantum for squared degree distances
_TQ = 1e9  # quantum for the along-segment parameter


def snap_to_segments(
    points: DataFrame,
    segments: DataFrame,
    radius: float,
    id_col: str = "id",
    lon: str = "lon",
    lat: str = "lat",
    seg_id: str = "seg_id",
) -> DataFrame:
    """(id, seg_id, d2_q, t_q): nearest segment within ``radius``
    (planar degrees), ties broken by smallest seg_id.  Points with no
    segment in range are dropped.  ``segments`` needs columns
    (seg_id, ax, ay, bx, by)."""
    cell = radius

    segs = segments.select(
        F.col(seg_id).alias("_sid"), "ax", "ay", "bx", "by",
        F.floor((F.least("ax", "bx") - radius) / cell).cast("long").alias("_x0"),
        F.floor((F.greatest("ax", "bx") + radius) / cell).cast("long").alias("_x1"),
        F.floor((F.least("ay", "by") - radius) / cell).cast("long").alias("_y0"),
        F.floor((F.greatest("ay", "by") + radius) / cell).cast("long").alias("_y1"),
    )
    idx = (
        segs.select("*", F.explode(F.sequence("_x0", "_x1")).alias("_cx"))
        .select("*", F.explode(F.sequence("_y0", "_y1")).alias("_cy"))
        .select("_sid", "ax", "ay", "bx", "by", "_cx", "_cy")
    )
    pts = points.select(
        F.col(id_col).alias("_pid"),
        F.col(lon).alias("_px"),
        F.col(lat).alias("_py"),
        F.floor(F.col(lon) / cell).cast("long").alias("_cx"),
        F.floor(F.col(lat) / cell).cast("long").alias("_cy"),
    )
    j = pts.join(F.broadcast(idx), on=["_cx", "_cy"])

    dx, dy = F.col("bx") - F.col("ax"), F.col("by") - F.col("ay")
    l2 = dx * dx + dy * dy
    tnum = (F.col("_px") - F.col("ax")) * dx + (F.col("_py") - F.col("ay")) * dy
    t = F.when(l2 > 0, F.least(F.greatest(tnum / l2, F.lit(0.0)), F.lit(1.0))).otherwise(
        F.lit(0.0)
    )
    qx = F.col("ax") + t * dx
    qy = F.col("ay") + t * dy
    d2 = (F.col("_px") - qx) * (F.col("_px") - qx) + (F.col("_py") - qy) * (
        F.col("_py") - qy
    )
    cand = j.select(
        "_pid",
        F.struct(
            d2.alias("d2"), F.col("_sid").alias("sid"), t.alias("t")
        ).alias("_c"),
    ).where(F.col("_c.d2") <= radius * radius)
    best = cand.groupBy("_pid").agg(F.min("_c").alias("_b"))
    return best.select(
        F.col("_pid").alias("id"),
        F.col("_b.sid").alias("seg_id"),
        F.floor(F.col("_b.d2") * _D2Q).cast("long").alias("d2_q"),
        F.floor(F.col("_b.t") * _TQ).cast("long").alias("t_q"),
    )
