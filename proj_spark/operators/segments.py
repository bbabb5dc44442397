"""Segment-intersection join: which line segments cross which.

The line x line overlay (roads crossing admin boundaries, trajectories
crossing geofence edges, cadastral conflict detection) — the one join
geometry the PIP / kNN / range / as-of family doesn't cover.  The
sequential sweep-line algorithms (Bentley-Ottmann) don't distribute;
the scale decomposition is the same cell-bucket candidate pattern as
the other spatial joins:

1. each segment explodes to the equirectangular index cells covering
   its BBOX (segments are short relative to cells by construction —
   ``max_cells`` guards the fan);
2. an equi-join on the cell id pairs only nearby segments (both sides
   shuffle on the cell key; never all-pairs);
3. candidate pairs dedupe on (a_id, b_id) — a pair sharing several
   cells must test once — then the exact PROPER-CROSSING predicate
   filters:   ccw(A1,A2,B1)·ccw(A1,A2,B2) < 0  AND
              ccw(B1,B2,A1)·ccw(B1,B2,A2) < 0
   with ccw the doubled signed area (cross product).  Touching
   endpoints / collinear overlap are NOT intersections under this
   strict predicate (documented; the boundary-distance operator covers
   proximity semantics).

Every comparison is a pure double expression, so a SQL engine
evaluating the identical ccw trees reproduces the pair set exactly.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import expressions as E


def _ccw(ax, ay, bx, by, cx, cy) -> Column:
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def ccw_sql(ax, ay, bx, by, cx, cy) -> str:
    """Token-identical SQL mirror of the ccw expression."""
    return f"(({bx}) - ({ax})) * (({cy}) - ({ay})) - (({by}) - ({ay})) * (({cx}) - ({ax}))"


def _bbox_cells(x1, y1, x2, y2, res: int, max_cells: int) -> Column:
    """Array of cell ids covering the segment's bbox at ``res``."""
    n = 1 << res
    lo_x = F.least(x1, x2)
    hi_x = F.greatest(x1, x2)
    lo_y = F.least(y1, y2)
    hi_y = F.greatest(y1, y2)

    def ix(lon):
        v = F.floor((lon + 180.0) / 360.0 * (2.0 * n))
        return F.least(F.greatest(v, F.lit(0)), F.lit(2 * n - 1)).cast("long")

    def iy(lat):
        v = F.floor((lat + 90.0) / 180.0 * float(n))
        return F.least(F.greatest(v, F.lit(0)), F.lit(n - 1)).cast("long")

    ix0, ix1 = ix(lo_x), ix(hi_x)
    iy0, iy1 = iy(lo_y), iy(hi_y)
    guard = F.assert_true(
        (ix1 - ix0 + 1) * (iy1 - iy0 + 1) <= max_cells,
        F.lit(
            f"segment bbox covers more than max_cells={max_cells} index "
            f"cells at res — shorten segments or lower res"
        ),
    )
    cells = F.flatten(
        F.transform(
            F.sequence(iy0, iy1),
            lambda yy: F.transform(
                F.sequence(ix0, ix1), lambda xx: yy * F.lit(2 * n) + xx
            ),
        )
    )
    # assert_true evaluates to NULL (or raises); threading it through
    # the when keeps the guard in the plan without changing the value
    return F.when(guard.isNull(), cells)


def segment_intersection_join(
    segs_a: DataFrame,
    segs_b: DataFrame,
    res: int = 6,
    max_cells: int = 16,
) -> DataFrame:
    """``segs_a``/``segs_b``: (seg_id, x1, y1, x2, y2).  Returns the
    distinct (a_id, b_id) pairs whose segments PROPERLY cross."""
    a = segs_a.select(
        F.col("seg_id").alias("a_id"),
        F.col("x1").alias("ax1"), F.col("y1").alias("ay1"),
        F.col("x2").alias("ax2"), F.col("y2").alias("ay2"),
    ).withColumn(
        "_cell",
        F.explode(_bbox_cells(F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2"), res, max_cells)),
    )
    b = segs_b.select(
        F.col("seg_id").alias("b_id"),
        F.col("x1").alias("bx1"), F.col("y1").alias("by1"),
        F.col("x2").alias("bx2"), F.col("y2").alias("by2"),
    ).withColumn(
        "_cell",
        F.explode(_bbox_cells(F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2"), res, max_cells)),
    )
    cand = a.join(b, on="_cell", how="inner")
    d1 = _ccw(F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2"), F.col("bx1"), F.col("by1"))
    d2 = _ccw(F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2"), F.col("bx2"), F.col("by2"))
    d3 = _ccw(F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2"), F.col("ax1"), F.col("ay1"))
    d4 = _ccw(F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2"), F.col("ax2"), F.col("ay2"))
    return (
        cand.where((d1 * d2 < 0) & (d3 * d4 < 0))
        .select("a_id", "b_id")
        .distinct()
    )
