"""BBOX-overlap and interval-overlap joins with reference-point dedup.

The rectangle x rectangle intersection join (feature-bbox overlay, the
candidate stage of every polygon overlay) and its 1-D sibling, the
temporal interval-overlap join.  Both use the cell-bucket candidate
pattern shared by the other spatial joins (segments.py, spatial_join.py)
with one upgrade that matters at 10^12 rows: **reference-point
deduplication** (the PBSM / "report once" trick from the partition-based
spatial-merge join literature).  A pair of boxes sharing k index cells
would be emitted k times by the cell equi-join; instead of a
``distinct()`` — a full extra shuffle on the pair key — each joined row
checks whether ITS cell is the cell containing the intersection's
lower-left corner, and only that one row survives:

1. each box explodes to the cells covering its bbox (``max_cells``
   guards the fan — split monster geometries upstream);
2. equi-join on the cell id (both sides shuffle on the cell key, never
   all-pairs, never a broadcast-nested-loop);
3. the overlap predicate (strict interior intersection:
   ``ax0 < bx1 AND bx0 < ax1`` per axis) filters, and the
   reference-point predicate ``cell == cell_of(max(ax0,bx0),
   max(ay0,by0))`` dedups — a pure filter, NO second shuffle.

Every predicate and the intersection-area expression are pure double
arithmetic, so a SQL engine evaluating the identical trees reproduces
the pair set and areas exactly (oracle: all-pairs SQL).

No reference counterpart: rouault/PROJ has no joins; the cell-cover
machinery generalizes its grid-cell containment scan
(src/pj_apply_gridshift.c:143) to pairwise overlay.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------- 2-D boxes
def _ix(lon: Column, n: int) -> Column:
    v = F.floor((lon + 180.0) / 360.0 * (2.0 * n))
    return F.least(F.greatest(v, F.lit(0)), F.lit(2 * n - 1)).cast("long")


def _iy(lat: Column, n: int) -> Column:
    v = F.floor((lat + 90.0) / 180.0 * float(n))
    return F.least(F.greatest(v, F.lit(0)), F.lit(n - 1)).cast("long")


def _cell(lon: Column, lat: Column, n: int) -> Column:
    return _iy(lat, n) * F.lit(2 * n) + _ix(lon, n)


def _cover(x0, y0, x1, y1, res: int, max_cells: int) -> Column:
    n = 1 << res
    ix0, ix1 = _ix(x0, n), _ix(x1, n)
    iy0, iy1 = _iy(y0, n), _iy(y1, n)
    guard = F.assert_true(
        (ix1 - ix0 + 1) * (iy1 - iy0 + 1) <= max_cells,
        F.lit(
            f"box covers more than max_cells={max_cells} index cells at "
            f"res={res} — split large boxes upstream or lower res"
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
    return F.when(guard.isNull(), cells)


def bbox_overlap_join(
    boxes_a: DataFrame,
    boxes_b: DataFrame,
    res: int = 6,
    max_cells: int = 16,
) -> DataFrame:
    """``boxes_a``/``boxes_b``: (box_id, x0, y0, x1, y1) with x0<x1,
    y0<y1 (degrees).  Returns one row per STRICTLY interior-overlapping
    pair: (a_id, b_id, ix0, iy0, ix1, iy1, area) where ix*/iy* is the
    intersection bbox and area its width*height (deg^2).

    Exactly-once without distinct(): the joined row survives only in
    the index cell that contains the intersection's lower-left corner
    (which is inside both boxes, hence in both covers, hence joined
    exactly once).
    """
    n = 1 << res
    a = boxes_a.select(
        F.col("box_id").alias("a_id"),
        F.col("x0").alias("ax0"), F.col("y0").alias("ay0"),
        F.col("x1").alias("ax1"), F.col("y1").alias("ay1"),
    ).withColumn(
        "_cell",
        F.explode(_cover(F.col("ax0"), F.col("ay0"), F.col("ax1"), F.col("ay1"), res, max_cells)),
    )
    b = boxes_b.select(
        F.col("box_id").alias("b_id"),
        F.col("x0").alias("bx0"), F.col("y0").alias("by0"),
        F.col("x1").alias("bx1"), F.col("y1").alias("by1"),
    ).withColumn(
        "_cell",
        F.explode(_cover(F.col("bx0"), F.col("by0"), F.col("bx1"), F.col("by1"), res, max_cells)),
    )
    ix0 = F.greatest(F.col("ax0"), F.col("bx0"))
    iy0 = F.greatest(F.col("ay0"), F.col("by0"))
    ix1 = F.least(F.col("ax1"), F.col("bx1"))
    iy1 = F.least(F.col("ay1"), F.col("by1"))
    overlap = (
        (F.col("ax0") < F.col("bx1")) & (F.col("bx0") < F.col("ax1"))
        & (F.col("ay0") < F.col("by1")) & (F.col("by0") < F.col("ay1"))
    )
    ref = F.col("_cell") == _cell(ix0, iy0, n)
    return (
        a.join(b, on="_cell", how="inner")
        .where(overlap & ref)
        .select(
            "a_id", "b_id",
            ix0.alias("ix0"), iy0.alias("iy0"),
            ix1.alias("ix1"), iy1.alias("iy1"),
            ((ix1 - ix0) * (iy1 - iy0)).alias("area"),
        )
    )


# ------------------------------------------------------------ 1-D intervals
def _bucket(ts: Column, bucket: int) -> Column:
    return F.floor(ts / F.lit(float(bucket))).cast("long")


def _bucket_cover(t0, t1, bucket: int, max_buckets: int) -> Column:
    b0, b1 = _bucket(t0, bucket), _bucket(t1, bucket)
    guard = F.assert_true(
        b1 - b0 + 1 <= max_buckets,
        F.lit(
            f"interval spans more than max_buckets={max_buckets} buckets "
            f"of {bucket}s — raise bucket or split long intervals"
        ),
    )
    return F.when(guard.isNull(), F.sequence(b0, b1))


def interval_overlap_join(
    iv_a: DataFrame,
    iv_b: DataFrame,
    bucket: int = 3600,
    max_buckets: int = 64,
) -> DataFrame:
    """``iv_a``/``iv_b``: (iv_id, t0, t1) with t0 < t1 (epoch seconds,
    double).  Returns one row per strictly-overlapping pair:
    (a_id, b_id, o0, o1, overlap) — the intersection interval and its
    length.  Same reference-bucket dedup as the 2-D case: the joined
    row survives only in the bucket containing max(a.t0, b.t0), so no
    distinct() shuffle.
    """
    a = iv_a.select(
        F.col("iv_id").alias("a_id"),
        F.col("t0").alias("at0"), F.col("t1").alias("at1"),
    ).withColumn(
        "_bk", F.explode(_bucket_cover(F.col("at0"), F.col("at1"), bucket, max_buckets))
    )
    b = iv_b.select(
        F.col("iv_id").alias("b_id"),
        F.col("t0").alias("bt0"), F.col("t1").alias("bt1"),
    ).withColumn(
        "_bk", F.explode(_bucket_cover(F.col("bt0"), F.col("bt1"), bucket, max_buckets))
    )
    o0 = F.greatest(F.col("at0"), F.col("bt0"))
    o1 = F.least(F.col("at1"), F.col("bt1"))
    return (
        a.join(b, on="_bk", how="inner")
        .where((F.col("at0") < F.col("bt1")) & (F.col("bt0") < F.col("at1")))
        .where(F.col("_bk") == _bucket(o0, bucket))
        .select(
            "a_id", "b_id",
            o0.alias("o0"), o1.alias("o1"), (o1 - o0).alias("overlap"),
        )
    )
