"""Per-group convex hull and farthest-pair (diameter) via hull reduction.

The farthest-pair query (cluster spread, geofence sizing, bbox-of-mass
diagnostics) is O(n^2) brute force; the scalable decomposition is the
classic two-stage hull reduction:

1. **partial hulls**: each (group, salt) slice reduces its points to
   its convex hull (Andrew monotone chain, vectorized numpy inside an
   ``applyInPandas``) — hull size is O(n^(1/3)) expected for random
   points, so the second stage sees a tiny fraction of the data;
2. **merge + scan**: per group, the hull of the partial-hull points,
   then a vectorized all-pairs scan over the hull vertices only (the
   calipers reduction: every farthest pair has both endpoints on the
   hull); the diameter pair is the max by (d2, then smallest ids).

The salt bounds stage-1 group size
(shuffle carries only partial hulls); stage 2 is one shuffle on the
group key.  d2 is the token-identical squared-euclidean double tree
``(ax-bx)*(ax-bx)+(ay-by)*(ay-by)`` in numpy and SQL, so the all-pairs
DuckDB oracle reproduces the value bit-for-bit.

Duplicate coordinates keep the MIN id inside each hull stage, matching
the (d2, a_id, b_id) tie-break the oracle applies.  Tie-break caveat
(found by the hypothesis property suite): the returned pair ALWAYS
achieves the exact maximum d2, and the id tie-break is exact among
hull-vertex pairs — but if an INTERIOR point ties the maximum exactly
(possible only through float rounding, e.g. collinear points within
one ulp of an endpoint), the all-pairs tie-break could name that
interior point instead.  The registry fixture has no such coincident
ties (driver-green); callers needing interior-tie resolution must pay
for the all-pairs scan.

No reference counterpart: rouault/PROJ carries geodesic polygon area
(geodesic.c:1920) but no hull/diameter; this is the planar analytics
sibling of polygon_metrics.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _monotone_chain(xs: np.ndarray, ys: np.ndarray, ids: np.ndarray):
    """Strict convex hull (collinear midpoints dropped).  Returns the
    (x, y, id) arrays of hull vertices in ccw order.  For duplicate
    coordinates the smallest id survives."""
    order = np.lexsort((ids, ys, xs))
    xs, ys, ids = xs[order], ys[order], ids[order]
    keep = np.ones(len(xs), dtype=bool)
    keep[1:] = (np.diff(xs) != 0) | (np.diff(ys) != 0)
    xs, ys, ids = xs[keep], ys[keep], ids[keep]
    n = len(xs)
    if n <= 2:
        return xs, ys, ids

    def half(idx):
        out = []
        for i in idx:
            while len(out) >= 2:
                j, k = out[-2], out[-1]
                cross = (xs[k] - xs[j]) * (ys[i] - ys[j]) - (ys[k] - ys[j]) * (xs[i] - xs[j])
                if cross <= 0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    lower = half(range(n))
    upper = half(range(n - 1, -1, -1))
    idx = np.array(lower[:-1] + upper[:-1], dtype=np.int64)
    return xs[idx], ys[idx], ids[idx]


def _hull_farthest(xs: np.ndarray, ys: np.ndarray, ids: np.ndarray):
    """Max-(d2, then smallest a_id, b_id) pair over the hull vertices.

    Every farthest pair has both endpoints on the convex hull, so the
    all-pairs scan runs on h vertices, not n points (h is O(n^(1/3))
    expected) — vectorized, and free of the float tie subtleties of
    antipodal-advance calipers.  d2 uses the same scalar expression
    tree as the SQL oracle: (ax-bx)*(ax-bx)+(ay-by)*(ay-by)."""
    m = len(xs)
    if m == 1:
        return int(ids[0]), int(ids[0]), 0.0
    dx = xs[:, None] - xs[None, :]
    dy = ys[:, None] - ys[None, :]
    d2 = dx * dx + dy * dy
    best_d2 = float(d2.max())
    ii, jj = np.nonzero(d2 == best_d2)
    lo = np.minimum(ids[ii], ids[jj])
    hi = np.maximum(ids[ii], ids[jj])
    order = np.lexsort((hi, lo))
    return int(lo[order[0]]), int(hi[order[0]]), best_d2


_HULL_SCHEMA = "group_id long, x double, y double, id long"


def _partial_hull(pdf: pd.DataFrame) -> pd.DataFrame:
    xs, ys, ids = _monotone_chain(
        pdf["x"].to_numpy(np.float64),
        pdf["y"].to_numpy(np.float64),
        pdf["id"].to_numpy(np.int64),
    )
    return pd.DataFrame(
        {"group_id": pdf["group_id"].iloc[0], "x": xs, "y": ys, "id": ids}
    )


def group_diameter(
    df: DataFrame,
    group: str = "group_id",
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
    salt_parts: int = 8,
) -> DataFrame:
    """(group_id, a_id, b_id, d2): the farthest pair per group under
    squared euclidean distance, ties broken toward the smallest
    (a_id, b_id).  Two-stage: salted partial hulls, then merge + the
    hull-restricted pair scan per group."""
    pts = df.select(
        F.col(group).cast("long").alias("group_id"),
        F.col(id_col).cast("long").alias("id"),
        F.col(x).cast("double").alias("x"),
        F.col(y).cast("double").alias("y"),
    )
    salted = pts.withColumn("_salt", F.pmod(F.col("id"), F.lit(salt_parts)))
    partial = salted.groupBy("group_id", "_salt").applyInPandas(
        lambda pdf: _partial_hull(pdf.drop(columns=["_salt"])), _HULL_SCHEMA
    )

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        xs, ys, ids = _monotone_chain(
            pdf["x"].to_numpy(np.float64),
            pdf["y"].to_numpy(np.float64),
            pdf["id"].to_numpy(np.int64),
        )
        a, b, d2 = _hull_farthest(xs, ys, ids)
        return pd.DataFrame(
            {"group_id": [pdf["group_id"].iloc[0]], "a_id": [a], "b_id": [b], "d2": [d2]}
        )

    return partial.groupBy("group_id").applyInPandas(
        final, "group_id long, a_id long, b_id long, d2 double"
    )


def group_hull(
    df: DataFrame,
    group: str = "group_id",
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
    salt_parts: int = 8,
) -> DataFrame:
    """(group_id, seq, id, x, y): the convex hull of each group's
    points in ccw order starting from the lexicographic minimum vertex.
    Same two-stage reduction as :func:`group_diameter`."""
    pts = df.select(
        F.col(group).cast("long").alias("group_id"),
        F.col(id_col).cast("long").alias("id"),
        F.col(x).cast("double").alias("x"),
        F.col(y).cast("double").alias("y"),
    )
    salted = pts.withColumn("_salt", F.pmod(F.col("id"), F.lit(salt_parts)))
    partial = salted.groupBy("group_id", "_salt").applyInPandas(
        lambda pdf: _partial_hull(pdf.drop(columns=["_salt"])), _HULL_SCHEMA
    )

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        xs, ys, ids = _monotone_chain(
            pdf["x"].to_numpy(np.float64),
            pdf["y"].to_numpy(np.float64),
            pdf["id"].to_numpy(np.int64),
        )
        # rotate so the hull starts at the lexicographic-min vertex
        start = int(np.lexsort((ys, xs))[0]) if len(xs) else 0
        idx = np.roll(np.arange(len(xs)), -start)
        return pd.DataFrame(
            {
                "group_id": pdf["group_id"].iloc[0],
                "seq": np.arange(len(xs), dtype=np.int64),
                "id": ids[idx],
                "x": xs[idx],
                "y": ys[idx],
            }
        )

    return partial.groupBy("group_id").applyInPandas(
        final, "group_id long, seq long, id long, x double, y double"
    )
