"""Generic as-of join (point-in-time lookup).

"For each left row, the most recent right row of the same key at or
before its timestamp" — the temporal join behind sensor alignment,
ephemeris/attitude lookup for imagery, price snapshots, and the
reference's dated-grid-catalog selection (src/pj_gridcatalog.c:99,
generalized from grids to arbitrary tables).  Spark has no native
ASOF JOIN; the standard exact formulation used here is UNION + ordered
window:

    union the two sides with a side tag, window by key ordered by
    (ts, side, right-row tie-break), and carry the last non-null right
    payload forward — each left row then reads the right row that
    preceded it.

Cost: ONE shuffle of |L| + |R| rows (the window partition), no
replication, no range explosion — the plan a 10^12-row table needs.
Skew note: a hot key serializes inside its window partition; shard hot
keys by a time-bucket salt and stitch (the catalog_asof operator shows
the two-level variant).

Determinism: ties on ts resolve right-before-left (a right row AT the
left's timestamp is visible), and equal-ts right rows resolve to the
LARGEST tie-break id (documented total order; DuckDB's native ASOF
JOIN picks by max ts only, so the oracle fixture keeps (key, ts)
unique on the right — the operator itself needs no such assumption).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str] | None = None,
    tolerance: float | None = None,
) -> DataFrame:
    """Left rows + the latest right row per key with right.ts <=
    left.ts.  ``right_cols``: right payload columns to carry (default:
    all non-key/ts).  ``tolerance``: optional max age in seconds — an
    older match becomes NULL (the miss-passthrough rule).  Output =
    left columns + ``asof_ts`` + the right payload (NULL on no match).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, ts)]
    lcols = left.columns

    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        F.struct(
            F.col(ts).alias("asof_ts"), *[F.col(c) for c in right_cols]
        ).alias("_r"),
    )
    l_tag = l_tag.withColumn("_r", F.lit(None).cast(r_tag.schema["_r"].dataType))

    u = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at equal ts (visible at ts);
    # equal-ts right rows resolve by the struct's natural order (last
    # = max payload struct) — a total order, partitioning-invariant
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "_m",
            F.when(
                F.col("_m").isNotNull()
                & (
                    F.col("_t").cast("double") - F.col("_m.asof_ts").cast("double")
                    <= F.lit(float(tolerance))
                ),
                F.col("_m"),
            ),
        )
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        F.col("_m.asof_ts").alias("asof_ts"),
        *[F.col(f"_m.{c}").alias(c) for c in right_cols],
    )
