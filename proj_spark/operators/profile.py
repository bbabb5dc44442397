"""Table profiling: per-column QC stats in ONE aggregation pass.

Ingest QC for the 10^12-row pipeline: before any expensive stage,
profile the batch — null fractions catch schema drift, min/max catch
unit regressions (a lat column spanning ±3.2e6 is in the wrong unit),
distinct counts catch key collapse.  All columns are profiled in one
wide aggregate over a single scan, then the single result row
unpivots driver-side to one row per column.

Cost caveat: with ``exact_distinct=True`` Spark plans the K
countDistinct aggregates via an Expand that replicates each input row
K+1 times before the partial aggregate — fine for oracle checks and
small batches, NOT the 10^12-row shape.  At full scale use
``exact_distinct=False`` (HLL++ approx_count_distinct), which keeps
the pass truly single-width: one scan, one partial-agg exchange.  (For an engine-portable
estimate over integer keys use operators/sketch.kmv_distinct.)
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One output row per column: (column, dtype, n_rows, n_nulls,
    n_distinct, min_str, max_str).  min/max are rendered as strings so
    heterogeneous columns share one schema."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        nd = (
            F.countDistinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(F.col(c))
        )
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"_null_{c}"),
            nd.alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    # the aggregate result is ONE wide row — collect it and unpivot
    # driver-side (a union of per-column selects over the agg would
    # re-execute the scan once per column)
    r = df.agg(*aggs).first()
    data = [
        (
            c,
            dtypes[c],
            int(r["_n"]),
            int(r[f"_null_{c}"]),
            int(r[f"_nd_{c}"]),
            r[f"_min_{c}"],
            r[f"_max_{c}"],
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        data,
        "column string, dtype string, n_rows long, n_nulls long, "
        "n_distinct long, min_str string, max_str string",
    )
