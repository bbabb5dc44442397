"""Distinct-count sketching: KMV (k-minimum-values).

The training-data pipeline needs cheap cardinality answers per group
(distinct users per event type, distinct tokens per shard, distinct
near-dup signatures) without a full distinct shuffle.  Spark ships
HLL++ (approx_count_distinct), but its binary sketch is not
reproducible across engines; KMV (Bar-Yossef et al., "Counting
distinct elements in a data stream", RANDOM 2002) with an explicit
integer hash is: keep the k smallest hash values; if fewer than k
distinct hashes exist the count is exact, else estimate
(k-1) * P / h_(k) where h_(k) is the k-th minimum over the hash
space [0, P).

The hash is the dedup family's LCG (a*x + b mod p, operators/dedup.py
MINHASH_*) — pure BIGINT math, so the DuckDB oracle recomputes the
IDENTICAL sketch and estimate, bit for bit.  Error ~ 1/sqrt(k)
(k=256 -> ~6%).

Scale shape: the dedup of (group, hash) and the per-group k-smallest
are one shuffle on the group key each (the window's partitionBy); the
sketch state per group is k longs — 10^12 rows reduce to
|groups| * k before any driver involvement.  For the merge-combine
form (union of shards = k smallest of the union) the same function
applies to pre-sketched shards.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import MINHASH_A, MINHASH_B, MINHASH_P


def kmv_distinct(
    df: DataFrame,
    keys: list[str],
    value: str,
    k: int = 256,
    hash_idx: int = 0,
) -> DataFrame:
    """Per-``keys`` distinct-count estimate of integer column
    ``value`` via a k-minimum-values sketch.

    Output: keys + ``n_sketch`` (distinct hashes retained, <= k),
    ``kth_min`` (null when exact), ``est_distinct`` (exact when the
    group has < k distinct values — the estimator degrades to
    identity — else (k-1)*P/kth_min rounded down).
    """
    a, b = MINHASH_A[hash_idx % 8], MINHASH_B[hash_idx % 8]
    # pmod twice: first to fold arbitrary (negative / full-64-bit)
    # values into [0, P) so a*x cannot overflow (a < 2^31, x < 2^31
    # -> product < 2^62), then to keep the hash itself non-negative —
    # Spark's % keeps the dividend's sign, and a negative kth_min
    # would make the (k-1)*P/h_k estimate garbage
    x = F.pmod(F.col(value).cast("long"), F.lit(MINHASH_P))
    h = F.pmod(F.lit(a) * x + F.lit(b), F.lit(MINHASH_P))
    hashed = df.select(*keys, h.alias("_h")).distinct()
    w = Window.partitionBy(*keys).orderBy(F.col("_h").asc())
    top = hashed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    agg = top.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_sketch"), F.max("_h").alias("_maxh")
    )
    exact = F.col("n_sketch") < k
    est = F.when(exact, F.col("n_sketch").cast("double")).otherwise(
        (k - 1.0) * float(MINHASH_P) / F.col("_maxh")
    )
    return agg.select(
        *keys,
        F.col("n_sketch").cast("long").alias("n_sketch"),
        F.when(~exact, F.col("_maxh")).alias("kth_min"),
        F.floor(est).cast("long").alias("est_distinct"),
    )
