"""Deterministic dataset splitting + stratified sampling.

Training pipelines need splits that are (a) reproducible across
re-runs and engines — never rand(), which breaks checkpoint resume
and retry idempotency (the same rule as operators/skew.salt_column) —
and (b) stable under repartitioning.  Both operators key off the
dedup LCG hash of the row's own id (pure BIGINT math, so the DuckDB
oracle reproduces the exact assignment).

- :func:`hash_split` — named fractions over the hash ring: every row
  gets a split label; a row's label never changes as the corpus grows
  (membership depends only on its own id).
- :func:`stratified_sample` — per-stratum deterministic sample:
  rank rows within each stratum by hash and keep the first
  ceil(frac * |stratum|).  Exact per-stratum proportions (unlike
  Bernoulli sampling) at the cost of one windowed shuffle per call —
  use hash_split's thresholding when approximate proportions are
  fine and a shuffle is not.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import MINHASH_A, MINHASH_B, MINHASH_P


def _ring_hash(id_col: str, hash_idx: int = 0):
    """LCG hash of an integer id into [0, P) — non-negative via double
    pmod (Spark % keeps the dividend sign)."""
    a, b = MINHASH_A[hash_idx % 8], MINHASH_B[hash_idx % 8]
    x = F.pmod(F.col(id_col).cast("long"), F.lit(MINHASH_P))
    return F.pmod(F.lit(a) * x + F.lit(b), F.lit(MINHASH_P))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    out_col: str = "split",
    hash_idx: int = 0,
) -> DataFrame:
    """Assign every row a split label by its id's position on the
    hash ring.  ``weights`` values must sum to <= 1.0 (any remainder
    falls into the LAST label).  Pure narrow expression — no shuffle,
    no state, resumable by construction."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if any(w <= 0 for w in weights.values()):
        raise ValueError(
            f"split weights must all be positive, got {weights} — a "
            "non-positive weight makes its label unreachable via "
            "non-monotonic ring cuts"
        )
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split weights sum to {total} > 1")
    h = _ring_hash(id_col, hash_idx)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cut = F.lit(int(acc * MINHASH_P))
        expr = (
            F.when(h < cut, F.lit(name))
            if expr is None
            else expr.when(h < cut, F.lit(name))
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    keys: list[str],
    frac: float,
    id_col: str = "doc_id",
    hash_idx: int = 0,
) -> DataFrame:
    """Keep the deterministically-first ceil(frac * |stratum|) rows of
    each stratum, ordered by (hash, id) — exact per-stratum
    proportions, identical output under any partitioning."""
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac {frac} outside (0, 1]")
    h = _ring_hash(id_col, hash_idx)
    w = Window.partitionBy(*keys).orderBy(h.asc(), F.col(id_col).asc())
    cw = Window.partitionBy(*keys)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_cnt", F.count(F.lit(1)).over(cw))
        .where(F.col("_rn") <= F.ceil(F.col("_cnt") * F.lit(float(frac))))
        .drop("_rn", "_cnt")
    )
