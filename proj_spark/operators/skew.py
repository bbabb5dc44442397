"""Hot-key skew handling: salting + two-phase aggregation.

The north rule calls for explicit salted-broadcast handling of
hot-cell skew (one urban cell can hold 10^8 of 10^12 images).  Two
tools:

- :func:`salted_agg` — generic two-phase aggregation: partial
  aggregate on (key, salt), final aggregate on key.  For algebraic
  aggregates Spark's map-side combine already does this; use salted_agg
  when the aggregate is holistic (collect_list, percentile) or when a
  single reducer key would otherwise exceed a task.
- :func:`salted_broadcast_join` — replicate the (small) build side
  S ways and salt the probe side, so one hot key spreads across S
  tasks.  With a true broadcast join Spark never partitions by the
  key at all, so this variant matters when the small side is too big
  to broadcast and a shuffle join is forced.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(n_salts: int, *cols: str) -> Column:
    """Deterministic salt in [0, n_salts): hash of the row's own key
    columns (never rand() — resume/retry must reproduce partitions,
    per the checkpoint-resumable requirement)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 32,
    salt_by: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation.

    ``aggs`` maps output name -> (partial_agg_expr, final_agg_expr)
    where partial runs per (keys + salt) and final re-aggregates the
    partials per keys, e.g. ``{"n": (F.count(F.lit(1)), F.sum("n"))}``.

    ``salt_by`` must vary WITHIN a key group (a row id, or by default
    the whole row): a salt derived from the grouping keys alone would
    be constant per key and spread nothing.
    """
    salt_src = salt_by or [c for c in df.columns]
    if salt_by is None and set(df.columns) == set(keys):
        raise ValueError(
            "salted_agg: every column is a grouping key, so no salt source "
            "varies within a key group; pass salt_by (e.g. a row id)"
        )
    salted = df.withColumn("_salt", salt_column(n_salts, *salt_src))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    final = partial.groupBy(*keys).agg(
        *[fin.alias(name) for name, (_, fin) in aggs.items()]
    )
    return final


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side by its own row hash
    (all columns — a salt derived from the join key alone would be
    constant for the hot key and spread nothing), replicate the small
    side across all salt values (explode), join on (key, salt).  Use
    when the optimizer falls back to sort-merge and one key dominates;
    otherwise prefer plain broadcast()."""
    big_s = big.withColumn("_salt", salt_column(n_salts, *big.columns))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, on=[on, "_salt"], how=how)
    return out.drop("_salt")
