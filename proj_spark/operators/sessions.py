"""Event sessionization: gap-based sessions per user.

The events-table operator every analytics stack needs: group a user's
events into sessions separated by >= ``gap`` of inactivity, emit one
row per session (bounds, event count, value sum).

Batch implementation is the classic gaps-and-islands: lag over
(user, ts) marks session starts, a running sum of start flags numbers
the sessions, then one aggregate — two window passes + one aggregate,
all partitioned by user_id (uniform key, map-side combinable
aggregate).  Exactly reproducible in ANSI SQL, which is what the
DuckDB oracle runs.

Streaming: Spark's native session_window handles the same semantics
incrementally with watermark-based state eviction —
``stream_sessionize`` wires it for a streaming frame.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_s: int = 1800,
    user: str = "user_id",
    ts: str = "ts",
    value: str | None = "value",
) -> DataFrame:
    """One row per (user, session): session_id (1-based per user),
    started/ended timestamps, n_events, sum of ``value`` (omitted when
    value=None).

    Ordering note: events are ordered by ``ts`` alone; two events of
    one user sharing an exact timestamp have ambiguous relative order
    — harmless for session MEMBERSHIP (a zero gap never starts a
    session) and for the per-session aggregates (min/max/count/sum are
    order-invariant), so results stay deterministic even with ties."""
    w = Window.partitionBy(user).orderBy(F.col(ts).asc())
    prev = F.lag(F.col(ts)).over(w)
    # cast via timestamp: TIMESTAMP_NTZ -> double is disallowed, and
    # the session timezone is pinned UTC so ntz->tz is the identity
    def _epoch(c):
        return c.cast("timestamp").cast("double")

    is_start = F.when(
        prev.isNull() | (_epoch(F.col(ts)) - _epoch(prev) >= float(gap_s)),
        1,
    ).otherwise(0)
    marked = df.withColumn("_st", is_start).withColumn(
        "session_id", F.sum("_st").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    aggs = [
        F.min(ts).alias("started"),
        F.max(ts).alias("ended"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value is not None:
        aggs.append(F.sum(value).alias("sum_value"))
    return marked.groupBy(user, "session_id").agg(*aggs)


def stream_sessionize(
    df: DataFrame,
    gap_s: int = 1800,
    user: str = "user_id",
    ts: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming variant via the native session_window: incremental
    session assembly with watermark-bounded state (late events beyond
    ``watermark`` are dropped; closed sessions emit on watermark
    advance in append mode)."""
    return (
        df.withWatermark(ts, watermark)
        .groupBy(F.col(user), F.session_window(F.col(ts), f"{gap_s} seconds"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user,
            F.col("session_window.start").alias("started"),
            F.col("session_window.end").alias("ended"),
            "n_events",
        )
    )
