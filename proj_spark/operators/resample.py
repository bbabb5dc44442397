"""Trajectory resampling: gap-fill pings at a fixed epoch cadence.

Training pipelines over movement data (and sensor fusion generally)
want positions on a REGULAR clock, not at the device's ragged ping
times.  For every consecutive ping pair of an entity this emits the
linearly-interpolated position at each epoch boundary k*step inside
(t0, t1] — the standard resample-by-interpolation, as one declarative
plan.

Scale shape: ONE window shuffle keyed by entity gives each ping its
successor (lead), then the epoch fan is a per-row sequence() explode
CAPPED at ``max_steps`` boundaries per gap — a pathological month-long
gap cannot explode a partition; what it produces instead is a
documented truncation (the first max_steps boundaries after t0).  No
self-join, no driver loop; partial rows never shuffle again (the
output inherits the window's partitioning).

Determinism: time is integer MICROSECONDS end-to-end (unix_micros /
epoch_us — exact int64 in both engines, no float epoch drift); the
interpolation fraction and coordinates are pure IEEE arithmetic on
exactly-representable inputs (micros < 2^53), so the DuckDB oracle
replays bit-identically; outputs are floor-quantized at 1e-7 deg.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_CQ = 1e7  # coordinate quantum (~1 cm)


def resample_trajectories(
    pings: DataFrame,
    step_us: int,
    max_steps: int = 8,
    entity: str = "entity",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tie: str = "tie",
) -> DataFrame:
    """(entity, epoch_us, lon_q, lat_q): interpolated position at each
    epoch boundary k*step_us in (t0, t1] for consecutive pings, at
    most ``max_steps`` boundaries per gap.  Duplicate timestamps are
    ordered by ``tie``; a zero-length gap emits nothing."""
    w = Window.partitionBy(entity).orderBy(F.col(ts), F.col(tie))
    # parquet timestamps load as TIMESTAMP_NTZ; the cast re-tags them
    # as instants in the session tz (UTC), matching DuckDB's epoch_us
    e0 = F.unix_micros(F.col(ts).cast("timestamp"))
    p = pings.select(
        F.col(entity).alias("_ent"),
        e0.alias("_e0"),
        F.col(lon).alias("_lon0"),
        F.col(lat).alias("_lat0"),
        F.lead(e0).over(w).alias("_e1"),
        F.lead(lon).over(w).alias("_lon1"),
        F.lead(lat).over(w).alias("_lat1"),
    ).where(F.col("_e1") > F.col("_e0"))
    k0 = F.floor(F.col("_e0") / F.lit(float(step_us))) + 1
    k1 = F.least(
        F.floor(F.col("_e1") / F.lit(float(step_us))),
        k0 + (max_steps - 1),
    )
    ks = F.when(k0 <= k1, F.sequence(k0, k1)).otherwise(
        F.array().cast("array<long>")
    )
    fanned = p.select("*", F.explode(ks).alias("_k"))
    t_us = F.col("_k").cast("double") * float(step_us)
    frac = (t_us - F.col("_e0").cast("double")) / (
        F.col("_e1").cast("double") - F.col("_e0").cast("double")
    )
    ilon = F.col("_lon0") + frac * (F.col("_lon1") - F.col("_lon0"))
    ilat = F.col("_lat0") + frac * (F.col("_lat1") - F.col("_lat0"))
    return fanned.select(
        F.col("_ent").alias(entity),
        (F.col("_k") * step_us).cast("long").alias("epoch_us"),
        F.floor(ilon * _CQ).cast("long").alias("lon_q"),
        F.floor(ilat * _CQ).cast("long").alias("lat_q"),
    )
