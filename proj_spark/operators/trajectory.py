"""Trajectory statistics: per-entity movement aggregates over
timestamped point sequences.

Given (entity, ts, lon, lat) rows — GPS fixes, photo EXIF positions,
event pings — order each entity's points in time, measure the
consecutive-step great-circle distances, and aggregate per entity:
point count, step count, total path length, longest single step, and
the net first->last displacement.  The spatial metric is the shared
haversine expression (functions/expressions.haversine_m), the same
fast-path metric the kNN and range joins rank with; the Karney
geodesic (kernels/karney.py, ref src/geodesic.c:944) remains the
refinement oracle where ellipsoidal accuracy matters.

Scale shape: everything is whole-stage-codegen window + aggregate
expressions — ONE shuffle, hash-partitioned by the entity key; the
final groupBy reuses the window's partitioning so Catalyst plans no
second exchange.  Each step distance is floored to an integer
(decimeters) BEFORE the sum, so the per-entity totals are exact longs
and partition/merge-order invariant.  A pathologically hot entity
serializes its own window scan (order-dependent work cannot be
salted); at 100 TB bound per-entity cardinality upstream — e.g. split
trajectories by day or by session (operators/sessions.py) — rather
than salting here.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from proj_spark.functions import expressions as E


def trajectory_stats(
    df: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tie: str | None = None,
) -> DataFrame:
    """-> (user, n_points, n_steps, path_dm, max_step_dm, net_dm).

    ``path_dm`` is the sum of per-step ``floor(haversine_m * 10)``
    (decimeters — floored per step, so the sum is exact); ``net_dm``
    the floored first->last displacement; ``max_step_dm`` is -1 for
    single-point entities.  ``tie`` (strongly recommended) breaks
    equal timestamps into a total order — without it, ties make the
    step sequence nondeterministic under retries.
    """
    order = [F.col(ts).asc()] + ([F.col(tie).asc()] if tie else [])
    w = Window.partitionBy(user).orderBy(*order)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    plon, plat = F.lag(lon).over(w), F.lag(lat).over(w)
    # explicit NULL guard: haversine_m clamps with least(h, 1.0), and
    # least() SKIPS nulls (Spark and DuckDB alike), so a NULL lag would
    # otherwise yield the antipodal max distance instead of NULL
    step = F.when(
        plon.isNotNull(), E.haversine_m(plon, plat, F.col(lon), F.col(lat))
    )
    # keep the ORIGINAL key attribute through window + aggregate and
    # alias it only in the final projection: an early alias gets pushed
    # below the window's exchange, de-correlating the aggregate key
    # from the exchange's partitioning and costing a second shuffle
    stepped = df.select(
        F.col(user),
        F.floor(step * 10.0).cast("long").alias("_step_dm"),  # null on row 1
        F.first(lon).over(wf).alias("_flon"),
        F.first(lat).over(wf).alias("_flat"),
        F.last(lon).over(wf).alias("_llon"),
        F.last(lat).over(wf).alias("_llat"),
    )
    agg = stepped.groupBy(user).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.count("_step_dm").alias("n_steps"),
        F.coalesce(F.sum("_step_dm"), F.lit(0)).cast("long").alias("path_dm"),
        F.coalesce(F.max("_step_dm"), F.lit(-1)).cast("long").alias("max_step_dm"),
        F.min("_flon").alias("_flon"),
        F.min("_flat").alias("_flat"),
        F.min("_llon").alias("_llon"),
        F.min("_llat").alias("_llat"),
    )
    net = E.haversine_m("_flon", "_flat", "_llon", "_llat")
    return agg.select(
        F.col(user).alias("user"),
        "n_points",
        "n_steps",
        "path_dm",
        "max_step_dm",
        F.floor(net * 10.0).cast("long").alias("net_dm"),
    )


def cell_path(
    df: DataFrame,
    res: int = 7,
    user: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tie: str | None = None,
) -> DataFrame:
    """Run-length-compressed visited-cell sequence per entity — the
    map-matching-lite primitive: snap each fix to an equirectangular
    index cell (functions/expressions.cell_id) and collapse
    consecutive same-cell fixes into one visit row
    (user, seq, cell, entered_s, n_pings).

    Spatial gaps-and-islands: a window lag flags cell CHANGES, a
    running sum numbers the runs, and the run groupBy reuses the
    window's hash partitioning on ``user`` (clustering on a subset of
    the group keys), so the whole operator is ONE shuffle.  Every
    expression is whole-stage codegen; the DuckDB oracle replays the
    identical lag / running-sum / group SQL.

    Same hot-entity note as :func:`trajectory_stats`: bound per-entity
    cardinality upstream (split by day/session) rather than salting an
    order-dependent window.
    """
    order = [F.col(ts).asc()] + ([F.col(tie).asc()] if tie else [])
    w = Window.partitionBy(user).orderBy(*order)
    run = Window.partitionBy(user).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cell = E.cell_id(lon, lat, res)
    prev = F.lag(cell).over(w)
    chg = F.when(prev.isNull() | (prev != cell), 1).otherwise(0)
    runs = df.select(
        F.col(user),
        F.col(ts),
        cell.alias("_cell"),
        (F.sum(chg).over(run) - 1).alias("seq"),
    )
    return (
        runs.groupBy(user, "seq")
        .agg(
            F.min("_cell").alias("cell"),  # constant within a run
            F.min(ts).alias("_entered"),
            F.count(F.lit(1)).alias("n_pings"),
        )
        .select(
            F.col(user).alias("user"),
            F.col("seq").cast("long").alias("seq"),
            "cell",
            F.col("_entered").alias("entered"),
            F.col("n_pings").cast("long").alias("n_pings"),
        )
    )


def od_matrix(
    df: DataFrame,
    res: int = 6,
    period_us: int = 86_400_000_000,
    user: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tie: str | None = None,
) -> DataFrame:
    """Origin-destination flow matrix: per (entity, period) take the
    FIRST and LAST fix cell (equirect cell_id at ``res``), then count
    trips and distinct entities per (o_cell, d_cell) pair — the
    classic mobility rollup (where do morning photos move to by
    evening?).

    Scale shape: one window shuffle keyed by (entity, period) computes
    first/last via an unbounded frame; the trip rows (one per
    entity-period, far smaller than the ping table) then feed one
    pair-keyed aggregate with map-side partial combine.  Time is
    integer microseconds (unix_micros), so period binning is exact and
    the DuckDB oracle (epoch_us) replays it verbatim.
    """
    order = [F.col(ts).asc()] + ([F.col(tie).asc()] if tie else [])
    period = F.floor(
        F.unix_micros(F.col(ts).cast("timestamp")) / F.lit(float(period_us))
    ).cast("long")
    w = (
        Window.partitionBy("_u", "_period")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cell = E.cell_id(lon, lat, res)
    trips = (
        df.select(
            F.col(user).alias("_u"),
            period.alias("_period"),
            F.col(ts),
            *([F.col(tie)] if tie else []),
            cell.alias("_cell"),
        )
        .select(
            "_u",
            "_period",
            F.first("_cell").over(w).alias("o_cell"),
            F.last("_cell").over(w).alias("d_cell"),
        )
        .distinct()
    )
    return trips.groupBy("o_cell", "d_cell").agg(
        F.count(F.lit(1)).alias("n_trips"),
        F.countDistinct("_u").alias("n_users"),
    )


def stay_points(
    df: DataFrame,
    res: int = 7,
    min_dwell_s: int = 600,
    user: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tie: str | None = None,
) -> DataFrame:
    """Stay-point (dwell) detection: collapse each entity's fixes into
    same-cell runs (the :func:`cell_path` gaps-and-islands core), keep
    runs that LAST — last fix at least ``min_dwell_s`` seconds after
    the first — and emit per stay the dwell time plus an exact
    integer centroid fingerprint (sums of microdegree-floored lon/lat,
    so the mean position is recoverable as qlon_sum / n_pings without
    any cross-engine float drift in the stored columns).

    The home/work/POI-visit primitive of every mobility pipeline.
    Scale shape is cell_path's: ONE entity-keyed shuffle — the window
    lag, the running-sum run numbering, and the run groupBy all share
    the hash partitioning on ``user``; the dwell filter is a post-agg
    HAVING that drops transit runs (usually the vast majority) before
    anything else reads the output.  Time is integer seconds
    (floor(epoch)), positions integer microdegrees — all exact.
    """
    order = [F.col(ts).asc()] + ([F.col(tie).asc()] if tie else [])
    w = Window.partitionBy(user).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cell = E.cell_id(lon, lat, res)
    prev = F.lag(cell).over(w)
    chg = F.when(prev.isNull() | (prev != cell), 1).otherwise(0)
    epoch_s = F.floor(F.unix_micros(F.col(ts).cast("timestamp")) / F.lit(1000000.0)).cast("long")
    runs = df.select(
        F.col(user),
        epoch_s.alias("_es"),
        cell.alias("_cell"),
        (F.sum(chg).over(run) - 1).alias("seq"),
        F.floor(F.col(lon) * F.lit(1000000.0)).cast("long").alias("_qlon"),
        F.floor(F.col(lat) * F.lit(1000000.0)).cast("long").alias("_qlat"),
    )
    return (
        runs.groupBy(user, "seq")
        .agg(
            F.min("_cell").alias("cell"),  # constant within a run
            F.min("_es").alias("entered_s"),
            (F.max("_es") - F.min("_es")).alias("dwell_s"),
            F.count(F.lit(1)).alias("n_pings"),
            F.sum("_qlon").alias("qlon_sum"),
            F.sum("_qlat").alias("qlat_sum"),
        )
        .where(F.col("dwell_s") >= min_dwell_s)
        .select(
            F.col(user).alias("user"),
            F.col("seq").cast("long").alias("seq"),
            "cell",
            "entered_s",
            "dwell_s",
            F.col("n_pings").cast("long").alias("n_pings"),
            "qlon_sum",
            "qlat_sum",
        )
    )
