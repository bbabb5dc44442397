"""Structured Streaming surface of the engine.

The reference CLIs are stateless line-at-a-time streams
(src/proj.c:59-151); the Spark-native analog is a Structured
Streaming pipeline: readStream -> coordinate transform / tile
assignment (the same narrow expressions and pandas UDFs as batch —
they are stream-safe because they are stateless per row) -> windowed
stateful aggregation with a watermark for late events.

Scale notes: the per-tile counts use standard streaming state-store
aggregation; the state key space is bounded by the tile universe at
the chosen zoom (4^z tiles), not by input volume, so state stays
small even at 10^12 events/day.  Hot tiles skew state updates, not
partitions (state is hash-partitioned by group key) — AQE does not
apply to streams, so the shuffle partition count set at session build
is the knob that matters.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import expressions as E


def stream_tile_counts(
    events: DataFrame,
    zoom: int,
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming per-tile event counts in tumbling windows.

    ``events`` must be a streaming DataFrame with an event-time
    column; late rows beyond ``watermark`` are dropped (state can then
    be evicted — unbounded state would OOM a long-running job).
    """
    tiled = events.withColumn("tile_x", E.tile_x(lon, zoom)).withColumn(
        "tile_y", E.tile_y(lat, zoom)
    )
    return (
        tiled.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window), "tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "tile_x",
            "tile_y",
            "n",
        )
    )


def stream_reproject(
    points: DataFrame,
    src: str,
    dst: str,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Stateless streaming reprojection — the cs2cs filter as a
    stream.  The fused-plan pandas UDF is stateless, so it runs
    unchanged under Structured Streaming."""
    from ..functions.transform import transform

    return transform(points, src, dst, lon, lat)
