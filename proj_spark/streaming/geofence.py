"""Streaming geofence: per-entity zone ENTER / EXIT / MOVE events.

The operational streaming twin of the batch point-in-polygon join: a
stream of position fixes (entity_id, ts, lon, lat) is zone-tagged by
the broadcast AOI cover (stream-static join — the streaming side never
shuffles for it), then a stateful per-entity pass turns consecutive
zone changes into transition events.  This is the alerting shape
("asset entered restricted area") that a tile/PIP batch engine cannot
express without state.

Semantics (all deterministic):
- zone = first-match containing polygon (``spatial_join.
  point_in_polygon_join`` how='left_first'), misses map to
  ``OUTSIDE``;
- within a micro-batch, fixes sort by (ts, zone); across batches the
  state carries (last_ts, last_zone);
- a fix with ts <= last_ts is LATE and is dropped (counted in the
  ``n_late`` column of the next emitted event) — state only moves
  forward, so replays/duplicates cannot emit phantom transitions;
- kind: ENTER (OUTSIDE->zone), EXIT (zone->OUTSIDE), MOVE
  (zone->zone').

State is one (long, string) pair per live entity — bounded by the
entity universe, evictable by the caller via an idle timeout variant
if entity churn is unbounded.
"""
from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.spatial_join import point_in_polygon_join

OUTSIDE = "OUTSIDE"

_OUT_SCHEMA = (
    "entity_id STRING, ts LONG, from_zone STRING, to_zone STRING, "
    "kind STRING, n_late LONG"
)
_STATE_SCHEMA = "last_ts LONG, last_zone STRING, n_late LONG"


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "zone"], kind="mergesort")
    if state.exists:
        last_ts, last_zone, n_late = state.get
    else:
        last_ts, last_zone, n_late = -(1 << 62), OUTSIDE, 0
    out = []
    for ts, zone in zip(rows["ts"], rows["zone"]):
        ts = int(ts)
        if ts <= last_ts:
            n_late += 1
            continue
        if zone != last_zone:
            kind = (
                "ENTER"
                if last_zone == OUTSIDE
                else ("EXIT" if zone == OUTSIDE else "MOVE")
            )
            out.append((key[0], ts, last_zone, zone, kind, n_late))
            n_late = 0
            last_zone = zone
        last_ts = ts
    state.update((last_ts, last_zone, n_late))
    if out:
        yield pd.DataFrame(
            out,
            columns=["entity_id", "ts", "from_zone", "to_zone", "kind", "n_late"],
        )


def geofence_transitions(
    points: DataFrame,
    polys: DataFrame,
    res: int = 6,
    entity: str = "entity_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Streaming (or batch) transitions for ``points``
    (entity_id string, ts long, lon, lat) against static ``polys``
    (poly_id, ring).  Returns (entity_id, ts, from_zone, to_zone,
    kind, n_late)."""
    pts = points.select(
        F.col(entity).alias("entity_id"),
        F.col(ts).cast("long").alias("ts"),
        F.col(lon).alias("lon"),
        F.col(lat).alias("lat"),
    ).withColumn(
        "point_id", F.concat_ws("@", F.col("entity_id"), F.col("ts"))
    )
    zoned = point_in_polygon_join(
        pts, polys, res=res, how="left_first"
    ).select(
        "entity_id",
        "ts",
        F.coalesce(F.col("poly_id"), F.lit(OUTSIDE)).alias("zone"),
    )
    return zoned.groupBy("entity_id").applyInPandasWithState(
        _update,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
