"""Streaming geofence transitions: ENTER/EXIT/MOVE semantics, late-fix
suppression, and checkpointed state across micro-batches + restart."""
from __future__ import annotations

import os

import pytest
from pyspark.sql import Row


def _ring(w, s, e, n):
    return [
        {"lon": w, "lat": s},
        {"lon": e, "lat": s},
        {"lon": e, "lat": n},
        {"lon": w, "lat": n},
        {"lon": w, "lat": s},
    ]


@pytest.fixture(scope="module")
def zones(spark):
    return spark.createDataFrame(
        [("zoneA", _ring(-10.0, -5.0, 0.0, 5.0)), ("zoneB", _ring(0.0, -5.0, 10.0, 5.0))],
        "poly_id string, ring array<struct<lon:double,lat:double>>",
    )


def _fix(e, ts, lon, lat):
    return Row(entity_id=e, ts=ts, lon=lon, lat=lat)


def test_transitions_batched_with_restart(spark, zones, tmp_path):
    from proj_spark.streaming.geofence import geofence_transitions

    src = str(tmp_path / "fixes")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt_geo")
    # batch 1: e1 approaches and enters zoneA, then crosses to zoneB;
    # e2 stays outside
    b1 = [
        _fix("e1", 1, -20.0, 0.0),
        _fix("e1", 2, -5.0, 0.0),   # ENTER zoneA
        _fix("e1", 3, -4.0, 1.0),   # still zoneA, no event
        _fix("e1", 4, 5.0, 0.0),    # MOVE zoneA->zoneB
        _fix("e2", 1, 50.0, 50.0),
    ]
    spark.createDataFrame(b1).coalesce(1).write.parquet(src + "/b1")

    out_dir = str(tmp_path / "events_out")

    def run():
        # file sink (not memory): the restart leg must RECOVER from the
        # checkpoint, which the memory sink does not support
        stream = (
            spark.readStream.schema(
                "entity_id string, ts long, lon double, lat double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/b*")
        )
        q = (
            geofence_transitions(stream, zones)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    run()
    rows = {
        (r.entity_id, r.ts): (r.from_zone, r.to_zone, r.kind, r.n_late)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert rows == {
        ("e1", 2): ("OUTSIDE", "zoneA", "ENTER", 0),
        ("e1", 4): ("zoneA", "zoneB", "MOVE", 0),
    }

    # batch 2 (restart from the checkpoint): e1 exits; a LATE fix
    # (ts=3, would re-enter zoneA) must be dropped and counted; e2
    # enters zoneB — its state survived the restart
    b2 = [
        _fix("e1", 5, 50.0, 50.0),  # EXIT zoneB
        _fix("e1", 3, -4.0, 1.0),   # late: ts <= last_ts, dropped
        _fix("e2", 2, 5.0, 0.0),    # ENTER zoneB
    ]
    spark.createDataFrame(b2).coalesce(1).write.parquet(src + "/b2")
    run()
    prior = set(rows)
    rows2 = {
        (r.entity_id, r.ts): (r.from_zone, r.to_zone, r.kind, r.n_late)
        for r in spark.read.parquet(out_dir).collect()
        if (r.entity_id, r.ts) not in prior
    }
    # the late ts=3 fix sorts BEFORE ts=5 inside the batch, so it is
    # counted on the EXIT event it precedes (n_late=1)
    assert rows2 == {
        ("e1", 5): ("zoneB", "OUTSIDE", "EXIT", 1),
        ("e2", 2): ("OUTSIDE", "zoneB", "ENTER", 0),
    }


def test_batch_mode_same_update_logic(spark, zones):
    """The same operator runs in plain batch mode (applyInPandasWithState
    requires a stream, so drive _update directly through the zone join
    + a pandas replay) — pins the pure transition semantics."""
    import pandas as pd

    from proj_spark.streaming.geofence import OUTSIDE, _update

    class _St:
        exists = False

        def update(self, v):
            self.exists, self.get = True, v

    st = _St()
    pdf = pd.DataFrame(
        {"entity_id": ["x"] * 4, "ts": [4, 1, 2, 3],
         "zone": ["zoneB", OUTSIDE, "zoneA", "zoneA"]}
    )
    out = list(_update(("x",), iter([pdf]), st))
    ev = out[0][["ts", "from_zone", "to_zone", "kind"]].values.tolist()
    # sorted by ts despite shuffled input rows
    assert ev == [
        [2, OUTSIDE, "zoneA", "ENTER"],
        [4, "zoneA", "zoneB", "MOVE"],
    ]
    assert st.get == (4, "zoneB", 0)
