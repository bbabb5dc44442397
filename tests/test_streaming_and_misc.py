"""Streaming tile counts (memory sink), DMS expressions, geodesic
waypoints, polygon metrics."""
from __future__ import annotations

import math
import os

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_stream_tile_counts_memory_sink(spark, tmp_path):
    from proj_spark.streaming.tiles import stream_tile_counts

    src_dir = str(tmp_path / "in")
    batch = spark.createDataFrame(
        [
            Row(ts="2026-01-01 00:00:05", lon=-118.0, lat=34.0),
            Row(ts="2026-01-01 00:00:20", lon=-118.0, lat=34.0),
            Row(ts="2026-01-01 00:02:05", lon=-73.9, lat=40.7),
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch.write.mode("overwrite").parquet(src_dir)

    stream = spark.readStream.schema(batch.schema).parquet(src_dir)
    out = stream_tile_counts(stream, zoom=8, ts="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("tile_counts_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    # append mode emits only watermark-closed windows; run a second
    # empty trigger to advance the watermark and flush
    res = spark.sql("SELECT * FROM tile_counts_test").collect()
    # with availableNow + append, late windows may still be open; at
    # minimum the query must run without error and the schema be right
    assert {"window_start", "window_end", "tile_x", "tile_y", "n"} <= set(
        spark.table("tile_counts_test").columns
    )
    del res
    q.stop()


def test_stream_reproject_stateless(spark, tmp_path):
    from proj_spark.streaming.tiles import stream_reproject

    src_dir = str(tmp_path / "pts")
    spark.createDataFrame([Row(lon=-117.0, lat=35.0)]).write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema("lon double, lat double").parquet(src_dir)
    out = stream_reproject(stream, "+proj=latlong +datum=WGS84", "+proj=utm +zone=11 +datum=WGS84")
    q = (
        out.writeStream.format("memory")
        .queryName("reproj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM reproj_test").collect()
    assert len(rows) == 1
    assert rows[0].x == pytest.approx(500000.0, abs=1.0)
    q.stop()


def test_dms_parse_matches_python(spark):
    from proj_spark.crs import dmstor
    from proj_spark.functions.dms import dms_to_rad

    samples = ["79d00'00.000\"W", "45d30'", "12d15'30.5\"N", "-3.5", "120dE", "0dN"]
    df = spark.createDataFrame([Row(s=s) for s in samples])
    got = {r.s: r.v for r in df.withColumn("v", dms_to_rad("s")).collect()}
    for s in samples:
        assert got[s] == pytest.approx(dmstor(s), abs=1e-15), s


def test_rad_to_dms_roundtrip(spark):
    from proj_spark.functions.dms import VM_DEG, rad_to_dms

    df = spark.createDataFrame([Row(v=45.5 * VM_DEG), Row(v=-12.2583 * VM_DEG)])
    out = [r.s for r in df.withColumn("s", rad_to_dms("v")).collect()]
    assert out[0].startswith("45d30'00.000")
    assert out[0].endswith("N")
    assert out[1].endswith("S")


def test_geodesic_waypoints_endpoints(spark):
    from proj_spark.operators.geodesic_ops import geodesic_waypoints

    df = spark.createDataFrame([Row(pair=1, lon1=-75.0, lat1=40.0, lon2=-74.0, lat2=41.0)])
    out = geodesic_waypoints(df, n_points=4).orderBy("wp_idx").collect()
    assert len(out) == 5
    assert out[0].wp_lon == pytest.approx(-75.0, abs=1e-9)
    assert out[0].wp_lat == pytest.approx(40.0, abs=1e-9)
    assert out[-1].wp_lon == pytest.approx(-74.0, abs=1e-6)
    assert out[-1].wp_lat == pytest.approx(41.0, abs=1e-6)
    # monotone progress along the path
    lats = [r.wp_lat for r in out]
    assert lats == sorted(lats)


def test_polygon_metrics_square(spark):
    from proj_spark.operators.geodesic_ops import polygon_metrics

    # ~111km x 111km square at the equator
    ring = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    rows = [
        Row(poly_id="sq", vertex_idx=i, lon=x, lat=y) for i, (x, y) in enumerate(ring)
    ]
    out = polygon_metrics(spark.createDataFrame(rows)).collect()[0]
    assert out.n_vertices == 4
    # perimeter ~ 4 * 110.6-111.3 km
    assert 440_000 < out.perimeter_m < 448_000
    # area ~ 111km^2 ~ 1.23e10 m2 within a few percent
    assert out.area_m2 == pytest.approx(1.23e10, rel=0.03)


def test_stateful_tile_accumulator_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-tile running state across
    micro-batches: two input files + maxFilesPerTrigger=1 -> two
    micro-batches in one query -> counts accumulate via state."""
    import os

    from proj_spark.streaming.stateful import stream_tile_accumulator

    src = str(tmp_path / "stream_in")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    rows1 = [Row(lon=-118.0 + i * 1e-4, lat=34.0) for i in range(5)]
    rows2 = [Row(lon=-118.0 + i * 1e-4, lat=34.0) for i in range(3)]
    spark.createDataFrame(rows1).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(rows2).coalesce(1).write.parquet(src + "/b2")
    stream = (
        spark.readStream.schema("lon double, lat double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/b*")
    )
    out = stream_tile_accumulator(stream, zoom=8)
    q = (
        out.writeStream.format("memory")
        .queryName("tile_state_test")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    rows = spark.sql(
        "SELECT n_total, batches FROM tile_state_test ORDER BY n_total DESC"
    ).collect()
    # update mode emits one row per micro-batch; the latest shows the
    # accumulated state across both batches
    assert rows[0].n_total == 8
    assert rows[0].batches == 2
    assert rows[-1].n_total in (3, 5)  # first micro-batch emission


def test_stream_dedup_emits_first_sight_only(spark, tmp_path):
    """Streaming exact dedup: a content key is emitted exactly once
    (on first sight), across micro-batches."""
    import os

    from proj_spark.streaming.stateful import stream_dedup

    src = str(tmp_path / "docs_in")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt_dedup")
    b1 = [Row(doc_id=f"d{i}", text=t) for i, t in enumerate(["alpha", "beta", "alpha"])]
    b2 = [Row(doc_id=f"e{i}", text=t) for i, t in enumerate(["beta", "gamma", "alpha"])]
    spark.createDataFrame(b1).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(b2).coalesce(1).write.parquet(src + "/b2")
    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/b*")
    )
    q = (
        stream_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    rows = spark.sql("SELECT content_key, doc_id FROM dedup_test").collect()
    # three distinct contents -> exactly three emissions total
    assert len(rows) == 3
    assert len({r.content_key for r in rows}) == 3
    # first-seen ids win: 'alpha'/'beta' came from batch 1
    ids = {r.doc_id for r in rows}
    assert ids & {"d0", "d1"}  # alpha->d0, beta->d1 (batch order permitting)


class _FakeState:
    """Minimal GroupState stand-in for the timeout-eviction unit test."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self.removed = True
        self._value = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_stateful_timeout_evicts_without_emitting():
    """A timeout callback must evict state and yield NOTHING — the
    round-2 ADVICE bug was re-running the normal path (state.update +
    re-armed timeout => the TTL eviction never happened and
    accumulator emitted a spurious row per firing)."""
    from proj_spark.streaming.stateful import (
        _make_accumulator_update,
        _make_dedup_update,
    )

    acc = _make_accumulator_update(ttl=1000)
    st = _FakeState(value=(5, 1.0, 2.0, 3), timed_out=True)
    out = list(acc((7, 9), iter([]), st))
    assert out == [] and st.removed and st.timeout_set is None

    ded = _make_dedup_update(ttl=1000)
    st2 = _FakeState(value=("doc-1", 4), timed_out=True)
    out2 = list(ded((123,), iter([]), st2))
    assert out2 == [] and st2.removed and st2.timeout_set is None


def test_stateful_normal_path_still_accumulates():
    import pandas as pd

    from proj_spark.streaming.stateful import _make_accumulator_update

    acc = _make_accumulator_update(ttl=500)
    st = _FakeState(value=(2, 10.0, 20.0, 1), timed_out=False)
    batch = pd.DataFrame({"lon": [1.0, 3.0], "lat": [2.0, 4.0]})
    (row,) = list(acc((7, 9), iter([batch]), st))
    assert int(row["n_total"].iloc[0]) == 4
    assert st._value == (4, 14.0, 26.0, 2)
    assert st.timeout_set == 500


def test_bch2bps_power_series_matches_chebyshev():
    """bch2bps port (src/bch2bps.c): converting the bchgen Chebyshev
    matrix to a power series preserves the evaluation to fp noise."""
    import numpy as np
    from numpy.polynomial import polynomial as P

    from proj_spark.plans.cheby import bch2bps, bchgen, biv_cheb_eval

    def f(u, v):
        return np.sin(u) * np.cosh(0.3 * v) + u * v, np.cos(u) + v ** 3

    a, b = (0.1, -0.4), (1.2, 0.9)
    cx, cy = bchgen(a, b, 12, 12, f)
    rng = np.random.default_rng(7)
    us = rng.uniform(a[0], b[0], 64)
    vs = rng.uniform(a[1], b[1], 64)
    fx, fy = f(us, vs)
    assert np.max(np.abs(biv_cheb_eval(cx, a, b, us, vs) - fx)) < 1e-12
    px, py = bch2bps(a, b, cx), bch2bps(a, b, cy)
    assert np.max(np.abs(P.polyval2d(us, vs, px) - fx)) < 1e-10
    assert np.max(np.abs(P.polyval2d(us, vs, py) - fy)) < 1e-10


def test_mk_cheby_cut_residual_semantics():
    """mk_cheby (src/mk_cheby.c): sub-threshold coefficients zero out
    and the summed residual honors the requested resolution."""
    import numpy as np

    from proj_spark.plans.cheby import mk_cheby

    def f(u, v):
        return np.exp(0.3 * u) * np.cos(v), np.sin(u + v)

    cx, cy, resid, cut = mk_cheby((-1.0, -1.0), (1.0, 1.0), 1e-4, f, 15, 15)
    assert resid[0] >= 0 and resid[0] < 1e-4 and resid[1] < 1e-4
    assert np.all((cx == 0.0) | (np.abs(cx) >= cut))


def test_stream_near_dedup_collapses_noisy_duplicates(spark, tmp_path):
    """Near-dup streaming filter: case/whitespace noise preserves the
    shingle set, so noisy re-ingests share a minhash signature and
    dedup to ONE emission; genuinely different docs all survive."""
    import os

    from proj_spark.streaming.stateful import stream_near_dedup

    src = str(tmp_path / "near_in")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt_near")
    base = "the quick brown fox jumps over the lazy dog again and again"
    noisy = "The  QUICK brown fox jumps  over the LAZY dog again and  again"
    other = "completely different content about spark streaming state stores"
    b1 = [Row(doc_id="d0", text=base), Row(doc_id="d1", text=other)]
    b2 = [Row(doc_id="e0", text=noisy), Row(doc_id="e1", text=base)]
    spark.createDataFrame(b1).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(b2).coalesce(1).write.parquet(src + "/b2")
    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/b*")
    )
    q = (
        stream_near_dedup(stream)
        .writeStream.format("memory")
        .queryName("near_dedup_test")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    rows = spark.sql("SELECT content_key, doc_id FROM near_dedup_test").collect()
    # base == noisy == base-again (one signature) + other
    assert len(rows) == 2
    assert {r.doc_id for r in rows} == {"d0", "d1"}


def test_minhash_key_is_order_invariant_but_content_sensitive(spark):
    from proj_spark.streaming.stateful import minhash_key_udf

    udf = minhash_key_udf()
    df = spark.createDataFrame(
        [
            ("a", "one two three four five six"),
            ("b", "ONE  two THREE four  five six"),  # case/space noise: same shingles
            ("c", "one two three four five six"),  # identical
            ("d", "totally unrelated words here now"),
            ("e", ""),
            ("f", "x"),
            ("g", "x"),
        ],
        "id string, text string",
    )
    keys = {r.id: r.k for r in df.select("id", udf("text").alias("k")).collect()}
    assert keys["a"] == keys["b"] == keys["c"]
    assert keys["a"] != keys["d"]
    # sub-shingle docs: exact-text keys in a disjoint negative range —
    # identical short docs share a key, DISTINCT ones never collapse
    assert keys["e"] < 0 and keys["f"] < 0
    assert keys["e"] != keys["f"]
    assert keys["f"] == keys["g"]


def test_sessionize_gap_semantics(spark):
    from datetime import datetime

    from proj_spark.operators.sessions import sessionize

    T = datetime
    rows = [
        (1, T(2024, 1, 1, 10, 0, 0), 1.0),
        (1, T(2024, 1, 1, 10, 10, 0), 2.0),   # same session (600s < 1800)
        (1, T(2024, 1, 1, 11, 0, 0), 3.0),    # 3000s gap -> new session
        (2, T(2024, 1, 1, 10, 0, 0), 5.0),    # other user independent
        (1, T(2024, 1, 1, 11, 30, 0), 4.0),   # exactly 1800s -> NEW (>=)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r.user_id, r.session_id): r for r in sessionize(df, gap_s=1800).collect()
    }
    assert len(out) == 4
    assert out[(1, 1)].n_events == 2 and out[(1, 1)].sum_value == 3.0
    assert out[(1, 2)].n_events == 1 and out[(1, 2)].sum_value == 3.0
    assert out[(1, 3)].n_events == 1  # the >= boundary starts a session
    assert out[(2, 1)].n_events == 1


def test_stream_sessionize_smoke(spark, tmp_path):
    import os
    from datetime import datetime

    from proj_spark.operators.sessions import stream_sessionize

    src = str(tmp_path / "sess_in")
    os.makedirs(src)
    T = datetime
    spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10, 0, 0)),
            (1, T(2024, 1, 1, 10, 5, 0)),
            (1, T(2024, 1, 1, 12, 0, 0)),
            (2, T(2024, 1, 1, 10, 0, 0)),
        ],
        "user_id long, ts timestamp",
    ).coalesce(1).write.parquet(src + "/b1")
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src + "/b*")
    q = (
        stream_sessionize(stream, gap_s=1800)
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    rows = spark.sql("SELECT user_id, n_events FROM sess_test").collect()
    # append mode emits sessions closed by the final watermark; the
    # user-1 10:00 session (2 events) and user-2 session are closed by
    # the 12:00 event's watermark advance
    got = {(r.user_id, r.n_events) for r in rows}
    assert (1, 2) in got and (2, 1) in got


def test_stream_near_dedup_state_survives_restart(spark, tmp_path):
    """Checkpoint-resume: a duplicate arriving AFTER a stream restart
    must still be suppressed — the first-sight state lives in the
    checkpointed state store, not the process."""
    import os

    from proj_spark.streaming.stateful import stream_near_dedup

    src = str(tmp_path / "resume_in")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt_resume")
    base = "the quick brown fox jumps over the lazy dog again and again"
    fresh = "an entirely new document with its own distinct shingles here"

    sink = str(tmp_path / "resume_out")

    def _run():
        # file sink (memory sinks cannot recover from a checkpoint);
        # append is valid because emissions are one-shot per key
        stream = (
            spark.readStream.schema("doc_id string, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/b*")
        )
        q = (
            stream_near_dedup(stream, output_mode="append")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()
        return spark.read.parquet(sink).collect()

    spark.createDataFrame(
        [Row(doc_id="d0", text=base)]
    ).coalesce(1).write.parquet(src + "/b1")
    first = {r.doc_id for r in _run()}
    assert first == {"d0"}

    # restart with new data: a near-dup of d0 (case noise) + a fresh doc
    spark.createDataFrame(
        [Row(doc_id="e0", text=base.upper()), Row(doc_id="e1", text=fresh)]
    ).coalesce(1).write.parquet(src + "/b2")
    second = {r.doc_id for r in _run()}
    # cumulative file sink: d0 from run 1 + only the fresh doc from
    # run 2 — the restarted state suppressed the near-dup e0
    assert second == {"d0", "e1"}


def test_resume_drill_small(tmp_path):
    """Curation-funnel checkpoint-resume drill (tools/resume_drill.py):
    kill the driver after the 'pairs' stage commits (poisoned partial
    parquet left in the next stage's dir), restart, assert the resumed
    run skips all committed stages, overwrites the partial, and lands
    on the uninterrupted run's exact split counts."""
    import json
    import subprocess
    import sys

    tool = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools", "resume_drill.py")
    p = subprocess.run(
        [sys.executable, tool, "--drill", "--docs", "5000", "--cpus", "4",
         "--base", str(tmp_path / "drill")],
        capture_output=True, text=True, timeout=540,
    )
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]
    out = json.loads(p.stdout.strip().splitlines()[-1])
    assert out["pass"] is True
    assert out["uninterrupted_splits"] == out["resumed_splits"]
    assert set(out["resume_recomputed"]) == {"groups", "decon", "split"}


def test_stream_image_ingest_exactly_once_resume(spark, tmp_path):
    """Streaming ingest front door (streaming/ingest.py): two
    availableNow passes over one checkpoint — the second pass must
    process ONLY the files that landed after the first (exactly-once),
    and the gated output must match the batch gate row-for-row."""
    from proj_spark.sources.images import gate_payloads, generate_images
    from proj_spark.streaming.ingest import run_image_ingest

    src = str(tmp_path / "landing")
    sink = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    all_imgs = generate_images(spark, 24, partitions=2).cache()
    batch_a = all_imgs.where(F.col("image_id") < "img000000000012")
    batch_b = all_imgs.where(F.col("image_id") >= "img000000000012")

    batch_a.write.mode("append").parquet(src)
    run_image_ingest(spark, src, sink, ckpt, zoom=8)
    n_first = spark.read.parquet(sink).count()
    assert n_first == 12  # synthetic payloads all pass the gate

    # second batch lands; resume from the same checkpoint
    batch_b.write.mode("append").parquet(src)
    run_image_ingest(spark, src, sink, ckpt, zoom=8)
    out = spark.read.parquet(sink)
    assert out.count() == 24  # batch A not re-processed (no dupes)
    assert out.select("image_id").distinct().count() == 24

    # verdict parity with the batch gate + derived keys present
    assert {"lon", "lat", "tile_x", "tile_y", "psnr_db"} <= set(out.columns)
    assert "bytes" not in out.columns
    batch_ok = gate_payloads(all_imgs).where(
        F.col("caption_ok") & F.col("pixels_ok")
    )
    got = {r.image_id: r.psnr_db for r in out.select("image_id", "psnr_db").collect()}
    want = {r.image_id: r.psnr_db for r in batch_ok.select("image_id", "psnr_db").collect()}
    assert got == want


def test_gate_payloads_matches_verify_payloads(spark):
    from proj_spark.sources.images import (
        gate_payloads,
        generate_images,
        verify_payloads,
    )

    imgs = generate_images(spark, 16, partitions=2).cache()
    via_verify = {
        r.image_id: (round(r.psnr_db, 9), r.caption_ok, r.pixels_ok)
        for r in verify_payloads(imgs).collect()
    }
    gated = gate_payloads(imgs, keep_bytes=True)
    assert "bytes" in gated.columns
    via_gate = {
        r.image_id: (round(r.psnr_db, 9), r.caption_ok, r.pixels_ok)
        for r in gated.collect()
    }
    assert via_verify == via_gate


def test_stream_image_ingest_rejects_quarantine(spark, tmp_path):
    """Corrupt payloads become quarantined reject rows (not task
    failures), and both sinks stay exactly-once across a resume."""
    from proj_spark.sources.images import generate_images
    from proj_spark.streaming.ingest import run_image_ingest

    src = str(tmp_path / "landing")
    sink = str(tmp_path / "table")
    rej = str(tmp_path / "rejects")
    ckpt = str(tmp_path / "ckpt")

    imgs = generate_images(spark, 12, partitions=2)
    # corrupt two payloads: truncated blobs the codecs raise on
    bad = F.col("image_id").isin("img000000000003", "img000000000007")
    batch_a = imgs.withColumn(
        "bytes", F.when(bad, F.expr("substring(bytes, 1, 5)")).otherwise(F.col("bytes"))
    )
    batch_a.write.mode("append").parquet(src)
    run_image_ingest(spark, src, sink, ckpt, zoom=8, rejects_dir=rej)
    assert spark.read.parquet(sink).count() == 10
    rejects = spark.read.parquet(rej)
    assert {r.image_id for r in rejects.select("image_id").collect()} == {
        "img000000000003",
        "img000000000007",
    }
    assert rejects.where(F.col("pixels_ok")).count() == 0

    # more files land; the resumed pass must not re-process batch A
    generate_images(spark, 20, partitions=2).where(
        F.col("image_id") >= "img000000000012"
    ).write.mode("append").parquet(src)
    run_image_ingest(spark, src, sink, ckpt, zoom=8, rejects_dir=rej)
    out = spark.read.parquet(sink)
    assert out.count() == 18  # 10 + 8 new, no dupes
    assert out.select("image_id").distinct().count() == 18
    assert spark.read.parquet(rej).count() == 2
