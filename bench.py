"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "rows_per_sec": ...}

The flagship measurement mirrors the BASELINE.json metric: spatial
join + tile assignment over the input_hint image table (point-in-
polygon against fixture polygons, multi-zoom tile rollup), reported
as rows/sec.  Set SPARK_GRAFT_SCALING=8,32 to run the flagship at two
parallelism levels and report scaling efficiency (the sandbox stand-in
for the N->4N executor criterion).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "2000000"))
# flagship input layout: 'clustered' (default; the north_star's
# centroid-keyed Iceberg sort order) or 'wide' (the unclustered wide
# table with pruned scan — the compute-bound scaling regime recorded in
# BENCH_SCALING.json)
FLAGSHIP_TABLE = os.environ.get("SPARK_GRAFT_FLAGSHIP_TABLE", "clustered")


def _img_cache(n: int) -> str:
    if n == N_IMAGES and "SPARK_GRAFT_IMG_CACHE" in os.environ:
        return os.environ["SPARK_GRAFT_IMG_CACHE"]
    return f"/tmp/proj_spark_bench/images_{n}"


def _pts_cache(n: int) -> str:
    return f"{_img_cache(n)}_pts_c1"


def _pts_uncl_cache(n: int) -> str:
    return f"{_img_cache(n)}_pts_u"


# module-level aliases for the default size (back-compat)
_IMG_CACHE = _img_cache(N_IMAGES)
_PTS_CACHE = _pts_cache(N_IMAGES)
_PTS_UNCL_CACHE = _pts_uncl_cache(N_IMAGES)

_SF1_CACHE = "/tmp/proj_spark_bench/sf1_scaled10"
# tables the headline queries touch; key column(s) remapped per replica
_SF1_TABLES = {
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
    "customer": ("c_custkey",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "nation": (),   # small dim: copied as-is (query side of knn)
    "events": ("event_id",),
}


def _sf1_dir(spark, src_dir: str) -> str:
    """Materialize a 10x-replicated copy of ``src_dir`` (sf0.1 -> an
    sf1-equivalent row count) under /tmp, once.  Keys are remapped
    key*10+replica so point distributions stay uniform (synth_lon/lat
    derive from the key); document text gets a per-replica token so
    near-dup timing isn't dominated by 10-way exact clones."""
    from pyspark.sql import functions as F

    done = os.path.join(_SF1_CACHE, "_DONE")
    if not os.path.exists(done):
        os.makedirs(_SF1_CACHE, exist_ok=True)
        reps = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("_rep")
        for tbl, keys in _SF1_TABLES.items():
            src = os.path.join(src_dir, f"{tbl}.parquet")
            if not os.path.exists(src):
                continue
            df = spark.read.parquet(src)
            if keys:
                df = df.select("*", reps)
                for k in keys:
                    df = df.withColumn(k, F.col(k) * 10 + F.col("_rep"))
                if tbl == "documents":
                    df = df.withColumn(
                        "text",
                        F.concat(F.col("text"), F.lit(" r"), F.col("_rep")),
                    )
                df = df.drop("_rep")
            df.write.mode("overwrite").parquet(
                os.path.join(_SF1_CACHE, f"{tbl}.parquet")
            )
        with open(done, "w") as f:
            f.write("ok\n")
    return _SF1_CACHE


def _image_table(spark, n_images: int):
    """Materialize the input_hint image table once (parquet cache).

    The BASELINE metric measures join+tile throughput over an EXISTING
    Iceberg table; synthesis cost is a fixture cost, not pipeline
    time, so it is cached across bench runs."""
    from proj_spark.sources.images import generate_images, with_centroids

    cache = _img_cache(n_images)
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        imgs = with_centroids(generate_images(spark, n_images, partitions=4 * CPUS))
        imgs.write.mode("overwrite").parquet(cache)
    return spark.read.parquet(cache)


def _pts_table(spark, n_images: int):
    """The flagship's INPUT VIEW of the image table: the non-payload
    columns, laid out CLUSTERED by z11 centroid tile (range-partitioned
    + sorted) — the north_star's input is an Iceberg table "keyed by
    image centroid coordinates", and a spatial sort order is the
    standard layout for such tables (payload columns are never read by
    this pipeline, so a pruned scan of the clustered wide table and
    this projection do identical IO).  Clustering collapses per-tile /
    per-cell partial aggregates (each file covers few tiles), so
    rollup shuffles carry ~distinct-tiles rows instead of
    ~input-partitions x distinct-tiles."""
    from pyspark.sql import functions as CF

    from proj_spark.functions import expressions as CE

    cache = _pts_cache(n_images)
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        if os.path.exists(os.path.join(_img_cache(n_images), "_SUCCESS")):
            imgs = _image_table(spark, n_images).select(
                "image_id", "phash", "lon", "lat"
            )
        else:
            # large scale factors: payload-free point generator (same
            # centroid law, surrogate phash — sources/images.py
            # generate_points).  generate_images would pixel-encode
            # every row in Python (~3k rows/s/core: 128M rows = hours)
            # to produce payload bytes this pruned view never reads.
            from proj_spark.sources.images import generate_points

            imgs = generate_points(spark, n_images, partitions=4 * CPUS)
        key = CE.tile_key(
            CE.tile_x("lon", CF.lit(11)), CE.tile_y("lat", CF.lit(11)), CF.lit(11)
        )
        (
            imgs.withColumn("_ck", key)
            .repartitionByRange(4 * CPUS, "_ck")
            .sortWithinPartitions("_ck")
            .drop("_ck")
            .write.mode("overwrite")
            .parquet(cache)
        )
    return spark.read.parquet(cache)


def _pts_uncl_table(spark, n_images: int):
    """UNCLUSTERED point view: the same rows as _pts_table but in
    random (round-robin) order — the 'wide-regime' scan shape for
    large n where materializing the full payload table does not fit
    disk (42 GB at 16M -> ~170 GB at 64M).  A pruned scan of an
    unclustered wide table reads exactly these column chunks in
    exactly this order, so the scan+aggregate behavior (no spatial
    locality, partial aggs saturate at the distinct-tile cap per
    task) is identical to the true wide layout.  Written as
    4 x CPUS files so one map task covers ~n/(4 CPUS) rows."""
    cache = _pts_uncl_cache(n_images)
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        if os.path.exists(os.path.join(_pts_cache(n_images), "_SUCCESS")) or os.path.exists(
            os.path.join(_img_cache(n_images), "_SUCCESS")
        ):
            src = _pts_table(spark, n_images)
        else:
            # very large n: payload-free generator (same centroid law,
            # surrogate phash — sources/images.py generate_points)
            from proj_spark.sources.images import generate_points

            src = generate_points(spark, n_images, partitions=4 * CPUS)
        (
            src.repartition(4 * CPUS)  # round-robin: destroys spatial order
            .write.mode("overwrite")
            .parquet(cache)
        )
    return spark.read.parquet(cache)


def _warm_map_in_pandas(spark, slots: int):
    """Untimed warm-up of the mapInPandas path: the FIRST mapInPandas
    action on a fresh worker pool pays python-worker fork + module
    import + Arrow stream setup (~2s across 32 workers), a one-time
    cost a long-running cluster amortizes away; run it on every worker
    slot so the timed flagship measures the steady state.

    The warm kernel also imports the engine modules the flagship
    kernel needs (numpy + the kernel/plan packages): measured on this
    box, a noop-only warm still left the first fused run ~1.5 s slower
    than steady state because each of the 32 workers paid the package
    import inside the timed region — the exact cost a warm pool
    exists to hoist."""
    import pandas as pd
    from pyspark.sql import functions as F

    def _noop(batches):
        import numpy  # noqa: F401  (resident after warm)

        import proj_spark.kernels.xmath  # noqa: F401
        import proj_spark.operators.fused  # noqa: F401
        import proj_spark.plans.pipeline  # noqa: F401

        n = 0
        for b in batches:
            n += len(b)
        yield pd.DataFrame({"n": [n]})

    (
        spark.range(40000, numPartitions=2 * slots)
        .select(F.col("id").cast("double").alias("lon"), F.col("id").cast("double").alias("lat"))
        .mapInPandas(_noop, "n long")
        .agg(F.sum("n"))
        .collect()
    )


def _box_sentinel(spark, cpus: int, n_rows: int = 8_000_000) -> dict:
    """Box-health sentinel (round-5 verdict task 2): a fixed-size
    pure-compute probe — the flagship's datum-transform pandas UDF over
    spark.range, no parquet scan, no disk, one tiny agg — run 3x,
    median reported.  Because the work is constant and plan-free, the
    number moves ONLY with the box (CPU contention, DRAM bandwidth,
    thermal state), so a degraded-box night is visible inside the
    BENCH json itself instead of needing forensic reconstruction from
    BASELINE.md prose.  Healthy band on the dev box: see BASELINE.md
    (sentinel section)."""
    from pyspark.sql import functions as F

    from proj_spark.functions.transform import transform as _t
    from proj_spark.operators.gridshift import make_synthetic_grid, register_grid

    register_grid("conus_syn", make_synthetic_grid())

    def probe() -> float:
        base = spark.range(n_rows, numPartitions=4 * cpus).select(
            (F.col("id") % 56 - 124.0 + (F.col("id") % 977) / 1000.0).alias("lon"),
            (F.col("id") % 26 + 25.0 + (F.col("id") % 991) / 1000.0).alias("lat"),
        )
        out = _t(
            base,
            "+proj=latlong +ellps=clrk66 +nadgrids=conus_syn",
            "+proj=latlong +datum=WGS84",
            "lon",
            "lat",
        )
        t0 = time.time()
        out.agg(F.sum("x"), F.sum("y")).collect()
        return time.time() - t0

    walls = sorted(probe() for _ in range(3))
    med = walls[1]
    return {
        "n_rows": n_rows,
        "wall_sec_median_of_3": round(med, 3),
        "wall_sec_runs": [round(w, 3) for w in walls],
        "rows_per_sec": round(n_rows / med, 1),
        "note": (
            "fixed pure-compute probe (datum-transform pandas UDF over "
            "spark.range, no scan/shuffle); moves only with box health — "
            "healthy band documented in BASELINE.md"
        ),
    }


def _flagship(spark, n_images: int):
    """images -> datum reprojection (grid shift, NAD27-style ->
    WGS84) -> PIP join -> multi-zoom tiles -> rollup: the full
    north-star pipeline.

    Returns (n_rows_processed, result_count).

    FUSED-KERNEL plan (round 3, operators/fused.py): round 2's fusion
    collapsed the pipeline to one job (scan -> pandas transform ->
    broadcast PIP -> tile exprs -> one tiny exchange), which tripled
    absolute throughput — and thereby exposed the next ceiling: every
    row still crossed the JVM<->Python Arrow boundary and flowed
    through the interpreted first-match filter + JVM hash aggregate,
    several hundred bytes of DRAM traffic per 40-byte row.  Measured
    on the bench box the numpy math scales nearly perfectly across
    cores while that JVM row machinery saturates shared memory
    bandwidth at ~16M rows/s total.  reproject_pip_tile_rollup fuses
    transform + PIP + tile + PARTIAL AGGREGATE into one mapInPandas
    kernel: the scan reads two float64 columns, each task returns
    |distinct (z11 tile, poly)| packed-long rows (bounded by the tile
    universe, not the input), and the only exchange carries a few
    thousand longs.  Identical output to the composed operators
    (tests/test_fused.py asserts bit-exact parity); coarser zooms are
    quadtree shifts of the z11 aggregate as before.
    """
    from pyspark.sql import functions as F

    from __spark_entry__ import _fixture_polygons
    from proj_spark.operators.fused import reproject_pip_tile_rollup
    from proj_spark.operators.gridshift import make_synthetic_grid, register_grid

    if FLAGSHIP_TABLE == "wide":
        imgs = _image_table(spark, n_images)
    elif FLAGSHIP_TABLE == "unclustered":
        imgs = _pts_uncl_table(spark, n_images)
    else:
        imgs = _pts_table(spark, n_images)
    register_grid("conus_syn", make_synthetic_grid())
    # zooms [4, 8, 11] chosen so tiles stay dense at bench scale (~300+
    # rows per z11 tile at 16M rows over CONUS) — matching the per-tile
    # density a 10^12-row table would have at z12+.
    small = reproject_pip_tile_rollup(
        imgs,
        "+proj=latlong +ellps=clrk66 +nadgrids=conus_syn",
        "+proj=latlong +datum=WGS84",
        _fixture_polygons(),
        zoom=11,
    )
    # ONE action, no persist barrier: the round-2 barrier guarded
    # against Catalyst planning the countDistinct Expand over the full
    # input, but the fused kernel pre-aggregates in-worker, so the
    # worst Expand can land on is the |distinct keys|-sized partial
    # output.  sum(n) == n_images forces the rollup counts to be
    # computed (not pruned) and doubles as a row-conservation check.
    stats = small.agg(
        F.countDistinct(F.struct("tile_x", "tile_y")).alias("t11"),
        F.countDistinct(
            F.struct(F.shiftright("tile_x", 3), F.shiftright("tile_y", 3))
        ).alias("t8"),
        F.countDistinct(
            F.struct(F.shiftright("tile_x", 7), F.shiftright("tile_y", 7))
        ).alias("t4"),
        F.countDistinct("poly_seq").alias("n_polys"),  # nulls (misses) ignored
        F.sum("n").alias("total"),
    ).collect()[0]
    assert int(stats.total) == n_images, (stats.total, n_images)
    n_tiles = int(stats.t11) + int(stats.t8) + int(stats.t4)
    return n_images, n_tiles + int(stats.n_polys)


def run_benchmarks(cpus: int = CPUS) -> dict:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from proj_spark.session import build_session

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = build_session("proj-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # fixture materialization (not measured as pipeline time): the wide
    # image table and its clustered point view (the Iceberg-layout
    # analog) are both table-build costs, not query time
    t0 = time.time()
    _image_table(spark, N_IMAGES)
    _pts_table(spark, N_IMAGES)
    fixture_s = round(time.time() - t0, 3)

    # warm-up (untimed): spins up the Python worker pool, compiles
    # whole-stage codegen, JITs the shuffle path — one-time JVM costs
    # that a long-running cluster amortizes away
    from pyspark.sql import functions as WF

    from proj_spark.functions.transform import transform as _warm_transform

    warm = spark.range(20000).select(
        WF.col("id"),
        (WF.col("id") % 360 - 180.0).cast("double").alias("lon"),
        (WF.col("id") % 120 - 60.0).cast("double").alias("lat"),
    )
    warm = _warm_transform(warm, "+proj=latlong +datum=WGS84", "+proj=merc +datum=WGS84", "lon", "lat")
    warm.groupBy((WF.col("id") % 7).alias("g")).count().collect()
    _warm_map_in_pandas(spark, cpus)

    # flagship: spatial join + tile assignment throughput.  Median of 3
    # runs (round-5 verdict task 2): a single sample at this scale sits
    # inside a documented +/-80% box-noise band, which made every
    # round-over-round comparison unfalsifiable.
    flag_walls = []
    for _ in range(3):
        t0 = time.time()
        n_rows, _ = _flagship(spark, N_IMAGES)
        flag_walls.append(time.time() - t0)
    flagship_s = sorted(flag_walls)[1]
    timings["flagship_pip_tiles"] = round(flagship_s, 3)

    qs = entrymod.queries()
    headline = [
        "tile_multizoom",      # explode + shuffle rollup, 600k x 3 rows
        "utm_fwd",             # pandas-UDF kernel throughput
        "gridshift_roundtrip", # full datum pipeline w/ grid interpolation
        "knn",                 # broadcast cross join + window top-k
        "pip",                 # cell-bucketed ray-cast join
        "ann_cosine",          # vector fold dot products
        "webmerc_fwd",         # pure-expression projection
    ]

    def _time_suite(sf_dir: str, into: dict) -> None:
        from proj_spark.operators.knn import release_persisted

        for name in headline:
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            into[name] = round(time.time() - t0, 3)
        # free the ranked-stage caches the knn plans pinned (one per
        # escalation level) now that the action is done
        release_persisted()
        # near-dup pipeline at scale settings: fast-mode (xxhash64)
        # minhash LSH -> candidate pairs (the deterministic dictionary
        # mode exists only for the DuckDB oracle gate)
        from proj_spark.operators.dedup import (
            minhash_lsh_pairs,
            minhash_signatures,
            shingle,
            tokenize,
        )

        t0 = time.time()
        docs = shingle(
            tokenize(spark.read.parquet(f"{sf_dir}/documents.parquet")), w=3
        )
        sigs = minhash_signatures(docs, id_col="doc_id", deterministic=False)
        minhash_lsh_pairs(sigs).count()
        into["minhash_lsh_fast"] = round(time.time() - t0, 3)

    # sf0.1 suite: 3 reps, per-query MEDIAN recorded (round-5 verdict
    # task 2 — single samples at this scale are noise-dominated; r4's
    # pip 4.88 s vs r3's 2.33 s was the box, not the plan, but the
    # artifact couldn't prove it).  Raw rep totals kept alongside.
    suite_reps: list[dict[str, float]] = []
    for _ in range(3):
        rep: dict[str, float] = {}
        _time_suite(SF_DIR, rep)
        suite_reps.append(rep)
    for key in suite_reps[0]:
        timings[key] = sorted(r[key] for r in suite_reps)[1]

    # the same suite at 10x rows (sf1-equivalent): single-query times at
    # sf0.1 sit inside a documented +/-80% noise band (BASELINE.md), so
    # regressions are only readable at a scale where work dominates
    # startup noise.  On by default for the driver's sf0.1 run; skip
    # with SPARK_GRAFT_SF1=0 (quick smokes at other SFs skip unless
    # SPARK_GRAFT_SF1=1).
    sf1_env = os.environ.get("SPARK_GRAFT_SF1")
    run_sf1 = sf1_env == "1" or (sf1_env != "0" and SF_DIR.rstrip("/").endswith("sf0.1"))
    sf1_timings: dict[str, float] = {}
    if run_sf1:
        t0 = time.time()
        sf1_dir = _sf1_dir(spark, SF_DIR)
        sf1_fixture_s = round(time.time() - t0, 3)
        _time_suite(sf1_dir, sf1_timings)
        sf1_timings["fixture_gen_sec"] = sf1_fixture_s

    # image-payload lane (NOT in the suite total, so `value` stays
    # comparable round-over-round): the metric's PSNR>=40 payload gate
    # as a throughput number — generate real PNG/JPEG payloads, then
    # decode + verify every row (sources/jpeg.py baseline codec).
    img_lane: dict[str, float] = {}
    try:
        from pyspark.sql import functions as BF

        from proj_spark.sources.images import generate_images, verify_payloads

        n_img = int(os.environ.get("SPARK_GRAFT_BENCH_PAYLOADS", "20000"))
        t0 = time.time()
        imgs = generate_images(spark, n_img, partitions=4 * cpus)
        imgs.write.mode("overwrite").parquet("/tmp/proj_spark_bench/_payload_lane")
        img_lane["encode_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        stored = spark.read.parquet("/tmp/proj_spark_bench/_payload_lane")
        ok = (
            verify_payloads(stored)
            .agg(BF.sum(BF.when(BF.col("caption_ok") & BF.col("pixels_ok"), 1).otherwise(0)))
            .collect()[0][0]
        )
        img_lane["decode_verify_sec"] = round(time.time() - t0, 3)
        img_lane["n_images"] = n_img
        img_lane["n_verified_ok"] = int(ok)
        img_lane["decode_rows_per_sec"] = round(n_img / img_lane["decode_verify_sec"], 1)
    except Exception as exc:  # never fail the bench for the extra lane
        img_lane = {"error": str(exc)[:200]}

    # 10x payload lane (round-5 verdict task 7): the same PSNR>=40
    # decode-verify gate at 10x the images — shows whether the
    # pure-python codec lane's scheduling overheads stay amortized
    # (rows/s within 0.8x of the base lane = yes) and puts a number
    # on the documented libjpeg-turbo swap point.  Skip with
    # SPARK_GRAFT_BENCH_PAYLOADS_10X=0.
    img_lane_10x: dict[str, float] = {}
    try:
        n_10x = int(
            os.environ.get("SPARK_GRAFT_BENCH_PAYLOADS_10X", str(10 * n_img))
        )
        if n_10x > 0:
            from pyspark.sql import functions as BF

            from proj_spark.sources.images import generate_images, verify_payloads

            t0 = time.time()
            imgs10 = generate_images(spark, n_10x, partitions=4 * cpus)
            imgs10.write.mode("overwrite").parquet(
                "/tmp/proj_spark_bench/_payload_lane_10x"
            )
            img_lane_10x["encode_sec"] = round(time.time() - t0, 3)
            t0 = time.time()
            stored10 = spark.read.parquet("/tmp/proj_spark_bench/_payload_lane_10x")
            ok10 = (
                verify_payloads(stored10)
                .agg(
                    BF.sum(
                        BF.when(
                            BF.col("caption_ok") & BF.col("pixels_ok"), 1
                        ).otherwise(0)
                    )
                )
                .collect()[0][0]
            )
            img_lane_10x["decode_verify_sec"] = round(time.time() - t0, 3)
            img_lane_10x["n_images"] = n_10x
            img_lane_10x["n_verified_ok"] = int(ok10)
            img_lane_10x["decode_rows_per_sec"] = round(
                n_10x / img_lane_10x["decode_verify_sec"], 1
            )
            if img_lane.get("decode_rows_per_sec"):
                img_lane_10x["rate_vs_base_lane"] = round(
                    img_lane_10x["decode_rows_per_sec"]
                    / img_lane["decode_rows_per_sec"],
                    3,
                )
    except Exception as exc:
        img_lane_10x = {"error": str(exc)[:200]}

    # tile-pyramid lane (round 4, NOT in the suite total): COG-style
    # overview build through the real PNG codec — decode 4 children /
    # encode 1 parent per output tile, one constant-group-size shuffle
    # per level (operators/pyramid.py).
    pyr_lane: dict[str, float] = {}
    try:
        import pandas as _pd
        from pyspark.sql import types as _T

        from proj_spark.operators.pyramid import build_pyramid
        from proj_spark.sources.images import encode_png, synth_pixels

        side = int(os.environ.get("SPARK_GRAFT_BENCH_TILE_SIDE", "64"))
        z_from = max(side - 1, 1).bit_length()  # ids fit: side <= 2^z_from
        tp = 16
        pyr_schema = _T.StructType(
            [
                _T.StructField("x", _T.LongType()),
                _T.StructField("y", _T.LongType()),
                _T.StructField("bytes", _T.BinaryType()),
            ]
        )

        def _pyr_gen(batches):
            for b in batches:
                rows = [
                    (
                        int(i) % side,
                        int(i) // side,
                        encode_png(synth_pixels(int(i), tp, tp)),
                    )
                    for i in b["id"].to_numpy()
                ]
                yield _pd.DataFrame(rows, columns=["x", "y", "bytes"])

        spark.range(0, side * side, 1, 4 * cpus).mapInPandas(
            _pyr_gen, pyr_schema
        ).write.mode("overwrite").parquet("/tmp/proj_spark_bench/_pyr_base")
        base_tiles = spark.read.parquet("/tmp/proj_spark_bench/_pyr_base")
        t0 = time.time()
        n_total = build_pyramid(base_tiles, z_from, 1, tp).count()
        dt = time.time() - t0
        spark.catalog.clearCache()  # drop the per-level persists
        pyr_lane = {
            "base_tiles": side * side,
            "levels": z_from,
            "overview_tiles_built": n_total - side * side,
            "build_sec": round(dt, 3),
            "overview_tiles_per_sec": round((n_total - side * side) / dt, 1),
        }
    except Exception as exc:
        pyr_lane = {"error": str(exc)[:200]}

    # raster-warp lane (round 4, NOT in the suite total): reproject a
    # 4096x4096 plate-carrée raster (64x64 tiles) onto zoom-10
    # web-mercator tiles — broadcast candidate map, one bounded-fan
    # shuffle, vectorized inverse-map gather (operators/warp.py).
    warp_lane: dict[str, float] = {}
    try:
        from proj_spark.operators.warp import (
            LatLonGrid,
            lcg_tiles,
            warp_to_webmerc,
        )

        wgrid = LatLonGrid(
            lon0=-120.0, lat0=48.0, dlon=0.005, dlat=0.005,
            width=4096, height=4096, tile_px=64,
        )
        # materialize the source raster first (fixture cost, untimed)
        # so the lane measures the WARP, not the LCG generation
        lcg_tiles(spark, wgrid, partitions=4 * cpus).write.mode(
            "overwrite"
        ).parquet("/tmp/proj_spark_bench/_warp_src")
        wtiles = spark.read.parquet("/tmp/proj_spark_bench/_warp_src")
        t0 = time.time()
        n_out = warp_to_webmerc(spark, wtiles, wgrid, zoom=10, out_px=64).count()
        dt = time.time() - t0
        warp_lane = {
            "source_px": wgrid.width * wgrid.height,
            "out_tiles": n_out,
            "out_px": n_out * 64 * 64,
            "warp_sec": round(dt, 3),
            "out_mpx_per_sec": round(n_out * 64 * 64 / dt / 1e6, 2),
        }
    except Exception as exc:
        warp_lane = {"error": str(exc)[:200]}

    # overlay/hull lane (round 5, NOT in the suite total): the
    # reference-point-dedup joins and the hull-reduction diameter over
    # the same sf tables — timed as one lane so the round artifact
    # carries their throughput without disturbing the suite bands.
    overlay_lane: dict[str, float] = {}
    try:
        import __spark_entry__ as _entry

        lane_qs = ("bbox_overlay", "interval_join", "diameter")
        reg = _entry.queries()
        for qn in lane_qs:
            t0 = time.time()
            n = reg[qn](spark, SF_DIR).count()
            overlay_lane[qn + "_sec"] = round(time.time() - t0, 3)
            overlay_lane[qn + "_rows"] = n
    except Exception as exc:
        overlay_lane = {"error": str(exc)[:200]}

    # box-health sentinel: fixed pure-compute probe, median of 3 —
    # makes a degraded-box night visible in THIS json (task 2)
    try:
        sentinel = _box_sentinel(spark, cpus)
    except Exception as exc:  # never fail the bench for the probe
        sentinel = {"error": str(exc)[:200]}

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "spatial-join+tile-assignment pipeline + operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_note": (
            "per-query values are the MEDIAN of 3 suite reps "
            "(flagship likewise median-of-3); raw rep totals in "
            "suite_rep_totals_sec"
        ),
        "suite_rep_totals_sec": [
            round(sum(r.values()), 3) for r in suite_reps
        ],
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": cpus,
        "flagship_rows": n_rows,
        "flagship_runs_sec": [round(w, 3) for w in flag_walls],
        "rows_per_sec": round(n_rows / flagship_s, 1),
        "fixture_gen_sec": fixture_s,
        "box_sentinel": sentinel,
        "image_payload_lane": img_lane,
        "image_payload_lane_10x": img_lane_10x,
        "tile_pyramid_lane": pyr_lane,
        "raster_warp_lane": warp_lane,
        "overlay_hull_lane": overlay_lane,
    }
    if sf1_timings:
        result["sf1_queries"] = sf1_timings
        result["sf1_note"] = (
            "PRIMARY per-query signal: same suite at 10x-replicated rows "
            "(sf1-equivalent, keys remapped key*10+replica; see bench.py "
            "_sf1_dir) — 10x the work makes plan regressions readable "
            "above startup noise, unlike the sf0.1 samples"
        )
    spark.stop()
    return result


def run_flagship_cluster(
    n_executors: int, cores: int = 4, mem_mb: int = 6144, n_images: int | None = None
) -> dict:
    """Flagship throughput on a real multi-executor local cluster
    (separate executor JVMs + netty shuffle — the faithful sandbox
    stand-in for the north rule's N vs 4N executor criterion; plain
    local[k] shares one JVM whose shuffle machinery stops scaling
    past ~8 threads).

    Each executor JVM is pinned to its core budget
    (-XX:ActiveProcessorCount): without it every executor sizes its
    GC/JIT pools for the whole machine and 8 JVMs oversubscribe the
    box, inverting the scaling measurement."""
    import time

    from pyspark.sql import SparkSession

    if n_images is None:
        n_images = N_IMAGES
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    os.environ.setdefault("PYTHONPATH", os.path.dirname(os.path.abspath(__file__)))

    # Size input splits to the run: ~4 scan tasks per core, clamped to
    # [32 MB, 1 GB].  The default 128 MB split on the 42 GB wide table
    # produced 384 map tasks of ~42k rows each — per-task partial
    # aggregates then carry nearly one row per input row (no map-side
    # compression at all) and the tile rollup exchange degenerates to a
    # full-data shuffle; measured at 4N this knob alone cut the z11
    # aggregate from 6.1 s to 1.7 s.  At 10^12 rows the equivalent is
    # sizing spark.sql.files.maxPartitionBytes so a map task covers
    # enough rows to saturate the distinct-tile cap.
    spark = (
        SparkSession.builder.master(f"local-cluster[{n_executors},{cores},{mem_mb}]")
        .appName("proj-spark-scaling")
        .config("spark.sql.shuffle.partitions", str(4 * n_executors * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", "8g")
        .config("spark.executor.memory", f"{mem_mb}m")
        .config(
            "spark.executor.extraJavaOptions",
            f"-XX:ParallelGCThreads={cores} -XX:CICompilerCount=2 "
            f"-XX:ActiveProcessorCount={cores}",
        )
        .config("spark.executorEnv.PYTHONPATH", os.path.dirname(os.path.abspath(__file__)))
        .config("spark.ui.enabled", "false")
        # single-box local-cluster: never trade a free slot for locality
        .config("spark.locality.wait", "0s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # fixture tables (untimed): ensure the run's layout exists before
    # timing (the 42 GB wide table is only materialized for the wide
    # regime — at 64M+ rows it no longer fits disk and the unclustered
    # point view is the wide-scan-equivalent fixture)
    if FLAGSHIP_TABLE == "wide":
        _image_table(spark, n_images)
        _pts_table(spark, n_images)
    elif FLAGSHIP_TABLE == "unclustered":
        _pts_uncl_table(spark, n_images)
    else:
        _pts_table(spark, n_images)

    # Size input splits to the run: ~4 scan tasks per core, clamped to
    # [32 MB, 1 GB].  The default 128 MB split on the 42 GB wide table
    # produced 384 map tasks of ~42k rows each — per-task partial
    # aggregates then carry nearly one row per input row (no map-side
    # compression) and the tile-rollup exchange degenerates to a
    # full-data shuffle; measured at 4N this knob alone cut the z11
    # aggregate from 6.1 s to 1.7 s.  At 10^12 rows the equivalent is
    # sizing maxPartitionBytes so one map task covers enough rows to
    # saturate the distinct-tile cap (map-side combine does the rest).
    src_dir = {
        "wide": _img_cache(n_images),
        "unclustered": _pts_uncl_cache(n_images),
    }.get(FLAGSHIP_TABLE, _pts_cache(n_images))
    try:
        tot = sum(
            os.path.getsize(os.path.join(src_dir, f))
            for f in os.listdir(src_dir)
            if f.endswith(".parquet")
        )
    except OSError:
        tot = 0
    split = min(max(tot // (4 * n_executors * cores) or (128 << 20), 32 << 20), 1 << 30)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(int(split)))
    # warm-up: python workers + codegen on every executor
    from pyspark.sql import functions as WF

    from proj_spark.functions.transform import transform as _wt

    warm = spark.range(50000, numPartitions=n_executors * cores).select(
        (WF.col("id") % 360 - 180.0).cast("double").alias("lon"),
        (WF.col("id") % 120 - 60.0).cast("double").alias("lat"),
    )
    _wt(warm, "+proj=latlong +datum=WGS84", "+proj=merc +datum=WGS84", "lon", "lat").agg(
        WF.sum("x")
    ).collect()
    _warm_map_in_pandas(spark, n_executors * cores)

    # narrow-stage measurement FIRST (unpolluted by the pipeline's
    # shuffle files / memory state): the datum-transform pass alone,
    # no shuffle.  On one box the full pipeline's shuffle stages
    # contend for shared disk/loopback/memory bandwidth, which a real
    # N->4N cluster scales along with the cores; the narrow stage is
    # the contention-free scaling signal.
    from proj_spark.functions.transform import transform as _t
    from proj_spark.operators.gridshift import make_synthetic_grid, register_grid

    register_grid("conus_syn", make_synthetic_grid())
    if FLAGSHIP_TABLE == "wide":
        imgs = _image_table(spark, n_images).select("image_id", "lon", "lat")
    elif FLAGSHIP_TABLE == "unclustered":
        imgs = _pts_uncl_table(spark, n_images).select("image_id", "lon", "lat")
    else:
        imgs = _pts_table(spark, n_images).select("image_id", "lon", "lat")
    shifted = _t(
        imgs,
        "+proj=latlong +ellps=clrk66 +nadgrids=conus_syn",
        "+proj=latlong +datum=WGS84",
        "lon",
        "lat",
    )
    from pyspark.sql import functions as NF

    shifted.limit(10000).agg(NF.sum("x")).collect()  # warm
    t0 = time.time()
    shifted.agg(NF.sum("x")).collect()
    dt_narrow = time.time() - t0

    t0 = time.time()
    n_rows, _ = _flagship(spark, n_images)
    dt = time.time() - t0
    spark.stop()
    return {
        "executors": n_executors,
        "cores_each": cores,
        "total_cores": n_executors * cores,
        "n_images": n_images,
        "wall_sec": round(dt, 3),
        "rows_per_sec": round(n_rows / dt, 1),
        "narrow_wall_sec": round(dt_narrow, 3),
        "narrow_rows_per_sec": round(n_rows / dt_narrow, 1),
    }


def run_compute_probe(n_executors: int, n_rows: int, cores: int = 4, mem_mb: int = 6144) -> dict:
    """Pure-compute scaling probe: the SAME datum-transform pandas UDF
    as the flagship's narrow stage, but over spark.range — no parquet
    scan, no shuffle, no disk.  Rows are synthesized in-executor, so
    the only shared resource is CPU + memory bandwidth of the UDF
    itself.  If this scales ~1.0 while the scan-fed narrow stage does
    not, the gap IS the single box's IO/memory-bandwidth ceiling (a
    per-node resource a real N->4N cluster multiplies), not the plan."""
    import time

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = (
        SparkSession.builder.master(f"local-cluster[{n_executors},{cores},{mem_mb}]")
        .appName("proj-spark-compute-probe")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"))
        .config("spark.driver.memory", "8g")
        .config("spark.executor.memory", f"{mem_mb}m")
        .config(
            "spark.executor.extraJavaOptions",
            f"-XX:ParallelGCThreads={cores} -XX:CICompilerCount=2 "
            f"-XX:ActiveProcessorCount={cores}",
        )
        .config("spark.executorEnv.PYTHONPATH", os.path.dirname(os.path.abspath(__file__)))
        .config("spark.ui.enabled", "false")
        .config("spark.locality.wait", "0s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from proj_spark.functions.transform import transform as _t
    from proj_spark.operators.gridshift import make_synthetic_grid, register_grid

    register_grid("conus_syn", make_synthetic_grid())

    def pipeline(n):
        base = spark.range(n, numPartitions=4 * n_executors * cores).select(
            (F.col("id") % 56 - 124.0 + (F.col("id") % 977) / 1000.0).alias("lon"),
            (F.col("id") % 26 + 25.0 + (F.col("id") % 991) / 1000.0).alias("lat"),
        )
        out = _t(
            base,
            "+proj=latlong +ellps=clrk66 +nadgrids=conus_syn",
            "+proj=latlong +datum=WGS84",
            "lon",
            "lat",
        )
        return out.agg(F.sum("x"), F.sum("y"))

    pipeline(50000).collect()  # warm python workers + codegen everywhere
    t0 = time.time()
    pipeline(n_rows).collect()
    dt = time.time() - t0
    spark.stop()
    return {
        "executors": n_executors,
        "total_cores": n_executors * cores,
        "n_rows": n_rows,
        "wall_sec": round(dt, 3),
        "rows_per_sec": round(n_rows / dt, 1),
    }


def run_shuffle_cluster(
    n_executors: int, n_docs: int, cores: int = 1, mem_mb: int = 6144
) -> dict:
    """Shuffle-bound scaling probe (round-3 verdict task 4): the
    minhash-LSH near-dup pair pipeline — tokenize -> 3-shingle
    (explode) -> algebraic min signatures (groupBy) -> banded bucket
    self-join -> distinct pairs — over a synthetic in-executor corpus.
    Unlike the (narrow) fused flagship of the criterion pair, every
    stage here exchanges data, so this measures how the WIDE plans
    scale N -> 4N under real netty shuffle.

    The corpus is generated from spark.range with pure expressions
    (no scan): ~40 tokens/doc from a 50k vocabulary, with every
    id%7==1 doc an exact clone of its predecessor so LSH buckets have
    real collisions to join."""
    import time

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = (
        SparkSession.builder.master(f"local-cluster[{n_executors},{cores},{mem_mb}]")
        .appName("proj-spark-shuffle-scaling")
        .config("spark.sql.shuffle.partitions", str(4 * n_executors * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.executor.memory", f"{mem_mb}m")
        .config(
            "spark.executor.extraJavaOptions",
            f"-XX:ParallelGCThreads={cores} -XX:CICompilerCount=2 "
            f"-XX:ActiveProcessorCount={cores}",
        )
        .config("spark.executorEnv.PYTHONPATH", os.path.dirname(os.path.abspath(__file__)))
        .config("spark.ui.enabled", "false")
        .config("spark.locality.wait", "0s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from proj_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
        shingle,
        tokenize,
    )

    def corpus(n):
        base = spark.range(n, numPartitions=4 * n_executors * cores)
        # id%7==1 docs clone their predecessor -> guaranteed LSH pairs
        return base.select(
            F.col("id").alias("doc_id"),
            F.expr(
                "array_join(transform(sequence(0, 39), j -> concat('t', "
                "pmod((id - (case when id % 7 = 1 then 1 else 0 end)) "
                "* (j + 7) + j * j, 50000))), ' ')"
            ).alias("text"),
        )

    def pipeline(n):
        sigs = minhash_signatures(
            shingle(tokenize(corpus(n)), w=3), id_col="doc_id", deterministic=False
        )
        return minhash_lsh_pairs(sigs).count()

    pipeline(2000)  # warm: python-free plan, but codegen + shuffle path
    t0 = time.time()
    n_pairs = pipeline(n_docs)
    dt = time.time() - t0
    spark.stop()
    return {
        "executors": n_executors,
        "cores_each": cores,
        "total_cores": n_executors * cores,
        "n_docs": n_docs,
        "n_pairs": int(n_pairs),
        "wall_sec": round(dt, 3),
        "docs_per_sec": round(n_docs / dt, 1),
    }


def run_warp_cluster(
    n_executors: int, side_px: int, cores: int = 1, mem_mb: int = 6144
) -> dict:
    """Raster-warp scaling probe (round 4): reproject a side_px²
    plate-carrée raster onto web-mercator tiles at N vs 4N one-core
    executors.  Fourth leg of the scaling evidence — a MIXED plan
    (broadcast candidate join + one bounded-group shuffle + fused
    Python kernel), the shape of the new raster operators
    (warp/chips/composite/pyramid).  Source staged once, untimed;
    both cluster sizes read the SAME parquet."""
    import time

    from pyspark.sql import SparkSession

    from proj_spark.operators.warp import LatLonGrid, lcg_tiles, warp_to_webmerc

    grid = LatLonGrid(
        lon0=-120.0, lat0=48.0, dlon=0.005, dlat=0.005,
        width=side_px, height=side_px, tile_px=64,
    )
    zoom = int(os.environ.get("SPARK_GRAFT_WARP_ZOOM", "0")) or (
        11 if side_px >= 8192 else 10
    )
    cache = f"/tmp/proj_spark_bench/warp_scale_{side_px}"
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        stage = (
            SparkSession.builder.master(f"local[{CPUS}]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        lcg_tiles(stage, grid, partitions=64).write.mode("overwrite").parquet(cache)
        stage.stop()

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = (
        SparkSession.builder.master(f"local-cluster[{n_executors},{cores},{mem_mb}]")
        .appName("proj-spark-warp-scaling")
        .config("spark.sql.shuffle.partitions", str(4 * n_executors * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.executor.memory", f"{mem_mb}m")
        .config(
            "spark.executor.extraJavaOptions",
            f"-XX:ParallelGCThreads={cores} -XX:CICompilerCount=2 "
            f"-XX:ActiveProcessorCount={cores}",
        )
        .config("spark.executorEnv.PYTHONPATH", os.path.dirname(os.path.abspath(__file__)))
        .config("spark.ui.enabled", "false")
        .config("spark.locality.wait", "0s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tiles = spark.read.parquet(cache)

    warp_to_webmerc(spark, tiles, grid, zoom=zoom, out_px=64).count()  # warm
    t0 = time.time()
    n_out = warp_to_webmerc(spark, tiles, grid, zoom=zoom, out_px=64).count()
    dt = time.time() - t0
    spark.stop()
    return {
        "executors": n_executors,
        "cores_each": cores,
        "total_cores": n_executors * cores,
        "source_px": side_px * side_px,
        "out_tiles": int(n_out),
        "out_px": int(n_out) * 4096,
        "wall_sec": round(dt, 3),
        "out_px_per_sec": round(n_out * 4096 / dt, 1),
    }


def _payload_cache(n_images: int) -> str:
    return f"/tmp/proj_spark_bench/payload_scale_{n_images}"


def run_payload_cluster(
    n_executors: int, n_images: int, cores: int = 1, mem_mb: int = 6144
) -> dict:
    """Decode-bound scaling probe: the metric's PSNR>=40 payload gate
    (decode every PNG/JPEG + pixel allclose + caption equality) at N
    vs 4N one-core executors.  Third leg of the scaling triad — the
    criterion pair is the narrow JVM+numpy flagship, the shuffle probe
    is the wide exchange plan, and this one is pure Python-worker
    compute (sources/jpeg.py + png.py), the regime a 10^12-image
    ingest spends most of its cycles in.  Input staged once, untimed,
    by an ordinary local session; both cluster sizes read the SAME
    parquet."""
    import time

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from proj_spark.sources.images import generate_images, verify_payloads

    cache = _payload_cache(n_images)
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        stage = (
            SparkSession.builder.master(f"local[{CPUS}]")
            .config("spark.driver.memory", "16g")
            .config("spark.ui.enabled", "false")
            .appName("payload-scaling-stage")
            .getOrCreate()
        )
        stage.sparkContext.setLogLevel("ERROR")
        # constant images/file across fixture sizes, so per-task load
        # (and per-task overhead share) is identical at every scale —
        # required for weak-scaling pairs to compare like with like
        parts = max(4, n_images // 64)
        generate_images(stage, n_images, partitions=parts).write.mode(
            "overwrite"
        ).parquet(cache)
        stage.stop()

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = (
        SparkSession.builder.master(f"local-cluster[{n_executors},{cores},{mem_mb}]")
        .appName("proj-spark-payload-scaling")
        .config("spark.sql.shuffle.partitions", str(4 * n_executors * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.executor.memory", f"{mem_mb}m")
        .config(
            "spark.executor.extraJavaOptions",
            f"-XX:ParallelGCThreads={cores} -XX:CICompilerCount=2 "
            f"-XX:ActiveProcessorCount={cores}",
        )
        .config("spark.executorEnv.PYTHONPATH", os.path.dirname(os.path.abspath(__file__)))
        .config("spark.ui.enabled", "false")
        .config("spark.locality.wait", "0s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # split sizing: >= 4 decode tasks per core so every slot stays busy
    try:
        tot = sum(
            os.path.getsize(os.path.join(cache, f))
            for f in os.listdir(cache)
            if f.endswith(".parquet")
        )
    except OSError:
        tot = 0
    split = min(max(tot // (4 * n_executors * cores) or (128 << 20), 1 << 20), 1 << 30)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(int(split)))

    stored = spark.read.parquet(cache)

    def gate(df) -> int:
        return int(
            verify_payloads(df)
            .agg(F.sum(F.when(F.col("caption_ok") & F.col("pixels_ok"), 1).otherwise(0)))
            .collect()[0][0]
        )

    # steady-state: a limit()-based warm executes on ONE task, leaving
    # the other executors' python workers to pay numpy/codec import
    # inside the timed run (~1-2 s each, 10%+ of the 4N wall).  One
    # untimed full pass warms every slot; the second pass is measured.
    gate(stored)
    t0 = time.time()
    n_ok = gate(stored)
    dt = time.time() - t0
    spark.stop()
    return {
        "executors": n_executors,
        "cores_each": cores,
        "total_cores": n_executors * cores,
        "n_images": n_images,
        "n_verified_ok": n_ok,
        "wall_sec": round(dt, 3),
        "images_per_sec": round(n_images / dt, 1),
    }


def run_skew_demo(n_rows: int, cpus: int = CPUS) -> dict:
    """Hot-cell skew mitigation, measured (north rule: 'explicit
    salted-broadcast handling of hot-cell skew').  The synthetic
    centroid law puts 20% of all rows inside one ±0.005° window (the
    urban-cell shape: one z15 cell holding 10^8 of 10^12 images), so a
    join partitioned by cell id sends 20% of the table to ONE task.

    Three physical strategies over the IDENTICAL logical join
    (points ⨝ per-cell dim on z8 cell id, then a scalar aggregate),
    with broadcast disabled (at 10^12 scale a per-cell dim at z15+ is
    tens of GB — sort-merge is forced, which is exactly when skew
    bites):

      naive   — AQE skew-split off: the hot partition is one straggler
      salted  — operators/skew.salted_broadcast_join (explicit salt,
                n_salts=32): the hot cell spreads across 32 tasks; the
                strategy that also works where AQE cannot see skew
                (stream-static joins, non-shuffle operators)
      aqe     — spark.sql.adaptive.skewJoin with thresholds sized to
                the demo (256 MB defaults target real clusters): the
                runtime re-plan splits the oversized partition

    All three must agree on the aggregate (asserted)."""
    import time

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from proj_spark.functions import expressions as E
    from proj_spark.operators.skew import salted_broadcast_join

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("proj-spark-skew-demo")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    big = _pts_uncl_table(spark, n_rows).withColumn(
        "cell", E.cell_id("lon", "lat", 8)
    )
    # per-cell dim (staged untimed): deterministic weight per cell
    dim_path = f"/tmp/proj_spark_bench/skew_dim_{n_rows}"
    if not os.path.exists(os.path.join(dim_path, "_SUCCESS")):
        big.select("cell").distinct().withColumn(
            "weight", F.pmod(F.xxhash64("cell"), F.lit(1000)).cast("double")
        ).write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path)

    def scalar(joined) -> float:
        return float(
            joined.agg(F.sum(F.col("weight") + F.col("lat"))).collect()[0][0]
        )

    def timed(tag: str, make) -> tuple[float, float]:
        scalar(make())  # steady state: first pass warms workers + JIT
        t0 = time.time()
        v = scalar(make())
        return round(time.time() - t0, 3), v

    # naive sort-merge, no skew split
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    naive_s, v_naive = timed("naive", lambda: big.join(dim, "cell"))

    # explicit salt (skew split still off — the salt is the mitigation)
    salted_s, v_salted = timed(
        "salted", lambda: salted_broadcast_join(big, dim, on="cell", n_salts=32)
    )

    # AQE skew join, thresholds sized to the demo's ~100 MB hot block
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    aqe_s, v_aqe = timed("aqe", lambda: big.join(dim, "cell"))

    assert abs(v_naive - v_salted) < 1e-6 * max(1.0, abs(v_naive)), (v_naive, v_salted)
    assert abs(v_naive - v_aqe) < 1e-6 * max(1.0, abs(v_naive)), (v_naive, v_aqe)

    # the scale-relevant numbers: reduce-side partition imbalance.  On
    # a 32-core box the wall hides a straggler behind scan parallelism;
    # on 1000 executors the stage wall IS the max task.  max/avg rows
    # hitting one reducer, per strategy (salting divides the hot cell's
    # rows by n_salts; AQE splits the oversized partition at runtime):
    from proj_spark.operators.skew import salt_column

    per_cell = big.groupBy("cell").count()
    stats = per_cell.agg(
        F.max("count").alias("mx"), F.avg("count").alias("avg")
    ).collect()[0]
    salted_mx = (
        big.withColumn("_salt", salt_column(32, *big.columns))
        .groupBy("cell", "_salt")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    spark.stop()
    return {
        "metric": "hot-cell skewed join (20% of rows in one cell), wall sec",
        "n_rows": n_rows,
        "cpus": cpus,
        "naive_sort_merge_sec": naive_s,
        "salted_broadcast_join_sec": salted_s,
        "aqe_skew_join_sec": aqe_s,
        "salted_speedup": round(naive_s / salted_s, 2),
        "aqe_speedup": round(naive_s / aqe_s, 2),
        "max_rows_one_reducer_naive": int(stats.mx),
        "avg_rows_per_cell": round(float(stats.avg), 1),
        "max_rows_one_reducer_salted": int(salted_mx),
        "hot_cell_imbalance": round(float(stats.mx) / float(stats.avg), 1),
    }


def main():
    scaling = os.environ.get("SPARK_GRAFT_SCALING")
    if scaling == "skew":
        n_rows = int(os.environ.get("SPARK_GRAFT_SKEW_ROWS", "32000000"))
        print(json.dumps(run_skew_demo(n_rows)))
        return
    if scaling == "shuffle":
        n_lo = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
        n_docs = int(os.environ.get("SPARK_GRAFT_SHUFFLE_DOCS", "1000000"))
        cores = int(os.environ.get("SPARK_GRAFT_SCALE_CORES", "1"))
        lo = run_shuffle_cluster(n_lo, n_docs, cores=cores)
        hi = run_shuffle_cluster(4 * n_lo, n_docs, cores=cores)
        ratio = hi["total_cores"] / lo["total_cores"]
        print(
            json.dumps(
                {
                    "metric": "minhash-LSH near-dup pairs docs/sec at N vs 4N executors (shuffle-bound wide plan, local-cluster)",
                    "n_executors": lo,
                    "4n_executors": hi,
                    "scaling_efficiency": round(
                        (hi["docs_per_sec"] / lo["docs_per_sec"]) / ratio, 3
                    ),
                }
            )
        )
        return
    if scaling == "payload":
        n_lo = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
        # pure-python decode runs ~110 images/s/core on this box: 8000
        # images puts the N=1 leg at ~70 s wall (same measurement scale
        # as the flagship criterion pair)
        n_images = int(os.environ.get("SPARK_GRAFT_PAYLOAD_IMAGES", "8000"))
        cores = int(os.environ.get("SPARK_GRAFT_SCALE_CORES", "1"))
        lo = run_payload_cluster(n_lo, n_images, cores=cores)
        hi = run_payload_cluster(4 * n_lo, n_images, cores=cores)
        ratio = hi["total_cores"] / lo["total_cores"]
        print(
            json.dumps(
                {
                    "metric": (
                        "payload decode+PSNR-gate images/sec at N vs 4N executors "
                        "(Python-decode-bound plan, local-cluster)"
                    ),
                    "n_executors": lo,
                    "4n_executors": hi,
                    "scaling_efficiency": round(
                        (hi["images_per_sec"] / lo["images_per_sec"]) / ratio, 3
                    ),
                }
            )
        )
        return
    if scaling == "warp":
        n_lo = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
        side = int(os.environ.get("SPARK_GRAFT_WARP_SIDE", "8192"))
        cores = int(os.environ.get("SPARK_GRAFT_SCALE_CORES", "1"))
        # weak-scaling form: 4x the source pixels with 4x the executors
        # at the SAME zoom (constant per-executor load, the faithful
        # 100 TB model); strong form (default): same input both sizes
        weak = os.environ.get("SPARK_GRAFT_WARP_WEAK") == "1"
        hi_side = 2 * side if weak else side
        lo = run_warp_cluster(n_lo, side, cores=cores)
        hi = run_warp_cluster(4 * n_lo, hi_side, cores=cores)
        ratio = hi["total_cores"] / lo["total_cores"]
        print(
            json.dumps(
                {
                    "metric": (
                        "raster-warp output px/sec at N vs 4N executors "
                        "(mixed broadcast-join + bounded-group-shuffle + "
                        "fused Python kernel, local-cluster)"
                    ),
                    "n_executors": lo,
                    "4n_executors": hi,
                    "scaling_efficiency": round(
                        (hi["out_px_per_sec"] / lo["out_px_per_sec"]) / ratio, 3
                    ),
                    "form": "weak (4x source px, fixed zoom)" if weak else "strong (fixed input)",
                }
            )
        )
        return
    if scaling == "compute":
        n_lo = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
        n_rows = int(os.environ.get("SPARK_GRAFT_PROBE_ROWS", str(N_IMAGES)))
        lo = run_compute_probe(n_lo, n_rows)
        hi = run_compute_probe(4 * n_lo, n_rows)
        ratio = hi["total_cores"] / lo["total_cores"]
        print(
            json.dumps(
                {
                    "metric": "pure-compute probe rows/sec at N vs 4N executors (no scan, no shuffle)",
                    "n_executors": lo,
                    "4n_executors": hi,
                    "scaling_efficiency": round(
                        (hi["rows_per_sec"] / lo["rows_per_sec"]) / ratio, 3
                    ),
                }
            )
        )
        return
    sweep = os.environ.get("SPARK_GRAFT_SCALE_SWEEP")
    if scaling == "cluster" and sweep:
        # N-sweep: run every executor count and report the full
        # efficiency-vs-size curve (the evidence the single-pair ratio
        # cannot give: where the one-box bandwidth ceiling bites)
        ns = [int(x) for x in sweep.split(",")]
        cores = int(os.environ.get("SPARK_GRAFT_SCALE_CORES", "4"))
        runs = [run_flagship_cluster(n, cores=cores) for n in ns]
        base = runs[0]
        curve = []
        for r in runs:
            ratio = r["total_cores"] / base["total_cores"]
            curve.append(
                {
                    **r,
                    "speedup_vs_n1": round(r["rows_per_sec"] / base["rows_per_sec"], 3),
                    "efficiency_vs_n1": round(
                        (r["rows_per_sec"] / base["rows_per_sec"]) / ratio, 3
                    ),
                    "narrow_efficiency_vs_n1": round(
                        (r["narrow_rows_per_sec"] / base["narrow_rows_per_sec"]) / ratio, 3
                    ),
                }
            )
        print(
            json.dumps(
                {
                    "metric": "flagship rows/sec sweep over executor counts (local-cluster)",
                    "table": FLAGSHIP_TABLE,
                    "n_images": N_IMAGES,
                    "sweep": curve,
                }
            )
        )
        return
    if scaling == "cluster":
        n_lo = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
        # SPARK_GRAFT_SCALE_MODE=weak: constant per-executor load — N
        # executors on n/4 rows vs 4N executors on n rows.  This is the
        # faithful sandbox model of the 100 TB question ("same job, 4x
        # the data, 4x the executors"): a 10^12-row job never strong-
        # scales a fixed toy input until fixed costs dominate; each
        # executor keeps the same slice.  Efficiency formula is shared
        # with the strong pair because rows_per_sec normalizes n.
        mode = os.environ.get("SPARK_GRAFT_SCALE_MODE", "strong")
        lo_images = N_IMAGES // 4 if mode == "weak" else N_IMAGES
        cores = int(os.environ.get("SPARK_GRAFT_SCALE_CORES", "4"))
        lo = run_flagship_cluster(n_lo, cores=cores, n_images=lo_images)
        hi = run_flagship_cluster(4 * n_lo, cores=cores, n_images=N_IMAGES)
        ratio = hi["total_cores"] / lo["total_cores"]
        eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / ratio
        eff_narrow = (hi["narrow_rows_per_sec"] / lo["narrow_rows_per_sec"]) / ratio
        print(
            json.dumps(
                {
                    "metric": (
                        "flagship rows/sec at N vs 4N executors (local-cluster, "
                        + ("weak scaling: rows grow with executors)" if mode == "weak" else "strong scaling: fixed input)")
                    ),
                    "value": hi["wall_sec"],
                    "unit": "sec",
                    "sf": SF_DIR.rstrip("/").split("sf")[-1],
                    "n_executors": lo,
                    "4n_executors": hi,
                    "scaling_efficiency": round(eff, 3),
                    "scaling_efficiency_narrow_stage": round(eff_narrow, 3),
                }
            )
        )
        return
    if scaling:
        levels = [int(x) for x in scaling.split(",")]
        runs = {c: run_benchmarks(c) for c in levels}
        lo, hi = min(levels), max(levels)
        tp = {c: runs[c]["rows_per_sec"] for c in levels}
        eff = (tp[hi] / tp[lo]) / (hi / lo)
        out = runs[hi]
        out["scaling"] = {
            "levels": levels,
            "rows_per_sec": tp,
            "efficiency": round(eff, 3),
        }
        print(json.dumps(out))
        return
    print(json.dumps(run_benchmarks()))


if __name__ == "__main__":
    main()
