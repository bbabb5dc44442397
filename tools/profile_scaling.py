"""Stage-by-stage scaling profile of the flagship pipeline on
local-cluster[N,4,6144] — which component fails to scale N->4N?

Usage: python tools/profile_scaling.py [n_executors ...]
Prints one JSON line per N with per-stage wall times.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "16000000"))
IMG_CACHE = f"/tmp/proj_spark_bench/images_{N_IMAGES}"


def build(n_executors: int, cores: int = 4, mem_mb: int = 6144):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    b = (
        SparkSession.builder.master(f"local-cluster[{n_executors},{cores},{mem_mb}]")
        .appName("profile-scaling")
        .config("spark.sql.shuffle.partitions", str(4 * n_executors * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", "8g")
        .config("spark.executor.memory", f"{mem_mb}m")
        .config(
            "spark.executor.extraJavaOptions",
            f"-XX:ParallelGCThreads={cores} -XX:CICompilerCount=2 "
            f"-XX:ActiveProcessorCount={cores}",
        )
        .config("spark.executorEnv.PYTHONPATH", root)
        .config("spark.ui.enabled", "false")
        .config("spark.locality.wait", "0s")
    )
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def profile(n_executors: int) -> dict:
    from pyspark.sql import functions as F

    from __spark_entry__ import _fixture_polygons
    from proj_spark.functions import expressions as E
    from proj_spark.functions.transform import transform
    from proj_spark.operators.gridshift import make_synthetic_grid, register_grid
    from proj_spark.operators.spatial_join import point_in_polygon_join
    from proj_spark.operators.tiles import tile_counts

    spark = build(n_executors)
    imgs = spark.read.parquet(IMG_CACHE)
    register_grid("conus_syn", make_synthetic_grid())

    def shifted_pts():
        sh = transform(
            imgs.select("image_id", "phash", "lon", "lat"),
            "+proj=latlong +ellps=clrk66 +nadgrids=conus_syn",
            "+proj=latlong +datum=WGS84",
            "lon",
            "lat",
        )
        return sh.select(
            "image_id", "phash", F.col("x").alias("lon"), F.col("y").alias("lat")
        )

    t: dict[str, float] = {}

    # warm-up
    warm = spark.range(50000, numPartitions=n_executors * 4).select(
        (F.col("id") % 360 - 180.0).cast("double").alias("lon"),
        (F.col("id") % 120 - 60.0).cast("double").alias("lat"),
    )
    transform(warm, "+proj=latlong +datum=WGS84", "+proj=merc +datum=WGS84", "lon", "lat").agg(
        F.sum("x")
    ).collect()

    def timeit(name, fn):
        t0 = time.time()
        fn()
        t[name] = round(time.time() - t0, 3)

    # raw scan
    timeit("scan_count", lambda: imgs.select("lon", "lat").agg(F.sum("lon")).collect())
    # narrow transform
    timeit("narrow_transform", lambda: shifted_pts().agg(F.sum("lon")).collect())
    # PIP only (includes one transform pass)
    polys = _fixture_polygons()
    pdf = spark.createDataFrame(
        [
            {"poly_id": pid, "ring": [{"lon": x, "lat": y} for x, y in ring], "poly_seq": i}
            for i, (pid, ring) in enumerate(polys)
        ]
    )

    def run_pip():
        j = point_in_polygon_join(
            shifted_pts(), pdf, res=9, lon="lon", lat="lat",
            point_id="image_id", how="first_match",
        )
        j.groupBy("poly_id").agg(F.count(F.lit(1)).alias("n")).count()

    timeit("pip_with_transform", run_pip)

    # tiles only (includes one transform pass)
    def run_tiles():
        tile_counts(shifted_pts(), [4, 8, 11], "lon", "lat").agg(
            F.count(F.lit(1))
        ).collect()

    timeit("tiles_with_transform", run_tiles)

    # tile partial-agg WITHOUT transform (isolate shuffle from UDF)
    def run_tiles_raw():
        tile_counts(imgs.select("lon", "lat"), [4, 8, 11], "lon", "lat").agg(
            F.count(F.lit(1))
        ).collect()

    timeit("tiles_no_transform", run_tiles_raw)

    # pure z11 groupBy count without rollup
    def run_z11():
        key = E.tile_key(
            E.tile_x("lon", F.lit(11)), E.tile_y("lat", F.lit(11)), F.lit(11)
        )
        imgs.select(key.alias("k")).groupBy("k").count().agg(F.count(F.lit(1))).collect()

    timeit("z11_groupby_raw", run_z11)

    spark.stop()
    return {"n_executors": n_executors, "total_cores": 4 * n_executors, "stages": t}


def main():
    ns = [int(a) for a in sys.argv[1:]] or [1, 4]
    out = [profile(n) for n in ns]
    for o in out:
        print(json.dumps(o))
    if len(out) >= 2:
        lo, hi = out[0], out[-1]
        ratio = hi["total_cores"] / lo["total_cores"]
        eff = {
            k: round((lo["stages"][k] / hi["stages"][k]) / ratio, 3)
            for k in lo["stages"]
        }
        print(json.dumps({"efficiency": eff}))


if __name__ == "__main__":
    main()
