"""Break the flagship's wall time into phases on a local-cluster
config, to locate parallelism-independent overhead (tools-only probe,
not part of the bench contract)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

N_EXEC = int(os.environ.get("PROF_EXECUTORS", "1"))
N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "16000000"))


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from __spark_entry__ import _fixture_polygons
    from proj_spark.functions import expressions as CE
    from proj_spark.functions.transform import transform
    from proj_spark.operators.gridshift import make_synthetic_grid, register_grid
    from proj_spark.operators.spatial_join import point_in_polygon_join

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    cores = 4
    os.environ.setdefault("PYTHONPATH", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    spark = (
        SparkSession.builder.master(f"local-cluster[{N_EXEC},{cores},6144]")
        .appName("profile-flagship")
        .config("spark.sql.shuffle.partitions", str(4 * N_EXEC * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", "8g")
        .config("spark.executor.memory", "6144m")
        .config(
            "spark.executor.extraJavaOptions",
            f"-XX:ParallelGCThreads={cores} -XX:CICompilerCount=2 "
            f"-XX:ActiveProcessorCount={cores}",
        )
        .config("spark.executorEnv.PYTHONPATH", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        .config("spark.ui.enabled", "false")
        .config("spark.locality.wait", "0s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    imgs = bench._image_table(spark, N_IMAGES)
    src_dir = bench._img_cache(N_IMAGES)
    tot = sum(
        os.path.getsize(os.path.join(src_dir, f))
        for f in os.listdir(src_dir)
        if f.endswith(".parquet")
    )
    split = min(max(tot // (4 * N_EXEC * cores) or (128 << 20), 32 << 20), 1 << 30)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(int(split)))

    # warm-up
    from proj_spark.functions.transform import transform as _wt

    warm = spark.range(50000, numPartitions=N_EXEC * cores).select(
        (F.col("id") % 360 - 180.0).cast("double").alias("lon"),
        (F.col("id") % 120 - 60.0).cast("double").alias("lat"),
    )
    _wt(warm, "+proj=latlong +datum=WGS84", "+proj=merc +datum=WGS84", "lon", "lat").agg(
        F.sum("x")
    ).collect()

    marks = {}
    t_all = time.time()

    t0 = time.time()
    register_grid("conus_syn", make_synthetic_grid())
    shifted = transform(
        imgs.select("image_id", "phash", "lon", "lat"),
        "+proj=latlong +ellps=clrk66 +nadgrids=conus_syn",
        "+proj=latlong +datum=WGS84",
        "lon",
        "lat",
    )
    pts = shifted.select(
        "image_id", "phash", F.col("x").alias("lon"), F.col("y").alias("lat")
    )
    marks["build_transform_plan"] = time.time() - t0

    t0 = time.time()
    polys = _fixture_polygons()
    pdf = spark.createDataFrame(
        [
            {"poly_id": pid, "ring": [{"lon": x, "lat": y} for x, y in ring], "poly_seq": i}
            for i, (pid, ring) in enumerate(polys)
        ]
    )
    marks["polygon_fixture_df"] = time.time() - t0

    t0 = time.time()
    assigned = point_in_polygon_join(
        pts, pdf, res=9, lon="lon", lat="lat", point_id="image_id", how="left_first"
    )
    marks["pip_plan_build"] = time.time() - t0

    t0 = time.time()
    small = (
        assigned.select(
            CE.tile_x("lon", F.lit(11)).alias("tx"),
            CE.tile_y("lat", F.lit(11)).alias("ty"),
            "poly_seq",
        )
        .groupBy("tx", "ty", "poly_seq")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    small.count()
    marks["big_agg_action"] = time.time() - t0

    t0 = time.time()
    stats = small.agg(
        F.countDistinct(F.struct("tx", "ty")).alias("t11"),
        F.countDistinct(F.struct(F.shiftright("tx", 3), F.shiftright("ty", 3))).alias("t8"),
        F.countDistinct(F.struct(F.shiftright("tx", 7), F.shiftright("ty", 7))).alias("t4"),
        F.countDistinct("poly_seq").alias("n_polys"),
    ).collect()[0]
    small.unpersist()
    marks["countdistinct_action"] = time.time() - t0

    marks["TOTAL"] = time.time() - t_all
    for k, v in marks.items():
        print(f"{k:28s} {v:8.3f}s")
    print("rows/s:", round(N_IMAGES / marks["TOTAL"], 1))
    spark.stop()


if __name__ == "__main__":
    main()
