"""Locate the fused flagship's in-Spark overhead at N=1 executors:
scan-only vs Arrow-transfer-only vs full kernel (tools-only probe)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

N_EXEC = int(os.environ.get("PROF_EXECUTORS", "1"))
N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "16000000"))
TABLE = os.environ.get("SPARK_GRAFT_FLAGSHIP_TABLE", "wide")


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    cores = int(os.environ.get("PROF_CORES", "4"))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("PYTHONPATH", root)
    spark = (
        SparkSession.builder.master(f"local-cluster[{N_EXEC},{cores},6144]")
        .appName("profile-fused")
        .config("spark.sql.shuffle.partitions", str(4 * N_EXEC * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"))
        .config("spark.driver.memory", "8g")
        .config("spark.executor.memory", "6144m")
        .config(
            "spark.executor.extraJavaOptions",
            f"-XX:ParallelGCThreads={cores} -XX:CICompilerCount=2 "
            f"-XX:ActiveProcessorCount={cores}",
        )
        .config("spark.executorEnv.PYTHONPATH", root)
        .config("spark.ui.enabled", "false")
        .config("spark.locality.wait", "0s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if TABLE == "wide":
        imgs = bench._image_table(spark, N_IMAGES)
        src_dir = bench._img_cache(N_IMAGES)
    else:
        imgs = bench._pts_uncl_table(spark, N_IMAGES)
        src_dir = bench._pts_uncl_cache(N_IMAGES)
    tot = sum(
        os.path.getsize(os.path.join(src_dir, f))
        for f in os.listdir(src_dir)
        if f.endswith(".parquet")
    )
    split = min(max(tot // (4 * N_EXEC * cores) or (128 << 20), 32 << 20), 1 << 30)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(int(split)))

    # warm python workers
    import pandas as pd

    def _noop(batches):
        n = 0
        for b in batches:
            n += len(b)
        yield pd.DataFrame({"n": [n]})

    spark.range(100000, numPartitions=N_EXEC * cores).select(
        F.rand().alias("lon"), F.rand().alias("lat")
    ).mapInPandas(_noop, "n long").agg(F.sum("n")).collect()

    def t(name, df):
        t0 = time.time()
        df.collect()
        dt = time.time() - t0
        print(f"{name:28s} {dt:7.3f}s  {N_IMAGES/dt/1e6:6.2f} M rows/s")

    pts2 = imgs.select("lon", "lat")
    t("scan+sum (no python)", pts2.agg(F.sum("lon")))
    t("scan+sum (again)", pts2.agg(F.sum("lon")))
    t("mapInPandas noop count", pts2.mapInPandas(_noop, "n long").agg(F.sum("n")))

    from __spark_entry__ import _fixture_polygons
    from proj_spark.operators.fused import reproject_pip_tile_rollup
    from proj_spark.operators.gridshift import make_synthetic_grid, register_grid

    register_grid("conus_syn", make_synthetic_grid())
    out = reproject_pip_tile_rollup(
        imgs,
        "+proj=latlong +ellps=clrk66 +nadgrids=conus_syn",
        "+proj=latlong +datum=WGS84",
        _fixture_polygons(),
        zoom=11,
    )
    t("fused rollup", out)
    t("fused rollup (again)", out)
    spark.stop()


if __name__ == "__main__":
    main()
