"""Verdict r2 task: confirm the hierarchical multi-zoom tile rollup's
sf0.1 regression (1.29s -> 1.54s vs the round-1 cached-union plan) is
toy-scale fixed overhead, not a plan defect.

Runs BOTH plans over the same synthetic point table at sf1-equivalent
scale (10x the sf0.1 events table) and prints one JSON line with both
wall times.  The cached-union plan is the round-1 form: persist the
projected points, then one groupBy per zoom, unioned.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(os.environ.get("MZ_ROWS", "20000000"))
ZOOMS = [4, 8, 11]
CACHE = f"/tmp/proj_spark_bench/mz_points_{N_ROWS}"


def main():
    from pyspark.sql import functions as F

    from proj_spark.operators.tiles import tile_counts
    from proj_spark.session import build_session

    spark = build_session("mz-sf1", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(CACHE, "_SUCCESS")):
        pts = spark.range(N_ROWS, numPartitions=128).select(
            ((F.col("id") * 2654435761) % 3600000 / 10000.0 - 180.0).alias("lon"),
            ((F.col("id") * 2246822519) % 1500000 / 10000.0 - 75.0).alias("lat"),
        )
        pts.write.mode("overwrite").parquet(CACHE)
    pts = spark.read.parquet(CACHE)

    # warm-up
    pts.limit(100000).groupBy((F.col("lon") > 0).alias("g")).count().collect()

    def run_hierarchical():
        return tile_counts(pts, ZOOMS).count()

    def run_cached_union(materialize_cache: bool):
        # round-1 plan: cache input, one full groupBy per zoom, union
        from proj_spark.functions import expressions as E

        src = pts.persist()
        if materialize_cache:
            src.count()
        parts = []
        for z in ZOOMS:
            parts.append(
                src.select(
                    F.lit(z).cast("int").alias("zoom"),
                    E.tile_x("lon", F.lit(z)).alias("tile_x"),
                    E.tile_y("lat", F.lit(z)).alias("tile_y"),
                )
                .groupBy("zoom", "tile_x", "tile_y")
                .agg(F.count(F.lit(1)).alias("n"))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        n = out.count()
        src.unpersist()
        return n

    results = {}
    for name, fn in [
        ("hierarchical", run_hierarchical),
        ("cached_union", lambda: run_cached_union(True)),
        ("hierarchical_2", run_hierarchical),
        ("cached_union_2", lambda: run_cached_union(True)),
    ]:
        t0 = time.time()
        n = fn()
        results[name] = {"sec": round(time.time() - t0, 3), "rows": n}

    print(
        json.dumps(
            {
                "metric": "multi-zoom tile rollup: hierarchical vs round-1 cached-union",
                "n_rows": N_ROWS,
                "zooms": ZOOMS,
                "results": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
