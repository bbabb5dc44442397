"""VERDICT r2 item 7: is the tile_multizoom hierarchical plan's sf0.1
regression (1.29 s -> 1.54 s vs the round-1 explode/union form) a
fixed-overhead artifact that vanishes at scale?

Runs BOTH rollup forms over the SAME large synthetic point table
(the bench image-point fixture, default 16M rows) and prints wall
times.  The round-1 form: explode the zoom array over the full input,
one groupBy over rows x |zooms|.  The hierarchical form: aggregate at
the finest zoom once, quadtree-roll the small aggregate.

Usage: python tools/exp_multizoom.py [n_rows] [repeats]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16000000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CACHE = f"/tmp/proj_spark_bench/images_{N}_pts_c1"
CACHE_U = f"/tmp/proj_spark_bench/images_{N}_pts_u"
ZOOMS = [4, 8, 11]


def main():
    from pyspark.sql import functions as F

    from proj_spark.functions import expressions as E
    from proj_spark.operators.tiles import tile_counts
    from proj_spark.session import build_session

    spark = build_session("exp-multizoom", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    src = CACHE if os.path.exists(os.path.join(CACHE, "_SUCCESS")) else CACHE_U
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        from proj_spark.sources.images import generate_points

        generate_points(spark, N, partitions=128).write.mode("overwrite").parquet(
            CACHE_U
        )
        src = CACHE_U
    pts = spark.read.parquet(src).select("lon", "lat")

    def round1_union(df):
        # round-1 shape: explode zooms over the FULL input, single
        # groupBy over rows x |zooms|
        zoom = F.explode(F.array(*[F.lit(int(z)) for z in ZOOMS])).alias("zoom")
        return (
            df.select("lon", "lat", zoom)
            .groupBy(
                "zoom",
                E.tile_x("lon", F.col("zoom")).alias("tile_x"),
                E.tile_y("lat", F.col("zoom")).alias("tile_y"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )

    # warm
    pts.limit(100000).agg(F.sum("lon")).collect()
    out = {"n_rows": N, "zooms": ZOOMS, "src": src, "runs": []}
    for i in range(REPS):
        t0 = time.time()
        n_h = tile_counts(pts, ZOOMS).count()
        t_h = time.time() - t0
        t0 = time.time()
        n_u = round1_union(pts).count()
        t_u = time.time() - t0
        assert n_h == n_u, (n_h, n_u)
        out["runs"].append(
            {"hierarchical_sec": round(t_h, 3), "explode_sec": round(t_u, 3)}
        )
    hs = sorted(r["hierarchical_sec"] for r in out["runs"])
    us = sorted(r["explode_sec"] for r in out["runs"])
    out["median_hierarchical_sec"] = hs[len(hs) // 2]
    out["median_explode_sec"] = us[len(us) // 2]
    out["hierarchical_speedup"] = round(
        out["median_explode_sec"] / out["median_hierarchical_sec"], 3
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
