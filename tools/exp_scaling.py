"""Knob experiments for the non-scaling stages (scan, z11 agg) at a
given executor count.  Usage:
  python tools/exp_scaling.py <n_executors> [key=val;key=val...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "16000000"))
IMG_CACHE = f"/tmp/proj_spark_bench/images_{N_IMAGES}"


def main():
    n = int(sys.argv[1])
    extra = sys.argv[2] if len(sys.argv) > 2 else ""
    os.environ["SPARK_GRAFT_EXTRA_CONF"] = extra
    from tools.profile_scaling import build

    from pyspark.sql import functions as F

    from proj_spark.functions import expressions as E

    spark = build(n)
    imgs = spark.read.parquet(IMG_CACHE)
    t = {}

    def timeit(name, fn, reps=2):
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        t[name] = round(best, 3)

    sel = imgs.select("lon", "lat")
    print("input splits:", sel.rdd.getNumPartitions(), file=sys.stderr)
    timeit("scan_sum", lambda: sel.agg(F.sum("lon")).collect())
    key = E.tile_key(E.tile_x("lon", F.lit(11)), E.tile_y("lat", F.lit(11)), F.lit(11))
    timeit(
        "z11_groupby",
        lambda: imgs.select(key.alias("k")).groupBy("k").count().agg(F.count(F.lit(1))).collect(),
    )
    print(json.dumps({"n": n, "conf": extra, "stages": t}))
    spark.stop()


if __name__ == "__main__":
    main()
