"""spark-submit job for the N vs 4N scaling criterion.

Runs the flagship pipeline (datum reprojection -> PIP -> multi-zoom
tile rollup, the fused kernel) on whatever cluster the surrounding
``spark-submit`` invocation provides, and writes one JSON result file.
The north rule asks for the job to be "run via spark-submit --py-files
on a multi-executor cluster at two cluster sizes"; this file is that
job, and ``tools/submit_scaling.py`` is the harness that launches it
at N and 4N one-core executors (see BENCH_SCALING.json methodology:
pairs wider than ~4 total cores on this box measure shared DRAM, not
the plan).

Ships alongside ``dist/proj_spark.zip`` via
``--py-files proj_spark.zip,bench.py,__spark_entry__.py`` — the job
itself imports only from those artifacts, never from a repo checkout
(the harness runs it from a scratch cwd to prove it).

Usage (via spark-submit):  scaling_job.py N_IMAGES OUT_JSON

The input fixture (bench's unclustered point view) must already be
materialized under /tmp/proj_spark_bench — the harness does that
untimed with an ordinary local session before submitting, exactly as
a real cluster run would stage its input table once.
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    n_images = int(sys.argv[1])
    out_path = sys.argv[2]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # the master / executor topology comes from spark-submit
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    # refuse to silently re-materialize the fixture inside the timed
    # topology — the harness stages it beforehand
    cache = bench._pts_uncl_cache(n_images)
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        raise SystemExit(f"fixture missing: {cache} (run the harness, not this job)")

    conf = spark.sparkContext.getConf()
    master = conf.get("spark.master")
    # defaultParallelism is sampled before executors register on a
    # fresh local-cluster (falls back to 2) — parse the topology
    import re

    m = re.match(r"local-cluster\[(\d+),(\d+),\d+\]", master or "")
    if m:
        total_cores = int(m.group(1)) * int(m.group(2))
    else:
        total_cores = int(conf.get("spark.cores.max", "0")) or spark.sparkContext.defaultParallelism

    # split sizing: ~8 scan tasks per core.  bench.run_flagship_cluster
    # uses 4/core; at 4 one-core executors that is 16 tasks in 4 waves,
    # and one slow task idles 3 slots for up to a full task length
    # (~4 s of the ~19 s wall).  8/core halves the worst-case straggler
    # tail while per-task overhead stays negligible (tasks are ~2 s).
    tasks_per_core = int(os.environ.get("SPARK_GRAFT_TASKS_PER_CORE", "8"))
    tot = sum(
        os.path.getsize(os.path.join(cache, f))
        for f in os.listdir(cache)
        if f.endswith(".parquet")
    )
    split = min(
        max(tot // (tasks_per_core * total_cores) or (128 << 20), 16 << 20), 1 << 30
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(int(split)))

    # untimed warm-up: python workers + codegen + engine imports on
    # every executor slot (a long-running cluster amortizes this away)
    from proj_spark.functions.transform import transform as _t

    warm = spark.range(50000, numPartitions=total_cores).select(
        (F.col("id") % 360 - 180.0).cast("double").alias("lon"),
        (F.col("id") % 120 - 60.0).cast("double").alias("lat"),
    )
    _t(warm, "+proj=latlong +datum=WGS84", "+proj=merc +datum=WGS84", "lon", "lat").agg(
        F.sum("x")
    ).collect()
    bench._warm_map_in_pandas(spark, total_cores)

    # steady-state measurement: one untimed full pass first.  A fresh
    # local-cluster pays one-time JIT (parquet vectorized reader,
    # whole-stage codegen, Arrow serde) during its first full-size job;
    # a production cluster is long-running, so the criterion ratio
    # should compare steady-state throughput at both sizes.  Measured
    # on this box the first pass costs ~2-4 s extra — invisible at N=1
    # (~70 s wall) but ~10-15% of the 4N wall (~22 s), which skews the
    # ratio down for reasons unrelated to the plan.  Both walls are
    # reported.
    t0 = time.time()
    bench._flagship(spark, n_images)
    dt_cold = time.time() - t0

    # round 5: MEDIAN of 3 steady passes per leg (the bench-wide
    # median-of-3 protocol) — single steady passes left the pair
    # efficiency with a 0.74-0.97 run-to-run spread driven by the 4N
    # leg's ~20 s wall sampling box noise.
    walls = []
    n_rows = 0
    for _ in range(3):
        t0 = time.time()
        n_rows, _ = bench._flagship(spark, n_images)
        walls.append(time.time() - t0)
    dt = sorted(walls)[1]

    result = {
        "master": conf.get("spark.master"),
        "total_cores": total_cores,
        "n_images": n_images,
        "n_rows": n_rows,
        "wall_sec": round(dt, 3),
        "rows_per_sec": round(n_rows / dt, 1),
        "steady_pass_walls_sec": [round(w, 3) for w in walls],
        "first_pass_wall_sec": round(dt_cold, 3),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
