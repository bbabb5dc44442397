"""Micro-benchmark: cache-blocked execution of the fused transform
plan vs full-batch execution, single process and 16 parallel
processes (emulating 16 busy executor cores on the shared box).

Hypothesis: full-batch (10k rows) stage chains materialize ~100
temporaries x 80KB each per batch -> ~1KB/row DRAM traffic, which
saturates the box at ~16M rows/s aggregate.  Chunked execution keeps
the working set in L2 and should hold per-core throughput when all
cores are busy.
"""
from __future__ import annotations

import os
import sys
import time
from multiprocessing import Process, Queue

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("MB_ROWS", "4000000"))
BATCH = 10000


def build():
    from proj_spark.crs import CRS
    from proj_spark.operators.gridshift import make_synthetic_grid, register_grid
    from proj_spark.plans.pipeline import build_plan

    register_grid("conus_syn", make_synthetic_grid())
    src = CRS.from_proj4("+proj=latlong +ellps=clrk66 +nadgrids=conus_syn")
    dst = CRS.from_proj4("+proj=latlong +datum=WGS84")
    return build_plan(src, dst)


def run_one(chunk: int, q: Queue | None = None):
    plan = build()
    rng = np.random.RandomState(42)
    lon = np.radians(rng.uniform(-124, -66, BATCH))
    lat = np.radians(rng.uniform(25, 49, BATCH))
    n_batches = N // BATCH
    t0 = time.time()
    for _ in range(n_batches):
        x = lon.copy()
        y = lat.copy()
        if chunk >= BATCH or chunk <= 0:
            plan(x, y)
        else:
            for s in range(0, BATCH, chunk):
                plan(x[s : s + chunk], y[s : s + chunk])
    dt = time.time() - t0
    rps = N / dt
    if q is not None:
        q.put(rps)
    return rps


def run_parallel(chunk: int, nproc: int) -> float:
    qs = Queue()
    ps = [Process(target=run_one, args=(chunk, qs)) for _ in range(nproc)]
    t0 = time.time()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    total = sum(qs.get() for _ in ps)
    return total


def main():
    build()  # warm import
    for chunk in (0, 4096, 2048, 1024, 512):
        solo = run_one(chunk)
        print(f"chunk={chunk or 'full':>5} solo: {solo/1e6:6.2f} M rows/s")
    for chunk in (0, 2048, 1024):
        par = run_parallel(chunk, 16)
        print(
            f"chunk={chunk or 'full':>5} 16proc aggregate: {par/1e6:6.2f} M rows/s "
            f"({par/16/1e6:.2f} per core)"
        )


if __name__ == "__main__":
    main()
