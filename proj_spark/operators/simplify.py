"""Distributed polygon simplification (Douglas-Peucker).

Simplifies ring geometries stored one-per-row — the building-footprint
/ parcel / AOI-library case where 10^8 SMALL polygons need their
vertex counts cut before broadcast covers, inline edge arrays, or
rasterization.  Each ring is independent, so the operator is a NARROW
mapInPandas (zero shuffle); a hot row costs only its own vertex count.

Algorithm (classic DP, made deterministic end-to-end):

- metric: planar distance in a local equirectangular frame per ring
  (lon scaled by cos(mean ring latitude), converted to meters by
  DEG_TO_RAD * EARTH_RADIUS_M) — the same small-distance metric as
  operators/boundary.py;
- point-to-chord distance is SEGMENT-clamped (not infinite-line);
- closed rings anchor at vertex 0 and the vertex farthest from it
  (ties -> lowest index), then DP runs on the two halves;
- the split vertex is the farthest from the chord, ties -> lowest
  index, kept only when its distance exceeds ``tol_m`` STRICTLY;
- a ring whose simplification would drop below a triangle keeps its
  original vertices (degenerate guard).

Every choice above is a total order on exact float comparisons, so
the result is independent of partitioning and batch boundaries, and
an SQL engine replaying the same rules (unrolled split rounds — see
the ``simplify`` oracle in __spark_entry__.py) reproduces it
bit-for-bit.
"""
from __future__ import annotations

import math
from typing import Iterator, List, Sequence, Tuple

import numpy as np

from pyspark.sql import DataFrame

from ..functions.expressions import DEG_TO_RAD, EARTH_RADIUS_M

Ring = Sequence[Tuple[float, float]]

M_PER_DEG = DEG_TO_RAD * EARTH_RADIUS_M


def _seg_dist(px, py, ax, ay, bx, by):
    """Vectorized point-to-segment distance (planar scaled degrees)."""
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    if len2 == 0.0:
        return np.sqrt((px - ax) ** 2 + (py - ay) ** 2)
    t = np.clip(((px - ax) * dx + (py - ay) * dy) / len2, 0.0, 1.0)
    qx, qy = ax + t * dx, ay + t * dy
    return np.sqrt((px - qx) ** 2 + (py - qy) ** 2)


def dp_keep_indices(xs: np.ndarray, ys: np.ndarray, tol_scaled: float) -> List[int]:
    """Indices kept by DP on the OPEN polyline xs/ys (endpoints always
    kept).  ``tol_scaled`` is in the same units as xs/ys."""
    n = len(xs)
    keep = {0, n - 1}
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        mid = slice(i + 1, j)
        d = _seg_dist(xs[mid], ys[mid], xs[i], ys[i], xs[j], ys[j])
        kmax = int(np.argmax(d))  # first max = lowest index on ties
        if d[kmax] > tol_scaled:
            k = i + 1 + kmax
            keep.add(k)
            stack.append((i, k))
            stack.append((k, j))
    return sorted(keep)


def simplify_ring(ring: Ring, tol_m: float) -> List[Tuple[float, float]]:
    """One closed ring (last == first) -> simplified closed ring."""
    pts = [(float(x), float(y)) for x, y in ring]
    if pts[0] != pts[-1]:
        raise ValueError("ring must be closed (last vertex == first)")
    n = len(pts) - 1  # distinct vertices
    if n < 3:
        return pts
    lat0 = sum(p[1] for p in pts[:-1]) / n
    cl = math.cos(lat0 * DEG_TO_RAD)
    xs = np.array([p[0] for p in pts], dtype=np.float64) * cl
    ys = np.array([p[1] for p in pts], dtype=np.float64)
    tol = tol_m / M_PER_DEG
    # anchor 2: farthest distinct vertex from vertex 0 (tie -> lowest idx)
    d0 = np.sqrt((xs[:n] - xs[0]) ** 2 + (ys[:n] - ys[0]) ** 2)
    a = int(np.argmax(d0))
    if a == 0:  # all vertices coincide
        return pts
    k1 = dp_keep_indices(xs[: a + 1], ys[: a + 1], tol)
    k2 = [a + i for i in dp_keep_indices(xs[a:], ys[a:], tol)]
    kept = sorted(set(k1) | set(k2))  # includes 0, a, n (closing vertex)
    if len(kept) < 4:  # below a triangle: keep the original
        return pts
    return [pts[i] for i in kept]


def simplify_rings(df: DataFrame, tol_m: float, ring: str = "ring") -> DataFrame:
    """DataFrame op: rows carry ``ring`` array<struct<lon,lat>>; every
    other column passes through.  Adds ``n_in`` / ``n_out`` vertex
    counts (closing vertex included).  Narrow plan — no exchange."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    names = list(df.columns)
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("n_in", IntegerType()), StructField("n_out", IntegerType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rings_in = b[ring]
            rings_out, n_in, n_out = [], [], []
            for r in rings_in:
                pts = [(p["lon"], p["lat"]) for p in r]
                simp = simplify_ring(pts, tol_m)
                rings_out.append([{"lon": x, "lat": y} for x, y in simp])
                n_in.append(len(pts))
                n_out.append(len(simp))
            out = b.copy()
            out[ring] = rings_out
            out["n_in"] = pd.Series(n_in, dtype="int32")
            out["n_out"] = pd.Series(n_out, dtype="int32")
            yield out[names + ["n_in", "n_out"]]

    return df.mapInPandas(run, out_schema)
