"""STR partitioner: pure-python reference parity, balance bound,
cover/disjointness invariants, and partitioning invariance."""
from __future__ import annotations

import pytest

S, C, MOD = 4, 4, 8


def _pts(n=600, seed=17):
    # heavy cluster + uniform tail: the skew case a fixed grid loses
    out, s = [], seed
    for i in range(n):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        u = (s >> 11) / float(1 << 53)
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        v = (s >> 11) / float(1 << 53)
        if i % 3:
            out.append((i, -74.1 + 0.3 * u, 40.6 + 0.3 * v))  # "NYC"
        else:
            out.append((i, -125.0 + 58.0 * u, 25.0 + 24.0 * v))
    return out


def _ntile_bounds(vals, n):
    """(lo, hi] ranges from SQL ntile over sorted vals (val, id)."""
    m = len(vals)
    base, extra = divmod(m, n)
    ordered = sorted(vals)
    bounds, pos = [], 0
    k = min(n, m)
    for b in range(k):
        size = base + (1 if b < extra else 0)
        pos += size
        hi = float("inf") if b == k - 1 else ordered[pos - 1][0]
        lo = float("-inf") if b == 0 else bounds[-1][1]
        bounds.append((lo, hi))
    return bounds


def _reference(pts):
    samp = [p for p in pts if p[0] % MOD == 0]
    slab_b = _ntile_bounds([(lon, i) for i, lon, _ in samp], S)
    out = {}
    per_slab_samp = {b: [] for b in range(len(slab_b))}
    for i, lon, lat in samp:
        for b, (lo, hi) in enumerate(slab_b):
            if lo < lon <= hi:
                per_slab_samp[b].append((lat, i))
    cell_b = {b: _ntile_bounds(v, C) for b, v in per_slab_samp.items()}
    for i, lon, lat in pts:
        slab = next(b for b, (lo, hi) in enumerate(slab_b) if lo < lon <= hi)
        cell = next(
            cidx
            for cidx, (lo, hi) in enumerate(cell_b[slab])
            if lo < lat <= hi
        )
        out[i] = slab * C + cell
    return out


@pytest.fixture(scope="module")
def assigned(spark):
    from proj_spark.operators.partitioner import str_assign

    pts = _pts()
    df = spark.createDataFrame(pts, ["id", "lon", "lat"])
    rows = str_assign(df, S, C, MOD).collect()
    return pts, {r["id"]: r for r in rows}


def test_matches_pure_python_reference(assigned):
    pts, got = assigned
    ref = _reference(pts)
    assert len(got) == len(pts)
    for i, _, _ in pts:
        assert got[i]["part_id"] == ref[i], i


def test_every_point_assigned_exactly_once(assigned):
    pts, got = assigned
    assert sorted(got) == sorted(i for i, _, _ in pts)
    for r in got.values():
        assert 0 <= r["part_id"] < S * C


def test_balance_beats_fixed_grid(assigned):
    """With 2/3 of points in one 0.3-degree box, the max STR partition
    load stays within 3x the mean; a fixed S x C grid puts ~2/3 of all
    rows in ONE cell (>10x the mean)."""
    pts, got = assigned
    from collections import Counter

    loads = Counter(r["part_id"] for r in got.values())
    mean = len(pts) / (S * C)
    assert max(loads.values()) <= 3 * mean

    lons = [p[1] for p in pts]
    lats = [p[2] for p in pts]
    w = (max(lons) - min(lons)) / S + 1e-9
    h = (max(lats) - min(lats)) / C + 1e-9
    grid = Counter(
        (int((lon - min(lons)) / w), int((lat - min(lats)) / h))
        for _, lon, lat in pts
    )
    assert max(grid.values()) > 10 * mean


def test_partitioning_invariance(spark):
    from proj_spark.operators.partitioner import str_assign

    pts = _pts(n=300)
    a = spark.createDataFrame(pts, ["id", "lon", "lat"]).repartition(1)
    b = spark.createDataFrame(pts, ["id", "lon", "lat"]).repartition(7, "lat")
    ra = {r["id"]: r["part_id"] for r in str_assign(a, S, C, MOD).collect()}
    rb = {r["id"]: r["part_id"] for r in str_assign(b, S, C, MOD).collect()}
    assert ra == rb
