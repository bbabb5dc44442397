"""Adaptive quadtree binning: reference parity, the cap/minimality
invariants, bin consistency, and partitioning invariance."""
from __future__ import annotations

import math
from collections import Counter

import pytest

CAP, L = 25, 7


def _pts(n=900, seed=31):
    # half uniform, half clustered in a small box -> real depth spread
    out, s = [], seed
    for i in range(n):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        u = (s >> 11) / float(1 << 53)
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        v = (s >> 11) / float(1 << 53)
        if i % 2:
            out.append((i, -125.0 + 58.0 * u, 25.0 + 24.0 * v))
        else:
            out.append((i, -100.0 + 2.0 * u, 40.0 + 1.5 * v))
    return out


def _qk(lon, lat, z):
    n = 1 << z
    tx = min(max(int(math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
    la = math.radians(lat)
    ty = min(
        max(int(math.floor((1.0 - math.asinh(math.tan(la)) / math.pi) / 2.0 * n)), 0),
        n - 1,
    )
    return "".join(
        str(((tx >> (z - i)) & 1) + 2 * ((ty >> (z - i)) & 1)) for i in range(1, z + 1)
    )


def _reference():
    pts = _pts()
    qks = {i: _qk(lon, lat, L) for i, lon, lat in pts}
    counts = Counter()
    for q in qks.values():
        for lvl in range(L + 1):
            counts[(lvl, q[:lvl])] += 1
    out = {}
    for i, q in qks.items():
        lvl = next((l for l in range(L + 1) if counts[(l, q[:l])] <= CAP), L)
        out[i] = (q[:lvl], lvl)
    return out


@pytest.fixture(scope="module")
def binned(spark):
    from proj_spark.operators.adaptive import adaptive_bins

    df = spark.createDataFrame(_pts(), "id long, lon double, lat double")
    return {r["id"]: (r["bin"], r["level"]) for r in adaptive_bins(df, CAP, L).collect()}


def test_matches_reference(binned):
    assert binned == _reference()


def test_cap_and_minimality(binned):
    sizes = Counter(b for b, _ in binned.values())
    levels = {b: l for b, l in binned.values()}
    deep = shallow = 0
    for b, n in sizes.items():
        if levels[b] < L:
            assert n <= CAP, (b, n)  # the cap holds below max depth
            deep += 1
        if levels[b] > 0:
            shallow += 1
    # depth spread: the clustered half forces deep bins, the uniform
    # half keeps some coarse ones
    assert len({l for _, l in binned.values()}) >= 3
    assert deep and shallow


def test_bin_is_prefix_consistent(binned):
    """No chosen bin is a strict prefix of another chosen bin."""
    bins = {b for b, _ in binned.values()}
    for b in bins:
        for other in bins:
            if other != b and other.startswith(b):
                raise AssertionError(f"{b!r} is a prefix of {other!r}")


def test_partitioning_invariance(spark):
    from proj_spark.operators.adaptive import adaptive_bins

    df = spark.createDataFrame(_pts(), "id long, lon double, lat double")
    a = sorted(map(tuple, adaptive_bins(df.repartition(11), CAP, L).collect()))
    b = sorted(map(tuple, adaptive_bins(df.coalesce(1), CAP, L).collect()))
    assert a == b
