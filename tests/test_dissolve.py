"""Dissolve by attribute: reference parity on a parcel grid, opposite
edge direction canonicalization, attribute separation, invariance."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proj_spark.operators.dissolve import dissolve_by

NXP, NYP = 6, 5  # parcel grid


def _parcels():
    """Unit-square parcels; owner = lcg(pid) % 4.  Odd rows trace
    their rings CLOCKWISE (reversed) so shared edges appear in
    opposite directions — the canonicalization must not care."""
    out = []
    for j in range(NYP):
        for i in range(NXP):
            pid = j * NXP + i
            x, y = float(i), float(j)
            ring = [
                {"lon": x, "lat": y},
                {"lon": x + 1, "lat": y},
                {"lon": x + 1, "lat": y + 1},
                {"lon": x, "lat": y + 1},
                {"lon": x, "lat": y},
            ]
            if j % 2:
                ring = ring[::-1]
            # 2x2 owner blocks -> guaranteed multi-parcel groups, with
            # block collisions producing larger irregular ones
            owner = ((i // 2) + (j // 2) * 3) % 4
            if pid == 0:
                owner = 9  # unique owner: exercises the singleton path
            out.append((pid, int(owner), ring))
    return out


def _reference():
    parcels = _parcels()
    owner = {p: o for p, o, _ in parcels}
    lab = {p: p for p, _, _ in parcels}

    def find(x):
        while lab[x] != x:
            lab[x] = lab[lab[x]]
            x = lab[x]
        return x

    for j in range(NYP):
        for i in range(NXP):
            p = j * NXP + i
            for q in ((j * NXP + i + 1) if i + 1 < NXP else None,
                      ((j + 1) * NXP + i) if j + 1 < NYP else None):
                if q is not None and owner[p] == owner[q]:
                    a, b = find(p), find(q)
                    if a != b:
                        lab[max(a, b)] = min(a, b)
    groups = {p: find(p) for p, _, _ in parcels}
    sizes = {}
    for g in groups.values():
        sizes[g] = sizes.get(g, 0) + 1
    return {p: (owner[p], g, sizes[g]) for p, g in groups.items()}


@pytest.fixture(scope="module")
def dissolved(spark):
    df = spark.createDataFrame(
        _parcels(), "poly_id long, owner int, ring array<struct<lon:double,lat:double>>"
    )
    return {
        r["poly_id"]: (r["owner"], r["group_id"], r["group_size"])
        for r in dissolve_by(df, "owner").collect()
    }


def test_matches_reference(dissolved):
    want = _reference()
    assert dissolved == want
    # the fixture must actually produce multi-parcel groups AND
    # singletons, and owners never mix
    sizes = {g: s for _, g, s in dissolved.values()}
    assert max(sizes.values()) >= 3
    assert min(sizes.values()) == 1
    by_group = {}
    for o, g, _ in dissolved.values():
        by_group.setdefault(g, set()).add(o)
    assert all(len(v) == 1 for v in by_group.values())


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(
        _parcels(), "poly_id long, owner int, ring array<struct<lon:double,lat:double>>"
    )
    a = sorted(map(tuple, dissolve_by(df.repartition(9), "owner").collect()))
    b = sorted(map(tuple, dissolve_by(df.coalesce(1), "owner").collect()))
    assert a == b
