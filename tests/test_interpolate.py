"""IDW grid interpolation: exact-integer parity with a brute-force
reference, radius correctness, and partitioning invariance."""
from __future__ import annotations

import math

import pytest

from proj_spark.operators.interpolate import _W_NUM, idw_grid

LON0, LAT0, PITCH, NX, NY = -125.0, 25.0, 2.0, 12, 8
RADIUS = 300_000.0


def _samples(n=60, seed=7):
    out = []
    s = seed
    for i in range(n):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        u = (s >> 11) / float(1 << 53)
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        v = (s >> 11) / float(1 << 53)
        out.append((i, LON0 + NX * PITCH * u, LAT0 + NY * PITCH * v, i % 97))
    return out


def _hav(lon1, lat1, lon2, lat2):
    R = 6371008.8
    la1, la2 = math.radians(lat1), math.radians(lat2)
    dla = (la2 - la1) / 2
    dlo = (math.radians(lon2) - math.radians(lon1)) / 2
    h = math.sin(dla) ** 2 + math.cos(la1) * math.cos(la2) * math.sin(dlo) ** 2
    return 2 * R * math.asin(math.sqrt(min(h, 1.0)))


def _reference():
    pts = _samples()
    out = {}
    for cy in range(NY):
        for cx in range(NX):
            glon = LON0 + (cx + 0.5) * PITCH
            glat = LAT0 + (cy + 0.5) * PITCH
            n = sw = swv = 0
            for _, slon, slat, val in pts:
                d = _hav(glon, glat, slon, slat)
                if d <= RADIUS:
                    dm = int(math.floor(d))
                    w = _W_NUM // (dm * dm + 1)
                    n += 1
                    sw += w
                    swv += w * val
            if n:
                out[(cx, cy)] = (n, sw, swv)
    return out


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(
        _samples(), "id long, lon double, lat double, value long"
    )


def test_matches_reference(spark, sdf):
    got = {
        (r["cx"], r["cy"]): (r["n"], r["sum_w"], r["sum_wv"])
        for r in idw_grid(
            spark, sdf, LON0, LAT0, PITCH, NX, NY, RADIUS
        ).collect()
    }
    assert got == _reference()


def test_partitioning_invariance(spark, sdf):
    a = idw_grid(spark, sdf.repartition(13), LON0, LAT0, PITCH, NX, NY, RADIUS)
    b = idw_grid(spark, sdf.coalesce(1), LON0, LAT0, PITCH, NX, NY, RADIUS)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_empty_cells_absent(spark):
    # one sample in the SW corner: far NE cells must not appear
    one = spark.createDataFrame(
        [(0, LON0 + 0.5, LAT0 + 0.5, 42)], "id long, lon double, lat double, value long"
    )
    got = {(r["cx"], r["cy"]) for r in idw_grid(
        spark, one, LON0, LAT0, PITCH, NX, NY, RADIUS
    ).collect()}
    assert (NX - 1, NY - 1) not in got
    assert got  # the nearby cells do appear
    for cx, cy in got:
        glon = LON0 + (cx + 0.5) * PITCH
        glat = LAT0 + (cy + 0.5) * PITCH
        assert _hav(glon, glat, LON0 + 0.5, LAT0 + 0.5) <= RADIUS
