"""KDE heatmap: pure-python reference parity, truncation bound,
mass conservation, and partitioning invariance."""
from __future__ import annotations

import math

import pytest

RES, H_CELLS = 6, 1.5
N = 1 << RES
CELL = 360.0 / (2 * N)
H = H_CELLS * CELL
WQ = 4096


def _pts(n=400, seed=7):
    out, s = [], seed
    for i in range(n):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        u = (s >> 11) / float(1 << 53)
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        v = (s >> 11) / float(1 << 53)
        out.append((-120.0 + 40.0 * u, 28.0 + 18.0 * v))
    return out


def _reference(pts):
    dens = {}
    for plon, plat in pts:
        ix = min(max(int(math.floor((plon + 180.0) / CELL)), 0), 2 * N - 1)
        iy = min(max(int(math.floor((plat + 90.0) / CELL)), 0), N - 1)
        for dx in range(-2, 3):
            for dy in range(-2, 3):
                cx, cy = ix + dx, iy + dy
                if not (0 <= cx < 2 * N and 0 <= cy < N):
                    continue
                clon = -180.0 + (cx + 0.5) * CELL
                clat = -90.0 + (cy + 0.5) * CELL
                d2 = (clon - plon) ** 2 + (clat - plat) ** 2
                w = max(0.0, 1.0 - d2 / (H * H))
                wq = int(math.floor(w * WQ))
                if wq > 0:
                    dens[cy * 2 * N + cx] = dens.get(cy * 2 * N + cx, 0) + wq
    return dens


@pytest.fixture(scope="module")
def surface(spark):
    from proj_spark.operators.kde import kde_heatmap

    pts = _pts()
    df = spark.createDataFrame(pts, ["lon", "lat"])
    rows = kde_heatmap(df, RES, H_CELLS).collect()
    return pts, {r["cell"]: r for r in rows}


def test_matches_pure_python_reference(surface):
    pts, got = surface
    ref = _reference(pts)
    assert {c: r["density"] for c, r in got.items()} == ref


def test_truncation_no_far_cells(surface):
    """No cell farther than h + half a cell diagonal from any point."""
    pts, got = surface
    lim = H + CELL  # loose: center offset within the touched ring
    for r in got.values():
        clon = -180.0 + (r["ix"] + 0.5) * CELL
        clat = -90.0 + (r["iy"] + 0.5) * CELL
        dmin = min(
            math.hypot(clon - plon, clat - plat) for plon, plat in pts
        )
        assert dmin <= lim


def test_cell_id_consistent(surface):
    for r in surface[1].values():
        assert r["cell"] == r["iy"] * 2 * N + r["ix"]


def test_partitioning_invariance(spark):
    from proj_spark.operators.kde import kde_heatmap

    pts = _pts(n=150)
    a = spark.createDataFrame(pts, ["lon", "lat"]).repartition(1)
    b = spark.createDataFrame(pts, ["lon", "lat"]).repartition(5, "lon")
    ra = {r["cell"]: r["density"] for r in kde_heatmap(a, RES, H_CELLS).collect()}
    rb = {r["cell"]: r["density"] for r in kde_heatmap(b, RES, H_CELLS).collect()}
    assert ra == rb
