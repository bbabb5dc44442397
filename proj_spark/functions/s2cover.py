"""S2 region coverer: lon/lat bbox -> contiguous cell-id ranges.

The payoff of the hierarchical Hilbert id (:mod:`.s2cell`): a spatial
bbox becomes a SHORT list of inclusive ``[lo, hi]`` id ranges at the
target level, because (a) every quadtree subtree is one contiguous id
range (prefix property) so interior cells collapse into coarse-level
emits, and (b) Hilbert ordering keeps boundary cells in few runs.  On
a table SORTED by the cell id the ranges become parquet row-group
min/max prunes — the scan reads only the bbox's neighborhood of a
100 TB table (measured in tests/test_s2cover.py).

Geometry is exact, not sampled: an S2 cell on face f spanning
(u, v) in [u1, u2] x [v1, v2] is the intersection of four half-spaces
through the origin (the edge u = c is the plane ``p . (A - c N) = 0``
with (N, A, B) the face basis — same decomposition as the reference's
QSC face pick, src/PJ_qsc.c:52-60), so cell-vs-bbox intersection
reduces to closed-form plane/meridian and plane/parallel crossings
plus mutual corner containment.  The test errs toward "intersects"
(eps-conservative), so the cover is certifiably a SUPERSET of the
cells touching the bbox — extra cells only cost scan, never rows
(callers refine with the exact predicate; randomized no-false-negative
gate in tests/test_s2cover.py).

Longitude ranges may wrap (lon_min > lon_max crosses the
antimeridian); poles are handled by explicit pole-point containment.
"""
from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from .s2cell import _hilbert_xy2d_py, _st_inv_py

_EPS = 1e-12

# (N, A, B) per face: u = (p.A)/(p.N), v = (p.B)/(p.N), valid where
# p.N > 0 — mirrors s2cell._face_uv_py ratio-for-ratio.
_FACE_BASIS = (
    ((1, 0, 0), (0, 1, 0), (0, 0, 1)),
    ((0, 1, 0), (-1, 0, 0), (0, 0, 1)),
    ((0, 0, 1), (-1, 0, 0), (0, 1, 0)),
    ((-1, 0, 0), (0, 0, -1), (0, 1, 0)),
    ((0, -1, 0), (0, 0, -1), (1, 0, 0)),
    ((0, 0, -1), (0, 1, 0), (1, 0, 0)),
)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _axpy(s, a, b):
    """s*a + b."""
    return (s * a[0] + b[0], s * a[1] + b[1], s * a[2] + b[2])


def _lonlat(p):
    r = math.sqrt(_dot(p, p))
    return math.degrees(math.atan2(p[1], p[0])), math.degrees(math.asin(p[2] / r))


def _unit_ll(lon, lat):
    lam, phi = math.radians(lon), math.radians(lat)
    return (math.cos(phi) * math.cos(lam), math.cos(phi) * math.sin(lam), math.sin(phi))


class _BBox:
    """lon/lat box; lon may wrap (lon1 > lon2 crosses the antimeridian)."""

    def __init__(self, lon1, lat1, lon2, lat2):
        if not (-90.0 <= lat1 <= lat2 <= 90.0):
            raise ValueError(f"lat range [{lat1}, {lat2}] invalid")
        self.lon1, self.lat1, self.lon2, self.lat2 = lon1, lat1, lon2, lat2
        self.span = (lon2 - lon1) % 360.0
        if self.span == 0.0 and lon1 != lon2:
            self.span = 360.0
        self.full_ring = lon1 == lon2 or self.span >= 360.0 - 1e-9

    def lon_in(self, lon, eps=1e-9):
        if self.full_ring:
            return True
        d = (lon - self.lon1) % 360.0
        return d <= self.span + eps or d >= 360.0 - eps

    def contains(self, lon, lat, eps=1e-9):
        return self.lat1 - eps <= lat <= self.lat2 + eps and self.lon_in(lon, eps)


def _cell_planes(face, u1, u2, v1, v2):
    """Inward normals of the 4 edge half-spaces (p.m >= 0 inside)."""
    n, a, b = _FACE_BASIS[face]
    return (
        _axpy(-u1, n, a),  # u >= u1
        _axpy(u2, n, tuple(-x for x in a)),  # u <= u2
        _axpy(-v1, n, b),  # v >= v1
        _axpy(v2, n, tuple(-x for x in b)),  # v <= v2
    )


def _in_cell(p, face, u1, u2, v1, v2, eps=1e-9):
    n, a, b = _FACE_BASIS[face]
    d = _dot(p, n)
    if d <= _EPS:
        return False
    u, v = _dot(p, a) / d, _dot(p, b) / d
    return u1 - eps <= u <= u2 + eps and v1 - eps <= v <= v2 + eps


def _plane_meridian_hits(m, lon):
    """Unit points on great circle ``p.m = 0`` with longitude == lon."""
    # meridian plane normal (sin lon, -cos lon, 0); direction = m x w
    lam = math.radians(lon)
    w = (math.sin(lam), -math.cos(lam), 0.0)
    d = (
        m[1] * w[2] - m[2] * w[1],
        m[2] * w[0] - m[0] * w[2],
        m[0] * w[1] - m[1] * w[0],
    )
    r = math.sqrt(_dot(d, d))
    if r < _EPS:  # coplanar: the cell edge IS this meridian
        return []
    d = (d[0] / r, d[1] / r, d[2] / r)
    out = []
    for p in (d, (-d[0], -d[1], -d[2])):
        # keep the half with the requested longitude (not lon+180)
        if p[0] * math.cos(lam) + p[1] * math.sin(lam) >= -1e-12:
            out.append(p)
    return out


def _plane_parallel_hits(m, lat):
    """Unit points on great circle ``p.m = 0`` with latitude == lat."""
    phi = math.radians(lat)
    c, s = math.cos(phi), math.sin(phi)
    pp, q, r = m[0] * c, m[1] * c, -m[2] * s
    h = math.hypot(pp, q)
    if h < _EPS:
        return []
    x = r / h
    if abs(x) > 1.0:
        if abs(x) > 1.0 + 1e-9:
            return []
        x = max(-1.0, min(1.0, x))
    base = math.atan2(q, pp)
    delta = math.acos(x)
    out = []
    for lam in (base + delta, base - delta):
        out.append((c * math.cos(lam), c * math.sin(lam), s))
    return out


def _cell_corners(face, u1, u2, v1, v2):
    n, a, b = _FACE_BASIS[face]
    return [
        _axpy(u, a, _axpy(v, b, n)) for u in (u1, u2) for v in (v1, v2)
    ]


def _cell_intersects(face, u1, u2, v1, v2, box: _BBox):
    """Exact-with-eps spherical quad vs lon/lat box (never false-neg)."""
    corners = _cell_corners(face, u1, u2, v1, v2)
    # 1. any cell corner inside the box
    for p in corners:
        lon, lat = _lonlat(p)
        if box.contains(lon, lat):
            return True
    # 2. any box corner (or pole cap point) inside the cell
    probes = []
    if not box.full_ring:
        for lon in (box.lon1, box.lon2):
            for lat in (box.lat1, box.lat2):
                probes.append(_unit_ll(lon, lat))
    if box.lat2 >= 90.0 - 1e-9:
        probes.append((0.0, 0.0, 1.0))
    if box.lat1 <= -90.0 + 1e-9:
        probes.append((0.0, 0.0, -1.0))
    if box.full_ring:
        # a full ring has no meridian edges; probe the parallels' lon=0
        probes.append(_unit_ll(0.0, box.lat1))
        probes.append(_unit_ll(0.0, box.lat2))
    for p in probes:
        if _in_cell(p, face, u1, u2, v1, v2):
            return True
    # 3. boundary crossings: each cell-edge plane vs box edges
    planes = _cell_planes(face, u1, u2, v1, v2)
    for m in planes:
        if not box.full_ring:
            for lon in (box.lon1, box.lon2):
                for p in _plane_meridian_hits(m, lon):
                    lon_p, lat_p = _lonlat(p)
                    if box.lat1 - 1e-9 <= lat_p <= box.lat2 + 1e-9 and _in_cell(
                        p, face, u1, u2, v1, v2
                    ):
                        return True
        for lat in (box.lat1, box.lat2):
            if abs(lat) >= 90.0 - 1e-9:
                continue
            for p in _plane_parallel_hits(m, lat):
                lon_p, _ = _lonlat(p)
                if box.lon_in(lon_p) and _in_cell(p, face, u1, u2, v1, v2):
                    return True
    return False


def _cell_inside_box(face, u1, u2, v1, v2, box: _BBox):
    """Corner test only — may be optimistically true on edge bulges,
    which keeps the cover a superset (it emits MORE, never less)."""
    for p in _cell_corners(face, u1, u2, v1, v2):
        lon, lat = _lonlat(p)
        if not box.contains(lon, lat, eps=-1e-9):
            return False
    return True


def _merge(ranges):
    ranges.sort()
    out = []
    for lo, hi in ranges:
        if out and lo <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return out


def _coalesce(merged, max_ranges):
    """Drop the smallest inter-range gaps until <= max_ranges remain.

    Exactly what a scan planner does: the union only GROWS (still a
    superset), trading a few dead row groups for fewer seek ranges."""
    while len(merged) > max_ranges:
        gaps = sorted(
            range(1, len(merged)),
            key=lambda i: merged[i][0] - merged[i - 1][1],
        )
        kill = set(gaps[: len(merged) - max_ranges])
        out = [merged[0]]
        for i in range(1, len(merged)):
            if i in kill:
                out[-1][1] = merged[i][1]
            else:
                out.append(merged[i])
        merged = out
    return merged


def s2_cover_bbox(lon1, lat1, lon2, lat2, level, max_ranges=64):
    """Inclusive (lo, hi) level-``level`` id ranges covering the bbox.

    Superset-guaranteed (see module docstring); ``lon1 > lon2`` wraps
    across the antimeridian.  Interior subtrees emit at their coarse
    level (one range per subtree), so the range count tracks the bbox
    BOUNDARY, not its area.
    """
    if not 1 <= level <= 28:
        raise ValueError(f"level must be 1..28, got {level}")
    box = _BBox(lon1, lat1, lon2, lat2)
    ranges = []

    def emit(face, k, i, j):
        prefix = face * (1 << (2 * k)) + _hilbert_xy2d_py(i, j, k) if k else face
        shift = 2 * (level - k)
        ranges.append([prefix << shift, ((prefix + 1) << shift) - 1])

    def visit(face, k, i, j):
        n = 1 << k
        u1, u2 = _st_inv_py(i / n), _st_inv_py((i + 1) / n)
        v1, v2 = _st_inv_py(j / n), _st_inv_py((j + 1) / n)
        if not _cell_intersects(face, u1, u2, v1, v2, box):
            return
        if k == level or _cell_inside_box(face, u1, u2, v1, v2, box):
            emit(face, k, i, j)
            return
        for di in (0, 1):
            for dj in (0, 1):
                visit(face, k + 1, 2 * i + di, 2 * j + dj)

    for face in range(6):
        visit(face, 0, 0, 0)
    if not ranges:
        return []
    return [tuple(r) for r in _coalesce(_merge(ranges), max_ranges)]


def s2_range_predicate(cell: Column | str, ranges) -> Column:
    """OR-of-BETWEEN filter over cover ranges — parquet-pushable, so a
    cell-sorted table prunes row groups by min/max stats.

    Use ONLY on a STORED cell column (read from a table).  On a
    freshly COMPUTED cell (with_s2_cell in the same plan) filter
    pushdown substitutes the unrolled Hilbert ladder into every
    comparison — ~2x max_ranges copies of an already-wide tree
    (measured: optimizer heap OOM at 48 ranges) — use a broadcast
    left-semi range join instead (see __spark_entry__.q_s2_cover_scan).
    """
    c = F.col(cell) if isinstance(cell, str) else cell
    if not ranges:
        return F.lit(False)
    return reduce(
        lambda acc, r: acc | c.between(int(r[0]), int(r[1])),
        ranges[1:],
        c.between(int(ranges[0][0]), int(ranges[0][1])),
    )
