"""Equal-area cell indexing (the H3-grade upgrade of hexgrid.py).

:mod:`.hexgrid` hex cells live on the equirectangular (lon, lat)
plane: ids are pure SQL expressions, but cells SHRINK east-west by
cos(lat), so global rollups over-resolve the poles and the kNN
coverage bound degrades at high latitude.  This module provides the
two equal-area ancestors the reference itself carries, composed into
cell indexes:

1. **CEA hex cells** (`ea_hex_cell`): hexagons on the Lambert
   cylindrical equal-area plane x = lon_deg, y = sin(lat)*180/pi
   (ref src/PJ_cea.c forward: x = lam, y = sin(phi) on the sphere).
   dx*dy = cos(phi) dlam dphi — EXACTLY proportional to sphere area,
   so every cell covers the same area on the globe.  Stays a pure
   closed-form expression in both Spark codegen and ANSI SQL, so the
   DuckDB oracle reproduces every id bit-for-bit — the equal-area
   ROLLUP index (DGGS aggregation, density maps, equal-load binning).

2. **ISEA hex cells** (`isea_plane_udf`): hexagons on the Icosahedral
   Snyder Equal Area plane (ref src/PJ_isea.c — the projection
   underlying the H3 DGGS; kernel: kernels/extra9.py).  Distortion is
   BOUNDED globally (max linear scale SIGMA_MAX = 1.1631, Snyder
   1992 Table 8, re-measured numerically in tests/test_eagrid.py;
   min 0.8598; area scale == 1 everywhere), so the kNN coverage
   radius no longer collapses near the poles the way cos(lat) does on
   the equirect plane.  Cell ids come from a pandas UDF (the Snyder
   forward is iterative trig, not SQL-expressible) — fine for kNN,
   whose ORACLE is brute force over the results, not an id mirror.

The seam story (interruptions of the icosahedral net) mirrors
knn_join_hex's +-180 handling: each point also gets its geodesic
distance to the nearest icosahedron face EDGE (the net only tears
along face edges), and a query whose k-th neighbor distance reaches
that guard fails coverage and escalates / brute-forces — conservative
costs retries, never correctness.  Face containment = Voronoi of the
20 face centers (adjacent face centers are mirror images across their
shared edge plane, so the perpendicular-bisector great circle IS the
edge great circle); distance to the boundary is lower-bounded by the
min distance to the 3 edge great circles.
"""
from __future__ import annotations

import math
from typing import Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from . import hexgrid as H
from .expressions import EARTH_RADIUS_M, _c

RAD2DEG = 180.0 / math.pi

# max linear scale (largest Jacobian singular value) of the ISEA
# forward anywhere on the globe: measured 1.16310 over 4e5 samples
# (Snyder 1992: 1.163); the runtime bound uses 1.2 — a LARGER value
# only makes the kNN coverage check more conservative (more ring
# escalations), never incorrect.  Asserted < SIGMA_MAX in
# tests/test_eagrid.py::test_isea_scale_bound.
SIGMA_MAX = 1.2

# the reference kernel assigns points within 5e-6 rad of a face edge
# to whichever candidate face enumerates first (PJ_isea.c epsilon in
# isea_snyder_forward); pad the edge guard past it
EDGE_EPS_RAD = 1e-5


# ------------------------------------------------------- CEA hex cells
def ea_hex_cell(
    lon_deg: Column | str, lat_deg: Column | str, size_deg: float
) -> Column:
    """int64 EQUAL-AREA hex cell id: hexgrid cube-rounding on the
    cylindrical equal-area plane (x = lon_deg, y = sin(lat)*180/pi).
    ``size_deg`` is the hex circumradius in plane units; every cell
    covers the same sphere area 3*sqrt(3)/2 * size² * (pi/180)² * R²."""
    y = F.sin(F.radians(_c(lat_deg).cast("double"))) * F.lit(RAD2DEG)
    return H.hex_cell(_c(lon_deg).cast("double"), y, size_deg)


def ea_hex_cell_sql(lon_expr: str, lat_expr: str, size_deg: float) -> str:
    """ANSI-SQL mirror of :func:`ea_hex_cell` — the same plane map fed
    to the same hex arithmetic, token-for-token."""
    y = f"(sin(radians({lat_expr})) * {RAD2DEG!r})"
    return H.hex_cell_sql(lon_expr, y, size_deg)


# --------------------------------------------- ISEA plane + edge guard
def _face_tables() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(centers_xyz[21,3], edge_poles[21,3,3], verts_xyz[21,3,3]) for
    the 20 ISEA faces (row 0 unused, matching the kernel's 1-based
    tri ids).

    Vertices of face t sit at spherical distance g (the face
    circumradius, PJ_isea.c constants row 6) from its center along
    azimuths az_adj(t) + k*120deg; the direct geodesic on the sphere
    places them.  tests/test_eagrid.py asserts every computed vertex
    coincides with one of the 12 canonical icosahedron vertices."""
    from ..kernels.extra9 import _az_adjustment, _CENTERS, _G_DEG, DEG2RAD

    g = _G_DEG * DEG2RAD
    centers = np.zeros((21, 3))
    poles = np.zeros((21, 3, 3))
    verts_all = np.zeros((21, 3, 3))
    for t in range(1, 21):
        clon, clat = _CENTERS[t]
        centers[t] = (
            math.cos(clat) * math.cos(clon),
            math.cos(clat) * math.sin(clon),
            math.sin(clat),
        )
        az0 = _az_adjustment(t)
        verts = []
        for k in range(3):
            az = az0 + k * (2.0 * math.pi / 3.0)
            # spherical direct problem from (clat, clon)
            sphi = math.sin(clat) * math.cos(g) + math.cos(clat) * math.sin(
                g
            ) * math.cos(az)
            phi2 = math.asin(max(-1.0, min(1.0, sphi)))
            lam2 = clon + math.atan2(
                math.sin(az) * math.sin(g) * math.cos(clat),
                math.cos(g) - math.sin(clat) * sphi,
            )
            verts.append(
                np.array(
                    [
                        math.cos(phi2) * math.cos(lam2),
                        math.cos(phi2) * math.sin(lam2),
                        math.sin(phi2),
                    ]
                )
            )
        for k in range(3):
            verts_all[t, k] = verts[k]
            n = np.cross(verts[k], verts[(k + 1) % 3])
            poles[t, k] = n / np.linalg.norm(n)
    return centers, poles, verts_all


_FACE_CENTERS, _EDGE_POLES, _FACE_VERTS = _face_tables()

_FWD_CACHE: list = []  # compiled once per worker process


def _isea_fwd():
    if not _FWD_CACHE:
        from ..crs import CRS
        from ..kernels.extra9 import setup_isea

        _FWD_CACHE.append(setup_isea(CRS.from_proj4("+proj=isea +R=1")).fwd)
    return _FWD_CACHE[0]


def isea_xy_edge(
    lam_rad: np.ndarray, phi_rad: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(x, y, edge_rad): ISEA plane coords (unit-sphere units, via the
    registered kernel) + a LOWER BOUND on each point's geodesic
    distance (radians) to the nearest icosahedron face edge.

    The rotation into the icosahedron frame replays the kernel's
    isea_ctran (kernels/extra9.py:setup_isea, ref PJ_isea.c
    snyder_ctran) for the standard orientation; face containment is
    the Voronoi argmin over face centers (exact — see module doc);
    the bound is min over the face's 3 edge GREAT CIRCLES, <= the
    distance to the edge arcs themselves."""
    from ..kernels.extra9 import ISEA_STD_LAT, ISEA_STD_LON

    x, y = _isea_fwd()(lam_rad, phi_rad)

    # isea_ctran, vectorized (o_az = 0 for the standard orientation)
    alpha, beta = ISEA_STD_LAT, ISEA_STD_LON + math.pi
    cos_p = np.cos(phi_rad)
    sin_a, cos_a = math.sin(alpha), math.cos(alpha)
    sin_phip = sin_a * np.sin(phi_rad) - cos_a * cos_p * np.cos(lam_rad - beta)
    lambdap = np.arctan2(
        cos_p * np.sin(lam_rad - beta),
        sin_a * cos_p * np.cos(lam_rad - beta) + cos_a * np.sin(phi_rad),
    ) + beta
    lambdap = lambdap - (math.pi - 0.0 + ISEA_STD_LON) + math.pi
    phip = np.arcsin(np.clip(sin_phip, -1.0, 1.0))

    p = np.stack(
        [np.cos(phip) * np.cos(lambdap), np.cos(phip) * np.sin(lambdap), sin_phip],
        axis=1,
    )  # (n, 3) unit vectors in the icosahedron frame
    tri = np.argmax(p @ _FACE_CENTERS[1:].T, axis=1) + 1  # Voronoi face
    dots = np.einsum("nj,nkj->nk", p, _EDGE_POLES[tri])  # (n, 3)
    edge_rad = np.abs(np.arcsin(np.clip(dots, -1.0, 1.0))).min(axis=1)
    return x, y, edge_rad


_ISEA_SCHEMA = StructType(
    [
        StructField("x", DoubleType()),
        StructField("y", DoubleType()),
        StructField("edge_rad", DoubleType()),
    ]
)


def isea_plane_udf():
    """pandas UDF ``(lon_deg, lat_deg) -> struct<x, y, edge_rad>``
    over :func:`isea_xy_edge` (Arrow-batched; the Snyder forward is
    vectorized numpy, kernels/extra9.py)."""

    @F.pandas_udf(_ISEA_SCHEMA)
    def _udf(it: Iterator[Tuple[pd.Series, pd.Series]]) -> Iterator[pd.DataFrame]:
        for lon, lat in it:
            lam = np.radians(lon.to_numpy(np.float64))
            phi = np.radians(lat.to_numpy(np.float64))
            x, y, e = isea_xy_edge(lam, phi)
            yield pd.DataFrame({"x": x, "y": y, "edge_rad": e})

    return _udf


def isea_hex_cell_cols(df, lon: str, lat: str, size_plane: float, prefix: str = "_ea"):
    """Append ``{prefix}x/{prefix}y/{prefix}edge/{prefix}cell`` to
    ``df``: ISEA plane coords, edge guard, and the hex cell id of
    circumradius ``size_plane`` (unit-sphere plane units; 1 unit =
    EARTH_RADIUS_M meters on the ground to within [0.86, 1.17])."""
    out = df.withColumn("_isea", isea_plane_udf()(F.col(lon), F.col(lat)))
    return (
        out.withColumn(prefix + "x", F.col("_isea.x"))
        .withColumn(prefix + "y", F.col("_isea.y"))
        .withColumn(prefix + "edge", F.col("_isea.edge_rad"))
        .drop("_isea")
        .withColumn(
            prefix + "cell", H.hex_cell(prefix + "x", prefix + "y", size_plane)
        )
    )


def meters_to_plane(size_m: float) -> float:
    """Nominal ground meters -> ISEA plane units (unit sphere)."""
    return size_m / EARTH_RADIUS_M
