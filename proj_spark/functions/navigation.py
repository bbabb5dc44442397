"""Spherical navigation expressions: bearing, cross-track, along-track.

The classic great-circle navigation trio (aviation formulary; the
spherical fast path to the reference's geodesic suite,
src/geodesic.c:944):

- initial bearing  theta12 = atan2(sin(dlon)cos(lat2),
                    cos(lat1)sin(lat2) - sin(lat1)cos(lat2)cos(dlon))
- cross-track      dxt = asin(sin(d13) * sin(theta13 - theta12)) * R
- along-track      dat = acos(cos(d13) / cos(dxt / R)) * R

where d13 is the central angle from the route start to the point
(haversine form).  Signed cross-track: positive means the point lies
RIGHT of the route direction (bearings clockwise from north, so a
point at smaller bearing than the course is left/negative).

Each Column expression has a token-identical SQL mirror so the DuckDB
oracle evaluates the same double tree; outputs are floor-quantized by
the callers at meter scale, far coarser than cross-engine libm drift.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernels.xmath import DEG_TO_RAD

EARTH_RADIUS_M = 6371008.8
_D = repr(DEG_TO_RAD)
_R = repr(EARTH_RADIUS_M)


def _rad(deg: Column) -> Column:
    return deg * F.lit(DEG_TO_RAD)


def central_angle(lon1, lat1, lon2, lat2) -> Column:
    """Central angle (radians) via the stable haversine form."""
    p1, p2 = _rad(lat1), _rad(lat2)
    dlat = (p2 - p1) * 0.5
    dlon = (_rad(lon2) - _rad(lon1)) * 0.5
    h = F.sin(dlat) * F.sin(dlat) + F.cos(p1) * F.cos(p2) * F.sin(dlon) * F.sin(dlon)
    return F.lit(2.0) * F.asin(F.sqrt(F.least(h, F.lit(1.0))))


def central_angle_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    p1, p2 = f"(({lat1}) * {_D})", f"(({lat2}) * {_D})"
    dlat = f"(({p2}) - ({p1})) * 0.5"
    dlon = f"((({lon2}) * {_D}) - (({lon1}) * {_D})) * 0.5"
    h = (
        f"sin({dlat}) * sin({dlat}) + cos({p1}) * cos({p2})"
        f" * sin({dlon}) * sin({dlon})"
    )
    return f"2.0 * asin(sqrt(least({h}, 1.0)))"


def bearing(lon1, lat1, lon2, lat2) -> Column:
    """Initial great-circle bearing from point 1 to point 2, radians
    in (-pi, pi] measured clockwise from north."""
    p1, p2 = _rad(lat1), _rad(lat2)
    dlon = _rad(lon2) - _rad(lon1)
    y = F.sin(dlon) * F.cos(p2)
    x = F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dlon)
    return F.atan2(y, x)


def bearing_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    p1, p2 = f"(({lat1}) * {_D})", f"(({lat2}) * {_D})"
    dlon = f"(({lon2}) * {_D}) - (({lon1}) * {_D})"
    y = f"sin({dlon}) * cos({p2})"
    x = f"cos({p1}) * sin({p2}) - sin({p1}) * cos({p2}) * cos({dlon})"
    return f"atan2({y}, {x})"


def cross_track_m(rlon1, rlat1, rlon2, rlat2, plon, plat) -> Column:
    """Signed cross-track distance (meters) of point P from the great
    circle through route start (1) -> route end (2)."""
    d13 = central_angle(rlon1, rlat1, plon, plat)
    t13 = bearing(rlon1, rlat1, plon, plat)
    t12 = bearing(rlon1, rlat1, rlon2, rlat2)
    s = F.least(F.greatest(F.sin(d13) * F.sin(t13 - t12), F.lit(-1.0)), F.lit(1.0))
    return F.asin(s) * F.lit(EARTH_RADIUS_M)


def cross_track_sql(rlon1, rlat1, rlon2, rlat2, plon, plat) -> str:
    d13 = central_angle_sql(rlon1, rlat1, plon, plat)
    t13 = bearing_sql(rlon1, rlat1, plon, plat)
    t12 = bearing_sql(rlon1, rlat1, rlon2, rlat2)
    s = f"least(greatest(sin({d13}) * sin(({t13}) - ({t12})), -1.0), 1.0)"
    return f"asin({s}) * {_R}"


def along_track_m(rlon1, rlat1, rlon2, rlat2, plon, plat) -> Column:
    """Along-track distance (meters): how far along the route the foot
    of the perpendicular from P lies (always >= 0 on the near half)."""
    d13 = central_angle(rlon1, rlat1, plon, plat)
    dxt = cross_track_m(rlon1, rlat1, rlon2, rlat2, plon, plat) / F.lit(EARTH_RADIUS_M)
    c = F.least(F.greatest(F.cos(d13) / F.cos(dxt), F.lit(-1.0)), F.lit(1.0))
    return F.acos(c) * F.lit(EARTH_RADIUS_M)


def along_track_sql(rlon1, rlat1, rlon2, rlat2, plon, plat) -> str:
    d13 = central_angle_sql(rlon1, rlat1, plon, plat)
    dxt = f"({cross_track_sql(rlon1, rlat1, rlon2, rlat2, plon, plat)}) / {_R}"
    c = f"least(greatest(cos({d13}) / cos({dxt}), -1.0), 1.0)"
    return f"acos({c}) * {_R}"
