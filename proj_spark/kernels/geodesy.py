"""Geocentric (ECEF) conversions and Helmert datum shifts, vectorized.

Behavioral reference: /root/reference/src/geocent.c (Convert_Geodetic_
To_Geocentric :148-210, iterative Convert_Geocentric_To_Geodetic
:315-434) and src/pj_transform.c pj_geocentric_to_wgs84 /
pj_geocentric_from_wgs84 (:502-592).
"""
from __future__ import annotations

import numpy as np

PI_OVER_2 = 1.5707963267948966
_GENAU = 1.0e-12
_GENAU2 = _GENAU * _GENAU
_MAXITER = 30


def geodetic_to_geocentric(lam, phi, h, a: float, es: float):
    """lon/lat (radians) + ellipsoidal height (m) -> ECEF x,y,z (m)."""
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    h = np.asarray(h, dtype=np.float64)
    # clamp slightly-overrange latitudes (geocent.c:180-186)
    phi = np.where((phi < -PI_OVER_2) & (phi > -1.001 * PI_OVER_2), -PI_OVER_2, phi)
    phi = np.where((phi > PI_OVER_2) & (phi < 1.001 * PI_OVER_2), PI_OVER_2, phi)
    bad = (phi < -PI_OVER_2) | (phi > PI_OVER_2)
    lam = np.where(lam > np.pi, lam - 2.0 * np.pi, lam)
    sin_lat = np.sin(phi)
    cos_lat = np.cos(phi)
    rn = a / np.sqrt(1.0 - es * sin_lat * sin_lat)
    x = (rn + h) * cos_lat * np.cos(lam)
    y = (rn + h) * cos_lat * np.sin(lam)
    z = (rn * (1.0 - es) + h) * sin_lat
    nan = np.nan
    return (
        np.where(bad, nan, x),
        np.where(bad, nan, y),
        np.where(bad, nan, z),
    )


def geocentric_to_geodetic(x, y, z, a: float, es: float):
    """ECEF -> lon/lat/h, iterative method (geocent.c:315-434,
    USE_ITERATIVE_METHOD), masked-lane vectorization with identical
    convergence criterion (sin dphi ^2 <= 1e-24, <=30 iter)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    p = np.hypot(x, y)
    rr = np.sqrt(x * x + y * y + z * z)

    at_pole = p / a < _GENAU
    at_center = at_pole & (rr / a < _GENAU)

    lam = np.where(at_pole, 0.0, np.arctan2(y, x))

    ct = np.divide(z, rr, out=np.zeros_like(z), where=rr != 0)
    st = np.divide(p, rr, out=np.zeros_like(p), where=rr != 0)
    rx = 1.0 / np.sqrt(1.0 - es * (2.0 - es) * st * st)
    cphi0 = st * (1.0 - es) * rx
    sphi0 = ct * rx

    cphi = cphi0.copy()
    sphi = sphi0.copy()
    height = np.zeros_like(z)
    active = ~at_center
    for _ in range(_MAXITER):
        if not np.any(active):
            break
        sp0 = sphi0[active]
        cp0 = cphi0[active]
        rn = a / np.sqrt(1.0 - es * sp0 * sp0)
        h = p[active] * cp0 + z[active] * sp0 - rn * (1.0 - es * sp0 * sp0)
        rk = es * rn / (rn + h)
        rx_ = 1.0 / np.sqrt(1.0 - rk * (2.0 - rk) * st[active] * st[active])
        cp = st[active] * (1.0 - rk) * rx_
        sp = ct[active] * rx_
        sdphi = sp * cp0 - cp * sp0
        height[active] = h
        cphi[active] = cp
        sphi[active] = sp
        cphi0[active] = cp
        sphi0[active] = sp
        conv = sdphi * sdphi <= _GENAU2
        idx = np.flatnonzero(active)
        active[idx[conv]] = False

    with np.errstate(divide="ignore"):  # pole: atan(inf) = pi/2, intended
        phi = np.arctan(sphi / np.abs(cphi))
    phi = np.where(at_center, PI_OVER_2, phi)
    b = a * np.sqrt(1.0 - es)
    height = np.where(at_center, -b, height)
    return lam, phi, height


def helmert_to_wgs84(x, y, z, params):
    """Apply 3- or 7-parameter shift toward WGS84
    (pj_geocentric_to_wgs84, src/pj_transform.c:502-544).  ``params``
    is the compiled 7-tuple (dx,dy,dz,rx,ry,rz,m) with rotations in
    radians and m already 1+ppm*1e-6; 3-param iff rotations+scale are
    identity."""
    dx, dy, dz, rx, ry, rz, mm = params
    if rx == 0.0 and ry == 0.0 and rz == 0.0 and (mm == 0.0 or mm == 1.0):
        return x + dx, y + dy, z + dz
    x_out = mm * (x - rz * y + ry * z) + dx
    y_out = mm * (rz * x + y - rx * z) + dy
    z_out = mm * (-ry * x + rx * y + z) + dz
    return x_out, y_out, z_out


def helmert_from_wgs84(x, y, z, params):
    """Inverse shift (pj_geocentric_from_wgs84, src/pj_transform.c:550-592)."""
    dx, dy, dz, rx, ry, rz, mm = params
    if rx == 0.0 and ry == 0.0 and rz == 0.0 and (mm == 0.0 or mm == 1.0):
        return x - dx, y - dy, z - dz
    x_tmp = (x - dx) / mm
    y_tmp = (y - dy) / mm
    z_tmp = (z - dz) / mm
    x_out = x_tmp + rz * y_tmp - ry * z_tmp
    y_out = -rz * x_tmp + y_tmp + rx * z_tmp
    z_out = ry * x_tmp - rx * y_tmp + z_tmp
    return x_out, y_out, z_out


def vincenty_inverse(lat1, lon1, lat2, lon2, a: float = 6378137.0, f: float = 1.0 / 298.257223563):
    """Classic Vincenty inverse iteration (public-domain algorithm),
    kept as an INDEPENDENT cross-check implementation: the production
    path is the Karney port (kernels/karney.py, re-exported below as
    ``geod_inverse``), and the DuckDB oracles use this one to generate
    golden tables so the two algorithms validate each other.  Accuracy
    ~1e-4 m away from the antipodal region; a haversine distance (with
    NaN azimuths, so degraded lanes are detectable) substitutes for the
    non-converging near-antipodal lanes.
    """
    d2r = np.pi / 180.0
    lat1 = np.asarray(lat1, np.float64) * d2r
    lat2 = np.asarray(lat2, np.float64) * d2r
    dlon = (np.asarray(lon2, np.float64) - np.asarray(lon1, np.float64)) * d2r
    b = a * (1.0 - f)

    U1 = np.arctan((1.0 - f) * np.tan(lat1))
    U2 = np.arctan((1.0 - f) * np.tan(lat2))
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)
    L = np.arctan2(np.sin(dlon), np.cos(dlon))  # wrap to [-pi, pi]

    lam = L.copy()
    active = np.ones_like(lam, dtype=bool)
    sin_sigma = np.zeros_like(lam)
    cos_sigma = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    sin_alpha = np.zeros_like(lam)
    cos_sq_alpha = np.ones_like(lam)
    cos2sm = np.ones_like(lam)
    for _ in range(50):
        if not active.any():
            break
        sinl, cosl = np.sin(lam), np.cos(lam)
        t1 = cosU2 * sinl
        t2 = cosU1 * sinU2 - sinU1 * cosU2 * cosl
        ss = np.sqrt(t1 * t1 + t2 * t2)
        cs = sinU1 * sinU2 + cosU1 * cosU2 * cosl
        sg = np.arctan2(ss, cs)
        with np.errstate(divide="ignore", invalid="ignore"):
            sa = np.where(ss != 0.0, cosU1 * cosU2 * sinl / np.where(ss == 0.0, 1.0, ss), 0.0)
        csa = 1.0 - sa * sa
        with np.errstate(divide="ignore", invalid="ignore"):
            c2 = np.where(csa != 0.0, cs - 2.0 * sinU1 * sinU2 / np.where(csa == 0.0, 1.0, csa), 0.0)
        C = f / 16.0 * csa * (4.0 + f * (4.0 - 3.0 * csa))
        lam_new = L + (1.0 - C) * f * sa * (
            sg + C * ss * (c2 + C * cs * (-1.0 + 2.0 * c2 * c2))
        )
        upd = active
        sin_sigma = np.where(upd, ss, sin_sigma)
        cos_sigma = np.where(upd, cs, cos_sigma)
        sigma = np.where(upd, sg, sigma)
        sin_alpha = np.where(upd, sa, sin_alpha)
        cos_sq_alpha = np.where(upd, csa, cos_sq_alpha)
        cos2sm = np.where(upd, c2, cos2sm)
        converged = np.abs(lam_new - lam) < 1e-12
        lam = np.where(upd, lam_new, lam)
        active = active & ~converged

    u_sq = cos_sq_alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u_sq / 16384.0 * (4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq)))
    B = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))
    dsig = B * sin_sigma * (
        cos2sm
        + B / 4.0 * (
            cos_sigma * (-1.0 + 2.0 * cos2sm * cos2sm)
            - B / 6.0 * cos2sm * (-3.0 + 4.0 * sin_sigma * sin_sigma) * (-3.0 + 4.0 * cos2sm * cos2sm)
        )
    )
    s12 = b * A * (sigma - dsig)

    # haversine fallback for lanes still active (near-antipodal)
    if active.any():
        R = (2.0 * a + b) / 3.0
        h = (
            np.sin((lat2 - lat1) / 2) ** 2
            + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
        )
        s_h = 2.0 * R * np.arcsin(np.minimum(np.sqrt(h), 1.0))
        s12 = np.where(active, s_h, s12)

    sinl, cosl = np.sin(lam), np.cos(lam)
    azi1 = np.arctan2(cosU2 * sinl, cosU1 * sinU2 - sinU1 * cosU2 * cosl) / d2r
    azi2 = np.arctan2(cosU1 * sinl, -sinU1 * cosU2 + cosU1 * sinU2 * cosl) / d2r
    # azimuths from an unconverged lambda are meaningless: return NaN so
    # callers can detect the degraded (haversine-distance-only) lanes
    if active.any():
        azi1 = np.where(active, np.nan, azi1)
        azi2 = np.where(active, np.nan, azi2)
    # coincident points
    coincident = (np.abs(dlon) < 1e-15) & (np.abs(lat1 - lat2) < 1e-15)
    s12 = np.where(coincident, 0.0, s12)
    azi1 = np.where(coincident, 0.0, azi1)
    azi2 = np.where(coincident, 0.0, azi2)
    return s12, azi1, azi2


def vincenty_direct(lat1, lon1, azi1, s12, a: float = 6378137.0, f: float = 1.0 / 298.257223563):
    """Vincenty direct formulation, kept as the independent
    cross-check twin of :func:`vincenty_inverse`; production path is
    the Karney port (re-exported below)."""
    d2r = np.pi / 180.0
    lat1 = np.asarray(lat1, np.float64) * d2r
    lon1 = np.asarray(lon1, np.float64)
    alpha1 = np.asarray(azi1, np.float64) * d2r
    s = np.asarray(s12, np.float64)
    b = a * (1.0 - f)

    tanU1 = (1.0 - f) * np.tan(lat1)
    cosU1 = 1.0 / np.sqrt(1.0 + tanU1 * tanU1)
    sinU1 = tanU1 * cosU1
    sina1, cosa1 = np.sin(alpha1), np.cos(alpha1)
    sigma1 = np.arctan2(tanU1, cosa1)
    sin_alpha = cosU1 * sina1
    cos_sq_alpha = 1.0 - sin_alpha * sin_alpha
    u_sq = cos_sq_alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u_sq / 16384.0 * (4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq)))
    B = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))

    sigma = s / (b * A)
    for _ in range(30):
        cos2sm = np.cos(2.0 * sigma1 + sigma)
        sin_sig, cos_sig = np.sin(sigma), np.cos(sigma)
        dsig = B * sin_sig * (
            cos2sm
            + B / 4.0 * (
                cos_sig * (-1.0 + 2.0 * cos2sm * cos2sm)
                - B / 6.0 * cos2sm * (-3.0 + 4.0 * sin_sig * sin_sig) * (-3.0 + 4.0 * cos2sm * cos2sm)
            )
        )
        sigma_new = s / (b * A) + dsig
        if np.all(np.abs(sigma_new - sigma) < 1e-12):
            sigma = sigma_new
            break
        sigma = sigma_new
    cos2sm = np.cos(2.0 * sigma1 + sigma)
    sin_sig, cos_sig = np.sin(sigma), np.cos(sigma)

    tmp = sinU1 * sin_sig - cosU1 * cos_sig * cosa1
    lat2 = np.arctan2(
        sinU1 * cos_sig + cosU1 * sin_sig * cosa1,
        (1.0 - f) * np.sqrt(sin_alpha * sin_alpha + tmp * tmp),
    )
    lam = np.arctan2(sin_sig * sina1, cosU1 * cos_sig - sinU1 * sin_sig * cosa1)
    C = f / 16.0 * cos_sq_alpha * (4.0 + f * (4.0 - 3.0 * cos_sq_alpha))
    L = lam - (1.0 - C) * f * sin_alpha * (
        sigma + C * sin_sig * (cos2sm + C * cos_sig * (-1.0 + 2.0 * cos2sm * cos2sm))
    )
    lon2 = lon1 + L / d2r
    lon2 = lon2 - 360.0 * np.floor((lon2 + 180.0) / 360.0)
    azi2 = np.arctan2(sin_alpha, -tmp) / d2r
    return lat2 / d2r, lon2, azi2


# Production geodesic path: round-off-accurate Karney algorithms
# (kernels/karney.py, ref src/geodesic.c:590,944), incl. antipodal.
from .karney import (  # noqa: E402
    geod_direct,
    geod_inverse,
    geod_polygon_area,
)

__all__ = [
    "geodetic_to_geocentric",
    "geocentric_to_geodetic",
    "helmert_to_wgs84",
    "helmert_from_wgs84",
    "geod_inverse",
    "geod_direct",
    "geod_polygon_area",
    "vincenty_inverse",
    "vincenty_direct",
]
