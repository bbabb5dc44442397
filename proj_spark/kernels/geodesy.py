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
