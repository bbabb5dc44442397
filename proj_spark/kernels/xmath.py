"""Shared ellipsoidal math helpers, vectorized with numpy.

Semantics follow the classic PROJ.4 helper functions (behavioral
reference: /root/reference/src/pj_mlfn.c, pj_tsfn.c, pj_msfn.c,
pj_phi2.c, pj_qsfn.c, adjlon.c, aasincos.c).  All functions accept and
return float64 numpy arrays (or scalars) and use *masked* iteration so
that a converged lane stops updating exactly like the scalar reference
loops — iterating a converged lane would perturb the last ulp.
"""
from __future__ import annotations

import numpy as np

HALFPI = 1.5707963267948966
FORTPI = 0.78539816339744833
PI = 3.14159265358979323846
TWOPI = 6.2831853071795864769
# deliberately truncated constant used by the reference's adjlon guard
# (src/adjlon.c:5 "SPI")
SPI = 3.14159265359
DEG_TO_RAD = 0.0174532925199432958
RAD_TO_DEG = 57.29577951308232
SEC_TO_RAD = 4.84813681109535993589914102357e-6

# pj_mlfn.c series coefficients (meridional distance, 8th degree)
_C00 = 1.0
_C02 = 0.25
_C04 = 0.046875
_C06 = 0.01953125
_C08 = 0.01068115234375
_C22 = 0.75
_C44 = 0.46875
_C46 = 0.01302083333333333333
_C48 = 0.00712076822916666666
_C66 = 0.36458333333333333333
_C68 = 0.00569661458333333333
_C88 = 0.3076171875

_MLFN_EPS = 1e-11
_MLFN_MAX_ITER = 10
_PHI2_TOL = 1.0e-10
_PHI2_NITER = 15


def adjlon(lon):
    """Reduce longitude to +/- pi (src/adjlon.c:10-15)."""
    lon = np.asarray(lon, dtype=np.float64)
    out = lon.copy()
    m = np.abs(lon) > SPI
    if np.any(m):
        t = lon[m] + PI
        t -= TWOPI * np.floor(t / TWOPI)
        t -= PI
        out[m] = t
    return out


def enfn(es: float) -> tuple[float, float, float, float, float]:
    """Meridional-distance series constants (src/pj_mlfn.c pj_enfn)."""
    t = es * es
    en0 = _C00 - es * (_C02 + es * (_C04 + es * (_C06 + es * _C08)))
    en1 = es * (_C22 - es * (_C04 + es * (_C06 + es * _C08)))
    en2 = t * (_C44 - es * (_C46 + es * _C48))
    t = t * es
    en3 = t * (_C66 - es * _C68)
    en4 = t * es * _C88
    return (en0, en1, en2, en3, en4)


def mlfn(phi, sphi, cphi, en):
    """Meridional distance (src/pj_mlfn.c pj_mlfn)."""
    cphi = cphi * sphi
    sphi = sphi * sphi
    return en[0] * phi - cphi * (en[1] + sphi * (en[2] + sphi * (en[3] + sphi * en[4])))


def inv_mlfn(arg, es: float, en):
    """Newton inverse of mlfn; masked-lane vectorization of
    src/pj_mlfn.c pj_inv_mlfn (<=10 iterations, EPS 1e-11)."""
    arg = np.asarray(arg, dtype=np.float64)
    k = 1.0 / (1.0 - es)
    phi = arg.copy()
    active = np.ones(phi.shape, dtype=bool)
    for _ in range(_MLFN_MAX_ITER):
        if not np.any(active):
            break
        p = phi[active]
        s = np.sin(p)
        t = 1.0 - es * s * s
        t = (mlfn(p, s, np.cos(p), en) - arg[active]) * (t * np.sqrt(t)) * k
        p -= t
        phi[active] = p
        conv = np.abs(t) < _MLFN_EPS
        idx = np.flatnonzero(active)
        active[idx[conv]] = False
    return phi


def tsfn(phi, sinphi, e: float):
    """Conformal small-t (src/pj_tsfn.c)."""
    sinphi = sinphi * e
    return np.tan(0.5 * (HALFPI - phi)) / np.power((1.0 - sinphi) / (1.0 + sinphi), 0.5 * e)


def msfn(sinphi, cosphi, es: float):
    """Parallel radius small-m (src/pj_msfn.c)."""
    return cosphi / np.sqrt(1.0 - es * sinphi * sinphi)


def qsfn(sinphi, e: float, one_es: float):
    """Authalic small-q (src/pj_qsfn.c)."""
    if e >= 1.0e-7:
        con = e * np.asarray(sinphi, dtype=np.float64)
        return one_es * (sinphi / (1.0 - con * con) - (0.5 / e) * np.log((1.0 - con) / (1.0 + con)))
    return np.asarray(sinphi, dtype=np.float64) * 2.0


def phi2(ts, e: float):
    """Inverse isometric latitude; masked fixed-point vectorization of
    src/pj_phi2.c (TOL 1e-10, <=15 iterations).  Non-converging lanes
    return their last value (the scalar code also returns Phi after
    flagging errno)."""
    ts = np.asarray(ts, dtype=np.float64)
    eccnth = 0.5 * e
    Phi = HALFPI - 2.0 * np.arctan(ts)
    active = np.ones(Phi.shape, dtype=bool)
    for _ in range(_PHI2_NITER):
        if not np.any(active):
            break
        con = e * np.sin(Phi[active])
        dphi = (
            HALFPI
            - 2.0 * np.arctan(ts[active] * np.power((1.0 - con) / (1.0 + con), eccnth))
            - Phi[active]
        )
        Phi[active] = Phi[active] + dphi
        conv = np.abs(dphi) <= _PHI2_TOL
        idx = np.flatnonzero(active)
        active[idx[conv]] = False
    return Phi


def aasin(v):
    """Clamped arcsine (src/aasincos.c): values within 1e-10 beyond
    +/-1 clamp; farther out yield nan."""
    v = np.asarray(v, dtype=np.float64)
    av = np.abs(v)
    out = np.arcsin(np.clip(v, -1.0, 1.0))
    out = np.where(av - 1.0 > 1.0e-10, np.nan, out)
    return out


def aacos(v):
    v = np.asarray(v, dtype=np.float64)
    av = np.abs(v)
    out = np.arccos(np.clip(v, -1.0, 1.0))
    out = np.where(av - 1.0 > 1.0e-10, np.nan, out)
    return out


def asqrt(v):
    v = np.asarray(v, dtype=np.float64)
    return np.where(v <= 0.0, 0.0, np.sqrt(np.maximum(v, 0.0)))


def dms_param(v) -> float:
    """Parse a projection parameter that is an angle (r-type param,
    src/pj_param.c 'r' code): accepts a float, a decimal-degree
    string, or a DMS string; returns radians."""
    if isinstance(v, (int, float)):
        return float(v) * DEG_TO_RAD
    from ..crs import dmstor  # local import to avoid cycle at module load

    try:
        return dmstor(str(v))
    except ValueError:
        # the reference's dmstor consumes nothing and returns 0 for a
        # non-numeric string (dmstor.c:41 loop never entered, no errno)
        # — parameter parsing must share that tolerance (e.g. the
        # unsubstituted LON_POLE/LAT_POLE in nad/testvarious:557)
        return 0.0


def aatan2(y, x):
    """Tolerant atan2 (src/aasincos.c aatan2): zero when both args ~0."""
    return np.arctan2(y, x)
