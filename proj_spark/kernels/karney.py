"""Karney geodesic algorithms (direct / inverse / polygon area),
vectorized over numpy lanes.

Behavioral reference: /root/reference/src/geodesic.c (public-domain
implementation of C. F. F. Karney, "Algorithms for geodesics",
J. Geodesy 87, 43-55 (2013), https://doi.org/10.1007/s00190-012-0578-z).
This module re-derives the algorithm paper-first for SIMD-style numpy
execution: every scalar branch of the C code becomes a masked lane
(np.where), and the Newton iteration for the inverse problem runs all
lanes together with per-lane bracketing, exactly mirroring the
convergence policy of geod_geninverse (geodesic.c:598-944):

- 6th-order series in eps (GEOGRAPHICLIB_GEODESIC_ORDER 6); the series
  coefficient tables are the published constants from the paper's
  appendix and must match to be correct.
- canonical form: |lat1| >= |lat2|, lat1 <= 0, 0 <= lon12 <= 180
  (geodesic.c:627-651)
- meridian / equatorial / general-case split (geodesic.c:693-745)
- InverseStart short-line + astroid starting guess (geodesic.c:1069)
- bracketed Newton on alp1 with midpoint fallback (geodesic.c:767-835)
- round-off-accurate up to and including near-antipodal pairs (the
  Vincenty non-convergence region).

Accuracy: ~15 nanometers on WGS84 (the series truncation bound).
"""
from __future__ import annotations

import math

import numpy as np

_ORD = 6
_EPSILON = np.finfo(np.float64).eps
_TINY = math.sqrt(np.finfo(np.float64).tiny)
_TOL0 = _EPSILON
_TOL1 = 200.0 * _TOL0
_TOL2 = math.sqrt(_TOL0)
_TOLB = _TOL0 * _TOL2
_XTHRESH = 1000.0 * _TOL2
_MAXIT1 = 20
_MAXIT2 = _MAXIT1 + 53 + 10
_D2R = math.pi / 180.0

# ---------------------------------------------------------------- series
# Published coefficient tables (Karney 2013 appendix; geodesic.c:1380-1620)
_A1_COEFF = (1.0, 4.0, 64.0, 0.0, 256.0)
_C1_COEFF = (
    -1.0, 6.0, -16.0, 32.0,
    -9.0, 64.0, -128.0, 2048.0,
    9.0, -16.0, 768.0,
    3.0, -5.0, 512.0,
    -7.0, 1280.0,
    -7.0, 2048.0,
)
_C1P_COEFF = (
    205.0, -432.0, 768.0, 1536.0,
    4005.0, -4736.0, 3840.0, 12288.0,
    -225.0, 116.0, 384.0,
    -7173.0, 2695.0, 7680.0,
    3467.0, 7680.0,
    38081.0, 61440.0,
)
_A2_COEFF = (25.0, 36.0, 64.0, 0.0, 256.0)
_C2_COEFF = (
    1.0, 2.0, 16.0, 32.0,
    35.0, 64.0, 384.0, 2048.0,
    15.0, 80.0, 768.0,
    7.0, 35.0, 512.0,
    63.0, 1280.0,
    77.0, 2048.0,
)
_A3_COEFF = (
    -3.0, 128.0,
    -2.0, -3.0, 64.0,
    -1.0, -3.0, -1.0, 16.0,
    3.0, -1.0, -2.0, 8.0,
    1.0, -1.0, 2.0,
    1.0, 1.0,
)
_C3_COEFF = (
    3.0, 128.0,
    2.0, 5.0, 128.0,
    -1.0, 3.0, 3.0, 64.0,
    -1.0, 0.0, 1.0, 8.0,
    -1.0, 1.0, 4.0,
    5.0, 256.0,
    1.0, 3.0, 128.0,
    -3.0, -2.0, 3.0, 64.0,
    1.0, -3.0, 2.0, 32.0,
    7.0, 512.0,
    -10.0, 9.0, 384.0,
    5.0, -9.0, 5.0, 192.0,
    7.0, 512.0,
    -14.0, 7.0, 512.0,
    21.0, 2560.0,
)
_C4_COEFF = (
    97.0, 15015.0,
    1088.0, 156.0, 45045.0,
    -224.0, -4784.0, 1573.0, 45045.0,
    -10656.0, 14144.0, -4576.0, -858.0, 45045.0,
    64.0, 624.0, -4576.0, 6864.0, -3003.0, 15015.0,
    100.0, 208.0, 572.0, 3432.0, -12012.0, 30030.0, 45045.0,
    1.0, 9009.0,
    -2944.0, 468.0, 135135.0,
    5792.0, 1040.0, -1287.0, 135135.0,
    5952.0, -11648.0, 9152.0, -2574.0, 135135.0,
    -64.0, -624.0, 4576.0, -6864.0, 3003.0, 135135.0,
    8.0, 10725.0,
    1856.0, -936.0, 225225.0,
    -8448.0, 4992.0, -1144.0, 225225.0,
    -1440.0, 4160.0, -4576.0, 1716.0, 225225.0,
    -136.0, 63063.0,
    1024.0, -208.0, 105105.0,
    3584.0, -3328.0, 1144.0, 315315.0,
    -128.0, 135135.0,
    -2560.0, 832.0, 405405.0,
    128.0, 99099.0,
)


def _polyval(coeffs, x):
    """Horner over scalar coefficient list; x may be an array."""
    y = None
    for c in coeffs:
        y = c if y is None else y * x + c
    return y if y is not None else 0.0


def _a1m1f(eps):
    m = _ORD // 2
    t = _polyval(_A1_COEFF[: m + 1], eps * eps) / _A1_COEFF[m + 1]
    return (t + eps) / (1.0 - eps)


def _a2m1f(eps):
    m = _ORD // 2
    t = _polyval(_A2_COEFF[: m + 1], eps * eps) / _A2_COEFF[m + 1]
    return t * (1.0 - eps) - eps


def _fourier_coeffs(table, eps):
    """C1 / C1p / C2 layout: c[l] = eps^l * poly(eps^2) / denom,
    l = 1.._ORD.  Returns array of shape (ORD+1,) + eps.shape with
    slot 0 unused."""
    eps = np.asarray(eps, np.float64)
    c = np.zeros((_ORD + 1,) + eps.shape)
    eps2 = eps * eps
    d = eps.copy()
    o = 0
    for ell in range(1, _ORD + 1):
        m = (_ORD - ell) // 2
        c[ell] = d * _polyval(table[o : o + m + 1], eps2) / table[o + m + 1]
        o += m + 2
        d = d * eps
    return c


def _c1f(eps):
    return _fourier_coeffs(_C1_COEFF, eps)


def _c1pf(eps):
    return _fourier_coeffs(_C1P_COEFF, eps)


def _c2f(eps):
    return _fourier_coeffs(_C2_COEFF, eps)


def _sincos_series(sinp: bool, sinx, cosx, c):
    """Clenshaw sum (geodesic.c SinCosSeries):
    sinp: sum(c[l] sin(2 l x), l=1..n); else sum(c[l] cos((2l+1)x), l=0..n-1).
    ``c`` has shape (k, ...) with slot 0 unused when sinp."""
    n = c.shape[0] - (1 if sinp else 0)
    p = n + (1 if sinp else 0)  # one past last used element
    ar = 2.0 * (cosx - sinx) * (cosx + sinx)
    if n & 1:
        p -= 1
        y0 = np.broadcast_to(c[p], np.shape(ar)).copy() if np.shape(ar) else c[p] + 0.0
    else:
        y0 = np.zeros_like(ar)
    y1 = np.zeros_like(ar)
    for _ in range(n // 2):
        p -= 1
        y1 = ar * y0 - y1 + c[p]
        p -= 1
        y0 = ar * y1 - y0 + c[p]
    if sinp:
        return 2.0 * sinx * cosx * y0
    return cosx * (y0 - y1)


# ---------------------------------------------------------------- helpers
def _norm2(s, c):
    r = np.hypot(s, c)
    return s / r, c / r


def _ang_normalize(x):
    x = np.where(x >= 180.0, x - 360.0, x)
    return np.where(x < -180.0, x + 360.0, x)


def _sum_exact(u, v):
    """Two-sum: u + v = s + t exactly."""
    s = u + v
    up = s - v
    vpp = s - up
    up = up - u
    vpp = vpp - v
    return s, -(up + vpp)


def _ang_diff(x, y):
    d, t = _sum_exact(_ang_normalize(-x), _ang_normalize(y))
    d = np.where((d - 180.0) + t > 0.0, d - 360.0, np.where((d + 180.0) + t <= 0.0, d + 360.0, d))
    return d + t


def _ang_round(x):
    z = 1.0 / 16.0
    y = np.abs(x)
    y = np.where(y < z, z - (z - y), y)
    return np.where(x < 0.0, -y, y)


class Geodesic:
    """Precomputed ellipsoid state (geod_init analog); cheap to build,
    safe to close over in pandas-UDF lambdas (plain floats/tuples)."""

    def __init__(self, a: float = 6378137.0, f: float = 1.0 / 298.257223563):
        self.a = a
        self.f = f if f <= 1.0 else 1.0 / f
        self.f1 = 1.0 - self.f
        self.e2 = self.f * (2.0 - self.f)
        self.ep2 = self.e2 / (self.f1 * self.f1)
        self.n = self.f / (2.0 - self.f)
        self.b = self.a * self.f1
        if self.e2 == 0.0:
            mult = 1.0
        elif self.e2 > 0.0:
            mult = math.atanh(math.sqrt(self.e2)) / math.sqrt(abs(self.e2))
        else:
            mult = math.atan(math.sqrt(-self.e2)) / math.sqrt(abs(self.e2))
        self.c2 = (self.a**2 + self.b**2 * mult) / 2.0  # authalic radius^2
        self.etol2 = 0.1 * _TOL2 / math.sqrt(
            max(0.001, abs(self.f)) * min(1.0, 1.0 - self.f / 2.0) / 2.0
        )
        # A3x: coefficients of eps^j (j descending handled in _a3f)
        n_ = self.n
        a3x = []
        o = 0
        for j in range(_ORD - 1, -1, -1):
            m = min(_ORD - j - 1, j)
            a3x.append(_polyval(_A3_COEFF[o : o + m + 1], n_) / _A3_COEFF[o + m + 1])
            o += m + 2
        self.A3x = tuple(a3x)
        c3x = []
        o = 0
        for ell in range(1, _ORD):
            for j in range(_ORD - 1, ell - 1, -1):
                m = min(_ORD - j - 1, j)
                c3x.append(_polyval(_C3_COEFF[o : o + m + 1], n_) / _C3_COEFF[o + m + 1])
                o += m + 2
        self.C3x = tuple(c3x)
        c4x = []
        o = 0
        for ell in range(_ORD):
            for j in range(_ORD - 1, ell - 1, -1):
                m = _ORD - j - 1
                c4x.append(_polyval(_C4_COEFF[o : o + m + 1], n_) / _C4_COEFF[o + m + 1])
                o += m + 2
        self.C4x = tuple(c4x)

    # -- per-eps series built from the per-ellipsoid tables
    def _a3f(self, eps):
        return _polyval(self.A3x, eps)

    def _c3f(self, eps):
        eps = np.asarray(eps, np.float64)
        c = np.zeros((_ORD,) + eps.shape)  # slots 1.._ORD-1 used
        mult = np.ones_like(eps)
        o = 0
        for ell in range(1, _ORD):
            m = _ORD - ell - 1
            mult = mult * eps
            c[ell] = mult * _polyval(self.C3x[o : o + m + 1], eps)
            o += m + 1
        return c

    def _c4f(self, eps):
        eps = np.asarray(eps, np.float64)
        c = np.zeros((_ORD,) + eps.shape)
        mult = np.ones_like(eps)
        o = 0
        for ell in range(_ORD):
            m = _ORD - ell - 1
            c[ell] = mult * _polyval(self.C4x[o : o + m + 1], eps)
            o += m + 1
            mult = mult * eps
        return c

    # ------------------------------------------------------------ lengths
    def _lengths(self, eps, sig12, ssig1, csig1, dn1, ssig2, csig2, dn2):
        """Returns (s12b, m12b, m0) — distance/b, reduced length/b and
        the secular coefficient (geodesic.c:972-1015, scalep=False)."""
        c1a = _c1f(eps)
        c2a = _c2f(eps)
        a1m1 = _a1m1f(eps)
        ab1 = (1.0 + a1m1) * (
            _sincos_series(True, ssig2, csig2, c1a) - _sincos_series(True, ssig1, csig1, c1a)
        )
        a2m1 = _a2m1f(eps)
        ab2 = (1.0 + a2m1) * (
            _sincos_series(True, ssig2, csig2, c2a) - _sincos_series(True, ssig1, csig1, c2a)
        )
        m0 = a1m1 - a2m1
        j12 = m0 * sig12 + (ab1 - ab2)
        m12b = dn2 * (csig1 * ssig2) - dn1 * (ssig1 * csig2) - csig1 * csig2 * j12
        s12b = (1.0 + a1m1) * sig12 + ab1
        return s12b, m12b, m0

    # ------------------------------------------------------------ inverse
    def inverse(self, lat1, lon1, lat2, lon2, want_area: bool = False):
        """Vectorized inverse problem: degrees in; returns
        (s12 meters, azi1 deg, azi2 deg[, S12 m^2 when want_area])."""
        lat1 = np.atleast_1d(np.asarray(lat1, np.float64))
        lon1 = np.atleast_1d(np.asarray(lon1, np.float64))
        lat2 = np.atleast_1d(np.asarray(lat2, np.float64))
        lon2 = np.atleast_1d(np.asarray(lon2, np.float64))
        f, f1, ep2, nthird = self.f, self.f1, self.ep2, self.n

        lon12 = _ang_round(_ang_diff(lon1, lon2))
        lonsign = np.where(lon12 >= 0.0, 1.0, -1.0)
        lon12 = lon12 * lonsign
        lat1c = _ang_round(lat1)
        lat2c = _ang_round(lat2)
        swapp = np.where(np.abs(lat1c) >= np.abs(lat2c), 1.0, -1.0)
        sw = swapp < 0
        lonsign = np.where(sw, -lonsign, lonsign)
        t1, t2 = lat1c.copy(), lat2c.copy()
        lat1c = np.where(sw, t2, t1)
        lat2c = np.where(sw, t1, t2)
        latsign = np.where(lat1c < 0.0, 1.0, -1.0)
        lat1c = lat1c * latsign
        lat2c = lat2c * latsign
        # canonical: 0 <= lon12 <= 180, -90 <= lat1 <= 0, lat1 <= lat2 <= -lat1

        phi = lat1c * _D2R
        sbet1 = f1 * np.sin(phi)
        cbet1 = np.where(lat1c == -90.0, _TINY, np.cos(phi))
        sbet1, cbet1 = _norm2(sbet1, cbet1)
        phi = lat2c * _D2R
        sbet2 = f1 * np.sin(phi)
        cbet2 = np.where(np.abs(lat2c) == 90.0, _TINY, np.cos(phi))
        sbet2, cbet2 = _norm2(sbet2, cbet2)
        # enforce symmetries when |bet2| == -bet1 (geodesic.c:676-681)
        m_lo = cbet1 < -sbet1
        sbet2 = np.where(
            m_lo & (cbet2 == cbet1), np.where(sbet2 < 0.0, sbet1, -sbet1), sbet2
        )
        cbet2 = np.where(~m_lo & (np.abs(sbet2) == -sbet1), cbet1, cbet2)

        dn1 = np.sqrt(1.0 + ep2 * sbet1 * sbet1)
        dn2 = np.sqrt(1.0 + ep2 * sbet2 * sbet2)
        lam12 = lon12 * _D2R
        slam12 = np.where(lon12 == 180.0, 0.0, np.sin(lam12))
        clam12 = np.cos(lam12)

        shape = lam12.shape
        s12x = np.zeros(shape)
        m12x = np.zeros(shape)
        sig12 = np.zeros(shape)
        calp1 = np.zeros(shape)
        salp1 = np.zeros(shape)
        calp2 = np.zeros(shape)
        salp2 = np.zeros(shape)
        omg12 = np.zeros(shape)

        meridian = (lat1c == -90.0) | (slam12 == 0.0)
        if np.any(meridian):
            mm = meridian
            calp1 = np.where(mm, clam12, calp1)
            salp1 = np.where(mm, slam12, salp1)
            calp2 = np.where(mm, 1.0, calp2)
            salp2 = np.where(mm, 0.0, salp2)
            ssig1 = sbet1
            csig1 = calp1 * cbet1
            ssig2 = sbet2
            csig2 = calp2 * cbet2
            sig12m = np.arctan2(
                np.maximum(csig1 * ssig2 - ssig1 * csig2, 0.0),
                csig1 * csig2 + ssig1 * ssig2,
            )
            s12b_m, m12b_m, _ = self._lengths(
                nthird, sig12m, ssig1, csig1, dn1, ssig2, csig2, dn2
            )
            # prolate near-antipodal fallback (geodesic.c:721-728)
            ok = (sig12m < 1.0) | (m12b_m >= 0.0)
            sig12 = np.where(mm & ok, sig12m, sig12)
            m12x = np.where(mm & ok, m12b_m * self.b, m12x)
            s12x = np.where(mm & ok, s12b_m * self.b, s12x)
            meridian = mm & ok

        eqline = (
            ~meridian
            & (sbet1 == 0.0)
            & ((f <= 0.0) | (lam12 <= math.pi - f * math.pi))
        )
        if np.any(eqline):
            calp1 = np.where(eqline, 0.0, calp1)
            calp2 = np.where(eqline, 0.0, calp2)
            salp1 = np.where(eqline, 1.0, salp1)
            salp2 = np.where(eqline, 1.0, salp2)
            s12x = np.where(eqline, self.a * lam12, s12x)
            sig12 = np.where(eqline, lam12 / f1, sig12)
            omg12 = np.where(eqline, lam12 / f1, omg12)
            m12x = np.where(eqline, self.b * np.sin(lam12 / f1), m12x)

        general = ~meridian & ~eqline
        if np.any(general):
            (sig12g, salp1g, calp1g, salp2g, calp2g, dnm, shortcut) = self._inverse_start(
                sbet1, cbet1, dn1, sbet2, cbet2, dn2, lam12
            )
            # short-line lanes solved directly by the start guess
            short = general & shortcut
            sig12 = np.where(short, sig12g, sig12)
            salp1 = np.where(general, salp1g, salp1)
            calp1 = np.where(general, calp1g, calp1)
            salp2 = np.where(short, salp2g, salp2)
            calp2 = np.where(short, calp2g, calp2)
            s12x = np.where(short, sig12g * self.b * dnm, s12x)
            m12x = np.where(short, dnm * dnm * self.b * np.sin(sig12g / dnm), m12x)
            omg12 = np.where(short, lam12 / (f1 * dnm), omg12)

            newton = general & ~shortcut
            if np.any(newton):
                (sig12n, salp1n, calp1n, salp2n, calp2n, s12xn, m12xn, omg12n) = (
                    self._newton(
                        newton, sbet1, cbet1, dn1, sbet2, cbet2, dn2, lam12,
                        salp1, calp1,
                    )
                )
                sig12 = np.where(newton, sig12n, sig12)
                salp1 = np.where(newton, salp1n, salp1)
                calp1 = np.where(newton, calp1n, calp1)
                salp2 = np.where(newton, salp2n, salp2)
                calp2 = np.where(newton, calp2n, calp2)
                s12x = np.where(newton, s12xn, s12x)
                m12x = np.where(newton, m12xn, m12x)
                omg12 = np.where(newton, omg12n, omg12)

        s12 = 0.0 + s12x

        S12 = None
        if want_area:
            S12 = self._area(
                meridian, sbet1, cbet1, sbet2, cbet2, salp1, calp1, salp2, calp2,
                omg12, swapp, lonsign, latsign,
            )

        # restore azimuths to the original point order / hemispheres
        sw = swapp < 0
        t1, t2 = salp1.copy(), salp2.copy()
        salp1 = np.where(sw, t2, t1)
        salp2 = np.where(sw, t1, t2)
        t1, t2 = calp1.copy(), calp2.copy()
        calp1 = np.where(sw, t2, t1)
        calp2 = np.where(sw, t1, t2)
        salp1 = salp1 * swapp * lonsign
        calp1 = calp1 * swapp * latsign
        salp2 = salp2 * swapp * lonsign
        calp2 = calp2 * swapp * latsign
        azi1 = 0.0 - np.arctan2(-salp1, calp1) / _D2R
        azi2 = 0.0 - np.arctan2(-salp2, calp2) / _D2R
        if want_area:
            return s12, azi1, azi2, S12
        return s12, azi1, azi2

    def _area(self, meridian, sbet1, cbet1, sbet2, cbet2, salp1, calp1,
              salp2, calp2, omg12, swapp, lonsign, latsign):
        """S12 area term (geodesic.c:852-906)."""
        salp0 = salp1 * cbet1
        calp0 = np.hypot(calp1, salp1 * sbet1)
        nz = (calp0 != 0.0) & (salp0 != 0.0)
        ssig1 = sbet1
        csig1 = calp1 * cbet1
        ssig2 = sbet2
        csig2 = calp2 * cbet2
        k2 = calp0 * calp0 * self.ep2
        eps = k2 / (2.0 * (1.0 + np.sqrt(1.0 + k2)) + k2)
        a4 = self.a * self.a * calp0 * salp0 * self.e2
        ssig1, csig1 = _norm2(ssig1, np.where(csig1 == 0.0, _TINY, csig1))
        ssig2, csig2 = _norm2(ssig2, np.where(csig2 == 0.0, _TINY, csig2))
        c4a = self._c4f(eps)
        b41 = _sincos_series(False, ssig1, csig1, c4a)
        b42 = _sincos_series(False, ssig2, csig2, c4a)
        S12 = np.where(nz, a4 * (b42 - b41), 0.0)

        small = (
            ~meridian
            & (omg12 < 0.75 * math.pi)
            & (sbet2 - sbet1 < 1.75)
        )
        somg12 = np.sin(omg12)
        domg12 = 1.0 + np.cos(omg12)
        dbet1 = 1.0 + cbet1
        dbet2 = 1.0 + cbet2
        alp12_small = 2.0 * np.arctan2(
            somg12 * (sbet1 * dbet2 + sbet2 * dbet1),
            domg12 * (sbet1 * sbet2 + dbet1 * dbet2),
        )
        salp12 = salp2 * calp1 - calp2 * salp1
        calp12 = calp2 * calp1 + salp2 * salp1
        deg = (salp12 == 0.0) & (calp12 < 0.0)
        salp12 = np.where(deg, _TINY * calp1, salp12)
        calp12 = np.where(deg, -1.0, calp12)
        alp12_big = np.arctan2(salp12, calp12)
        alp12 = np.where(small, alp12_small, alp12_big)
        S12 = S12 + self.c2 * alp12
        return S12 * (swapp * lonsign * latsign)

    def _inverse_start(self, sbet1, cbet1, dn1, sbet2, cbet2, dn2, lam12):
        """Vectorized InverseStart (geodesic.c:1069-1247).  Returns
        (sig12, salp1, calp1, salp2, calp2, dnm, shortcut_mask)."""
        f, f1, ep2, nthird = self.f, self.f1, self.ep2, self.n
        sbet12 = sbet2 * cbet1 - cbet2 * sbet1
        cbet12 = cbet2 * cbet1 + sbet2 * sbet1
        sbet12a = sbet2 * cbet1 + cbet2 * sbet1
        shortline = (cbet12 >= 0.0) & (sbet12 < 0.5) & (cbet2 * lam12 < 0.5)

        sbetm2 = (sbet1 + sbet2) ** 2
        sbetm2 = sbetm2 / (sbetm2 + (cbet1 + cbet2) ** 2)
        dnm = np.sqrt(1.0 + ep2 * sbetm2)
        omg12 = np.where(shortline, lam12 / (f1 * dnm), lam12)
        somg12 = np.sin(omg12)
        comg12 = np.cos(omg12)
        salp1 = cbet2 * somg12
        with np.errstate(divide="ignore", invalid="ignore"):
            calp1 = np.where(
                comg12 >= 0.0,
                sbet12 + cbet2 * sbet1 * somg12 * somg12 / (1.0 + comg12),
                sbet12a - cbet2 * sbet1 * somg12 * somg12 / (1.0 - comg12),
            )
        ssig12 = np.hypot(salp1, calp1)
        csig12 = sbet1 * sbet2 + cbet1 * cbet2 * comg12

        really_short = shortline & (ssig12 < self.etol2)
        salp2 = cbet1 * somg12
        with np.errstate(divide="ignore", invalid="ignore"):
            calp2 = sbet12 - cbet1 * sbet2 * np.where(
                comg12 >= 0.0, somg12 * somg12 / (1.0 + comg12), 1.0 - comg12
            )
        salp2, calp2 = _norm2(salp2, np.where(really_short, calp2, 1.0))
        sig12 = np.where(really_short, np.arctan2(ssig12, csig12), -1.0)

        need_astroid = (
            ~really_short
            & ~(
                (abs(nthird) > 0.1)
                | (csig12 >= 0.0)
                | (ssig12 >= 6.0 * abs(nthird) * math.pi * cbet1 * cbet1)
            )
        )
        if np.any(need_astroid):
            if f >= 0.0:
                k2 = sbet1 * sbet1 * ep2
                eps = k2 / (2.0 * (1.0 + np.sqrt(1.0 + k2)) + k2)
                lamscale = f * cbet1 * self._a3f(eps) * math.pi
                betscale = lamscale * cbet1
                x = (lam12 - math.pi) / lamscale
                y = sbet12a / betscale
            else:
                cbet12a = cbet2 * cbet1 - sbet2 * sbet1
                bet12a = np.arctan2(sbet12a, cbet12a)
                _, m12b, m0 = self._lengths(
                    nthird, math.pi + bet12a, sbet1, -cbet1, dn1, sbet2, cbet2, dn2
                )
                x = -1.0 + m12b / (cbet1 * cbet2 * m0 * math.pi)
                betscale = np.where(
                    x < -0.01, sbet12a / x, -f * cbet1 * cbet1 * math.pi
                )
                lamscale = betscale / cbet1
                y = (lam12 - math.pi) / lamscale

            strip = (y > -_TOL1) & (x > -1.0 - _XTHRESH)
            if f >= 0.0:
                salp1_s = np.minimum(1.0, -x)
                calp1_s = -np.sqrt(1.0 - salp1_s * salp1_s)
            else:
                calp1_s = np.maximum(np.where(x > -_TOL1, 0.0, -1.0), x)
                salp1_s = np.sqrt(1.0 - calp1_s * calp1_s)

            k = _astroid(x, y)
            with np.errstate(divide="ignore", invalid="ignore"):
                omg12a = lamscale * np.where(
                    f >= 0.0, -x * k / (1.0 + k), -y * (1.0 + k) / k
                )
                somg12a = np.sin(omg12a)
                comg12a = -np.cos(omg12a)
                salp1_a = cbet2 * somg12a
                calp1_a = sbet12a - cbet2 * sbet1 * somg12a * somg12a / (1.0 - comg12a)

            salp1 = np.where(
                need_astroid, np.where(strip, salp1_s, salp1_a), salp1
            )
            calp1 = np.where(
                need_astroid, np.where(strip, calp1_s, calp1_a), calp1
            )

        # sanity: the backwards test ~(salp1 <= 0) lets NaN through norm2
        pos = ~(salp1 <= 0.0)
        r = np.hypot(salp1, calp1)
        salp1 = np.where(pos, salp1 / r, 1.0)
        calp1 = np.where(pos, calp1 / r, 0.0)
        return sig12, salp1, calp1, salp2, calp2, dnm, really_short

    def _lambda12(self, sbet1, cbet1, dn1, sbet2, cbet2, dn2, salp1, calp1):
        """Vectorized Lambda12 with derivative (geodesic.c:1249-1346).
        Returns (lam12, salp2, calp2, sig12, ssig1, csig1, ssig2, csig2,
        eps, domg12, dlam12)."""
        f1 = self.f1
        calp1 = np.where((sbet1 == 0.0) & (calp1 == 0.0), -_TINY, calp1)
        salp0 = salp1 * cbet1
        calp0 = np.hypot(calp1, salp1 * sbet1)

        ssig1 = sbet1
        somg1 = salp0 * sbet1
        csig1 = comg1 = calp1 * cbet1
        ssig1, csig1 = _norm2(ssig1, csig1)

        with np.errstate(divide="ignore", invalid="ignore"):
            salp2 = np.where(cbet2 != cbet1, salp0 / cbet2, salp1)
            calp2 = np.where(
                (cbet2 != cbet1) | (np.abs(sbet2) != -sbet1),
                np.sqrt(
                    (calp1 * cbet1) ** 2
                    + np.where(
                        cbet1 < -sbet1,
                        (cbet2 - cbet1) * (cbet1 + cbet2),
                        (sbet1 - sbet2) * (sbet1 + sbet2),
                    )
                )
                / cbet2,
                np.abs(calp1),
            )
        ssig2 = sbet2
        somg2 = salp0 * sbet2
        csig2 = comg2 = calp2 * cbet2
        ssig2, csig2 = _norm2(ssig2, csig2)

        sig12 = np.arctan2(
            np.maximum(csig1 * ssig2 - ssig1 * csig2, 0.0),
            csig1 * csig2 + ssig1 * ssig2,
        )
        omg12 = np.arctan2(
            np.maximum(comg1 * somg2 - somg1 * comg2, 0.0),
            comg1 * comg2 + somg1 * somg2,
        )
        k2 = calp0 * calp0 * self.ep2
        eps = k2 / (2.0 * (1.0 + np.sqrt(1.0 + k2)) + k2)
        c3a = self._c3f(eps)
        b312 = _sincos_series(True, ssig2, csig2, c3a) - _sincos_series(
            True, ssig1, csig1, c3a
        )
        h0 = -self.f * self._a3f(eps)
        domg12 = salp0 * h0 * (sig12 + b312)
        lam12 = omg12 + domg12

        _, dlam12, _ = self._lengths(eps, sig12, ssig1, csig1, dn1, ssig2, csig2, dn2)
        with np.errstate(divide="ignore", invalid="ignore"):
            dlam12 = np.where(
                calp2 == 0.0,
                -2.0 * f1 * dn1 / sbet1,
                dlam12 * f1 / (calp2 * cbet2),
            )
        return (lam12, salp2, calp2, sig12, ssig1, csig1, ssig2, csig2, eps, domg12, dlam12)

    def _newton(self, mask, sbet1, cbet1, dn1, sbet2, cbet2, dn2, lam12, salp1, calp1):
        """Bracketed Newton on alp1 for the lanes in ``mask``
        (geodesic.c:767-835), vectorized with per-lane trip flags."""
        shape = lam12.shape
        salp1 = salp1.copy()
        calp1 = calp1.copy()
        salp1a = np.full(shape, _TINY)
        calp1a = np.ones(shape)
        salp1b = np.full(shape, _TINY)
        calp1b = np.full(shape, -1.0)
        tripn = np.zeros(shape, dtype=bool)
        tripb = np.zeros(shape, dtype=bool)
        active = mask.copy()

        salp2 = np.zeros(shape)
        calp2 = np.zeros(shape)
        sig12 = np.zeros(shape)
        ssig1 = np.zeros(shape)
        csig1 = np.ones(shape)
        ssig2 = np.zeros(shape)
        csig2 = np.ones(shape)
        eps = np.zeros(shape)
        domg12 = np.zeros(shape)

        for numit in range(_MAXIT2):
            if not np.any(active):
                break
            (lam12_new, salp2n, calp2n, sig12n, ssig1n, csig1n, ssig2n, csig2n,
             epsn, domg12n, dv) = self._lambda12(
                sbet1, cbet1, dn1, sbet2, cbet2, dn2, salp1, calp1
            )
            v = lam12_new - lam12
            upd = active
            salp2 = np.where(upd, salp2n, salp2)
            calp2 = np.where(upd, calp2n, calp2)
            sig12 = np.where(upd, sig12n, sig12)
            ssig1 = np.where(upd, ssig1n, ssig1)
            csig1 = np.where(upd, csig1n, csig1)
            ssig2 = np.where(upd, ssig2n, ssig2)
            csig2 = np.where(upd, csig2n, csig2)
            eps = np.where(upd, epsn, eps)
            domg12 = np.where(upd, domg12n, domg12)

            # convergence (reversed test lets NaN escape)
            done = tripb | ~(np.abs(v) >= np.where(tripn, 8.0, 2.0) * _TOL0)
            active = active & ~done
            if not np.any(active):
                break

            with np.errstate(divide="ignore", invalid="ignore"):
                upd_b = active & (v > 0.0) & (
                    (numit > _MAXIT1) | (calp1 / salp1 > calp1b / salp1b)
                )
                upd_a = active & (v < 0.0) & (
                    (numit > _MAXIT1) | (calp1 / salp1 < calp1a / salp1a)
                )
            salp1b = np.where(upd_b, salp1, salp1b)
            calp1b = np.where(upd_b, calp1, calp1b)
            salp1a = np.where(upd_a, salp1, salp1a)
            calp1a = np.where(upd_a, calp1, calp1a)

            use_newton = np.zeros(shape, dtype=bool)
            if numit < _MAXIT1:
                with np.errstate(divide="ignore", invalid="ignore"):
                    dalp1 = -v / dv
                sdalp1 = np.sin(dalp1)
                cdalp1 = np.cos(dalp1)
                nsalp1 = salp1 * cdalp1 + calp1 * sdalp1
                use_newton = (
                    active & (dv > 0.0) & (nsalp1 > 0.0) & (np.abs(dalp1) < math.pi)
                )
                ncalp1 = calp1 * cdalp1 - salp1 * sdalp1
                nr = np.hypot(nsalp1, ncalp1)
                salp1 = np.where(use_newton, nsalp1 / nr, salp1)
                calp1 = np.where(use_newton, ncalp1 / nr, calp1)
                tripn = np.where(use_newton, np.abs(v) <= 16.0 * _TOL0, tripn)

            bisect = active & ~use_newton
            if np.any(bisect):
                bs = (salp1a + salp1b) / 2.0
                bc = (calp1a + calp1b) / 2.0
                br = np.hypot(bs, bc)
                salp1 = np.where(bisect, bs / br, salp1)
                calp1 = np.where(bisect, bc / br, calp1)
                tripn = np.where(bisect, False, tripn)
                tb = (
                    np.abs(salp1a - salp1) + (calp1a - calp1) < _TOLB
                ) | (np.abs(salp1 - salp1b) + (calp1 - calp1b) < _TOLB)
                tripb = np.where(bisect, tb, tripb)

        s12b, m12b, _ = self._lengths(eps, sig12, ssig1, csig1, dn1, ssig2, csig2, dn2)
        s12x = s12b * self.b
        m12x = m12b * self.b
        omg12 = lam12 - domg12  # geodesic.c:843
        return sig12, salp1, calp1, salp2, calp2, s12x, m12x, omg12

    # ------------------------------------------------------------- direct
    def direct(self, lat1, lon1, azi1, s12):
        """Vectorized direct problem (geod_lineinit + geod_genposition,
        distance mode, geodesic.c:270-560): degrees/meters in, returns
        (lat2, lon2, azi2) in degrees."""
        lat1 = np.atleast_1d(np.asarray(lat1, np.float64))
        lon1 = np.atleast_1d(np.asarray(lon1, np.float64))
        azi1 = np.atleast_1d(np.asarray(azi1, np.float64))
        s12 = np.atleast_1d(np.asarray(s12, np.float64))
        f1, ep2 = self.f1, self.ep2

        azi1n = _ang_round(_ang_normalize(azi1))
        alp1 = azi1n * _D2R
        salp1 = np.where(azi1n == -180.0, 0.0, np.sin(alp1))
        calp1 = np.where(np.abs(azi1n) == 90.0, 0.0, np.cos(alp1))
        phi = lat1 * _D2R
        sbet1 = f1 * np.sin(phi)
        cbet1 = np.where(np.abs(lat1) == 90.0, _TINY, np.cos(phi))
        sbet1, cbet1 = _norm2(sbet1, cbet1)

        salp0 = salp1 * cbet1
        calp0 = np.hypot(calp1, salp1 * sbet1)
        ssig1 = sbet1
        somg1 = salp0 * sbet1
        csig1 = comg1 = np.where(
            (sbet1 != 0.0) | (calp1 != 0.0), cbet1 * calp1, 1.0
        )
        ssig1, csig1 = _norm2(ssig1, csig1)

        k2 = calp0 * calp0 * ep2
        eps = k2 / (2.0 * (1.0 + np.sqrt(1.0 + k2)) + k2)
        a1m1 = _a1m1f(eps)
        c1a = _c1f(eps)
        b11 = _sincos_series(True, ssig1, csig1, c1a)
        s = np.sin(b11)
        c = np.cos(b11)
        stau1 = ssig1 * c + csig1 * s
        ctau1 = csig1 * c - ssig1 * s
        c1pa = _c1pf(eps)
        c3a = self._c3f(eps)
        a3c = -self.f * salp0 * self._a3f(eps)
        b31 = _sincos_series(True, ssig1, csig1, c3a)

        tau12 = s12 / (self.b * (1.0 + a1m1))
        st = np.sin(tau12)
        ct = np.cos(tau12)
        b12 = -_sincos_series(True, stau1 * ct + ctau1 * st, ctau1 * ct - stau1 * st, c1pa)
        sig12 = tau12 - (b12 - b11)
        ssig12 = np.sin(sig12)
        csig12 = np.cos(sig12)
        if abs(self.f) > 0.01:  # one Newton step for very eccentric shapes
            ssig2 = ssig1 * csig12 + csig1 * ssig12
            csig2 = csig1 * csig12 - ssig1 * ssig12
            b12 = _sincos_series(True, ssig2, csig2, c1a)
            serr = (1.0 + a1m1) * (sig12 + (b12 - b11)) - s12 / self.b
            sig12 = sig12 - serr / np.sqrt(1.0 + k2 * ssig2 * ssig2)
            ssig12 = np.sin(sig12)
            csig12 = np.cos(sig12)

        ssig2 = ssig1 * csig12 + csig1 * ssig12
        csig2 = csig1 * csig12 - ssig1 * ssig12
        sbet2 = calp0 * ssig2
        cbet2 = np.hypot(salp0, calp0 * csig2)
        deg = cbet2 == 0.0
        cbet2 = np.where(deg, _TINY, cbet2)
        csig2 = np.where(deg, _TINY, csig2)
        salp2 = salp0
        calp2 = calp0 * csig2

        # longitude (non-unrolled branch, geodesic.c:476-487)
        somg2 = salp0 * ssig2
        comg2 = csig2
        omg12 = np.arctan2(
            somg2 * comg1 - comg2 * somg1, comg2 * comg1 + somg2 * somg1
        )
        b32 = _sincos_series(True, ssig2, csig2, c3a)
        lam12 = omg12 + a3c * (sig12 + (b32 - b31))
        lon12 = lam12 / _D2R
        lon12 = _ang_normalize(lon12)
        lon2 = _ang_normalize(_ang_normalize(lon1) + lon12)

        lat2 = np.arctan2(sbet2, f1 * cbet2) / _D2R
        azi2 = 0.0 - np.arctan2(-salp2, calp2) / _D2R
        return lat2, lon2, azi2


def _astroid(x, y):
    """Positive root k of k^4 + 2k^3 - (x^2+y^2-1)k^2 - 2y^2 k - y^2 = 0,
    vectorized (geodesic.c:1017-1067)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    p = x * x
    q = y * y
    r = (p + q - 1.0) / 6.0
    easy = (q == 0.0) & (r <= 0.0)
    S = p * q / 4.0
    r2 = r * r
    r3 = r * r2
    disc = S * (S + 2.0 * r3)
    u = r.copy()
    # disc >= 0: real cube root branch
    T3 = S + r3
    T3 = T3 + np.where(T3 < 0.0, -np.sqrt(np.abs(disc)), np.sqrt(np.abs(disc)))
    T = np.cbrt(T3)
    with np.errstate(divide="ignore", invalid="ignore"):
        u_real = r + T + np.where(T != 0.0, r2 / np.where(T == 0.0, 1.0, T), 0.0)
    # disc < 0: complex branch (r < 0 here)
    ang = np.arctan2(np.sqrt(np.abs(disc)), -(S + r3))
    u_cplx = r + 2.0 * r * np.cos(ang / 3.0)
    u = np.where(disc >= 0.0, u_real, u_cplx)
    with np.errstate(divide="ignore", invalid="ignore"):
        v = np.sqrt(u * u + q)
        uv = np.where(u < 0.0, q / (v - u), u + v)
        w = (uv - q) / (2.0 * v)
        k = uv / (np.sqrt(uv + w * w) + w)
    return np.where(easy, 0.0, k)


# ---------------------------------------------------------------- public
_WGS84 = None


def _default(a, f):
    global _WGS84
    if a == 6378137.0 and f == 1.0 / 298.257223563:
        if _WGS84 is None:
            _WGS84 = Geodesic(a, f)
        return _WGS84
    return Geodesic(a, f)


def geod_inverse(lat1, lon1, lat2, lon2, a=6378137.0, f=1.0 / 298.257223563):
    """Karney inverse: degrees in -> (s12 m, azi1 deg, azi2 deg)."""
    return _default(a, f).inverse(lat1, lon1, lat2, lon2)


def geod_direct(lat1, lon1, azi1, s12, a=6378137.0, f=1.0 / 298.257223563):
    """Karney direct: degrees/m in -> (lat2, lon2, azi2) degrees."""
    return _default(a, f).direct(lat1, lon1, azi1, s12)


def geod_polygon_area(lons, lats, a=6378137.0, f=1.0 / 298.257223563):
    """Perimeter (m) and signed area (m^2) of a single geodesic polygon
    given vertex arrays (degrees, unclosed ring).  Mirrors
    geod_polygon_addpoint/geod_polygon_compute (geodesic.c:1761-1842):
    sums per-edge S12 plus the pole-encirclement correction from
    longitude transits."""
    lons = np.asarray(lons, np.float64)
    lats = np.asarray(lats, np.float64)
    g = _default(a, f)
    lon_next = np.roll(lons, -1)
    lat_next = np.roll(lats, -1)
    s12, _, _, S12 = g.inverse(lats, lons, lat_next, lon_next, want_area=True)
    perimeter = float(np.sum(s12))
    area = float(np.sum(S12))
    # crossings of the prime meridian -> pole encirclement parity
    l1 = _ang_normalize(lons)
    l2 = _ang_normalize(lon_next)
    lon12 = _ang_diff(l1, l2)
    cross = np.where(
        (l1 < 0.0) & (l2 >= 0.0) & (lon12 > 0.0),
        1,
        np.where((l2 < 0.0) & (l1 >= 0.0) & (lon12 < 0.0), -1, 0),
    )
    crossings = int(np.sum(cross))
    area0 = 4.0 * math.pi * g.c2
    if crossings & 1:
        area += (1.0 if area < 0.0 else -1.0) * area0 / 2.0
    # accumulated sum is clockwise-positive; convert to the
    # counterclockwise-positive convention (geod_polygon_compute:1733-1735)
    area = -area
    # reduce to (-area0/2, area0/2]
    if area > area0 / 2.0:
        area -= area0
    elif area <= -area0 / 2.0:
        area += area0
    return perimeter, area
