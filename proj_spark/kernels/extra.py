"""Extended projection-kernel inventory (SURVEY.md §2.2).

Vectorized numpy fwd/inv pairs for the broader pj_list.h catalog,
registered into :data:`proj_spark.kernels.core.REGISTRY` at import.
Formulas are transcribed from public Snyder/PROJ math; behavioral
references cite /root/reference/src/PJ_*.c.  Conventions match
core.py: kernel-local space (the pj_fwd/pj_inv wrapper in
plans/pipeline.py handles lam0/x0/y0/a/units), NaN for unprojectable
lanes, masked iteration for the iterative inverses.
"""
from __future__ import annotations

import math

import numpy as np

from . import xmath as m
from .core import EPS10, CompiledProj, REGISTRY, _frame
from .xmath import FORTPI, HALFPI, PI


def _register(*names):
    def deco(fn):
        for n in names:
            REGISTRY[n] = fn
        return fn

    return deco


# ------------------------------------------------------------------ conic
@_register("aea", "leac")
def setup_aea(crs) -> CompiledProj:
    """Albers equal-area conic (PJ_aea.c; leac = 1 std parallel at
    pole, PJ_aea.c ENTRY leac)."""
    fr = _frame(crs)
    es, e = crs.es, crs.e
    one_es = crs.one_es
    p = crs.params
    if crs.proj == "leac":
        phi1 = m.dms_param(p["lat_1"]) if "lat_1" in p else FORTPI
        phi2 = -HALFPI if "south" in p else HALFPI
    else:
        phi1 = m.dms_param(p.get("lat_1", "29.5"))
        phi2 = m.dms_param(p.get("lat_2", "45.5"))
    if abs(phi1 + phi2) < EPS10:
        raise ValueError("aea: |lat_1 + lat_2| ~ 0")
    sinphi = math.sin(phi1)
    cosphi = math.cos(phi1)
    n = sinphi
    secant = abs(phi1 - phi2) >= EPS10
    if es:
        m1 = float(m.msfn(sinphi, cosphi, es))
        ml1 = float(m.qsfn(sinphi, e, one_es))
        if secant:
            sinphi2 = math.sin(phi2)
            cosphi2 = math.cos(phi2)
            m2 = float(m.msfn(sinphi2, cosphi2, es))
            ml2 = float(m.qsfn(sinphi2, e, one_es))
            n = (m1 * m1 - m2 * m2) / (ml2 - ml1)
        ec = 1.0 - 0.5 * one_es * math.log((1.0 - e) / (1.0 + e)) / e
        c = m1 * m1 + n * ml1
        dd = 1.0 / n
        rho0 = dd * math.sqrt(c - n * float(m.qsfn(math.sin(fr["phi0"]), e, one_es)))

        def fwd(lam, phi):
            rho_ = c - n * m.qsfn(np.sin(phi), e, one_es)
            bad = rho_ < 0.0
            rho_ = dd * np.sqrt(np.maximum(rho_, 0.0))
            lamn = lam * n
            x = rho_ * np.sin(lamn)
            y = rho0 - rho_ * np.cos(lamn)
            return np.where(bad, np.nan, x), np.where(bad, np.nan, y)

        TOL7 = 1e-7

        def _phi1(qs):
            """Iterative inverse of qsfn (PJ_aea.c phi1_, <=15 iter)."""
            phi = np.arcsin(np.clip(0.5 * qs, -1.0, 1.0))
            if e < 1e-7:
                return phi
            for _ in range(15):
                sinpi = np.sin(phi)
                cospi = np.cos(phi)
                con = e * sinpi
                com = 1.0 - con * con
                dphi = (
                    0.5
                    * com
                    * com
                    / cospi
                    * (
                        qs / one_es
                        - sinpi / com
                        + 0.5 / e * np.log((1.0 - con) / (1.0 + con))
                    )
                )
                phi = phi + dphi
                if np.all(np.abs(dphi) <= 1e-10):
                    break
            return phi

        def inv(x, y):
            yy = rho0 - y
            rho_ = np.hypot(x, yy)
            xx, yy2 = np.asarray(x, np.float64), yy
            if n < 0.0:
                rho_ = -rho_
                xx = -xx
                yy2 = -yy2
            zero = rho_ == 0.0
            ts = rho_ / dd
            ts = (c - ts * ts) / n
            near = np.abs(ec - np.abs(ts)) > TOL7
            phi = np.where(near, _phi1(ts), np.where(ts < 0.0, -HALFPI, HALFPI))
            phi = np.where(zero, np.where(n > 0.0, HALFPI, -HALFPI), phi)
            lam = np.where(zero, 0.0, np.arctan2(xx, yy2) / n)
            return lam, phi

    else:
        if secant:
            n = 0.5 * (n + math.sin(phi2))
        n2 = n + n
        c = cosphi * cosphi + n2 * sinphi
        dd = 1.0 / n
        rho0 = dd * math.sqrt(c - n2 * math.sin(fr["phi0"]))

        def fwd(lam, phi):
            rho_ = c - n2 * np.sin(phi)
            bad = rho_ < 0.0
            rho_ = dd * np.sqrt(np.maximum(rho_, 0.0))
            lamn = lam * n
            return (
                np.where(bad, np.nan, rho_ * np.sin(lamn)),
                np.where(bad, np.nan, rho0 - rho_ * np.cos(lamn)),
            )

        def inv(x, y):
            yy = rho0 - y
            rho_ = np.hypot(x, yy)
            xx, yy2 = np.asarray(x, np.float64), yy
            if n < 0.0:
                rho_ = -rho_
                xx = -xx
                yy2 = -yy2
            zero = rho_ == 0.0
            ts = rho_ / dd
            phi = np.arcsin(np.clip((c - ts * ts) / n2, -1.0, 1.0))
            phi = np.where(zero, np.where(n > 0.0, HALFPI, -HALFPI), phi)
            lam = np.where(zero, 0.0, np.arctan2(xx, yy2) / n)
            return lam, phi

    return CompiledProj(crs.proj, fwd, inv, **fr)


@_register("eqdc")
def setup_eqdc(crs) -> CompiledProj:
    """Equidistant conic (PJ_eqdc.c)."""
    fr = _frame(crs)
    es = crs.es
    p = crs.params
    phi1 = m.dms_param(p.get("lat_1", "0"))
    phi2 = m.dms_param(p.get("lat_2", repr(phi1 / m.DEG_TO_RAD)))
    if abs(phi1 + phi2) < EPS10:
        raise ValueError("eqdc: |lat_1 + lat_2| ~ 0")
    sinphi = math.sin(phi1)
    cosphi = math.cos(phi1)
    n = sinphi
    secant = abs(phi1 - phi2) >= EPS10
    if es:
        en = m.enfn(es)
        m1 = float(m.msfn(sinphi, cosphi, es))
        ml1 = float(m.mlfn(phi1, sinphi, cosphi, en))
        if secant:
            sinphi2 = math.sin(phi2)
            cosphi2 = math.cos(phi2)
            n = (m1 - float(m.msfn(sinphi2, cosphi2, es))) / (
                float(m.mlfn(phi2, sinphi2, cosphi2, en)) - ml1
            )
        c = ml1 + m1 / n
        rho0 = c - float(
            m.mlfn(fr["phi0"], math.sin(fr["phi0"]), math.cos(fr["phi0"]), en)
        )

        def fwd(lam, phi):
            rho_ = c - m.mlfn(phi, np.sin(phi), np.cos(phi), en)
            lamn = lam * n
            return rho_ * np.sin(lamn), rho0 - rho_ * np.cos(lamn)

        def inv(x, y):
            yy = rho0 - y
            rho_ = np.hypot(x, yy)
            xx, yy2 = np.asarray(x, np.float64), yy
            if n < 0.0:
                rho_ = -rho_
                xx = -xx
                yy2 = -yy2
            phi = m.inv_mlfn(c - rho_, es, en)
            lam = np.where(rho_ == 0.0, 0.0, np.arctan2(xx, yy2) / n)
            return lam, phi

    else:
        if secant:
            n = (cosphi - math.cos(phi2)) / (phi2 - phi1)
        c = phi1 + cosphi / n
        rho0 = c - fr["phi0"]

        def fwd(lam, phi):
            rho_ = c - phi
            lamn = lam * n
            return rho_ * np.sin(lamn), rho0 - rho_ * np.cos(lamn)

        def inv(x, y):
            yy = rho0 - y
            rho_ = np.hypot(x, yy)
            xx, yy2 = np.asarray(x, np.float64), yy
            if n < 0.0:
                rho_ = -rho_
                xx = -xx
                yy2 = -yy2
            phi = c - rho_
            lam = np.where(rho_ == 0.0, 0.0, np.arctan2(xx, yy2) / n)
            return lam, phi

    def spc(lam, phi):
        # analytic h=1, meridian-true k (PJ_eqdc.c SPECIAL(fac):
        # IS_ANAL_HK only; convergence stays numeric).
        sp_, cp_ = np.sin(phi), np.cos(phi)
        if es:
            rho_ = c - m.mlfn(phi, sp_, cp_, en)
        else:
            rho_ = c - phi
        k = n * rho_ / m.msfn(sp_, cp_, es)
        return {"h": np.ones_like(k), "k": k, "mask": np.ones_like(k, dtype=bool)}

    return CompiledProj("eqdc", fwd, inv, spc=spc, **fr)


# -------------------------------------------------------------- azimuthal
@_register("aeqd")
def setup_aeqd(crs) -> CompiledProj:
    """Azimuthal equidistant (PJ_aeqd.c).  Spherical math; ellipsoids
    use the Vincenty geodesic (role of geod_inverse/geod_direct, the
    reference's Karney calls PJ_aeqd.c:118-160)."""
    fr = _frame(crs)
    phi0 = fr["phi0"]
    mode_npole = abs(phi0 - HALFPI) < EPS10
    mode_spole = abs(phi0 + HALFPI) < EPS10
    sinph0 = math.sin(phi0)
    cosph0 = math.cos(phi0)

    if crs.es:
        from . import geodesy

        f = 1.0 - math.sqrt(crs.one_es)
        lat0_deg = phi0 / m.DEG_TO_RAD

        def fwd(lam, phi):
            lat2 = phi / m.DEG_TO_RAD
            lon2 = lam / m.DEG_TO_RAD
            s12, azi1, _ = geodesy.geod_inverse(
                np.full_like(lat2, lat0_deg), np.zeros_like(lon2), lat2, lon2, 1.0, f
            )
            a1 = azi1 * m.DEG_TO_RAD
            return s12 * np.sin(a1), s12 * np.cos(a1)

        def inv(x, y):
            s12 = np.hypot(x, y)
            azi1 = np.arctan2(x, y) / m.DEG_TO_RAD
            lat2, lon2, _ = geodesy.geod_direct(
                np.full_like(s12, lat0_deg), np.zeros_like(s12), azi1, s12, 1.0, f
            )
            return lon2 * m.DEG_TO_RAD, lat2 * m.DEG_TO_RAD

    else:

        def fwd(lam, phi):
            sinphi = np.sin(phi)
            cosphi = np.cos(phi)
            coslam = np.cos(lam)
            if mode_npole:
                rho = HALFPI - phi
                return rho * np.sin(lam), -rho * coslam
            if mode_spole:
                rho = HALFPI + phi
                return rho * np.sin(lam), rho * coslam
            cosc = sinph0 * sinphi + cosph0 * cosphi * coslam
            c = np.arccos(np.clip(cosc, -1.0, 1.0))
            with np.errstate(invalid="ignore", divide="ignore"):
                k = np.where(c == 0.0, 1.0, c / np.sin(c))
            return (
                k * cosphi * np.sin(lam),
                k * (cosph0 * sinphi - sinph0 * cosphi * coslam),
            )

        def inv(x, y):
            c = np.hypot(x, y)
            bad = c > PI
            sinc = np.sin(c)
            cosc = np.cos(c)
            with np.errstate(invalid="ignore", divide="ignore"):
                phi = np.where(
                    c == 0.0,
                    phi0,
                    np.arcsin(
                        np.clip(cosc * sinph0 + y * sinc * cosph0 / np.where(c == 0, 1, c), -1, 1)
                    ),
                )
                if mode_npole:
                    lam = np.arctan2(x, -y)
                    phi = np.where(c == 0.0, HALFPI, HALFPI - c)
                elif mode_spole:
                    lam = np.arctan2(x, y)
                    phi = np.where(c == 0.0, -HALFPI, c - HALFPI)
                else:
                    lam = np.arctan2(
                        x * sinc, c * cosph0 * cosc - y * sinph0 * sinc
                    )
            return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)

    return CompiledProj("aeqd", fwd, inv, **fr)


@_register("gnom")
def setup_gnom(crs) -> CompiledProj:
    """Gnomonic, sphere (PJ_gnom.c)."""
    fr = _frame(crs)
    phi0 = fr["phi0"]
    sinph0, cosph0 = math.sin(phi0), math.cos(phi0)

    def fwd(lam, phi):
        sinphi, cosphi = np.sin(phi), np.cos(phi)
        coslam = np.cos(lam)
        cosc = sinph0 * sinphi + cosph0 * cosphi * coslam
        bad = cosc <= EPS10
        with np.errstate(divide="ignore", invalid="ignore"):
            x = cosphi * np.sin(lam) / cosc
            y = (cosph0 * sinphi - sinph0 * cosphi * coslam) / cosc
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y)

    def inv(x, y):
        rho = np.hypot(x, y)
        c = np.arctan(rho)
        sinc, cosc = np.sin(c), np.cos(c)
        with np.errstate(divide="ignore", invalid="ignore"):
            phi = np.where(
                rho == 0.0,
                phi0,
                np.arcsin(np.clip(cosc * sinph0 + y * sinc * cosph0 / np.where(rho == 0, 1, rho), -1, 1)),
            )
            lam = np.arctan2(x * sinc, rho * cosph0 * cosc - y * sinph0 * sinc)
        return lam, phi

    return CompiledProj("gnom", fwd, inv, **fr)


@_register("ortho")
def setup_ortho(crs) -> CompiledProj:
    """Orthographic, sphere (PJ_ortho.c)."""
    fr = _frame(crs)
    phi0 = fr["phi0"]
    sinph0, cosph0 = math.sin(phi0), math.cos(phi0)

    def fwd(lam, phi):
        sinphi, cosphi = np.sin(phi), np.cos(phi)
        coslam = np.cos(lam)
        cosc = sinph0 * sinphi + cosph0 * cosphi * coslam
        bad = cosc < -EPS10
        x = cosphi * np.sin(lam)
        y = cosph0 * sinphi - sinph0 * cosphi * coslam
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y)

    def inv(x, y):
        rho = np.hypot(x, y)
        bad = rho > 1.0 + EPS10
        rho_c = np.minimum(rho, 1.0)
        sinc = rho_c
        cosc = np.sqrt(1.0 - sinc * sinc)
        with np.errstate(divide="ignore", invalid="ignore"):
            phi = np.where(
                rho == 0.0,
                phi0,
                np.arcsin(np.clip(cosc * sinph0 + y * sinc * cosph0 / np.where(rho == 0, 1, rho_c), -1, 1)),
            )
            lam = np.arctan2(x * sinc, rho_c * cosph0 * cosc - y * sinph0 * sinc)
        return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)

    return CompiledProj("ortho", fwd, inv, **fr)


@_register("cass")
def setup_cass(crs) -> CompiledProj:
    """Cassini-Soldner, sphere + ellipsoid (PJ_cass.c)."""
    fr = _frame(crs)
    es = crs.es
    phi0 = fr["phi0"]
    if es:
        en = m.enfn(es)
        m0 = float(m.mlfn(phi0, math.sin(phi0), math.cos(phi0), en))
        C1, C2, C3, C4, C5 = 1.0 / 6.0, 1.0 / 120.0, 1.0 / 24.0, 1.0 / 3.0, 1.0 / 15.0

        def fwd(lam, phi):
            sinphi, cosphi = np.sin(phi), np.cos(phi)
            ml = m.mlfn(phi, sinphi, cosphi, en)
            nu = 1.0 / np.sqrt(1.0 - es * sinphi * sinphi)
            tn = np.tan(phi)
            t = tn * tn
            a1 = lam * cosphi
            c = cosphi * cosphi * es / (1.0 - es)
            a2 = a1 * a1
            x = nu * a1 * (1.0 - a2 * t * (C1 - (8.0 - t + 8.0 * c) * a2 * C2))
            y = ml - m0 + nu * tn * a2 * (0.5 + (5.0 - t + 6.0 * c) * a2 * C3)
            return x, y

        def inv(x, y):
            ph1 = m.inv_mlfn(m0 + y, es, en)
            tn = np.tan(ph1)
            t = tn * tn
            n_ = np.sin(ph1)
            r = 1.0 / (1.0 - es * n_ * n_)
            n_ = np.sqrt(r)
            r = r * (1.0 - es) * n_
            dd = x / n_
            d2 = dd * dd
            phi = ph1 - (n_ * tn / r) * d2 * (0.5 - (1.0 + 3.0 * t) * d2 * C3)
            lam = dd * (1.0 + t * d2 * (-C4 + (1.0 + 3.0 * t) * d2 * C5)) / np.cos(ph1)
            return lam, phi

    else:

        def fwd(lam, phi):
            x = np.arcsin(np.clip(np.cos(phi) * np.sin(lam), -1, 1))
            y = np.arctan2(np.tan(phi), np.cos(lam)) - phi0
            return x, y

        def inv(x, y):
            dd = y + phi0
            phi = np.arcsin(np.clip(np.sin(dd) * np.cos(x), -1, 1))
            lam = np.arctan2(np.tan(x), np.cos(dd))
            return lam, phi

    return CompiledProj("cass", fwd, inv, **fr)


# ------------------------------------------------------------ cylindrical
@_register("cc")
def setup_cc(crs) -> CompiledProj:
    """Central cylindrical (PJ_cc.c)."""
    fr = _frame(crs)

    def fwd(lam, phi):
        bad = np.abs(np.abs(phi) - HALFPI) <= EPS10
        return np.where(bad, np.nan, lam), np.where(bad, np.nan, np.tan(phi))

    def inv(x, y):
        return x, np.arctan(y)

    return CompiledProj("cc", fwd, inv, **fr)


@_register("gall")
def setup_gall(crs) -> CompiledProj:
    """Gall stereographic (PJ_gall.c)."""
    fr = _frame(crs)
    XF = 0.70710678118654752440
    RXF = 1.41421356237309504880
    YF = 1.70710678118654752440
    RYF = 0.58578643762690495119

    def fwd(lam, phi):
        return XF * lam, YF * np.tan(0.5 * phi)

    def inv(x, y):
        return RXF * x, 2.0 * np.arctan(y * RYF)

    return CompiledProj("gall", fwd, inv, **fr)


@_register("mill")
def setup_mill(crs) -> CompiledProj:
    """Miller cylindrical (PJ_mill.c)."""
    fr = _frame(crs)

    def fwd(lam, phi):
        return lam, np.log(np.tan(FORTPI + phi * 0.4)) * 1.25

    def inv(x, y):
        return x, 2.5 * (np.arctan(np.exp(0.8 * y)) - FORTPI)

    return CompiledProj("mill", fwd, inv, **fr)


@_register("tcea")
def setup_tcea(crs) -> CompiledProj:
    """Transverse cylindrical equal-area, sphere (PJ_tcea.c)."""
    fr = _frame(crs)
    k0 = fr["k0"]
    rk0 = 1.0 / k0

    def fwd(lam, phi):
        x = rk0 * np.cos(phi) * np.sin(lam)
        y = k0 * (np.arctan2(np.tan(phi), np.cos(lam)) - fr["phi0"])
        return x, y

    def inv(x, y):
        yy = y * rk0 + fr["phi0"]
        xx = x * k0
        t = np.sqrt(np.maximum(1.0 - xx * xx, 0.0))
        phi = np.arcsin(np.clip(t * np.sin(yy), -1, 1))
        lam = np.arctan2(xx, t * np.cos(yy))
        return lam, phi

    return CompiledProj("tcea", fwd, inv, **fr)


@_register("tcc")
def setup_tcc(crs) -> CompiledProj:
    """Transverse central cylindrical, sphere, no inverse (PJ_tcc.c)."""
    fr = _frame(crs)

    def fwd(lam, phi):
        b = np.cos(phi) * np.sin(lam)
        bad = np.abs(np.abs(b) - 1.0) <= EPS10
        with np.errstate(divide="ignore", invalid="ignore"):
            x = b / np.sqrt(np.maximum(1.0 - b * b, 1e-300))
            y = np.arctan2(np.tan(phi), np.cos(lam))
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y)

    return CompiledProj("tcc", fwd, None, **fr)


# --------------------------------------------------------- pseudocylindrical
@_register("eck1")
def setup_eck1(crs) -> CompiledProj:
    fr = _frame(crs)
    FC = 0.92131773192356127802
    RP = 0.31830988618379067154

    def fwd(lam, phi):
        return FC * lam * (1.0 - RP * np.abs(phi)), FC * phi

    def inv(x, y):
        phi = y / FC
        lam = x / (FC * (1.0 - RP * np.abs(phi)))
        return lam, phi

    return CompiledProj("eck1", fwd, inv, **fr)


@_register("eck2")
def setup_eck2(crs) -> CompiledProj:
    fr = _frame(crs)
    FXC = 0.46065886596178063902
    FYC = 1.44720250911653531871
    C13 = 0.33333333333333333333
    ONEEPS = 1.0000001

    def fwd(lam, phi):
        yv = np.sqrt(np.maximum(4.0 - 3.0 * np.sin(np.abs(phi)), 0.0))
        x = FXC * lam * yv
        y = FYC * (2.0 - yv)
        return x, np.where(phi < 0.0, -y, y)

    def inv(x, y):
        ay = np.abs(y)
        yv = 2.0 - ay / FYC
        lam = x / (FXC * yv)
        s = (4.0 - yv * yv) * C13
        bad = np.abs(s) > ONEEPS
        phi = np.arcsin(np.clip(s, -1.0, 1.0))
        phi = np.where(y < 0.0, -phi, phi)
        return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)

    return CompiledProj("eck2", fwd, inv, **fr)


@_register("eck4")
def setup_eck4(crs) -> CompiledProj:
    """Eckert IV (PJ_eck4.c): iterative theta solve (<=10 iter)."""
    fr = _frame(crs)
    C_x = 0.42223820031577120149
    C_y = 1.32650042817700232218
    C_p = 3.57079632679489661922
    EPS = 1e-7

    def fwd(lam, phi):
        p = C_p * np.sin(phi)
        theta = phi.copy() if hasattr(phi, "copy") else np.asarray(phi, np.float64)
        V = theta * theta
        theta = theta * (0.895168 + V * (0.0218849 + V * 0.00826809))
        for _ in range(10):
            c = np.cos(theta)
            s = np.sin(theta)
            V = (theta + s * c + 2.0 * s - p) / (2.0 * c * (1.0 + c))
            theta = theta - V
            if np.all(np.abs(V) < EPS):
                break
        return C_x * lam * (1.0 + np.cos(theta)), C_y * np.sin(theta)

    def inv(x, y):
        theta = np.arcsin(np.clip(y / C_y, -1.0, 1.0))
        c = np.cos(theta)
        lam = x / (C_x * (1.0 + c))
        phi = np.arcsin(np.clip((theta + np.sin(theta) * c + 2.0 * np.sin(theta)) / C_p, -1, 1))
        return lam, phi

    return CompiledProj("eck4", fwd, inv, **fr)


@_register("eck5")
def setup_eck5(crs) -> CompiledProj:
    fr = _frame(crs)
    XF = 0.44101277172455148219
    RXF = 2.26750802723822639137
    YF = 0.88202554344910296438
    RYF = 1.13375401361911319568

    def fwd(lam, phi):
        return XF * (1.0 + np.cos(phi)) * lam, YF * phi

    def inv(x, y):
        phi = RYF * y
        lam = RXF * x / (1.0 + np.cos(phi))
        return lam, phi

    return CompiledProj("eck5", fwd, inv, **fr)


@_register("eck3", "putp1", "wag6", "kav7")
def setup_eck3_family(crs) -> CompiledProj:
    """Eckert III family (PJ_eck3.c:5-8): x = C_x*lam*(A + sqrt(1 -
    B*phi^2)), y = C_y*phi, with per-id constants."""
    fr = _frame(crs)
    name = crs.proj
    if name == "eck3":
        C_x, C_y, A, B = 0.42223820031577120149, 0.84447640063154240298, 1.0, 0.4052847345693510857755
    elif name == "putp1":
        C_x, C_y, A, B = 1.89490, 0.94745, -0.5, 0.30396355092701331433
    elif name == "wag6":
        C_x = C_y = 0.94745
        A, B = 0.0, 0.30396355092701331433
    else:  # kav7
        C_x, C_y, A, B = 0.8660254037844, 1.0, 0.0, 0.30396355092701331433

    def fwd(lam, phi):
        return C_x * lam * (A + np.sqrt(np.maximum(1.0 - B * phi * phi, 0.0))), C_y * phi

    def inv(x, y):
        phi = y / C_y
        lam = x / (C_x * (A + np.sqrt(np.maximum(1.0 - B * phi * phi, 0.0))))
        return lam, phi

    return CompiledProj(name, fwd, inv, **fr)


@_register("gn_sinu", "eck6", "mbtfps")
def setup_gn_sinu(crs) -> CompiledProj:
    """Generalized sinusoidal family (PJ_gn_sinu.c) with (m, n):
    eck6 = (1, 1+pi/2), mbtfps = (1/2, 1+pi/4... exactly sin-integrated
    constants below), gn_sinu from +m/+n.  fwd solves
    m*y + sin(y) = n*sin(phi) by Newton (<=8 iter) unless m == 0."""
    fr = _frame(crs)
    name = crs.proj
    if name == "eck6":
        m_, n_ = 1.0, 2.570796326794896619231321691
    elif name == "mbtfps":
        m_, n_ = 0.5, 1.785398163397448309615660845
    else:
        m_ = float(crs.params.get("m", 0.0))
        n_ = float(crs.params.get("n", 1.0))
        if n_ <= 0.0 or m_ < 0.0:
            raise ValueError("gn_sinu: invalid m/n")
    # setup (PJ_gn_sinu.c setup): C_y = sqrt((m+1)/n), C_x = C_y/(m+1)
    C_y = math.sqrt((m_ + 1.0) / n_)
    C_x = C_y / (m_ + 1.0)
    MAX_ITER, LOOP_TOL = 8, 1e-7

    def fwd(lam, phi):
        if m_ == 0.0:
            y = m.aasin(n_ * np.sin(phi)) if n_ != 1.0 else np.asarray(phi, np.float64)
        else:
            k = n_ * np.sin(phi)
            y = np.asarray(phi, np.float64).copy()
            for _ in range(MAX_ITER):
                V = (m_ * y + np.sin(y) - k) / (m_ + np.cos(y))
                y = y - V
                if np.all(np.abs(V) < LOOP_TOL):
                    break
        x = C_x * lam * (m_ + np.cos(y))
        return x, C_y * y

    def inv(x, y):
        yy = y / C_y
        phi = m.aasin((m_ * yy + np.sin(yy)) / n_)
        lam = x / (C_x * (m_ + np.cos(yy)))
        return lam, phi

    return CompiledProj(name, fwd, inv, **fr)


@_register("fouc", "kav5", "qua_aut", "mbt_s")
def setup_sts(crs) -> CompiledProj:
    """Sine-tangent series family (PJ_sts.c): x = C_x*lam*cos(phi)/
    cos(theta), y = C_y*theta with theta from mode."""
    fr = _frame(crs)
    name = crs.proj
    # (p, q, tan_mode) per PJ_sts.c entries
    if name == "fouc":
        p, q, tan_mode = 2.0, 2.0, True
    elif name == "kav5":
        p, q, tan_mode = 1.50488, 1.35439, False
    elif name == "qua_aut":
        p, q, tan_mode = 2.0, 2.0, False
    else:  # mbt_s
        p, q, tan_mode = 1.48875, 1.36509, False
    C_x = q / p
    C_y = p
    C_p = 1.0 / q  # PJ_sts.c setup: theta = phi * C_p (per 1/q, NOT 1/p)

    def fwd(lam, phi):
        ph = phi * C_p
        c = np.cos(ph)
        x = C_x * lam * np.cos(phi)
        if tan_mode:
            x = x * c * c
            y = C_y * np.tan(ph)
        else:
            x = x / c
            y = C_y * np.sin(ph)
        return x, y

    def inv(x, y):
        if tan_mode:
            ph = np.arctan(y / C_y)
        else:
            ph = np.arcsin(np.clip(y / C_y, -1.0, 1.0))
        phi = ph / C_p
        c = np.cos(ph)
        lam = x / (C_x * np.cos(phi))
        if tan_mode:
            lam = lam / (c * c)
        else:
            lam = lam * c
        return lam, phi

    return CompiledProj(name, fwd, inv, **fr)


@_register("crast")
def setup_crast(crs) -> CompiledProj:
    fr = _frame(crs)
    XM = 0.97720502380583984317
    RXM = 1.02332670794648848847
    YM = 3.06998012383946546542
    RYM = 0.32573500793527994772
    THIRD = 0.333333333333333333

    def fwd(lam, phi):
        ph = phi * THIRD
        return XM * lam * (2.0 * np.cos(ph + ph) - 1.0), YM * np.sin(ph)

    def inv(x, y):
        ph = np.arcsin(np.clip(RYM * y, -1.0, 1.0))
        phi = ph * 3.0
        lam = RXM * x / (2.0 * np.cos((phi + phi) * THIRD) - 1.0)
        return lam, phi

    return CompiledProj("crast", fwd, inv, **fr)


@_register("collg")
def setup_collg(crs) -> CompiledProj:
    fr = _frame(crs)
    FXC = 1.12837916709551257390
    FYC = 1.77245385090551602729
    ONEEPS = 1.0000001

    def fwd(lam, phi):
        yv = np.sqrt(np.maximum(1.0 - np.sin(phi), 0.0))
        y = FYC * (1.0 - yv)
        x = FXC * lam * yv
        return x, y

    def inv(x, y):
        yv = 1.0 - y / FYC
        s = 1.0 - yv * yv
        bad = np.abs(s) > ONEEPS
        phi = np.arcsin(np.clip(s, -1.0, 1.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.where(yv != 0.0, x / (FXC * yv), 0.0)
        return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)

    return CompiledProj("collg", fwd, inv, **fr)


@_register("loxim")
def setup_loxim(crs) -> CompiledProj:
    """Loximuthal (PJ_loxim.c)."""
    fr = _frame(crs)
    phi1 = m.dms_param(crs.params.get("lat_1", "40"))
    cosphi1 = math.cos(phi1)
    tanphi1 = math.tan(FORTPI + 0.5 * phi1)
    if cosphi1 < EPS10:
        raise ValueError("loxim: |lat_1| ~ 90")

    def fwd(lam, phi):
        y = phi - phi1
        small = np.abs(y) < EPS10
        t = FORTPI + 0.5 * phi
        deg = (np.abs(t) < EPS10) | (np.abs(t - HALFPI) < EPS10)
        with np.errstate(divide="ignore", invalid="ignore"):
            x = np.where(
                small,
                lam * cosphi1,
                np.where(deg, 0.0, lam * y / np.log(np.tan(t) / tanphi1)),
            )
        return x, y

    def inv(x, y):
        phi = y + phi1
        small = np.abs(y) < EPS10
        t = FORTPI + 0.5 * phi
        deg = (np.abs(t) < EPS10) | (np.abs(t - HALFPI) < EPS10)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.where(
                small,
                x / cosphi1,
                np.where(deg, 0.0, x * np.log(np.tan(t) / tanphi1) / y),
            )
        return lam, phi

    return CompiledProj("loxim", fwd, inv, **fr)


@_register("nell")
def setup_nell(crs) -> CompiledProj:
    """Nell (PJ_nell.c): iterative fwd."""
    fr = _frame(crs)

    def fwd(lam, phi):
        k = 2.0 * np.sin(phi)
        V = phi * phi
        phi_i = phi * (1.00371 + V * (-0.0935382 + V * -0.011412))
        for _ in range(10):
            V = (phi_i + np.sin(phi_i) - k) / (1.0 + np.cos(phi_i))
            phi_i = phi_i - V
            if np.all(np.abs(V) < 1e-7):
                break
        return 0.5 * lam * (1.0 + np.cos(phi_i)), phi_i

    def inv(x, y):
        lam = 2.0 * x / (1.0 + np.cos(y))
        phi = np.arcsin(np.clip(0.5 * (y + np.sin(y)), -1.0, 1.0))
        return lam, phi

    return CompiledProj("nell", fwd, inv, **fr)


@_register("nell_h")
def setup_nell_h(crs) -> CompiledProj:
    fr = _frame(crs)
    NITER, EPS = 9, 1e-7

    def fwd(lam, phi):
        return 0.5 * lam * (1.0 + np.cos(phi)), 2.0 * (phi - np.tan(0.5 * phi))

    def inv(x, y):
        V = 0.5 * y
        p = np.asarray(y, np.float64).copy()
        for _ in range(NITER):
            c = np.cos(0.5 * p)
            dp = (p - np.tan(p / 2) - V) / (1.0 - 0.5 / (c * c))
            p = p - dp
            if np.all(np.abs(dp) < EPS):
                break
        lam = 2.0 * x / (1.0 + np.cos(p))
        return lam, p

    return CompiledProj("nell_h", fwd, inv, **fr)


@_register("wag2")
def setup_wag2(crs) -> CompiledProj:
    fr = _frame(crs)
    C_x = 0.92483
    C_y = 1.38725
    C_p1 = 0.88022
    C_p2 = 0.88550

    def fwd(lam, phi):
        ph = np.arcsin(np.clip(C_p1 * np.sin(C_p2 * phi), -1, 1))
        return C_x * lam * np.cos(ph), C_y * ph

    def inv(x, y):
        ph = y / C_y
        lam = x / (C_x * np.cos(ph))
        phi = np.arcsin(np.clip(np.sin(ph) / C_p1, -1, 1)) / C_p2
        return lam, phi

    return CompiledProj("wag2", fwd, inv, **fr)


@_register("wag3")
def setup_wag3(crs) -> CompiledProj:
    fr = _frame(crs)
    TWOTHIRD = 0.6666666666666666666667
    ts = m.dms_param(crs.params.get("lat_ts", "0"))
    C_x = math.cos(ts) / math.cos(2.0 * ts / 3.0)

    def fwd(lam, phi):
        return C_x * lam * np.cos(TWOTHIRD * phi), phi

    def inv(x, y):
        return x / (C_x * np.cos(TWOTHIRD * y)), y

    return CompiledProj("wag3", fwd, inv, **fr)


@_register("wag7")
def setup_wag7(crs) -> CompiledProj:
    """Wagner VII, forward only (PJ_wag7.c)."""
    fr = _frame(crs)

    def fwd(lam, phi):
        s = 0.90630778703664996 * np.sin(phi)
        theta = np.arcsin(np.clip(s, -1.0, 1.0))
        ct = np.cos(theta)
        lam3 = lam / 3.0
        c = np.sqrt(np.maximum(2.0 / (1.0 + ct * np.cos(lam3)), 0.0))
        x = 2.66723 * c * ct * np.sin(lam3)
        y = 1.24104 * c * s
        return x, y

    return CompiledProj("wag7", fwd, None, **fr)


@_register("boggs")
def setup_boggs(crs) -> CompiledProj:
    """Boggs eumorphic, no inverse (PJ_boggs.c)."""
    fr = _frame(crs)
    NITER = 20
    FXC = 2.00276
    FXC2 = 1.11072
    FYC = 0.49931
    def fwd(lam, phi):
        theta = np.asarray(phi, np.float64).copy()
        pole = np.abs(np.abs(phi) - HALFPI) < EPS10
        c = np.sin(theta) * PI
        for _ in range(NITER):
            th = theta + np.sin(theta)
            d = (th - c) / (1.0 + np.cos(theta))
            theta = theta - d
            if np.all(np.abs(d) < 1e-7):
                break
        theta = theta * 0.5
        with np.errstate(divide="ignore", invalid="ignore"):
            x = FXC * lam / (1.0 / np.cos(phi) + FXC2 / np.cos(theta))
        y = FYC * (phi + math.sqrt(2.0) * np.sin(theta))
        return np.where(pole, 0.0, x), y

    return CompiledProj("boggs", fwd, None, **fr)


@_register("denoy")
def setup_denoy(crs) -> CompiledProj:
    fr = _frame(crs)
    C0, C1, C3 = 0.95, -0.08333333333333333333, 0.00166666666666666666
    D1, D5 = 0.9, 0.03

    def fwd(lam, phi):
        aphi = np.abs(lam)
        y = phi
        x = lam * np.cos(
            (C0 + aphi * (C1 + aphi * aphi * C3))
            * (phi * (D1 + D5 * phi * phi * phi * phi))
        )
        return x, y

    return CompiledProj("denoy", fwd, None, **fr)


@_register("fahey")
def setup_fahey(crs) -> CompiledProj:
    fr = _frame(crs)
    TOL = 1e-6

    def fwd(lam, phi):
        t = np.tan(0.5 * phi)
        y = 1.819152 * t
        x = 0.819152 * lam * np.sqrt(np.maximum(1.0 - t * t, 0.0))
        return x, y

    def inv(x, y):
        t = y / 1.819152
        phi = 2.0 * np.arctan(t)
        t2 = 1.0 - t * t
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.where(np.abs(t2) < TOL, 0.0, x / (0.819152 * np.sqrt(np.maximum(t2, 1e-300))))
        return lam, phi

    return CompiledProj("fahey", fwd, inv, **fr)


@_register("fouc_s")
def setup_fouc_s(crs) -> CompiledProj:
    """Foucaut sinusoidal (PJ_fouc_s.c)."""
    fr = _frame(crs)
    n = float(crs.params.get("n", 0.5))
    if not (0.0 <= n <= 1.0):
        raise ValueError("fouc_s: n not in [0,1]")
    n1 = 1.0 - n
    MAX_ITER, LOOP_TOL = 10, 1e-7

    def fwd(lam, phi):
        t = np.cos(phi)
        x = lam * t / (n + n1 * t)
        y = n * phi + n1 * np.sin(phi)
        return x, y

    def inv(x, y):
        if n != 0.0:
            phi = np.asarray(y, np.float64).copy()
            for _ in range(MAX_ITER):
                V = (n * phi + n1 * np.sin(phi) - y) / (n + n1 * np.cos(phi))
                phi = phi - V
                if np.all(np.abs(V) < LOOP_TOL):
                    break
        else:
            phi = m.aasin(y)
        t = np.cos(phi)
        lam = x * (n + n1 * t) / t
        return lam, phi

    return CompiledProj("fouc_s", fwd, inv, **fr)


# ------------------------------------------------------------------- misc
@_register("hammer")
def setup_hammer(crs) -> CompiledProj:
    """Hammer(-Wagner) with W/M params (PJ_hammer.c: m_eff = M/w,
    rm = 1/M); inverse for the classic case (W=0.5, M=1) via the
    Snyder closed form."""
    fr = _frame(crs)
    w = 0.5
    if "W" in crs.params:
        w = abs(float(crs.params["W"]))
        if w <= 0.0:
            raise ValueError("hammer: W <= 0")
    big_m = 1.0
    if "M" in crs.params:
        big_m = abs(float(crs.params["M"]))
        if big_m <= 0.0:
            raise ValueError("hammer: M <= 0")
    m_eff = big_m / w
    rm = 1.0 / big_m

    def fwd(lam, phi):
        cosphi = np.cos(phi)
        lamw = lam * w
        d = np.sqrt(2.0 / (1.0 + cosphi * np.cos(lamw)))
        x = m_eff * d * cosphi * np.sin(lamw)
        y = rm * d * np.sin(phi)
        return x, y

    classic = w == 0.5 and big_m == 1.0

    def inv(x, y):
        # classic Hammer inverse: z = sqrt(1 - (x/4)^2 - (y/2)^2)
        z = np.sqrt(np.maximum(1.0 - 0.0625 * x * x - 0.25 * y * y, 0.0))
        lam = 2.0 * np.arctan2(z * x, 2.0 * (2.0 * z * z - 1.0))
        phi = m.aasin(np.clip(z * y, -1.0, 1.0))
        return lam, phi

    return CompiledProj("hammer", fwd, inv if classic else None, **fr)


@_register("aitoff", "wintri")
def setup_aitoff(crs) -> CompiledProj:
    """Aitoff / Winkel Tripel (PJ_aitoff.c), forward only like the
    reference."""
    fr = _frame(crs)
    winkel = crs.proj == "wintri"
    if winkel:
        if "lat_1" in crs.params:
            cosphi1 = math.cos(m.dms_param(crs.params["lat_1"]))
            if cosphi1 == 0.0:
                raise ValueError("wintri: lat_1 = 90")
        else:
            cosphi1 = 0.636619772367581343  # 2/pi

    def fwd(lam, phi):
        c = 0.5 * lam
        d = np.arccos(np.clip(np.cos(phi) * np.cos(c), -1.0, 1.0))
        nz = d != 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            y_ = np.where(nz, 1.0 / np.sin(np.where(nz, d, 1.0)), 0.0)
            x = np.where(nz, 2.0 * d * np.cos(phi) * np.sin(c) * y_, 0.0)
            y = np.where(nz, d * np.sin(phi) * y_, 0.0)
        if winkel:
            x = (x + lam * cosphi1) * 0.5
            y = (y + phi) * 0.5
        return x, y

    return CompiledProj(crs.proj, fwd, None, **fr)


@_register("vandg")
def setup_vandg(crs) -> CompiledProj:
    """Van der Grinten I (PJ_vandg.c)."""
    fr = _frame(crs)
    TOL = 1e-10
    THIRD = 0.33333333333333333333
    C2_27 = 0.07407407407407407407
    PI4_3 = 4.18879020478639098458
    PISQ = 9.86960440108935861869
    TPISQ = 19.73920880217871723738
    HPISQ = 4.93480220054467930934

    def fwd(lam, phi):
        """PJ_vandg.c s_forward."""
        lam = np.asarray(lam, np.float64)
        phi = np.asarray(phi, np.float64)
        p2 = np.abs(phi / HALFPI)
        bad = (p2 - TOL) > 1.0
        p2 = np.minimum(p2, 1.0)
        phi_zero = np.abs(phi) <= TOL
        lam_zero = (np.abs(lam) <= TOL) | (np.abs(p2 - 1.0) < TOL)
        with np.errstate(divide="ignore", invalid="ignore"):
            safe_lam = np.where(lam == 0.0, 1.0, lam)
            al = 0.5 * np.abs(PI / safe_lam - safe_lam / PI)
            al2 = al * al
            safe_p2 = np.where(p2 == 0.0, 1.0, p2)
            g = np.sqrt(np.maximum(1.0 - p2 * p2, 0.0))
            g = g / (p2 + g - 1.0)
            g2 = g * g
            p2b = g * (2.0 / safe_p2 - 1.0)
            p2b = p2b * p2b
            V = g - p2b
            G = p2b + al2
            x = PI * (al * V + np.sqrt(np.maximum(al2 * V * V - G * (g2 - p2b), 0.0))) / G
            x = np.where(lam < 0.0, -x, x)
            yv = np.abs(x / PI)
            yv = 1.0 - yv * (yv + 2.0 * al)
            yv = np.where(yv < -TOL, np.nan, np.maximum(yv, 0.0))
            y = np.sqrt(yv) * np.where(phi < 0.0, -PI, PI)
        # special branches
        x = np.where(phi_zero, lam, np.where(lam_zero, 0.0, x))
        y_edge = PI * np.tan(0.5 * np.arcsin(p2))
        y_edge = np.where(phi < 0.0, -y_edge, y_edge)
        y = np.where(phi_zero, 0.0, np.where(lam_zero, y_edge, y))
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y)

    def inv(x, y):
        """Cubic-solve inverse (PJ_vandg.c s_inverse)."""
        TWOPI = 2.0 * PI
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        x2 = x * x
        ay = np.abs(y)
        y_zero = ay < TOL
        y2 = y * y
        r = x2 + y2
        r2 = r * r
        with np.errstate(divide="ignore", invalid="ignore"):
            c1 = -PI * ay * (r + PISQ)
            c3 = r2 + TWOPI * (ay * r + PI * (y2 + PI * (ay + HALFPI)))
            c2 = (c1 + PISQ * (r - 3.0 * y2)) / c3
            c0 = PI * ay
            al = c1 / c3 - THIRD * c2 * c2
            mu = 2.0 * np.sqrt(np.maximum(-THIRD * al, 0.0))
            d = C2_27 * c2 * c2 * c2 + (c0 * c0 - THIRD * c2 * c1) / c3
            d = 3.0 * d / (al * mu)
            t = np.abs(d)
            d = np.where(
                t > 1.0, np.where(d > 0.0, 0.0, PI), np.arccos(np.clip(d, -1.0, 1.0))
            )
            phi = PI * (mu * np.cos(d * THIRD + PI4_3) - THIRD * c2)
            phi = np.where(y < 0.0, -phi, phi)
            # lam via the Snyder closed form (28-18; X = x/pi, Y = y/pi):
            # lam = pi*(X^2 + Y^2 - 1 + sqrt(1 + 2(X^2-Y^2) + (X^2+Y^2)^2))/(2X)
            X = x / PI
            Y = y / PI
            X2 = X * X
            Y2 = Y * Y
            lam = np.where(
                np.abs(x) <= TOL,
                0.0,
                PI
                * (X2 + Y2 - 1.0 + np.sqrt(np.maximum(1.0 + 2.0 * (X2 - Y2) + (X2 + Y2) ** 2, 0.0)))
                / (2.0 * np.where(X == 0.0, 1.0, X)),
            )
        phi = np.where(y_zero, 0.0, phi)
        return lam, phi

    return CompiledProj("vandg", fwd, inv, **fr)


@_register("bonne")
def setup_bonne(crs) -> CompiledProj:
    """Bonne pseudoconic (PJ_bonne.c)."""
    fr = _frame(crs)
    es = crs.es
    phi1 = m.dms_param(crs.params.get("lat_1", "45"))
    if abs(phi1) < EPS10:
        raise ValueError("bonne: |lat_1| ~ 0 (use sinu)")
    if es:
        en = m.enfn(es)
        c = math.cos(phi1)
        sp = math.sin(phi1)
        m1 = float(m.msfn(sp, c, es))
        am1 = sp
        ml1 = float(m.mlfn(phi1, sp, c, en))
        am1 = m1 / am1  # cot(phi1)*m1... PROJ: am1 = c/(sqrt(1-es*sp*sp)*sp)

        def fwd(lam, phi):
            sinphi = np.sin(phi)
            cosphi = np.cos(phi)
            rh = am1 + ml1 - m.mlfn(phi, sinphi, cosphi, en)
            E = cosphi * lam / (rh * np.sqrt(1.0 - es * sinphi * sinphi))
            return rh * np.sin(E), am1 + ml1 - rh * np.cos(E)

        def inv(x, y):
            yy = am1 + ml1 - y
            rh = np.hypot(x, yy)
            phi = m.inv_mlfn(am1 + ml1 - rh, es, en)
            sinphi = np.sin(phi)
            with np.errstate(divide="ignore", invalid="ignore"):
                lam = rh * np.arctan2(x, yy) * np.sqrt(1.0 - es * sinphi * sinphi) / np.cos(phi)
            return lam, phi

    else:
        cphi1 = 1.0 / math.tan(phi1)

        def fwd(lam, phi):
            rh = cphi1 + phi1 - phi
            nz = np.abs(rh) > EPS10
            with np.errstate(divide="ignore", invalid="ignore"):
                E = np.where(nz, lam * np.cos(phi) / rh, 0.0)
            return rh * np.sin(E), cphi1 - rh * np.cos(E)

        def inv(x, y):
            yy = cphi1 - y
            rh = np.hypot(x, yy)
            phi = cphi1 + phi1 - rh
            bad = np.abs(phi) > HALFPI
            with np.errstate(divide="ignore", invalid="ignore"):
                lam = np.where(
                    np.abs(np.abs(phi) - HALFPI) <= EPS10,
                    0.0,
                    rh * np.arctan2(x, yy) / np.cos(phi),
                )
            return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)

    return CompiledProj("bonne", fwd, inv, **fr)


@_register("poly")
def setup_poly(crs) -> CompiledProj:
    """American polyconic (PJ_poly.c), sphere + ellipsoid."""
    fr = _frame(crs)
    es = crs.es
    one_es = crs.one_es
    phi0 = fr["phi0"]
    TOL, CONV, N_ITER, I_ITER, ITOL = 1e-10, 1e-10, 10, 20, 1e-12
    if es:
        en = m.enfn(es)
        ml0 = float(m.mlfn(phi0, math.sin(phi0), math.cos(phi0), en))

        def fwd(lam, phi):
            small = np.abs(phi) <= TOL
            sp = np.sin(phi)
            cp = np.cos(phi)
            with np.errstate(divide="ignore", invalid="ignore"):
                ms = np.where(
                    np.abs(sp) > TOL,
                    m.msfn(sp, cp, es) / np.where(sp == 0.0, 1.0, sp),
                    0.0,
                )
                E = lam * sp
                x = np.where(small, lam, ms * np.sin(E))
                y = np.where(
                    small, -ml0, m.mlfn(phi, sp, cp, en) - ml0 + ms * (1.0 - np.cos(E))
                )
            return x, y

        def inv(x, y):
            """PJ_poly.c e_inverse Newton iteration (I_ITER=20,
            ITOL=1e-12)."""
            x = np.asarray(x, np.float64)
            yy = np.asarray(y, np.float64) + ml0
            small = np.abs(yy) <= TOL
            r = yy * yy + x * x
            phi = yy.copy()
            with np.errstate(divide="ignore", invalid="ignore"):
                for _ in range(I_ITER):
                    sp = np.sin(phi)
                    cp = np.cos(phi)
                    s2ph = sp * cp
                    mlp = np.sqrt(1.0 - es * sp * sp)
                    c = sp * mlp / cp
                    ml = m.mlfn(phi, sp, cp, en)
                    mlb = ml * ml + r
                    mlp = one_es / (mlp * mlp * mlp)
                    dPhi = (
                        ml + ml + c * mlb - 2.0 * yy * (c * ml + 1.0)
                    ) / (
                        es * s2ph * (mlb - 2.0 * yy * ml) / c
                        + 2.0 * (yy - ml) * (c * mlp - 1.0 / s2ph)
                        - mlp
                        - mlp
                    )
                    phi = phi + dPhi
                    if np.all(np.abs(dPhi) <= ITOL):
                        break
                c = np.sin(phi)
                lam = (
                    np.arcsin(
                        np.clip(x * np.tan(phi) * np.sqrt(1.0 - es * c * c), -1.0, 1.0)
                    )
                    / np.where(c == 0.0, 1.0, np.sin(phi))
                )
            lam = np.where(small, x, lam)
            phi = np.where(small, 0.0, phi)
            return lam, phi

    else:
        ml0 = -phi0

        def fwd(lam, phi):
            small = np.abs(phi) <= TOL
            with np.errstate(divide="ignore", invalid="ignore"):
                cot = 1.0 / np.tan(np.where(small, 1.0, phi))
                E = lam * np.sin(phi)
                x = np.where(small, lam, cot * np.sin(E))
                y = np.where(small, ml0, phi - phi0 + cot * (1.0 - np.cos(E)))
            return x, y

        def inv(x, y):
            x = np.asarray(x, np.float64)
            yy = np.asarray(y, np.float64) + phi0
            small = np.abs(yy) <= TOL
            B = x * x + yy * yy
            phi = yy.copy()
            with np.errstate(divide="ignore", invalid="ignore"):
                for _ in range(N_ITER):
                    tp = np.tan(phi)
                    dphi = (
                        yy * (phi * tp + 1.0) - phi - 0.5 * (phi * phi + B) * tp
                    ) / ((phi - yy) / tp - 1.0)
                    phi = phi - dphi
                    if np.all(np.abs(dphi) <= CONV):
                        break
                lam = np.arcsin(np.clip(x * np.tan(phi), -1.0, 1.0)) / np.sin(phi)
            lam = np.where(small, x, lam)
            phi = np.where(small, 0.0, phi)
            return lam, phi

    return CompiledProj("poly", fwd, inv, **fr)


@_register("nsper", "tpers")
def setup_nsper(crs) -> CompiledProj:
    """Near-sided perspective / tilted perspective, sphere
    (PJ_nsper.c).  Height +h in meters above the surface; P in sphere
    radii.  tpers adds the tilt/azimuth rotation (fwd + inv)."""
    fr = _frame(crs)
    height = float(crs.params.get("h", 0.0))
    if height <= 0.0:
        raise ValueError("nsper: h must be positive")
    phi0 = fr["phi0"]
    sinph0, cosph0 = math.sin(phi0), math.cos(phi0)
    p = 1.0 + height / crs.a
    rp = 1.0 / p
    h_ = 1.0 / (p - 1.0)
    pn1 = p - 1.0  # PJ_nsper.c: pn1 = h/a
    tilted = crs.proj == "tpers"
    if tilted:
        omega = m.dms_param(crs.params.get("tilt", "0"))
        gamma = m.dms_param(crs.params.get("azi", "0"))
        cg, sg = math.cos(gamma), math.sin(gamma)
        cw, sw = math.cos(omega), math.sin(omega)

    def fwd(lam, phi):
        sinphi, cosphi = np.sin(phi), np.cos(phi)
        coslam = np.cos(lam)
        cosc = sinph0 * sinphi + cosph0 * cosphi * coslam
        bad = cosc < rp
        k = pn1 / (p - cosc)
        x = k * cosphi * np.sin(lam)
        y = k * (cosph0 * sinphi - sinph0 * cosphi * coslam)
        if tilted:
            # PJ_nsper.c tilt block: rotate by gamma, scale by tilt
            yt = y * cg + x * sg
            ba = 1.0 / (yt * sw * h_ + cw)
            x2 = (x * cg - y * sg) * cw * ba
            y2 = yt * ba
            x, y = x2, y2
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y)

    def inv(x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        if tilted:
            # invert the tilt block: forward is yt = y*cg + x*sg,
            # xt = x*cg - y*sg, ba = 1/(yt*sw*h_ + cw), X = xt*cw*ba,
            # Y = yt*ba  =>  solve for (x, y)
            with np.errstate(divide="ignore", invalid="ignore"):
                yt = y * cw / (1.0 - y * sw * h_)
                xt = x * (yt * sw * h_ + cw) / cw
                x = xt * cg + yt * sg
                y = yt * cg - xt * sg
        rh = np.hypot(x, y)
        disc = 1.0 - rh * rh * (p + 1.0) / (p - 1.0)
        bad = disc < 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            sinz = (p - np.sqrt(np.maximum(disc, 0.0))) / (
                (p - 1.0) / np.where(rh == 0.0, 1.0, rh)
                + np.where(rh == 0.0, 1.0, rh) / (p - 1.0)
            )
            sinz = np.clip(sinz, -1.0, 1.0)
            cosz = np.sqrt(1.0 - sinz * sinz)
            phi = np.where(
                rh == 0.0,
                phi0,
                m.aasin(
                    np.clip(
                        cosz * sinph0
                        + y * sinz * cosph0 / np.where(rh == 0.0, 1.0, rh),
                        -1.0,
                        1.0,
                    )
                ),
            )
            lam = np.arctan2(x * sinz, rh * cosph0 * cosz - y * sinph0 * sinz)
        return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)

    return CompiledProj(crs.proj, fwd, inv, **fr)


@_register("lagrng")
def setup_lagrng(crs) -> CompiledProj:
    """Lagrange, sphere, no inverse (PJ_lagrng.c)."""
    fr = _frame(crs)
    W = float(crs.params.get("W", 2.0))
    if W <= 0.0:
        raise ValueError("lagrng: W <= 0")
    rw = 1.0 / W
    phi1 = m.dms_param(crs.params.get("lat_1", "0"))
    a1 = math.log((1.0 - math.sin(phi1)) / (1.0 + math.sin(phi1))) * 0.5 * rw
    a1 = math.exp(a1)  # hrw-power form

    def fwd(lam, phi):
        pole = np.abs(np.abs(phi) - HALFPI) < EPS10
        sp = np.sin(phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            v = a1 * np.power((1.0 + sp) / (1.0 - sp), 0.5 * rw)
            c = 0.5 * (v + 1.0 / v) + np.cos(lam * rw)
            x = 2.0 * np.sin(lam * rw) / c
            y = (v - 1.0 / v) / c
        x = np.where(pole, 0.0, x)
        y = np.where(pole, np.sign(phi) * 2.0, y)
        return x, y

    return CompiledProj("lagrng", fwd, None, **fr)


@_register("larr")
def setup_larr(crs) -> CompiledProj:
    fr = _frame(crs)
    SIXTH = 0.16666666666666666

    def fwd(lam, phi):
        x = 0.5 * lam * (1.0 + np.sqrt(np.cos(phi)))
        y = phi / (np.cos(0.5 * phi) * np.cos(SIXTH * lam))
        return x, y

    return CompiledProj("larr", fwd, None, **fr)


@_register("lask")
def setup_lask(crs) -> CompiledProj:
    fr = _frame(crs)
    a10, a12, a32, a14, a34 = 0.975534, -0.119161, -0.0143059, -0.0547009, -0.0435665
    b01, b21, b03, b41, b23, b05 = 1.00384, 0.0802894, 0.0998909, 0.000199025, -0.0285500, -0.0491032

    def fwd(lam, phi):
        l2 = lam * lam
        p2 = phi * phi
        x = lam * (a10 + p2 * (a12 + l2 * a32 + p2 * a14) + l2 * p2 * p2 * a34)
        y = phi * (b01 + l2 * (b21 + p2 * b23 + l2 * b41) + p2 * (b03 + p2 * b05))
        return x, y

    return CompiledProj("lask", fwd, None, **fr)


@_register("gins8")
def setup_gins8(crs) -> CompiledProj:
    fr = _frame(crs)
    Cl, Cp = 0.000952426, 0.162388
    C12 = 0.08333333333333333

    def fwd(lam, phi):
        t = phi * phi
        y = phi * (1.0 + t * C12)
        x = lam * (1.0 - Cp * t)
        t = lam * lam
        x = x * (0.87 - Cl * t * t)
        return x, y

    return CompiledProj("gins8", fwd, None, **fr)


@_register("august")
def setup_august(crs) -> CompiledProj:
    fr = _frame(crs)
    M = 1.333333333333333

    def fwd(lam, phi):
        t = np.tan(0.5 * phi)
        c1 = np.sqrt(np.maximum(1.0 - t * t, 0.0))
        c = 1.0 + c1 * np.cos(lam * 0.5)
        x1 = np.sin(lam * 0.5) * c1 / c
        y1 = t / c
        x = M * x1 * (3.0 + x1 * x1 - 3.0 * y1 * y1)
        y = M * y1 * (3.0 + 3.0 * x1 * x1 - y1 * y1)
        return x, y

    return CompiledProj("august", fwd, None, **fr)


@_register("apian", "ortel", "bacon")
def setup_bacon(crs) -> CompiledProj:
    """Globular family (PJ_bacon.c:8-28), forward only."""
    fr = _frame(crs)
    name = crs.proj
    bacn = name == "bacon"
    ortl = name == "ortel"
    HLFPI2 = 2.46740110027233965467

    def fwd(lam, phi):
        lam = np.asarray(lam, np.float64)
        phi = np.asarray(phi, np.float64)
        y = HALFPI * np.sin(phi) if bacn else phi.copy()
        ax = np.abs(lam)
        with np.errstate(divide="ignore", invalid="ignore"):
            f = 0.5 * (HLFPI2 / np.where(ax == 0.0, 1.0, ax) + ax)
            x_main = ax - f + np.sqrt(np.maximum(f * f - y * y, 0.0))
            if ortl:
                x_pole = np.sqrt(np.maximum(HLFPI2 - phi * phi, 0.0) + EPS10) + ax - HALFPI
                x_main = np.where(ax >= HALFPI, x_pole, x_main)
        x = np.where(ax >= EPS10, np.where(lam < 0.0, -x_main, x_main), 0.0)
        return x, y

    return CompiledProj(name, fwd, None, **fr)


@_register("nicol")
def setup_nicol(crs) -> CompiledProj:
    """Nicolosi globular, sphere, no inverse (PJ_nocol.c)."""
    fr = _frame(crs)
    EPS = 1e-10

    def fwd(lam, phi):
        lam = np.asarray(lam, np.float64)
        phi = np.asarray(phi, np.float64)
        zero_lam = np.abs(lam) < EPS
        zero_phi = np.abs(phi) < EPS
        pole = np.abs(np.abs(phi) - HALFPI) < EPS
        eq_lam = np.abs(np.abs(lam) - HALFPI) < EPS
        with np.errstate(divide="ignore", invalid="ignore"):
            tb = HALFPI / lam - lam / HALFPI
            c = phi / HALFPI
            sp = np.sin(phi)
            d = (1.0 - c * c) / (sp - c)
            r2 = tb / d
            r2 = r2 * r2
            mm = (tb * sp / d - 0.5 * tb) / (1.0 + r2)
            n = (sp / r2 + 0.5 * d) / (1.0 + 1.0 / r2)
            x = np.cos(phi)
            x = np.sqrt(np.maximum(mm * mm + x * x / (1.0 + r2), 0.0))
            x = HALFPI * (mm + np.where(lam < 0.0, -x, x))
            f = n * n - (sp * sp / r2 + d * sp - 1.0) / (1.0 + 1.0 / r2)
            y = np.sqrt(np.maximum(f, 0.0))
            y = HALFPI * (n + np.where(phi < 0.0, y, -y))
        x = np.where(zero_lam | pole, 0.0, np.where(zero_phi, lam, np.where(eq_lam, lam * np.cos(phi), x)))
        y = np.where(
            zero_lam,
            phi,
            np.where(
                zero_phi, 0.0, np.where(eq_lam, HALFPI * np.sin(phi), np.where(pole, phi, y))
            ),
        )
        return x, y

    return CompiledProj("nicol", fwd, None, **fr)
