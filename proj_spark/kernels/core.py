"""Projection kernels: vectorized numpy fwd/inv pairs.

Each kernel family is a ``setup(crs) -> CompiledProj`` function
registered in :data:`REGISTRY`.  ``fwd(lam, phi)`` / ``inv(x, y)``
operate in kernel-local space exactly like the reference's
``(*P->fwd)`` / ``(*P->inv)`` function pointers: the generic
wrapping (lam0 subtraction, adjlon, a-scaling, false easting/
northing, unit conversion, overrange checks) lives in
``proj_spark.plans.pipeline`` — the analog of pj_fwd.c / pj_inv.c.

Behavioral references (formulas transcribed, all public Snyder/PROJ
math): PJ_merc.c, PJ_tmerc.c, PJ_lcc.c, PJ_stere.c, PJ_eqc.c,
PJ_cea.c, PJ_laea.c, PJ_aea.c, PJ_moll.c, PJ_sinu (PJ_gn_sinu.c),
pj_latlong.c, pj_geocent.c.

Failure convention: unprojectable points yield NaN (the Spark analog
of HUGE_VAL, src/pj_transform.c:175); lanes never raise.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable

import numpy as np

from . import xmath as m
from .xmath import FORTPI, HALFPI, PI

EPS10 = 1.0e-10


@dataclass
class CompiledProj:
    name: str
    fwd: Callable  # (lam, phi) -> (x, y)
    inv: Callable | None  # (x, y) -> (lam, phi)
    # effective frame params (ENTRY functions may override CRS values,
    # e.g. utm forces x0/k0/lam0 — PJ_tmerc.c:156-175)
    lam0: float
    phi0: float
    x0: float
    y0: float
    k0: float
    # optional analytic scale-factor path (the reference's P->spc hook,
    # src/pj_factors.c:41-42): ``spc(lam, phi) -> dict`` with keys
    # ``h``/``k``/``conv`` (arrays) and ``mask`` (bool array — where the
    # analytic value applies; numeric derivatives fill the rest).  Only
    # lcc (PJ_lcc.c:49-61) and eqdc (PJ_eqdc.c:39-48) define one, same
    # as the reference.
    spc: Callable | None = None


def _frame(crs) -> dict:
    return dict(lam0=crs.lam0, phi0=crs.phi0, x0=crs.x0, y0=crs.y0, k0=crs.k0)


# ----------------------------------------------------------------- latlong
def setup_latlong(crs) -> CompiledProj:
    def ident2(u, v):
        return np.asarray(u, dtype=np.float64), np.asarray(v, dtype=np.float64)

    return CompiledProj("latlong", ident2, ident2, **_frame(crs))


def setup_geocent(crs) -> CompiledProj:
    # marker only: the pipeline handles the ECEF leg (pj_geocent.c:51-57)
    def ident2(u, v):
        return np.asarray(u, dtype=np.float64), np.asarray(v, dtype=np.float64)

    return CompiledProj("geocent", ident2, ident2, **_frame(crs))


# -------------------------------------------------------------------- merc
def setup_merc(crs) -> CompiledProj:
    fr = _frame(crs)
    es, e = crs.es, crs.e
    if "lat_ts" in crs.params:
        phits = abs(m.dms_param(crs.params["lat_ts"]))
        if phits >= HALFPI:
            raise ValueError("merc: |lat_ts| >= 90")
        fr["k0"] = (
            float(m.msfn(math.sin(phits), math.cos(phits), es)) if es else math.cos(phits)
        )
    k0 = fr["k0"]

    if es:

        def fwd(lam, phi):
            bad = np.abs(np.abs(phi) - HALFPI) <= EPS10
            y = -k0 * np.log(m.tsfn(phi, np.sin(phi), e))
            x = k0 * lam
            return np.where(bad, np.nan, x), np.where(bad, np.nan, y)

        def inv(x, y):
            phi = m.phi2(np.exp(-y / k0), e)
            return x / k0, phi

    else:

        def fwd(lam, phi):
            bad = np.abs(np.abs(phi) - HALFPI) <= EPS10
            y = k0 * np.log(np.tan(FORTPI + 0.5 * phi))
            return np.where(bad, np.nan, k0 * lam), np.where(bad, np.nan, y)

        def inv(x, y):
            return x / k0, HALFPI - 2.0 * np.arctan(np.exp(-y / k0))

    return CompiledProj("merc", fwd, inv, **fr)


# ------------------------------------------------------------------- tmerc
_FC1 = 1.0
_FC2 = 0.5
_FC3 = 0.16666666666666666666
_FC4 = 0.08333333333333333333
_FC5 = 0.05
_FC6 = 0.03333333333333333333
_FC7 = 0.02380952380952380952
_FC8 = 0.01785714285714285714


def _tmerc_build(crs, fr) -> CompiledProj:
    es = crs.es
    k0 = fr["k0"]
    phi0 = fr["phi0"]
    if es:
        e_ = crs.e  # noqa: F841  (kept for parity clarity)
        en = m.enfn(es)
        ml0 = float(m.mlfn(phi0, math.sin(phi0), math.cos(phi0), en))
        esp = es / (1.0 - es)

        def fwd(lam, phi):
            overr = (lam < -HALFPI) | (lam > HALFPI)
            sinphi = np.sin(phi)
            cosphi = np.cos(phi)
            t = np.where(np.abs(cosphi) > 1e-10, sinphi / np.where(cosphi == 0, 1.0, cosphi), 0.0)
            t = t * t
            al = cosphi * lam
            als = al * al
            al = al / np.sqrt(1.0 - es * sinphi * sinphi)
            n = esp * cosphi * cosphi
            x = (
                k0
                * al
                * (
                    _FC1
                    + _FC3
                    * als
                    * (
                        1.0
                        - t
                        + n
                        + _FC5
                        * als
                        * (
                            5.0
                            + t * (t - 18.0)
                            + n * (14.0 - 58.0 * t)
                            + _FC7 * als * (61.0 + t * (t * (179.0 - t) - 479.0))
                        )
                    )
                )
            )
            y = k0 * (
                m.mlfn(phi, sinphi, cosphi, en)
                - ml0
                + sinphi
                * al
                * lam
                * _FC2
                * (
                    1.0
                    + _FC4
                    * als
                    * (
                        5.0
                        - t
                        + n * (9.0 + 4.0 * n)
                        + _FC6
                        * als
                        * (
                            61.0
                            + t * (t - 58.0)
                            + n * (270.0 - 330.0 * t)
                            + _FC8 * als * (1385.0 + t * (t * (543.0 - t) - 3111.0))
                        )
                    )
                )
            )
            return np.where(overr, np.nan, x), np.where(overr, np.nan, y)

        def inv(x, y):
            phi = m.inv_mlfn(ml0 + y / k0, es, en)
            atpole = np.abs(phi) >= HALFPI
            phi_p = np.where(atpole, np.where(y < 0.0, -HALFPI, HALFPI), phi)
            sinphi = np.sin(phi)
            cosphi = np.cos(phi)
            t = np.where(np.abs(cosphi) > 1e-10, sinphi / np.where(cosphi == 0, 1.0, cosphi), 0.0)
            n = esp * cosphi * cosphi
            con = 1.0 - es * sinphi * sinphi
            d = x * np.sqrt(con) / k0
            con = con * t
            t = t * t
            ds = d * d
            phi_o = phi - (con * ds / (1.0 - es)) * _FC2 * (
                1.0
                - ds
                * _FC4
                * (
                    5.0
                    + t * (3.0 - 9.0 * n)
                    + n * (1.0 - 4.0 * n)
                    - ds
                    * _FC6
                    * (
                        61.0
                        + t * (90.0 - 252.0 * n + 45.0 * t)
                        + 46.0 * n
                        - ds * _FC8 * (1385.0 + t * (3633.0 + t * (4095.0 + 1574.0 * t)))
                    )
                )
            )
            lam_o = (
                d
                * (
                    _FC1
                    - ds
                    * _FC3
                    * (
                        1.0
                        + 2.0 * t
                        + n
                        - ds
                        * _FC5
                        * (
                            5.0
                            + t * (28.0 + 24.0 * t + 8.0 * n)
                            + 6.0 * n
                            - ds * _FC7 * (61.0 + t * (662.0 + t * (1320.0 + 720.0 * t)))
                        )
                    )
                )
                / np.where(cosphi == 0, 1.0, cosphi)
            )
            return np.where(atpole, 0.0, lam_o), np.where(atpole, phi_p, phi_o)

    else:
        aks0 = k0
        aks5 = 0.5 * k0

        def fwd(lam, phi):
            overr = (lam < -HALFPI) | (lam > HALFPI)
            cosphi = np.cos(phi)
            b = cosphi * np.sin(lam)
            bad = np.abs(np.abs(b) - 1.0) <= EPS10
            x = aks5 * np.log((1.0 + b) / np.where(bad, np.nan, 1.0 - b))
            yy = cosphi * np.cos(lam) / np.sqrt(1.0 - b * b)
            ayy = np.abs(yy)
            y = np.where(ayy >= 1.0, np.where(ayy - 1.0 > EPS10, np.nan, 0.0), np.arccos(np.clip(yy, -1, 1)))
            y = np.where(phi < 0.0, -y, y)
            y = aks0 * (y - phi0)
            bad = bad | overr
            return np.where(bad, np.nan, x), np.where(bad, np.nan, y)

        def inv(x, y):
            h = np.exp(x / aks0)
            g = 0.5 * (h - 1.0 / h)
            h = np.cos(phi0 + y / aks0)
            phi = np.arcsin(np.sqrt((1.0 - h * h) / (1.0 + g * g)))
            phi = np.where(y < 0.0, -phi, phi)
            lam = np.where((g != 0) | (h != 0), np.arctan2(g, h), 0.0)
            return lam, phi

    return CompiledProj("tmerc", fwd, inv, **fr)


def setup_tmerc(crs) -> CompiledProj:
    return _tmerc_build(crs, _frame(crs))


def setup_utm(crs) -> CompiledProj:
    # UTM wrapper (PJ_tmerc.c:156-175)
    if not crs.es:
        raise ValueError("utm requires an ellipsoid")
    fr = _frame(crs)
    fr["y0"] = 10000000.0 if "south" in crs.params else 0.0
    fr["x0"] = 500000.0
    if "zone" in crs.params:
        zone = int(crs.params["zone"])
        if not (0 < zone <= 60):
            raise ValueError("invalid utm zone")
        zone -= 1
    else:
        zone = int(math.floor((float(m.adjlon(crs.lam0)) + PI) * 30.0 / PI))
        zone = min(max(zone, 0), 59)
    fr["lam0"] = (zone + 0.5) * PI / 30.0 - PI
    fr["k0"] = 0.9996
    fr["phi0"] = 0.0
    return _tmerc_build(crs, fr)._replace_name("utm")


def _cp_replace_name(self: CompiledProj, name: str) -> CompiledProj:
    self.name = name
    return self


CompiledProj._replace_name = _cp_replace_name  # type: ignore[attr-defined]


# --------------------------------------------------------------------- lcc
def setup_lcc(crs) -> CompiledProj:
    fr = _frame(crs)
    es, e = crs.es, crs.e
    params = crs.params
    phi1 = m.dms_param(params["lat_1"]) if "lat_1" in params else 33.0 * m.DEG_TO_RAD
    if "lat_2" in params:
        phi2v = m.dms_param(params["lat_2"])
    else:
        phi2v = phi1
        if "lat_0" not in params:
            fr["phi0"] = phi1
    if abs(phi1 + phi2v) < EPS10:
        raise ValueError("lcc: |lat_1 + lat_2| ~ 0")
    phi0 = fr["phi0"]
    n = sinphi = math.sin(phi1)
    cosphi = math.cos(phi1)
    secant = abs(phi1 - phi2v) >= EPS10
    ellips = es != 0.0
    if ellips:
        m1 = float(m.msfn(sinphi, cosphi, es))
        ml1 = float(m.tsfn(phi1, sinphi, e))
        if secant:
            sinphi = math.sin(phi2v)
            n = math.log(m1 / float(m.msfn(sinphi, math.cos(phi2v), es)))
            n /= math.log(ml1 / float(m.tsfn(phi2v, sinphi, e)))
        c = rho0 = m1 * ml1 ** (-n) / n
        if abs(abs(phi0) - HALFPI) < EPS10:
            rho0 = 0.0
        else:
            rho0 *= float(m.tsfn(phi0, math.sin(phi0), e)) ** n
    else:
        if secant:
            n = math.log(cosphi / math.cos(phi2v)) / math.log(
                math.tan(FORTPI + 0.5 * phi2v) / math.tan(FORTPI + 0.5 * phi1)
            )
        c = cosphi * math.tan(FORTPI + 0.5 * phi1) ** n / n
        rho0 = 0.0 if abs(abs(phi0) - HALFPI) < EPS10 else c * math.tan(FORTPI + 0.5 * phi0) ** (-n)
    k0 = fr["k0"]

    def fwd(lam, phi):
        atpole = np.abs(np.abs(phi) - HALFPI) < EPS10
        badpole = atpole & (phi * n <= 0.0)
        if ellips:
            rho = c * np.power(m.tsfn(phi, np.sin(phi), e), n)
        else:
            rho = c * np.power(np.tan(FORTPI + 0.5 * phi), -n)
        rho = np.where(atpole, 0.0, rho)
        lamn = lam * n
        x = k0 * (rho * np.sin(lamn))
        y = k0 * (rho0 - rho * np.cos(lamn))
        return np.where(badpole, np.nan, x), np.where(badpole, np.nan, y)

    def inv(x, y):
        x = x / k0
        y = rho0 - y / k0
        rho = np.hypot(x, y)
        if n < 0.0:
            rho = -rho
            x = -x
            y = -y
        nz = rho != 0.0
        if ellips:
            phi = m.phi2(np.power(np.where(nz, rho / c, 1.0), 1.0 / n), e)
        else:
            phi = 2.0 * np.arctan(np.power(c / np.where(nz, rho, 1.0), 1.0 / n)) - HALFPI
        phi = np.where(nz, phi, np.where(n > 0.0, HALFPI, -HALFPI))
        lam = np.where(nz, np.arctan2(x, y) / n, 0.0)
        return lam, phi

    def spc(lam, phi):
        # analytic h=k and convergence (PJ_lcc.c SPECIAL(fac):
        # IS_ANAL_HK + IS_ANAL_CONV).  Where the pole guard trips the
        # reference leaves fac untouched -> mask=False there so the
        # numeric path fills in.
        atpole = np.abs(np.abs(phi) - HALFPI) < EPS10
        badpole = atpole & (phi * n <= 0.0)
        if ellips:
            rho = c * np.power(m.tsfn(phi, np.sin(phi), e), n)
        else:
            rho = c * np.power(np.tan(FORTPI + 0.5 * phi), -n)
        rho = np.where(atpole, 0.0, rho)
        hk = k0 * n * rho / m.msfn(np.sin(phi), np.cos(phi), es)
        return {"h": hk, "k": hk, "conv": -n * lam, "mask": ~badpole}

    return CompiledProj("lcc", fwd, inv, spc=spc, **fr)


# ------------------------------------------------------------------- stere
def setup_stere(crs, ups: bool = False) -> CompiledProj:
    fr = _frame(crs)
    es, e = crs.es, crs.e
    if ups:
        if not es:
            raise ValueError("ups requires ellipsoid")
        fr["phi0"] = -HALFPI if "south" in crs.params else HALFPI
        fr["k0"] = 0.994
        fr["x0"] = 2000000.0
        fr["y0"] = 2000000.0
        fr["lam0"] = 0.0
        phits = HALFPI
    else:
        phits = m.dms_param(crs.params["lat_ts"]) if "lat_ts" in crs.params else HALFPI
    phi0 = fr["phi0"]
    k0 = fr["k0"]
    t = abs(phi0)
    if abs(t - HALFPI) < EPS10:
        mode = "S_POLE" if phi0 < 0.0 else "N_POLE"
    else:
        mode = "OBLIQ" if t > EPS10 else "EQUIT"
    phits = abs(phits)

    def ssfn(phit, sinphi):
        sinphi = sinphi * e
        return np.tan(0.5 * (HALFPI + phit)) * np.power((1.0 - sinphi) / (1.0 + sinphi), 0.5 * e)

    sinX1 = cosX1 = 0.0
    if es:
        if mode in ("N_POLE", "S_POLE"):
            if abs(phits - HALFPI) < EPS10:
                akm1 = 2.0 * k0 / math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))
            else:
                st = math.sin(phits)
                akm1 = math.cos(phits) / float(m.tsfn(phits, st, e))
                st *= e
                akm1 /= math.sqrt(1.0 - st * st)
        else:
            st = math.sin(phi0)
            X = 2.0 * math.atan(float(ssfn(phi0, st))) - HALFPI
            st *= e
            akm1 = 2.0 * k0 * math.cos(phi0) / math.sqrt(1.0 - st * st)
            sinX1 = math.sin(X)
            cosX1 = math.cos(X)

        def fwd(lam, phi):
            coslam = np.cos(lam)
            sinlam = np.sin(lam)
            sinphi = np.sin(phi)
            if mode in ("OBLIQ", "EQUIT"):
                X = 2.0 * np.arctan(ssfn(phi, sinphi)) - HALFPI
                sinX = np.sin(X)
                cosX = np.cos(X)
                if mode == "OBLIQ":
                    A = akm1 / (cosX1 * (1.0 + sinX1 * sinX + cosX1 * cosX * coslam))
                    y = A * (cosX1 * sinX - sinX1 * cosX * coslam)
                else:
                    A = 2.0 * akm1 / (1.0 + cosX * coslam)
                    y = A * sinX
                x = A * cosX
            else:
                if mode == "S_POLE":
                    phi = -phi
                    coslam = -coslam
                    sinphi = -sinphi
                x = akm1 * m.tsfn(phi, sinphi, e)
                y = -x * coslam
            return x * sinlam, y

        def inv(x, y):
            rho = np.hypot(x, y)
            if mode in ("OBLIQ", "EQUIT"):
                tp = 2.0 * np.arctan2(rho * cosX1, akm1)
                cosphi = np.cos(tp)
                sinphi = np.sin(tp)
                phi_l = np.where(
                    rho == 0.0,
                    np.arcsin(np.clip(cosphi * sinX1, -1, 1)),
                    np.arcsin(np.clip(cosphi * sinX1 + (y * sinphi * cosX1 / np.where(rho == 0, 1, rho)), -1, 1)),
                )
                tp = np.tan(0.5 * (HALFPI + phi_l))
                x = x * sinphi
                y = rho * cosX1 * cosphi - y * sinX1 * sinphi
                halfpi = HALFPI
                halfe = 0.5 * e
            else:
                if mode == "N_POLE":
                    y = -y
                tp = -rho / akm1
                phi_l = HALFPI - 2.0 * np.arctan(tp)
                halfpi = -HALFPI
                halfe = -0.5 * e
            # 8-iteration fixed point (PJ_stere.c:120-130), masked lanes
            phi = phi_l.copy() if hasattr(phi_l, "copy") else np.asarray(phi_l)
            out_phi = np.full_like(phi, np.nan)
            active = np.ones(phi.shape, dtype=bool)
            phi_prev = phi_l
            for _ in range(8):
                if not np.any(active):
                    break
                sp = e * np.sin(phi_prev[active] if hasattr(phi_prev, "__getitem__") else phi_prev)
                newphi = (
                    2.0
                    * np.arctan(
                        (tp[active] if hasattr(tp, "__getitem__") else tp)
                        * np.power((1.0 + sp) / (1.0 - sp), halfe)
                    )
                    - halfpi
                )
                conv = np.abs(phi_prev[active] - newphi) < 1.0e-10
                pv = phi_prev.copy()
                pv[active] = newphi
                phi_prev = pv
                idx = np.flatnonzero(active)
                out_phi[idx[conv]] = newphi[conv]
                active[idx[conv]] = False
            phi = out_phi
            if mode == "S_POLE":
                phi = -phi
            lam = np.where((x == 0.0) & (y == 0.0), 0.0, np.arctan2(x, y))
            return lam, phi

    else:
        sinph0 = math.sin(phi0) if mode == "OBLIQ" else 0.0
        cosph0 = math.cos(phi0) if mode == "OBLIQ" else 0.0
        if mode in ("OBLIQ", "EQUIT"):
            akm1 = 2.0 * k0
        else:
            akm1 = (
                math.cos(phits) / math.tan(FORTPI - 0.5 * phits)
                if abs(phits - HALFPI) >= EPS10
                else 2.0 * k0
            )

        def fwd(lam, phi):
            sinphi = np.sin(phi)
            cosphi = np.cos(phi)
            coslam = np.cos(lam)
            sinlam = np.sin(lam)
            if mode in ("EQUIT", "OBLIQ"):
                if mode == "EQUIT":
                    yden = 1.0 + cosphi * coslam
                else:
                    yden = 1.0 + sinph0 * sinphi + cosph0 * cosphi * coslam
                bad = yden <= EPS10
                A = akm1 / np.where(bad, np.nan, yden)
                x = A * cosphi * sinlam
                y = A * (sinphi if mode == "EQUIT" else cosph0 * sinphi - sinph0 * cosphi * coslam)
            else:
                if mode == "N_POLE":
                    coslam = -coslam
                    phi = -phi
                bad = np.abs(phi - HALFPI) < 1.0e-8
                yv = akm1 * np.tan(FORTPI + 0.5 * phi)
                x = sinlam * yv
                y = yv * coslam
                x = np.where(bad, np.nan, x)
                y = np.where(bad, np.nan, y)
            return x, y

        def inv(x, y):
            rh = np.hypot(x, y)
            c = 2.0 * np.arctan(rh / akm1)
            sinc = np.sin(c)
            cosc = np.cos(c)
            lam = np.zeros_like(np.asarray(x, dtype=np.float64))
            if mode == "EQUIT":
                phi = np.where(np.abs(rh) <= EPS10, 0.0, np.arcsin(np.clip(y * sinc / np.where(rh == 0, 1, rh), -1, 1)))
                lam = np.where((cosc != 0.0) | (x != 0.0), np.arctan2(x * sinc, cosc * rh), lam)
            elif mode == "OBLIQ":
                phi = np.where(
                    np.abs(rh) <= EPS10,
                    phi0,
                    np.arcsin(np.clip(cosc * sinph0 + y * sinc * cosph0 / np.where(rh == 0, 1, rh), -1, 1)),
                )
                cden = cosc - sinph0 * np.sin(phi)
                lam = np.where((cden != 0.0) | (x != 0.0), np.arctan2(x * sinc * cosph0, cden * rh), lam)
            else:
                yy = -y if mode == "N_POLE" else y
                phi = np.where(np.abs(rh) <= EPS10, phi0, np.arcsin(np.clip(-cosc if mode == "S_POLE" else cosc, -1, 1)))
                lam = np.where((x == 0.0) & (yy == 0.0), 0.0, np.arctan2(x, yy))
            return lam, phi

    return CompiledProj("ups" if ups else "stere", fwd, inv, **fr)


def setup_ups(crs) -> CompiledProj:
    return setup_stere(crs, ups=True)


# --------------------------------------------------------------------- eqc
def setup_eqc(crs) -> CompiledProj:
    fr = _frame(crs)
    phits = m.dms_param(crs.params["lat_ts"]) if "lat_ts" in crs.params else 0.0
    rc = math.cos(phits)
    if rc <= 0.0:
        raise ValueError("eqc: |lat_ts| >= 90")
    phi0 = fr["phi0"]

    def fwd(lam, phi):
        return rc * lam, np.asarray(phi, dtype=np.float64) - phi0

    def inv(x, y):
        return x / rc, np.asarray(y, dtype=np.float64) + phi0

    return CompiledProj("eqc", fwd, inv, **fr)


# --------------------------------------------------------------------- cea
def setup_cea(crs) -> CompiledProj:
    fr = _frame(crs)
    es, e = crs.es, crs.e
    one_es = crs.one_es
    phits = m.dms_param(crs.params["lat_ts"]) if "lat_ts" in crs.params else 0.0
    k0 = math.cos(phits)
    if es:
        st = math.sin(phits)
        k0 /= math.sqrt(1.0 - es * st * st)
        apa = _authset(es)
        qp = float(m.qsfn(1.0, e, one_es))

        def fwd(lam, phi):
            return k0 * lam, 0.5 * m.qsfn(np.sin(phi), e, one_es) / k0

        def inv(x, y):
            return x / k0, _authlat(np.arcsin(np.clip(2.0 * y * k0 / qp, -1, 1)), apa)

    else:

        def fwd(lam, phi):
            return k0 * lam, np.sin(phi) / k0

        def inv(x, y):
            return x / k0, np.arcsin(np.clip(y * k0, -1, 1))

    fr["k0"] = crs.k0
    return CompiledProj("cea", fwd, inv, **fr)


def _authset(es: float):
    # src/pj_auth.c pj_authset
    P00 = 0.33333333333333333333  # 1/3
    P01 = 0.17222222222222222222  # 31/180
    P02 = 0.10257936507936507937  # 517/5040
    P10 = 0.06388888888888888888  # 23/360
    P11 = 0.06640211640211640212  # 251/3780
    P20 = 0.01677689594356261023  # 761/45360
    t = es * es
    apa0 = es * P00 + t * P01 + t * es * P02
    apa1 = t * P10 + t * es * P11
    apa2 = t * es * P20
    return (apa0, apa1, apa2)


def _authlat(beta, apa):
    t = beta + beta
    return beta + apa[0] * np.sin(t) + apa[1] * np.sin(t + t) + apa[2] * np.sin(t + t + t)


# -------------------------------------------------------------------- laea
def setup_laea(crs) -> CompiledProj:  # noqa: C901
    """Lambert azimuthal equal-area (PJ_laea.c)."""
    fr = _frame(crs)
    es, e = crs.es, crs.e
    one_es = crs.one_es
    phi0 = fr["phi0"]
    t = abs(phi0)
    if abs(t - HALFPI) < EPS10:
        mode = "S_POLE" if phi0 < 0.0 else "N_POLE"
    else:
        mode = "OBLIQ" if t > EPS10 else "EQUIT"

    if es:
        qp = float(m.qsfn(1.0, e, one_es))
        apa = _authset(es)
        rq = math.sqrt(0.5 * qp)
        sinb1 = cosb1 = dd = xmf = ymf = 0.0
        if mode in ("OBLIQ", "EQUIT"):
            sinb1 = float(m.qsfn(math.sin(phi0), e, one_es)) / qp
            cosb1 = math.sqrt(1.0 - sinb1 * sinb1)
            if mode == "OBLIQ":
                dd = math.cos(phi0) / (
                    math.sqrt(1.0 - es * math.sin(phi0) ** 2) * rq * cosb1
                )
            else:
                dd = 1.0 / rq
            xmf = rq * dd
            ymf = rq / dd

        def fwd(lam, phi):
            coslam = np.cos(lam)
            sinlam = np.sin(lam)
            sinphi = np.sin(phi)
            q = m.qsfn(sinphi, e, one_es)
            if mode in ("OBLIQ", "EQUIT"):
                sinb = q / qp
                cosb = np.sqrt(np.maximum(1.0 - sinb * sinb, 0.0))
                if mode == "OBLIQ":
                    b = 1.0 + sinb1 * sinb + cosb1 * cosb * coslam
                else:
                    b = 1.0 + cosb * coslam
                bad = np.abs(b) < EPS10
                b = np.sqrt(2.0 / np.where(bad, np.nan, b))
                if mode == "OBLIQ":
                    y = ymf * b * (cosb1 * sinb - sinb1 * cosb * coslam)
                else:
                    y = b * sinb * ymf
                x = xmf * b * cosb * sinlam
            else:
                if mode == "N_POLE":
                    b = HALFPI + np.asarray(phi, dtype=np.float64)
                    q = qp - q
                else:
                    b = np.asarray(phi, dtype=np.float64) - HALFPI
                    q = qp + q
                bad = np.abs(b) < EPS10
                pos = q >= 0.0
                broot = np.sqrt(np.where(pos, q, 0.0))
                x = np.where(pos, broot * sinlam, 0.0)
                y = np.where(pos, coslam * (broot if mode == "S_POLE" else -broot), 0.0)
                x = np.where(bad, np.nan, x)
                y = np.where(bad, np.nan, y)
            return x, y

        def inv(x, y):
            if mode in ("OBLIQ", "EQUIT"):
                xs = x / dd
                ys = y * dd
                rho = np.hypot(xs, ys)
                small = rho < EPS10
                sCe = 2.0 * np.arcsin(np.clip(0.5 * rho / rq, -1, 1))
                cCe = np.cos(sCe)
                sCe = np.sin(sCe)
                xs = xs * sCe
                rho_s = np.where(rho == 0, 1.0, rho)
                if mode == "OBLIQ":
                    ab = cCe * sinb1 + ys * sCe * cosb1 / rho_s
                    ys = rho * cosb1 * cCe - ys * sinb1 * sCe
                else:
                    ab = ys * sCe / rho_s
                    ys = rho * cCe
                lam = np.where(small, 0.0, np.arctan2(xs, ys))
                phi = np.where(small, phi0, _authlat(np.arcsin(np.clip(ab, -1, 1)), apa))
            else:
                q = x * x + y * y
                small = q == 0.0
                ab = 1.0 - q / qp
                if mode == "S_POLE":
                    ab = -ab
                lam = np.where(small, 0.0, np.arctan2(x, -y if mode == "N_POLE" else y))
                phi = np.where(small, phi0, _authlat(np.arcsin(np.clip(ab, -1, 1)), apa))
            return lam, phi

    else:
        sinph0 = math.sin(phi0)
        cosph0 = math.cos(phi0)

        def fwd(lam, phi):
            sinphi = np.sin(phi)
            cosphi = np.cos(phi)
            coslam = np.cos(lam)
            if mode in ("EQUIT", "OBLIQ"):
                if mode == "EQUIT":
                    b = 1.0 + cosphi * coslam
                else:
                    b = 1.0 + sinph0 * sinphi + cosph0 * cosphi * coslam
                bad = b <= EPS10
                b = np.sqrt(2.0 / np.where(bad, np.nan, b))
                x = b * cosphi * np.sin(lam)
                y = b * (sinphi if mode == "EQUIT" else cosph0 * sinphi - sinph0 * cosphi * coslam)
            else:
                if mode == "N_POLE":
                    coslam = -coslam
                bad = np.abs(np.asarray(phi, dtype=np.float64) + phi0) < EPS10
                yv = FORTPI - np.asarray(phi, dtype=np.float64) * 0.5
                yv = 2.0 * (np.cos(yv) if mode == "S_POLE" else np.sin(yv))
                x = np.where(bad, np.nan, yv * np.sin(lam))
                y = np.where(bad, np.nan, yv * coslam)
            return x, y

        def inv(x, y):
            rh = np.hypot(x, y)
            half = rh * 0.5
            bad = half > 1.0
            sinz2 = 2.0 * np.arcsin(np.clip(half, -1, 1))
            sinz = np.sin(sinz2)
            cosz = np.cos(sinz2)
            rh_s = np.where(rh == 0, 1.0, rh)
            if mode == "EQUIT":
                phi = np.where(np.abs(rh) <= EPS10, 0.0, np.arcsin(np.clip(y * sinz / rh_s, -1, 1)))
                xx = x * sinz
                yy = cosz * rh
            elif mode == "OBLIQ":
                phi = np.where(
                    np.abs(rh) <= EPS10,
                    phi0,
                    np.arcsin(np.clip(cosz * sinph0 + y * sinz * cosph0 / rh_s, -1, 1)),
                )
                xx = x * sinz * cosph0
                yy = (cosz - np.sin(phi) * sinph0) * rh
            elif mode == "N_POLE":
                phi = np.arcsin(np.clip(1.0 - 0.5 * rh * rh, -1, 1))
                xx = x
                yy = -y
            else:
                phi = -np.arcsin(np.clip(1.0 - 0.5 * rh * rh, -1, 1))
                xx = x
                yy = y
            lam = np.where((yy == 0.0) & (xx == 0.0), 0.0, np.arctan2(xx, yy))
            return lam, np.where(bad, np.nan, phi)

    return CompiledProj("laea", fwd, inv, **fr)


# ------------------------------------------------------------------- sinu
def setup_sinu(crs) -> CompiledProj:
    """Sinusoidal (sphere + ellipsoid via mlfn), PJ_gn_sinu.c sinu."""
    fr = _frame(crs)
    es = crs.es
    if es:
        en = m.enfn(es)

        def fwd(lam, phi):
            s = np.sin(phi)
            c = np.cos(phi)
            return lam * c / np.sqrt(1.0 - es * s * s), m.mlfn(phi, s, c, en)

        def inv(x, y):
            phi = m.inv_mlfn(y, es, en)
            s = np.abs(phi)
            atpole = np.abs(s - HALFPI) < 1e-10
            inr = s < HALFPI
            s2 = np.sin(phi)
            lam = np.where(
                inr, x * np.sqrt(1.0 - es * s2 * s2) / np.cos(phi), np.where(atpole, 0.0, np.nan)
            )
            return lam, phi

    else:

        def fwd(lam, phi):
            return lam * np.cos(phi), np.asarray(phi, dtype=np.float64)

        def inv(x, y):
            return x / np.cos(y), np.asarray(y, dtype=np.float64)

    return CompiledProj("sinu", fwd, inv, **fr)


# -------------------------------------------------------------------- moll
def setup_moll(crs) -> CompiledProj:
    """Mollweide (PJ_moll.c, p=HALFPI specialization), spherical."""
    fr = _frame(crs)
    p = HALFPI
    sp = math.sin(p)
    p2 = p + p
    r = math.sqrt(PI * 2.0 * sp / (p2 + math.sin(p2)))
    cx = 2.0 * r / PI
    cy = r / sp
    cp = p2 + math.sin(p2)
    MAX_ITER = 10
    LOOP_TOL = 1e-7

    def fwd(lam, phi):
        k = cp * np.sin(phi)
        theta = np.asarray(phi, dtype=np.float64).copy()
        active = np.ones(theta.shape, dtype=bool)
        for _ in range(MAX_ITER):
            if not np.any(active):
                break
            th = theta[active]
            V = (th + np.sin(th) - k[active]) / (1.0 + np.cos(th))
            th = th - V
            theta[active] = th
            idx = np.flatnonzero(active)
            active[idx[np.abs(V) < LOOP_TOL]] = False
        theta = theta * 0.5
        x = cx * lam * np.cos(theta)
        y = cy * np.sin(theta)
        return x, y

    def inv(x, y):
        # aasin (not clip): points off the projection disc must error out
        # as NaN like the reference I_ERROR path (testvarious #225)
        theta = m.aasin(y / cy)
        lam = x / (cx * np.cos(theta))
        theta = theta + theta
        phi = m.aasin((theta + np.sin(theta)) / cp)
        return lam, phi

    return CompiledProj("moll", fwd, inv, **fr)


# ---------------------------------------------------------------- registry
REGISTRY: dict[str, Callable] = {
    "latlong": setup_latlong,
    "longlat": setup_latlong,
    "latlon": setup_latlong,
    "lonlat": setup_latlong,
    "geocent": setup_geocent,
    "merc": setup_merc,
    "tmerc": setup_tmerc,
    "utm": setup_utm,
    "lcc": setup_lcc,
    "stere": setup_stere,
    "ups": setup_ups,
    "eqc": setup_eqc,
    "cea": setup_cea,
    "laea": setup_laea,
    "sinu": setup_sinu,
    "moll": setup_moll,
}


def compile_proj(crs) -> CompiledProj:
    setup = REGISTRY.get(crs.proj)
    if setup is None:
        raise NotImplementedError(f"projection kernel {crs.proj!r} not implemented")
    return setup(crs)


# ----------------------------------------------------------------- healpix
def healpix_sphere_fwd(lam, phi):
    """Spherical HEALPix forward map (ref src/PJ_healpix.c:214-236,
    ``healpix_sphere``): equal-area H=4,K=3 hybrid — cylindrical
    equal-area in the equatorial belt (|sin phi| <= 2/3), interrupted
    Collignon in the polar caps.  Used by the equal-area cell index."""
    lam = np.asarray(lam, np.float64)
    phi = np.asarray(phi, np.float64)
    phi0 = np.arcsin(2.0 / 3.0)
    eq = np.abs(phi) <= phi0
    x_eq = lam
    y_eq = 3.0 * PI / 8.0 * np.sin(phi)
    sigma = np.sqrt(3.0 * (1.0 - np.abs(np.sin(phi))))
    cn = np.floor(2.0 * lam / PI + 2.0)
    # reference clamps only the TOP (cn >= 4 -> 3); lam one ulp beyond
    # -pi legitimately yields cn = -1 (golden tv_out.dist:104-105)
    cn = np.minimum(cn, 3.0)
    lamc = -3.0 * PI / 4.0 + (PI / 2.0) * cn
    x_po = lamc + (lam - lamc) * sigma
    y_po = np.sign(phi) * PI / 4.0 * (2.0 - sigma)
    return np.where(eq, x_eq, x_po), np.where(eq, y_eq, y_po)


def healpix_sphere_inv(x, y):
    """Inverse of :func:`healpix_sphere_fwd` (ref PJ_healpix.c:239-263):
    equatorial belt, polar facets, and the |y| >= pi/2 pole branch
    (lam pinned to -pi exactly, like the reference)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    # equatorial belt boundary in projected space: y = 3pi/8 * (2/3) = pi/4
    eq = np.abs(y) <= PI / 4.0
    pole = np.abs(y) >= PI / 2.0
    lam_eq = x
    phi_eq = np.arcsin(np.clip(8.0 * y / (3.0 * PI), -1.0, 1.0))
    cn = np.floor(2.0 * x / PI + 2.0)
    cn = np.minimum(cn, 3.0)
    xc = -3.0 * PI / 4.0 + (PI / 2.0) * cn
    tau = 2.0 - 4.0 * np.abs(y) / PI
    with np.errstate(divide="ignore", invalid="ignore"):
        lam_po = np.where(tau != 0.0, xc + (x - xc) / np.where(tau == 0.0, 1.0, tau), xc)
    phi_po = np.sign(y) * np.arcsin(np.clip(1.0 - tau * tau / 3.0, -1.0, 1.0))
    lam = np.where(eq, lam_eq, np.where(pole, -PI, lam_po))
    phi = np.where(eq, phi_eq, np.where(pole, np.sign(y) * PI / 2.0, phi_po))
    return lam, phi


_HEALPIX_EPS = 1e-15  # PJ_healpix.c:54


def healpix_in_image(x, y):
    """Vectorized pnpoly over the jittered HEALPix image polygon
    (PJ_healpix.c:103-168): True where (x, y) is inside (or exactly on
    a vertex).  Mirrors the reference's quirks exactly — the unclosed
    vertex walk and the <=-style crossing test."""
    E = _HEALPIX_EPS
    verts = [
        (-PI - E, PI / 4.0),
        (-3.0 * PI / 4.0, PI / 2.0 + E),
        (-PI / 2.0, PI / 4.0 + E),
        (-PI / 4.0, PI / 2.0 + E),
        (0.0, PI / 4.0 + E),
        (PI / 4.0, PI / 2.0 + E),
        (PI / 2.0, PI / 4.0 + E),
        (3.0 * PI / 4.0, PI / 2.0 + E),
        (PI + E, PI / 4.0),
        (PI + E, -PI / 4.0),
        (3.0 * PI / 4.0, -PI / 2.0 - E),
        (PI / 2.0, -PI / 4.0 - E),
        (PI / 4.0, -PI / 2.0 - E),
        (0.0, -PI / 4.0 - E),
        (-PI / 4.0, -PI / 2.0 - E),
        (-PI / 2.0, -PI / 4.0 - E),
        (-3.0 * PI / 4.0, -PI / 2.0 - E),
        (-PI - E, -PI / 4.0),
    ]
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    on_vertex = np.zeros(x.shape, dtype=bool)
    for vx, vy in verts:
        on_vertex |= (x == vx) & (y == vy)
    counter = np.zeros(x.shape, dtype=np.int64)
    p1x, p1y = verts[0]
    for i in range(1, len(verts)):  # unclosed walk, like the reference
        p2x, p2y = verts[i]
        cond = (
            (y > min(p1y, p2y))
            & (y <= max(p1y, p2y))
            & (x <= max(p1x, p2x))
            & (p1y != p2y)
        )
        if p1y != p2y:
            xinters = (y - p1y) * (p2x - p1x) / (p2y - p1y) + p1x
            cross = cond & ((p1x == p2x) | (x <= xinters))
            counter += cross.astype(np.int64)
        p1x, p1y = p2x, p2y
    return on_vertex | (counter % 2 == 1)
