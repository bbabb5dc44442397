"""Extended kernel inventory, part 5: simple conics family
(PJ_sconics.c: euler, murd1-3, pconic, tissot, vitk1) and the
Interrupted Goode Homolosine (PJ_igh.c, 12-zone composition).
Transcribed from the cited reference files into vectorized numpy.
"""
from __future__ import annotations

import math

import numpy as np

from . import xmath as m
from .core import CompiledProj, REGISTRY, _frame, setup_moll, setup_sinu
from .xmath import DEG_TO_RAD, HALFPI


def _register(*names):
    def deco(fn):
        for n in names:
            REGISTRY[n] = fn
        return fn

    return deco


_EPS = 1e-10


@_register("euler", "murd1", "murd2", "murd3", "pconic", "tissot", "vitk1")
def setup_sconics(crs) -> CompiledProj:
    """Simple conics family (ref src/PJ_sconics.c:55-160): all share
    x = rho sin(n lam), y = rho0 - rho cos(n lam), with per-type
    (n, rho_c, rho) rules from the two standard parallels."""
    fr = _frame(crs)
    typ = crs.proj
    p = crs.params
    if "lat_1" not in p or "lat_2" not in p:
        raise ValueError(f"{typ}: lat_1 and lat_2 required")
    p1 = m.dms_param(p["lat_1"])
    p2 = m.dms_param(p["lat_2"])
    del_ = 0.5 * (p2 - p1)
    sig = 0.5 * (p2 + p1)
    if abs(del_) < _EPS or abs(sig) < _EPS:
        raise ValueError(f"{typ}: |lat_1 +- lat_2| too small")
    phi0 = fr["phi0"]

    c1 = c2 = 0.0
    rho_c = rho_0 = 0.0
    if typ == "tissot":
        n = math.sin(sig)
        cs = math.cos(del_)
        rho_c = n / cs + cs / n
        rho_0 = math.sqrt((rho_c - 2.0 * math.sin(phi0)) / n)
    elif typ == "murd1":
        rho_c = math.sin(del_) / (del_ * math.tan(sig)) + sig
        rho_0 = rho_c - phi0
        n = math.sin(sig)
    elif typ == "murd2":
        cs = math.sqrt(math.cos(del_))
        rho_c = cs / math.tan(sig)
        rho_0 = rho_c + math.tan(sig - phi0)
        n = math.sin(sig) * cs
    elif typ == "murd3":
        rho_c = del_ / (math.tan(sig) * math.tan(del_)) + sig
        rho_0 = rho_c - phi0
        n = math.sin(sig) * math.sin(del_) * math.tan(del_) / (del_ * del_)
    elif typ == "euler":
        n = math.sin(sig) * math.sin(del_) / del_
        hd = 0.5 * del_
        rho_c = hd / (math.tan(hd) * math.tan(sig)) + sig
        rho_0 = rho_c - phi0
    elif typ == "pconic":
        n = math.sin(sig)
        c2 = math.cos(del_)
        c1 = 1.0 / math.tan(sig)
        if abs(phi0 - sig) - _EPS >= HALFPI:
            raise ValueError("pconic: |lat_0 - sig| >= 90")
        rho_0 = c2 * (c1 - math.tan(phi0 - sig))
    else:  # vitk1
        cs = math.tan(del_)
        n = cs * math.sin(sig) / del_
        rho_c = del_ / (cs * math.tan(sig)) + sig
        rho_0 = rho_c - phi0

    def fwd(lam, phi):
        if typ == "murd2":
            rho = rho_c + np.tan(sig - phi)
        elif typ == "pconic":
            rho = c2 * (c1 - np.tan(phi - sig))
        else:
            rho = rho_c - phi
        lamn = lam * n
        return rho * np.sin(lamn), rho_0 - rho * np.cos(lamn)

    def inv(x, y):
        x = np.asarray(x, np.float64)
        yy = rho_0 - np.asarray(y, np.float64)
        rho = np.hypot(x, yy)
        if n < 0.0:
            rho = -rho
            x = -x
            yy = -yy
        lam = np.arctan2(x, yy) / n
        if typ == "pconic":
            phi = np.arctan(c1 - rho / c2) + sig
        elif typ == "murd2":
            phi = sig - np.arctan(rho - rho_c)
        else:
            phi = rho_c - rho
        return lam, phi

    return CompiledProj(typ, fwd, inv, **fr)


# -------------------------------------------------------------------- igh
@_register("igh")
def setup_igh(crs) -> CompiledProj:
    """Interrupted Goode Homolosine (ref src/PJ_igh.c): 12 zones —
    Mollweide lobes poleward of 40d44'11.8", sinusoidal lobes toward
    the equator — stitched with per-zone lam0/x0/y0 and validity
    masks on the inverse (out-of-lobe points -> NaN, the HUGE_VAL
    analog)."""
    fr = _frame(crs)
    d4044118 = (40 + 44 / 60.0 + 11.8 / 3600.0) * DEG_TO_RAD
    d = {k: k * DEG_TO_RAD for k in (10, 20, 30, 40, 50, 60, 80, 90, 100, 140, 160, 180)}
    sinu = setup_sinu(crs)
    moll = setup_moll(crs)

    # zone table (PJ_igh.c ENTRY): (kernel, x0, y0 sign placeholder, lam0)
    # dy0: align moll and sinu at the fringe latitude
    xy1 = moll.fwd(np.array([0.0]), np.array([d4044118]))
    xy3 = sinu.fwd(np.array([0.0]), np.array([d4044118]))
    dy0 = float(xy3[1][0] - xy1[1][0])

    ZONES = {
        1: (moll, -d[100], dy0, -d[100]),
        2: (moll, d[30], dy0, d[30]),
        3: (sinu, -d[100], 0.0, -d[100]),
        4: (sinu, d[30], 0.0, d[30]),
        5: (sinu, -d[160], 0.0, -d[160]),
        6: (sinu, -d[60], 0.0, -d[60]),
        7: (sinu, d[20], 0.0, d[20]),
        8: (sinu, d[140], 0.0, d[140]),
        9: (moll, -d[160], -dy0, -d[160]),
        10: (moll, -d[60], -dy0, -d[60]),
        11: (moll, d[20], -dy0, d[20]),
        12: (moll, d[140], -dy0, d[140]),
    }
    EPSLN = 1e-10

    def _zone_fwd(lam, phi):
        z = np.where(
            phi >= d4044118,
            np.where(lam <= -d[40], 1, 2),
            np.where(
                phi >= 0,
                np.where(lam <= -d[40], 3, 4),
                np.where(
                    phi >= -d4044118,
                    np.where(lam <= -d[100], 5, np.where(lam <= -d[20], 6, np.where(lam <= d[80], 7, 8))),
                    np.where(lam <= -d[100], 9, np.where(lam <= -d[20], 10, np.where(lam <= d[80], 11, 12))),
                ),
            ),
        )
        return z

    def fwd(lam, phi):
        lam = np.asarray(lam, np.float64)
        phi = np.asarray(phi, np.float64)
        z = _zone_fwd(lam, phi)
        x = np.full_like(lam, np.nan)
        y = np.full_like(phi, np.nan)
        for zi, (kern, x0, y0, lam0) in ZONES.items():
            msk = z == zi
            if not msk.any():
                continue
            xs, ys = kern.fwd(lam[msk] - lam0, phi[msk])
            x[msk] = xs + x0
            y[msk] = ys + y0
        return x, y

    def inv(x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        y90 = dy0 + math.sqrt(2.0)
        z = np.where(
            (y > y90 + EPSLN) | (y < -y90 + EPSLN),
            0,
            np.where(
                y >= d4044118,
                np.where(x <= -d[40], 1, 2),
                np.where(
                    y >= 0,
                    np.where(x <= -d[40], 3, 4),
                    np.where(
                        y >= -d4044118,
                        np.where(x <= -d[100], 5, np.where(x <= -d[20], 6, np.where(x <= d[80], 7, 8))),
                        np.where(x <= -d[100], 9, np.where(x <= -d[20], 10, np.where(x <= d[80], 11, 12))),
                    ),
                ),
            ),
        )
        lam = np.full_like(x, np.nan)
        phi = np.full_like(y, np.nan)
        for zi, (kern, x0, y0, lam0) in ZONES.items():
            msk = z == zi
            if not msk.any():
                continue
            ls, ps = kern.inv(x[msk] - x0, y[msk] - y0)
            ls = ls + lam0
            # validity masks (PJ_igh.c s_inverse switch)
            if zi == 1:
                ok = ((ls >= -d[180] - EPSLN) & (ls <= -d[40] + EPSLN)) | (
                    (ls >= -d[40] - EPSLN) & (ls <= -d[10] + EPSLN)
                    & (ps >= d[60] - EPSLN) & (ps <= d[90] + EPSLN)
                )
            elif zi == 2:
                ok = (
                    ((ls >= -d[40] - EPSLN) & (ls <= d[180] + EPSLN))
                    | ((ls >= -d[180] - EPSLN) & (ls <= -d[160] + EPSLN)
                       & (ps >= d[50] - EPSLN) & (ps <= d[90] + EPSLN))
                    | ((ls >= -d[50] - EPSLN) & (ls <= -d[40] + EPSLN)
                       & (ps >= d[60] - EPSLN) & (ps <= d[90] + EPSLN))
                )
            elif zi in (3, 5, 9):
                lo = -d[180] if zi == 3 else -d[180]
                hi = -d[40] if zi == 3 else -d[100]
                ok = (ls >= lo - EPSLN) & (ls <= hi + EPSLN)
            elif zi == 4:
                ok = (ls >= -d[40] - EPSLN) & (ls <= d[180] + EPSLN)
            elif zi in (6, 10):
                ok = (ls >= -d[100] - EPSLN) & (ls <= -d[20] + EPSLN)
            elif zi in (7, 11):
                ok = (ls >= -d[20] - EPSLN) & (ls <= d[80] + EPSLN)
            else:  # 8, 12
                ok = (ls >= d[80] - EPSLN) & (ls <= d[180] + EPSLN)
            ls = np.where(ok, ls, np.nan)
            ps = np.where(ok, ps, np.nan)
            lam[msk] = ls
            phi[msk] = ps
        return lam, phi

    return CompiledProj("igh", fwd, inv, **fr)
