"""Extended kernel inventory, part 7: bipolar conic (bipc) and
Chamberlin trimetric (chamb).  Transcribed from the cited reference
sources into masked numpy.
"""
from __future__ import annotations

import math

import numpy as np

from . import xmath as m
from .core import CompiledProj, REGISTRY, _frame
from .xmath import HALFPI, PI


def _register(*names):
    def deco(fn):
        for n in names:
            REGISTRY[n] = fn
        return fn

    return deco


# ------------------------------------------------------------------- bipc
@_register("bipc")
def setup_bipc(crs) -> CompiledProj:
    """Bipolar oblique conic of the western hemisphere
    (ref src/PJ_bipc.c; +ns for the unskewed variant)."""
    fr = _frame(crs)
    noskew = "ns" in crs.params
    EPS = 1e-10
    ONEEPS = 1.000000001
    NITER = 10
    lamB = -0.34894976726250681539
    n = 0.63055844881274687180
    F = 1.89724742567461030582
    Azab = 0.81650043674686363166
    Azba = 1.82261843856185925133
    T = 1.27246578267089012270
    rhoc = 1.20709121521568721927
    cAzc = 0.69691523038678375519
    sAzc = 0.71715351331143607555
    C45 = 0.70710678118654752469
    S45 = 0.70710678118654752410
    C20 = 0.93969262078590838411
    S20 = -0.34202014332566873287
    R110 = 1.91986217719376253360
    R104 = 1.81514242207410275904

    def fwd(lam, phi):
        lam = np.asarray(lam, np.float64)
        phi = np.asarray(phi, np.float64)
        cphi = np.cos(phi)
        sphi = np.sin(phi)
        sdlam = lamB - lam
        cdlam = np.cos(sdlam)
        sdlam = np.sin(sdlam)
        pole = np.abs(np.abs(phi) - HALFPI) < EPS
        with np.errstate(divide="ignore", invalid="ignore"):
            tphi = np.where(pole, np.inf, sphi / np.where(pole, 1.0, cphi))
            Az = np.where(
                pole,
                np.where(phi < 0.0, PI, 0.0),
                np.arctan2(sdlam, C45 * (tphi - cdlam)),
            )
        tag = Az > Azba
        # B branch (tag): Azab hemisphere
        sdlam_b = lam + R110
        cdlam_b = np.cos(sdlam_b)
        sdlam_b = np.sin(sdlam_b)
        z_b = np.clip(S20 * sphi + C20 * cphi * cdlam_b, -1.0, 1.0)
        z_b = np.arccos(z_b)
        with np.errstate(divide="ignore", invalid="ignore"):
            Az_b = np.where(
                np.isinf(tphi),
                Az,
                np.arctan2(sdlam_b, C20 * tphi - S20 * cdlam_b),
            )
        # A branch
        z_a = np.clip(S45 * (sphi + cphi * cdlam), -1.0, 1.0)
        z_a = np.arccos(z_a)

        z = np.where(tag, z_b, z_a)
        Az = np.where(tag, Az_b, Az)
        Av = np.where(tag, Azab, Azba)
        y0 = np.where(tag, rhoc, -rhoc)

        t = np.power(np.tan(0.5 * z), n)
        r = F * t
        al = 0.5 * (R104 - z)
        bad = al < 0.0
        al = np.arccos(np.clip((t + np.power(np.maximum(al, 0.0), n)) / T, -1.0, 1.0))
        tAz = n * (Av - Az)
        adj = np.abs(tAz) < al
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where(adj, r / np.cos(al + np.where(tag, tAz, -tAz)), r)
        x = r * np.sin(tAz)
        y = y0 + np.where(tag, -r, r) * np.cos(tAz)
        if noskew:
            xt = x
            x = -x * cAzc - y * sAzc
            y = -y * cAzc + xt * sAzc
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y)

    def inv(x, y):
        x = np.asarray(x, np.float64).copy()
        y = np.asarray(y, np.float64).copy()
        if noskew:
            t = x.copy()
            x = -x * cAzc + y * sAzc
            y = -y * cAzc - t * sAzc
        neg = x < 0.0
        y = np.where(neg, rhoc - y, y + rhoc)
        s = np.where(neg, S20, S45)
        c = np.where(neg, C20, C45)
        Av = np.where(neg, Azab, Azba)
        r = np.hypot(x, y)
        rp = r.copy()
        rl = r.copy()
        Az = np.arctan2(x, y)
        fAz = np.abs(Az)
        z = np.zeros_like(r)
        for _ in range(NITER):
            z = 2.0 * np.arctan(np.power(r / F, 1.0 / n))
            with np.errstate(invalid="ignore"):
                # tan((R104-z)/2) < 0 beyond the cone: NaN al, like the
                # C pow(); the fAz < NaN comparison is then False
                al = np.arccos(
                    np.clip(
                        (np.power(np.tan(0.5 * z), n) + np.power(np.tan(0.5 * (R104 - z)), n)) / T,
                        -1.0,
                        1.0,
                    )
                )
            r = np.where(fAz < al, rp * np.cos(al + np.where(neg, Az, -Az)), r)
            if np.all(np.abs(rl - r) < EPS):
                break
            rl = r.copy()
        Az2 = Av - Az / n
        phi = np.arcsin(np.clip(s * np.cos(z) + c * np.sin(z) * np.cos(Az2), -1.0, 1.0))
        lam = np.arctan2(np.sin(Az2), c / np.tan(z) - s * np.cos(Az2))
        lam = np.where(neg, lam - R110, lamB - lam)
        return lam, phi

    return CompiledProj("bipc", fwd, inv, **fr)


# ------------------------------------------------------------------ chamb
@_register("chamb")
def setup_chamb(crs) -> CompiledProj:
    """Chamberlin trimetric (ref src/PJ_chamb.c), forward only; three
    control points +lat_1/+lon_1 .. +lat_3/+lon_3."""
    fr = _frame(crs)
    p = crs.params
    THIRD = 1.0 / 3.0
    TOL = 1e-9
    lam0 = fr["lam0"]

    def _vect_scalar(dphi, c1, s1, c2, s2, dlam):
        cdl = math.cos(dlam)
        if abs(dphi) > 1.0 or abs(dlam) > 1.0:
            r = math.acos(max(-1.0, min(1.0, s1 * s2 + c1 * c2 * cdl)))
        else:
            dp = math.sin(0.5 * dphi)
            dl = math.sin(0.5 * dlam)
            r = 2.0 * math.asin(max(-1.0, min(1.0, math.sqrt(dp * dp + c1 * c2 * dl * dl))))
        if abs(r) > TOL:
            az = math.atan2(c2 * math.sin(dlam), c1 * s2 - s1 * c2 * cdl)
        else:
            r = az = 0.0
        return r, az

    def _lc(b, c, a):
        return math.acos(max(-1.0, min(1.0, 0.5 * (b * b + c * c - a * a) / (b * c))))

    ctrl = []
    for i in range(1, 4):
        cphi = m.dms_param(p[f"lat_{i}"])
        clam = float(m.adjlon(np.array([m.dms_param(p[f"lon_{i}"]) - lam0]))[0])
        ctrl.append(
            {
                "phi": cphi,
                "lam": clam,
                "cosphi": math.cos(cphi),
                "sinphi": math.sin(cphi),
            }
        )
    for i in range(3):
        j = 0 if i == 2 else i + 1
        r, az = _vect_scalar(
            ctrl[j]["phi"] - ctrl[i]["phi"],
            ctrl[i]["cosphi"],
            ctrl[i]["sinphi"],
            ctrl[j]["cosphi"],
            ctrl[j]["sinphi"],
            ctrl[j]["lam"] - ctrl[i]["lam"],
        )
        if r == 0.0:
            raise ValueError("chamb: control points coincide")
        ctrl[i]["vr"] = r
        ctrl[i]["vAz"] = az
    beta_0 = _lc(ctrl[0]["vr"], ctrl[2]["vr"], ctrl[1]["vr"])
    beta_1 = _lc(ctrl[0]["vr"], ctrl[1]["vr"], ctrl[2]["vr"])
    beta_2 = PI - beta_0
    py_c01 = ctrl[2]["vr"] * math.sin(beta_0)
    p_y = 2.0 * py_c01
    c0_px = -0.5 * ctrl[0]["vr"]
    c1_px = 0.5 * ctrl[0]["vr"]
    p_x = c2_px = c0_px + ctrl[2]["vr"] * math.cos(beta_0)
    ctrl[0]["px"], ctrl[0]["py"] = c0_px, py_c01
    ctrl[1]["px"], ctrl[1]["py"] = c1_px, py_c01
    ctrl[2]["px"], ctrl[2]["py"] = c2_px, 0.0

    def _vect_vec(dphi, c1, s1, c2, s2, dlam):
        cdl = np.cos(dlam)
        big = (np.abs(dphi) > 1.0) | (np.abs(dlam) > 1.0)
        r_big = np.arccos(np.clip(s1 * s2 + c1 * c2 * cdl, -1.0, 1.0))
        dp = np.sin(0.5 * dphi)
        dl = np.sin(0.5 * dlam)
        r_small = 2.0 * np.arcsin(np.clip(np.sqrt(dp * dp + c1 * c2 * dl * dl), -1.0, 1.0))
        r = np.where(big, r_big, r_small)
        az = np.where(
            np.abs(r) > TOL, np.arctan2(c2 * np.sin(dlam), c1 * s2 - s1 * c2 * cdl), 0.0
        )
        r = np.where(np.abs(r) > TOL, r, 0.0)
        return r, az

    def fwd(lam, phi):
        lam = np.asarray(lam, np.float64)
        phi = np.asarray(phi, np.float64)
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        vr = []
        vaz = []
        at_ctrl = np.full(lam.shape, -1, dtype=np.int64)
        for i, cc in enumerate(ctrl):
            r, az = _vect_vec(
                phi - cc["phi"], cc["cosphi"], cc["sinphi"], cosphi, sinphi, lam - cc["lam"]
            )
            at_ctrl = np.where((r == 0.0) & (at_ctrl < 0), i, at_ctrl)
            vr.append(r)
            vaz.append(m.adjlon(az - cc["vAz"]))
        x = np.full_like(lam, p_x)
        y = np.full_like(phi, p_y)
        for i in range(3):
            j = 0 if i == 2 else i + 1
            with np.errstate(divide="ignore", invalid="ignore"):
                a = np.arccos(
                    np.clip(
                        0.5
                        * (ctrl[i]["vr"] ** 2 + vr[i] ** 2 - vr[j] ** 2)
                        / (ctrl[i]["vr"] * np.where(vr[i] == 0.0, 1.0, vr[i])),
                        -1.0,
                        1.0,
                    )
                )
            a = np.where(vaz[i] < 0.0, -a, a)
            if i == 0:
                x = x + vr[i] * np.cos(a)
                y = y - vr[i] * np.sin(a)
            elif i == 1:
                a = beta_1 - a
                x = x - vr[i] * np.cos(a)
                y = y - vr[i] * np.sin(a)
            else:
                a = beta_2 - a
                x = x + vr[i] * np.cos(a)
                y = y + vr[i] * np.sin(a)
        x = x * THIRD
        y = y * THIRD
        # exact control-point hits snap to the precomputed coordinates
        for i, cc in enumerate(ctrl):
            x = np.where(at_ctrl == i, cc["px"], x)
            y = np.where(at_ctrl == i, cc["py"], y)
        return x, y

    return CompiledProj("chamb", fwd, None, **fr)


# ------------------------------------------------------------------ imw_p
@_register("imw_p")
def setup_imw_p(crs) -> CompiledProj:
    """International Map of the World Polyconic (ref src/PJ_imw_p.c):
    modified polyconic with two standard parallels, iterative
    fixed-point inverse (per-point convergence mask)."""
    fr = _frame(crs)
    es = crs.es
    p = crs.params
    TOL = 1e-10
    en = m.enfn(es)
    phi_1 = m.dms_param(p["lat_1"])
    phi_2 = m.dms_param(p["lat_2"])
    if abs(0.5 * (phi_2 - phi_1)) < 1e-10 or abs(0.5 * (phi_2 + phi_1)) < 1e-10:
        raise ValueError("imw_p: bad lat_1/lat_2")
    if phi_2 < phi_1:
        phi_1, phi_2 = phi_2, phi_1
    if "lon_1" in p:
        lam_1 = m.dms_param(p["lon_1"])
    else:
        sig = abs(0.5 * (phi_2 + phi_1) / m.DEG_TO_RAD)
        sig = 2.0 if sig <= 60 else (4.0 if sig <= 76 else 8.0)
        lam_1 = sig * m.DEG_TO_RAD

    def _xy(phi):
        sp = math.sin(phi)
        R = 1.0 / (math.tan(phi) * math.sqrt(1.0 - es * sp * sp))
        F = lam_1 * sp
        return R * math.sin(F), R * (1.0 - math.cos(F)), sp, R

    mode = 0
    if phi_1 != 0.0:
        x1, y1, sphi_1, R_1 = _xy(phi_1)
    else:
        mode = 1
        y1 = 0.0
        x1 = lam_1
        sphi_1 = R_1 = 0.0
    if phi_2 != 0.0:
        x2, T2, sphi_2, R_2 = _xy(phi_2)
    else:
        mode = -1
        T2 = 0.0
        x2 = lam_1
        sphi_2 = R_2 = 0.0
    m1 = float(m.mlfn(phi_1, math.sin(phi_1), math.cos(phi_1), en))
    m2 = float(m.mlfn(phi_2, math.sin(phi_2), math.cos(phi_2), en))
    t = m2 - m1
    s = x2 - x1
    y2 = math.sqrt(t * t - s * s) + y1
    C2 = y2 - T2
    t = 1.0 / t
    P_ = (m2 * y1 - m1 * y2) * t
    Q = (y2 - y1) * t
    Pp = (m2 * x1 - m1 * x2) * t
    Qp = (x2 - x1) * t

    def _loc_for(lam, phi):
        """loc_for (PJ_imw_p.c:29-74), vectorized; returns x, y, yc."""
        lam = np.asarray(lam, np.float64)
        phi = np.asarray(phi, np.float64)
        zero = phi == 0.0
        phi_s = np.where(zero, 0.5, phi)  # safe placeholder
        sp = np.sin(phi_s)
        ml = m.mlfn(phi_s, sp, np.cos(phi_s), en)
        xa = Pp + Qp * ml
        ya = P_ + Q * ml
        R = 1.0 / (np.tan(phi_s) * np.sqrt(1.0 - es * sp * sp))
        C = np.sqrt(np.maximum(R * R - xa * xa, 0.0))
        C = np.where(phi_s < 0.0, -C, C)
        C = C + ya - R
        if mode < 0:
            xb = lam
            yb = np.full_like(lam, C2)
        else:
            tt = lam * sphi_2
            xb = R_2 * np.sin(tt)
            yb = C2 + R_2 * (1.0 - np.cos(tt))
        if mode > 0:
            xc = lam
            yc = np.zeros_like(lam)
        else:
            tt = lam * sphi_1
            xc = R_1 * np.sin(tt)
            yc = R_1 * (1.0 - np.cos(tt))
        with np.errstate(divide="ignore", invalid="ignore"):
            D = (xb - xc) / (yb - yc)
            B = xc + D * (C + R - yc)
            x = D * np.sqrt(np.maximum(R * R * (1.0 + D * D) - B * B, 0.0))
            x = np.where(phi_s > 0.0, -x, x)
            x = (B + x) / (1.0 + D * D)
            y = np.sqrt(np.maximum(R * R - x * x, 0.0))
            y = np.where(phi_s > 0.0, -y, y)
            y = y + C + R
        x = np.where(zero, lam, x)
        y = np.where(zero, 0.0, y)
        return x, y, yc

    def fwd(lam, phi):
        x, y, _ = _loc_for(lam, phi)
        return x, y

    def inv(x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        phi = np.full_like(y, phi_2)
        lam = x / math.cos(phi_2)
        for _ in range(30):
            tx, ty, yc = _loc_for(lam, phi)
            done = (np.abs(tx - x) <= TOL) & (np.abs(ty - y) <= TOL)
            if done.all():
                break
            with np.errstate(divide="ignore", invalid="ignore"):
                phi_new = ((phi - phi_1) * (y - yc) / (ty - yc)) + phi_1
                lam_new = lam * x / np.where(tx == 0.0, 1.0, tx)
            phi = np.where(done, phi, phi_new)
            lam = np.where(done, lam, lam_new)
        return lam, phi

    return CompiledProj("imw_p", fwd, inv, **fr)
