"""Extended kernel inventory, part 6: Winkel I/II, McBryde-Thomas
flat-polar family, van der Grinten II-IV (faithful), oblique
stereographic alternative (sterea, via the Gauss conformal sphere),
CalCOFI line/station grid, Laborde (Madagascar), Roussilhe
stereographic (exact meridional-distance series).

Each docstring cites the reference file transcribed.
"""
from __future__ import annotations

import math

import numpy as np

from . import xmath as m
from .core import CompiledProj, REGISTRY, _frame
from .xmath import FORTPI, HALFPI, PI


def _register(*names):
    def deco(fn):
        for n in names:
            REGISTRY[n] = fn
        return fn

    return deco


# ------------------------------------------------------------------ wink1
@_register("wink1")
def setup_wink1(crs) -> CompiledProj:
    """Winkel I (ref src/PJ_wink1.c)."""
    fr = _frame(crs)
    cosphi1 = math.cos(m.dms_param(crs.params.get("lat_ts", "0")))

    def fwd(lam, phi):
        return 0.5 * lam * (cosphi1 + np.cos(phi)), np.asarray(phi, np.float64)

    def inv(x, y):
        return 2.0 * x / (cosphi1 + np.cos(y)), np.asarray(y, np.float64)

    return CompiledProj("wink1", fwd, inv, **fr)


@_register("wink2")
def setup_wink2(crs) -> CompiledProj:
    """Winkel II (ref src/PJ_wink2.c), forward only."""
    fr = _frame(crs)
    cosphi1 = math.cos(m.dms_param(crs.params.get("lat_1", "0")))
    TWO_D_PI = 0.636619772367581343
    MAX_ITER, LOOP_TOL = 10, 1e-7

    def fwd(lam, phi):
        phi = np.asarray(phi, np.float64)
        y0 = phi * TWO_D_PI
        k = PI * np.sin(phi)
        th = phi * 1.8
        for _ in range(MAX_ITER):
            V = (th + np.sin(th) - k) / (1.0 + np.cos(th))
            th = th - V
            if np.all(np.abs(V) < LOOP_TOL):
                break
        th = th * 0.5
        x = 0.5 * lam * (np.cos(th) + cosphi1)
        y = FORTPI * (np.sin(th) + y0)
        return x, y

    return CompiledProj("wink2", fwd, None, **fr)


# --------------------------------------------------------- McBryde-Thomas
@_register("mbt_fps")
def setup_mbt_fps(crs) -> CompiledProj:
    """McBryde-Thomas Flat-Pole Sine No. 2 (ref src/PJ_mbt_fps.c)."""
    fr = _frame(crs)
    C1, C2, C3 = 0.45503, 1.36509, 1.41546
    C_x, C_y = 0.22248, 1.44492
    C1_2 = 1.0 / 3.0
    MAX_ITER, LOOP_TOL = 10, 1e-7

    def fwd(lam, phi):
        phi = np.asarray(phi, np.float64).copy()
        k = C3 * np.sin(phi)
        for _ in range(MAX_ITER):
            t = phi / C2
            V = (C1 * np.sin(t) + np.sin(phi) - k) / (C1_2 * np.cos(t) + np.cos(phi))
            phi = phi - V
            if np.all(np.abs(V) < LOOP_TOL):
                break
        t = phi / C2
        x = C_x * lam * (1.0 + 3.0 * np.cos(phi) / np.cos(t))
        y = C_y * np.sin(t)
        return x, y

    def inv(x, y):
        t = m.aasin(y / C_y)
        phi = C2 * t
        lam = x / (C_x * (1.0 + 3.0 * np.cos(phi) / np.cos(t)))
        phi = m.aasin((C1 * np.sin(t) + np.sin(phi)) / C3)
        return lam, phi

    return CompiledProj("mbt_fps", fwd, inv, **fr)


@_register("mbtfpp")
def setup_mbtfpp(crs) -> CompiledProj:
    """McBryde-Thomas Flat-Polar Parabolic (ref src/PJ_mbtfpp.c)."""
    fr = _frame(crs)
    CS = 0.95257934441568037152
    FXC = 0.92582009977255146156
    FYC = 3.40168025708304504493
    C23 = 2.0 / 3.0
    C13 = 1.0 / 3.0

    def fwd(lam, phi):
        phi2 = np.arcsin(np.clip(CS * np.sin(phi), -1.0, 1.0))
        x = FXC * lam * (2.0 * np.cos(C23 * phi2) - 1.0)
        y = FYC * np.sin(C13 * phi2)
        return x, y

    def inv(x, y):
        phi = m.aasin(np.clip(y / FYC, -1.0, 1.0)) * 3.0
        lam = x / (FXC * (2.0 * np.cos(C23 * phi) - 1.0))
        phi = m.aasin(np.clip(np.sin(phi) / CS, -1.0, 1.0))
        return lam, phi

    return CompiledProj("mbtfpp", fwd, inv, **fr)


@_register("mbtfpq")
def setup_mbtfpq(crs) -> CompiledProj:
    """McBryde-Thomas Flat-Polar Quartic (ref src/PJ_mbtfpq.c)."""
    fr = _frame(crs)
    NITER, EPS = 20, 1e-7
    C = 1.70710678118654752440
    RC = 0.58578643762690495119
    FYC = 1.87475828462269495505
    RYC = 0.53340209679417701685
    FXC = 0.31245971410378249250
    RXC = 3.20041258076506210122

    def fwd(lam, phi):
        phi = np.asarray(phi, np.float64).copy()
        c = C * np.sin(phi)
        for _ in range(NITER):
            th1 = (np.sin(0.5 * phi) + np.sin(phi) - c) / (
                0.5 * np.cos(0.5 * phi) + np.cos(phi)
            )
            phi = phi - th1
            if np.all(np.abs(th1) < EPS):
                break
        x = FXC * lam * (1.0 + 2.0 * np.cos(phi) / np.cos(0.5 * phi))
        y = FYC * np.sin(0.5 * phi)
        return x, y

    def inv(x, y):
        t = np.clip(RYC * np.asarray(y, np.float64), -1.0, 1.0)
        phi = 2.0 * np.arcsin(t)
        lam = RXC * x / (1.0 + 2.0 * np.cos(phi) / np.cos(0.5 * phi))
        phi = m.aasin(np.clip(RC * (t + np.sin(phi)), -1.0, 1.0))
        return lam, phi

    return CompiledProj("mbtfpq", fwd, inv, **fr)


# --------------------------------------------------------- van der Grinten
@_register("vandg2", "vandg3")
def setup_vandg23(crs) -> CompiledProj:
    """Van der Grinten II/III (ref src/PJ_vandg2.c), forward only."""
    fr = _frame(crs)
    vdg3 = crs.proj == "vandg3"
    TOL = 1e-10
    TWORPI = 0.63661977236758134308

    def fwd(lam, phi):
        lam = np.asarray(lam, np.float64)
        phi = np.asarray(phi, np.float64)
        bt = np.abs(TWORPI * phi)
        ct = np.sqrt(np.maximum(1.0 - bt * bt, 0.0))
        lam_zero = np.abs(lam) < TOL
        with np.errstate(divide="ignore", invalid="ignore"):
            safe = np.where(lam == 0.0, 1.0, lam)
            at = 0.5 * np.abs(PI / safe - safe / PI)
            if vdg3:
                x1 = bt / (1.0 + ct)
                x = PI * (np.sqrt(np.maximum(at * at + 1.0 - x1 * x1, 0.0)) - at)
                y = PI * x1
            else:
                x1 = (ct * np.sqrt(1.0 + at * at) - at * ct * ct) / (
                    1.0 + at * at * bt * bt
                )
                x = PI * x1
                y = PI * np.sqrt(np.maximum(1.0 - x1 * (x1 + 2.0 * at) + TOL, 0.0))
            x = np.where(lam < 0.0, -x, x)
            y = np.where(phi < 0.0, -y, y)
        y_center = PI * np.where(phi < 0.0, -bt, bt) / (1.0 + ct)
        x = np.where(lam_zero, 0.0, x)
        y = np.where(lam_zero, y_center, y)
        return x, y

    return CompiledProj(crs.proj, fwd, None, **fr)


@_register("vandg4")
def setup_vandg4(crs) -> CompiledProj:
    """Van der Grinten IV (ref src/PJ_vandg4.c), forward only."""
    fr = _frame(crs)
    TOL = 1e-10
    TWORPI = 0.63661977236758134308

    def fwd(lam, phi):
        lam = np.asarray(lam, np.float64)
        phi = np.asarray(phi, np.float64)
        phi_zero = np.abs(phi) < TOL
        lam_zero = (np.abs(lam) < TOL) | (np.abs(np.abs(phi) - HALFPI) < TOL)
        with np.errstate(divide="ignore", invalid="ignore"):
            bt = np.abs(TWORPI * phi)
            bt2 = bt * bt
            ct = 0.5 * (bt * (8.0 - bt * (2.0 + bt2)) - 5.0) / (bt2 * (bt - 1.0))
            ct2 = ct * ct
            safe = np.where(lam == 0.0, 1.0, lam)
            dt = TWORPI * safe
            dt = dt + 1.0 / dt
            dt = np.sqrt(np.maximum(dt * dt - 4.0, 0.0))
            dt = np.where((np.abs(safe) - HALFPI) < 0.0, -dt, dt)
            dt2 = dt * dt
            x1 = bt + ct
            x1 = x1 * x1
            t = bt + 3.0 * ct
            ft = x1 * (bt2 + ct2 * dt2 - 1.0) + (1.0 - bt2) * (
                bt2 * (t * t + 4.0 * ct2) + ct2 * (12.0 * bt * ct + 4.0 * ct2)
            )
            x1 = (dt * (x1 + ct2 - 1.0) + 2.0 * np.sqrt(np.maximum(ft, 0.0))) / (
                4.0 * x1 + dt2
            )
            x = HALFPI * x1
            y = HALFPI * np.sqrt(np.maximum(1.0 + dt * np.abs(x1) - x1 * x1, 0.0))
            x = np.where(lam < 0.0, -x, x)
            y = np.where(phi < 0.0, -y, y)
        x = np.where(phi_zero, lam, np.where(lam_zero, 0.0, x))
        y = np.where(phi_zero, 0.0, np.where(lam_zero, phi, y))
        return x, y

    return CompiledProj("vandg4", fwd, None, **fr)


# ------------------------------------------------------------------ gauss
def gauss_ini(e: float, phi0: float):
    """Gauss conformal sphere constants (ref src/pj_gauss.c
    pj_gauss_ini): returns (C, K, ratexp, chi0, rc)."""
    es = e * e
    sphi = math.sin(phi0)
    cphi2 = math.cos(phi0) ** 2
    rc = math.sqrt(1.0 - es) / (1.0 - es * sphi * sphi)
    C = math.sqrt(1.0 + es * cphi2 * cphi2 / (1.0 - es))
    chi = math.asin(sphi / C)
    ratexp = 0.5 * C * e
    K = math.tan(0.5 * chi + FORTPI) / (
        math.tan(0.5 * phi0 + FORTPI) ** C
        * ((1.0 - e * sphi) / (1.0 + e * sphi)) ** ratexp
    )
    return C, K, ratexp, chi, rc


def gauss_fwd(lam, phi, e, C, K, ratexp):
    """Geographic -> Gauss sphere (ref pj_gauss.c pj_gauss)."""
    sp = e * np.sin(phi)
    chi = (
        2.0
        * np.arctan(
            K
            * np.power(np.tan(0.5 * phi + FORTPI), C)
            * np.power((1.0 - sp) / (1.0 + sp), ratexp)
        )
        - HALFPI
    )
    return C * lam, chi


def gauss_inv(lam_s, chi, e, C, K):
    """Gauss sphere -> geographic (ref pj_gauss.c pj_inv_gauss,
    <=20 fixed-point iterations with the reference's update rule)."""
    lam = lam_s / C
    num = np.power(np.tan(0.5 * chi + FORTPI) / K, 1.0 / C)
    phi_s = np.asarray(chi, np.float64).copy()
    phi = phi_s.copy()
    for _ in range(20):
        phi = 2.0 * np.arctan(
            num * np.power((1.0 - e * np.sin(phi_s)) / (1.0 + e * np.sin(phi_s)), -0.5 * e)
        ) - HALFPI
        if np.all(np.abs(phi - phi_s) < 1e-14):
            break
        phi_s = phi
    return lam, phi


@_register("sterea")
def setup_sterea(crs) -> CompiledProj:
    """Oblique stereographic alternative (ref src/PJ_sterea.c): double
    stereographic via the Gauss conformal sphere."""
    fr = _frame(crs)
    e = crs.e
    k0 = fr["k0"]
    phi0 = fr["phi0"]
    C, K, ratexp, chi0, rc = gauss_ini(e, phi0)
    sinc0, cosc0 = math.sin(chi0), math.cos(chi0)
    R2 = 2.0 * rc

    def fwd(lam, phi):
        lam_s, chi = gauss_fwd(lam, phi, e, C, K, ratexp)
        sinc, cosc = np.sin(chi), np.cos(chi)
        cosl = np.cos(lam_s)
        k = k0 * R2 / (1.0 + sinc0 * sinc + cosc0 * cosc * cosl)
        return k * cosc * np.sin(lam_s), k * (cosc0 * sinc - sinc0 * cosc * cosl)

    def inv(x, y):
        x = np.asarray(x, np.float64) / k0
        y = np.asarray(y, np.float64) / k0
        rho = np.hypot(x, y)
        nz = rho != 0.0
        c = 2.0 * np.arctan2(rho, R2)
        sinc, cosc = np.sin(c), np.cos(c)
        with np.errstate(divide="ignore", invalid="ignore"):
            chi = np.where(
                nz,
                np.arcsin(
                    np.clip(cosc * sinc0 + y * sinc * cosc0 / np.where(nz, rho, 1.0), -1, 1)
                ),
                chi0,
            )
            lam_s = np.where(
                nz, np.arctan2(x * sinc, rho * cosc0 * cosc - y * sinc0 * sinc), 0.0
            )
        return gauss_inv(lam_s, chi, e, C, K)

    return CompiledProj("sterea", fwd, inv, **fr)


# ---------------------------------------------------------------- calcofi
@_register("calcofi")
def setup_calcofi(crs) -> CompiledProj:
    """CalCOFI line/station grid (ref src/PJ_calcofi.c, Eber & Hewitt
    1979).  Outputs are LINE/STATION numbers, not meters: the kernel
    pre-divides by a so the generic a-scaling cancels (the reference
    mutates P->a=1 for the same effect)."""
    fr = _frame(crs)
    es, e = crs.es, crs.e
    a = crs.a
    lam0 = fr["lam0"]
    DEG_TO_LINE = 5.0
    DEG_TO_STATION = 15.0
    LINE_TO_RAD = 0.0034906585039886592
    STATION_TO_RAD = 0.0011635528346628863
    PT_O_LINE = 80.0
    PT_O_STATION = 60.0
    PT_O_LAMBDA = -2.1144663887911301
    PT_O_PHI = 0.59602993955606354
    ROT = 0.52359877559829882
    R2D = 1.0 / m.DEG_TO_RAD

    if es:

        def _merc_y(phi):
            return -np.log(m.tsfn(phi, np.sin(phi), e))

        def _inv_merc(y):
            return m.phi2(np.exp(-y), e)

    else:

        def _merc_y(phi):
            return np.log(np.tan(FORTPI + 0.5 * phi))

        def _inv_merc(y):
            return HALFPI - 2.0 * np.arctan(np.exp(-y))

    oy = float(_merc_y(np.array([PT_O_PHI]))[0])

    def fwd(lam, phi):
        lam = np.asarray(lam, np.float64) + lam0  # reference re-adds lam0
        bad = np.abs(np.abs(phi) - HALFPI) <= 1e-10
        yv = _merc_y(phi)
        l1 = (yv - oy) * math.tan(ROT)
        l2 = -lam - l1 + PT_O_LAMBDA
        ry = l2 * math.cos(ROT) * math.sin(ROT) + yv
        ry = _inv_merc(ry)
        line = PT_O_LINE - R2D * (ry - PT_O_PHI) * DEG_TO_LINE / math.cos(ROT)
        station = PT_O_STATION + R2D * (ry - phi) * DEG_TO_STATION / math.sin(ROT)
        # pre-divide by a: generic wrapper multiplies by a (ref sets P->a=1)
        return np.where(bad, np.nan, line / a), np.where(bad, np.nan, station / a)

    def inv(x, y):
        # generic wrapper pre-multiplied by ra; undo (ref divides by ra)
        line = np.asarray(x, np.float64) * a
        station = np.asarray(y, np.float64) * a
        ry = PT_O_PHI - LINE_TO_RAD * (line - PT_O_LINE) * math.cos(ROT)
        phi = ry - STATION_TO_RAD * (station - PT_O_STATION) * math.sin(ROT)
        oymctr = oy
        rymctr = _merc_y(ry)
        xymctr = _merc_y(phi)
        l1 = (xymctr - oymctr) * math.tan(ROT)
        l2 = (rymctr - xymctr) / (math.cos(ROT) * math.sin(ROT))
        lam = PT_O_LAMBDA - (l1 + l2) - lam0
        return lam, phi

    return CompiledProj("calcofi", fwd, inv, **fr)


# ------------------------------------------------------------------ labrd
@_register("labrd")
def setup_labrd(crs) -> CompiledProj:
    """Laborde (Madagascar) (ref src/PJ_labrd.c)."""
    fr = _frame(crs)
    es, e = crs.es, crs.e
    one_es = crs.one_es
    phi0 = fr["phi0"]
    k0 = fr["k0"]
    Az = m.dms_param(crs.params.get("azi", "0"))
    sinp = math.sin(phi0)
    t = 1.0 - es * sinp * sinp
    N = 1.0 / math.sqrt(t)
    R = one_es * N / t
    kRg = k0 * math.sqrt(N * R)
    p0s = math.atan(math.sqrt(R / N) * math.tan(phi0))
    A = sinp / math.sin(p0s)
    t_ = e * sinp
    Cc = 0.5 * e * A * math.log((1.0 + t_) / (1.0 - t_)) - A * math.log(
        math.tan(FORTPI + 0.5 * phi0)
    ) + math.log(math.tan(FORTPI + 0.5 * p0s))
    C = Cc
    t2a = Az + Az
    Cb = 1.0 / (12.0 * kRg * kRg)
    Ca = (1.0 - math.cos(t2a)) * Cb
    Cb = Cb * math.sin(t2a)
    Cc2 = 3.0 * (Ca * Ca - Cb * Cb)
    Cd = 6.0 * Ca * Cb

    def fwd(lam, phi):
        V1 = A * np.log(np.tan(FORTPI + 0.5 * phi))
        t = e * np.sin(phi)
        V2 = 0.5 * e * A * np.log((1.0 + t) / (1.0 - t))
        ps = 2.0 * (np.arctan(np.exp(V1 - V2 + C)) - FORTPI)
        I1 = ps - p0s
        cosps = np.cos(ps)
        cosps2 = cosps * cosps
        sinps = np.sin(ps)
        sinps2 = sinps * sinps
        I4 = A * cosps
        I2 = 0.5 * A * I4 * sinps
        I3 = I2 * A * A * (5.0 * cosps2 - sinps2) / 12.0
        I6 = I4 * A * A
        I5 = I6 * (cosps2 - sinps2) / 6.0
        I6 = I6 * A * A * (
            5.0 * cosps2 * cosps2 + sinps2 * (sinps2 - 18.0 * cosps2)
        ) / 120.0
        tl = lam * lam
        x = kRg * lam * (I4 + tl * (I5 + tl * I6))
        y = kRg * (I1 + tl * (I2 + tl * I3))
        x2 = x * x
        y2 = y * y
        V1r = 3.0 * x * y2 - x * x2
        V2r = y * y2 - 3.0 * x2 * y
        x = x + Ca * V1r + Cb * V2r
        y = y + Ca * V2r - Cb * V1r
        return x, y

    def inv(x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        x2 = x * x
        y2 = y * y
        V1 = 3.0 * x * y2 - x * x2
        V2 = y * y2 - 3.0 * x2 * y
        V3 = x * (5.0 * y2 * y2 + x2 * (-10.0 * y2 + x2))
        V4 = y * (5.0 * x2 * x2 + y2 * (-10.0 * x2 + y2))
        x = x + (-Ca * V1 - Cb * V2 + Cc2 * V3 + Cd * V4)
        y = y + (Cb * V1 - Ca * V2 - Cd * V3 + Cc2 * V4)
        ps = p0s + y / kRg
        pe = ps + phi0 - p0s
        for _ in range(20):
            V1i = A * np.log(np.tan(FORTPI + 0.5 * pe))
            tpe = e * np.sin(pe)
            V2i = 0.5 * e * A * np.log((1.0 + tpe) / (1.0 - tpe))
            t = ps - 2.0 * (np.arctan(np.exp(V1i - V2i + C)) - FORTPI)
            pe = pe + t
            if np.all(np.abs(t) < 1e-10):
                break
        t = e * np.sin(pe)
        t = 1.0 - t * t
        Re = one_es / (t * np.sqrt(t))
        t = np.tan(ps)
        t2 = t * t
        s = kRg * kRg
        d = Re * k0 * kRg
        I7 = t / (2.0 * d)
        I8 = t * (5.0 + 3.0 * t2) / (24.0 * d * s)
        d = np.cos(ps) * kRg * A
        I9 = 1.0 / d
        d = d * s
        I10 = (1.0 + 2.0 * t2) / (6.0 * d)
        I11 = (5.0 + t2 * (28.0 + 24.0 * t2)) / (120.0 * d * s)
        x2 = x * x
        phi = pe + x2 * (-I7 + I8 * x2)
        lam = x * (I9 + x2 * (-I10 + x2 * I11))
        return lam, phi

    return CompiledProj("labrd", fwd, inv, **fr)


# ------------------------------------------------------------------ rouss
def mdist_ini(es: float):
    """Exact meridional-distance series (ref src/proj_mdist.c
    proj_mdist_ini)."""
    MAX_ITER = 20
    ens = es
    numf = twon1 = denfi = 1.0
    denf = 1.0
    twon = 4.0
    Es = El = 1.0
    E = [1.0]
    for i in range(1, MAX_ITER):
        numf *= twon1 * twon1
        den = twon * denf * denf * twon1
        T = numf / den
        E.append(T * ens)
        Es -= E[i]
        ens *= es
        twon *= 4.0
        denfi += 1.0
        denf *= denfi
        twon1 += 2.0
        if Es == El:
            break
        El = Es
    nb = i - 1
    b = [1.0 - Es]
    Es2 = b[0]
    numf = denf = 1.0
    numfi = 2.0
    denfi2 = 3.0
    for j in range(1, i):
        Es2 -= E[j]
        numf *= numfi
        denf *= denfi2
        b.append(Es2 * numf / denf)
        numfi += 2.0
        denfi2 += 2.0
    return {"nb": nb, "es": es, "E": Es, "b": np.array(b)}


def mdist(phi, sphi, cphi, en):
    sc = sphi * cphi
    sphi2 = sphi * sphi
    D = phi * en["E"] - en["es"] * sc / np.sqrt(1.0 - en["es"] * sphi2)
    b = en["b"]
    acc = np.full_like(np.asarray(phi, np.float64), b[en["nb"]])
    for i in range(en["nb"] - 1, -1, -1):
        acc = b[i] + sphi2 * acc
    return D + sc * acc


def inv_mdist(dist, en):
    es = en["es"]
    k = 1.0 / (1.0 - es)
    phi = np.asarray(dist, np.float64).copy()
    for _ in range(20):
        s = np.sin(phi)
        t = 1.0 - es * s * s
        upd = (mdist(phi, s, np.cos(phi), en) - dist) * (t * np.sqrt(t)) * k
        phi = phi - upd
        if np.all(np.abs(upd) < 1e-14):
            break
    return phi


@_register("rouss")
def setup_rouss(crs) -> CompiledProj:
    """Roussilhe stereographic (ref src/proj_rouss.c): bivariate
    series around phi0 in (meridional distance, normalized lam)."""
    fr = _frame(crs)
    es = crs.es
    one_es = crs.one_es
    phi0 = fr["phi0"]
    k0 = fr["k0"]
    en = mdist_ini(es)
    s0 = float(mdist(np.array([phi0]), np.array([math.sin(phi0)]), np.array([math.cos(phi0)]), en)[0])
    es2 = math.sin(phi0)
    t = 1.0 - (es2 := es * es2 * es2)
    N0 = 1.0 / math.sqrt(t)
    R_R0_2 = t * t / one_es
    R_R0_4 = R_R0_2 * R_R0_2
    t = math.tan(phi0)
    t2 = t * t
    C1 = A1 = R_R0_2 / 4.0
    C2 = A2 = R_R0_2 * (2 * t2 - 1.0 - 2.0 * es2) / 12.0
    A3 = R_R0_2 * t * (1.0 + 4.0 * t2) / (12.0 * N0)
    A4 = R_R0_4 / 24.0
    A5 = R_R0_4 * (-1.0 + t2 * (11.0 + 12.0 * t2)) / 24.0
    A6 = R_R0_4 * (-2.0 + t2 * (11.0 - 2.0 * t2)) / 240.0
    B1 = t / (2.0 * N0)
    B2 = R_R0_2 / 12.0
    B3 = R_R0_2 * (1.0 + 2.0 * t2 - 2.0 * es2) / 4.0
    B4 = R_R0_2 * t * (2.0 - t2) / (24.0 * N0)
    B5 = R_R0_2 * t * (5.0 + 4.0 * t2) / (8.0 * N0)
    B6 = R_R0_4 * (-2.0 + t2 * (-5.0 + 6.0 * t2)) / 48.0
    B7 = R_R0_4 * (5.0 + t2 * (19.0 + 12.0 * t2)) / 24.0
    B8 = R_R0_4 / 120.0
    C3 = R_R0_2 * t * (1.0 + t2) / (3.0 * N0)
    C4 = R_R0_4 * (-3.0 + t2 * (34.0 + 22.0 * t2)) / 240.0
    C5 = R_R0_4 * (4.0 + t2 * (13.0 + 12.0 * t2)) / 24.0
    C6 = R_R0_4 / 16.0
    C7 = R_R0_4 * t * (11.0 + t2 * (33.0 + t2 * 16.0)) / (48.0 * N0)
    C8 = R_R0_4 * t * (1.0 + t2 * 4.0) / (36.0 * N0)
    D1 = t / (2.0 * N0)
    D2 = R_R0_2 / 12.0
    D3 = R_R0_2 * (2 * t2 + 1.0 - 2.0 * es2) / 4.0
    D4 = R_R0_2 * t * (1.0 + t2) / (8.0 * N0)
    D5 = R_R0_2 * t * (1.0 + t2 * 2.0) / (4.0 * N0)
    D6 = R_R0_4 * (1.0 + t2 * (6.0 + t2 * 6.0)) / 16.0
    D7 = R_R0_4 * t2 * (3.0 + t2 * 4.0) / 8.0
    D8 = R_R0_4 / 80.0
    D9 = R_R0_4 * t * (-21.0 + t2 * (178.0 - t2 * 26.0)) / 720.0
    D10 = R_R0_4 * t * (29.0 + t2 * (86.0 + t2 * 48.0)) / (96.0 * N0)
    D11 = R_R0_4 * t * (37.0 + t2 * 44.0) / (96.0 * N0)

    def fwd(lam, phi):
        cp = np.cos(phi)
        sp = np.sin(phi)
        s = mdist(phi, sp, cp, en) - s0
        s2 = s * s
        al = lam * cp / np.sqrt(1.0 - es * sp * sp)
        al2 = al * al
        x = k0 * al * (1.0 + s2 * (A1 + s2 * A4) - al2 * (A2 + s * A3 + s2 * A5 + al2 * A6))
        y = k0 * (
            al2 * (B1 + al2 * B4)
            + s * (1.0 + al2 * (B3 - al2 * B6) + s2 * (B2 + s2 * B8) + s * al2 * (B5 + s * B7))
        )
        return x, y

    def inv(x, y):
        x = np.asarray(x, np.float64) / k0
        y = np.asarray(y, np.float64) / k0
        x2 = x * x
        y2 = y * y
        al = x * (
            1.0
            - C1 * y2
            + x2 * (C2 + C3 * y - C4 * x2 + C5 * y2 - C7 * x2 * y)
            + y2 * (C6 * y2 - C8 * x2 * y)
        )
        s = s0 + y * (1.0 + y2 * (-D2 + D8 * y2)) + x2 * (
            -D1
            + y * (-D3 + y * (-D5 + y * (-D7 + y * D11)))
            + x2 * (D4 + y * (D6 + y * D10) - x2 * D9)
        )
        phi = inv_mdist(s, en)
        sp = np.sin(phi)
        lam = al * np.sqrt(1.0 - es * sp * sp) / np.cos(phi)
        return lam, phi

    return CompiledProj("rouss", fwd, inv, **fr)
