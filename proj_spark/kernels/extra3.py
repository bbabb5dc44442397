"""Extended kernel inventory, part 3: high-accuracy conformal and
oblique kernels plus remaining misc families (SURVEY.md §2.2).

etmerc (Poder/Engsager), omerc (Hotine), krovak, nzmg (complex
series via zpoly1), oea, goode, geos, airy, lcca, rpoly,
tpeqd.  References cite /root/reference/src/*.c.
"""
from __future__ import annotations

import math

import numpy as np

from . import xmath as m
from .core import EPS10, CompiledProj, REGISTRY, _frame, setup_moll, setup_sinu
from .xmath import FORTPI, HALFPI, PI


def _register(*names):
    def deco(fn):
        for n in names:
            REGISTRY[n] = fn
        return fn

    return deco


# ----------------------------------------------------------------- etmerc
@_register("etmerc")
def setup_etmerc(crs) -> CompiledProj:
    """Extended (exact) transverse Mercator — Poder/Engsager 6th-order
    gaussian series (ref src/proj_etmerc.c:148-289).  Accurate far
    from the central meridian; the cross-check oracle for tmerc.

    Series sums are evaluated directly with numpy complex128
    (sum a_k sin(2k z), z = Cn + i*Ce) instead of the reference's
    Clenshaw recurrences — same polynomials, same order.
    """
    fr = _frame(crs)
    es = crs.es
    if es == 0.0:
        raise ValueError("etmerc: requires ellipsoid")
    f = es / (1.0 + math.sqrt(1.0 - es))
    n = f / (2.0 - f)
    np_ = n

    # geographic -> gaussian and inverse series (proj_etmerc.c setup)
    cgb = [0.0] * 6
    cbg = [0.0] * 6
    cgb[0] = n * (2 + n * (-2.0 / 3.0 + n * (-2 + n * (116.0 / 45.0 + n * (26.0 / 45.0 + n * (-2854.0 / 675.0))))))
    cgb[1] = n ** 2 * (7.0 / 3.0 + n * (-8.0 / 5.0 + n * (-227.0 / 45.0 + n * (2704.0 / 315.0 + n * (2323.0 / 945.0)))))
    cgb[2] = n ** 3 * (56.0 / 15.0 + n * (-136.0 / 35.0 + n * (-1262.0 / 105.0 + n * (73814.0 / 2835.0))))
    cgb[3] = n ** 4 * (4279.0 / 630.0 + n * (-332.0 / 35.0 + n * (-399572.0 / 14175.0)))
    cgb[4] = n ** 5 * (4174.0 / 315.0 + n * (-144838.0 / 6237.0))
    cgb[5] = n ** 6 * (601676.0 / 22275.0)
    cbg[0] = n * (-2 + n * (2.0 / 3.0 + n * (4.0 / 3.0 + n * (-82.0 / 45.0 + n * (32.0 / 45.0 + n * (4642.0 / 4725.0))))))
    cbg[1] = n ** 2 * (5.0 / 3.0 + n * (-16.0 / 15.0 + n * (-13.0 / 9.0 + n * (904.0 / 315.0 + n * (-1522.0 / 945.0)))))
    cbg[2] = n ** 3 * (-26.0 / 15.0 + n * (34.0 / 21.0 + n * (8.0 / 5.0 + n * (-12686.0 / 2835.0))))
    cbg[3] = n ** 4 * (1237.0 / 630.0 + n * (-12.0 / 5.0 + n * (-24832.0 / 14175.0)))
    cbg[4] = n ** 5 * (-734.0 / 315.0 + n * (109598.0 / 31185.0))
    cbg[5] = n ** 6 * (444337.0 / 155925.0)

    # sphere <-> complex-plane series
    utg = [0.0] * 6
    gtu = [0.0] * 6
    gtu[0] = n * (0.5 + n * (-2.0 / 3.0 + n * (5.0 / 16.0 + n * (41.0 / 180.0 + n * (-127.0 / 288.0 + n * (7891.0 / 37800.0))))))
    gtu[1] = n ** 2 * (13.0 / 48.0 + n * (-3.0 / 5.0 + n * (557.0 / 1440.0 + n * (281.0 / 630.0 + n * (-1983433.0 / 1935360.0)))))
    gtu[2] = n ** 3 * (61.0 / 240.0 + n * (-103.0 / 140.0 + n * (15061.0 / 26880.0 + n * (167603.0 / 181440.0))))
    gtu[3] = n ** 4 * (49561.0 / 161280.0 + n * (-179.0 / 168.0 + n * (6601661.0 / 7257600.0)))
    gtu[4] = n ** 5 * (34729.0 / 80640.0 + n * (-3418889.0 / 1995840.0))
    gtu[5] = n ** 6 * (212378941.0 / 319334400.0)
    utg[0] = n * (-0.5 + n * (2.0 / 3.0 + n * (-37.0 / 96.0 + n * (1.0 / 360.0 + n * (81.0 / 512.0 + n * (-96199.0 / 604800.0))))))
    utg[1] = n ** 2 * (-1.0 / 48.0 + n * (-1.0 / 15.0 + n * (437.0 / 1440.0 + n * (-46.0 / 105.0 + n * (1118711.0 / 3870720.0)))))
    utg[2] = n ** 3 * (-17.0 / 480.0 + n * (37.0 / 840.0 + n * (209.0 / 4480.0 + n * (-5569.0 / 90720.0))))
    utg[3] = n ** 4 * (-4397.0 / 161280.0 + n * (11.0 / 504.0 + n * (830251.0 / 7257600.0)))
    utg[4] = n ** 5 * (-4583.0 / 161280.0 + n * (108847.0 / 3991680.0))
    utg[5] = n ** 6 * (-20648693.0 / 638668800.0)

    Qn = fr["k0"] / (1.0 + np_) * (1.0 + np_ * np_ * (0.25 + np_ * np_ * (1.0 / 64.0 + np_ * np_ / 256.0)))

    def _gatg(coef, B):
        B = np.asarray(B, np.float64)
        acc = np.zeros_like(B)
        for k, c in enumerate(coef, start=1):
            acc = acc + c * np.sin(2.0 * k * B)
        return B + acc

    def _csum(coef, z):
        """sum coef[k-1] * sin(2k z) for complex z."""
        acc = np.zeros_like(z)
        for k, c in enumerate(coef, start=1):
            acc = acc + c * np.sin(2.0 * k * z)
        return acc

    Z = float(_gatg(cbg, np.array([fr["phi0"]]))[0])
    Zb = -Qn * (Z + float(np.real(_csum(gtu, np.array([Z + 0j])))[0]))

    EXT = 2.623395162778  # proj_etmerc.c domain guard

    def fwd(lam, phi):
        Cn = _gatg(cbg, phi)
        sin_Cn, cos_Cn = np.sin(Cn), np.cos(Cn)
        sin_Ce, cos_Ce = np.sin(lam), np.cos(lam)
        Cn2 = np.arctan2(sin_Cn, cos_Ce * cos_Cn)
        Ce2 = np.arctan2(sin_Ce * cos_Cn, np.hypot(sin_Cn, cos_Cn * cos_Ce))
        Ce2 = np.arcsinh(np.tan(Ce2))
        z = Cn2 + 1j * Ce2
        dz = _csum(gtu, z)
        Cn3 = Cn2 + np.real(dz)
        Ce3 = Ce2 + np.imag(dz)
        bad = np.abs(Ce3) > EXT
        x = Qn * Ce3
        y = Qn * Cn3 + Zb
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y)

    def inv(x, y):
        Ce = x / Qn
        Cn = (y - Zb) / Qn
        bad = np.abs(Ce) > EXT
        z = Cn + 1j * Ce
        dz = _csum(utg, z)
        Cn2 = Cn + np.real(dz)
        Ce2 = Ce + np.imag(dz)
        Ce2 = np.arctan(np.sinh(Ce2))
        sin_Cn, cos_Cn = np.sin(Cn2), np.cos(Cn2)
        sin_Ce, cos_Ce = np.sin(Ce2), np.cos(Ce2)
        Cn3 = np.arctan2(sin_Cn * cos_Ce, np.hypot(sin_Ce, cos_Ce * cos_Cn))
        Ce3 = np.arctan2(sin_Ce, cos_Ce * cos_Cn)
        phi = _gatg(cgb, Cn3)
        return np.where(bad, np.nan, Ce3), np.where(bad, np.nan, phi)

    return CompiledProj("etmerc", fwd, inv, **fr)


# ------------------------------------------------------------------ omerc
@_register("omerc")
def setup_omerc(crs) -> CompiledProj:
    """Hotine oblique Mercator (ref src/PJ_omerc.c), via +alpha+lonc
    or two-point (+lat_1/+lon_1/+lat_2/+lon_2); optional +no_rot /
    +no_off."""
    fr = _frame(crs)
    es, e = crs.es, crs.e
    one_es = crs.one_es
    p = crs.params
    phi0 = fr["phi0"]
    k0 = fr["k0"]
    TOL = 1e-7

    no_rot = "no_rot" in p
    no_off = "no_off" in p or "no_uoff" in p

    com = math.sqrt(one_es)
    if abs(phi0) > EPS10:
        sinph0 = math.sin(phi0)
        cosph0 = math.cos(phi0)
        con = 1.0 - es * sinph0 * sinph0
        B = cosph0 * cosph0
        B = math.sqrt(1.0 + es * B * B / one_es)
        A = B * k0 * com / con
        D = B * com / (cosph0 * math.sqrt(con))
        F = D * D - 1.0
        if F <= 0.0:
            F = 0.0
        else:
            F = math.sqrt(F)
            if phi0 < 0.0:
                F = -F
        E = F = F + D
        E *= float(m.tsfn(phi0, sinph0, e)) ** B
    else:
        B = 1.0 / com
        A = k0
        E = D = F = 1.0

    alp = "alpha" in p
    gam = "gamma" in p
    if alp or gam:
        # azimuth form — PJ_omerc.c:157-168: gamma0 comes from +alpha
        # when given (even alongside +gamma); the ROTATION angle is the
        # raw +gamma when given, else alpha_c
        lamc = m.dms_param(p.get("lonc", "0"))
        if alp:
            alpha_c = m.dms_param(p["alpha"])
            gamma0 = math.asin(math.sin(alpha_c) / D)
            gamma = m.dms_param(p["gamma"]) if gam else alpha_c
        else:
            gamma = m.dms_param(p["gamma"])
            gamma0 = gamma
            alpha_c = math.asin(D * math.sin(gamma0))
        lam0 = lamc - math.asin(0.5 * (F - 1.0 / F) * math.tan(gamma0)) / B
    else:
        # two-point form
        phi1 = m.dms_param(p["lat_1"])
        phi2 = m.dms_param(p["lat_2"])
        lam1 = m.dms_param(p["lon_1"])
        lam2 = m.dms_param(p["lon_2"])
        H = float(m.tsfn(phi1, math.sin(phi1), e)) ** B
        L = float(m.tsfn(phi2, math.sin(phi2), e)) ** B
        F_ = E / H
        pp = (L - H) / (L + H)
        J = E * E
        J = (J - L * H) / (J + L * H)
        con = lam1 - lam2
        if con < -PI:
            lam2 -= 2 * PI
        elif con > PI:
            lam2 += 2 * PI
        lam0 = m.adjlon(np.array([0.5 * (lam1 + lam2) - math.atan(J * math.tan(0.5 * B * (lam1 - lam2)) / pp) / B]))[0]
        gamma0 = math.atan(2.0 * math.sin(B * m.adjlon(np.array([lam1 - lam0]))[0]) / (F_ - 1.0 / F_))
        gamma = alpha_c = math.asin(max(-1.0, min(1.0, D * math.sin(gamma0))))

    singam = math.sin(gamma0)
    cosgam = math.cos(gamma0)
    # rotation by gamma (the raw +gamma when given), NOT alpha_c —
    # PJ_omerc.c:186-187
    sinrot = math.sin(gamma)
    cosrot = math.cos(gamma)
    ArB = A / B  # PJ_omerc.c ArB; its reciprocal BrA = B/A
    rB = 1.0 / B
    if no_off:
        u_0 = 0.0
    else:
        # atan2 against cos(alpha_c), PJ_omerc.c:192-195
        u_0 = abs(ArB * math.atan2(math.sqrt(max(D * D - 1.0, 0.0)), math.cos(alpha_c)))
        if phi0 < 0.0:
            u_0 = -u_0
    hg0 = 0.5 * gamma0
    v_pole_n = ArB * math.log(math.tan(FORTPI - hg0))
    v_pole_s = ArB * math.log(math.tan(FORTPI + hg0))
    # effective lam0 replaces the CRS frame value
    fr["lam0"] = lam0

    def fwd(lam, phi):
        # pole lanes take the finite (v_pole, ArB*phi) branch like the
        # reference (PJ_omerc.c:56-59), not NaN
        pole = np.abs(np.abs(phi) - HALFPI) <= EPS10
        with np.errstate(divide="ignore", invalid="ignore"):
            Q = E / np.power(m.tsfn(phi, np.sin(phi), e), B)
            S = 0.5 * (Q - 1.0 / Q)
            T = 0.5 * (Q + 1.0 / Q)
            V = np.sin(B * lam)
            U = (S * singam - V * cosgam) / T
            bad = ~pole & (np.abs(np.abs(U) - 1.0) < EPS10)
            v_reg = 0.5 * ArB * np.log((1.0 - U) / (1.0 + U))
            temp = np.cos(B * lam)
            # seam branch uses A*lam (PJ_omerc.c:52), not AB*lam
            u_reg = np.where(
                np.abs(temp) < TOL,
                A * lam,
                ArB * np.arctan2(S * cosgam + V * singam, temp),
            )
        v = np.where(pole, np.where(phi > 0, v_pole_n, v_pole_s), v_reg)
        u = np.where(pole, ArB * phi, u_reg)
        v = np.where(bad, np.nan, v)
        u = np.where(bad, np.nan, u)
        if no_rot:
            # reference never applies u_0 in the no_rot branch
            return u, v
        u = u - u_0
        x = v * cosrot + u * sinrot
        y = u * cosrot - v * sinrot
        return x, y

    def inv(x, y):
        if no_rot:
            u, v = np.asarray(x, np.float64), np.asarray(y, np.float64)
        else:
            v = x * cosrot - y * sinrot
            u = y * cosrot + x * sinrot + u_0
        Qp = np.exp(-v / ArB)
        Sp = 0.5 * (Qp - 1.0 / Qp)
        Tp = 0.5 * (Qp + 1.0 / Qp)
        Vp = np.sin(u / ArB)
        Up = (Vp * cosgam + Sp * singam) / Tp
        at_pole = np.abs(np.abs(Up) - 1.0) < EPS10
        with np.errstate(divide="ignore", invalid="ignore"):
            ts = np.power(E / np.sqrt((1.0 + Up) / (1.0 - Up)), 1.0 / B)
            phi = m.phi2(ts, e)
            lam = -rB * np.arctan2(Sp * cosgam - Vp * singam, np.cos(u / ArB))
        phi = np.where(at_pole, np.where(Up < 0.0, -HALFPI, HALFPI), phi)
        lam = np.where(at_pole, 0.0, lam)
        return lam, phi

    return CompiledProj("omerc", fwd, inv, **fr)


# ----------------------------------------------------------------- krovak
@_register("krovak")
def setup_krovak(crs) -> CompiledProj:
    """Krovak S-JTSK (ref src/PJ_krovak.c).  Czech/Slovak oblique
    conformal conic; +czech flips the axes signs."""
    fr = _frame(crs)
    es, e = crs.es, crs.e
    # PROJ defaults: lat_0=49.5, lon_0=24.8333... (ferro-based 42.5-17.6666)
    if "lat_0" not in crs.params:
        fr["phi0"] = 49.5 * 0.0174532925199433
    if "lon_0" not in crs.params:
        fr["lam0"] = (42.5 - 17.66666666666667) * 0.0174532925199433
    phi0 = fr["phi0"]
    czech = 1.0 if "czech" not in crs.params else -1.0
    # PROJ hardcodes these for the S-JTSK realization
    s45 = 0.785398163397448
    s90 = 2.0 * s45
    fi0 = phi0
    e2 = es
    e_ = math.sqrt(e2)
    alfa = math.sqrt(1.0 + (e2 * math.cos(fi0) ** 4) / (1.0 - e2))
    uq = 1.04216856380474
    u0 = math.asin(math.sin(fi0) / alfa)
    g = ((1.0 + e_ * math.sin(fi0)) / (1.0 - e_ * math.sin(fi0))) ** (alfa * e_ / 2.0)
    k_ = math.tan(u0 / 2.0 + s45) / (math.tan(fi0 / 2.0 + s45) ** alfa) * g
    k1 = fr["k0"]
    n0 = math.sqrt(1.0 - e2) / (1.0 - e2 * math.sin(fi0) ** 2)
    s0 = 1.37008346281555  # lat of pseudo std parallel, 78.5 deg
    n_ = math.sin(s0)
    ro0 = k1 * n0 / math.tan(s0)
    ad = s90 - uq

    def fwd(lam, phi):
        gfi = np.power((1.0 + e_ * np.sin(phi)) / (1.0 - e_ * np.sin(phi)), alfa * e_ / 2.0)
        u = 2.0 * (np.arctan(k_ * np.power(np.tan(phi / 2.0 + s45), alfa) / gfi) - s45)
        deltav = -lam * alfa
        s = np.arcsin(np.clip(np.cos(ad) * np.sin(u) + np.sin(ad) * np.cos(u) * np.cos(deltav), -1.0, 1.0))
        d = np.arcsin(np.clip(np.cos(u) * np.sin(deltav) / np.cos(s), -1.0, 1.0))
        eps = n_ * d
        ro = ro0 * np.power(np.tan(s0 / 2.0 + s45), n_) / np.power(np.tan(s / 2.0 + s45), n_)
        y = ro * np.cos(eps)
        x = ro * np.sin(eps)
        return x * czech, y * czech

    def inv(x, y):
        x = np.asarray(x, np.float64) * czech
        y = np.asarray(y, np.float64) * czech
        ro = np.hypot(x, y)
        eps = np.arctan2(x, y)
        d = eps / np.sin(s0)
        s = 2.0 * (np.arctan(np.power(ro0 / ro, 1.0 / n_) * np.tan(s0 / 2.0 + s45)) - s45)
        u = np.arcsin(np.clip(np.cos(ad) * np.sin(s) - np.sin(ad) * np.cos(s) * np.cos(d), -1.0, 1.0))
        deltav = np.arcsin(np.clip(np.cos(s) * np.sin(d) / np.cos(u), -1.0, 1.0))
        lam = -deltav / alfa
        # iterate geographic latitude (PJ_krovak.c inverse loop)
        phi = u.copy()
        for _ in range(30):
            phi_new = 2.0 * (
                np.arctan(
                    np.power(k_, -1.0 / alfa)
                    * np.power(np.tan(u / 2.0 + s45), 1.0 / alfa)
                    * np.power((1.0 + e_ * np.sin(phi)) / (1.0 - e_ * np.sin(phi)), e_ / 2.0)
                )
                - s45
            )
            if np.all(np.abs(phi_new - phi) < 1e-15):
                phi = phi_new
                break
            phi = phi_new
        return lam, phi

    return CompiledProj("krovak", fwd, inv, **fr)


# ------------------------------------------------------------------- nzmg
def zpoly1(z, coefs):
    """Complex polynomial z*(C0 + z*(C1 + ...)) — NO constant term
    (ref src/pj_zpoly1.c:46: Horner over the coefficients followed by
    one extra multiply by z)."""
    acc = np.full_like(z, coefs[-1])
    for c in reversed(coefs[:-1]):
        acc = acc * z + c
    return acc * z


def zpolyd1(z, coefs):
    """zpoly1 value + derivative (ref pj_zpoly1.c pj_zpolyd1).

    f(z) = z*P(z)  =>  f'(z) = P(z) + z*P'(z).
    """
    P = np.full_like(z, coefs[-1])
    dP = np.zeros_like(z)
    for c in reversed(coefs[:-1]):
        dP = dP * z + P
        P = P * z + c
    return P * z, P + z * dP


@_register("nzmg")
def setup_nzmg(crs) -> CompiledProj:
    """New Zealand Map Grid (ref src/PJ_nzmg.c): 6th-order complex
    polynomial of the isometric-latitude series."""
    fr = _frame(crs)
    # PJ_nzmg.c tables
    bf = [
        0.7557853228 + 0.0j,
        0.249204646 + 0.003371507j,
        -0.001541739 + 0.041058560j,
        -0.10162907 + 0.01727609j,
        -0.26623489 - 0.36249218j,
        -0.6870983 - 1.1651967j,
    ]
    tphi = [1.5627014243, 0.5185406398, -0.03333098, -0.1052906, -0.0368594, 0.007317, 0.01220, 0.00394, -0.0013]
    tpsi = [0.6399175073, -0.1358797613, 0.063294409, -0.02526853, 0.0117879, -0.0055161, 0.0026906, -0.001333, 0.00067, -0.00034]
    # 'sec5' unit = 1e5 arcseconds (PJ_nzmg.c); 1 sec5 = 0.4848... rad
    SEC5_TO_RAD = 0.4848136811095359935899141023
    RAD_TO_SEC5 = 1.0 / SEC5_TO_RAD
    # PROJ forces these frame params
    fr["lam0"] = 173.0 * 0.0174532925199433
    fr["phi0"] = -41.0 * 0.0174532925199433

    def fwd(lam, phi):
        p = (phi - fr["phi0"]) * RAD_TO_SEC5
        acc = np.full_like(p, tpsi[-1])
        for c in reversed(tpsi[:-1]):
            acc = acc * p + c
        p = acc * p
        z = p + 1j * lam
        z = zpoly1(z, bf)
        return np.imag(z), np.real(z)

    def inv(x, y):
        z = np.asarray(y, np.float64) + 1j * np.asarray(x, np.float64)
        # Newton on the complex polynomial (PJ_nzmg.c inverse, <=20 it;
        # initial guess = target itself, as in the reference)
        w = z.copy()
        for _ in range(20):
            f, der = zpolyd1(w, bf)
            dw = (f - z) / der
            w = w - dw
            if np.all(np.abs(dw) <= 1e-14):
                break
        p = np.real(w)
        acc = np.full_like(p, tphi[-1])
        for c in reversed(tphi[:-1]):
            acc = acc * p + c
        phi = fr["phi0"] + (acc * p) * SEC5_TO_RAD
        lam = np.imag(w)
        return lam, phi

    return CompiledProj("nzmg", fwd, inv, **fr)


# ------------------------------------------------------------------- oea
@_register("oea")
def setup_oea(crs) -> CompiledProj:
    """Oblated equal area (ref src/PJ_oea.c).  Degenerate case
    m = n = 1, theta = 0 is the spherical Lambert azimuthal equal
    area (tested as the correctness anchor)."""
    fr = _frame(crs)
    p = crs.params
    # missing n/m read as 0 in the reference and fail the <= 0 check
    # (PJ_oea.c:41-43 E_ERROR(-39)) — no silent defaults
    n_ = float(p.get("n", 0.0))
    m_ = float(p.get("m", 0.0))
    if n_ <= 0.0 or m_ <= 0.0:
        raise ValueError("oea: m, n must be positive (reference error -39)")
    theta = m.dms_param(p.get("theta", "0"))
    sp0, cp0 = math.sin(fr["phi0"]), math.cos(fr["phi0"])
    rn, rm = 1.0 / n_, 1.0 / m_
    two_r_n, two_r_m = 2.0 * rn, 2.0 * rm
    hn, hm = 0.5 * n_, 0.5 * m_

    def fwd(lam, phi):
        cp = np.cos(phi)
        sp = np.sin(phi)
        cl = np.cos(lam)
        Az = m.aatan2(cp * np.sin(lam), cp0 * sp - sp0 * cp * cl) + theta
        shz = np.sin(0.5 * m.aacos(sp0 * sp + cp0 * cp * cl))
        M = m.aasin(shz * np.sin(Az))
        N = m.aasin(shz * np.cos(Az) * np.cos(M) / np.cos(M * two_r_m))
        y = n_ * np.sin(N * two_r_n)
        x = m_ * np.sin(M * two_r_m) * np.cos(N) / np.cos(N * two_r_n)
        return x, y

    def inv(x, y):
        N = hn * m.aasin(y * rn)
        M = hm * m.aasin(x * rm * np.cos(N * two_r_n) / np.cos(N))
        xp = 2.0 * np.sin(M)
        yp = 2.0 * np.sin(N) * np.cos(M * two_r_m) / np.cos(M)
        Az = m.aatan2(xp, yp) - theta
        cAz = np.cos(Az)
        z = 2.0 * m.aasin(0.5 * np.hypot(xp, yp))
        sz, cz = np.sin(z), np.cos(z)
        phi = m.aasin(sp0 * cz + cp0 * sz * cAz)
        lam = m.aatan2(sz * np.sin(Az), cp0 * cz - sp0 * sz * cAz)
        return lam, phi

    return CompiledProj("oea", fwd, inv, **fr)


# ------------------------------------------------------------------ goode
@_register("goode")
def setup_goode(crs) -> CompiledProj:
    """Goode homolosine (ref src/PJ_goode.c): sinusoidal below
    40d44'11.8", Mollweide above, y offset stitched."""
    fr = _frame(crs)
    PHI_LIM = 0.71093078197902358062  # 40d44'11.8"
    Y_COR = 0.05280
    sinu = setup_sinu(crs)
    moll = setup_moll(crs)

    def fwd(lam, phi):
        lo = np.abs(phi) <= PHI_LIM
        xs, ys = sinu.fwd(lam, phi)
        xm, ym = moll.fwd(lam, phi)
        ym = ym - np.sign(phi) * Y_COR
        return np.where(lo, xs, xm), np.where(lo, ys, ym)

    def inv(x, y):
        lo = np.abs(y) <= PHI_LIM  # sinu: y == phi
        ls, ps = sinu.inv(x, y)
        lm, pm = moll.inv(x, y + np.sign(y) * Y_COR)
        return np.where(lo, ls, lm), np.where(lo, ps, pm)

    return CompiledProj("goode", fwd, inv, **fr)


# ------------------------------------------------------------------- geos
@_register("geos")
def setup_geos(crs) -> CompiledProj:
    """Geostationary satellite view (ref src/PJ_geos.c), sphere +
    ellipsoid, sweep axis."""
    fr = _frame(crs)
    es = crs.es
    one_es = crs.one_es
    h = float(crs.params.get("h", 35785831.0))
    sweep = str(crs.params.get("sweep", "y"))
    if sweep not in ("x", "y"):
        raise ValueError("geos: sweep must be x or y")
    flip_axis = sweep == "x"
    radius_g_1 = h / crs.a
    radius_g = 1.0 + radius_g_1
    C = radius_g * radius_g - 1.0
    if es:
        radius_p = math.sqrt(one_es)
        radius_p2 = one_es
        radius_p_inv2 = crs.rone_es

        def fwd(lam, phi):
            phi_c = np.arctan(radius_p2 * np.tan(phi))
            r = radius_p / np.hypot(radius_p * np.cos(phi_c), np.sin(phi_c))
            Vx = r * np.cos(lam) * np.cos(phi_c)
            Vy = r * np.sin(lam) * np.cos(phi_c)
            Vz = r * np.sin(phi_c)
            bad = ((radius_g - Vx) * Vx - Vy * Vy - Vz * Vz * radius_p_inv2) < 0.0
            tmp = radius_g - Vx
            if flip_axis:
                x = radius_g_1 * np.arctan(Vy / np.hypot(Vz, tmp))
                y = radius_g_1 * np.arctan(Vz / tmp)
            else:
                x = radius_g_1 * np.arctan(Vy / tmp)
                y = radius_g_1 * np.arctan(Vz / np.hypot(Vy, tmp))
            return np.where(bad, np.nan, x), np.where(bad, np.nan, y)

        def inv(x, y):
            Vx = -1.0
            if flip_axis:
                Vz = np.tan(y / radius_g_1)
                Vy = np.tan(x / radius_g_1) * np.hypot(1.0, Vz)
            else:
                Vy = np.tan(x / radius_g_1)
                Vz = np.tan(y / radius_g_1) * np.hypot(1.0, Vy)
            # quadratic for intersection with ellipsoid
            a_ = Vz / radius_p
            a_ = Vy * Vy + a_ * a_ + Vx * Vx
            b_ = 2.0 * radius_g * Vx
            det = b_ * b_ - 4.0 * a_ * C
            bad = det < 0.0
            k = (-b_ - np.sqrt(np.maximum(det, 0.0))) / (2.0 * a_)
            Vx2 = radius_g + k * Vx
            Vy2 = k * Vy
            Vz2 = k * Vz
            lam = np.arctan2(Vy2, Vx2)
            phi = np.arctan(Vz2 * np.cos(lam) / Vx2)
            phi = np.arctan(radius_p_inv2 * np.tan(phi))
            return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)

    else:

        def fwd(lam, phi):
            tmp = np.cos(phi)
            Vx = tmp * np.cos(lam)
            Vy = tmp * np.sin(lam)
            Vz = np.sin(phi)
            bad = ((radius_g - Vx) * Vx - Vy * Vy - Vz * Vz) < 0.0
            tmp2 = radius_g - Vx
            if flip_axis:
                x = radius_g_1 * np.arctan(Vy / np.hypot(Vz, tmp2))
                y = radius_g_1 * np.arctan(Vz / tmp2)
            else:
                x = radius_g_1 * np.arctan(Vy / tmp2)
                y = radius_g_1 * np.arctan(Vz / np.hypot(Vy, tmp2))
            return np.where(bad, np.nan, x), np.where(bad, np.nan, y)

        def inv(x, y):
            Vx = -1.0
            if flip_axis:
                Vz = np.tan(y / radius_g_1)
                Vy = np.tan(x / radius_g_1) * np.sqrt(1.0 + Vz * Vz)
            else:
                Vy = np.tan(x / radius_g_1)
                Vz = np.tan(y / radius_g_1) * np.sqrt(1.0 + Vy * Vy)
            a_ = Vy * Vy + Vz * Vz + Vx * Vx
            b_ = 2.0 * radius_g * Vx
            det = b_ * b_ - 4.0 * a_ * C
            bad = det < 0.0
            k = (-b_ - np.sqrt(np.maximum(det, 0.0))) / (2.0 * a_)
            Vx2 = radius_g + k * Vx
            Vy2 = k * Vy
            Vz2 = k * Vz
            lam = np.arctan2(Vy2, Vx2)
            phi = np.arctan(Vz2 * np.cos(lam) / Vx2)
            return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)

    return CompiledProj("geos", fwd, inv, **fr)


# ------------------------------------------------------------------- airy
@_register("airy")
def setup_airy(crs) -> CompiledProj:
    """Airy minimum-error azimuthal (ref src/PJ_airy.c), fwd only."""
    fr = _frame(crs)
    phi0 = fr["phi0"]
    beta = 0.5 * (HALFPI - m.dms_param(crs.params.get("lat_b", "90")))
    if abs(beta) < EPS10:
        Cb = -0.5
    else:
        # PJ_airy.c setup: Cb = cot^2(beta) * log(cos(beta))
        Cb = (1.0 / math.tan(beta)) ** 2 * math.log(math.cos(beta))
    sinph0, cosph0 = math.sin(phi0), math.cos(phi0)
    mode_n = abs(phi0 - HALFPI) < EPS10
    mode_s = abs(phi0 + HALFPI) < EPS10
    polar = mode_n or mode_s

    def fwd(lam, phi):
        sinlam, coslam = np.sin(lam), np.cos(lam)
        if polar:
            sign = -1.0 if mode_s else 1.0
            z = 0.5 * (HALFPI - sign * phi)
            bad = np.abs(z) < EPS10
            with np.errstate(divide="ignore", invalid="ignore"):
                t = np.tan(z)
                R = -(np.log(np.cos(z)) / t + Cb * t)
            x = R * sinlam
            y = -sign * R * coslam
            return np.where(bad, 0.0, x), np.where(bad, 0.0, y)
        sinphi, cosphi = np.sin(phi), np.cos(phi)
        cosz = cosphi * coslam * cosph0 + sinphi * sinph0
        z = m.aacos(cosz) * 0.5
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.tan(z)
            K = np.where(np.abs(z) < EPS10, -0.5 - Cb, -(np.log(np.cos(z)) / t + Cb * t) / (2.0 * np.sin(z) * np.cos(z)))
        x = K * cosphi * sinlam
        y = K * (cosph0 * sinphi - sinph0 * cosphi * coslam)
        return x, y

    return CompiledProj("airy", fwd, None, **fr)


# ------------------------------------------------------------------- lcca
@_register("lcca")
def setup_lcca(crs) -> CompiledProj:
    """Lambert conformal conic alternative (ref src/PJ_lcca.c)."""
    fr = _frame(crs)
    es = crs.es
    phi0 = fr["phi0"]
    if phi0 == 0.0:
        raise ValueError("lcca: lat_0 is required and nonzero")
    en = m.enfn(es)
    fix_lat = math.sin(phi0)
    m0 = float(m.mlfn(phi0, fix_lat, math.cos(phi0), en))
    l_ = fix_lat
    M0 = m0
    MAX_ITER, DEL_TOL = 10, 1e-12

    def _fS(S, slcca):
        return S * (1.0 + S * S * slcca)

    def _fSp(S, slcca):
        return 1.0 + 3.0 * S * S * slcca

    # PJ_lcca.c: C = 1/(6 rho0 nu0) with rho0, nu0 at phi0 (in units of a)
    sp2 = fix_lat * fix_lat
    con = 1.0 - es * sp2
    nu0 = 1.0 / math.sqrt(con)
    rho0 = (1.0 - es) * nu0 / con
    C = 1.0 / (6.0 * rho0 * nu0)

    def fwd(lam, phi):
        S = m.mlfn(phi, np.sin(phi), np.cos(phi), en) - M0
        S3 = _fS(S, C)
        r = 1.0 / l_ - S3
        lamtheta = lam * l_
        x = fr["k0"] * (r * np.sin(lamtheta))
        y = fr["k0"] * (1.0 / l_ - r * np.cos(lamtheta))
        return x, y

    def inv(x, y):
        x = np.asarray(x, np.float64) / fr["k0"]
        y = np.asarray(y, np.float64) / fr["k0"]
        theta = np.arctan2(x, 1.0 / l_ - y)
        dr = y - x * np.tan(0.5 * theta)
        lam = theta / l_
        S = dr.copy()
        for _ in range(MAX_ITER):
            upd = (_fS(S, C) - dr) / _fSp(S, C)
            S = S - upd
            if np.all(np.abs(upd) < DEL_TOL):
                break
        phi = m.inv_mlfn(S + M0, es, en)
        return lam, phi

    return CompiledProj("lcca", fwd, inv, **fr)


# ------------------------------------------------------------------ rpoly
@_register("rpoly")
def setup_rpoly(crs) -> CompiledProj:
    """Rectangular polyconic (ref src/PJ_rpoly.c), fwd only, sphere."""
    fr = _frame(crs)
    phi_ts = m.dms_param(crs.params.get("lat_ts", "0"))
    fxa = 0.5 * math.sin(phi_ts) if abs(phi_ts) > EPS10 else 0.0
    mode = abs(phi_ts) > EPS10

    def fwd(lam, phi):
        if mode:
            fa = np.tan(lam * fxa) / fxa
        else:
            fa = 0.5 * lam
        small = np.abs(phi) < EPS10
        with np.errstate(divide="ignore", invalid="ignore"):
            fb = 2.0 * np.arctan(fa * np.sin(phi))
            cot = 1.0 / np.tan(np.where(small, 1.0, phi))
            x = np.where(small, 2.0 * fa, cot * np.sin(fb))
            y = np.where(small, -fr["phi0"], phi - fr["phi0"] + cot * (1.0 - np.cos(fb)))
        return x, y

    return CompiledProj("rpoly", fwd, None, **fr)


# ------------------------------------------------------------------ tpeqd
@_register("tpeqd")
def setup_tpeqd(crs) -> CompiledProj:
    """Two-point equidistant (ref src/PJ_tpeqd.c), sphere.

    Forward: x = (z1^2 - z2^2)/(2*z02), y from the triangle with the
    two control points mapped to (-hz0, 0) and (+hz0, 0) — distances
    from the mapped point to those two anchors are exactly z1, z2.
    Inverse: two-circle intersection solved directly (bearing from P1
    via the spherical cosine rule, then the destination formula).
    """
    fr = _frame(crs)
    p = crs.params
    phi1 = m.dms_param(p.get("lat_1", "0"))
    lam1 = m.dms_param(p.get("lon_1", "0"))
    phi2 = m.dms_param(p.get("lat_2", "0"))
    lam2 = m.dms_param(p.get("lon_2", "0"))
    if phi1 == phi2 and lam1 == lam2:
        raise ValueError("tpeqd: identical control points")
    fr["lam0"] = float(m.adjlon(np.array([0.5 * (lam1 + lam2)]))[0])
    dlam2 = float(m.adjlon(np.array([lam2 - lam1]))[0])
    cp1, sp1 = math.cos(phi1), math.sin(phi1)
    cp2, sp2 = math.cos(phi2), math.sin(phi2)
    cs = cp1 * sp2
    sc = sp1 * cp2
    ccs = cp1 * cp2 * math.sin(dlam2)
    z02 = float(m.aacos(np.array([sp1 * sp2 + cp1 * cp2 * math.cos(dlam2)]))[0])
    hz0 = 0.5 * z02
    A12 = math.atan2(cp2 * math.sin(dlam2), cp1 * sp2 - sp1 * cp2 * math.cos(dlam2))
    dlam2_h = 0.5 * dlam2
    r2z0 = 0.5 / z02
    z02sq = z02 * z02

    def fwd(lam, phi):
        sp = np.sin(phi)
        cp = np.cos(phi)
        dl1 = lam + dlam2_h
        dl2 = lam - dlam2_h
        z1 = m.aacos(sp1 * sp + cp1 * cp * np.cos(dl1))
        z2 = m.aacos(sp2 * sp + cp2 * cp * np.cos(dl2))
        z1sq = z1 * z1
        z2sq = z2 * z2
        t = z1sq - z2sq
        x = r2z0 * t
        t = z02sq - t
        y = r2z0 * m.asqrt(4.0 * z02sq * z2sq - t * t)
        # side of the P1-P2 great circle (PJ_tpeqd.c forward)
        y = np.where(
            (ccs * sp - cp * (cs * np.sin(lam) - sc * np.cos(lam))) < 0.0, -y, y
        )
        return x, y

    def inv(x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        z1 = np.hypot(y, x + hz0)
        z2 = np.hypot(y, x - hz0)
        # bearing at P1 between P2 and the target (cosine rule)
        with np.errstate(divide="ignore", invalid="ignore"):
            cbeta = (np.cos(z2) - np.cos(z02) * np.cos(z1)) / (
                np.sin(z02) * np.sin(z1)
            )
        beta = m.aacos(np.clip(cbeta, -1.0, 1.0))
        # sign: positive y = left of P1->P2 (matches forward convention)
        az = A12 - np.where(y >= 0.0, beta, -beta)
        sz, cz = np.sin(z1), np.cos(z1)
        phi = m.aasin(np.clip(sp1 * cz + cp1 * sz * np.cos(az), -1.0, 1.0))
        dlam = np.arctan2(sz * np.sin(az), cp1 * cz - sp1 * sz * np.cos(az))
        lam = dlam - dlam2_h  # relative to lam0 (P1 at lam0 - dlam2_h)
        z1_zero = z1 < 1e-12
        lam = np.where(z1_zero, -dlam2_h, lam)
        phi = np.where(z1_zero, phi1, phi)
        return lam, phi

    return CompiledProj("tpeqd", fwd, inv, **fr)
