"""Extended kernel inventory, part 2: oblique/conformal families,
DGGS projections, complex-series kernels, and remaining
pseudocylindricals (SURVEY.md §2.2).

Behavioral references cite /root/reference/src/PJ_*.c; formulas are
standard Snyder/PROJ math re-implemented in vectorized numpy.
"""
from __future__ import annotations

import math

import numpy as np

from . import xmath as m
from .core import (
    EPS10,
    CompiledProj,
    REGISTRY,
    _frame,
    healpix_sphere_fwd,
    healpix_sphere_inv,
)
from .xmath import FORTPI, HALFPI, PI


def _register(*names):
    def deco(fn):
        for n in names:
            REGISTRY[n] = fn
        return fn

    return deco


# ------------------------------------------------------------ moll family
@_register("wag4", "wag5")
def setup_moll_family(crs) -> CompiledProj:
    """Mollweide generalizations (PJ_moll.c setup(P, p)): wag4 with
    p = pi/3; wag5 with direct constants."""
    fr = _frame(crs)
    if crs.proj == "wag4":
        p = PI / 3.0
        sp = math.sin(p)
        p2 = p + p
        r = math.sqrt(2.0 * PI * sp / (p2 + math.sin(p2)))
        cx = 2.0 * r / PI
        cy = r / sp
        cp = p2 + math.sin(p2)
    else:  # wag5 (PJ_moll.c ENTRY wag5: literal constants)
        cx = 0.90977
        cy = 1.65014
        cp = 3.00896
    MAX_ITER, LOOP_TOL = 10, 1e-7

    def fwd(lam, phi):
        k = cp * np.sin(phi)
        theta = np.asarray(phi, np.float64).copy()
        for _ in range(MAX_ITER):
            V = (theta + np.sin(theta) - k) / (1.0 + np.cos(theta))
            theta = theta - V
            if np.all(np.abs(V) < LOOP_TOL):
                break
        theta = theta * 0.5
        return cx * lam * np.cos(theta), cy * np.sin(theta)

    def inv(x, y):
        theta = np.arcsin(np.clip(y / cy, -1.0, 1.0))
        lam = x / (cx * np.cos(theta))
        theta = theta + theta
        phi = np.arcsin(np.clip((theta + np.sin(theta)) / cp, -1.0, 1.0))
        return lam, phi

    return CompiledProj(crs.proj, fwd, inv, **fr)


# ---------------------------------------------------------- putp family
@_register("putp2")
def setup_putp2(crs) -> CompiledProj:
    fr = _frame(crs)
    C_x, C_y, C_p = 1.89490, 1.71848, 0.6141848493043784
    EPS, NITER = 1e-10, 10

    def fwd(lam, phi):
        p = C_p * np.sin(phi)
        s = phi * phi
        theta = phi * (0.615709 + s * (0.00909953 + s * 0.0046292))
        for _ in range(NITER):
            c = np.cos(theta)
            s_ = np.sin(theta)
            V = (theta + s_ * (c - 1.0) - p) / (1.0 + c * (c - 1.0) - s_ * s_)
            theta = theta - V
            if np.all(np.abs(V) < EPS):
                break
        return C_x * lam * (np.cos(theta) - 0.5), C_y * np.sin(theta)

    def inv(x, y):
        c = y / C_y
        theta = np.arcsin(np.clip(c, -1.0, 1.0))
        ct = np.cos(theta)
        lam = x / (C_x * (ct - 0.5))
        phi = np.arcsin(np.clip((theta + np.sin(theta) * (ct - 1.0)) / C_p, -1.0, 1.0))
        return lam, phi

    return CompiledProj("putp2", fwd, inv, **fr)


@_register("putp3", "putp3p")
def setup_putp3(crs) -> CompiledProj:
    """Putnins P3/P3' (PJ_putp3.c): x = C*lam*(1 - A*phi^2), y = phi."""
    fr = _frame(crs)
    C = 0.79788456
    RPISQ = 1.0 / (PI * PI)
    A = (0.5 if crs.proj == "putp3" else 2.0) * RPISQ

    def fwd(lam, phi):
        return C * lam * (1.0 - A * phi * phi), C * phi

    def inv(x, y):
        phi = y / C
        lam = x / (C * (1.0 - A * phi * phi))
        return lam, phi

    return CompiledProj(crs.proj, fwd, inv, **fr)


@_register("putp4p", "weren")
def setup_putp4p(crs) -> CompiledProj:
    """Putnins P4' / Werenskiold I (PJ_putp4p.c)."""
    fr = _frame(crs)
    if crs.proj == "weren":
        C_x, C_y = 1.0, 4.442882938158366247015881
    else:
        C_x, C_y = 0.874038744, 3.883251825

    def fwd(lam, phi):
        phi_ = m.aasin(0.883883476 * np.sin(phi))
        x = C_x * lam * np.cos(phi_)
        ph3 = phi_ * 0.333333333333333
        x = x / np.cos(ph3)
        y = C_y * np.sin(ph3)
        return x, y

    def inv(x, y):
        ph3 = m.aasin(y / C_y)
        phi_ = ph3 * 3.0
        lam = x * np.cos(ph3) / (C_x * np.cos(phi_))
        phi = m.aasin(np.sin(phi_) / 0.883883476)
        return lam, phi

    return CompiledProj(crs.proj, fwd, inv, **fr)


@_register("putp5", "putp5p")
def setup_putp5(crs) -> CompiledProj:
    """Putnins P5/P5' (PJ_putp5.c): x = C*lam*(A - B*sqrt(1 + D*phi^2))."""
    fr = _frame(crs)
    C = 1.01346
    D = 1.2158542
    if crs.proj == "putp5":
        A, B = 2.0, 1.0
    else:
        A, B = 1.5, 0.5

    def fwd(lam, phi):
        return C * lam * (A - B * np.sqrt(1.0 + D * phi * phi)), C * phi

    def inv(x, y):
        phi = y / C
        lam = x / (C * (A - B * np.sqrt(1.0 + D * phi * phi)))
        return lam, phi

    return CompiledProj(crs.proj, fwd, inv, **fr)


@_register("putp6", "putp6p")
def setup_putp6(crs) -> CompiledProj:
    """Putnins P6/P6' (PJ_putp6.c): iterative fwd."""
    fr = _frame(crs)
    if crs.proj == "putp6":
        C_x, C_y, A, B, D = 1.01346, 0.91910, 4.0, 2.1471437182129378784, 2.0
    else:
        C_x, C_y, A, B, D = 0.44329, 0.80404, 6.0, 5.61125, 3.0
    EPS, NITER = 1e-10, 10

    def fwd(lam, phi):
        p = B * np.sin(phi)
        theta = phi * 1.10265779
        for _ in range(NITER):
            r = np.sqrt(1.0 + theta * theta)
            V = ((A - r) * theta - np.log(theta + r) - p) / (A - 2.0 * r)
            theta = theta - V
            if np.all(np.abs(V) < EPS):
                break
        x = C_x * lam * (D - np.sqrt(1.0 + theta * theta))
        y = C_y * theta
        return x, y

    def inv(x, y):
        theta = y / C_y
        r = np.sqrt(1.0 + theta * theta)
        lam = x / (C_x * (D - r))
        phi = m.aasin(((A - r) * theta - np.log(theta + r)) / B)
        return lam, phi

    return CompiledProj(crs.proj, fwd, inv, **fr)


@_register("urm5")
def setup_urm5(crs) -> CompiledProj:
    """Urmaev V (PJ_urm5.c), forward only; params n, q (+alpha)."""
    fr = _frame(crs)
    n = float(crs.params.get("n", 0.8))
    if not (0.0 < n <= 1.0):
        raise ValueError("urm5: n not in (0,1]")
    q3 = float(crs.params.get("q", 0.414524)) / 3.0
    alpha = m.dms_param(crs.params.get("alpha", "45"))
    t = n * math.sin(alpha)
    m_ = math.cos(alpha) / math.sqrt(1.0 - t * t)

    def fwd(lam, phi):
        t_ = phi * n
        x = m_ * lam * np.cos(t_)
        t2 = t_ * t_
        y = t_ * (1.0 + t2 * q3) / (m_ * n)
        return x, y

    return CompiledProj("urm5", fwd, None, **fr)


@_register("urmfps", "wag1")
def setup_urmfps(crs) -> CompiledProj:
    """Urmaev flat-polar sinusoidal (PJ_urmfps.c); wag1 = n=0.8660254."""
    fr = _frame(crs)
    if crs.proj == "wag1":
        n = 0.8660254037844386467637232
    else:
        n = float(crs.params.get("n", 0.8660254037844386467637232))
        if not (0.0 < n <= 1.0):
            raise ValueError("urmfps: n not in (0,1]")
    C_x = 0.8773826753
    C_y = 1.139753528477 / n

    def fwd(lam, phi):
        t = m.aasin(n * np.sin(phi))
        x = C_x * lam * np.cos(t)
        y = C_y * t
        return x, y

    def inv(x, y):
        t = y / C_y
        phi = m.aasin(np.sin(t) / n)
        lam = x / (C_x * np.cos(t))
        return lam, phi

    return CompiledProj(crs.proj, fwd, inv, **fr)


@_register("hatano")
def setup_hatano(crs) -> CompiledProj:
    """Hatano asymmetrical equal area (PJ_hatano.c)."""
    fr = _frame(crs)
    NITER, EPS = 20, 1e-7
    CN = 2.67595
    CS = 2.43763
    RCN = 0.37369906014686373063
    RCS = 0.41023453108141924738
    FYCN = 1.75859
    FYCS = 1.93052
    RYCN = 0.56863737426006061674
    RYCS = 0.51799515156538134803
    FXC = 0.85
    RXC = 1.17647058823529411764

    def fwd(lam, phi):
        c = np.sin(phi) * np.where(phi < 0.0, CS, CN)
        theta = np.asarray(phi, np.float64).copy()
        for _ in range(NITER):
            V = (theta + np.sin(theta) - c) / (1.0 + np.cos(theta))
            theta = theta - V
            if np.all(np.abs(V) < EPS):
                break
        theta = theta * 0.5
        x = FXC * lam * np.cos(theta)
        y = np.sin(theta) * np.where(phi < 0.0, FYCS, FYCN)
        return x, y

    def inv(x, y):
        th = y * np.where(y < 0.0, RYCS, RYCN)
        th = np.arcsin(np.clip(th, -1.0, 1.0))
        lam = RXC * x / np.cos(th)
        th = th + th
        phi = np.arcsin(np.clip((th + np.sin(th)) * np.where(y < 0.0, RCS, RCN), -1.0, 1.0))
        return lam, phi

    return CompiledProj("hatano", fwd, inv, **fr)


@_register("natearth")
def setup_natearth(crs) -> CompiledProj:
    """Natural Earth (PJ_natearth.c polynomial; Newton inverse)."""
    fr = _frame(crs)
    A0, A1, A2, A3, A4 = 0.8707, -0.131979, -0.013791, 0.003971, -0.001529
    B0, B1, B2, B3 = 1.007226, 0.015085, -0.044475, 0.028874
    B4 = -0.005916
    EPS, NITER = 1e-11, 100
    MAX_Y = 0.8707 * 0.52 * PI

    def fwd(lam, phi):
        phi2 = phi * phi
        phi4 = phi2 * phi2
        x = lam * (A0 + phi2 * (A1 + phi2 * (A2 + phi4 * phi2 * (A3 + phi2 * A4))))
        y = phi * (B0 + phi2 * (B1 + phi4 * (B2 + B3 * phi2 + B4 * phi4)))
        return x, y

    def inv(x, y):
        yc = np.clip(y, -MAX_Y, MAX_Y).astype(np.float64).copy()
        for _ in range(NITER):
            y2 = yc * yc
            y4 = y2 * y2
            f = yc * (B0 + y2 * (B1 + y4 * (B2 + B3 * y2 + B4 * y4))) - y
            fder = B0 + y2 * (3 * B1 + y4 * (7 * B2 + 9 * B3 * y2 + 11 * B4 * y4))
            dphi = f / fder
            yc = yc - dphi
            if np.all(np.abs(dphi) < EPS):
                break
        phi = yc
        y2 = phi * phi
        lam = x / (A0 + y2 * (A1 + y2 * (A2 + y2 * y2 * y2 * (A3 + y2 * A4))))
        return lam, phi

    return CompiledProj("natearth", fwd, inv, **fr)


@_register("robin")
def setup_robin(crs) -> CompiledProj:
    """Robinson (PJ_robin.c): 5-degree coefficient table + cubic
    interpolation (Snyder/NGS table, public)."""
    fr = _frame(crs)
    # (X0, X1, X2, X3) per 5-degree band — PJ_robin.c V(C,z) cubic
    X = np.array([
        [1.0, 2.2199e-17, -7.15515e-05, 3.1103e-06],
        [0.9986, -0.000482243, -2.4897e-05, -1.3309e-06],
        [0.9954, -0.00083103, -4.48605e-05, -9.86701e-07],
        [0.99, -0.00135364, -5.9661e-05, 3.6777e-06],
        [0.9822, -0.00167442, -4.49547e-06, -5.72411e-06],
        [0.973, -0.00214868, -9.03571e-05, 1.8736e-08],
        [0.96, -0.00305085, -9.00761e-05, 1.64917e-06],
        [0.9427, -0.00382792, -6.53386e-05, -2.6154e-06],
        [0.9216, -0.00467746, -0.00010457, 4.81243e-06],
        [0.8962, -0.00536223, -3.23831e-05, -5.43432e-06],
        [0.8679, -0.00609363, -0.000113898, 3.32484e-06],
        [0.835, -0.00698325, -6.40253e-05, 9.34959e-07],
        [0.7986, -0.00755338, -5.00009e-05, 9.35324e-07],
        [0.7597, -0.00798324, -3.5971e-05, -2.27626e-06],
        [0.7186, -0.00851367, -7.01149e-05, -8.6303e-06],
        [0.6732, -0.00986209, -0.000199569, 1.91974e-05],
        [0.6213, -0.010418, 8.83923e-05, 6.24051e-06],
        [0.5722, -0.00906601, 0.000182, 6.24051e-06],
        [0.5322, -0.00677797, 0.000275608, 6.24051e-06],
    ])
    Y = np.array([
        [-5.20417e-18, 0.0124, 1.21431e-18, -8.45284e-11],
        [0.062, 0.0124, -1.26793e-09, 4.22642e-10],
        [0.124, 0.0124, 5.07171e-09, -1.60604e-09],
        [0.186, 0.0123999, -1.90189e-08, 6.00152e-09],
        [0.248, 0.0124002, 7.10039e-08, -2.24e-08],
        [0.31, 0.0123992, -2.64997e-07, 8.35986e-08],
        [0.372, 0.0124029, 9.88983e-07, -3.11994e-07],
        [0.434, 0.0123893, -3.69093e-06, -4.35621e-07],
        [0.4958, 0.0123198, -1.02252e-05, -3.45523e-07],
        [0.5571, 0.0121916, -1.54081e-05, -5.82288e-07],
        [0.6176, 0.0119938, -2.41424e-05, -5.25327e-07],
        [0.6769, 0.011713, -3.20223e-05, -5.16405e-07],
        [0.7346, 0.0113541, -3.97684e-05, -6.09052e-07],
        [0.7903, 0.0109107, -4.89042e-05, -1.04739e-06],
        [0.8435, 0.0103431, -6.4615e-05, -1.40374e-09],
        [0.8936, 0.00969686, -6.4636e-05, -8.547e-06],
        [0.9394, 0.00840947, -0.000192841, -4.2106e-06],
        [0.9761, 0.00616527, -0.000256, -4.2106e-06],
        [1.0, 0.00328947, -0.000319159, -4.2106e-06],
    ])
    # the reference stores the coefficients as C `float` (PJ_robin.c
    # struct COEFS) — golden parity requires the same float32 rounding
    # before the double-precision cubic evaluation
    X = X.astype(np.float32).astype(np.float64)
    Y = Y.astype(np.float32).astype(np.float64)
    FXC = 0.8487
    FYC = 1.3523
    C1 = 11.45915590261646417544  # rad -> 5-degree index
    RC1 = 0.08726646259971647884
    NODES = 18
    ONEEPS = 1.000001

    def fwd(lam, phi):
        aphi = np.abs(phi)
        i = np.minimum((aphi * C1).astype(np.int64), NODES - 1)
        z = np.degrees(aphi - RC1 * i)  # degrees within the 5-deg band
        xc = X[i]
        yc = Y[i]
        vx = xc[:, 0] + z * (xc[:, 1] + z * (xc[:, 2] + z * xc[:, 3]))
        vy = yc[:, 0] + z * (yc[:, 1] + z * (yc[:, 2] + z * yc[:, 3]))
        x = FXC * vx * lam
        y = FYC * vy * np.where(phi < 0.0, -1.0, 1.0)
        return x, y

    def inv(x, y):
        lam = x / FXC
        aphi = np.abs(y / FYC)
        at_pole = aphi >= 1.0
        over = aphi > ONEEPS
        # locate band by Y0 (table monotone in first column)
        i = np.clip(np.searchsorted(Y[:, 0], aphi) - 1, 0, NODES - 1)
        # Newton on the cubic within the band (PJ_robin.c:90-105)
        yb = Y[i]
        t = 5.0 * (aphi - yb[:, 0]) / (Y[np.minimum(i + 1, NODES)][:, 0] - yb[:, 0])
        t = np.clip(t, -100.0, 100.0)
        for _ in range(20):
            f = yb[:, 0] + t * (yb[:, 1] + t * (yb[:, 2] + t * yb[:, 3])) - aphi
            fd = yb[:, 1] + t * (2.0 * yb[:, 2] + t * 3.0 * yb[:, 3])
            dt = f / fd
            t = t - dt
            if np.all(np.abs(dt) < 1e-10):
                break
        phi = np.radians(5.0 * i + t)
        phi = np.where(at_pole, HALFPI, phi)
        phi = np.where(y < 0.0, -phi, phi)
        xb = X[i]
        vx = xb[:, 0] + t * (xb[:, 1] + t * (xb[:, 2] + t * xb[:, 3]))
        lam = lam / np.where(at_pole, X[NODES][0], vx)
        return np.where(over, np.nan, lam), np.where(over, np.nan, phi)

    return CompiledProj("robin", fwd, inv, **fr)


# ------------------------------------------------------------- conformal
@_register("somerc")
def setup_somerc(crs) -> CompiledProj:
    """Swiss oblique Mercator (PJ_somerc.c via Gauss sphere)."""
    fr = _frame(crs)
    es, e = crs.es, crs.e
    phi0 = fr["phi0"]
    hlf_e = 0.5 * e
    cp = math.cos(phi0)
    cp *= cp
    c = math.sqrt(1.0 + es * cp * cp * crs.rone_es)
    sp = math.sin(phi0)
    cosp0 = math.cos(phip0 := math.asin(sinp0 := sp / c))
    sp *= e
    K = (
        math.log(math.tan(FORTPI + 0.5 * phip0))
        - c
        * (
            math.log(math.tan(FORTPI + 0.5 * phi0))
            - hlf_e * math.log((1.0 + sp) / (1.0 - sp))
        )
    )
    kR = fr["k0"] * math.sqrt(crs.one_es) / (1.0 - sp * sp)
    NITER, EPS = 6, 1e-10

    def fwd(lam, phi):
        sp_ = e * np.sin(phi)
        phip = 2.0 * np.arctan(
            np.exp(
                c * (np.log(np.tan(FORTPI + 0.5 * phi)) - hlf_e * np.log((1.0 + sp_) / (1.0 - sp_)))
                + K
            )
        ) - HALFPI
        lamp = c * lam
        cp_ = np.cos(phip)
        phipp = m.aasin(cosp0 * np.sin(phip) - sinp0 * cp_ * np.cos(lamp))
        lampp = m.aasin(cp_ * np.sin(lamp) / np.cos(phipp))
        x = kR * lampp
        y = kR * np.log(np.tan(FORTPI + 0.5 * phipp))
        return x, y

    def inv(x, y):
        phipp = 2.0 * (np.arctan(np.exp(y / kR)) - FORTPI)
        lampp = x / kR
        cp_ = np.cos(phipp)
        phip = m.aasin(cosp0 * np.sin(phipp) + sinp0 * cp_ * np.cos(lampp))
        lamp = m.aasin(cp_ * np.sin(lampp) / np.cos(phip))
        con = (K - np.log(np.tan(FORTPI + 0.5 * phip))) / c
        phi = phip.copy()
        for _ in range(NITER):
            esp = e * np.sin(phi)
            delp = (
                con + np.log(np.tan(FORTPI + 0.5 * phi)) - hlf_e * np.log((1.0 + esp) / (1.0 - esp))
            ) * (1.0 - esp * esp) * np.cos(phi) * crs.rone_es
            phi = phi - delp
            if np.all(np.abs(delp) < EPS):
                break
        lam = lamp / c
        return lam, phi

    return CompiledProj("somerc", fwd, inv, **fr)


@_register("gstmerc")
def setup_gstmerc(crs) -> CompiledProj:
    """Gauss-Schreiber transverse Mercator (PJ_gstmerc.c).

    Forward: gauss-sphere mapping of the isometric latitude
    (log tsfn(-phi)), x = n2*iso_sphere(phi1), y = YS + n2*lam1;
    inverse via phi2.  Our kernel works in a-units (the generic
    wrapper applies a), so n2 omits the reference's a factor.
    """
    fr = _frame(crs)
    es, e = crs.es, crs.e
    phi0, k0 = fr["phi0"], fr["k0"]
    sp0 = math.sin(phi0)
    n1 = math.sqrt(1.0 + es * math.cos(phi0) ** 4 / (1.0 - es))
    phic = math.asin(sp0 / n1)
    c = float(np.log(m.tsfn(-phic, -math.sin(phic), 0.0))) - n1 * float(
        np.log(m.tsfn(-phi0, -sp0, e))
    )
    n2 = k0 * math.sqrt(1.0 - es) / (1.0 - es * sp0 * sp0)
    XS = 0.0
    YS = -n2 * phic

    def fwd(lam, phi):
        L = n1 * lam
        Ls = c + n1 * np.log(m.tsfn(-phi, -np.sin(phi), e))
        lam1 = np.arctan(np.sinh(Ls) / np.cos(L))
        phi1 = m.aasin(np.sin(L) / np.cosh(Ls))
        LC = np.log(m.tsfn(-phi1, -np.sin(phi1), 0.0))
        x = XS + n2 * LC
        y = YS + n2 * lam1
        return x, y

    def inv(x, y):
        u = (x - XS) / n2   # sphere isometric coordinate
        v = (y - YS) / n2   # sphere gauss longitude angle
        L = np.arctan(np.sinh(u) / np.cos(v))
        sinC = np.sin(v) / np.cosh(u)
        LC = np.log(m.tsfn(-m.aasin(sinC), -sinC, 0.0))
        lam = L / n1
        phi = -m.phi2(np.exp((LC - c) / n1), e)
        return lam, phi

    return CompiledProj("gstmerc", fwd, inv, **fr)


# --------------------------------------------------------------- healpix
@_register("healpix")
def setup_healpix(crs) -> CompiledProj:
    """HEALPix (PJ_healpix.c).  Sphere exactly; ellipsoids map through
    the authalic latitude like the reference (PJ_healpix.c e_healpix
    uses qsfn/authlat)."""
    fr = _frame(crs)
    es, e = crs.es, crs.e
    one_es = crs.one_es
    if es:
        from .core import _authlat, _authset

        apa = _authset(es)
        qp = float(m.qsfn(1.0, e, one_es))
        # outputs scale by the authalic-sphere radius ratio sqrt(qp/2)
        # (golden: tv_out.dist "healpix ellipsoid" x(-90deg) = -1.56904
        # = -pi/2 * 0.99888 on +a=1 +ellps=WGS84)
        ra = math.sqrt(0.5 * qp)

        def fwd(lam, phi):
            bphi = m.aasin(np.clip(m.qsfn(np.sin(phi), e, one_es) / qp, -1.0, 1.0))
            x, y = healpix_sphere_fwd(lam, bphi)
            return x * ra, y * ra

        def inv(x, y):
            from .core import healpix_in_image

            xs = np.asarray(x, np.float64) / ra
            ys = np.asarray(y, np.float64) / ra
            ok = healpix_in_image(xs, ys)
            lam, bphi = healpix_sphere_inv(xs, ys)
            phi = _authlat(bphi, apa)
            return np.where(ok, lam, np.nan), np.where(ok, phi, np.nan)

    else:

        fwd = healpix_sphere_fwd

        def inv(x, y):
            from .core import healpix_in_image

            xs = np.asarray(x, np.float64)
            ys = np.asarray(y, np.float64)
            ok = healpix_in_image(xs, ys)
            lam, phi = healpix_sphere_inv(xs, ys)
            return np.where(ok, lam, np.nan), np.where(ok, phi, np.nan)

    return CompiledProj("healpix", fwd, inv, **fr)
