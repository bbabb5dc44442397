"""Extended kernel inventory, part 4: general oblique composition
(ob_tran), oblique cylindrical equal area (ocea), and the modified-
stereographic conformal family (alsk, gs48, gs50, lee_os, mil_os)
via complex polynomials.  References cite /root/reference/src/*.c.

Sphere-rotation convention (matching PJ_ob_tran.c o_forward /
o_inverse EXACTLY): with pole (lamp, phip), the rotation uses the
UNSHIFTED input longitude and adds lamp to the OUTPUT longitude —
phi' does not depend on lamp at all:
  lam' = adjlon(atan2(cos(phi) sin(lam),
                      sin(phip) cos(phi) cos(lam) + cos(phip) sin(phi)) + lamp)
  phi' = aasin(sin(phip) sin(phi) - cos(phip) cos(phi) cos(lam))
inverse (o_inverse — subtract lamp from lam' FIRST, t = lam' - lamp):
  phi = aasin(sin(phip) sin(phi') + cos(phip) cos(phi') cos(t))
  lam = atan2(cos(phi') sin(t), sin(phip) cos(phi') cos(t) - cos(phip) sin(phi'))
When |phip| <= 1e-10 the reference switches to the exact transverse
forms t_forward/t_inverse; we reproduce that by pinning
sin(phip)=0, cos(phip)=1, under which the general formulas reduce to
the transverse ones identically.
"""
from __future__ import annotations

import math

import numpy as np

from . import xmath as m
from .core import EPS10, CompiledProj, REGISTRY, _frame
from .extra3 import zpoly1, zpolyd1
from .xmath import FORTPI, HALFPI


def _register(*names):
    def deco(fn):
        for n in names:
            REGISTRY[n] = fn
        return fn

    return deco


_OB_TRAN_TOL = 1e-10  # PJ_ob_tran.c:13 TOL


def _sphere_rot(lamp: float, phip: float):
    """Build (rot_fwd, rot_inv) closures for the pole (lamp, phip),
    reproducing PJ_ob_tran.c o_forward/o_inverse (and, via the exact
    sphip=0/cphip=1 degeneration, t_forward/t_inverse)."""
    if abs(phip) <= _OB_TRAN_TOL:  # transverse branch, PJ_ob_tran.c:137-141
        sphip, cphip = 0.0, 1.0
    else:
        sphip, cphip = math.sin(phip), math.cos(phip)

    def rot_fwd(lam, phi):
        coslam = np.cos(lam)
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        lam2 = m.adjlon(
            np.arctan2(cosphi * np.sin(lam), sphip * cosphi * coslam + cphip * sinphi)
            + lamp
        )
        phi2 = m.aasin(np.clip(sphip * sinphi - cphip * cosphi * coslam, -1.0, 1.0))
        return lam2, phi2

    def rot_inv(lam2, phi2):
        t = lam2 - lamp
        cost = np.cos(t)
        sinp = np.sin(phi2)
        cosp = np.cos(phi2)
        phi = m.aasin(np.clip(sphip * sinp + cphip * cosp * cost, -1.0, 1.0))
        lam = np.arctan2(cosp * np.sin(t), sphip * cosp * cost - cphip * sinp)
        return lam, phi

    return rot_fwd, rot_inv


def _pole_from_params(p, phi0: float):
    """Pole spec shared by ob_tran (+o_*) and ocea: azimuth form or
    explicit pole or two-point form (PJ_ob_tran.c:82-130)."""
    def g(key, default=None):
        for k in (f"o_{key}", key, key.replace("_", "")):
            if k in p:
                return m.dms_param(p[k])
        if default is None:
            raise KeyError(key)
        return default

    if "o_alpha" in p or "alpha" in p:
        alpha = g("alpha")
        phic = g("lat_c", phi0)
        lamc = g("lon_c", 0.0)  # also matches +lonc via the key variants
        lamp = lamc + math.atan2(-math.cos(alpha), -math.sin(alpha) * math.sin(phic))
        phip = math.asin(math.cos(phic) * math.sin(alpha))
    elif "o_lat_p" in p:
        phip = g("lat_p")
        lamp = g("lon_p", 0.0)
    else:
        phi1 = g("lat_1")
        lam1 = g("lon_1")
        phi2 = g("lat_2")
        lam2 = g("lon_2")
        con = abs(phi1)
        if abs(phi1 - phi2) < EPS10 or con < EPS10 or abs(con - HALFPI) < EPS10:
            raise ValueError("oblique pole: bad two-point spec")
        lamp = math.atan2(
            math.cos(phi1) * math.sin(phi2) * math.cos(lam1)
            - math.sin(phi1) * math.cos(phi2) * math.cos(lam2),
            math.sin(phi1) * math.cos(phi2) * math.sin(lam2)
            - math.cos(phi1) * math.sin(phi2) * math.sin(lam1),
        )
        phip = math.atan(-math.cos(lamp - lam1) / math.tan(phi1))
    return lamp, phip


# ---------------------------------------------------------------- ob_tran
@_register("ob_tran")
def setup_ob_tran(crs) -> CompiledProj:
    """General oblique transformation (ref src/PJ_ob_tran.c): rotate
    the sphere so a chosen pole becomes the frame pole, then apply ANY
    other kernel (+o_proj=...).  The kernel COMPOSITION mechanism —
    in Spark the rotation fuses into the same numpy pipeline (still
    one Arrow crossing)."""
    from ..crs import CRS
    from .core import compile_proj

    p = crs.params
    o_proj = str(p.get("o_proj", ""))
    if not o_proj:
        raise ValueError("ob_tran: +o_proj required")
    sub_parts = [f"+proj={o_proj}"]
    # pass through sub-projection params given as +o_<param>= (other
    # than the pole/rotation specs)
    skip = {
        "o_proj", "o_lat_p", "o_lon_p", "o_alpha", "o_lon_c", "o_lat_c",
        "o_lon_1", "o_lat_1", "o_lon_2", "o_lat_2",
    }
    for k, v in p.items():
        if k.startswith("o_") and k not in skip:
            sub_parts.append(f"+{k[2:]}={v}")
    sub_parts.append(f"+R={crs.a!r}")  # rotation is spherical (like the ref)
    link = compile_proj(CRS.from_proj4(" ".join(sub_parts)))

    lamp, phip = _pole_from_params(p, crs.phi0)
    rot_fwd, rot_inv = _sphere_rot(lamp, phip)
    fr = _frame(crs)

    def fwd(lam, phi):
        l2, p2 = rot_fwd(lam, phi)
        return link.fwd(l2, p2)

    inv = None
    if link.inv is not None:

        def inv(x, y):  # noqa: F811
            l2, p2 = link.inv(x, y)
            # the general rotation inverse is valid for every pole
            # placement (oblique, transverse, polar)
            return rot_inv(l2, p2)

    return CompiledProj("ob_tran", fwd, inv, **fr)


# ------------------------------------------------------------------- ocea
@_register("ocea")
def setup_ocea(crs) -> CompiledProj:
    """Oblique cylindrical equal area — mirrors src/PJ_ocea.c exactly,
    including its quirks: the alpha branch evaluates
    ``atan(-cos(alpha) / (-sin(phi_0) * sin(alpha))) + lonc`` with
    phi_0 pinned to 0 (lat_0 is never read, PJ_ocea.c:40), the frame
    lam0 is overridden to singam + pi/2 (PJ_ocea.c:61), and the kernel
    output carries the reference's rok=a/k0 / rtk=a*k0 factors (which
    the generic pj_fwd wrapper then multiplies by a again, exactly as
    the reference does)."""
    fr = _frame(crs)
    a, k0 = crs.a, fr["k0"]
    rok = a / k0
    rtk = a * k0
    p = crs.params
    if "alpha" in p:
        alpha = m.dms_param(p["alpha"])
        lonz = m.dms_param(p.get("lonc", 0.0))
        phi_0 = 0.0  # the reference never reads lat_0 here
        # IEEE atan(x/±0) -> ±pi/2, like the C code
        with np.errstate(divide="ignore"):
            singam = float(
                np.arctan(
                    np.float64(-math.cos(alpha))
                    / (np.float64(-math.sin(phi_0)) * np.float64(math.sin(alpha)))
                )
            ) + lonz
        pole = math.asin(math.cos(phi_0) * math.sin(alpha))
    else:
        phi1 = m.dms_param(p["lat_1"])
        phi2 = m.dms_param(p["lat_2"])
        lam1 = m.dms_param(p["lon_1"])
        lam2 = m.dms_param(p["lon_2"])
        singam = math.atan2(
            math.cos(phi1) * math.sin(phi2) * math.cos(lam1)
            - math.sin(phi1) * math.cos(phi2) * math.cos(lam2),
            math.sin(phi1) * math.cos(phi2) * math.sin(lam2)
            - math.cos(phi1) * math.sin(phi2) * math.sin(lam1),
        )
        pole = math.atan(-math.cos(singam - lam1) / math.tan(phi1))
    fr["lam0"] = singam + HALFPI  # PJ_ocea.c:61 overrides lam0
    sinphi_p, cosphi_p = math.sin(pole), math.cos(pole)

    def fwd(lam, phi):
        sinlam = np.sin(lam)
        t = np.cos(lam)
        with np.errstate(divide="ignore", invalid="ignore"):
            x = np.arctan((np.tan(phi) * cosphi_p + sinphi_p * sinlam) / t)
        x = np.where(t < 0.0, x + np.pi, x) * rtk
        y = rok * (sinphi_p * np.sin(phi) - cosphi_p * np.cos(phi) * sinlam)
        return x, y

    def inv(x, y):
        ys = np.asarray(y, np.float64) / rok
        xs = np.asarray(x, np.float64) / rtk
        with np.errstate(invalid="ignore"):
            t = np.sqrt(1.0 - ys * ys)
        s = np.sin(xs)
        phi = m.aasin(np.clip(ys * sinphi_p + t * cosphi_p * s, -1.0, 1.0))
        lam = np.arctan2(t * sinphi_p * s - ys * cosphi_p, t * np.cos(xs))
        return lam, phi

    return CompiledProj("ocea", fwd, inv, **fr)


# ---------------------------------------------------- modified stereographic
_MOD_STER_TABLES = {
    # proj id -> (lam0 deg, phi0 deg, ellipsoid coeffs | None, sphere coeffs)
    # Coefficient tables transcribed from PJ_mod_ster.c ENTRY blocks
    # (public constants, verified against the C source by
    # tests/test_coefficient_transcription.py); P(z) = sum AB[k] z^(k+1)
    # via pj_zpoly1.  alsk/gs50 carry BOTH the fixed-ellipsoid (ABe) and
    # sphere (ABs) fits, selected on es exactly like the reference; the
    # matching a/es overrides live in crs.py (ENTRY-order parity).
    # NOTE: gs48 phi0 is -39 in the reference (PJ_mod_ster.c:138) — kept
    # verbatim for parity even though +39 looks geographically natural.
    "mil_os": (20.0, 18.0, None, [0.924500 + 0j, 0.0 + 0j, 0.019430 + 0j]),
    "lee_os": (-165.0, -10.0, None, [0.721316 + 0j, 0.0 + 0j, -0.0088162 - 0.00617325j]),
    "gs48": (-96.0, -39.0, None, [0.98879 + 0j, 0.0 + 0j, -0.050909 + 0j, 0.0 + 0j, 0.075528 + 0j]),
    "alsk": (
        -152.0, 64.0,
        [  # ABe (fixed ellipsoid a=6378206.4 es=.00676866)
            0.9945303 + 0j,
            0.0052083 - 0.0027404j,
            0.0072721 + 0.0048181j,
            -0.0151089 - 0.1932526j,
            0.0642675 - 0.1381226j,
            0.3582802 - 0.2884586j,
        ],
        [  # ABs (sphere a=6370997)
            0.9972523 + 0j,
            0.0052513 - 0.0041175j,
            0.0074606 + 0.0048125j,
            -0.0153783 - 0.1968253j,
            0.0636871 - 0.1408027j,
            0.3660976 - 0.2937382j,
        ],
    ),
    "gs50": (
        -120.0, 45.0,
        [  # ABe
            0.9827497 + 0j,
            0.0210669 + 0.0053804j,
            -0.1031415 - 0.0571664j,
            -0.0323337 - 0.0322847j,
            0.0502303 + 0.1211983j,
            0.0251805 + 0.0895678j,
            -0.0012315 - 0.1416121j,
            0.0072202 - 0.1317091j,
            -0.0194029 + 0.0759677j,
            -0.0210072 + 0.0834037j,
        ],
        [  # ABs
            0.9842990 + 0j,
            0.0211642 + 0.0037608j,
            -0.1036018 - 0.0575102j,
            -0.0329095 - 0.0320119j,
            0.0499471 + 0.1223335j,
            0.0260460 + 0.0899805j,
            0.0007388 - 0.1435792j,
            0.0075848 - 0.1334108j,
            -0.0216473 + 0.0776645j,
            -0.0225161 + 0.0853673j,
        ],
    ),
}


@_register("alsk", "gs48", "gs50", "lee_os", "mil_os")
def setup_mod_ster(crs) -> CompiledProj:
    """Modified stereographic conformal family (ref src/PJ_mod_ster.c):
    oblique stereographic base (conformal latitude on ellipsoids)
    warped by a complex polynomial; Newton inverse via zpolyd1."""
    name = crs.proj
    lam0_deg, phi0_deg, ab_ell, ab_sph = _MOD_STER_TABLES[name]
    fr = _frame(crs)
    fr["lam0"] = lam0_deg * 0.0174532925199433
    phi0 = phi0_deg * 0.0174532925199433
    fr["phi0"] = phi0
    # crs.py already applied the ENTRY a/es overrides: es is 0 for the
    # sphere family / sphere variant, .00676866 for alsk/gs50 ellipsoid
    es = crs.es
    ab = ab_ell if (es and ab_ell is not None) else ab_sph
    e = math.sqrt(es)

    def _conf_lat(phi):
        if not es:
            return np.asarray(phi, np.float64)
        sp = np.sin(phi)
        return (
            2.0
            * np.arctan(
                np.tan(FORTPI + 0.5 * phi)
                * np.power((1.0 - e * sp) / (1.0 + e * sp), 0.5 * e)
            )
            - HALFPI
        )

    def _inv_conf_lat(chi):
        if not es:
            return chi
        # tan(pi/4 + chi/2) = exp(psi); phi2 takes ts = exp(-psi)
        return m.phi2(1.0 / np.tan(FORTPI + 0.5 * chi), e)

    chi0 = float(_conf_lat(np.array([phi0]))[0])
    schi0, cchi0 = math.sin(chi0), math.cos(chi0)

    def fwd(lam, phi):
        chi = _conf_lat(phi)
        schi, cchi = np.sin(chi), np.cos(chi)
        coslam = np.cos(lam)
        denom = 1.0 + schi0 * schi + cchi0 * cchi * coslam
        with np.errstate(divide="ignore", invalid="ignore"):
            xp = 2.0 * cchi * np.sin(lam) / denom
            yp = 2.0 * (cchi0 * schi - schi0 * cchi * coslam) / denom
        w = zpoly1(xp + 1j * yp, ab)
        return np.real(w), np.imag(w)

    def inv(x, y):
        z = np.asarray(x, np.float64) + 1j * np.asarray(y, np.float64)
        w = z.copy()
        for _ in range(30):
            f, der = zpolyd1(w, ab)
            dw = (f - z) / der
            w = w - dw
            if np.all(np.abs(dw) < 1e-14):
                break
        xp = np.real(w)
        yp = np.imag(w)
        rho = np.hypot(xp, yp)
        c = 2.0 * np.arctan(rho * 0.5)
        sinc, cosc = np.sin(c), np.cos(c)
        with np.errstate(divide="ignore", invalid="ignore"):
            chi = np.where(
                rho < 1e-12,
                chi0,
                m.aasin(
                    np.clip(
                        cosc * schi0
                        + yp * sinc * cchi0 / np.where(rho == 0.0, 1.0, rho),
                        -1.0,
                        1.0,
                    )
                ),
            )
            lam = np.arctan2(xp * sinc, rho * cchi0 * cosc - yp * schi0 * sinc)
        phi = _inv_conf_lat(chi)
        return lam, phi

    return CompiledProj(name, fwd, inv, **fr)
