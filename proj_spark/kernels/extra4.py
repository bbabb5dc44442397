"""Extended kernel inventory, part 4: general oblique composition
(ob_tran), oblique cylindrical equal area (ocea), and the modified-
stereographic conformal family (alsk, gs48, gs50, lee_os, mil_os)
via complex polynomials.  References cite /root/reference/src/*.c.

Sphere-rotation convention (shared by ob_tran and ocea, matching
PJ_ob_tran.c o_forward): with pole (lamp, phip),
  lam' = atan2(cos(phi) sin(t), sin(phip) cos(phi) cos(t) + cos(phip) sin(phi))
  sin(phi') = sin(phip) sin(phi) - cos(phip) cos(phi) cos(t),  t = lam - lamp
and the exact inverse (derived from the basis vectors):
  lam = lamp + atan2(cos(phi') sin(lam'),
                     sin(phip) cos(phi') cos(lam') - cos(phip) sin(phi'))
  phi = asin(cos(phip) cos(phi') cos(lam') + sin(phip) sin(phi'))
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


def _sphere_rot(lamp: float, phip: float):
    """Build (rot_fwd, rot_inv) closures for the pole (lamp, phip)."""
    sphip, cphip = math.sin(phip), math.cos(phip)

    def rot_fwd(lam, phi):
        t = lam - lamp
        cost = np.cos(t)
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        lam2 = np.arctan2(cosphi * np.sin(t), sphip * cosphi * cost + cphip * sinphi)
        phi2 = m.aasin(np.clip(sphip * sinphi - cphip * cosphi * cost, -1.0, 1.0))
        return lam2, phi2

    def rot_inv(lam2, phi2):
        cosl = np.cos(lam2)
        sinp = np.sin(phi2)
        cosp = np.cos(phi2)
        lam = m.adjlon(
            lamp + np.arctan2(cosp * np.sin(lam2), sphip * cosp * cosl - cphip * sinp)
        )
        phi = m.aasin(np.clip(cphip * cosp * cosl + sphip * sinp, -1.0, 1.0))
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
    """Oblique cylindrical equal area (ref src/PJ_ocea.c), sphere:
    normal-aspect CEA in the rotated frame (x = lam'/k0, y = k0
    sin(phi') — Jacobian cos(phi'), equal-area)."""
    fr = _frame(crs)
    k0 = fr["k0"]
    lamp, phip = _pole_from_params(crs.params, fr["phi0"])
    rot_fwd, rot_inv = _sphere_rot(lamp, phip)

    def fwd(lam, phi):
        l2, p2 = rot_fwd(lam, phi)
        return l2 / k0, k0 * np.sin(p2)

    def inv(x, y):
        l2 = np.asarray(x, np.float64) * k0
        p2 = m.aasin(np.clip(np.asarray(y, np.float64) / k0, -1.0, 1.0))
        return rot_inv(l2, p2)

    return CompiledProj("ocea", fwd, inv, **fr)


# ---------------------------------------------------- modified stereographic
_MOD_STER_TABLES = {
    # proj id -> (use ellipsoid, lam0 deg, phi0 deg, complex coefficients)
    # Coefficient tables transcribed from PJ_mod_ster.c ENTRY blocks
    # (public constants); P(z) = sum AB[k] z^(k+1) via pj_zpoly1.
    "mil_os": (False, 20.0, 18.0, [0.924500 + 0j, 0.0 + 0j, 0.019430 + 0j]),
    "lee_os": (False, -165.0, -10.0, [0.721316 + 0j, 0.0 + 0j, -0.0088162 - 0.00617325j]),
    "gs48": (False, -96.0, 39.0, [0.98879 + 0j, 0.0 + 0j, -0.050909 + 0j, 0.0 + 0j, 0.075528 + 0j]),
    "alsk": (
        True, -152.0, 64.0,
        [
            0.9945303 + 0j,
            0.0052083 - 0.0027404j,
            0.0072721 + 0.0048181j,
            -0.0151089 - 0.1932526j,
            0.0642675 - 0.1381226j,
            0.3582802 - 0.2884586j,
        ],
    ),
    "gs50": (
        True, -120.0, 45.0,
        [
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
    ),
}


@_register("alsk", "gs48", "gs50", "lee_os", "mil_os")
def setup_mod_ster(crs) -> CompiledProj:
    """Modified stereographic conformal family (ref src/PJ_mod_ster.c):
    oblique stereographic base (conformal latitude on ellipsoids)
    warped by a complex polynomial; Newton inverse via zpolyd1."""
    name = crs.proj
    use_ell, lam0_deg, phi0_deg, ab = _MOD_STER_TABLES[name]
    fr = _frame(crs)
    fr["lam0"] = lam0_deg * 0.0174532925199433
    phi0 = phi0_deg * 0.0174532925199433
    fr["phi0"] = phi0
    es = crs.es if use_ell else 0.0
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
