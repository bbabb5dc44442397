"""Extended kernel inventory, part 8: Quadrilateralized Spherical
Cube (qsc — the cube-face decomposition underlying S2) and the
Landsat space-oblique Mercator (lsat).  Transcribed from
/root/reference/src/PJ_qsc.c and PJ_lsat.c into masked numpy.
"""
from __future__ import annotations

import math

import numpy as np

from . import xmath as m
from .core import CompiledProj, REGISTRY, _frame
from .xmath import DEG_TO_RAD, FORTPI, HALFPI, PI, TWOPI


def _register(*names):
    def deco(fn):
        for n in names:
            REGISTRY[n] = fn
        return fn

    return deco


EPS10 = 1e-10
FRONT, RIGHT, BACK, LEFT, TOP, BOTTOM = range(6)


def _shift_lon(lon, offset):
    s = lon + offset
    s = np.where(s < -PI, s + TWOPI, s)
    s = np.where(s > PI, s - TWOPI, s)
    return s


@_register("qsc")
def setup_qsc(crs) -> CompiledProj:
    """Quadrilateralized Spherical Cube (ref src/PJ_qsc.c, O'Neill &
    Laubscher 1976): the S2 cube-face layout; +lat_0/+lon_0 select
    the face; ellipsoids via the geocentric-latitude shift [LK12]."""
    fr = _frame(crs)
    es = crs.es
    phi0, lam0 = fr["phi0"], fr["lam0"]
    if phi0 >= HALFPI - FORTPI / 2.0:
        face = TOP
    elif phi0 <= -(HALFPI - FORTPI / 2.0):
        face = BOTTOM
    elif abs(lam0) <= FORTPI:
        face = FRONT
    elif abs(lam0) <= HALFPI + FORTPI:
        face = RIGHT if lam0 > 0.0 else LEFT
    else:
        face = BACK
    if es:
        b_n = math.sqrt(1.0 - es)  # normalized (a = 1)
        one_minus_f = b_n
        one_minus_f_squared = 1.0 - es

    def _equat_theta(phi, y, x):
        """qsc_fwd_equat_face_theta (PJ_qsc.c:69-91), vectorized.
        Returns (theta, area)."""
        theta = np.arctan2(y, x)
        area = np.select(
            [
                np.abs(theta) <= FORTPI,
                (theta > FORTPI) & (theta <= HALFPI + FORTPI),
                (theta > HALFPI + FORTPI) | (theta <= -(HALFPI + FORTPI)),
            ],
            [0, 1, 2],
            default=3,
        )
        theta = np.select(
            [area == 1, area == 2, area == 3],
            [
                theta - HALFPI,
                np.where(theta >= 0.0, theta - PI, theta + PI),
                theta + HALFPI,
            ],
            default=theta,
        )
        small = phi < EPS10
        return np.where(small, 0.0, theta), np.where(small, 0, area)

    def fwd(lam, phi_in):
        lam = np.asarray(lam, np.float64)
        phi_in = np.asarray(phi_in, np.float64)
        lat = np.arctan(one_minus_f_squared * np.tan(phi_in)) if es else phi_in
        lon = lam
        if face not in (TOP, BOTTOM):
            if face == RIGHT:
                lon = _shift_lon(lon, HALFPI)
            elif face == BACK:
                lon = _shift_lon(lon, PI)
            elif face == LEFT:
                lon = _shift_lon(lon, -HALFPI)
            sinlat, coslat = np.sin(lat), np.cos(lat)
            sinlon, coslon = np.sin(lon), np.cos(lon)
            q = coslat * coslon
            r = coslat * sinlon
            s = sinlat
        if face == FRONT:
            phi = np.arccos(np.clip(q, -1, 1))
            theta, area = _equat_theta(phi, s, r)
        elif face == RIGHT:
            phi = np.arccos(np.clip(r, -1, 1))
            theta, area = _equat_theta(phi, s, -q)
        elif face == BACK:
            phi = np.arccos(np.clip(-q, -1, 1))
            theta, area = _equat_theta(phi, s, -r)
        elif face == LEFT:
            phi = np.arccos(np.clip(-r, -1, 1))
            theta, area = _equat_theta(phi, s, q)
        elif face == TOP:
            phi = HALFPI - lat
            c0 = (lon >= FORTPI) & (lon <= HALFPI + FORTPI)
            c1 = (lon > HALFPI + FORTPI) | (lon <= -(HALFPI + FORTPI))
            c2 = (lon > -(HALFPI + FORTPI)) & (lon <= -FORTPI)
            area = np.select([c0, c1, c2], [0, 1, 2], default=3)
            theta = np.select(
                [c0, c1, c2],
                [lon - HALFPI, np.where(lon > 0.0, lon - PI, lon + PI), lon + HALFPI],
                default=lon,
            )
        else:  # BOTTOM
            phi = HALFPI + lat
            c0 = (lon >= FORTPI) & (lon <= HALFPI + FORTPI)
            c1 = (lon < FORTPI) & (lon >= -FORTPI)
            c2 = (lon < -FORTPI) & (lon >= -(HALFPI + FORTPI))
            area = np.select([c0, c1, c2], [0, 1, 2], default=3)
            theta = np.select(
                [c0, c1, c2],
                [-lon + HALFPI, -lon, -lon - HALFPI],
                default=np.where(lon > 0.0, -lon + PI, -lon - PI),
            )

        # mu (OL76 Eq. 3-21) and the radial factor t (Eq. 3-38)
        mu = np.arctan(
            (12.0 / PI) * (theta + np.arccos(np.clip(np.sin(theta) * np.cos(FORTPI), -1, 1)) - HALFPI)
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.sqrt(
                np.maximum(
                    (1.0 - np.cos(phi))
                    / (np.cos(mu) * np.cos(mu))
                    / (1.0 - np.cos(np.arctan(1.0 / np.cos(theta)))),
                    0.0,
                )
            )
        mu = mu + np.select(
            [area == 1, area == 2, area == 3], [HALFPI, PI, HALFPI + PI], default=0.0
        )
        return t * np.cos(mu), t * np.sin(mu)

    def inv(x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        nu = np.arctan(np.hypot(x, y))
        mu = np.arctan2(y, x)
        c0 = (x >= 0.0) & (x >= np.abs(y))
        c1 = (y >= 0.0) & (y >= np.abs(x))
        c2 = (x < 0.0) & (-x >= np.abs(y))
        area = np.select([c0, c1, c2], [0, 1, 2], default=3)
        mu = np.select(
            [c1, c2, ~(c0 | c1 | c2)],
            [mu - HALFPI, np.where(mu < 0.0, mu + PI, mu - PI), mu + HALFPI],
            default=mu,
        )
        t = (PI / 12.0) * np.tan(mu)
        tantheta = np.sin(t) / (np.cos(t) - 1.0 / math.sqrt(2.0))
        theta = np.arctan(tantheta)
        cosmu = np.cos(mu)
        tannu = np.tan(nu)
        cosphi = 1.0 - cosmu * cosmu * tannu * tannu * (
            1.0 - np.cos(np.arctan(1.0 / np.cos(theta)))
        )
        cosphi = np.clip(cosphi, -1.0, 1.0)

        if face == TOP:
            phi = np.arccos(cosphi)
            out_phi = HALFPI - phi
            out_lam = np.select(
                [area == 0, area == 1, area == 2],
                [
                    theta + HALFPI,
                    np.where(theta < 0.0, theta + PI, theta - PI),
                    theta - HALFPI,
                ],
                default=theta,
            )
        elif face == BOTTOM:
            phi = np.arccos(cosphi)
            out_phi = phi - HALFPI
            out_lam = np.select(
                [area == 0, area == 1, area == 2],
                [-theta + HALFPI, -theta, -theta - HALFPI],
                default=np.where(theta < 0.0, -theta - PI, -theta + PI),
            )
        else:
            q = cosphi
            t2 = q * q
            s = np.where(t2 >= 1.0, 0.0, np.sqrt(np.maximum(1.0 - t2, 0.0)) * np.sin(theta))
            t2 = t2 + s * s
            r = np.where(t2 >= 1.0, 0.0, np.sqrt(np.maximum(1.0 - t2, 0.0)))
            # rotate into the correct area
            r, s = (
                np.select([area == 1, area == 2, area == 3], [-s, -r, s], default=r),
                np.select([area == 1, area == 2, area == 3], [r, -s, -r], default=s),
            )
            # rotate into the correct face
            if face == RIGHT:
                q, r = -r, q
            elif face == BACK:
                q, r = -q, -r
            elif face == LEFT:
                q, r = r, -q
            out_phi = np.arccos(np.clip(-s, -1, 1)) - HALFPI
            out_lam = np.arctan2(r, q)
            if face == RIGHT:
                out_lam = _shift_lon(out_lam, -HALFPI)
            elif face == BACK:
                out_lam = _shift_lon(out_lam, -PI)
            elif face == LEFT:
                out_lam = _shift_lon(out_lam, HALFPI)

        if es:
            invert = out_phi < 0.0
            tanphi = np.tan(out_phi)
            with np.errstate(divide="ignore", invalid="ignore"):
                xa = b_n / np.sqrt(tanphi * tanphi + one_minus_f_squared)
                out_phi2 = np.arctan(
                    np.sqrt(np.maximum(1.0 - xa * xa, 0.0)) / (one_minus_f * xa)
                )
            out_phi = np.where(invert, -out_phi2, out_phi2)
        return out_lam, out_phi

    return CompiledProj("qsc", fwd, inv, **fr)


# ------------------------------------------------------------------- lsat
@_register("lsat")
def setup_lsat(crs) -> CompiledProj:
    """Space oblique Mercator for LANDSAT (ref src/PJ_lsat.c, Snyder &
    Linck): Fourier-fit orbital series (seraz0 quadrature at setup),
    per-lane iterative forward/inverse."""
    fr = _frame(crs)
    es = crs.es
    one_es = crs.one_es
    rone_es = crs.rone_es
    p = crs.params
    TOL = 1e-7
    PI_HALFPI = 4.71238898038468985766
    TWOPI_HALFPI = 7.85398163397448309610
    land = int(p.get("lsat", 0))
    if not (1 <= land <= 5):
        raise ValueError("lsat: +lsat must be in 1..5")
    path = int(p.get("path", 0))
    if not (1 <= path <= (251 if land <= 3 else 233)):
        raise ValueError("lsat: bad +path")
    if land <= 3:
        fr["lam0"] = DEG_TO_RAD * 128.87 - TWOPI / 251.0 * path
        p22 = 103.2669323
        alf = DEG_TO_RAD * 99.092
    else:
        fr["lam0"] = DEG_TO_RAD * 129.3 - TWOPI / 233.0 * path
        p22 = 98.8841202
        alf = DEG_TO_RAD * 98.2
    p22 /= 1440.0
    sa = math.sin(alf)
    ca = math.cos(alf)
    if abs(ca) < 1e-9:
        ca = 1e-9
    esc = es * ca * ca
    ess = es * sa * sa
    w = (1.0 - esc) * rone_es
    w = w * w - 1.0
    q = ess * rone_es
    t_ = ess * (2.0 - es) * rone_es * rone_es
    u_ = esc * rone_es
    xj = one_es * one_es * one_es
    rlm = PI * (1.0 / 248.0 + 0.5161290322580645)
    rlm2 = rlm + TWOPI

    st = {"a2": 0.0, "a4": 0.0, "b": 0.0, "c1": 0.0, "c3": 0.0}

    def seraz0(lam_deg, mult):
        lam = lam_deg * DEG_TO_RAD
        sd = math.sin(lam)
        sdsq = sd * sd
        s = p22 * sa * math.cos(lam) * math.sqrt(
            (1.0 + t_ * sdsq) / ((1.0 + w * sdsq) * (1.0 + q * sdsq))
        )
        d1 = 1.0 + q * sdsq
        h = math.sqrt((1.0 + q * sdsq) / (1.0 + w * sdsq)) * (
            (1.0 + w * sdsq) / (d1 * d1) - p22 * ca
        )
        sq = math.sqrt(xj * xj + s * s)
        fc = mult * (h * xj - s * s) / sq
        st["b"] += fc
        st["a2"] += fc * math.cos(lam + lam)
        st["a4"] += fc * math.cos(lam * 4.0)
        fc = mult * s * (h + xj) / sq
        st["c1"] += fc * math.cos(lam)
        st["c3"] += fc * math.cos(lam * 3.0)

    seraz0(0.0, 1.0)
    lamx = 9.0
    while lamx <= 81.0001:
        seraz0(lamx, 4.0)
        lamx += 18.0
    lamx = 18.0
    while lamx <= 72.0001:
        seraz0(lamx, 2.0)
        lamx += 18.0
    seraz0(90.0, 1.0)
    a2 = st["a2"] / 30.0
    a4 = st["a4"] / 60.0
    b_ = st["b"] / 30.0
    c1 = st["c1"] / 15.0
    c3 = st["c3"] / 45.0

    def fwd(lam, phi):
        lam = np.asarray(lam, np.float64)
        phi = np.clip(np.asarray(phi, np.float64), -HALFPI, HALFPI)
        lampp = np.where(phi >= 0.0, HALFPI, PI_HALFPI)
        tanphi = np.tan(phi)
        lamdp = np.zeros_like(lam)
        lamt = np.zeros_like(lam)
        active_outer = np.ones(lam.shape, bool)
        for nn in range(3):
            sav = lampp.copy()
            lamtp = lam + p22 * lampp
            cl = np.cos(lamtp)
            lamtp = np.where(np.abs(cl) < TOL, lamtp - TOL, lamtp)
            fac = lampp - np.sin(lampp) * np.where(cl < 0.0, -HALFPI, HALFPI)
            for _ in range(50):
                lamt_i = lam + p22 * sav
                c = np.cos(lamt_i)
                lamt_i = np.where(np.abs(c) < TOL, lamt_i - TOL, lamt_i)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xlam = (one_es * tanphi * sa + np.sin(lamt_i) * ca) / c
                lamdp_i = np.arctan(xlam) + fac
                conv = np.abs(np.abs(sav) - np.abs(lamdp_i)) < TOL
                sav = lamdp_i
                if conv.all():
                    break
            upd = active_outer
            lamdp = np.where(upd, lamdp_i, lamdp)
            lamt = np.where(upd, lamt_i, lamt)
            inside = (lamdp > rlm) & (lamdp < rlm2)
            active_outer = active_outer & ~inside
            if not active_outer.any():
                break
            lampp = np.where(
                active_outer & (lamdp <= rlm),
                TWOPI_HALFPI,
                np.where(active_outer & (lamdp >= rlm2), HALFPI, lampp),
            )
        sp = np.sin(phi)
        phidp = m.aasin(
            np.clip(
                (one_es * ca * sp - sa * np.cos(phi) * np.sin(lamt))
                / np.sqrt(1.0 - es * sp * sp),
                -1.0,
                1.0,
            )
        )
        tanph = np.log(np.tan(FORTPI + 0.5 * phidp))
        sd = np.sin(lamdp)
        sdsq = sd * sd
        s = p22 * sa * np.cos(lamdp) * np.sqrt(
            (1.0 + t_ * sdsq) / ((1.0 + w * sdsq) * (1.0 + q * sdsq))
        )
        d = np.sqrt(xj * xj + s * s)
        x = b_ * lamdp + a2 * np.sin(2.0 * lamdp) + a4 * np.sin(lamdp * 4.0) - tanph * s / d
        y = c1 * sd + c3 * np.sin(lamdp * 3.0) + tanph * xj / d
        return x, y

    def inv(x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        lamdp = x / b_
        s = np.zeros_like(x)
        for _ in range(50):
            sav = lamdp
            sd = np.sin(lamdp)
            sdsq = sd * sd
            s = p22 * sa * np.cos(lamdp) * np.sqrt(
                (1.0 + t_ * sdsq) / ((1.0 + w * sdsq) * (1.0 + q * sdsq))
            )
            lamdp = (
                x
                + y * s / xj
                - a2 * np.sin(2.0 * lamdp)
                - a4 * np.sin(lamdp * 4.0)
                - s / xj * (c1 * np.sin(lamdp) + c3 * np.sin(lamdp * 3.0))
            )
            lamdp = lamdp / b_
            if np.all(np.abs(lamdp - sav) < TOL):
                break
        sl = np.sin(lamdp)
        fac = np.exp(np.sqrt(1.0 + s * s / (xj * xj)) * (y - c1 * sl - c3 * np.sin(lamdp * 3.0)))
        phidp = 2.0 * (np.arctan(fac) - FORTPI)
        dd = sl * sl
        lamdp = np.where(np.abs(np.cos(lamdp)) < TOL, lamdp - TOL, lamdp)
        spp = np.sin(phidp)
        sppsq = spp * spp
        with np.errstate(divide="ignore", invalid="ignore"):
            lamt = np.arctan(
                (
                    (1.0 - sppsq * rone_es) * np.tan(lamdp) * ca
                    - spp
                    * sa
                    * np.sqrt(np.maximum((1.0 + q * dd) * (1.0 - sppsq) - sppsq * u_, 0.0))
                    / np.cos(lamdp)
                )
                / (1.0 - sppsq * (1.0 + u_))
            )
        sl_sign = np.where(lamt >= 0.0, 1.0, -1.0)
        scl = np.where(np.cos(lamdp) >= 0.0, 1.0, -1.0)
        lamt = lamt - HALFPI * (1.0 - scl) * sl_sign
        lam = lamt - p22 * lamdp
        if abs(sa) < TOL:
            phi = m.aasin(
                np.clip(spp / np.sqrt(one_es * one_es + es * sppsq), -1.0, 1.0)
            )
        else:
            phi = np.arctan(
                (np.tan(lamdp) * np.cos(lamt) - ca * np.sin(lamt)) / (one_es * sa)
            )
        return lam, phi

    return CompiledProj("lsat", fwd, inv, **fr)


# --------------------------------------------------------------- rhealpix
@_register("rhealpix")
def setup_rhealpix(crs) -> CompiledProj:
    """rHEALPix (ref src/PJ_healpix.c get_cap/combine_caps): HEALPix
    with the four polar-cap triangles rotated and translated into one
    north and one south polar square (+north_square/+south_square in
    0..3)."""
    from .core import healpix_sphere_fwd, healpix_sphere_inv
    from .extra2 import setup_healpix

    fr = _frame(crs)
    ns = int(crs.params.get("north_square", 0))
    ss = int(crs.params.get("south_square", 0))
    if ns not in (0, 1, 2, 3) or ss not in (0, 1, 2, 3):
        raise ValueError("rhealpix: squares must be in 0..3")
    base = setup_healpix(crs)
    es = crs.es
    if es:
        import math as _math

        from . import xmath as _xm

        ra = _math.sqrt(0.5 * float(_xm.qsfn(1.0, crs.e, crs.one_es)))
    else:
        ra = 1.0
    EPS = 1e-15

    def _rot(x, y, k):
        """Rotate (x,y) counterclockwise by k*pi/2 (k int array)."""
        k = np.mod(k, 4)
        c = np.choose(k, [1.0, 0.0, -1.0, 0.0])
        s = np.choose(k, [0.0, 1.0, 0.0, -1.0])
        return x * c - y * s, x * s + y * c

    def _combine(x, y, inverse: bool):
        """combine_caps (PJ_healpix.c:389-470), vectorized, on the
        UNIT healpix plane (ellipsoid scaling handled outside)."""
        x = np.asarray(x, np.float64).copy()
        y = np.asarray(y, np.float64).copy()
        north = y > PI / 4.0
        south = y < -PI / 4.0
        for region, mask, square, csign in (("n", north, ns, 1.0), ("s", south, ss, -1.0)):
            if not mask.any():
                continue
            xm = x[mask]
            ym = y[mask]
            c_y = csign * PI / 2.0
            if not inverse:
                # cap number from x position (get_cap fwd branch)
                cn = np.select(
                    [xm < -PI / 2.0, xm < 0.0, xm < PI / 2.0], [0, 1, 2], default=3
                )
                cx = np.choose(cn, [-3 * PI / 4, -PI / 4, PI / 4, 3 * PI / 4])
                ax = -3.0 * PI / 4.0 + square * PI / 2.0
                ay = c_y
                k = (cn - square) if region == "n" else -(cn - square)
                rx, ry = _rot(xm - cx, ym - c_y, k)
                x[mask] = rx + ax
                y[mask] = ry + ay
            else:
                # which HEALPix cap this point of the polar square
                # came from (get_cap inverse branch)
                xs = xm - square * PI / 2.0
                if region == "n":
                    c1 = (ym >= -xs - PI / 4.0 - EPS) & (ym < xs + 5.0 * PI / 4.0 - EPS)
                    c2 = (ym > -xs - PI / 4.0 + EPS) & (ym >= xs + 5.0 * PI / 4.0 - EPS)
                    c3 = (ym <= -xs - PI / 4.0 + EPS) & (ym > xs + 5.0 * PI / 4.0 + EPS)
                    cn = np.select(
                        [c1, c2, c3],
                        [(square + 1) % 4, (square + 2) % 4, (square + 3) % 4],
                        default=square,
                    )
                else:
                    c1 = (ym <= xs + PI / 4.0 + EPS) & (ym > -xs - 5.0 * PI / 4.0 + EPS)
                    c2 = (ym < xs + PI / 4.0 - EPS) & (ym <= -xs - 5.0 * PI / 4.0 + EPS)
                    c3 = (ym >= xs + PI / 4.0 - EPS) & (ym < -xs - 5.0 * PI / 4.0 - EPS)
                    cn = np.select(
                        [c1, c2, c3],
                        [(square + 1) % 4, (square + 2) % 4, (square + 3) % 4],
                        default=square,
                    )
                cx = -3.0 * PI / 4.0 + square * PI / 2.0  # pole point of the square
                ax = -3.0 * PI / 4.0 + cn * PI / 2.0
                ay = c_y
                k = -(cn - square) if region == "n" else (cn - square)
                rx, ry = _rot(xm - cx, ym - c_y, k)
                x[mask] = rx + ax
                y[mask] = ry + ay
        return x, y

    def fwd(lam, phi):
        x, y = base.fwd(lam, phi)
        x, y = _combine(x / ra, y / ra, inverse=False)
        return x * ra, y * ra

    def inv(x, y):
        x = np.asarray(x, np.float64) / ra
        y = np.asarray(y, np.float64) / ra
        x, y = _combine(x, y, inverse=True)
        return base.inv(x * ra, y * ra)

    return CompiledProj("rhealpix", fwd, inv, **fr)
