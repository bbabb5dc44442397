"""Extended kernel inventory, part 9: Icosahedral Snyder Equal Area
(isea) — plane output mode, the default of the reference
(ref src/PJ_isea.c: snyder_ctran/isea_ctran orientation,
isea_snyder_forward Snyder 1992 equations 5-12, isea_tri_plane
layout).  Forward only, like the reference.  This is the projection
underlying the H3 DGGS.
"""
from __future__ import annotations

import math

import numpy as np

from .core import CompiledProj, REGISTRY, _frame
from .xmath import PI


def _register(*names):
    def deco(fn):
        for n in names:
            REGISTRY[n] = fn
        return fn

    return deco


DEG2RAD = PI / 180.0
DEG36 = 36.0 * DEG2RAD
DEG72 = 72.0 * DEG2RAD
DEG90 = 90.0 * DEG2RAD
DEG108 = 108.0 * DEG2RAD
DEG120 = 120.0 * DEG2RAD
DEG144 = 144.0 * DEG2RAD
DEG180 = PI
V_LAT = 0.46364760899944494524  # arctan(1/2): icosahedron vertex latitude
E_RAD = 0.91843818702186776133
F_RAD = 0.18871053072122403508
TABLE_G = 0.6615845383
TABLE_H = 0.1909830056
RPRIME = 0.91038328153090290025
ISEA_STD_LAT = 1.01722196792335072101
ISEA_STD_LON = 0.19634954084936207740

_VERTEX = [
    (0.0, DEG90), (DEG180, V_LAT), (-DEG108, V_LAT), (-DEG36, V_LAT),
    (DEG36, V_LAT), (DEG108, V_LAT), (-DEG144, -V_LAT), (-DEG72, -V_LAT),
    (0.0, -V_LAT), (DEG72, -V_LAT), (DEG144, -V_LAT), (0.0, -DEG90),
]
_TRI_V1 = [0, 0, 0, 0, 0, 0, 6, 7, 8, 9, 10, 2, 3, 4, 5, 1, 11, 11, 11, 11, 11]
_CENTERS = [
    (0.0, 0.0),
    (-DEG144, E_RAD), (-DEG72, E_RAD), (0.0, E_RAD), (DEG72, E_RAD), (DEG144, E_RAD),
    (-DEG144, F_RAD), (-DEG72, F_RAD), (0.0, F_RAD), (DEG72, F_RAD), (DEG144, F_RAD),
    (-DEG108, -F_RAD), (-DEG36, -F_RAD), (DEG36, -F_RAD), (DEG108, -F_RAD), (DEG180, -F_RAD),
    (-DEG108, -E_RAD), (-DEG36, -E_RAD), (DEG36, -E_RAD), (DEG108, -E_RAD), (DEG180, -E_RAD),
]
# Snyder icosahedron constants (PJ_isea.c constants[] row 6)
_G_DEG, _BIGG_DEG, _THETA_DEG = 37.37736814, 36.0, 30.0


def _az_adjustment(tri: int) -> float:
    vlon, vlat = _VERTEX[_TRI_V1[tri]]
    clon, clat = _CENTERS[tri]
    return math.atan2(
        math.cos(vlat) * math.sin(vlon - clon),
        math.cos(clat) * math.sin(vlat)
        - math.sin(clat) * math.cos(vlat) * math.cos(vlon - clon),
    )


def _triangle_xy(tri: int):
    t = (tri - 1) % 20
    x = TABLE_G * ((t % 5) - 2) * 2.0
    if t > 9:
        x += TABLE_G
    row = t // 5
    y = [5.0 * TABLE_H, TABLE_H, -TABLE_H, -5.0 * TABLE_H][row]
    return x * RPRIME, y * RPRIME


@_register("isea")
def setup_isea(crs) -> CompiledProj:
    """ISEA plane mode (the reference default).  +orient=pole uses the
    unrotated pole orientation; default is the standard ISEA
    orientation (vertex up)."""
    fr = _frame(crs)
    p = crs.params
    orient = str(p.get("orient", "isea"))
    if orient == "pole":
        o_lat, o_lon = DEG90, 0.0
    else:
        o_lat, o_lon = ISEA_STD_LAT, ISEA_STD_LON
    o_az = float(p.get("azi", 0.0)) * DEG2RAD

    g = _G_DEG * DEG2RAD
    G = _BIGG_DEG * DEG2RAD
    theta = _THETA_DEG * DEG2RAD
    cot_theta = 1.0 / math.tan(theta)
    tan_g = math.tan(g)
    az_adj = [_az_adjustment(i) for i in range(21)]
    DBL_EPS = 2.220446049250313e-16

    def _ctran(lam, phi):
        """isea_ctran with pole (o_lon, o_lat), az offset o_az
        (PJ_isea.c snyder_ctran/isea_ctran)."""
        alpha = o_lat
        beta = o_lon + PI  # np->lon += M_PI
        lambda0 = beta
        cos_p = np.cos(phi)
        sin_a = math.sin(alpha)
        sin_phip = sin_a * np.sin(phi) - math.cos(alpha) * cos_p * np.cos(lam - lambda0)
        lp_b = np.arctan2(
            cos_p * np.sin(lam - lambda0),
            sin_a * cos_p * np.cos(lam - lambda0) + math.cos(alpha) * np.sin(phi),
        )
        lambdap = lp_b + beta
        lambdap = np.mod(lambdap, 2 * PI)
        lambdap = np.where(lambdap > PI, lambdap - 2 * PI, lambdap)
        lambdap = np.where(lambdap < -PI, lambdap + 2 * PI, lambdap)
        phip = np.arcsin(np.clip(sin_phip, -1.0, 1.0))
        # npt.lon -= (M_PI - lon0 + np->lon); then += M_PI
        lambdap = lambdap - (PI - o_az + o_lon) + PI
        lambdap = np.mod(lambdap, 2 * PI)
        lambdap = np.where(lambdap > PI, lambdap - 2 * PI, lambdap)
        lambdap = np.where(lambdap < -PI, lambdap + 2 * PI, lambdap)
        return lambdap, phip

    def fwd(lam, phi):
        lam = np.asarray(lam, np.float64)
        phi = np.asarray(phi, np.float64)
        lon, lat = _ctran(lam, phi)
        x = np.full_like(lon, np.nan)
        y = np.full_like(lat, np.nan)
        unassigned = np.ones(lon.shape, bool)
        sinlat = np.sin(lat)
        coslat = np.cos(lat)
        for tri in range(1, 21):
            if not unassigned.any():
                break
            clon, clat = _CENTERS[tri]
            z = np.arccos(
                np.clip(
                    math.sin(clat) * sinlat
                    + math.cos(clat) * coslat * np.cos(lon - clon),
                    -1.0,
                    1.0,
                )
            )
            cand = unassigned & (z <= g + 0.000005)
            if not cand.any():
                continue
            Az_orig = (
                np.arctan2(
                    coslat * np.sin(lon - clon),
                    math.cos(clat) * sinlat
                    - math.sin(clat) * coslat * np.cos(lon - clon),
                )
                - az_adj[tri]
            )
            Az_orig = np.where(Az_orig < 0.0, Az_orig + 2.0 * PI, Az_orig)
            # reduce Az into [0, 120deg], remembering the multiple
            # (the reference's +-DEG120 while loops)
            mult = np.floor(Az_orig / DEG120)
            Az = Az_orig - mult * DEG120
            over = Az > DEG120 + DBL_EPS
            mult = np.where(over, mult + 1.0, mult)
            Az = np.where(over, Az - DEG120, Az)
            q = np.arctan2(tan_g, np.cos(Az) + np.sin(Az) * cot_theta)
            ok = cand & (z <= q + 0.000005)
            if not ok.any():
                continue
            H = np.arccos(
                np.clip(np.sin(Az) * math.sin(G) * math.cos(g) - np.cos(Az) * math.cos(G), -1.0, 1.0)
            )
            Ag = Az + G + H - DEG180
            Azprime = np.arctan2(
                2.0 * Ag, RPRIME * RPRIME * tan_g * tan_g - 2.0 * Ag * cot_theta
            )
            dprime = RPRIME * tan_g / (np.cos(Azprime) + np.sin(Azprime) * cot_theta)
            f = dprime / (2.0 * RPRIME * np.sin(q / 2.0))
            rho = 2.0 * RPRIME * f * np.sin(z / 2.0)
            Azprime = Azprime + DEG120 * mult
            xt = rho * np.sin(Azprime)
            yt = rho * np.cos(Azprime)
            # tri_plane: downtri rotate 180, translate to center
            if ((tri - 1) // 5) % 2 == 1:
                xt, yt = -xt, -yt
            tcx, tcy = _triangle_xy(tri)
            x = np.where(ok, xt + tcx, x)
            y = np.where(ok, yt + tcy, y)
            unassigned = unassigned & ~ok
        return x, y

    return CompiledProj("isea", fwd, None, **fr)
