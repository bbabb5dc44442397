"""Transform planner: compile a (src CRS, dst CRS) pair into ONE fused
numpy function.

This is the Spark-side equivalent of the reference's fixed 11-stage
dataflow (src/pj_transform.c:87-370) plus its compile-time pruning
rules (identity-datum elimination src/pj_transform.c:623, unknown-datum
short circuit :617-619, ellipsoid-equality ECEF skip :667-671).  The
plan is built once at driver time; executors only ever see the fused
closure inside a pandas UDF (one Arrow crossing per batch).

Conventions match pj_transform: latlong coordinates are radians inside
the pipeline; projected coordinates are in CRS units.  Sentinel for an
unprojectable point is NaN (reference uses HUGE_VAL,
src/pj_transform.c:175) — transient per-point errors never raise.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

from ..crs import CRS, PJD_3PARAM, PJD_7PARAM, PJD_GRIDSHIFT, PJD_UNKNOWN
from ..kernels import geodesy
from ..kernels import xmath as m
from ..kernels.core import CompiledProj, compile_proj
from ..kernels.xmath import HALFPI, PI, TWOPI

# SRS_WGS84_* (src/pj_transform.c:50-51)
WGS84_A = 6378137.0
WGS84_ES = 0.0066943799901413165

_EPS12 = 1.0e-12


@dataclass
class TransformPlan:
    src: CRS
    dst: CRS
    stages: list  # [(name, fn)] each fn: (x, y, z) -> (x, y, z)

    def __call__(self, x, y, z=None):
        x = np.ascontiguousarray(x, dtype=np.float64)
        y = np.ascontiguousarray(y, dtype=np.float64)
        z = (
            np.zeros_like(x)
            if z is None
            else np.ascontiguousarray(z, dtype=np.float64)
        )
        for _, fn in self.stages:
            x, y, z = fn(x, y, z)
        return x, y, z

    def describe(self) -> list[str]:
        return [name for name, _ in self.stages]


def _axis_normalize(axis: str, denormalize: bool):
    """pj_adjust_axis (src/pj_transform.c:728-825) as a vector op.

    axis is a 3-char spec naming what each SLOT holds, e.g. "neu" =
    slot0 north, slot1 east, slot2 up.  normalize maps slots -> (east,
    north, up); denormalize maps (east, north, up) -> slots.  w/s/d
    negate.
    """
    comp_of = {"e": ("x", 1.0), "w": ("x", -1.0), "n": ("y", 1.0),
               "s": ("y", -1.0), "u": ("z", 1.0), "d": ("z", -1.0)}

    def fn(x, y, z):
        slots = {0: x, 1: y, 2: z}
        if denormalize:
            # output slot i holds (sign * component named by axis[i])
            enu = {"x": x, "y": y, "z": z}
            out = [None, None, None]
            for i, a in enumerate(axis):
                name, sign = comp_of[a]
                out[i] = enu[name] if sign > 0 else -enu[name]
            return out[0], out[1], out[2]
        # normalize: component named by axis[i] comes from slot i
        enu = {}
        for i, a in enumerate(axis):
            name, sign = comp_of[a]
            enu[name] = slots[i] if sign > 0 else -slots[i]
        return enu.get("x", x), enu.get("y", y), enu.get("z", z)

    return fn


def _pj_inv(crs: CRS, cp: CompiledProj):
    """Generic inverse wrapper (src/pj_inv.c:7-33)."""
    to_meter, x0, y0, ra = crs.to_meter, cp.x0, cp.y0, crs.ra
    lam0, over, geoc, one_es = cp.lam0, crs.over, crs.geoc, crs.one_es

    def fn(x, y, z):
        xs = (x * to_meter - x0) * ra
        ys = (y * to_meter - y0) * ra
        lam, phi = cp.inv(xs, ys)
        lam = lam + lam0
        if not over:
            lam = m.adjlon(lam)
        if geoc:
            adj = np.abs(np.abs(phi) - HALFPI) > _EPS12
            phi = np.where(adj, np.arctan(one_es * np.tan(phi)), phi)
        return lam, phi, z

    return fn


def _pj_fwd(crs: CRS, cp: CompiledProj):
    """Generic forward wrapper (src/pj_fwd.c:7-37)."""
    fr_meter, x0, y0, a = crs.fr_meter, cp.x0, cp.y0, crs.a
    lam0, over, geoc, rone_es = cp.lam0, crs.over, crs.geoc, crs.rone_es

    def fn(lam, phi, z):
        t = np.abs(phi) - HALFPI
        bad = (t > _EPS12) | (np.abs(lam) > 10.0)
        phi = np.where(np.abs(t) <= _EPS12, np.where(phi < 0.0, -HALFPI, HALFPI), phi)
        if geoc:
            sel = np.abs(t) > _EPS12
            phi = np.where(sel, np.arctan(rone_es * np.tan(phi)), phi)
        lam = lam - lam0
        if not over:
            lam = m.adjlon(lam)
        x, y = cp.fwd(lam, phi)
        x = fr_meter * (a * x + x0)
        y = fr_meter * (a * y + y0)
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y), z

    return fn


def build_plan(src: CRS, dst: CRS) -> TransformPlan:
    """Compile the stage list with the reference's pruning rules."""
    stages: list[tuple[str, Callable]] = []
    src_cp = compile_proj(src)
    dst_cp = compile_proj(dst)

    # 1. axis normalization
    if src.axis != "enu":
        stages.append(("axis_norm", _axis_normalize(src.axis, denormalize=False)))

    # 2. vertical units to meters
    if src.vto_meter != 1.0:
        v = src.vto_meter
        stages.append(("z_to_meter", lambda x, y, z, v=v: (x, y, z * v)))

    # 3. source to geodetic
    if src.is_geocent:
        tm = src.to_meter
        a0, es0 = src.a_orig, src.es_orig

        def geocent_inv(x, y, z, tm=tm, a0=a0, es0=es0):
            if tm != 1.0:
                x = x * tm
                y = y * tm
                z = z * tm  # z already scaled by vto_meter; reference scales x,y only
            lam, phi, h = geodesy.geocentric_to_geodetic(x, y, z, a0, es0)
            return lam, phi, h

        stages.append(("geocent_to_geodetic", geocent_inv))
    elif not src.is_latlong:
        stages.append((f"inv_{src.proj}", _pj_inv(src, src_cp)))

    # 4. prime meridian restore
    if src.from_greenwich != 0.0:
        fg = src.from_greenwich
        stages.append(("pm_restore", lambda x, y, z, fg=fg: (x + fg, y, z)))

    # 4b. geoid -> ellipsoidal heights on the source side
    # (pj_transform.c:215-222: BEFORE the datum leg)
    if src.geoidgrids is not None:
        from ..sources.grids import apply_vgridshift_stage

        stages.append(("src_vgridshift", apply_vgridshift_stage(src.geoidgrids, inverse=False)))

    # 5. datum transform (pj_datum_transform, src/pj_transform.c:602-720)
    datum_stages = _plan_datum(src, dst)
    stages.extend(datum_stages)

    # 5b. ellipsoidal -> geoid heights on the destination side
    # (pj_transform.c:240-247: AFTER the datum leg)
    if dst.geoidgrids is not None:
        from ..sources.grids import apply_vgridshift_stage

        stages.append(("dst_vgridshift", apply_vgridshift_stage(dst.geoidgrids, inverse=True)))

    # 6. prime meridian remove
    if dst.from_greenwich != 0.0:
        fg = dst.from_greenwich
        stages.append(("pm_remove", lambda x, y, z, fg=fg: (x - fg, y, z)))

    # 7. destination projection / geocentric / lon_wrap
    if dst.is_geocent:
        frm = dst.fr_meter
        a0, es0 = dst.a_orig, dst.es_orig

        def geocent_fwd(lam, phi, z, frm=frm, a0=a0, es0=es0):
            x, y, zz = geodesy.geodetic_to_geocentric(lam, phi, z, a0, es0)
            if frm != 1.0:
                x = x * frm
                y = y * frm
            return x, y, zz

        stages.append(("geodetic_to_geocent", geocent_fwd))
    elif not dst.is_latlong:
        stages.append((f"fwd_{dst.proj}", _pj_fwd(dst, dst_cp)))
    elif dst.lon_wrap is not None:
        ctr = dst.lon_wrap

        def wrap(x, y, z, ctr=ctr):
            x = x - TWOPI * np.floor((x - (ctr - PI)) / TWOPI)
            return x, y, z

        stages.append(("lon_wrap", wrap))

    # 8. vertical units from meters
    if dst.vto_meter != 1.0:
        v = dst.vfr_meter
        stages.append(("z_from_meter", lambda x, y, z, v=v: (x, y, z * v)))

    # 9. axis denormalize
    if dst.axis != "enu":
        stages.append(("axis_denorm", _axis_normalize(dst.axis, denormalize=True)))

    return TransformPlan(src=src, dst=dst, stages=stages)


def _plan_datum(src: CRS, dst: CRS) -> list[tuple[str, Callable]]:
    # unknown-datum short circuit (:617-619) and identity datums (:623)
    if src.datum_type == PJD_UNKNOWN or dst.datum_type == PJD_UNKNOWN:
        return []
    if src.same_datum(dst):
        return []

    stages: list[tuple[str, Callable]] = []
    src_a, src_es = src.a_orig, src.es_orig
    dst_a, dst_es = dst.a_orig, dst.es_orig

    if src.datum_type == PJD_GRIDSHIFT:
        from ..operators.gridshift import apply_gridshift_stage

        stages.append(("src_gridshift", apply_gridshift_stage(src.nadgrids, inverse=False)))
        src_a, src_es = WGS84_A, WGS84_ES
    if dst.datum_type == PJD_GRIDSHIFT:
        dst_a, dst_es = WGS84_A, WGS84_ES

    need_geocentric = (
        src_es != dst_es
        or src_a != dst_a
        or src.datum_type in (PJD_3PARAM, PJD_7PARAM)
        or dst.datum_type in (PJD_3PARAM, PJD_7PARAM)
    )
    if need_geocentric:
        stages.append(
            (
                "geodetic_to_ecef",
                lambda x, y, z, a=src_a, es=src_es: geodesy.geodetic_to_geocentric(
                    x, y, z, a, es
                ),
            )
        )
        if src.datum_type in (PJD_3PARAM, PJD_7PARAM):
            p = src.datum_params
            stages.append(
                ("helmert_to_wgs84", lambda x, y, z, p=p: geodesy.helmert_to_wgs84(x, y, z, p))
            )
        if dst.datum_type in (PJD_3PARAM, PJD_7PARAM):
            p = dst.datum_params
            stages.append(
                (
                    "helmert_from_wgs84",
                    lambda x, y, z, p=p: geodesy.helmert_from_wgs84(x, y, z, p),
                )
            )
        stages.append(
            (
                "ecef_to_geodetic",
                lambda x, y, z, a=dst_a, es=dst_es: geodesy.geocentric_to_geodetic(
                    x, y, z, a, es
                ),
            )
        )

    if dst.datum_type == PJD_GRIDSHIFT:
        from ..operators.gridshift import apply_gridshift_stage

        stages.append(("dst_gridshift", apply_gridshift_stage(dst.nadgrids, inverse=True)))

    return stages


# ----------------------------------------------------------------- deg API
def transform_arrays(src: CRS | str, dst: CRS | str, x, y, z=None):
    """cs2cs-style entry: degrees at latlong/geocent-free ends
    (src/cs2cs.c:89-97 applies DEG_TO_RAD on parse, :123-159 formats
    output in degrees)."""
    if isinstance(src, str):
        src = CRS.from_proj4(src)
    if isinstance(dst, str):
        dst = CRS.from_proj4(dst)
    plan = build_plan(src, dst)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if src.is_latlong:
        x = x * m.DEG_TO_RAD
        y = y * m.DEG_TO_RAD
    xo, yo, zo = plan(x, y, z)
    if dst.is_latlong:
        xo = xo * m.RAD_TO_DEG
        yo = yo * m.RAD_TO_DEG
    return xo, yo, zo
