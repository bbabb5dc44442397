"""S2-style hierarchical cell index (face + quadratic ST + Hilbert).

Completes the "H3/S2" pair: :mod:`.hexgrid` / :mod:`.eagrid` are the
H3-side (hex cells, k-ring kNN); this module is the S2-side — the
cube-sphere quad-tree whose one property neither hex grid has:
**prefix ranges ARE cell subtrees**.  Three public layers compose:

1. **Face decomposition** — the quadrilateralized spherical cube of
   the reference's QSC projection (src/PJ_qsc.c:52-60: six faces
   picked by the dominant ECEF axis), S2 face ordering
   0:+x 1:+y 2:+z 3:-x 4:-y 5:-z, gnomonic (u, v) in [-1, 1].
2. **Quadratic ST transform** (the public S2 geometry library's
   area-equalizing reparameterization): s = sqrt(1+3u)/2 for u >= 0,
   1 - sqrt(1-3u)/2 otherwise.  Gnomonic cells vary ~5.2x in area
   corner-to-center; after the quadratic transform the spread is
   ~2.1x — measured in tests/test_s2cell.py.
3. **Hilbert position within the face** (the same rotate-and-
   accumulate unroll as expressions.with_hilbert_key).

``id = face * 4^level + hilbert(i, j)``.  Because the Hilbert curve
is self-similar (children of a cell are 4 consecutive curve
quarters), the level-(L-k) ancestor is ``id >> 2k`` — one bit-shift,
no lookup — and sorting a table by id clusters every subtree into one
contiguous blob (the property S2-sharded systems range-scan on).
All pure codegen expressions; the DuckDB oracle replays the identical
face/uv/st math and Hilbert levels as chained CTEs
(__spark_entry__._s2_rollup_oracle).
"""
from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from .expressions import _c, _rad, with_hilbert_key


def _face_uv(lon_deg: Column | str, lat_deg: Column | str):
    """(face, u, v) columns: QSC face pick + gnomonic coords."""
    lam = _rad(_c(lon_deg))
    phi = _rad(_c(lat_deg))
    x = F.cos(phi) * F.cos(lam)
    y = F.cos(phi) * F.sin(lam)
    z = F.sin(phi)
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    face = (
        F.when((ax >= ay) & (ax >= az), F.when(x >= 0, F.lit(0)).otherwise(F.lit(3)))
        .when(ay >= az, F.when(y >= 0, F.lit(1)).otherwise(F.lit(4)))
        .otherwise(F.when(z >= 0, F.lit(2)).otherwise(F.lit(5)))
    )
    u = (
        F.when(face == 0, y / x)
        .when(face == 3, z / x)
        .when(face == 1, -x / y)
        .when(face == 4, z / y)
        .when(face == 2, -x / z)
        .otherwise(-y / z)
    )
    v = (
        F.when(face == 0, z / x)
        .when(face == 3, -y / x)
        .when(face == 1, z / y)
        .when(face == 4, -x / y)
        .when(face == 2, y / z)
        .otherwise(-x / z)
    )
    return face, u, v


def _st(u: Column) -> Column:
    """S2 quadratic u -> s in [0, 1] (area-equalizing)."""
    return F.when(u >= 0, F.sqrt(1.0 + 3.0 * u) * 0.5).otherwise(
        1.0 - F.sqrt(1.0 - 3.0 * u) * 0.5
    )


def with_s2_cell(df, lon_col: str, lat_col: str, level: int, out_col: str = "s2"):
    """Append the level-``level`` S2-style cell id of (lon, lat).

    Pure chained column projections (face/uv/st closed-form, Hilbert
    unrolled per level) — no UDF, whole-stage codegen end to end.
    """
    if not 1 <= level <= 28:
        raise ValueError(f"level must be 1..28, got {level}")
    n = 1 << level
    face, u, v = _face_uv(lon_col, lat_col)
    qi = F.least(F.greatest(F.floor(_st(u) * n), F.lit(0)), F.lit(n - 1))
    qj = F.least(F.greatest(F.floor(_st(v) * n), F.lit(0)), F.lit(n - 1))
    cur = (
        df.withColumn("_s2f", face.cast("long"))
        .withColumn("_s2i", qi.cast("long"))
        .withColumn("_s2j", qj.cast("long"))
    )
    cur = with_hilbert_key(cur, "_s2i", "_s2j", level, out_col="_s2d")
    return (
        cur.withColumn(
            out_col, (F.col("_s2f") * F.lit(n * n) + F.col("_s2d")).cast("long")
        )
        .drop("_s2f", "_s2i", "_s2j", "_s2d")
    )


def s2_parent(cell: Column | str, steps: int = 1) -> Column:
    """Ancestor ``steps`` levels up: one shift, valid because the id
    interleaves face above a self-similar Hilbert position."""
    return F.shiftright(_c(cell), 2 * steps)


# ----------------------------------------------------- driver-side mirror
def _st_py(u: float) -> float:
    if u >= 0:
        return 0.5 * math.sqrt(1.0 + 3.0 * u)
    return 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)


def _st_inv_py(s: float) -> float:
    if s >= 0.5:
        return (4.0 * s * s - 1.0) / 3.0
    return (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0


def _face_uv_py(lon_deg: float, lat_deg: float):
    lam, phi = math.radians(lon_deg), math.radians(lat_deg)
    x = math.cos(phi) * math.cos(lam)
    y = math.cos(phi) * math.sin(lam)
    z = math.sin(phi)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face = 0 if x >= 0 else 3
    elif ay >= az:
        face = 1 if y >= 0 else 4
    else:
        face = 2 if z >= 0 else 5
    u = (y / x, -x / y, -x / z, z / x, z / y, -y / z)[face]
    v = (z / x, z / y, y / z, -y / x, -x / y, -x / z)[face]
    return face, u, v


def _hilbert_xy2d_py(x: int, y: int, level: int) -> int:
    d = 0
    s = 1 << (level - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def s2_cell_py(lon_deg: float, lat_deg: float, level: int) -> int:
    """Driver-side mirror of :func:`with_s2_cell` for one point."""
    n = 1 << level
    face, u, v = _face_uv_py(lon_deg, lat_deg)
    i = min(max(int(math.floor(_st_py(u) * n)), 0), n - 1)
    j = min(max(int(math.floor(_st_py(v) * n)), 0), n - 1)
    return face * n * n + _hilbert_xy2d_py(i, j, level)


def s2_cell_center(cell: int, level: int):
    """(lon_deg, lat_deg) of the cell center — the decode direction."""
    from .expressions import hilbert_decode

    n = 1 << level
    face, d = divmod(cell, n * n)
    i, j = hilbert_decode(d, level)
    u = _st_inv_py((i + 0.5) / n)
    v = _st_inv_py((j + 0.5) / n)
    # direction vectors per face (inverse of _face_uv_py's ratios)
    x, y, z = (
        (1.0, u, v),
        (-u, 1.0, v),
        (-u, v, 1.0),
        (-1.0, v, -u),
        (v, -1.0, -u),
        (v, u, -1.0),
    )[face]
    r = math.sqrt(x * x + y * y + z * z)
    return math.degrees(math.atan2(y, x)), math.degrees(math.asin(z / r))
