"""Hexagonal cell index (the H3 analog) as pure Spark SQL expressions.

The north rule names "H3/S2 cell indexing" and "kNN via H3 k-ring
expansion".  True H3 (icosahedral aperture-7) is not reproducible in
ANSI SQL, so — like ``expressions.cell_id`` for the square grid — this
module provides the engine's hex addressing scheme as closed-form
arithmetic that BOTH Spark codegen and the DuckDB oracle evaluate
identically:

- pointy-top hexagons of circumradius ``size_deg`` on the
  equirectangular (lon, lat) degree plane;
- axial coordinates  q = (sqrt(3)/3·lon − 1/3·lat)/size,
  r = (2/3·lat)/size  (the standard pointy-top basis);
- fractional (q, r) snap to the containing cell by CUBE ROUNDING
  (round each of q, r, s = −q−r, then fix the axis with the largest
  rounding error so q+r+s = 0 — the classic hex-grid algorithm);
- rounding is ``floor(x + 0.5)`` in both engines (never ``round()``:
  Spark HALF_UPs away from zero while other engines banker's-round,
  and exact .5 axial coords DO occur on cell edges);
- cell id packs the offset axial pair into one int64:
  ``(q + 2^20)·2^21 + (r + 2^20)`` — hierarchical enough for k-ring
  arithmetic, stable under any partitioning.

k-ring: the cells at hex distance ≤ k from a center are exactly
``{(q+dq, r+dr) : |dq| ≤ k, max(−k, −dq−k) ≤ dr ≤ min(k, −dq+k)}``
(3k² + 3k + 1 cells) — generated as a literal array expression, the
same shape as ``expressions.cell_neighbors``.

Geometry facts used by the kNN coverage bound (all in degree units of
the plane): adjacent cell centers are sqrt(3)·size apart; centers at
hex distance h are ≥ h·(3/2)·size apart; every point of a cell is
within ``size`` (the circumradius) of its center.  Hence every point
OUTSIDE the k-ring of the query's cell is at planar distance
≥ ((k+1)·3/2 − 2)·size from the query point.
"""
from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from .expressions import _c

# shared double literals — the SQL oracle interpolates the SAME reprs,
# so both engines fold identical constants
K_QX = math.sqrt(3.0) / 3.0      # dq/dlon
ONE_THIRD = 1.0 / 3.0            # dq/dlat (negated)
TWO_THIRDS = 2.0 / 3.0           # dr/dlat
SQRT3 = math.sqrt(3.0)

_OFF = 1 << 20                   # axial offset -> non-negative packing
_RSPAN = 1 << 21                 # row stride in the packed id


def _round_half_up(x: Column) -> Column:
    """floor(x + 0.5): identical semantics in Spark and DuckDB (unlike
    round(), whose half-tie rule differs across engines)."""
    return F.floor(x + F.lit(0.5))


def hex_cell(lon_deg: Column | str, lat_deg: Column | str, size_deg: float) -> Column:
    """int64 hex cell id containing (lon, lat); pure expressions."""
    x, y = _c(lon_deg).cast("double"), _c(lat_deg).cast("double")
    q = (x * F.lit(K_QX) - y * F.lit(ONE_THIRD)) / F.lit(float(size_deg))
    r = (y * F.lit(TWO_THIRDS)) / F.lit(float(size_deg))
    s = -q - r
    rq, rr, rs = _round_half_up(q), _round_half_up(r), _round_half_up(s)
    dq, dr, ds = F.abs(rq - q), F.abs(rr - r), F.abs(rs - s)
    # fix the axis with the largest rounding error (ties: q, then r —
    # the CASE order below is the tie rule, mirrored verbatim in SQL)
    fq = F.when((dq >= dr) & (dq >= ds), -rr - rs).otherwise(rq)
    fr = F.when((dq >= dr) & (dq >= ds), rr).otherwise(
        F.when(dr >= ds, -rq - rs).otherwise(rr)
    )
    return (
        (fq.cast("long") + F.lit(_OFF)) * F.lit(_RSPAN)
        + (fr.cast("long") + F.lit(_OFF))
    ).cast("long")


def hex_cell_sql(lon_expr: str, lat_expr: str, size_deg: float) -> str:
    """ANSI-SQL mirror of :func:`hex_cell` — token-for-token the same
    arithmetic, for DuckDB oracles."""
    q = f"(({lon_expr}) * {K_QX!r} - ({lat_expr}) * {ONE_THIRD!r}) / {float(size_deg)!r}"
    r = f"(({lat_expr}) * {TWO_THIRDS!r}) / {float(size_deg)!r}"
    s = f"(-({q}) - ({r}))"
    rq, rr, rs = (f"floor(({e}) + 0.5)" for e in (q, r, s))
    dq = f"abs(({rq}) - ({q}))"
    dr = f"abs(({rr}) - ({r}))"
    ds = f"abs(({rs}) - ({s}))"
    fq = f"(CASE WHEN ({dq}) >= ({dr}) AND ({dq}) >= ({ds}) THEN -({rr}) - ({rs}) ELSE ({rq}) END)"
    fr = (
        f"(CASE WHEN ({dq}) >= ({dr}) AND ({dq}) >= ({ds}) THEN ({rr}) "
        f"WHEN ({dr}) >= ({ds}) THEN -({rq}) - ({rs}) ELSE ({rr}) END)"
    )
    return (
        f"(CAST({fq} AS BIGINT) + {_OFF}) * {_RSPAN} + (CAST({fr} AS BIGINT) + {_OFF})"
    )


def hex_qr(cell: Column) -> tuple[Column, Column]:
    """Unpack a cell id back to axial (q, r) columns."""
    q = F.floor(cell / F.lit(_RSPAN)) - F.lit(_OFF)
    r = cell % F.lit(_RSPAN) - F.lit(_OFF)
    return q.cast("long"), r.cast("long")


def hex_center(cell: Column, size_deg: float) -> tuple[Column, Column]:
    """(lon, lat) of a cell's center — inverse of the axial basis."""
    q, r = hex_qr(cell)
    s = float(size_deg)
    lat = r.cast("double") * F.lit(1.5 * s)
    lon = (q.cast("double") + r.cast("double") * F.lit(0.5)) * F.lit(SQRT3 * s)
    return lon, lat


def hex_kring(cell: Column, k: int = 1) -> Column:
    """Array of the 3k²+3k+1 cell ids at hex distance ≤ k from
    ``cell`` (literal unrolled expression — k is small by design)."""
    q, r = hex_qr(cell)
    ids = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            ids.append(
                ((q + F.lit(dq) + F.lit(_OFF)) * F.lit(_RSPAN)
                 + (r + F.lit(dr) + F.lit(_OFF))).cast("long")
            )
    return F.array(*ids)


def hex_kring_size(k: int) -> int:
    return 3 * k * k + 3 * k + 1


# -------------------------------------------------- python twin (tests)
def hex_cell_py(lon: float, lat: float, size_deg: float) -> int:
    """Scalar Python twin of :func:`hex_cell` for property tests."""
    q = (lon * K_QX - lat * ONE_THIRD) / float(size_deg)
    r = (lat * TWO_THIRDS) / float(size_deg)
    s = -q - r
    rq, rr, rs = (math.floor(v + 0.5) for v in (q, r, s))
    dq, dr, ds = abs(rq - q), abs(rr - r), abs(rs - s)
    if dq >= dr and dq >= ds:
        fq, fr = -rr - rs, rr
    elif dr >= ds:
        fq, fr = rq, -rq - rs
    else:
        fq, fr = rq, rr
    return (int(fq) + _OFF) * _RSPAN + (int(fr) + _OFF)
