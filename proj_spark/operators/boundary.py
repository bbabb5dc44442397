"""Nearest-boundary distance join: distance from every point to the
closest polygon EDGE (the AOI boundary), with the owning polygon id.

Complements the point-in-polygon join (membership) and the
within-distance join (point<->point): "how far is this image's
centroid from the AOI border" drives edge-buffer filtering (drop
tiles within X m of the boundary) and uncertainty weighting.

Geometry: each edge is measured in a local equirectangular frame
centered on the point (lon scaled by cos(lat), both axes scaled to
meters by the sphere radius) — the standard small-distance metric;
exact segment projection with parameter clamp.  Distances are floored
to MILLIMETERS before any comparison, so the (dist_mm, poly_seq,
edge_idx) tie-break is a total order and both engines (and any
partitioning) agree bit-for-bit.

Two physical strategies, one semantics (tests assert equivalence):

- inline (n_edges <= inline_cap): the edge set folds into ONE constant
  array expression and the nearest edge is
  ``array_min(transform(edges, e -> struct(dm, seq, eidx, pid)))`` —
  struct ordering IS the tie-break, the whole operator is
  whole-stage-codegen'd, and the 10^12-row side never shuffles or
  joins anything (zero Exchange — plan-gated).
- join fallback (above the cap): broadcast the edge table, evaluate
  the same distance expression per (point, edge), and take the
  algebraic ``min(struct(...))`` per point — map-side combine collapses
  the fan-out before the single point-keyed exchange.

100 TB: the inline path is the default for AOI-sized polygon sets
(hundreds of edges); country-scale edge sets (10^5+) take the join
path, and if the edge set outgrows a broadcast, bucket edges by cell
like operators/fused.py does for PIP candidates.
"""
from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import DEG_TO_RAD, EARTH_RADIUS_M

Ring = Sequence[Tuple[float, float]]

_D = repr(DEG_TO_RAD)
_R = repr(EARTH_RADIUS_M)


def _edge_rows(polys: Sequence[Tuple[str, Ring]]):
    """(seq, eidx, pid, x1, y1, x2, y2) per edge, in first-match order."""
    rows = []
    for seq, (pid, ring) in enumerate(polys):
        for eidx, ((ax, ay), (bx, by)) in enumerate(zip(ring[:-1], ring[1:])):
            rows.append((seq, eidx, pid, float(ax), float(ay), float(bx), float(by)))
    return rows


def _dist_mm_sql(lon: str, lat: str, x1: str, y1: str, x2: str, y2: str) -> str:
    """floor(1000 * point-to-segment meters) as a SQL expression string
    (local equirectangular frame centered on the point).  Written once
    here; the DuckDB oracle replays the identical tokens."""
    m = f"({_D} * {_R})"
    cl = f"cos({lat} * {_D})"
    ax, ay = f"(({x1} - {lon}) * {m} * {cl})", f"(({y1} - {lat}) * {m})"
    bx, by = f"(({x2} - {lon}) * {m} * {cl})", f"(({y2} - {lat}) * {m})"
    dx, dy = f"({bx} - {ax})", f"({by} - {ay})"
    len2 = f"({dx} * {dx} + {dy} * {dy})"
    t = f"least(greatest(CASE WHEN {len2} = 0.0 THEN 0.0 ELSE -({ax} * {dx} + {ay} * {dy}) / {len2} END, 0.0), 1.0)"
    px, py = f"({ax} + {t} * {dx})", f"({ay} + {t} * {dy})"
    return f"CAST(floor(sqrt({px} * {px} + {py} * {py}) * 1000.0) AS BIGINT)"


def boundary_distance_join(
    points: DataFrame,
    polys: Sequence[Tuple[str, Ring]],
    lon: str = "lon",
    lat: str = "lat",
    point_id: str | None = None,
    inline_cap: int = 4096,
) -> DataFrame:
    """points + (nearest_poly string, dist_mm long).

    ``point_id`` is only needed by the join fallback (the per-point
    aggregate key); the inline path keeps every input column as-is.
    """
    rows = _edge_rows(polys)
    if not rows:
        raise ValueError("no polygon edges")
    dm = _dist_mm_sql(lon, lat, "e.x1", "e.y1", "e.x2", "e.y2")
    if len(rows) <= inline_cap:
        lits = ",".join(
            f"named_struct('s',{s},'i',{i},'p','{p}','x1',{x1!r},'y1',{y1!r},'x2',{x2!r},'y2',{y2!r})"
            for s, i, p, x1, y1, x2, y2 in rows
        )
        best = F.expr(
            f"array_min(transform(array({lits}), "
            f"e -> named_struct('dm', {dm}, 's', e.s, 'i', e.i, 'p', e.p)))"
        )
        return points.withColumn("_b", best).select(
            *points.columns,
            F.col("_b.p").alias("nearest_poly"),
            F.col("_b.dm").alias("dist_mm"),
        )
    if point_id is None:
        raise ValueError("point_id is required above inline_cap (join fallback)")
    edges = points.sparkSession.createDataFrame(
        rows, "s int, i int, p string, x1 double, y1 double, x2 double, y2 double"
    )
    cand = points.crossJoin(F.broadcast(edges)).withColumn(
        "_dm", F.expr(_dist_mm_sql(lon, lat, "x1", "y1", "x2", "y2"))
    )
    keep = [c for c in points.columns]
    agg = cand.groupBy(point_id).agg(
        F.min(F.struct("_dm", "s", "i", "p")).alias("_b"),
        *[F.first(c).alias(c) for c in keep if c != point_id],
    )
    return agg.select(
        *keep,
        F.col("_b.p").alias("nearest_poly"),
        F.col("_b._dm").alias("dist_mm"),
    )
