"""Dissolve by attribute: merge edge-adjacent polygons.

The classic GIS verb ("dissolve parcels by owner", "merge admin units
by region code"): polygons that share a geometric EDGE and carry the
same attribute value collapse into one feature.  At 10^8 parcels this
is a graph problem, not a geometry problem:

1. every ring edge gets a CANONICAL KEY — endpoints quantized to a
   fixed grid (1e-9 deg, below any real digitizing precision) and
   sorted, so the two polygons tracing the same boundary segment in
   opposite directions produce the identical key;
2. one shuffle groups edge keys; a key held by exactly two DIFFERENT
   polygons with the same attribute value emits an adjacency pair;
3. connected components over the pairs (operators/components.py —
   min-label propagation + pointer jumping) assign the dissolve group;
   isolated polygons keep their own id.

Cost: |edges| rows through one groupBy + the CC rounds — never
geometry-x-geometry.  Determinism: group id = min polygon id of the
component (total order), quantization is floor-based.

Output: (poly_id, attr, group_id, group_size) — the caller merges
rings per group downstream (ring stitching is presentation, the
partition is the analytics result the oracle can check).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import connected_components

QUANT = 1e9  # 1e-9 deg grid: canonical-key quantization


def _edge_key(x1, y1, x2, y2):
    """Canonical undirected edge key: quantized endpoints, sorted."""
    a = F.concat_ws(
        ":",
        F.floor(x1 * F.lit(QUANT)).cast("long"),
        F.floor(y1 * F.lit(QUANT)).cast("long"),
    )
    b = F.concat_ws(
        ":",
        F.floor(x2 * F.lit(QUANT)).cast("long"),
        F.floor(y2 * F.lit(QUANT)).cast("long"),
    )
    return F.concat_ws("|", F.least(a, b), F.greatest(a, b))


def adjacency_pairs(
    polys: DataFrame,
    attr: str,
    poly_id: str = "poly_id",
    ring: str = "ring",
) -> DataFrame:
    """Distinct same-attr edge-adjacency pairs (id_a < id_b).

    Exposed separately so the physical plan is gateable (the CC step
    below runs jobs eagerly): |edges| rows through ONE edge-key
    shuffle, never geometry x geometry."""
    edges = polys.select(
        F.col(poly_id).alias("pid"),
        F.col(attr).alias("_a"),
        F.explode(
            F.expr(
                f"transform(slice({ring}, 1, size({ring}) - 1), (v, i) -> "
                f"named_struct('x1', v.lon, 'y1', v.lat, "
                f"'x2', {ring}[i + 1].lon, 'y2', {ring}[i + 1].lat))"
            )
        ).alias("e"),
    ).select(
        "pid",
        "_a",
        _edge_key(
            F.col("e.x1"), F.col("e.y1"), F.col("e.x2"), F.col("e.y2")
        ).alias("ek"),
    )
    # a boundary segment is shared by at most two polygons; same-attr
    # distinct pairs per key become adjacency edges
    pairs = (
        edges.alias("l")
        .join(
            edges.alias("r"),
            (F.col("l.ek") == F.col("r.ek"))
            & (F.col("l._a") == F.col("r._a"))
            & (F.col("l.pid") < F.col("r.pid")),
            "inner",
        )
        .select(F.col("l.pid").alias("id_a"), F.col("r.pid").alias("id_b"))
        .distinct()
    )
    return pairs


def dissolve_by(
    polys: DataFrame,
    attr: str,
    poly_id: str = "poly_id",
    ring: str = "ring",
) -> DataFrame:
    """``polys``: (poly_id, attr, ring array<struct<lon,lat>> closed).
    Returns (poly_id, attr, group_id, group_size)."""
    pairs = adjacency_pairs(polys, attr, poly_id=poly_id, ring=ring)
    comp = connected_components(pairs, a="id_a", b="id_b")
    out = (
        polys.select(F.col(poly_id).alias("pid"), F.col(attr).alias("_a"))
        .join(comp, F.col("pid") == comp["node"], "left")
        .select(
            F.col("pid").alias(poly_id),
            F.col("_a").alias(attr),
            F.coalesce(F.col("component"), F.col("pid")).alias("group_id"),
        )
    )
    sizes = out.groupBy("group_id").agg(F.count(F.lit(1)).alias("group_size"))
    return out.join(sizes, on="group_id").select(
        poly_id, attr, "group_id", "group_size"
    )
