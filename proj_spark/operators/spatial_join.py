"""Point-in-polygon spatial join (north-rule operator).

Algorithm: cell-bucketed candidate generation + native ray casting.

1. Polygon prep (small side, driver-light, all DataFrame ops):
   ring -> edge array + covering cell ids of the polygon bbox at a
   chosen resolution.  One row per (cell, polygon) with the full edge
   array carried along.
2. Candidate join: points compute their cell id (pure expression,
   functions/expressions.cell_id) and broadcast-join the cell->polygon
   table.  With a broadcast small side this is a ZERO-shuffle join of
   the 10^12-row table — the big side never moves.
3. Refinement: even-odd ray casting evaluated as a higher-order
   array expression (size(filter(edges, crossing-predicate)) % 2) —
   native, codegen'd, no Python and no per-candidate shuffle.
4. First-match-wins: min(struct(poly_seq, poly_id)) per point —
   algebraic aggregate (map-side combine), mirroring the reference's
   ordered grid-list semantics (src/pj_apply_gridshift.c:143: first
   containing grid in list order wins; on miss the point passes
   through unshifted, here: no output row / null poly depending on
   ``how``).

Skew: hot cells (one urban cell holding 10^8 points) are harmless on
the join itself (broadcast = no partition by cell). The final
per-point aggregate partitions by point id, which is uniform.  For
grouped outputs per polygon use operators.skew.salted_agg.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import expressions as E

# A ray-cast needs the edge list; keep it as array<struct> so the whole
# candidate evaluation is one higher-order expression.
_EDGE = "struct<x1:double,y1:double,x2:double,y2:double>"


def polygon_edges(polys: DataFrame, ring: str = "ring", poly_id: str = "poly_id") -> DataFrame:
    """ring array<struct<lon,lat>> -> closed edge array + bbox.

    Adds ``poly_seq`` (zero-based input order — the first-match
    priority, analog of grid list position) if not present.
    """
    if "poly_seq" not in polys.columns:
        polys = polys.withColumn(
            "poly_seq", F.row_number().over(Window.orderBy(poly_id)) - 1
        )
    # edges i -> i+1 (ring is closed: last == first, so stop at n-2)
    edges = F.expr(
        f"transform(slice({ring}, 1, size({ring}) - 1), (v, i) -> "
        f"named_struct('x1', v.lon, 'y1', v.lat, "
        f"'x2', {ring}[i + 1].lon, 'y2', {ring}[i + 1].lat))"
    )
    lons = F.expr(f"transform({ring}, v -> v.lon)")
    lats = F.expr(f"transform({ring}, v -> v.lat)")
    out = polys.withColumn("edges", edges)
    out = (
        out.withColumn("bbox_w", F.array_min(lons))
        .withColumn("bbox_e", F.array_max(lons))
        .withColumn("bbox_s", F.array_min(lats))
        .withColumn("bbox_n", F.array_max(lats))
    )
    return out


def polygon_cover(polys_edged: DataFrame, res: int) -> DataFrame:
    """Explode each polygon's bbox into covering cell ids at ``res``.

    Equirectangular cells make the cover a rectangle of cell indices:
    sequence(ix_min..ix_max) x sequence(iy_min..iy_max) — all native.
    """
    n = 1 << res
    two_n = 2 * n

    def ix_of(lon):
        v = F.floor((lon + 180.0) / 360.0 * two_n)
        return F.least(F.greatest(v, F.lit(0)), F.lit(two_n - 1))

    def iy_of(lat):
        v = F.floor((lat + 90.0) / 180.0 * n)
        return F.least(F.greatest(v, F.lit(0)), F.lit(n - 1))

    df = (
        polys_edged.withColumn("_ix0", ix_of(F.col("bbox_w")))
        .withColumn("_ix1", ix_of(F.col("bbox_e")))
        .withColumn("_iy0", iy_of(F.col("bbox_s")))
        .withColumn("_iy1", iy_of(F.col("bbox_n")))
    )
    df = df.withColumn("_ix", F.explode(F.sequence("_ix0", "_ix1")))
    df = df.withColumn("_iy", F.explode(F.sequence("_iy0", "_iy1")))
    df = df.withColumn("cell", (F.col("_iy") * two_n + F.col("_ix")).cast("long"))

    # classify each cover cell: fully inside the polygon (every point
    # in it is a hit — candidates skip the ray cast) vs boundary.
    # Sound test: all 4 cell corners inside AND no edge's bbox
    # intersects the cell (an edge crossing the cell would have an
    # overlapping bbox, so the boundary cannot enter).  This runs on
    # the SMALL cover table only; it is the S2-style interior/boundary
    # covering split that makes refinement cost proportional to the
    # boundary band, not the polygon area.
    cell_w = F.col("_ix") * (360.0 / two_n) - 180.0
    cell_e = (F.col("_ix") + 1) * (360.0 / two_n) - 180.0
    cell_s = F.col("_iy") * (180.0 / n) - 90.0
    cell_n_ = (F.col("_iy") + 1) * (180.0 / n) - 90.0
    df = (
        df.withColumn("_cw", cell_w)
        .withColumn("_ce", cell_e)
        .withColumn("_cs", cell_s)
        .withColumn("_cn", cell_n_)
    )
    corner_in = [
        _inside_expr("_cw", "_cs"),
        _inside_expr("_cw", "_cn"),
        _inside_expr("_ce", "_cs"),
        _inside_expr("_ce", "_cn"),
    ]
    edge_touches = F.expr(
        "exists(edges, e -> greatest(e.x1, e.x2) >= _cw AND least(e.x1, e.x2) <= _ce"
        " AND greatest(e.y1, e.y2) >= _cs AND least(e.y1, e.y2) <= _cn)"
    )
    full = corner_in[0] & corner_in[1] & corner_in[2] & corner_in[3] & ~edge_touches
    df = df.withColumn("full", full)
    return df.drop(
        "_ix0", "_ix1", "_iy0", "_iy1", "_ix", "_iy", "_cw", "_ce", "_cs", "_cn"
    )


def _inside_expr(lon_col: str, lat_col: str, edges_col: str = "edges"):
    """Even-odd ray cast (eastward ray) as one native expression."""
    return F.expr(
        f"size(filter({edges_col}, e -> "
        f"((e.y1 > {lat_col}) != (e.y2 > {lat_col})) AND "
        f"{lon_col} < (e.x2 - e.x1) * ({lat_col} - e.y1) / (e.y2 - e.y1) + e.x1"
        f")) % 2 = 1"
    )


def point_in_polygon_join(
    points: DataFrame,
    polys: DataFrame,
    res: int = 6,
    lon: str = "lon",
    lat: str = "lat",
    point_id: str = "point_id",
    how: str = "first_match",
) -> DataFrame:
    """Join points to containing polygons.

    how='first_match': at most one row per point, lowest poly_seq wins
    (reference grid-list semantics). how='all': every containing
    polygon. how='left_first': like first_match but misses kept with
    null poly_id (the reference's pass-through-on-miss,
    src/pj_apply_gridshift.c:243).
    """
    cover = polygon_cover(polygon_edges(polys), res).select(
        "cell", "poly_id", "poly_seq", "edges", "full"
    )
    pts = points.withColumn("_cell", E.cell_id(lon, lat, res))

    if how == "all":
        cand = pts.join(F.broadcast(cover), pts["_cell"] == cover["cell"], "inner")
        # fully-interior cells skip the (non-codegen) ray-cast refinement
        return cand.where(F.col("full") | _inside_expr(lon, lat)).drop(
            "cell", "_cell", "edges", "full"
        )

    if how not in ("first_match", "left_first"):
        raise ValueError(f"unknown how={how!r}")

    # first-match WITHOUT any per-point aggregation: the SMALL cover is
    # pre-grouped into one row per cell with a seq-sorted candidate
    # array (driver-side shuffle of ~10^3 rows), broadcast, and each
    # point selects its first containing candidate as ONE native
    # expression — the 10^12-row side sees a broadcast join plus a
    # projection, ZERO exchanges.  (Correct because a point belongs to
    # exactly one cell, so all its candidates arrive in one array.)
    cell_cands = cover.groupBy("cell").agg(
        F.sort_array(
            F.collect_list(F.struct("poly_seq", "poly_id", "full", "edges"))
        ).alias("_cands")
    )
    j = pts.join(
        F.broadcast(cell_cands),
        pts["_cell"] == cell_cands["cell"],
        "left" if how == "left_first" else "inner",
    )
    first = F.get(
        F.expr(
            f"filter(_cands, c -> c.full OR ("
            f"size(filter(c.edges, e -> "
            f"((e.y1 > {lat}) != (e.y2 > {lat})) AND "
            f"{lon} < (e.x2 - e.x1) * ({lat} - e.y1) / (e.y2 - e.y1) + e.x1"
            f")) % 2 = 1))"
        ),
        F.lit(0),
    )
    out = j.withColumn("_m", first)
    if how == "first_match":
        return out.where(F.col("_m").isNotNull()).select(
            point_id,
            F.col("_m.poly_id").alias("poly_id"),
            F.col("_m.poly_seq").alias("poly_seq"),
        )
    return out.select(
        *[points[c] for c in points.columns],
        F.col("_m.poly_id").alias("poly_id"),
        F.col("_m.poly_seq").alias("poly_seq"),
    )
