"""GeoJSON (RFC 7946) AOI source/sink.

Polygon sets enter every spatial operator in this engine as the SMALL
side — broadcast covers (operators/spatial_join.py), inline edge
arrays (operators/boundary.py), driver-built candidate tables
(operators/rasterize.py, fused.py).  GeoJSON is the interchange
format users actually hold AOIs in, so this module parses it
driver-side (stdlib ``json``, no geo deps) into the two shapes the
operators accept:

- :func:`read_geojson` -> a DataFrame (poly_seq, poly_id, ring
  array<struct<lon,lat>>) for point_in_polygon_join;
- :func:`read_geojson_rings` -> the plain ``[(poly_id, [(lon, lat),
  ...])]`` fixture list for rasterize/boundary/fused.

Accepted inputs: FeatureCollection, single Feature, or a bare
Polygon/MultiPolygon geometry.  A MultiPolygon yields one row per
part (``<id>#<part>``).  Interior rings (holes) are parsed and kept
as separate ``<id>~hole<k>`` entries when ``holes="rows"`` (the
even-odd ray cast of a hole ring unioned into an edge list flips
containment, which is exactly even-odd hole semantics when the caller
concatenates edge loops) or dropped with ``holes="drop"`` (default —
matches the exterior-ring-only contract of point_in_polygon_join).

Scale note: a GeoJSON AOI file is KBs-to-MBs and configures a
broadcast — parsing it on the driver is the correct plan.  Do NOT
route 10^12-row point data through GeoJSON; points live in
parquet/Iceberg (sources/tables.py).

Feature ids follow RFC 7946 precedence: ``feature.id``, then
``properties.id``, then ``properties.name``, else ``f<index>``.
Rings are closed on read (first vertex appended when missing) because
every consumer in this engine walks edges ``i -> i+1`` over a closed
ring.
"""
from __future__ import annotations

import json
import os
from typing import List, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession

Ring = List[Tuple[float, float]]


def _close(ring: Sequence[Sequence[float]]) -> Ring:
    pts = [(float(p[0]), float(p[1])) for p in ring]
    if len(pts) < 3:
        raise ValueError(f"ring needs >= 3 vertices, got {len(pts)}")
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    return pts


def _feature_id(feat: dict, idx: int) -> str:
    if feat.get("id") is not None:
        return str(feat["id"])
    props = feat.get("properties") or {}
    for k in ("id", "name"):
        if props.get(k) is not None:
            return str(props[k])
    return f"f{idx}"


def _geom_rings(pid: str, geom: dict, holes: str) -> List[Tuple[str, Ring]]:
    gtype = geom.get("type")
    if gtype == "Polygon":
        polys = [geom["coordinates"]]
        part_ids = [pid]
    elif gtype == "MultiPolygon":
        polys = geom["coordinates"]
        part_ids = [f"{pid}#{i}" for i in range(len(polys))]
    elif gtype == "GeometryCollection":
        out: List[Tuple[str, Ring]] = []
        for gi, g in enumerate(geom.get("geometries", [])):
            out.extend(_geom_rings(f"{pid}#g{gi}", g, holes))
        return out
    else:
        raise ValueError(f"unsupported GeoJSON geometry type {gtype!r}")
    out = []
    for part_id, rings in zip(part_ids, polys):
        out.append((part_id, _close(rings[0])))
        if holes == "rows":
            for k, hole in enumerate(rings[1:], 1):
                out.append((f"{part_id}~hole{k}", _close(hole)))
        elif holes != "drop":
            raise ValueError("holes must be 'drop' or 'rows'")
    return out


def parse_geojson(text: str, holes: str = "drop") -> List[Tuple[str, Ring]]:
    """GeoJSON text -> ``[(poly_id, closed_ring), ...]`` in document
    order (the first-match priority order)."""
    doc = json.loads(text)
    t = doc.get("type")
    if t == "FeatureCollection":
        feats = doc.get("features", [])
    elif t == "Feature":
        feats = [doc]
    else:  # bare geometry
        feats = [{"type": "Feature", "geometry": doc, "properties": {}}]
    out: List[Tuple[str, Ring]] = []
    for i, feat in enumerate(feats):
        geom = feat.get("geometry")
        if geom is None:
            continue
        out.extend(_geom_rings(_feature_id(feat, i), geom, holes))
    if not out:
        raise ValueError("no polygon features in GeoJSON input")
    return out


def read_geojson_rings(path_or_text: str, holes: str = "drop") -> List[Tuple[str, Ring]]:
    """Path or raw text -> fixture list for rasterize_coverage /
    boundary_distance_join / fused kernels."""
    if os.path.exists(path_or_text):
        with open(path_or_text, "r", encoding="utf-8") as fh:
            return parse_geojson(fh.read(), holes)
    return parse_geojson(path_or_text, holes)


def read_geojson(
    spark: SparkSession, path_or_text: str, holes: str = "drop"
) -> DataFrame:
    """-> DataFrame (poly_seq int, poly_id string, ring
    array<struct<lon double, lat double>>) — the polygon-side input of
    operators/spatial_join.point_in_polygon_join."""
    rows = [
        {
            "poly_seq": i,
            "poly_id": pid,
            "ring": [{"lon": x, "lat": y} for x, y in ring],
        }
        for i, (pid, ring) in enumerate(read_geojson_rings(path_or_text, holes))
    ]
    return spark.createDataFrame(
        rows,
        "poly_seq int, poly_id string, ring array<struct<lon:double,lat:double>>",
    )


def write_geojson(polys: Sequence[Tuple[str, Ring]], path: str) -> None:
    """Fixture list -> FeatureCollection file (driver-side; AOIs are
    small by contract).  Deterministic: sorted keys, fixed separators,
    so re-exports are byte-stable."""
    doc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "id": pid,
                "properties": {},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[x, y] for x, y in ring]],
                },
            }
            for pid, ring in polys
        ],
    }
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(doc, fh, sort_keys=True, separators=(",", ":"))
    os.replace(tmp, path)
