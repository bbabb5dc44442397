"""GeoJSON AOI source/sink (sources/geojson.py): parse shapes, id
precedence, ring closing, holes modes, byte-stable roundtrip, and
end-to-end into the PIP + boundary operators."""
import json

import pytest

from proj_spark.sources.geojson import (
    parse_geojson,
    read_geojson,
    read_geojson_rings,
    write_geojson,
)

SQ = [[-100.0, 35.0], [-95.0, 35.0], [-95.0, 40.0], [-100.0, 40.0], [-100.0, 35.0]]
HOLE = [[-98.0, 36.0], [-97.0, 36.0], [-97.0, 37.0], [-98.0, 36.0]]

FC = {
    "type": "FeatureCollection",
    "features": [
        {"type": "Feature", "id": "alpha",
         "geometry": {"type": "Polygon", "coordinates": [SQ, HOLE]},
         "properties": {"name": "ignored-when-id-set"}},
        {"type": "Feature",
         "geometry": {"type": "MultiPolygon",
                      "coordinates": [[SQ], [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]]]},
         "properties": {"name": "beta"}},
        {"type": "Feature", "geometry": None, "properties": {}},
    ],
}


def test_parse_shapes_ids_and_closing():
    out = parse_geojson(json.dumps(FC))
    ids = [pid for pid, _ in out]
    assert ids == ["alpha", "beta#0", "beta#1"]
    # the open triangle was closed
    tri = dict(out)["beta#1"]
    assert tri[0] == tri[-1] and len(tri) == 4
    # document order is first-match priority; hole dropped by default
    assert all("hole" not in pid for pid in ids)


def test_holes_rows_mode_and_bare_geometry():
    out = parse_geojson(json.dumps(FC), holes="rows")
    assert [pid for pid, _ in out][:2] == ["alpha", "alpha~hole1"]
    bare = parse_geojson(json.dumps({"type": "Polygon", "coordinates": [SQ]}))
    assert [pid for pid, _ in bare] == ["f0"]
    with pytest.raises(ValueError):
        parse_geojson(json.dumps({"type": "Point", "coordinates": [0.0, 0.0]}))
    with pytest.raises(ValueError):
        parse_geojson(json.dumps({"type": "FeatureCollection", "features": []}))


def test_roundtrip_is_byte_stable(tmp_path):
    polys = parse_geojson(json.dumps(FC))
    p1, p2 = str(tmp_path / "a.geojson"), str(tmp_path / "b.geojson")
    write_geojson(polys, p1)
    write_geojson(read_geojson_rings(p1), p2)
    with open(p1, "rb") as a, open(p2, "rb") as b:
        assert a.read() == b.read()
    assert read_geojson_rings(p1) == polys


def test_feeds_pip_and_boundary_operators(spark, tmp_path):
    from pyspark.sql import functions as F

    from proj_spark.operators.boundary import boundary_distance_join
    from proj_spark.operators.spatial_join import point_in_polygon_join

    path = str(tmp_path / "aoi.geojson")
    write_geojson(parse_geojson(json.dumps(FC)), path)
    pdf = read_geojson(spark, path)
    assert pdf.columns == ["poly_seq", "poly_id", "ring"]
    pts = spark.createDataFrame(
        [(1, -97.0, 37.0), (2, 0.5, 0.4), (3, 50.0, 50.0)],
        "pk long, lon double, lat double",
    )
    pip = {
        r.pk: r.poly_id
        for r in point_in_polygon_join(
            pts, pdf, res=5, point_id="pk", how="first_match"
        ).collect()
    }
    assert pip[1] == "alpha" and pip[2] == "beta#1" and 3 not in pip
    near = {
        r.pk: r.nearest_poly
        for r in boundary_distance_join(pts, read_geojson_rings(path)).collect()
    }
    assert near[1] == "alpha" and near[2] == "beta#1"
