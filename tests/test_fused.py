"""Fused reproject+PIP+tile kernel == the composed operators.

The fused kernel (operators/fused.py) must reproduce, bit-exactly,
what the composed plan (functions.transform -> operators.spatial_join
point_in_polygon_join -> tile exprs -> groupBy) produces — same
transform closure, same ray-cast arithmetic, same tile floor/clamp.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proj_spark.functions import expressions as E
from proj_spark.functions.transform import transform
from proj_spark.operators.fused import (
    reproject_pip_tile_rollup,
    reproject_pip_tile_rows,
)
from proj_spark.operators.gridshift import make_synthetic_grid, register_grid
from proj_spark.operators.spatial_join import point_in_polygon_join

SRC = "+proj=latlong +ellps=clrk66 +nadgrids=conus_syn"
DST = "+proj=latlong +datum=WGS84"
ZOOM = 11


@pytest.fixture(scope="module")
def polys():
    import sys

    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import _fixture_polygons

    return _fixture_polygons()


@pytest.fixture(scope="module")
def points(spark):
    register_grid("conus_syn", make_synthetic_grid())
    # deterministic CONUS-ish cloud, including points outside every
    # polygon and outside the grid (pass-through lane)
    return (
        spark.range(120_000)
        .select(
            F.col("id"),
            ((F.col("id") * 2654435761) % 6200 / 100.0 - 125.0).alias("lon"),
            ((F.col("id") * 2246822519) % 2700 / 100.0 + 24.0).alias("lat"),
        )
        .cache()
    )


def _composed_rollup(points, polys):
    shifted = transform(points, SRC, DST, "lon", "lat")
    pts = shifted.select("id", F.col("x").alias("lon"), F.col("y").alias("lat"))
    pdf = points.sparkSession.createDataFrame(
        [
            {"poly_id": pid, "ring": [{"lon": x, "lat": y} for x, y in ring], "poly_seq": i}
            for i, (pid, ring) in enumerate(polys)
        ]
    )
    assigned = point_in_polygon_join(
        pts, pdf, res=9, lon="lon", lat="lat", point_id="id", how="left_first"
    )
    return (
        assigned.select(
            E.tile_x("lon", F.lit(ZOOM)).alias("tile_x"),
            E.tile_y("lat", F.lit(ZOOM)).alias("tile_y"),
            "poly_seq",
        )
        .groupBy("tile_x", "tile_y", "poly_seq")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_rollup_matches_composed(points, polys):
    fused = reproject_pip_tile_rollup(points, SRC, DST, polys, ZOOM)
    composed = _composed_rollup(points, polys)
    key = ["tile_x", "tile_y", "poly_seq", "n"]
    f = {tuple(r) for r in fused.select(key).collect()}
    c = {tuple(r) for r in composed.select(key).collect()}
    assert len(f - c) == 0 and len(c - f) == 0, (
        f"fused-only={list(f - c)[:5]} composed-only={list(c - f)[:5]}"
    )
    assert sum(r[3] for r in f) == points.count()


def test_rows_matches_composed_assignment(points, polys):
    fused = reproject_pip_tile_rows(points, SRC, DST, polys, ZOOM, id_col="id")
    shifted = transform(points, SRC, DST, "lon", "lat")
    pts = shifted.select("id", F.col("x").alias("lon"), F.col("y").alias("lat"))
    pdf = points.sparkSession.createDataFrame(
        [
            {"poly_id": pid, "ring": [{"lon": x, "lat": y} for x, y in ring], "poly_seq": i}
            for i, (pid, ring) in enumerate(polys)
        ]
    )
    composed = point_in_polygon_join(
        pts, pdf, res=9, lon="lon", lat="lat", point_id="id", how="left_first"
    ).select(
        "id",
        E.tile_x("lon", F.lit(ZOOM)).alias("tile_x"),
        E.tile_y("lat", F.lit(ZOOM)).alias("tile_y"),
        "poly_seq",
    )
    f = {tuple(r) for r in fused.collect()}
    c = {tuple(r) for r in composed.collect()}
    assert f == c


def test_rollup_plan_shape(points, polys):
    """The 100TB plan: pruned 2-column input, one MapInPandas, ONE
    exchange (the tiny packed-key aggregate), no join, no window."""
    fused = reproject_pip_tile_rollup(points, SRC, DST, polys, ZOOM)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "MapInPandas" in plan, plan
    assert "Join" not in plan, plan


def test_invalid_zoom_rejected(points, polys):
    with pytest.raises(ValueError):
        reproject_pip_tile_rollup(points, SRC, DST, polys, 25)


def test_oversized_polygon_set_rejected(points, polys):
    """poly_seq+1 must fit the packed key's 20-bit field; a bigger set
    would silently corrupt tile_y bits (round-3 advice)."""

    class _FakeLen(list):
        def __len__(self):
            return 1 << 20

    with pytest.raises(ValueError, match="packed-key"):
        reproject_pip_tile_rollup(points, SRC, DST, _FakeLen(polys), 12)


def _many_polys(n_polys=80, seed=7):
    """Deterministic overlapping quad soup (> _BUCKETED_THRESHOLD) —
    overlaps make first-match priority observable."""
    import numpy as np

    rng = np.random.default_rng(seed)
    polys = []
    for i in range(n_polys):
        cx = float(rng.uniform(-120.0, -70.0))
        cy = float(rng.uniform(26.0, 48.0))
        w = float(rng.uniform(0.5, 6.0))
        h = float(rng.uniform(0.5, 4.0))
        ring = [
            (cx - w, cy - h),
            (cx + w, cy - h + float(rng.uniform(-0.3, 0.3))),
            (cx + w * 0.8, cy + h),
            (cx - w * 0.9, cy + h * 0.7),
            (cx - w, cy - h),
        ]
        polys.append((f"p{i}", ring))
    return polys


def test_bucketed_assign_matches_linear():
    """The cell-bucketed candidate path (used when |polys| > 32) must
    return identical first-match assignments to the linear scan."""
    import numpy as np

    from proj_spark.operators.fused import (
        _assign_bucketed,
        _assign_linear,
        _build_cover_csr,
        _cover_for,
        _poly_arrays,
    )

    parrays = _poly_arrays(_many_polys())
    rng = np.random.default_rng(11)
    lon = rng.uniform(-130.0, -60.0, 200_000)
    lat = rng.uniform(20.0, 55.0, 200_000)
    lin = _assign_linear(parrays, lon, lat)
    cover = _cover_for(parrays)
    buck = _assign_bucketed(parrays, cover, lon, lat)
    assert (lin == buck).all()
    assert (lin >= 0).any() and (lin < 0).any()  # both lanes exercised
    # resolution-independence: a much coarser and a much finer cover
    # give the same answer (only candidate superset size changes)
    for res in (3, 10):
        assert (
            _assign_bucketed(parrays, _build_cover_csr(parrays, res), lon, lat)
            == lin
        ).all()


def test_bucketed_nonfinite_and_empty():
    import numpy as np

    from proj_spark.operators.fused import (
        _assign_bucketed,
        _cover_for,
        _poly_arrays,
    )

    parrays = _poly_arrays(_many_polys())
    cover = _cover_for(parrays)
    empty = np.empty(0, dtype=np.float64)
    assert _assign_bucketed(parrays, cover, empty, empty).shape == (0,)
    lon = np.array([float("nan"), -100.0, float("inf")])
    lat = np.array([40.0, float("nan"), 40.0])
    assert (_assign_bucketed(parrays, cover, lon, lat) == -1).all()


def test_rows_bucketed_matches_composed(spark):
    """End-to-end: with > _BUCKETED_THRESHOLD polygons the kernel takes
    the bucketed path; results must still equal the composed
    point_in_polygon_join (identity transform isolates the PIP lane)."""
    polys = _many_polys(48, seed=3)
    pts = (
        spark.range(30_000)
        .select(
            F.col("id"),
            ((F.col("id") * 2654435761) % 6200 / 100.0 - 125.0).alias("lon"),
            ((F.col("id") * 2246822519) % 2700 / 100.0 + 24.0).alias("lat"),
        )
    )
    fused = reproject_pip_tile_rows(pts, DST, DST, polys, ZOOM, id_col="id")
    # composed side must see the same deg->rad->deg doubles the fused
    # kernel produces (identity CRS pair still roundtrips the units)
    shifted = transform(pts, DST, DST, "lon", "lat")
    pts = shifted.select("id", F.col("x").alias("lon"), F.col("y").alias("lat"))
    pdf = spark.createDataFrame(
        [
            {"poly_id": pid, "ring": [{"lon": x, "lat": y} for x, y in ring], "poly_seq": i}
            for i, (pid, ring) in enumerate(polys)
        ]
    )
    composed = point_in_polygon_join(
        pts, pdf, res=7, lon="lon", lat="lat", point_id="id", how="left_first"
    ).select(
        "id",
        E.tile_x("lon", F.lit(ZOOM)).alias("tile_x"),
        E.tile_y("lat", F.lit(ZOOM)).alias("tile_y"),
        "poly_seq",
    )
    assert {tuple(r) for r in fused.collect()} == {
        tuple(r) for r in composed.collect()
    }


def test_nonfinite_coordinates_grouped_under_null_tiles(spark, polys):
    """NaN input coords (the transform's per-point failure sentinel)
    must land in the (null, null, null) rollup group, matching the
    composed plan's null tile keys, and must not crash the kernel."""
    df = spark.createDataFrame(
        [(float("nan"), 40.0), (-100.0, 40.0), (-100.0, float("nan"))],
        "lon double, lat double",
    )
    out = reproject_pip_tile_rollup(df, DST, DST, polys, ZOOM)
    rows = {(r.tile_x, r.tile_y, r.poly_seq): r.n for r in out.collect()}
    assert rows[(None, None, None)] == 2
    assert sum(rows.values()) == 3


def test_nonfinite_polygon_bbox_is_skipped_not_crashed():
    """A polygon with a NaN ring vertex must behave as never-matching
    in the bucketed path (as it does in the linear path via NaN-false
    bbox compares), not crash cover construction."""
    import numpy as np

    from proj_spark.operators.fused import (
        _assign_bucketed,
        _assign_linear,
        _cover_for,
        _poly_arrays,
    )

    polys = _many_polys(40)
    polys[7] = ("bad", [(-100.0, float("nan")), (-99.0, 40.0), (-100.0, 41.0),
                        (-100.0, float("nan"))])
    parrays = _poly_arrays(polys)
    cover = _cover_for(parrays)  # must not raise
    rng = np.random.default_rng(2)
    lon = rng.uniform(-130.0, -60.0, 50_000)
    lat = rng.uniform(20.0, 55.0, 50_000)
    assert (
        _assign_bucketed(parrays, cover, lon, lat)
        == _assign_linear(parrays, lon, lat)
    ).all()


def test_cover_res_capped_before_building():
    """One global polygon among many tiny ones must not force a huge
    cover build: the analytic entry count caps the resolution first."""
    from proj_spark.operators.fused import (
        _COVER_ENTRY_CAP,
        _cover_entry_count,
        _cover_for,
        _poly_arrays,
    )

    tiny = _many_polys(40)
    for i, (pid, ring) in enumerate(tiny):
        tiny[i] = (pid, [(x / 400.0 - 100.0, y / 400.0 + 35.0) for x, y in ring])
    world = ("world", [(-180.0, -90.0), (180.0, -90.0), (180.0, 90.0),
                       (-180.0, 90.0), (-180.0, -90.0)])
    parrays = _poly_arrays(tiny + [world])
    cover = _cover_for(parrays)
    assert cover[2].size <= _COVER_ENTRY_CAP
    assert _cover_entry_count(parrays, cover[3]) == cover[2].size
