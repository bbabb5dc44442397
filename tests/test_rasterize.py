"""Vector->raster coverage (operators/rasterize.py): exact agreement
with a scalar python replay, interior saturation, bounds, validation.
"""
import math

import pytest

from proj_spark.operators.rasterize import _tile_range, rasterize_coverage

SQUARE = [(-100.0, 35.0), (-95.0, 35.0), (-95.0, 40.0), (-100.0, 40.0), (-100.0, 35.0)]


def _inside(lon, lat, ring):
    nc = 0
    for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
        if (y1 > lat) != (y2 > lat) and lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1:
            nc += 1
    return nc % 2 == 1


def _replay(ring, zoom, k):
    n = 1 << zoom
    x0, x1, y0, y1 = _tile_range(ring, zoom)
    out = {}
    for tx in range(x0, x1 + 1):
        for ty in range(y0, y1 + 1):
            cnt = 0
            for si in range(k * k):
                fx = (tx + (si % k + 0.5) / k) / n
                fy = (ty + (si // k + 0.5) / k) / n
                lon = fx * 360.0 - 180.0
                t = math.pi * (1.0 - 2.0 * fy)
                lat = math.degrees(math.atan((math.exp(t) - math.exp(-t)) / 2.0))
                if _inside(lon, lat, ring):
                    cnt += 1
            if cnt:
                out[(tx, ty)] = cnt
    return out


def test_matches_scalar_replay_and_saturates_interior(spark):
    zoom, k = 7, 4
    got = {
        (r.tile_x, r.tile_y): (r.n_inside, r.coverage_e4)
        for r in rasterize_coverage(spark, [("sq", SQUARE)], zoom, k).collect()
    }
    exp = _replay(SQUARE, zoom, k)
    assert {t: v[0] for t, v in got.items()} == exp
    # the 5x5-degree square at zoom 7 (2.8 deg tiles) fully contains at
    # least one tile -> some tile saturates at coverage 10000; edges are
    # partial -> some tile is strictly between
    covs = sorted(v[1] for v in got.values())
    assert covs[-1] == 10000
    assert any(0 < c < 10000 for c in covs)
    assert all(0 < c <= 10000 for c in covs)


def test_supersample_one_is_center_pip(spark):
    zoom = 7
    got = {
        (r.tile_x, r.tile_y): r.coverage_e4
        for r in rasterize_coverage(spark, [("sq", SQUARE)], zoom, 1).collect()
    }
    assert got  # non-empty
    assert set(got.values()) == {10000}  # k=1: inside tiles are all-or-nothing
    assert {t: 1 for t in got} == _replay(SQUARE, zoom, 1)


def test_multiple_polygons_keep_ids(spark):
    other = [(p[0] + 12.0, p[1]) for p in SQUARE]
    out = rasterize_coverage(spark, [("a", SQUARE), ("b", other)], 7, 2).collect()
    ids = {r.poly_id for r in out}
    assert ids == {"a", "b"}


def test_validation(spark):
    with pytest.raises(ValueError):
        rasterize_coverage(spark, [("sq", SQUARE)], 0, 4)
    with pytest.raises(ValueError):
        rasterize_coverage(spark, [("sq", SQUARE)], 7, 0)


def test_zonal_stats_matches_replay_and_is_partition_invariant(spark):
    """zonal_stats equals an exact numpy replay (decode + mask +
    aggregate per zone) and is invariant under repartitioning — the
    map-side partials are algebraic."""
    import numpy as np
    import pandas as pd

    from proj_spark.operators.rasterize import rasterize_masks, zonal_stats
    from proj_spark.sources.images import encode_png

    zoom, tp = 7, 8
    other = [(p[0] + 12.0, p[1]) for p in SQUARE]
    polys = [("a", SQUARE), ("b", other)]
    masks = rasterize_masks(spark, polys, zoom, tp)
    mrows = [
        (r.poly_id, r.tile_x, r.tile_y, bytes(r.mask)) for r in masks.collect()
    ]

    def pix(tx, ty):
        si = np.arange(tp * tp, dtype=np.int64)[:, None]
        ch = np.arange(3, dtype=np.int64)[None, :]
        return ((tx * 31 + ty * 17 + si * 7 + ch * 5) % 256).astype(np.uint8)

    tile_ids = sorted({(tx, ty) for _, tx, ty, _ in mrows})
    tiles_rows = [
        (tx, ty, encode_png(pix(tx, ty).reshape(tp, tp, 3))) for tx, ty in tile_ids
    ]
    tiles = spark.createDataFrame(
        pd.DataFrame(tiles_rows, columns=["x", "y", "bytes"])
    )

    exp = {}
    for pid, tx, ty, m in mrows:
        bits = np.unpackbits(np.frombuffer(m, np.uint8))[: tp * tp].astype(bool)
        flat = pix(tx, ty)[bits].astype(np.int64)
        luma = flat.sum(axis=1)
        a = exp.setdefault(pid, [0, 0, 0, 0, 0, 10**9, -1])
        a[0] += 1
        a[1] += flat.shape[0]
        a[2] += int(flat[:, 0].sum())
        a[3] += int(flat[:, 1].sum())
        a[4] += int(flat[:, 2].sum())
        a[5] = min(a[5], int(luma.min()))
        a[6] = max(a[6], int(luma.max()))

    for reparts in (1, 7):
        got = {
            r.poly_id: [r.n_tiles, r.n_pix, r.sum_r, r.sum_g, r.sum_b,
                        r.min_luma, r.max_luma]
            for r in zonal_stats(
                tiles.repartition(reparts), masks, tp
            ).collect()
        }
        assert got == exp


def test_masks_match_coverage_and_apply(spark):
    """rasterize_masks popcounts equal rasterize_coverage counts at the
    same sampling; apply_masks zeroes exactly the outside pixels and
    drops tiles with no mask."""
    import numpy as np
    import pandas as pd

    from proj_spark.operators.rasterize import apply_masks, rasterize_masks
    from proj_spark.sources.images import decode_png, encode_png

    zoom, tp = 7, 8
    masks = rasterize_masks(spark, [("sq", SQUARE)], zoom, tp)
    mrows = {
        (r.tile_x, r.tile_y): (r.n_inside, bytes(r.mask)) for r in masks.collect()
    }
    cov = {
        (r.tile_x, r.tile_y): r.n_inside
        for r in rasterize_coverage(spark, [("sq", SQUARE)], zoom, tp).collect()
    }
    assert {t: v[0] for t, v in mrows.items()} == cov
    for t, (n, m) in mrows.items():
        bits = np.unpackbits(np.frombuffer(m, np.uint8))[: tp * tp]
        assert int(bits.sum()) == n
    # tile rasters: constant 200 everywhere; one extra tile far outside
    tiles_rows = [(tx, ty, encode_png(np.full((tp, tp, 3), 200, np.uint8)))
                  for tx, ty in mrows] + [(0, 0, encode_png(np.full((tp, tp, 3), 200, np.uint8)))]
    tiles = spark.createDataFrame(pd.DataFrame(tiles_rows, columns=["x", "y", "bytes"]))
    out = {(r.x, r.y): bytes(r.bytes) for r in apply_masks(tiles, masks, tp).collect()}
    assert set(out) == set(mrows)  # the outside tile (0,0) was dropped
    for t, raw in out.items():
        px = decode_png(raw)
        bits = np.unpackbits(np.frombuffer(mrows[t][1], np.uint8))[: tp * tp].reshape(tp, tp)
        assert np.array_equal(px[:, :, 0] != 0, bits == 1)
        assert np.all(px[bits == 1] == 200)
