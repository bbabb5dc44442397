"""Halo-exchange Sobel: parity with a single-process whole-raster
reference (including cross-tile borders), zero-outside rule, and
shuffle-volume accounting of the strip fragments."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from proj_spark.operators.stencil import sobel_tiles
from proj_spark.operators.warp import LatLonGrid, lcg_tiles

NX, NY, TS = 3, 2, 32
GRID = LatLonGrid(
    lon0=0.0, lat0=0.0, dlon=0.01, dlat=0.01,
    width=NX * TS, height=NY * TS, tile_px=TS,
)


def _full_raster():
    w, h = NX * TS, NY * TS
    gx = np.arange(w, dtype=np.int64)[None, :]
    gy = np.arange(h, dtype=np.int64)[:, None]
    gidx = gy * w + gx
    return (((gidx * 2654435761 + 12345) % (1 << 32)) >> 24).astype(np.int64)


def _reference():
    v = _full_raster()
    pad = np.zeros((v.shape[0] + 2, v.shape[1] + 2), dtype=np.int64)
    pad[1:-1, 1:-1] = v
    e = pad[0:-2, 2:] + 2 * pad[1:-1, 2:] + pad[2:, 2:]
    w = pad[0:-2, 0:-2] + 2 * pad[1:-1, 0:-2] + pad[2:, 0:-2]
    s = pad[2:, 0:-2] + 2 * pad[2:, 1:-1] + pad[2:, 2:]
    n = pad[0:-2, 0:-2] + 2 * pad[0:-2, 1:-1] + pad[0:-2, 2:]
    return np.minimum(np.abs(e - w) + np.abs(s - n), 255).astype(np.uint8)


@pytest.fixture(scope="module")
def result(spark):
    tiles = lcg_tiles(spark, GRID, partitions=3).select(
        F.col("sx").alias("x"), F.col("sy").alias("y"), "bytes"
    )
    return {(r["x"], r["y"]): r for r in sobel_tiles(tiles, TS, NX, NY).collect()}


def test_matches_whole_raster_reference(result):
    """Cross-tile borders must be seamless: the tiled+halo result
    equals the single-array convolution of the full raster."""
    full = _reference()
    assert len(result) == NX * NY
    for (x, y), r in result.items():
        got = np.frombuffer(r["bytes"], dtype=np.uint8).reshape(TS, TS)
        want = full[y * TS : (y + 1) * TS, x * TS : (x + 1) * TS]
        assert np.array_equal(got, want), (x, y)
        m64 = want.astype(np.int64)
        assert r["mag_sum"] == int(m64.sum())
        assert r["n_hi"] == int((m64 > 128).sum())


def test_halo_volume_is_strips_not_tiles(spark):
    """The exchanged fragments must total ~1.06x the input bytes (the
    halo-exchange guarantee), never the naive 9x."""
    from proj_spark.operators.stencil import _FRAG_SCHEMA  # noqa: F401

    tiles = lcg_tiles(spark, GRID, partitions=3).select(
        F.col("sx").alias("x"), F.col("sy").alias("y"), "bytes"
    )
    # re-run just the fragment stage by reaching through the operator:
    # count bytes grouped by fragment kind
    import proj_spark.operators.stencil as st

    frags_df = None

    orig = st.fused_group_map

    def capture(df, keys, kernel, cols, schema):
        nonlocal frags_df
        frags_df = df
        return orig(df, keys, kernel, cols, schema)

    st.fused_group_map = capture
    try:
        sobel_tiles(tiles, TS, NX, NY).count()
    finally:
        st.fused_group_map = orig
    sizes = frags_df.select(
        F.octet_length("frag").alias("sz")
    ).groupBy().agg(F.sum("sz").alias("total")).first()
    in_bytes = NX * NY * TS * TS
    ratio = sizes["total"] / in_bytes
    assert 1.0 < ratio < 1.2, ratio


def test_plan_single_shuffle(spark):
    """Fragment emit is narrow; the only exchange is the group-key
    repartition of the (strip-sized) fragments."""
    tiles = lcg_tiles(spark, GRID, partitions=3).select(
        F.col("sx").alias("x"), F.col("sy").alias("y"), "bytes"
    )
    df = sobel_tiles(tiles, TS, NX, NY)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


# ------------------------------------------------------------- Horn


def _horn_reference():
    """Single-array Horn over the full raster, zero-outside rule."""
    from proj_spark.operators.stencil import _aspect_octant

    v = _full_raster()
    pad = np.zeros((v.shape[0] + 2, v.shape[1] + 2), dtype=np.int64)
    pad[1:-1, 1:-1] = v
    e = pad[0:-2, 2:] + 2 * pad[1:-1, 2:] + pad[2:, 2:]
    w = pad[0:-2, 0:-2] + 2 * pad[1:-1, 0:-2] + pad[2:, 0:-2]
    s = pad[2:, 0:-2] + 2 * pad[2:, 1:-1] + pad[2:, 2:]
    n = pad[0:-2, 0:-2] + 2 * pad[0:-2, 1:-1] + pad[0:-2, 2:]
    p, qn = e - w, n - s
    return p * p + qn * qn, _aspect_octant(p, qn)


def test_horn_matches_whole_raster_reference(spark):
    from proj_spark.operators.stencil import horn_tiles

    tiles = lcg_tiles(spark, GRID, partitions=3).select(
        F.col("sx").alias("x"), F.col("sy").alias("y"), "bytes"
    )
    got = {
        (r["x"], r["y"]): r
        for r in horn_tiles(tiles, TS, NX, NY).collect()
    }
    s2, oct_ = _horn_reference()
    assert len(got) == NX * NY
    for (x, y), r in got.items():
        ws2 = s2[y * TS : (y + 1) * TS, x * TS : (x + 1) * TS]
        woct = oct_[y * TS : (y + 1) * TS, x * TS : (x + 1) * TS]
        assert r["slope_sum"] == int(ws2.sum()), (x, y)
        assert r["n_steep"] == int((ws2 > 96 * 96).sum())
        assert r["n_flat"] == int((woct < 0).sum())
        for i in range(8):
            assert r[f"o{i}"] == int((woct == i).sum()), (x, y, i)
        # octant histogram is total: every pixel is flat or in a sector
        assert r["n_flat"] + sum(r[f"o{i}"] for i in range(8)) == TS * TS


def test_aspect_octant_boundaries():
    """Every 45-degree boundary vector lands in the HIGHER sector it
    opens ([k*45, (k+1)*45) half-open), and all 8 axis/diagonal
    directions classify correctly."""
    from proj_spark.operators.stencil import _aspect_octant

    p = np.array([1, 1, 0, -1, -1, -1, 0, 1, 0])
    qn = np.array([0, 1, 1, 1, 0, -1, -1, -1, 0])
    want = np.array([0, 1, 2, 3, 4, 5, 6, 7, -1])
    assert np.array_equal(_aspect_octant(p, qn), want)


def test_horn_plan_single_shuffle(spark):
    from proj_spark.operators.stencil import horn_tiles

    tiles = lcg_tiles(spark, GRID, partitions=3).select(
        F.col("sx").alias("x"), F.col("sy").alias("y"), "bytes"
    )
    df = horn_tiles(tiles, TS, NX, NY)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
