"""Tile pyramid (COG-overview) operator: exact integer downsampling,
quadrant placement, missing-child convention, level counts, and
partitioning invariance of the distributed build vs a local replay.
"""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from proj_spark.operators.pyramid import (
    build_pyramid,
    downsample2x,
    pyramid_checksums,
    reduce_level,
)
from proj_spark.sources.images import decode_png, encode_png, synth_pixels


def test_downsample2x_exact():
    c = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    d = downsample2x(c)
    assert d.shape == (2, 2, 3)
    for by in range(2):
        for bx in range(2):
            block = c[2 * by : 2 * by + 2, 2 * bx : 2 * bx + 2].astype(int)
            assert np.array_equal(
                d[by, bx], (block.sum(axis=(0, 1)) // 4).astype(np.uint8)
            )
    # saturation-free at the top of the range
    assert np.array_equal(
        downsample2x(np.full((2, 2, 3), 255, np.uint8)), np.full((1, 1, 3), 255)
    )


def _tiles_df(spark, keyed_px, parts=3):
    rows = [(x, y, encode_png(px)) for (x, y), px in keyed_px.items()]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["x", "y", "bytes"])
    ).repartition(parts)


def test_reduce_level_quadrants_and_missing_children(spark):
    tp = 8
    # three of the four children of parent (5, 7) — child (11, 15) missing
    kids = {
        (10, 14): synth_pixels(1, tp, tp),
        (11, 14): synth_pixels(2, tp, tp),
        (10, 15): synth_pixels(3, tp, tp),
    }
    out = reduce_level(_tiles_df(spark, kids), tp).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["x"], r["y"]) == (5, 7)
    canvas = np.zeros((2 * tp, 2 * tp, 3), np.uint8)
    for (x, y), px in kids.items():
        qx, qy = x & 1, y & 1
        canvas[qy * tp : (qy + 1) * tp, qx * tp : (qx + 1) * tp] = px
    assert np.array_equal(decode_png(bytes(r["bytes"])), downsample2x(canvas))
    # the missing child's quadrant stayed zero
    assert downsample2x(canvas)[tp // 2 :, tp // 2 :].sum() == 0


def _local_pyramid(base, z_from, z_to, tp):
    level = dict(base)
    sums = {(z_from, x, y): int(px.astype(np.int64).sum()) for (x, y), px in level.items()}
    for z in range(z_from - 1, z_to - 1, -1):
        nxt = {}
        for (x, y), px in level.items():
            canvas = nxt.setdefault((x >> 1, y >> 1), np.zeros((2 * tp, 2 * tp, 3), np.uint8))
            canvas[(y & 1) * tp : (y & 1) * tp + tp, (x & 1) * tp : (x & 1) * tp + tp] = px
        level = {k: downsample2x(c) for k, c in nxt.items()}
        sums.update({(z, x, y): int(px.astype(np.int64).sum()) for (x, y), px in level.items()})
    return sums


def test_build_pyramid_matches_local_replay(spark):
    tp = 8
    base = {(16 + i % 5, 32 + i // 5): synth_pixels(i, tp, tp) for i in range(20)}
    pyr = build_pyramid(_tiles_df(spark, base, parts=5), 6, 3, tp)
    got = {
        (r["z"], r["x"], r["y"]): r["checksum"]
        for r in pyramid_checksums(pyr).collect()
    }
    assert got == _local_pyramid(base, 6, 3, tp)
    # level row counts shrink as expected: 20 -> (3x2=6... grid 5x4 -> parents 3x2) etc.
    n_per_z = {}
    for (z, _, _) in got:
        n_per_z[z] = n_per_z.get(z, 0) + 1
    assert n_per_z[6] == 20 and n_per_z[3] == 1
    assert all(n_per_z[z - 1] <= n_per_z[z] for z in range(6, 3, -1))


def test_build_pyramid_partitioning_invariant(spark):
    tp = 8
    base = {(4 + i % 3, 8 + i // 3): synth_pixels(i + 50, tp, tp) for i in range(9)}
    a = {
        (r["z"], r["x"], r["y"]): r["checksum"]
        for r in pyramid_checksums(build_pyramid(_tiles_df(spark, base, 1), 4, 2, tp)).collect()
    }
    b = {
        (r["z"], r["x"], r["y"]): r["checksum"]
        for r in pyramid_checksums(
            build_pyramid(_tiles_df(spark, base, 7).sort(F.desc("y")), 4, 2, tp)
        ).collect()
    }
    assert a == b


def test_build_pyramid_validation(spark):
    df = _tiles_df(spark, {(0, 0): synth_pixels(0, 8, 8)})
    with pytest.raises(ValueError):
        build_pyramid(df, 3, 5, 8)
    with pytest.raises(ValueError):
        build_pyramid(df, 30, 0, 8)
