"""Marching-squares contour extraction (operators/contour.py): numpy
reference parity, edge-tile cell ownership (no fabricated corners),
saddle-case segment counts, and the single-exchange plan contract."""
from __future__ import annotations

import numpy as np

from proj_spark.operators.contour import _SEGS_PER_CASE, contour_tiles

TS = 8


def _rows(spark, grid):
    h, w = grid.shape
    n_x, n_y = w // TS, h // TS
    rows = [
        (x, y, bytearray(grid[y * TS : (y + 1) * TS, x * TS : (x + 1) * TS].tobytes()))
        for x in range(n_x)
        for y in range(n_y)
    ]
    return spark.createDataFrame(rows, ["x", "y", "bytes"]), n_x, n_y


def _reference(grid, iso):
    """Whole-raster marching squares, rolled up per owning tile."""
    h, w = grid.shape
    b = (grid.astype(np.int64) >= iso).astype(np.int64)
    case = b[:-1, :-1] + 2 * b[:-1, 1:] + 4 * b[1:, 1:] + 8 * b[1:, :-1]
    out = {}
    for gy in range(h - 1):
        for gx in range(w - 1):
            tx, ty = gx // TS, gy // TS
            c = int(case[gy, gx])
            wgt = 1 + ((gy % TS) * TS + (gx % TS)) % 997
            n, s, k = out.get((tx, ty), (0, 0, 0))
            out[(tx, ty)] = (
                n + (c not in (0, 15)),
                s + int(_SEGS_PER_CASE[c]),
                k + c * wgt,
            )
    return out


def test_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    grid = rng.integers(0, 255, (3 * TS, 4 * TS)).astype(np.uint8)
    df, n_x, n_y = _rows(spark, grid)
    got = {
        (r["x"], r["y"]): (r["n_crossed"], r["n_segs"], r["case_cks"])
        for r in contour_tiles(df, TS, n_x, n_y, 128).collect()
    }
    assert got == _reference(grid, 128)


def test_flat_raster_has_no_contours(spark):
    grid = np.full((2 * TS, 2 * TS), 9, dtype=np.uint8)
    df, n_x, n_y = _rows(spark, grid)
    for r in contour_tiles(df, TS, n_x, n_y, 100).collect():
        assert (r["n_crossed"], r["n_segs"], r["case_cks"]) == (0, 0, 0)


def test_saddle_cell_emits_two_segments(spark):
    # one 2x2 checkerboard cell inside an otherwise-flat single tile:
    # corners (hi, lo / lo, hi) -> case 5 or 10 -> 2 segments
    grid = np.zeros((TS, TS), dtype=np.uint8)
    grid[2, 2] = 200
    grid[3, 3] = 200
    df, n_x, n_y = _rows(spark, grid)
    out = {(r["x"], r["y"]): r for r in contour_tiles(df, TS, n_x, n_y, 100).collect()}
    # the saddle cell is (2,2); its 8 surrounding cells each cross once
    ref = _reference(grid, 100)
    assert (out[(0, 0)]["n_crossed"], out[(0, 0)]["n_segs"]) == ref[(0, 0)][:2]
    assert out[(0, 0)]["n_segs"] == out[(0, 0)]["n_crossed"] + 1  # one saddle


def test_edge_tiles_own_fewer_cells(spark):
    """The global last pixel column/row must not fabricate cells: a
    2x1-tile raster has (2*TS-1) x (TS-1) cells in total."""
    rng = np.random.default_rng(3)
    grid = rng.integers(0, 255, (TS, 2 * TS)).astype(np.uint8)
    df, n_x, n_y = _rows(spark, grid)
    rows = contour_tiles(df, TS, n_x, n_y, 1).collect()
    # iso=1 -> nearly every cell is case 15 (all corners >= 1); count
    # total cells as crossed + uncrossed via the reference instead
    ref = _reference(grid, 128)
    got = {
        (r["x"], r["y"]): (r["n_crossed"], r["n_segs"], r["case_cks"])
        for r in contour_tiles(df, TS, n_x, n_y, 128).collect()
    }
    assert set(got) == set(ref) == {(0, 0), (1, 0)}
    assert got == ref


def test_single_exchange_plan(spark):
    grid = np.zeros((TS, TS), dtype=np.uint8)
    df, n_x, n_y = _rows(spark, grid)
    plan = (
        contour_tiles(df, TS, n_x, n_y, 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
