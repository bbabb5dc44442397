"""Moran's I (operators/autocorr.py): exact values on hand grids
(checkerboard -> -1, smooth gradient -> positive), degenerate cases,
python reference parity, and the broadcast-only plan contract."""
from __future__ import annotations

import numpy as np

from proj_spark.operators.autocorr import morans_i

RES = 3  # 16 x 8 grid
N_COLS = 2 << RES  # 16
N_ROWS = 1 << RES  # 8


def _df(spark, cells):
    return spark.createDataFrame(
        [(int(c), int(v)) for c, v in cells], "cell long, v long"
    )


def _reference(cells):
    """Plain-python Moran pieces with the same integer clearing."""
    cells = dict(cells)
    n = len(cells)
    s = sum(cells.values())
    d = {c: n * v - s for c, v in cells.items()}
    num = w_sum = 0
    for c, di in d.items():
        ix, iy = c % N_COLS, c // N_COLS
        for nc in (
            [c - 1] * (ix > 0)
            + [c + 1] * (ix < N_COLS - 1)
            + [c - N_COLS] * (iy > 0)
            + [c + N_COLS] * (iy < N_ROWS - 1)
        ):
            if nc in d:
                w_sum += 1
                num += di * d[nc]
    den = sum(v * v for v in d.values())
    q = None
    if den > 0 and w_sum > 0:
        q = int(np.floor(float(n * num) * 1e6 / float(w_sum * den)))
    return n, w_sum, num, den, q


def test_checkerboard_is_perfectly_negative(spark):
    cells = [
        (iy * N_COLS + ix, (ix + iy) % 2)
        for iy in range(N_ROWS)
        for ix in range(N_COLS)
    ]
    r = morans_i(_df(spark, cells), RES).collect()[0]
    assert (r["n_cells"], r["w_sum"], r["num"], r["den"], r["morans_q"]) == _reference(cells)
    # checkerboard: every neighbor product is negative -> I = -1 exactly
    assert r["morans_q"] == -1_000_000


def test_gradient_is_positive(spark):
    cells = [
        (iy * N_COLS + ix, ix * 10) for iy in range(N_ROWS) for ix in range(N_COLS)
    ]
    r = morans_i(_df(spark, cells), RES).collect()[0]
    assert (r["n_cells"], r["w_sum"], r["num"], r["den"], r["morans_q"]) == _reference(cells)
    assert r["morans_q"] > 500_000  # strongly clustered


def test_sparse_random_matches_reference(spark):
    rng = np.random.default_rng(11)
    ids = rng.choice(N_COLS * N_ROWS, size=40, replace=False)
    cells = [(int(c), int(rng.integers(0, 50))) for c in ids]
    r = morans_i(_df(spark, cells), RES).collect()[0]
    assert (r["n_cells"], r["w_sum"], r["num"], r["den"], r["morans_q"]) == _reference(cells)


def test_constant_field_yields_null(spark):
    cells = [(i, 7) for i in range(10)]  # d_i = 0 everywhere -> den = 0
    r = morans_i(_df(spark, cells), RES).collect()[0]
    assert r["den"] == 0 and r["morans_q"] is None


def test_isolated_cell_yields_null(spark):
    # two occupied cells far apart: w_sum = 0 -> I undefined
    cells = [(0, 1), (N_COLS * N_ROWS - 1, 5)]
    r = morans_i(_df(spark, cells), RES).collect()[0]
    assert r["w_sum"] == 0 and r["morans_q"] is None


def test_no_hash_exchange_on_cell_table(spark):
    """All joins over the bounded cell table broadcast: the plan must
    contain no hash-partitioning exchange at all."""
    cells = [(i, i % 5) for i in range(30)]
    plan = (
        morans_i(_df(spark, cells), RES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 0, plan


# ------------------------------------------------------------- Gi* hot spots
def _gi_reference(cells):
    """Plain-python Gi* with the same integer clearing + double tree."""
    import math

    cells = dict(cells)
    n = len(cells)
    s = sum(cells.values())
    s2 = sum(v * v for v in cells.values())
    b = n * s2 - s * s
    out = {}
    for c, v in cells.items():
        ix, iy = c % N_COLS, c // N_COLS
        nbrs = [
            c + dy * N_COLS + dx
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
            if (dx >= 0 or ix > 0)
            and (dx <= 0 or ix < N_COLS - 1)
            and (dy >= 0 or iy > 0)
            and (dy <= 0 or iy < N_ROWS - 1)
        ]
        hit = [nc for nc in nbrs if nc in cells]
        w_i = len(hit)
        nbr_sum = sum(cells[nc] for nc in hit)
        a = n * nbr_sum - w_i * s
        cc = n * w_i - w_i * w_i
        z = None
        if b > 0 and cc > 0:
            z = int(
                math.floor(
                    float(a) * 1e6 * math.sqrt(float(n - 1))
                    / math.sqrt(float(b) * float(cc))
                )
            )
        out[c] = (v, w_i, nbr_sum, a, cc, z)
    return out


def test_gi_star_matches_reference(spark):
    from proj_spark.operators.autocorr import gi_star

    rng = np.random.default_rng(23)
    ids = rng.choice(N_COLS * N_ROWS, size=50, replace=False)
    cells = [(int(c), int(rng.integers(0, 40))) for c in ids]
    got = {
        r["cell"]: (r["v"], r["w_i"], r["nbr_sum"], r["a_num"], r["c_den"], r["z_q"])
        for r in gi_star(_df(spark, cells), RES).collect()
    }
    assert got == _gi_reference(cells)


def test_gi_star_hot_cluster_is_positive(spark):
    from proj_spark.operators.autocorr import gi_star

    # a 2x2 block of hot cells in a cold field: the block's z > 0,
    # far-away cold cells' z < 0
    cells = [(iy * N_COLS + ix, 1) for iy in range(N_ROWS) for ix in range(N_COLS)]
    hot = {1 * N_COLS + 1, 1 * N_COLS + 2, 2 * N_COLS + 1, 2 * N_COLS + 2}
    cells = [(c, 50 if c in hot else 1) for c, _ in cells]
    got = {r["cell"]: r["z_q"] for r in gi_star(_df(spark, cells), RES).collect()}
    assert got[1 * N_COLS + 1] > 0
    assert got[5 * N_COLS + 10] < 0
    assert got == {c: z for c, (_, _, _, _, _, z) in _gi_reference(cells).items()}


def test_gi_star_constant_field_yields_null_z(spark):
    from proj_spark.operators.autocorr import gi_star

    cells = [(i, 3) for i in range(12)]
    for r in gi_star(_df(spark, cells), RES).collect():
        assert r["z_q"] is None
        assert r["a_num"] == 0  # n*nbr_sum == w_i*s when all values equal


def test_gi_star_no_hash_exchange(spark):
    from proj_spark.operators.autocorr import gi_star

    cells = [(i, i % 7) for i in range(40)]
    plan = (
        gi_star(_df(spark, cells), RES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 0, plan


# --------------------------------------------------- Mann-Kendall trend
def _mk_df(spark, rows):
    return spark.createDataFrame(rows, "cell long, day long, x long")


def _mk_reference(series):
    """series: list of x over consecutive bins; returns the tuple."""
    import math
    from collections import Counter

    n = len(series)
    s = sum(
        (series[j] > series[i]) - (series[j] < series[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie18 = sum(t * (t - 1) * (2 * t + 5) for t in Counter(series).values())
    var18 = n * (n - 1) * (2 * n + 5) - tie18
    z = None
    if var18 > 0:
        sgn = (s > 0) - (s < 0)
        z = int(math.floor(float(s - sgn) * 1e6 * math.sqrt(18.0) / math.sqrt(float(var18))))
    return n, s, var18, z


def test_mann_kendall_matches_reference(spark):
    from proj_spark.operators.autocorr import mann_kendall

    rng = np.random.default_rng(31)
    series = {c: [int(v) for v in rng.integers(0, 9, 20)] for c in range(6)}
    rows = [(c, d, x) for c, xs in series.items() for d, x in enumerate(xs)]
    got = {
        r["cell"]: (r["n_bins"], r["s_stat"], r["var18"], r["z_q"])
        for r in mann_kendall(_mk_df(spark, rows)).collect()
    }
    assert got == {c: _mk_reference(xs) for c, xs in series.items()}


def test_mann_kendall_monotone_and_flat(spark):
    from proj_spark.operators.autocorr import mann_kendall

    n = 12
    rows = (
        [(1, d, d) for d in range(n)]          # strictly increasing
        + [(2, d, n - d) for d in range(n)]    # strictly decreasing
        + [(3, d, 4) for d in range(n)]        # flat: var18 = 0
    )
    got = {r["cell"]: r for r in mann_kendall(_mk_df(spark, rows)).collect()}
    smax = n * (n - 1) // 2
    assert got[1]["s_stat"] == smax and got[1]["z_q"] > 0
    # mirror up to the floor's asymmetry on negatives
    assert got[2]["s_stat"] == -smax and abs(got[2]["z_q"] + got[1]["z_q"]) <= 1
    assert got[3]["var18"] == 0 and got[3]["z_q"] is None


def test_zero_fill_completes_the_cube(spark):
    from proj_spark.operators.autocorr import zero_fill_bins

    rows = [(1, 0, 5), (1, 2, 7), (2, 1, 1)]  # days {0,1,2}, cells {1,2}
    got = sorted(map(tuple, zero_fill_bins(_mk_df(spark, rows)).collect()))
    assert got == [
        (1, 0, 5), (1, 1, 0), (1, 2, 7),
        (2, 0, 0), (2, 1, 1), (2, 2, 0),
    ]


# ----------------------------------------------------------- local Moran
def _lisa_reference(cells):
    cells = dict(cells)
    n = len(cells)
    s = sum(cells.values())
    d = {c: n * v - s for c, v in cells.items()}
    out = {}
    for c, v in cells.items():
        ix, iy = c % N_COLS, c // N_COLS
        nbrs = [
            c + dy * N_COLS + dx
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
            if not (dx == 0 and dy == 0)
            and (dx >= 0 or ix > 0)
            and (dx <= 0 or ix < N_COLS - 1)
            and (dy >= 0 or iy > 0)
            and (dy <= 0 or iy < N_ROWS - 1)
        ]
        hit = [nc for nc in nbrs if nc in d]
        nd = sum(d[nc] for nc in hit)
        di = d[c]
        if di == 0 or not hit or nd == 0:
            quad = 0
        elif di > 0 and nd > 0:
            quad = 1
        elif di < 0 and nd < 0:
            quad = 2
        elif di > 0:
            quad = 3
        else:
            quad = 4
        out[c] = (v, di, len(hit), nd, di * nd, quad)
    return out


def test_local_moran_matches_reference(spark):
    from proj_spark.operators.autocorr import local_moran

    rng = np.random.default_rng(41)
    ids = rng.choice(N_COLS * N_ROWS, size=60, replace=False)
    cells = [(int(c), int(rng.integers(0, 30))) for c in ids]
    got = {
        r["cell"]: (r["v"], r["d_i"], r["w_i"], r["nbr_d_sum"], r["i_num"], r["quad"])
        for r in local_moran(_df(spark, cells), RES).collect()
    }
    assert got == _lisa_reference(cells)


def test_local_moran_quadrants(spark):
    from proj_spark.operators.autocorr import local_moran

    # hot 2x2 block in a cold field: block cells are HH (1), the cold
    # ring around it is LH (4), far-away cold cells are LL (2)
    cells = [(iy * N_COLS + ix, 1) for iy in range(N_ROWS) for ix in range(N_COLS)]
    hot = {1 * N_COLS + 1, 1 * N_COLS + 2, 2 * N_COLS + 1, 2 * N_COLS + 2}
    cells = [(c, 60 if c in hot else 1) for c, _ in cells]
    got = {r["cell"]: r["quad"] for r in local_moran(_df(spark, cells), RES).collect()}
    assert got[1 * N_COLS + 1] == 1            # HH
    assert got[0 * N_COLS + 0] == 4            # LH: cold corner touching hot
    assert got[6 * N_COLS + 12] == 2           # LL: deep cold field
    assert got == {c: q for c, (_, _, _, _, _, q) in _lisa_reference(cells).items()}


def test_local_moran_no_hash_exchange(spark):
    from proj_spark.operators.autocorr import local_moran

    cells = [(i, i % 4) for i in range(25)]
    plan = (
        local_moran(_df(spark, cells), RES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 0, plan


# ------------------------------------------------------------- Theil-Sen
def _ts_reference(series):
    slopes = sorted(
        (series[j] - series[i]) * 1000000 // (j - i)
        for i in range(len(series))
        for j in range(i + 1, len(series))
    )
    m = len(slopes)
    return m, slopes[(m + 1) // 2 - 1]


def test_theil_sen_matches_reference(spark):
    from proj_spark.operators.autocorr import theil_sen

    rng = np.random.default_rng(53)
    series = {c: [int(v) for v in rng.integers(0, 15, 14)] for c in range(5)}
    rows = [(c, d, x) for c, xs in series.items() for d, x in enumerate(xs)]
    got = {
        r["cell"]: (r["n_pairs"], r["slope_q"])
        for r in theil_sen(_mk_df(spark, rows)).collect()
    }
    assert got == {c: _ts_reference(xs) for c, xs in series.items()}


def test_theil_sen_linear_series_recovers_slope(spark):
    from proj_spark.operators.autocorr import theil_sen

    rows = [(1, d, 3 * d + 7) for d in range(10)]  # exact slope 3
    r = theil_sen(_mk_df(spark, rows)).collect()[0]
    assert r["slope_q"] == 3_000_000 and r["n_pairs"] == 45


def test_theil_sen_negative_slope_floors_correctly(spark):
    from proj_spark.operators.autocorr import theil_sen

    # -7 over 3 days: floor(-7e6/3) = -2333334, NOT trunc -2333333
    rows = [(1, 0, 10), (1, 3, 3)]
    r = theil_sen(_mk_df(spark, rows)).collect()[0]
    assert r["slope_q"] == -2333334


def test_theil_sen_even_pair_count_takes_lower_median(spark):
    from proj_spark.operators.autocorr import theil_sen

    rows = [(1, 0, 0), (1, 1, 1), (1, 2, 0), (1, 3, 9)]  # 6 pairs
    got = theil_sen(_mk_df(spark, rows)).collect()
    assert len(got) == 1
    assert got[0]["n_pairs"] == 6
    assert got[0]["slope_q"] == _ts_reference([0, 1, 0, 9])[1]
