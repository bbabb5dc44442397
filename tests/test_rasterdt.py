"""L1 distance transform (operators/rasterdt.py): chamfer-kernel
exactness property, end-to-end vs the closed-form oracle, and
partitioning invariance."""
import duckdb
import numpy as np
import pytest

from proj_spark.operators.blobs import block_hash_tiles
from proj_spark.operators.rasterdt import (
    _INF,
    _chamfer,
    distance_transform,
    dt_oracle_sql,
)

W, H, TS, ISO = 128, 96, 32, 240


def test_chamfer_is_exact_fixpoint():
    """Two-pass chamfer over the full padded grid equals the 4-neighbor
    min-plus fixpoint (sources inside AND in halo strips, paths along
    halo rows included)."""
    rng = np.random.RandomState(11)
    ts = 12
    for _ in range(6):
        pad = np.full((ts + 2, ts + 2), int(_INF), dtype=np.int64)
        pad[1 : ts + 1, 1 : ts + 1] = np.where(
            rng.rand(ts, ts) < 0.06, 0, int(_INF)
        )
        border = np.zeros_like(pad, dtype=bool)
        border[0, :] = border[-1, :] = border[:, 0] = border[:, -1] = True
        hm = border & (rng.rand(ts + 2, ts + 2) < 0.3)
        pad[hm] = rng.randint(0, 30, size=(ts + 2, ts + 2))[hm]
        got = _chamfer(pad.copy()).astype(np.int64)
        ref = pad.copy()
        for _ in range(500):
            n = ref.copy()
            n[1:, :] = np.minimum(n[1:, :], ref[:-1, :] + 1)
            n[:-1, :] = np.minimum(n[:-1, :], ref[1:, :] + 1)
            n[:, 1:] = np.minimum(n[:, 1:], ref[:, :-1] + 1)
            n[:, :-1] = np.minimum(n[:, :-1], ref[:, 1:] + 1)
            if np.array_equal(n, ref):
                break
            ref = n
        want = np.minimum(ref, int(_INF))[1 : ts + 1, 1 : ts + 1]
        assert np.array_equal(got, want)


def test_matches_closed_form_oracle(spark):
    tiles = block_hash_tiles(spark, W, H, TS)
    got = sorted(
        tuple(int(v) for v in r)
        for r in distance_transform(tiles, TS, W // TS, H // TS, ISO).collect()
    )
    want = sorted(
        tuple(int(v) for v in r)
        for r in duckdb.sql(dt_oracle_sql(W, H, TS, ISO)).fetchall()
    )
    assert got == want
    # cross-tile propagation is load-bearing: some tile's max distance
    # exceeds what any single tile could see from its own seeds alone
    assert max(r[4] for r in got) > 0
    assert sum(r[2] for r in got) > 0  # seeds exist


def test_partitioning_invariant(spark):
    a = sorted(
        tuple(r)
        for r in distance_transform(
            block_hash_tiles(spark, W, H, TS, partitions=1),
            TS, W // TS, H // TS, ISO,
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in distance_transform(
            block_hash_tiles(spark, W, H, TS, partitions=7),
            TS, W // TS, H // TS, ISO,
        ).collect()
    )
    assert a == b


def test_converges_before_round_bound(spark):
    """The convergence exit must fire before the n_x+n_y bound on this
    seed-dense fixture (distances max ~20 px << one tile)."""
    tiles = block_hash_tiles(spark, W, H, TS)
    out = distance_transform(
        tiles, TS, W // TS, H // TS, ISO, max_rounds=3
    )
    want = sorted(
        tuple(int(v) for v in r)
        for r in duckdb.sql(dt_oracle_sql(W, H, TS, ISO)).fetchall()
    )
    got = sorted(tuple(int(v) for v in r) for r in out.collect())
    assert got == want
