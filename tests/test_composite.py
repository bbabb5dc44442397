"""Best-pixel temporal composite: parity with a single-process
reference, max-t rule, all-cloud pixels, partitioning invariance."""
from __future__ import annotations

import numpy as np
import pytest

from proj_spark.operators.composite import (
    best_pixel_composite,
    lcg_observations,
)

NX, NY, NT, PX, MOD = 2, 2, 5, 32, 5


def _lcg_tile(x, y, t):
    jj = np.arange(PX, dtype=np.int64)[:, None]
    ii = np.arange(PX, dtype=np.int64)[None, :]
    gidx = ((y * NX + x) * NT + t) * PX * PX + jj * PX + ii
    v = (((gidx * 2654435761 + 99991) % (1 << 32)) >> 24).astype(np.uint8)
    m = (((gidx + 7777777) * 2654435761 + 99991) % (1 << 32) % MOD == 0).astype(
        np.uint8
    )
    return v, m


def _reference():
    out = {}
    for y in range(NY):
        for x in range(NX):
            vals = np.zeros((PX, PX), dtype=np.uint8)
            won = np.full((PX, PX), -1, dtype=np.int64)
            for t in range(NT):
                v, m = _lcg_tile(x, y, t)
                ok = m == 0
                vals[ok] = v[ok]
                won[ok] = t
            vals[won < 0] = 0
            out[(x, y)] = (vals, won)
    return out


@pytest.fixture(scope="module")
def composed(spark):
    obs = lcg_observations(spark, NX, NY, NT, PX, cloud_mod=MOD, partitions=6)
    return {
        (r["x"], r["y"]): r
        for r in best_pixel_composite(obs, PX).collect()
    }


def test_matches_reference(composed):
    ref = _reference()
    assert set(composed) == set(ref)
    for key, r in composed.items():
        vals, won = ref[key]
        got = np.frombuffer(r["bytes"], dtype=np.uint8).reshape(PX, PX)
        assert np.array_equal(got, vals), key
        assert r["n_filled"] == int((won >= 0).sum())
        assert r["t_sum"] == int(won[won >= 0].sum())


def test_max_t_rule_not_any_valid(composed):
    """Some pixel must be valid at several t and take the LATEST."""
    ref = _reference()
    multi = 0
    for (x, y), (_, won) in ref.items():
        for t in range(NT - 1):
            v, m = _lcg_tile(x, y, t)
            revisit = (m == 0) & (won > t)
            multi += int(revisit.sum())
    assert multi > 0  # the rule was actually exercised by the fixture


def test_all_cloud_pixel_exists_and_zeroes(spark):
    """With cloud_mod=2 (~50% cloud) and 2 obs, some pixel is cloudy in
    all observations -> composes to 0 and is excluded from n_filled."""
    obs = lcg_observations(spark, 1, 1, 2, PX, cloud_mod=2, partitions=2)
    r = best_pixel_composite(obs, PX).collect()[0]
    assert r["n_filled"] < PX * PX


def test_partitioning_invariance(spark):
    obs = lcg_observations(spark, NX, NY, NT, PX, cloud_mod=MOD, partitions=6)
    a = sorted(map(tuple, best_pixel_composite(obs.repartition(13), PX).collect()))
    b = sorted(map(tuple, best_pixel_composite(obs.coalesce(1), PX).collect()))
    assert a == b
