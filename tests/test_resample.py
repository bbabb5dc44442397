"""Trajectory resample: pure-python reference parity, fan cap,
boundary-inclusive (t0, t1] semantics, zero-gap edge."""
from __future__ import annotations

import datetime as dt
import math

import pytest

STEP = 3_600_000_000  # 1 h in us
CAP = 4
BASE = dt.datetime(2024, 3, 1, 0, 30, 0)


def _fixture():
    # user 1: hourly-ish walk; user 2: one 10-h gap (hits the cap);
    # user 3: duplicate timestamps + a zero gap
    rows = []
    for i in range(6):
        rows.append((1, BASE + dt.timedelta(minutes=75 * i), i, -100.0 + i, 40.0 + 0.5 * i))
    rows.append((2, BASE, 100, -90.0, 30.0))
    rows.append((2, BASE + dt.timedelta(hours=10), 101, -80.0, 35.0))
    rows.append((3, BASE, 200, -70.0, 20.0))
    rows.append((3, BASE, 201, -70.5, 20.5))
    rows.append((3, BASE + dt.timedelta(hours=2), 202, -71.0, 21.0))
    return rows


def _reference(rows):
    out = []
    by_user = {}
    for u, ts, tie, lon, lat in rows:
        by_user.setdefault(u, []).append((ts, tie, lon, lat))
    for u, pts in by_user.items():
        pts.sort(key=lambda p: (p[0], p[1]))
        for (t0, _, lon0, lat0), (t1, _, lon1, lat1) in zip(pts, pts[1:]):
            e0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
            e1 = int(t1.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
            if e1 <= e0:
                continue
            k0 = int(math.floor(e0 / float(STEP))) + 1
            k1 = min(int(math.floor(e1 / float(STEP))), k0 + CAP - 1)
            for k in range(k0, k1 + 1):
                frac = (float(k) * STEP - float(e0)) / (float(e1) - float(e0))
                out.append(
                    (
                        u,
                        k * STEP,
                        int(math.floor((lon0 + frac * (lon1 - lon0)) * 1e7)),
                        int(math.floor((lat0 + frac * (lat1 - lat0)) * 1e7)),
                    )
                )
    return sorted(out)


@pytest.fixture(scope="module")
def resampled(spark):
    from proj_spark.operators.resample import resample_trajectories

    rows = _fixture()
    df = spark.createDataFrame(rows, ["entity", "ts", "tie", "lon", "lat"])
    got = resample_trajectories(df, STEP, CAP).collect()
    return rows, sorted((r["entity"], r["epoch_us"], r["lon_q"], r["lat_q"]) for r in got)


def test_matches_pure_python_reference(resampled):
    rows, got = resampled
    assert got == _reference(rows)


def test_cap_limits_long_gap(resampled):
    _, got = resampled
    assert sum(1 for r in got if r[0] == 2) == CAP  # 10-h gap, cap 4


def test_epochs_are_on_grid_and_inside_span(resampled):
    rows, got = resampled
    lo = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    for u, e, _, _ in got:
        assert e % STEP == 0
        assert e > lo


def test_zero_and_negative_gaps_emit_nothing(spark):
    from proj_spark.operators.resample import resample_trajectories

    rows = [(9, BASE, 0, 0.0, 0.0), (9, BASE, 1, 1.0, 1.0)]
    df = spark.createDataFrame(rows, ["entity", "ts", "tie", "lon", "lat"])
    assert resample_trajectories(df, STEP, CAP).collect() == []
