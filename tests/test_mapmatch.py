"""Map-matching: brute-force parity (cover completeness), foot-point
geometry, tie determinism, and partitioning invariance."""
from __future__ import annotations

import pytest

R = 0.3


def _rng(seed):
    s = seed
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield (s >> 11) / float(1 << 53)


def _fixture(n_pts=250, n_segs=50, seed=3):
    g = _rng(seed)
    pts = [(i, -5.0 + 10.0 * next(g), -3.0 + 6.0 * next(g)) for i in range(n_pts)]
    segs = []
    for j in range(n_segs):
        ax, ay = -5.0 + 10.0 * next(g), -3.0 + 6.0 * next(g)
        segs.append((j, ax, ay, ax + 0.8 * (next(g) - 0.5), ay + 0.8 * (next(g) - 0.5)))
    return pts, segs


def _brute(pts, segs):
    out = {}
    for pid, px, py in pts:
        best = None
        for sid, ax, ay, bx, by in segs:
            dx, dy = bx - ax, by - ay
            l2 = dx * dx + dy * dy
            t = min(max(((px - ax) * dx + (py - ay) * dy) / l2, 0.0), 1.0) if l2 > 0 else 0.0
            qx, qy = ax + t * dx, ay + t * dy
            d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
            if d2 <= R * R and (best is None or (d2, sid) < best[:2]):
                best = (d2, sid, t)
        if best is not None:
            out[pid] = (best[1], int(best[0] * 1e12 // 1), int(best[2] * 1e9 // 1))
    return out


@pytest.fixture(scope="module")
def snapped(spark):
    from proj_spark.operators.mapmatch import snap_to_segments

    pts, segs = _fixture()
    pdf = spark.createDataFrame(pts, ["id", "lon", "lat"])
    sdf = spark.createDataFrame(segs, ["seg_id", "ax", "ay", "bx", "by"])
    rows = snap_to_segments(pdf, sdf, R).collect()
    return pts, segs, {r["id"]: (r["seg_id"], r["d2_q"], r["t_q"]) for r in rows}


def test_matches_brute_force(snapped):
    pts, segs, got = snapped
    ref = _brute(pts, segs)
    assert got == ref
    assert len(got) > 50  # fixture actually exercises the radius


def test_tie_breaks_to_smallest_seg_id(spark):
    from proj_spark.operators.mapmatch import snap_to_segments

    # two identical segments, different ids: must pick id 1
    segs = [(9, 0.0, 0.0, 1.0, 0.0), (1, 0.0, 0.0, 1.0, 0.0)]
    pts = [(0, 0.5, 0.1)]
    out = snap_to_segments(
        spark.createDataFrame(pts, ["id", "lon", "lat"]),
        spark.createDataFrame(segs, ["seg_id", "ax", "ay", "bx", "by"]),
        R,
    ).collect()
    assert out[0]["seg_id"] == 1


def test_out_of_range_dropped(spark):
    from proj_spark.operators.mapmatch import snap_to_segments

    segs = [(0, 0.0, 0.0, 1.0, 0.0)]
    pts = [(0, 0.5, 5.0)]
    out = snap_to_segments(
        spark.createDataFrame(pts, ["id", "lon", "lat"]),
        spark.createDataFrame(segs, ["seg_id", "ax", "ay", "bx", "by"]),
        R,
    ).collect()
    assert out == []


def test_partitioning_invariance(spark):
    from proj_spark.operators.mapmatch import snap_to_segments

    pts, segs = _fixture(n_pts=120, n_segs=25, seed=11)
    sdf = spark.createDataFrame(segs, ["seg_id", "ax", "ay", "bx", "by"])
    a = spark.createDataFrame(pts, ["id", "lon", "lat"]).repartition(1)
    b = spark.createDataFrame(pts, ["id", "lon", "lat"]).repartition(6, "lat")
    ra = {r["id"]: tuple(r) for r in snap_to_segments(a, sdf, R).collect()}
    rb = {r["id"]: tuple(r) for r in snap_to_segments(b, sdf, R).collect()}
    assert ra == rb
