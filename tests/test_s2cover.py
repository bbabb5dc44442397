"""S2 region coverer: superset guarantee (randomized, incl. wrap /
polar / face-seam boxes), subtree early-emit, range coalescing, the
pushed-down range filter, and the measured row-group pruning a
cell-sorted parquet layout buys — the 100 TB scan story."""
import math
import random

import pytest
from pyspark.sql import functions as F

from proj_spark.functions.s2cell import s2_cell_py, with_s2_cell
from proj_spark.functions.s2cover import (
    _BBox,
    s2_cover_bbox,
    s2_range_predicate,
)

BOXES = [
    (-30.0, 20.0, 40.0, 60.0),  # mid-latitude, 3 faces
    (160.0, -50.0, -150.0, -10.0),  # antimeridian wrap
    (-180.0, 75.0, 180.0, 90.0),  # full-ring polar cap
    (-10.0, -5.0, 10.0, 5.0),  # equator cross, face center
    (85.0, 40.0, 95.0, 50.0),  # face-edge seam cross
    (40.0, -90.0, 60.0, -80.0),  # south-pole-touching wedge
]


def _points_in(box, n, seed):
    rng = random.Random(seed)
    out = []
    while len(out) < n:
        lon = rng.uniform(-180.0, 180.0)
        lat = math.degrees(math.asin(rng.uniform(-1.0, 1.0)))
        if box.contains(lon, lat, eps=0):
            out.append((lon, lat))
    return out


def _in_ranges(c, ranges):
    return any(lo <= c <= hi for lo, hi in ranges)


@pytest.mark.parametrize("bbox", BOXES)
@pytest.mark.parametrize("level", [6, 9])
def test_cover_never_drops_a_point(bbox, level):
    """The certifiable property: cover ⊇ every cell holding a bbox
    point (the intersection test is eps-conservative, never
    false-negative)."""
    cov = s2_cover_bbox(*bbox, level)
    box = _BBox(*bbox)
    for lon, lat in _points_in(box, 1500, seed=hash((bbox, level)) & 0xFFFF):
        assert _in_ranges(s2_cell_py(lon, lat, level), cov)


def test_cover_is_tight():
    """Interior subtrees emit coarse: the covered-cell count stays
    within 25% of the true intersecting-cell count for a 3-face box
    (measured 21,511 vs ~20,100 true at level 8)."""
    cov = s2_cover_bbox(-30, 20, 40, 60, 8, max_ranges=64)
    covered = sum(hi - lo + 1 for lo, hi in cov)
    # true cell fraction ~ area fraction: (70/360) * (sin60-sin20)/2
    frac = (70.0 / 360.0) * (math.sin(math.radians(60)) - math.sin(math.radians(20))) / 2.0
    true_cells = frac * 6 * (1 << 8) ** 2
    assert covered < true_cells * 1.25


def test_range_count_tracks_boundary_not_area():
    """+2 levels: covered cells grow ~16x (area, 4^Δ) but uncapped
    ranges only ~4x (boundary, 2^Δ) — interior collapses into subtree
    emits, so range count is a perimeter quantity (measured 171 -> 728
    ranges vs 21,204 -> 335,179 cells)."""
    r8 = s2_cover_bbox(-30, 20, 40, 60, 8, max_ranges=10**9)
    r10 = s2_cover_bbox(-30, 20, 40, 60, 10, max_ranges=10**9)
    c8 = sum(hi - lo + 1 for lo, hi in r8)
    c10 = sum(hi - lo + 1 for lo, hi in r10)
    assert 12 < c10 / c8 < 18  # area-like
    assert 3 < len(r10) / len(r8) < 6  # boundary-like, not 16x


def test_coalesce_respects_cap_and_superset():
    full = s2_cover_bbox(-30, 20, 40, 60, 9, max_ranges=10**9)
    capped = s2_cover_bbox(-30, 20, 40, 60, 9, max_ranges=12)
    assert len(capped) <= 12
    # every uncapped id is inside some capped range (coalescing only grows)
    for lo, hi in full:
        assert any(clo <= lo and hi <= chi for clo, chi in capped)


def test_empty_and_validation():
    with pytest.raises(ValueError):
        s2_cover_bbox(0, 10, 10, 0, 8)  # lat inverted
    with pytest.raises(ValueError):
        s2_cover_bbox(0, 0, 10, 10, 0)  # bad level
    cov = s2_cover_bbox(5.0, 5.0, 5.0001, 5.0001, 6)  # tiny box
    assert 1 <= len(cov) <= 4
    assert _in_ranges(s2_cell_py(5.00005, 5.00005, 6), cov)


def test_spark_filter_matches_mirror(spark):
    """Cover + refine on Spark == driver-side brute force.  The cover
    is a broadcast left-semi range join (the COMPUTED-cell form — an
    OR-of-BETWEEN filter would be pushed through the Hilbert ladder
    projections, duplicating the ladder per comparison; see
    q_s2_cover_scan's docstring)."""
    rng = random.Random(31)
    rows = [
        (i, rng.uniform(-180, 180), math.degrees(math.asin(rng.uniform(-1, 1))))
        for i in range(4000)
    ]
    w, s, e, n = -30.0, 20.0, 40.0, 60.0
    ranges = s2_cover_bbox(w, s, e, n, 8, max_ranges=48)
    rng_df = spark.createDataFrame(
        [(int(lo), int(hi)) for lo, hi in ranges], "lo long, hi long"
    )
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    got = sorted(
        r["id"]
        for r in with_s2_cell(df, "lon", "lat", 8)
        .join(
            F.broadcast(rng_df),
            F.col("s2").between(F.col("lo"), F.col("hi")),
            "leftsemi",
        )
        .where(F.col("lon").between(w, e) & F.col("lat").between(s, n))
        .collect()
    )
    want = sorted(i for i, lon, lat in rows if w <= lon <= e and s <= lat <= n)
    assert got == want


def test_range_filter_pushed_to_parquet(spark, tmp_path):
    """The OR-of-BETWEEN predicate reaches the parquet scan as pushed
    filters on the materialized cell column — the prerequisite for
    row-group pruning on a cell-sorted table."""
    rng = random.Random(7)
    rows = [
        (i, rng.uniform(-180, 180), math.degrees(math.asin(rng.uniform(-1, 1))))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    path = str(tmp_path / "pts_s2_sorted")
    with_s2_cell(df, "lon", "lat", 8).orderBy("s2").write.parquet(path)
    ranges = s2_cover_bbox(-30, 20, 40, 60, 8, max_ranges=8)
    plan = (
        spark.read.parquet(path)
        .where(s2_range_predicate("s2", ranges))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan
    assert "s2" in plan.split("PushedFilters:")[1][:400]


def test_sorted_layout_prunes_row_groups(tmp_path):
    """The measured layout claim: on an s2-SORTED table the bbox cover
    overlaps few row-group [min, max] stats; on the same data sorted
    by primary key it overlaps nearly all.  (pyarrow footer stats —
    engine-independent, the same pruning parquet-mr/Iceberg do.)"""
    pa = pytest.importorskip("pyarrow")
    pq = pytest.importorskip("pyarrow.parquet")
    rng = random.Random(13)
    n_rows, level = 60_000, 10
    recs = []
    for i in range(n_rows):
        lon = rng.uniform(-180, 180)
        lat = math.degrees(math.asin(rng.uniform(-1.0, 1.0)))
        recs.append((i, lon, lat, s2_cell_py(lon, lat, level)))
    ranges = s2_cover_bbox(-30, 20, 40, 60, level, max_ranges=64)

    def overlap_fraction(order_key):
        recs.sort(key=order_key)
        tbl = pa.table(
            {
                "id": [r[0] for r in recs],
                "s2": [r[3] for r in recs],
            }
        )
        path = str(tmp_path / f"t_{order_key.__name__}.parquet")
        pq.write_table(tbl, path, row_group_size=1000)
        f = pq.ParquetFile(path)
        hit = 0
        for g in range(f.metadata.num_row_groups):
            st = f.metadata.row_group(g).column(1).statistics
            if any(st.min <= hi and lo <= st.max for lo, hi in ranges):
                hit += 1
        return hit / f.metadata.num_row_groups

    def by_cell(r):
        return r[3]

    def by_id(r):
        return r[0]

    sorted_frac = overlap_fraction(by_cell)
    unsorted_frac = overlap_fraction(by_id)
    # measured: 0.167 vs 1.0 — the bbox holds ~5% of the sphere; at
    # this toy scale (60 row groups vs 64 cover ranges) every range
    # straddling a group boundary costs a partial group, so 16.7% is
    # boundary-dominated; with row groups >> ranges (any real table)
    # the fraction converges to the area fraction.
    assert sorted_frac < 0.25
    assert unsorted_frac > 0.9
    assert sorted_frac * 4 < unsorted_frac
