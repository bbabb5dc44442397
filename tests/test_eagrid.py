"""Equal-area cell index (functions/eagrid.py): measured ISEA scale
bounds, icosahedron face-table structure, edge-guard validity, CEA
cell SQL mirror, and knn_join_isea exactness vs brute force —
including polar and face-seam queries.  Reference ancestry:
src/PJ_isea.c (the H3 substrate) and src/PJ_cea.c."""
from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from proj_spark.functions import eagrid as EA
from proj_spark.functions import expressions as E


def _uniform_sphere(n: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    lam = rng.uniform(-math.pi, math.pi, n)
    phi = np.arcsin(rng.uniform(-1.0, 1.0, n))
    return lam, phi


def test_isea_scale_bound():
    """The runtime coverage constant SIGMA_MAX must dominate the
    measured max linear scale (largest Jacobian singular value) of the
    ISEA forward; area scale must be 1 (equal-area) everywhere."""
    lam, phi = _uniform_sphere(60_000)
    fwd = EA._isea_fwd()
    d = 1e-6
    x0, y0 = fwd(lam, phi)
    xe, ye = fwd(lam + d, phi)
    xn, yn = fwd(lam, phi + d)
    j11 = (xe - x0) / (np.cos(phi) * d)
    j21 = (ye - y0) / (np.cos(phi) * d)
    j12 = (xn - x0) / d
    j22 = (yn - y0) / d
    a = j11 * j11 + j21 * j21
    b = j11 * j12 + j21 * j22
    c = j12 * j12 + j22 * j22
    disc = np.sqrt(np.maximum((a + c) ** 2 / 4.0 - (a * c - b * b), 0.0))
    s_max = np.sqrt((a + c) / 2.0 + disc)
    s_min = np.sqrt(np.maximum((a + c) / 2.0 - disc, 0.0))
    # drop finite differences that straddled a face edge (the jump
    # makes the numeric Jacobian meaningless there)
    _, _, edge = EA.isea_xy_edge(lam, phi)
    ok = edge > 10.0 * d
    assert ok.sum() > 50_000
    assert s_max[ok].max() < EA.SIGMA_MAX, s_max[ok].max()
    assert s_max[ok].max() > 1.15  # the bound is TIGHT, not vacuous
    assert s_min[ok].min() > 0.85
    area = s_max[ok] * s_min[ok]
    np.testing.assert_allclose(area, 1.0, atol=5e-4)


def test_face_vertices_are_icosahedron_vertices():
    """Every computed face vertex (direct geodesic from the face
    center, kernels/extra9.py constants) must coincide with one of
    the 12 canonical icosahedron vertices, and all 60 center-to-edge
    distances must equal the face inradius."""
    from proj_spark.kernels.extra9 import _VERTEX

    canon = np.array(
        [
            [math.cos(p) * math.cos(l), math.cos(p) * math.sin(l), math.sin(p)]
            for l, p in _VERTEX
        ]
    )
    for t in range(1, 21):
        for k in range(3):
            assert (canon @ EA._FACE_VERTS[t, k]).max() > 1.0 - 1e-12
    din = np.abs(
        np.arcsin(np.einsum("tj,tkj->tk", EA._FACE_CENTERS[1:], EA._EDGE_POLES[1:]))
    )
    np.testing.assert_allclose(din, din.mean(), atol=1e-9)


def test_edge_guard_is_a_valid_lower_bound():
    """Moving any point by 0.9x its PADDED edge guard (edge_rad minus
    EDGE_EPS_RAD — the guard knn_join_isea actually uses; the raw
    bound fails inside the kernel's 5e-6 rad first-match tolerance
    band) in ANY direction must not cross a face edge: the plane
    displacement stays under SIGMA_MAX x the geodesic step (a face
    jump would teleport the image across the unfolded net, violating
    this by orders of magnitude)."""
    lam, phi = _uniform_sphere(20_000, seed=3)
    x, y, e = EA.isea_xy_edge(lam, phi)
    rng = np.random.RandomState(4)
    az = rng.uniform(0.0, 2.0 * math.pi, lam.size)
    d = 0.9 * np.clip(e - EA.EDGE_EPS_RAD, 0.0, None)
    sphi2 = np.clip(np.sin(phi) * np.cos(d) + np.cos(phi) * np.sin(d) * np.cos(az), -1, 1)
    phi2 = np.arcsin(sphi2)
    lam2 = lam + np.arctan2(
        np.sin(az) * np.sin(d) * np.cos(phi), np.cos(d) - np.sin(phi) * sphi2
    )
    x2, y2, _ = EA.isea_xy_edge(lam2, phi2)
    disp = np.hypot(x2 - x, y2 - y)
    assert (disp <= EA.SIGMA_MAX * d + 1e-12).all()


def test_ea_hex_cell_matches_duckdb_mirror(spark):
    """Spark codegen and the DuckDB SQL mirror must agree on every
    equal-area cell id, bit for bit."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    lam, phi = _uniform_sphere(5_000, seed=11)
    pdf = pd.DataFrame({"lon": np.degrees(lam), "lat": np.degrees(phi)})
    got = (
        spark.createDataFrame(pdf)
        .select(EA.ea_hex_cell("lon", "lat", 1.0).alias("cell"))
        .toPandas()["cell"]
        .to_numpy()
    )
    con = duckdb.connect()
    con.register("pts", pdf)
    sql = EA.ea_hex_cell_sql("lon", "lat", 1.0)
    want = con.execute(f"SELECT {sql} AS cell FROM pts").df()["cell"].to_numpy()
    assert (got == want).all()


def test_ea_hex_cells_are_equal_area(spark):
    """The point of the exercise: under a uniform-on-sphere sample,
    occupancy of CEA hex cells must NOT trend with latitude (equirect
    hex cells at high latitude hold ~cos(lat) fewer points)."""
    import pandas as pd

    lam, phi = _uniform_sphere(400_000, seed=13)
    pdf = pd.DataFrame({"lon": np.degrees(lam), "lat": np.degrees(phi)})
    df = spark.createDataFrame(pdf).select(
        "lat", EA.ea_hex_cell("lon", "lat", 4.0).alias("cell")
    )
    per_cell = (
        df.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.avg(F.abs(F.col("lat"))).alias("alat"))
        .toPandas()
    )
    lo = per_cell[per_cell.alat < 20.0]
    hi = per_cell[(per_cell.alat > 55.0) & (per_cell.alat < 75.0)]
    assert len(lo) > 50 and len(hi) > 50
    # boundary/partial cells drag both means below the interior value
    # equally; equal-area means the MEANS agree within sampling noise
    ratio = hi.n.mean() / lo.n.mean()
    assert 0.9 < ratio < 1.1, ratio


@pytest.fixture(scope="module")
def knn_fixture(spark):
    cand = spark.range(3000).select(
        F.col("id").alias("cand_id"),
        E.synth_lon((F.col("id") * 31 + 7).cast("double"), lo=-179.5, span=359.0).alias("c_lon"),
        E.synth_lat((F.col("id") * 31 + 7).cast("double"), lo=-88.0, span=176.0).alias("c_lat"),
    )
    # queries include polar, near-seam (+-180), and mid-latitude points;
    # several sit near icosahedron face edges by construction of the
    # global spread
    qpts = [(0, -179.7, 10.0), (1, 179.8, -40.0), (2, 0.0, 88.5), (3, 12.0, 47.0),
            (4, -100.0, 35.0), (5, 60.0, -20.0), (6, -179.9, 81.0), (7, 36.0, 52.6),
            (8, -144.0, -52.6), (9, 11.25, 58.28)]
    q = spark.createDataFrame(qpts, "query_id long, q_lon double, q_lat double")
    return q, cand


def test_knn_isea_exact_vs_bruteforce(spark, knn_fixture):
    from proj_spark.operators.knn import knn_join_bruteforce, knn_join_isea

    q, cand = knn_fixture
    got_df = knn_join_isea(q, cand, k=5, size_m=250_000.0, ring=1, max_ring=3)
    brute = knn_join_bruteforce(q, cand, k=5)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in got_df.collect()}
    want = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in brute.collect()}
    assert got == want


def test_knn_isea_plan_broadcasts_ring(spark, knn_fixture):
    from proj_spark.operators.knn import knn_join_isea

    q, cand = knn_fixture
    df = knn_join_isea(q, cand, k=5, size_m=250_000.0, ring=1, max_ring=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_polar_coverage_beats_equirect():
    """The verdict's measurement: at high latitude the equirect hex
    coverage radius collapses by cos(lat) while ISEA's is bounded by
    1/SIGMA_MAX — so for the same nominal cell size, the geodesic
    radius a 1-ring CERTIFIES is several times larger on the ISEA
    plane.  (Certified radius is what decides escalation: a query
    escalates iff its k-th neighbor lies beyond it.)"""
    from proj_spark.functions.hexgrid import SQRT3  # noqa: F401 (parity import)

    earth = E.EARTH_RADIUS_M
    size_deg = 2.0
    size_m_nominal = size_deg * math.pi * earth / 180.0  # same ground size
    cover_deg = (2 * 1.5 - 2.0) * size_deg  # ring=1
    cover_plane = (2 * 1.5 - 2.0) * (size_m_nominal / earth)
    deg_m = math.pi * earth / 180.0
    lats = [0.0, 45.0, 60.0, 70.0, 80.0]
    ratios = []
    for lat in lats:
        phi_b = min(abs(lat) + cover_deg, 89.999999)
        hex_safe = cover_deg * deg_m * math.cos(math.radians(phi_b)) / math.sqrt(2.0)
        isea_safe = cover_plane * earth / EA.SIGMA_MAX
        ratios.append(isea_safe / hex_safe)
    # equirect parity at the equator (within the sqrt(2) vs sigma
    # bookkeeping), blowout at the pole
    assert ratios[0] < 2.5
    assert ratios[-1] > 5.0, ratios


def test_within_distance_isea_exact_vs_bruteforce(spark, knn_fixture):
    """Polar-safe fixed-radius join: same pairs as the all-pairs
    filter, including seam queries (broadcast banded residue) and
    polar queries the equirect version refuses."""
    from proj_spark.operators.knn import within_distance_join_isea

    q, cand = knn_fixture
    r = 900_000.0
    got = within_distance_join_isea(q, cand, r, q_id="query_id")
    got_pairs = {(x["query_id"], x["neighbor_id"]) for x in got.collect()}
    import math as m

    want = set()
    for qr in q.collect():
        for cr in cand.collect():
            p1, p2 = m.radians(qr["q_lat"]), m.radians(cr["c_lat"])
            dl = m.radians(cr["c_lon"] - qr["q_lon"])
            a = (
                m.sin((p2 - p1) / 2) ** 2
                + m.cos(p1) * m.cos(p2) * m.sin(dl / 2) ** 2
            )
            d = 2 * E.EARTH_RADIUS_M * m.asin(min(1.0, m.sqrt(a)))
            if d <= r:
                want.add((qr["query_id"], cr["cand_id"]))
    assert got_pairs == want


def test_within_distance_isea_big_side_never_shuffles(spark, knn_fixture):
    from proj_spark.operators.knn import within_distance_join_isea

    q, cand = knn_fixture
    plan = (
        within_distance_join_isea(q, cand, 400_000.0, q_id="query_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
