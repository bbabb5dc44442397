"""Physical-plan quality gates: the operators must produce the plans
the 100TB design calls for (SURVEY.md §4) — broadcast joins on the
small side, column pruning that keeps the binary payload out of
scans, and no shuffle in narrow pipelines."""
from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from proj_spark.functions import expressions as E


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def images(spark, tmp_path_factory):
    from proj_spark.sources.images import generate_images, with_centroids

    path = str(tmp_path_factory.mktemp("plans") / "imgs")
    with_centroids(generate_images(spark, 500, partitions=2)).write.parquet(path)
    return spark.read.parquet(path)


def test_scan_prunes_binary_payload(images):
    """Selecting lon/lat must not read the bytes column (crucial:
    bytes dominates the table size at 10^12 rows)."""
    df = images.select("image_id", "lon", "lat")
    plan = _plan(df.groupBy().count())
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, plan
    assert "bytes" not in scan_lines[0]


def test_filter_pushdown_reaches_scan(images):
    plan = _plan(images.select("image_id").where(F.col("fmt") == "png"))
    assert "PushedFilters: [IsNotNull(fmt), EqualTo(fmt,png)" in plan or "PushedFilters: [IsNotNull(fmt), EqualTo(fmt, png)" in plan, plan


def test_pip_join_is_broadcast_not_shuffle(spark, images):
    """The candidate join must broadcast the polygon cover: the probe
    (image) side never hash-partitions for the join."""
    from proj_spark.operators.spatial_join import point_in_polygon_join

    pdf = spark.createDataFrame(
        [
            {
                "poly_id": "p0",
                "ring": [
                    {"lon": -120.0, "lat": 30.0},
                    {"lon": -90.0, "lat": 30.0},
                    {"lon": -90.0, "lat": 45.0},
                    {"lon": -120.0, "lat": 30.0},
                ],
                "poly_seq": 0,
            }
        ]
    )
    out = point_in_polygon_join(
        images.select("image_id", "lon", "lat"), pdf, res=6, point_id="image_id", how="all"
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_transform_is_narrow(spark, images):
    """The reprojection pipeline must add no Exchange (shuffle)."""
    from proj_spark.functions.transform import transform

    out = transform(
        images.select("lon", "lat"),
        "+proj=latlong +datum=WGS84",
        "+proj=utm +zone=11 +datum=WGS84",
        "lon",
        "lat",
    )
    plan = _plan(out)
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "EvalPython" in plan


def test_tile_rollup_single_big_shuffle(images):
    """Multi-zoom tile counts are hierarchical: the BIG table is
    scanned once and aggregated once (at the finest zoom); coarser
    zooms roll up from that small cached aggregate.  Single-zoom:
    exactly one exchange total."""
    from proj_spark.operators.tiles import tile_counts

    single = tile_counts(images.select("lon", "lat"), [12], "lon", "lat")
    plan = _plan(single)
    assert plan.count("Exchange hashpartitioning") == 1, plan

    out = tile_counts(images.select("lon", "lat"), [4, 8, 12], "lon", "lat")
    plan = _plan(out)
    # hierarchical: ONE scan + ONE aggregation of the big input at the
    # finest zoom, then a tiny explode+rollup of that aggregate —
    # exactly two exchanges, one file scan, in a single job
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("FileScan parquet") == 1, plan


def test_knn_candidate_join_is_broadcast(spark, images):
    from proj_spark.operators.knn import knn_join

    q = spark.createDataFrame([Row(qid=1, qlon=-100.0, qlat=40.0)])
    out = knn_join(
        q,
        images.select(F.col("image_id").alias("cid"), "lon", "lat"),
        k=3,
        res=5,
        ring=2,
        q_id="qid", q_lon="qlon", q_lat="qlat", c_id="cid", c_lon="lon", c_lat="lat",
        verify_cover=False,
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_knn_verify_path_is_lazy_and_caches_ranked(spark, images):
    """verify_cover=True must be LAZY (round-3 review): constructing
    the DataFrame runs NO Spark job — the escalated/brute fallback is
    unioned behind the coverage predicate instead of decided by a
    driver action.  The ranked candidate join is persisted so its two
    consumers (good rows + coverage predicate) materialize it once when
    the caller finally acts."""
    from proj_spark.operators.knn import knn_join

    sc = spark.sparkContext
    q = spark.createDataFrame([Row(qid=1, qlon=-100.0, qlat=40.0)])
    cands = images.select(F.col("image_id").alias("cid"), "lon", "lat")
    # DAGScheduler.nextJobId is the count of jobs ever submitted; it
    # must not move during construction
    jobs_before = sc._jsc.sc().dagScheduler().nextJobId()
    out = knn_join(
        q,
        cands,
        k=3,
        res=5,
        ring=2,
        q_id="qid", q_lon="qlon", q_lat="qlat", c_id="cid", c_lon="lon", c_lat="lat",
        verify_cover=True,
    )
    jobs_after = sc._jsc.sc().dagScheduler().nextJobId()
    assert jobs_after == jobs_before, (
        f"knn_join construction ran {jobs_after - jobs_before} Spark job(s)"
    )
    assert out.count() > 0
    # InMemoryTableScan in the returned plan == the result reads the cache
    assert "InMemoryTableScan" in _plan(out)


def test_cosine_dedup_distinct_exchanges_ids_only(spark):
    """The candidate-pair dedup must shuffle (id_a, id_b) only — the
    embedding vectors re-attach AFTER the distinct (round-2 review:
    distinct over rows carrying both vectors shuffled 2x dim doubles
    per candidate)."""
    from proj_spark.operators.ann import cosine_dedup_pairs

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i + j) for j in range(16)]) for i in range(30)]
    )
    out = cosine_dedup_pairs(df, threshold=0.5, bits=6, dim=16)
    plan = _plan(out)
    # every distinct-aggregate grouping must mention only id columns
    import re

    for m in re.finditer(r"HashAggregate\(keys=\[([^\]]*)\]", plan):
        keys = m.group(1)
        assert "_v" not in keys and "embedding" not in keys, plan


def test_range_join_big_side_never_shuffles(spark):
    """within_distance_join: queries explode + broadcast; the
    candidate side must reach the output through narrow stages only —
    one BroadcastExchange, zero hash-partitioning exchanges."""
    from pyspark.sql import functions as F

    from proj_spark.operators.knn import within_distance_join

    q = spark.range(5).select(
        F.col("id").alias("query_id"),
        (F.lit(-110.0) + F.col("id")).alias("q_lon"),
        (F.lit(35.0) + F.col("id")).alias("q_lat"),
    )
    c = spark.range(10_000).select(
        F.col("id").alias("cand_id"),
        ((F.col("id") % 600) / 10.0 - 125.0).alias("c_lon"),
        ((F.col("id") % 300) / 10.0 + 25.0).alias("c_lat"),
    )
    out = within_distance_join(q, c, 100_000.0, res=6)
    plan = _plan(out)
    assert "BroadcastExchange" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_quadkey_is_pure_codegen(spark, images):
    """quadkey must compile to expressions only — no Python evaluation
    node anywhere in the plan (the claim in expressions.py:quadkey)."""
    df = images.select(
        E.quadkey(E.tile_x("lon", 9), E.tile_y("lat", 9), 9).alias("qk")
    )
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "FlatMapGroupsInPandas" not in plan and "MapInPandas" not in plan, plan


def test_pyramid_level_single_exchange(spark):
    """One reduce_level step = exactly ONE hash-partitioning exchange
    (the parent-keyed groupBy); the payload crosses it once."""
    import pandas as pd

    from proj_spark.operators.pyramid import reduce_level
    from proj_spark.sources.images import encode_png, synth_pixels

    rows = [(i % 4, i // 4, encode_png(synth_pixels(i, 8, 8))) for i in range(16)]
    tiles = spark.createDataFrame(pd.DataFrame(rows, columns=["x", "y", "bytes"]))
    plan = _plan(reduce_level(tiles, 8))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_caption_align_featurizer_is_codegen_and_single_join(spark):
    """The text featurizer must stay JVM-side (no Python eval), and the
    whole alignment plan needs exactly one join."""
    import pandas as pd

    from proj_spark.operators.align import alignment_stats, text_pseudo_embedding

    docs = spark.createDataFrame(
        pd.DataFrame(
            [(i, f"caption {i} text") for i in range(50)],
            columns=["doc_id", "text"],
        )
    )
    plan_tv = _plan(text_pseudo_embedding(docs))
    assert "BatchEvalPython" not in plan_tv and "ArrowEvalPython" not in plan_tv, plan_tv
    emb = spark.createDataFrame(
        pd.DataFrame(
            [(i, [float(i + j) for j in range(64)], i % 3) for i in range(50)],
            columns=["vec_id", "embedding", "label"],
        )
    )
    plan = _plan(alignment_stats(docs, emb, group_col="label"))
    n_joins = sum(plan.count(j) for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"))
    assert n_joins == 1, plan


def test_quadkey_prefix_partitioning_prunes_bbox_scans(spark, images, tmp_path_factory):
    """The locality payoff: a tile table laid out by quadkey prefix
    lets a bbox query prune at the SCAN (partition filters), reading
    only the spatially-relevant slice — the 100 TB reason the
    clustering key exists."""
    out = str(tmp_path_factory.mktemp("qkpart") / "tiles")
    t = images.select(
        "image_id",
        E.tile_x("lon", 9).alias("tx"),
        E.tile_y("lat", 9).alias("ty"),
    ).withColumn("qk", E.quadkey("tx", "ty", 9))
    t.withColumn("qk2", F.substring("qk", 1, 2)).write.partitionBy("qk2").parquet(out)
    back = spark.read.parquet(out)
    # bbox = one zoom-2 ancestor cell == one qk2 prefix
    prefix = t.select(F.substring("qk", 1, 2).alias("p")).first()["p"]
    q = back.where(F.col("qk2") == prefix)
    plan = _plan(q)
    assert "PartitionFilters: [" in plan and "qk2" in plan, plan
    # the pruned scan reads strictly fewer files than the full table
    import glob as _glob
    import os as _os

    n_all = len(_glob.glob(_os.path.join(out, "qk2=*")))
    assert n_all >= 2  # CONUS spans several zoom-2 cells
    rows = q.count()
    assert 0 < rows < back.count()


def test_rasterize_edges_join_is_broadcast(spark):
    """The polygon edge table is the small side: the crossing
    theta-join must broadcast it — the sample fan-out side never
    hash-partitions for the join."""
    from proj_spark.operators.rasterize import rasterize_coverage

    ring = [(-100.0, 35.0), (-95.0, 35.0), (-95.0, 40.0), (-100.0, 40.0), (-100.0, 35.0)]
    out = rasterize_coverage(spark, [("sq", ring)], 7, 4)
    plan = _plan(out)
    assert "BroadcastExchange" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_dissolve_pairs_edge_key_join_no_cartesian(spark):
    """Adjacency-pair generation is |edges| rows through ONE edge-key
    equi-join (dissolve.py module doc) — never geometry x geometry, so
    no cartesian/nested-loop node may appear, and the only exchanges
    are the edge-key hash + the pair distinct."""
    from proj_spark.operators.dissolve import adjacency_pairs

    polys = spark.range(64).select(
        F.col("id").alias("poly_id"),
        (F.col("id") % 4).alias("owner"),
        F.expr(
            "array(named_struct('lon', cast(id % 8 as double), 'lat', cast(id div 8 as double)),"
            " named_struct('lon', cast(id % 8 + 1 as double), 'lat', cast(id div 8 as double)),"
            " named_struct('lon', cast(id % 8 + 1 as double), 'lat', cast(id div 8 + 1 as double)),"
            " named_struct('lon', cast(id % 8 as double), 'lat', cast(id div 8 + 1 as double)),"
            " named_struct('lon', cast(id % 8 as double), 'lat', cast(id div 8 as double)))"
        ).alias("ring"),
    )
    plan = _plan(adjacency_pairs(polys, "owner"))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    n_joins = sum(
        plan.count(j)
        for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    )
    assert n_joins == 1, plan
    # edge-key join (<=2: one per side) + pair distinct (1)
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_segments_both_sides_shuffle_once(spark):
    """Candidate generation shuffles each segment side at most once
    (on the bbox cell key); the crossing predicate filters the joined
    candidates — no cartesian, no re-shuffle of either side."""
    from proj_spark.operators.segments import segment_intersection_join

    def segs(seed: int):
        return spark.range(2_000).select(
            F.col("id").alias("seg_id"),
            ((F.col("id") * 37 + seed) % 600 / 10.0 - 125.0).alias("x1"),
            ((F.col("id") * 59 + seed) % 300 / 10.0 + 25.0).alias("y1"),
            ((F.col("id") * 83 + seed) % 600 / 10.0 - 125.0).alias("x2"),
            ((F.col("id") * 97 + seed) % 300 / 10.0 + 25.0).alias("y2"),
        )

    plan = _plan(segment_intersection_join(segs(1), segs(2), res=6))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    n_joins = sum(
        plan.count(j)
        for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    )
    assert n_joins == 1, plan
    # cell-key join (<=2: one per side) + pair distinct (1)
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_adaptive_bins_one_agg_plus_broadcast(spark):
    """adaptive_bins = the level-exploded count agg + the per-id
    choice agg, with the ok-prefix set BROADCAST back — at most two
    hash exchanges (on this fixture the choice agg pipelines on the
    source partitioning, leaving just one), no sort-merge join
    (adaptive.py:32)."""
    from proj_spark.operators.adaptive import adaptive_bins

    pts = spark.range(5_000).select(
        F.col("id"),
        ((F.col("id") % 600) / 10.0 - 125.0).alias("lon"),
        ((F.col("id") % 300) / 10.0 + 25.0).alias("lat"),
    )
    plan = _plan(adaptive_bins(pts, cap=64, max_level=6))
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_composite_single_bounded_group_shuffle(spark):
    """best_pixel_composite: the observation stack crosses exactly ONE
    hash exchange, keyed (x, y) — group size bounded by the revisit
    count (composite.py:49)."""
    from proj_spark.operators.composite import best_pixel_composite, lcg_observations

    obs = lcg_observations(spark, n_x=2, n_y=2, n_t=3, tile_px=16, partitions=2)
    plan = _plan(best_pixel_composite(obs, 16))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan


def test_chips_broadcast_map_single_shuffle(spark):
    """extract_chips: the chip->source-tile map is BROADCAST onto the
    (big) tile table, then one bounded-fan shuffle keys the fused
    group map by chip_id — the tile side never hash-partitions for
    the join (chips.py:55)."""
    from proj_spark.operators.chips import extract_chips
    from proj_spark.operators.warp import LatLonGrid, lcg_tiles

    grid = LatLonGrid(
        lon0=-120.0, lat0=48.0, dlon=0.02, dlat=0.02,
        width=128, height=128, tile_px=32,
    )
    tiles = lcg_tiles(spark, grid, partitions=2)
    chips = spark.createDataFrame(
        [
            ("c0", -119.5, 46.1, -118.9, 46.9),
            ("c1", -118.2, 45.7, -117.6, 46.3),
        ],
        "chip_id string, lon_w double, lat_s double, lon_e double, lat_n double",
    )
    plan = _plan(extract_chips(tiles, chips, grid, out_px=16))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # the single hash exchange is the chip_id repartition feeding the
    # fused batch-walking kernel
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "MapInPandas" in plan, plan


def test_top_terms_two_phase_agg_then_tiny_window(spark):
    """Heavy hitters: the big explode feeds a hash aggregate with a
    map-side partial (no raw-token shuffle beyond the (lang, term)
    agg), and the top-k window shuffles only the aggregated set —
    exactly two exchanges, partial_count before the exchange."""
    import __spark_entry__ as entry

    df = entry.q_top_terms(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    # map-side combine: a partial_count aggregate must appear UPSTREAM
    # of the first exchange
    first_ex = plan.index("Exchange hashpartitioning")
    assert "partial_count" in plan[first_ex:], plan


def test_str_assign_big_side_broadcast_only(spark):
    """str_assign: the full point table crosses the two range joins as
    BROADCAST joins (boundary tables are n_slabs / n_slabs*n_cells
    rows) — every hash exchange in the plan belongs to the tiny
    sample-quantile windows, so the big side is never hash-partitioned
    (partitioner.py:67)."""
    from proj_spark.operators.partitioner import str_assign

    pts = spark.range(20_000).select(
        "id",
        ((F.col("id") % 580) / 10.0 - 125.0).alias("lon"),
        ((F.col("id") % 240) / 10.0 + 25.0).alias("lat"),
    )
    plan = _plan(str_assign(pts, 8, 8, 16))
    assert plan.count("BroadcastNestedLoopJoin") + plan.count(
        "BroadcastHashJoin"
    ) >= 2, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan
    # hash exchanges only on the sample branch: ntile windows over
    # id%16 rows, never over the unfiltered point table
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "slab" in ln or "SinglePartition" not in ln, ln


def test_kde_single_exchange_bounded_fan(spark):
    """kde_heatmap: the (2k+1)^2 explode is narrow; the only exchange
    is the final cell groupBy with map-side partial combine
    (kde.py:44)."""
    from proj_spark.operators.kde import kde_heatmap

    pts = spark.range(10_000).select(
        ((F.col("id") % 580) / 10.0 - 125.0).alias("lon"),
        ((F.col("id") % 240) / 10.0 + 25.0).alias("lat"),
    )
    plan = _plan(kde_heatmap(pts, 8, 1.5))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Generate explode") == 2, plan
    assert "partial_sum" in plan, plan


def test_snap_points_explode_on_segment_side_only(spark):
    """snap_to_segments: the cover fan (both explodes) lives on the
    broadcast SEGMENT side; the point side crosses one broadcast join
    un-exploded, then one arg-min exchange (mapmatch.py:41)."""
    from proj_spark.operators.mapmatch import snap_to_segments

    pts = spark.range(20_000).select(
        "id",
        ((F.col("id") % 100) / 10.0).alias("lon"),
        ((F.col("id") % 60) / 10.0).alias("lat"),
    )
    segs = spark.range(50).select(
        F.col("id").alias("seg_id"),
        (F.col("id") / 10.0).alias("ax"),
        (F.col("id") / 20.0).alias("ay"),
        (F.col("id") / 10.0 + 0.3).alias("bx"),
        (F.col("id") / 20.0 + 0.2).alias("by"),
    )
    plan = _plan(snap_to_segments(pts, segs, 0.25))
    assert "BroadcastHashJoin" in plan, plan
    # at most the arg-min exchange (on this range fixture Catalyst
    # proves the id-clustering and elides even that one)
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    bcast = plan.split("BroadcastExchange")[-1]
    assert "Generate explode" in bcast, plan  # fan inside the broadcast branch


def test_change_tiles_single_join_no_fan(spark):
    """diff_tiles: the two epochs meet in exactly one equi-join on the
    tile key; payload crosses once per side, no generate/fan
    (changedetect.py:32)."""
    from proj_spark.operators.changedetect import diff_tiles
    from proj_spark.operators.warp import LatLonGrid, lcg_tiles

    grid = LatLonGrid(
        lon0=-10.0, lat0=10.0, dlon=0.1, dlat=0.1, width=64, height=64, tile_px=32
    )
    a = lcg_tiles(spark, grid, partitions=2)
    b = lcg_tiles(spark, grid, partitions=2, mul=2246822519, add=98765)
    plan = _plan(diff_tiles(a, b, 32, 16))
    assert "Generate" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    joins = plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") + plan.count(
        "ShuffledHashJoin"
    )
    assert joins == 1, plan
