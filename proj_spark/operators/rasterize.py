"""Vector -> raster: burn polygons into per-tile coverage masks.

The inverse of the raster-tile<->vector assignment join: given polygon
rings, produce for every web-mercator tile the polygon touches the
fraction of the tile inside the polygon (a sparse coverage raster) —
the standard "rasterize the AOI" stage before masking imagery tiles or
weighting per-tile statistics.

Method: supersampling.  Each candidate tile (enumerated from the
polygon's bbox — pure `sequence`/`explode`, no driver loop over tiles)
is sampled at k x k sub-cell centers; a sample is inside by the same
even-odd ray-cast rule as operators/spatial_join (crossing-count
parity against the edge list); coverage = inside / k^2.  Everything is
relational: candidate explode -> broadcast theta-join against the edge
table -> parity aggregate -> coverage rollup, so Catalyst handles the
distribution and the DuckDB oracle replays the identical SQL shape.

100 TB shape: polygons are the SMALL side (broadcast edges); the tile
x sample fan-out is bounded by bbox area x k^2 per polygon and
partitions by polygon — no shuffle of anything larger than
(poly, tile, sample) ids.  Samples with zero crossings never survive
the inner join, which is correct: zero crossings = outside.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Ring = Sequence[Tuple[float, float]]


def _tile_range(ring: Ring, zoom: int) -> tuple[int, int, int, int]:
    n = 1 << zoom
    lons = [p[0] for p in ring]
    lats = [p[1] for p in ring]

    def tx(lon: float) -> int:
        return min(max(int(math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)

    def ty(lat: float) -> int:
        t = math.tan(math.radians(lat))
        v = (1.0 - math.log(t + math.sqrt(t * t + 1.0)) / math.pi) / 2.0 * n
        return min(max(int(math.floor(v)), 0), n - 1)

    # ty grows southward: max lat -> min ty
    return tx(min(lons)), tx(max(lons)), ty(max(lats)), ty(min(lats))


def _inside_samples(
    spark: SparkSession,
    polys: Sequence[Tuple[str, Ring]],
    zoom: int,
    k: int,
) -> DataFrame:
    """(poly_seq, poly_id, tile_x, tile_y, si) for every k x k
    sub-cell-center sample that falls INSIDE its polygon — the shared
    core of coverage fractions and pixel masks."""
    if not 1 <= zoom <= 28:
        raise ValueError(f"zoom must be 1..28, got {zoom}")
    if k < 1:
        raise ValueError("supersample must be >= 1")
    n = float(1 << zoom)

    cand_rows = []
    edge_rows = []
    for seq, (pid, ring) in enumerate(polys):
        x0, x1, y0, y1 = _tile_range(ring, zoom)
        cand_rows.append((seq, pid, x0, x1, y0, y1))
        for (ax, ay), (bx, by) in zip(ring[:-1], ring[1:]):
            edge_rows.append((seq, float(ax), float(ay), float(bx), float(by)))

    cand = spark.createDataFrame(
        cand_rows, "poly_seq int, poly_id string, x0 long, x1 long, y0 long, y1 long"
    )
    edges = spark.createDataFrame(
        edge_rows, "e_seq int, ex1 double, ey1 double, ex2 double, ey2 double"
    )

    tiles = cand.select(
        "poly_seq",
        "poly_id",
        F.explode(F.sequence(F.col("x0"), F.col("x1"))).alias("tile_x"),
        "y0",
        "y1",
    ).select(
        "poly_seq",
        "poly_id",
        "tile_x",
        F.explode(F.sequence(F.col("y0"), F.col("y1"))).alias("tile_y"),
    )
    samples = tiles.select(
        "poly_seq",
        "poly_id",
        "tile_x",
        "tile_y",
        F.explode(F.sequence(F.lit(0), F.lit(k * k - 1))).alias("si"),
    )
    # sub-cell-center sample coordinates; the web-mercator inverse is
    # written with explicit exp() so the DuckDB oracle can reproduce
    # the arithmetic token-for-token
    fx = (F.col("tile_x").cast("double") + (F.col("si") % k + 0.5) / float(k)) / n
    fy = (
        F.col("tile_y").cast("double")
        + (F.floor(F.col("si") / k).cast("double") + 0.5) / float(k)
    ) / n
    lon = fx * 360.0 - 180.0
    tcol = F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * fy)
    sinh = (F.exp(tcol) - F.exp(-tcol)) / 2.0
    lat = F.degrees(F.atan(sinh))
    samples = samples.withColumn("s_lon", lon).withColumn("s_lat", lat)

    crossing = (
        ((F.col("ey1") > F.col("s_lat")) != (F.col("ey2") > F.col("s_lat")))
        & (
            F.col("s_lon")
            < (F.col("ex2") - F.col("ex1"))
            * (F.col("s_lat") - F.col("ey1"))
            / (F.col("ey2") - F.col("ey1"))
            + F.col("ex1")
        )
    )
    joined = samples.join(
        F.broadcast(edges),
        (F.col("poly_seq") == F.col("e_seq")) & crossing,
        "inner",
    )
    return (
        joined.groupBy("poly_seq", "poly_id", "tile_x", "tile_y", "si")
        .agg(F.count(F.lit(1)).alias("nc"))
        .where(F.col("nc") % 2 == 1)
        .select("poly_seq", "poly_id", "tile_x", "tile_y", "si")
    )


def rasterize_coverage(
    spark: SparkSession,
    polys: Sequence[Tuple[str, Ring]],
    zoom: int,
    supersample: int = 4,
) -> DataFrame:
    """-> (poly_id, tile_x, tile_y, n_inside, coverage_e4): sparse
    coverage raster of each polygon at ``zoom``; ``coverage_e4`` is
    floor(1e4 * n_inside / supersample^2) — exact integer, partition-
    invariant.  Tiles with no inside sample are omitted."""
    k = supersample
    inside = _inside_samples(spark, polys, zoom, k)
    return (
        inside.groupBy("poly_id", "tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n_inside"))
        .withColumn(
            "coverage_e4",
            F.floor(F.col("n_inside") * 10000.0 / float(k * k)).cast("long"),
        )
    )


def rasterize_masks(
    spark: SparkSession,
    polys: Sequence[Tuple[str, Ring]],
    zoom: int,
    tile_px: int,
) -> DataFrame:
    """Per-tile PIXEL masks: -> (poly_id, tile_x, tile_y, n_inside,
    mask binary) where ``mask`` packs tile_px*tile_px bits row-major
    (numpy packbits order, bit (row*tile_px + col) = pixel center
    inside the polygon).  Supersampling at k=tile_px makes the sample
    grid coincide with pixel centers, so the mask applies directly to
    a tile raster of the same size (see :func:`apply_masks`)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    inside = _inside_samples(spark, polys, zoom, tile_px)
    grouped = inside.groupBy("poly_id", "tile_x", "tile_y").agg(
        F.collect_list("si").alias("_sis")
    )
    schema = StructType(
        [
            StructField("poly_id", StringType()),
            StructField("tile_x", LongType()),
            StructField("tile_y", LongType()),
            StructField("n_inside", LongType()),
            StructField("mask", BinaryType()),
        ]
    )
    npx = tile_px * tile_px

    def pack(batches):
        for b in batches:
            out = []
            for pid, tx, ty, sis in zip(
                b["poly_id"].to_numpy(),
                b["tile_x"].to_numpy(),
                b["tile_y"].to_numpy(),
                b["_sis"].to_numpy(),
            ):
                bits = np.zeros(npx, np.uint8)
                bits[np.asarray(sis, dtype=np.int64)] = 1
                out.append(
                    (pid, int(tx), int(ty), int(len(sis)), np.packbits(bits).tobytes())
                )
            yield pd.DataFrame(
                out, columns=["poly_id", "tile_x", "tile_y", "n_inside", "mask"]
            )

    return grouped.mapInPandas(pack, schema)


def zonal_stats(
    tiles: DataFrame,
    masks: DataFrame,
    tile_px: int,
    fmt: str = "png",
) -> DataFrame:
    """Zonal statistics — per-polygon-zone pixel aggregates over
    georeferenced raster tiles: join tile rasters (x, y, bytes) with
    :func:`rasterize_masks` output, decode each tile ONCE, restrict to
    the pixels whose centers fall inside the zone, and aggregate.

    -> (poly_id, n_tiles, n_pix, sum_r, sum_g, sum_b, min_luma,
    max_luma) with ``luma = r + g + b`` (integer, exact) so every
    statistic is partition-invariant.

    100 TB shape: the pixel reduction happens INSIDE the decode pass
    (mapInPandas emits one partial row per (batch, zone) — map-side
    combine), so the only exchange after the tile-id join carries
    O(batches x zones) partial rows, never pixels.  The final
    ``groupBy(poly_id)`` is algebraic (sum/min/max of partials).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from proj_spark.sources.images import decode_image

    j = tiles.join(
        masks.select("poly_id", "tile_x", "tile_y", "mask"),
        (tiles["x"] == masks["tile_x"]) & (tiles["y"] == masks["tile_y"]),
        "inner",
    ).select("poly_id", "bytes", "mask")
    schema = StructType(
        [
            StructField("poly_id", StringType()),
            StructField("n_tiles", LongType()),
            StructField("n_pix", LongType()),
            StructField("sum_r", LongType()),
            StructField("sum_g", LongType()),
            StructField("sum_b", LongType()),
            StructField("min_luma", LongType()),
            StructField("max_luma", LongType()),
        ]
    )
    npx = tile_px * tile_px
    cols = list(schema.fieldNames())

    def partials(batches):
        for b in batches:
            acc: dict = {}
            for pid, raw, m in zip(
                b["poly_id"].to_numpy(),
                b["bytes"].to_numpy(),
                b["mask"].to_numpy(),
            ):
                px = decode_image(bytes(raw), fmt).astype(np.int64)
                bits = np.unpackbits(np.frombuffer(bytes(m), np.uint8))[:npx]
                flat = px.reshape(npx, 3)[bits.astype(bool)]
                if flat.shape[0] == 0:  # mask rows always have n_inside >= 1
                    continue
                luma = flat.sum(axis=1)
                a = acc.get(pid)
                if a is None:
                    a = acc[pid] = [0, 0, 0, 0, 0, int(luma.min()), int(luma.max())]
                a[0] += 1
                a[1] += int(flat.shape[0])
                a[2] += int(flat[:, 0].sum())
                a[3] += int(flat[:, 1].sum())
                a[4] += int(flat[:, 2].sum())
                a[5] = min(a[5], int(luma.min()))
                a[6] = max(a[6], int(luma.max()))
            yield pd.DataFrame(
                [(pid, *vals) for pid, vals in acc.items()], columns=cols
            )

    part = j.mapInPandas(partials, schema)
    return part.groupBy("poly_id").agg(
        F.sum("n_tiles").alias("n_tiles"),
        F.sum("n_pix").alias("n_pix"),
        F.sum("sum_r").alias("sum_r"),
        F.sum("sum_g").alias("sum_g"),
        F.sum("sum_b").alias("sum_b"),
        F.min("min_luma").alias("min_luma"),
        F.max("max_luma").alias("max_luma"),
    )


def apply_masks(
    tiles: DataFrame,
    masks: DataFrame,
    tile_px: int,
    fmt: str = "png",
) -> DataFrame:
    """Zero out every pixel outside the AOI: join tile rasters
    (x, y, bytes) with :func:`rasterize_masks` output on the tile id,
    decode, multiply by the unpacked bitmask, re-encode.  Tiles with
    no mask row are dropped — they are entirely outside the AOI (the
    masking stage is also the spatial filter).  Payload crosses
    exactly one exchange (the id join)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from proj_spark.sources.images import decode_image, encode_image

    j = tiles.join(
        masks.select("poly_id", "tile_x", "tile_y", "mask"),
        (tiles["x"] == masks["tile_x"]) & (tiles["y"] == masks["tile_y"]),
        "inner",
    ).select("poly_id", "x", "y", "bytes", "mask")
    schema = StructType(
        [
            StructField("poly_id", StringType()),
            StructField("x", LongType()),
            StructField("y", LongType()),
            StructField("bytes", BinaryType()),
        ]
    )
    npx = tile_px * tile_px

    def run(batches):
        for b in batches:
            out = []
            for pid, x, y, raw, m in zip(
                b["poly_id"].to_numpy(),
                b["x"].to_numpy(),
                b["y"].to_numpy(),
                b["bytes"].to_numpy(),
                b["mask"].to_numpy(),
            ):
                px = decode_image(bytes(raw), fmt)
                bits = np.unpackbits(np.frombuffer(bytes(m), np.uint8))[:npx]
                masked = px * bits.reshape(tile_px, tile_px, 1)
                out.append((pid, int(x), int(y), encode_image(masked.astype(np.uint8), fmt)))
            yield pd.DataFrame(out, columns=["poly_id", "x", "y", "bytes"])

    return j.mapInPandas(run, schema)
