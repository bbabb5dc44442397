"""STR-style sample-based balanced spatial partitioning.

At 10^12 rows, a fixed lon/lat (or tile) grid skews badly: one urban
cell holds millions of image centroids while ocean cells hold none,
so any grid-keyed shuffle puts the whole city on one reducer.  The
classical cure (STR bulk loading, used by every distributed spatial
engine) is DATA-DEPENDENT boundaries: take a small deterministic
sample, cut the longitude axis into ``n_slabs`` equal-count slabs at
sample quantiles, then cut each slab into ``n_cells`` equal-count
latitude cells at per-slab sample quantiles.  Every partition then
holds ~|points| / (n_slabs * n_cells) rows regardless of how the data
clusters — the property a hash partitioner cannot give for RANGE
queries (neighbors stay co-located) and a fixed grid cannot give for
SKEWED data.

Scale shape: the sample is |points| / sample_mod rows (choose
sample_mod so it fits one executor; quantiles need only the sample).
Boundary tables are n_slabs and n_slabs*n_cells rows — broadcast.
Point assignment is two broadcast range-joins where the (lo, hi]
ranges PARTITION the axis, so each point matches exactly one row: no
fan, no post-join aggregate, zero extra shuffle on the big side.
The output partition id is then a skew-free shuffle/sort key for
downstream spatial joins (the same role Sedona's spatial partitioner
plays).

Determinism: the sample is ``pmod(id, sample_mod) = 0`` (no RNG), the
quantile is SQL-standard ``ntile`` over a total order (lon, id), and
boundaries are (lo, hi] with lo/hi = +-infinity at the ends — an SQL
engine replays the whole construction verbatim, which is how the
driver's DuckDB oracle checks it.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INF = float("inf")


def _bounds(sample: DataFrame, part_cols: list[str], val: str, n: int) -> DataFrame:
    """Equal-count (lo, hi] ranges per group: ntile over (val, id),
    hi = max(val) per tile (last tile -> +inf), lo = previous hi
    (first tile -> -inf).  Output: part_cols + (bucket, lo, hi)."""
    w = Window.partitionBy(*part_cols).orderBy(F.col(val), F.col("id"))
    tiled = sample.withColumn("bucket", F.ntile(n).over(w))
    hi = tiled.groupBy(*part_cols, "bucket").agg(F.max(val).alias("_mx"))
    w2 = Window.partitionBy(*part_cols).orderBy("bucket")
    return hi.select(
        *part_cols,
        "bucket",
        F.coalesce(F.lag("_mx").over(w2), F.lit(-_INF)).alias("lo"),
        F.when(
            F.col("bucket") == F.max("bucket").over(w2.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing)),
            F.lit(_INF),
        ).otherwise(F.col("_mx")).alias("hi"),
    )


def str_assign(
    points: DataFrame,
    n_slabs: int = 8,
    n_cells: int = 8,
    sample_mod: int = 16,
    id_col: str = "id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """(id, lon, lat, slab, cell, part_id) per point.

    ``part_id = (slab - 1) * n_cells + (cell - 1)`` in
    [0, n_slabs*n_cells): a balanced range-partition key.  Points on a
    boundary go to the LOWER bucket (lo < v <= hi), matching the
    sample tiling exactly.
    """
    pts = points.select(
        F.col(id_col).alias("id"), F.col(lon).alias("lon"), F.col(lat).alias("lat")
    )
    sample = pts.where(F.pmod(F.col("id"), F.lit(sample_mod)) == 0)

    slab_b = _bounds(sample, [], "lon", n_slabs).withColumnRenamed("bucket", "slab")
    with_slab = pts.join(
        F.broadcast(slab_b),
        (F.col("lon") > F.col("lo")) & (F.col("lon") <= F.col("hi")),
    ).drop("lo", "hi")

    samp_slab = sample.join(
        F.broadcast(slab_b.select("slab", "lo", "hi")),
        (F.col("lon") > F.col("lo")) & (F.col("lon") <= F.col("hi")),
    ).drop("lo", "hi")
    cell_b = _bounds(samp_slab, ["slab"], "lat", n_cells).withColumnRenamed(
        "bucket", "cell"
    )
    out = with_slab.join(
        F.broadcast(cell_b),
        (with_slab["slab"] == cell_b["slab"])
        & (F.col("lat") > F.col("lo"))
        & (F.col("lat") <= F.col("hi")),
    ).drop(cell_b["slab"]).drop("lo", "hi")
    return out.select(
        "id",
        "lon",
        "lat",
        F.col("slab").cast("long").alias("slab"),
        F.col("cell").cast("long").alias("cell"),
        ((F.col("slab") - 1) * n_cells + F.col("cell") - 1)
        .cast("long")
        .alias("part_id"),
    )


def str_partition_stats(
    points: DataFrame,
    n_slabs: int = 8,
    n_cells: int = 8,
    sample_mod: int = 16,
    id_col: str = "id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-partition load + bbox: the balance proof.  One small
    aggregate over the assigned points; coordinates floor-quantized at
    1e-7 deg (~1 cm) so the oracle compare is libm-free."""
    q = 1e7
    a = str_assign(points, n_slabs, n_cells, sample_mod, id_col, lon, lat)
    return a.groupBy("part_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.floor(F.min("lon") * q).cast("long").alias("lon_min_q"),
        F.floor(F.max("lon") * q).cast("long").alias("lon_max_q"),
        F.floor(F.min("lat") * q).cast("long").alias("lat_min_q"),
        F.floor(F.max("lat") * q).cast("long").alias("lat_max_q"),
    )
