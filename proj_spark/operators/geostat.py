"""Geostatistics: empirical semivariogram + Ripley's K pair counts.

Both are DISTANCE-BINNED PAIR AGGREGATIONS over a point sample — the
kriging precursor (variogram: gamma(h) = sum (v_a - v_b)^2 / 2N(h) per
lag bin) and the point-process clustering diagnostic (Ripley's K(r) ~
cumulative pair count within r).  One operator serves both: per lag
bin it emits the unordered-pair count and the exact-integer squared
value difference sum; K's cumulative count is a window cumsum the
caller (or SQL) adds.

Scale plan (the part that survives 100 TB):

- pair generation is CELL-BUCKETED exactly like dbscan's
  eps-neighbor join (one side explodes its k-ring, the other keeps
  its single cell id; one equi-join shuffle, AQE-splittable), so the
  candidate fan is |points|·(2r+1)², never |points|².
- each unordered pair is counted ONCE via id_a < id_b.
- the aggregate is n_bins rows with map-side partial combine — the
  output is O(n_bins) no matter the input.

Cross-engine float discipline (the repo convention, green since r1):
Spark and DuckDB evaluate the IDENTICAL haversine double-expression
tree, membership is strict (dist < max_dist), the lag bin is
floor(dist / bin_w), and the value term (v_a - v_b)^2 is exact int64
— so the per-bin rows hash-match bit-for-bit.
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import expressions as E

EARTH_M = E.EARTH_RADIUS_M


def variogram_k(
    points: DataFrame,
    max_dist_m: float,
    n_bins: int,
    res: int = 6,
    id_col: str = "id",
    lon: str = "lon",
    lat: str = "lat",
    value: str = "v",
    max_ring: int = 8,
) -> DataFrame:
    """Per lag bin (bin = floor(dist/bin_w), dist < max_dist_m):
    (bin, n_pairs, sq_sum) with sq_sum = sum (v_a - v_b)^2 over
    unordered pairs — gamma(bin) = sq_sum / (2 n_pairs); Ripley's
    K numerator is sum(n_pairs) over bins <= r/bin_w (cumsum).

    ``value`` must be integral (cast to long) so sq_sum is exact.
    """
    cell_h_deg = 180.0 / (1 << res)
    cell_h_m = math.pi * EARTH_M * cell_h_deg / 180.0
    dphi_deg = math.degrees(max_dist_m / EARTH_M)
    phi_max = points.agg(F.max(F.abs(F.col(lat)))).first()[0] or 0.0
    phi_worst = min(phi_max + dphi_deg, 89.9)
    cos_w = max(math.cos(math.radians(phi_worst)), 1e-6)
    ring = max(
        int(math.ceil((max_dist_m / cell_h_m / cos_w) * (1.0 + 1e-9))), 1
    )
    if ring > max_ring:
        raise ValueError(
            f"max_dist {max_dist_m:.0f} m at |lat|<={phi_worst:.1f} needs "
            f"ring {ring} > max_ring={max_ring} at res={res}; lower res"
        )
    a = points.select(
        F.col(id_col).alias("id_a"),
        F.col(lon).alias("_alon"),
        F.col(lat).alias("_alat"),
        F.col(value).cast("long").alias("_av"),
    ).withColumn(
        "_cell",
        F.explode(
            E.cell_neighbors(E.cell_id("_alon", "_alat", res), res, k=ring)
        ),
    )
    b = points.select(
        F.col(id_col).alias("id_b"),
        F.col(lon).alias("_blon"),
        F.col(lat).alias("_blat"),
        F.col(value).cast("long").alias("_bv"),
    ).withColumn("_bcell", E.cell_id("_blon", "_blat", res))
    bw = float(max_dist_m) / int(n_bins)
    d = F.col("dist_m")
    return (
        a.join(b, a["_cell"] == b["_bcell"], "inner")
        # unordered pairs once; also kills self-pairs
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "dist_m", E.haversine_m("_alon", "_alat", "_blon", "_blat")
        )
        .where(d < F.lit(float(max_dist_m)))
        .select(
            F.floor(d / F.lit(bw)).cast("long").alias("bin"),
            ((F.col("_av") - F.col("_bv")) ** 2).cast("long").alias("_sq"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("_sq").alias("sq_sum"),
        )
    )
