"""Inverse-distance-weighted (IDW) surface interpolation onto a grid.

The classic GIS analysis step (Shepard 1968): given scattered sample
points carrying a value, estimate a regular raster where each cell is
the inverse-square-distance weighted mean of the samples within a
search radius.  This is how sparse ground-truth (weather stations,
GCP elevations, calibration targets) becomes a raster layer to join
against the imagery tables.

Scale shape:
- grid cells are generated from ``spark.range`` (no data scan) and
  explode their k-ring of equirectangular index cells; samples carry
  one cell id — an equi-join on the cell key pairs each grid cell
  with only nearby samples (never grid × samples);
- the ring count comes from the radius and the bbox's worst-case
  latitude — closed form, no driver action;
- the exact haversine radius filter runs on the joined pairs; the
  aggregate is one groupBy (cx, cy).

Exactness: distances are floored to whole METERS before weighting and
the weight is the integer division ``10^12 div (dm² + 1)`` — from
there on everything is int64 arithmetic, so any engine that agrees on
the meter floor (identical haversine expression tree) reproduces
(n, sum_w, sum_wv) bit-for-bit; the final IDW value is the exact
rational sum_wv / sum_w, left to the caller so no float division ever
enters the comparison.
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import expressions as E

EARTH_M = E.EARTH_RADIUS_M
_W_NUM = 1_000_000_000_000  # 10^12: w ~ 1e12/d_m² keeps 300km -> w=11


def idw_grid(
    spark: SparkSession,
    samples: DataFrame,
    lon0: float,
    lat0: float,
    pitch_deg: float,
    nx: int,
    ny: int,
    radius_m: float,
    res: int = 6,
    id_col: str = "id",
    lon: str = "lon",
    lat: str = "lat",
    value: str = "value",
    max_ring: int = 8,
) -> DataFrame:
    """(cx, cy, n, sum_w, sum_wv) per grid cell with >= 1 sample within
    ``radius_m`` of its center (lon0 + (cx+0.5)*pitch, lat0 +
    (cy+0.5)*pitch).  ``value`` must be integral (int64)."""
    cell_h_deg = 180.0 / (1 << res)
    cell_h_m = math.pi * EARTH_M * cell_h_deg / 180.0
    dphi_deg = math.degrees(radius_m / EARTH_M)
    phi_worst = min(
        max(abs(lat0), abs(lat0 + ny * pitch_deg)) + dphi_deg, 89.9
    )
    cos_w = max(math.cos(math.radians(phi_worst)), 1e-6)
    ring = max(int(math.ceil((radius_m / cell_h_m / cos_w) * (1.0 + 1e-9))), 1)
    if ring > max_ring:
        raise ValueError(
            f"radius {radius_m:.0f} m at |lat|<={phi_worst:.1f} needs ring "
            f"{ring} > max_ring={max_ring} at res={res}; lower res"
        )

    g = (
        spark.range(nx * ny)
        .select(
            (F.col("id") % nx).alias("cx"),
            (F.col("id") / nx).cast("long").alias("cy"),
        )
        .withColumn(
            "_glon", F.lit(lon0) + (F.col("cx") + F.lit(0.5)) * F.lit(pitch_deg)
        )
        .withColumn(
            "_glat", F.lit(lat0) + (F.col("cy") + F.lit(0.5)) * F.lit(pitch_deg)
        )
        .withColumn(
            "_cell",
            F.explode(
                E.cell_neighbors(E.cell_id("_glon", "_glat", res), res, k=ring)
            ),
        )
    )
    s = samples.select(
        F.col(id_col).alias("_sid"),
        F.col(lon).alias("_slon"),
        F.col(lat).alias("_slat"),
        F.col(value).cast("long").alias("_sval"),
    ).withColumn("_scell", E.cell_id("_slon", "_slat", res))

    paired = (
        g.join(s, g["_cell"] == s["_scell"], "inner")
        .withColumn("_d", E.haversine_m("_glon", "_glat", "_slon", "_slat"))
        .where(F.col("_d") <= F.lit(float(radius_m)))
        .withColumn("_dm", F.floor("_d").cast("long"))
        .withColumn("_w", F.expr(f"{_W_NUM} div (_dm * _dm + 1)"))
    )
    return paired.groupBy("cx", "cy").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_w").alias("sum_w"),
        F.sum(F.col("_w") * F.col("_sval")).alias("sum_wv"),
    )


def idw_oracle_sql(
    samples_sql: str,
    lon0: float,
    lat0: float,
    pitch_deg: float,
    nx: int,
    ny: int,
    radius_m: float,
    hav_template: str,
) -> str:
    """DuckDB mirror: brute-force grid × samples with the identical
    center/haversine/floor/integer-weight expression trees.
    ``samples_sql`` must yield (pk, lon, lat, val); ``hav_template``
    is the engine-shared haversine with {lat1}/{lon1}/{lat2}/{lon2}
    placeholders already D-substituted."""
    hav = hav_template.format(
        lat1="g.glat", lon1="g.glon", lat2="s.lat", lon2="s.lon"
    )
    return f"""
WITH g AS (
  SELECT CAST(range % {nx} AS BIGINT) AS cx,
         CAST(floor(CAST(range AS DOUBLE) / {nx}) AS BIGINT) AS cy,
         {lon0!r} + (CAST(range % {nx} AS BIGINT) + 0.5) * {pitch_deg!r} AS glon,
         {lat0!r} + (CAST(floor(CAST(range AS DOUBLE) / {nx}) AS BIGINT) + 0.5) * {pitch_deg!r} AS glat
  FROM range({nx * ny})
),
s AS ({samples_sql}),
p AS (
  SELECT g.cx, g.cy, s.val,
         CAST(floor({hav}) AS BIGINT) AS dm
  FROM g, s
  WHERE {hav} <= {float(radius_m)!r}
)
SELECT cx, cy, count(*) AS n,
       CAST(sum({_W_NUM} // (dm * dm + 1)) AS BIGINT) AS sum_w,
       CAST(sum(({_W_NUM} // (dm * dm + 1)) * val) AS BIGINT) AS sum_wv
FROM p GROUP BY cx, cy
"""
