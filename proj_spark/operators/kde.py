"""Kernel-density heatmap: truncated Epanechnikov KDE on a fixed grid.

The classic "density surface" query over point events (where do the
image centroids / pings concentrate?).  Each point spreads a kernel
weight onto every grid cell whose center lies within the bandwidth
``h``; the per-cell density is the sum.  We use the Epanechnikov
kernel w = max(0, 1 - d^2/h^2) rather than a Gaussian on purpose: it
is pure +,-,*,/ arithmetic (IEEE-exact and therefore bit-identical in
any engine — no libm exp drift), and it truncates NATURALLY at d = h,
which is what makes the distributed plan bounded.

Scale shape: a point touches only the (2k+1)^2 neighbor cells of its
own cell (k = ceil(h / cell)), so the explode fan is a small constant
(25 for k=2) — never a cross join against the cell universe.  The
groupBy(cell) sum gets map-side partial combine for free, so the
shuffle carries at most |occupied cells| * (2k+1)^2 partial rows, not
|points| * fan.  Weights are floor-quantized to integers BEFORE the
sum, making the aggregate order-independent — the float sum of
1e12 kernel terms would otherwise differ run-to-run with partial
aggregation, let alone cross-engine.

Grid: equirect cells at a power-of-two resolution (cell = 360/2^(r+1)
degrees — exactly representable), cell id = iy * (2n) + ix, the same
layout as the cell_path lane.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WQ = 4096  # weight quantum: w_int = floor(w * 4096)


def kde_heatmap(
    points: DataFrame,
    res: int = 8,
    h_cells: float = 1.5,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """(cell, ix, iy, density) — integer-quantized Epanechnikov KDE.

    ``h_cells`` is the bandwidth in CELL WIDTHS (so h in degrees is
    exactly h_cells * 360 / 2^(res+1), an exact float for dyadic
    h_cells).  Cells whose quantized density is 0 are dropped.
    """
    n = 1 << res
    cell = 360.0 / (2 * n)  # exact dyadic
    h = h_cells * cell
    k = int(-(-h_cells // 1))  # ceil for positive

    ix = F.floor((F.col(lon) + 180.0) / cell).cast("long")
    iy = F.floor((F.col(lat) + 90.0) / cell).cast("long")
    pts = points.select(
        F.col(lon).alias("_plon"),
        F.col(lat).alias("_plat"),
        F.least(F.greatest(ix, F.lit(0)), F.lit(2 * n - 1)).alias("_ix"),
        F.least(F.greatest(iy, F.lit(0)), F.lit(n - 1)).alias("_iy"),
    )
    off = F.sequence(F.lit(-k), F.lit(k))
    fan = (
        pts.select("_plon", "_plat", "_ix", "_iy", F.explode(off).alias("_dx"))
        .select("_plon", "_plat", "_ix", "_iy", "_dx", F.explode(off).alias("_dy"))
        .select(
            "_plon",
            "_plat",
            (F.col("_ix") + F.col("_dx")).alias("cx"),
            (F.col("_iy") + F.col("_dy")).alias("cy"),
        )
    )
    fan = fan.where(
        (F.col("cx") >= 0)
        & (F.col("cx") < 2 * n)
        & (F.col("cy") >= 0)
        & (F.col("cy") < n)
    )
    clon = F.lit(-180.0) + (F.col("cx") + 0.5) * cell
    clat = F.lit(-90.0) + (F.col("cy") + 0.5) * cell
    d2 = (clon - F.col("_plon")) * (clon - F.col("_plon")) + (
        clat - F.col("_plat")
    ) * (clat - F.col("_plat"))
    w = F.lit(1.0) - d2 / F.lit(h * h)
    wq = F.floor(F.greatest(w, F.lit(0.0)) * _WQ).cast("long")
    return (
        fan.select("cx", "cy", wq.alias("_w"))
        .where(F.col("_w") > 0)
        .groupBy("cx", "cy")
        .agg(F.sum("_w").alias("density"))
        .select(
            (F.col("cy") * (2 * n) + F.col("cx")).alias("cell"),
            F.col("cx").alias("ix"),
            F.col("cy").alias("iy"),
            "density",
        )
    )
