"""Per-tile histogram equalization over a tiled uint8 raster.

The classic contrast-enhancement primitive (and the normalization
stage of many EO / vision preprocessing pipelines): per tile, build
the 256-bin histogram, form the CDF, and remap every pixel with the
standard exact-integer transfer function

    eq(v) = floor((cdf(v) - cdf_min) * 255 / (n_px - cdf_min))

where cdf_min is the CDF at the smallest occupied bin.  Everything is
integer (counts, the floor-division remap, the fingerprints), so a
SQL oracle can replay it bit-for-bit with window functions.

Scale shape: the best possible — ZERO shuffles.  Equalization is
per-tile-local, so this is one narrow ``mapInPandas`` over the tile
payloads; at 100 TB it runs at scan speed with no exchange at all,
and the per-tile numpy kernel is two bincount/cumsum passes.  (The
global-histogram variant would need one tiny agg over 256-bin partial
histograms — map-side combined — and the same narrow remap; the
per-tile form is the harder one to oracle and the one CLAHE-style
pipelines actually use.)

Degenerate tile (all pixels one value): n_px == cdf_min makes the
transfer undefined; both engines emit eq = 0 for it (the standard
"flat tile stays flat at black" convention, documented here).
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

_OUT_SCHEMA = StructType(
    [
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("n_bins", LongType()),
        StructField("eq_sum", LongType()),
        StructField("eq_cks", LongType()),
    ]
)


def equalize_tiles(tiles: DataFrame, tile_px: int) -> DataFrame:
    """``tiles``: (x:long, y:long, bytes: raw uint8 tile_px²).  Returns
    per tile (n_bins = occupied histogram bins, eq_sum = Σ equalized
    value, eq_cks = Σ eq · (1 + local_idx % 997))."""
    ts = tile_px
    npx = ts * ts
    wgt = 1 + (np.arange(npx, dtype=np.int64) % 997)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                v = np.frombuffer(r.bytes, dtype=np.uint8)
                hist = np.bincount(v, minlength=256).astype(np.int64)
                cdf = np.cumsum(hist)
                cmin = int(cdf[np.nonzero(hist)[0][0]])
                if npx == cmin:  # flat tile: documented eq = 0
                    eq = np.zeros(256, dtype=np.int64)
                else:
                    eq = (cdf - cmin) * 255 // (npx - cmin)
                    eq = np.maximum(eq, 0)  # bins below the first occupied
                pix = eq[v]
                rows.append(
                    (
                        int(r.x),
                        int(r.y),
                        int((hist > 0).sum()),
                        int(pix.sum()),
                        int((pix * wgt).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["x", "y", "n_bins", "eq_sum", "eq_cks"]
            )

    return tiles.mapInPandas(run, _OUT_SCHEMA)


def equalize_oracle_sql(
    width: int, height: int, tile_px: int, mul: int, add: int
) -> str:
    """DuckDB mirror: per-pixel LCG closed form, per-tile CDF via a
    window over the grouped histogram, identical floor-division remap.
    """
    ts = tile_px
    npx = ts * ts
    return f"""
WITH px AS (
  SELECT gx // {ts} AS x, gy // {ts} AS y,
         (((gy * {width} + gx) * {mul} + {add}) % 4294967296) // 16777216 AS v,
         1 + ((gy % {ts}) * {ts} + (gx % {ts})) % 997 AS wgt
  FROM range({width}) xs(gx), range({height}) ys(gy)
),
h AS (
  SELECT x, y, v, count(*) AS c, CAST(sum(wgt) AS BIGINT) AS wsum
  FROM px GROUP BY 1, 2, 3
),
cdf AS (
  SELECT x, y, v, c, wsum,
         sum(c) OVER (PARTITION BY x, y ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         first_value(c) OVER (PARTITION BY x, y ORDER BY v
                              ROWS UNBOUNDED PRECEDING) AS cmin
  FROM h
),
eq AS (
  SELECT x, y, c, wsum,
         CASE WHEN {npx} = cmin THEN 0
              ELSE greatest((cum - cmin) * 255 // ({npx} - cmin), 0)
         END AS ev
  FROM cdf
)
SELECT x, y, CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(ev * c) AS BIGINT) AS eq_sum,
       CAST(sum(ev * wsum) AS BIGINT) AS eq_cks
FROM eq GROUP BY x, y
"""
