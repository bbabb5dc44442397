"""Global spatial autocorrelation (Moran's I) over a cell rollup.

The spatial-statistics primitive for "is this hot-spot map clustered
or noise": Moran's I over per-cell values x_i with rook (4-neighbor)
binary weights,

    I = (N / W) * ΣΣ w_ij (x_i - x̄)(x_j - x̄) / Σ (x_i - x̄)²

computed EXACTLY in integers by clearing the rational mean: with
d_i = N·x_i − Σx (an integer), every (x_i − x̄) product picks up the
same N² factor, which cancels between numerator and denominator.  The
output row carries the exact integer pieces (n_cells, w_sum = number
of DIRECTED neighbor pairs, num = Σ d_i·d_j over pairs, den = Σ d_i²)
plus a 1e-6-quantized I from one identical double expression tree, so
the DuckDB oracle matches bit-for-bit.

Scale shape: the heavy input is the per-cell rollup the CALLER built
(one exchange over the raw points); this operator touches only the
cell table, which is bounded by the cell universe at the chosen res
(≤ 2^(2·res+1) rows — broadcastable for res ≤ ~10).  The neighbor
pair join broadcasts that table against its own 4-direction explode:
zero additional shuffles.  Neighborhood is rook without antimeridian
wrap (documented; both engines agree).

Integer bounds: |d_i| ≤ N·max(x); num/den stay in int64 while
N·max(x) ≤ ~3e9 — the fixture (res-7 rollup of customer counts) is
orders of magnitude below; at 10^12-point scale you'd run the same
plan with double d_i and lose only the exactness, not the shape.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def morans_i(cells: DataFrame, res: int) -> DataFrame:
    """``cells``: (cell:long, v:long) — one row per occupied cell of
    the res-``res`` equirect grid (cell = iy·2n + ix, n = 2^res).
    Returns ONE row (n_cells, w_sum, num, den, morans_q)."""
    n = 1 << res
    w = 2 * n

    stats = cells.agg(
        F.count(F.lit(1)).alias("n_cells"), F.sum("v").alias("s")
    )
    d = (
        cells.crossJoin(F.broadcast(stats))
        .withColumn("d", F.col("n_cells") * F.col("v") - F.col("s"))
        .select("cell", "d", "n_cells")
    )
    ix = F.col("cell") % w
    iy = (F.col("cell") / w).cast("long")
    # 4-direction rook neighbors, grid-clipped, no antimeridian wrap
    nbr = d.select(
        "cell",
        F.col("d").alias("d_i"),
        F.explode(
            F.filter(
                F.array(
                    F.when(ix > 0, F.col("cell") - 1),
                    F.when(ix < w - 1, F.col("cell") + 1),
                    F.when(iy > 0, F.col("cell") - w),
                    F.when(iy < n - 1, F.col("cell") + w),
                ),
                lambda c: c.isNotNull(),
            )
        ).alias("ncell"),
    )
    pairs = nbr.join(
        F.broadcast(d.select(F.col("cell").alias("ncell"), F.col("d").alias("d_j"))),
        on="ncell",
    )
    pair_agg = pairs.agg(
        F.count(F.lit(1)).alias("w_sum"),
        F.sum(F.col("d_i") * F.col("d_j")).alias("num"),
    )
    den = d.agg(
        F.max("n_cells").alias("n_cells"),
        F.sum(F.col("d") * F.col("d")).alias("den"),
    )
    out = den.crossJoin(F.broadcast(pair_agg))
    morans_q = F.when(
        (F.col("den") > 0) & (F.col("w_sum") > 0),
        F.floor(
            (F.col("n_cells") * F.col("num")).cast("double")
            * F.lit(1000000.0)
            / (F.col("w_sum") * F.col("den")).cast("double")
        ),
    )
    return out.select(
        "n_cells", "w_sum", "num", "den", morans_q.alias("morans_q")
    )


def morans_oracle_sql(src: str, res: int) -> str:
    """DuckDB mirror over the same (cell, v) rollup SQL ``src``.

    Identical d_i clearing, identical directed rook pair join,
    identical double expression tree for the quantized I."""
    n = 1 << res
    w = 2 * n
    return f"""
WITH cells AS ({src}),
st AS (SELECT count(*) AS n_cells, sum(v) AS s FROM cells),
d AS (
  SELECT cell, CAST(st.n_cells * v - st.s AS BIGINT) AS d, st.n_cells
  FROM cells, st
),
nbr AS (
  SELECT a.cell, a.d AS d_i, a.cell + o.off AS ncell
  FROM d a, (VALUES (-1), (1), (-{w}), ({w})) o(off)
  WHERE NOT (o.off = -1 AND a.cell % {w} = 0)
    AND NOT (o.off = 1 AND a.cell % {w} = {w - 1})
    AND NOT (o.off = -{w} AND a.cell // {w} = 0)
    AND NOT (o.off = {w} AND a.cell // {w} = {n - 1})
),
pairs AS (
  SELECT nbr.d_i, b.d AS d_j FROM nbr JOIN d b ON b.cell = nbr.ncell
),
pa AS (
  SELECT count(*) AS w_sum, CAST(sum(d_i * d_j) AS BIGINT) AS num FROM pairs
),
dn AS (
  SELECT max(n_cells) AS n_cells, CAST(sum(d * d) AS BIGINT) AS den FROM d
)
SELECT CAST(dn.n_cells AS BIGINT) AS n_cells, CAST(pa.w_sum AS BIGINT) AS w_sum,
       pa.num, dn.den,
       CASE WHEN dn.den > 0 AND pa.w_sum > 0 THEN
         CAST(floor(CAST(dn.n_cells * pa.num AS DOUBLE) * 1000000.0
                    / CAST(pa.w_sum * dn.den AS DOUBLE)) AS BIGINT)
       END AS morans_q
FROM dn, pa
"""
