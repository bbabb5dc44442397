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

from pyspark.sql import DataFrame, Window
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


def gi_star(cells: DataFrame, res: int) -> DataFrame:
    """Getis-Ord Gi* hot-spot z-score per occupied cell.

    ``cells``: (cell:long, v:long).  Neighborhood is the queen 3×3
    block INCLUDING self, grid-clipped, no antimeridian wrap,
    intersected with the occupied set (the statistic is defined over
    the occupied cells, documented — the all-cells variant just feeds
    the zero-filled universe in).  With binary weights,

        z_i = (Σ_{j∈N(i)} x_j − x̄·W_i) / (S·√((n·W_i − W_i²)/(n−1)))

    which, clearing the two rational means, becomes

        z_i = A_i·√(n−1) / √(B·C_i)
        A_i = n·Σ_nbr − W_i·Σx   B = n·Σx² − (Σx)²   C_i = n·W_i − W_i²

    — A/B/C all exact int64.  The output carries them plus z quantized
    to 1e-6 from ONE double expression tree mirrored by the oracle.
    Null z when B = 0 (constant field) or C = 0 (W_i = n).

    Scale shape: identical to :func:`morans_i` — the bounded occupied-
    cell table broadcasts against its own 9-direction explode; the only
    real exchange is the caller's rollup.  Int64 bounds: |A_i| ≤
    n·9·max(x) + 9·n·max(x) — safe while n·max(x) ≤ ~5e8.
    """
    n_side = 1 << res
    w = 2 * n_side

    stats = cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    ix = F.col("cell") % w
    iy = (F.col("cell") / w).cast("long")
    # 9 broadcast lookups instead of explode+groupBy: the occupied-cell
    # table is bounded, and summing join results column-wise keeps the
    # whole statistic shuffle-free (a groupBy here would re-exchange
    # the cell table for nothing)
    keys = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            c = F.col("cell") + dy * w + dx
            cond = F.lit(True)
            if dx < 0:
                cond = cond & (ix > 0)
            if dx > 0:
                cond = cond & (ix < w - 1)
            if dy < 0:
                cond = cond & (iy > 0)
            if dy > 0:
                cond = cond & (iy < n_side - 1)
            keys[f"_k{dy + 1}{dx + 1}"] = F.when(cond, c)
    per = cells.select("cell", "v", *[k.alias(nm) for nm, k in keys.items()])
    for nm in keys:
        per = per.join(
            F.broadcast(
                cells.select(
                    F.col("cell").alias(f"_nc{nm}"), F.col("v").alias(f"_nv{nm}")
                )
            ),
            F.col(nm) == F.col(f"_nc{nm}"),
            "left",
        )
    hit = [F.col(f"_nv{nm}") for nm in keys]
    per = per.select(
        "cell",
        "v",
        sum(
            (h.isNotNull().cast("long") for h in hit), F.lit(0).cast("long")
        ).alias("w_i"),
        sum((F.coalesce(h, F.lit(0)) for h in hit), F.lit(0).cast("long")).alias(
            "nbr_sum"
        ),
    )
    j = per.crossJoin(F.broadcast(stats))
    a = F.col("n_cells") * F.col("nbr_sum") - F.col("w_i") * F.col("s")
    b = F.col("n_cells") * F.col("s2") - F.col("s") * F.col("s")
    c = F.col("n_cells") * F.col("w_i") - F.col("w_i") * F.col("w_i")
    z_q = F.when(
        (F.col("b_den") > 0) & (F.col("c_den") > 0),
        F.floor(
            F.col("a_num").cast("double")
            * F.lit(1000000.0)
            * F.sqrt((F.col("n_cells") - 1).cast("double"))
            / F.sqrt(F.col("b_den").cast("double") * F.col("c_den").cast("double"))
        ),
    )
    return (
        j.select(
            "cell",
            "v",
            F.col("w_i").cast("long").alias("w_i"),
            "nbr_sum",
            a.alias("a_num"),
            b.alias("b_den"),
            c.cast("long").alias("c_den"),
            "n_cells",
        )
        .withColumn("z_q", z_q)
        .drop("b_den", "n_cells")
    )


def gi_star_oracle_sql(src: str, res: int) -> str:
    """DuckDB mirror of :func:`gi_star` over the same (cell, v) SQL."""
    n_side = 1 << res
    w = 2 * n_side
    return f"""
WITH cells AS ({src}),
st AS (
  SELECT count(*) AS n_cells, CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS s2
  FROM cells
),
nbr AS (
  SELECT a.cell, a.v, a.cell + o.dy * {w} + o.dx AS ncell
  FROM cells a,
       (SELECT dx.x AS dx, dy.y AS dy
        FROM (VALUES (-1), (0), (1)) dx(x), (VALUES (-1), (0), (1)) dy(y)) o
  WHERE NOT (o.dx = -1 AND a.cell % {w} = 0)
    AND NOT (o.dx = 1 AND a.cell % {w} = {w - 1})
    AND NOT (o.dy = -1 AND a.cell // {w} = 0)
    AND NOT (o.dy = 1 AND a.cell // {w} = {n_side - 1})
),
per AS (
  SELECT nbr.cell, nbr.v, count(*) AS w_i, CAST(sum(b.v) AS BIGINT) AS nbr_sum
  FROM nbr JOIN cells b ON b.cell = nbr.ncell
  GROUP BY 1, 2
),
j AS (
  SELECT per.cell, per.v, per.w_i, per.nbr_sum,
         CAST(st.n_cells * per.nbr_sum - per.w_i * st.s AS BIGINT) AS a_num,
         CAST(st.n_cells * st.s2 - st.s * st.s AS BIGINT) AS b_den,
         CAST(st.n_cells * per.w_i - per.w_i * per.w_i AS BIGINT) AS c_den,
         st.n_cells
  FROM per, st
)
SELECT cell, v, CAST(w_i AS BIGINT) AS w_i, nbr_sum, a_num, c_den,
       CASE WHEN b_den > 0 AND c_den > 0 THEN
         CAST(floor(CAST(a_num AS DOUBLE) * 1000000.0
                    * sqrt(CAST(n_cells - 1 AS DOUBLE))
                    / sqrt(CAST(b_den AS DOUBLE) * CAST(c_den AS DOUBLE))) AS BIGINT)
       END AS z_q
FROM j
"""


def local_moran(cells: DataFrame, res: int) -> DataFrame:
    """LISA — Anselin's local Moran cluster pieces per occupied cell,
    ENTIRELY in integers (no quantization at all): with
    d_i = n·x_i − Σx (the cleared mean),

        i_num_i = d_i · Σ_{j∈N(i)} d_j

    over the queen 3×3 neighborhood EXCLUDING self, grid-clipped, no
    wrap, occupied cells only (same conventions as :func:`gi_star`).
    The sign of i_num classifies the cluster quadrant: ``quad`` is
    1=HH, 2=LL, 3=HL (high cell, low neighbors), 4=LH, 0=undefined
    (d_i = 0 or no neighbors or zero neighbor sum).

    Scale shape: identical to gi_star — 8 broadcast lookups summed
    column-wise, zero shuffles beyond the caller's rollup.  Int64
    bounds: |i_num| ≤ 8·(n·max x)² — exact while n·max(x) ≤ ~10⁹ᐟ².
    """
    n_side = 1 << res
    w = 2 * n_side

    stats = cells.agg(
        F.count(F.lit(1)).alias("n_cells"), F.sum("v").alias("s")
    )
    d = (
        cells.crossJoin(F.broadcast(stats))
        .withColumn("d", F.col("n_cells") * F.col("v") - F.col("s"))
        .select("cell", "v", "d")
    )
    ix = F.col("cell") % w
    iy = (F.col("cell") / w).cast("long")
    keys = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            c = F.col("cell") + dy * w + dx
            cond = F.lit(True)
            if dx < 0:
                cond = cond & (ix > 0)
            if dx > 0:
                cond = cond & (ix < w - 1)
            if dy < 0:
                cond = cond & (iy > 0)
            if dy > 0:
                cond = cond & (iy < n_side - 1)
            keys[f"_k{dy + 1}{dx + 1}"] = F.when(cond, c)
    per = d.select("cell", "v", "d", *[k.alias(nm) for nm, k in keys.items()])
    for nm in keys:
        per = per.join(
            F.broadcast(
                d.select(F.col("cell").alias(f"_nc{nm}"), F.col("d").alias(f"_nd{nm}"))
            ),
            F.col(nm) == F.col(f"_nc{nm}"),
            "left",
        )
    hit = [F.col(f"_nd{nm}") for nm in keys]
    per = per.select(
        "cell",
        "v",
        "d",
        sum(
            (h.isNotNull().cast("long") for h in hit), F.lit(0).cast("long")
        ).alias("w_i"),
        sum((F.coalesce(h, F.lit(0)) for h in hit), F.lit(0).cast("long")).alias(
            "nbr_d_sum"
        ),
    )
    di, nd = F.col("d"), F.col("nbr_d_sum")
    quad = (
        F.when((di == 0) | (F.col("w_i") == 0) | (nd == 0), 0)
        .when((di > 0) & (nd > 0), 1)
        .when((di < 0) & (nd < 0), 2)
        .when((di > 0) & (nd < 0), 3)
        .otherwise(4)
    )
    return per.select(
        "cell",
        "v",
        di.alias("d_i"),
        "w_i",
        "nbr_d_sum",
        (di * nd).alias("i_num"),
        quad.cast("long").alias("quad"),
    )


def local_moran_oracle_sql(src: str, res: int) -> str:
    """DuckDB mirror of :func:`local_moran` over the same (cell, v)
    rollup SQL — pure integer algebra, no doubles anywhere."""
    n_side = 1 << res
    w = 2 * n_side
    return f"""
WITH cells AS ({src}),
st AS (SELECT count(*) AS n_cells, CAST(sum(v) AS BIGINT) AS s FROM cells),
d AS (
  SELECT cell, v, CAST(st.n_cells * v - st.s AS BIGINT) AS d FROM cells, st
),
nbr AS (
  SELECT a.cell, a.cell + o.dy * {w} + o.dx AS ncell
  FROM d a,
       (SELECT dx.x AS dx, dy.y AS dy
        FROM (VALUES (-1), (0), (1)) dx(x), (VALUES (-1), (0), (1)) dy(y)
        WHERE NOT (dx.x = 0 AND dy.y = 0)) o
  WHERE NOT (o.dx = -1 AND a.cell % {w} = 0)
    AND NOT (o.dx = 1 AND a.cell % {w} = {w - 1})
    AND NOT (o.dy = -1 AND a.cell // {w} = 0)
    AND NOT (o.dy = 1 AND a.cell // {w} = {n_side - 1})
),
agg AS (
  SELECT nbr.cell, count(b.cell) AS w_i,
         CAST(coalesce(sum(b.d), 0) AS BIGINT) AS nbr_d_sum
  FROM nbr LEFT JOIN d b ON b.cell = nbr.ncell
  GROUP BY 1
)
SELECT d.cell, d.v, d.d AS d_i,
       CAST(coalesce(agg.w_i, 0) AS BIGINT) AS w_i,
       coalesce(agg.nbr_d_sum, 0) AS nbr_d_sum,
       d.d * coalesce(agg.nbr_d_sum, 0) AS i_num,
       CAST(CASE
         WHEN d.d = 0 OR coalesce(agg.w_i, 0) = 0
              OR coalesce(agg.nbr_d_sum, 0) = 0 THEN 0
         WHEN d.d > 0 AND agg.nbr_d_sum > 0 THEN 1
         WHEN d.d < 0 AND agg.nbr_d_sum < 0 THEN 2
         WHEN d.d > 0 AND agg.nbr_d_sum < 0 THEN 3
         ELSE 4
       END AS BIGINT) AS quad
FROM d LEFT JOIN agg ON agg.cell = d.cell
"""


def mann_kendall(binned: DataFrame) -> DataFrame:
    """Mann-Kendall trend test per cell over zero-filled time bins —
    the per-location core of emerging-hot-spot analysis.

    ``binned``: (cell:long, day:long, x:long) with EVERY (cell, day)
    of the study cube present (zero-filled by the caller; see
    :func:`zero_fill_bins`).  Emits per cell the exact integers

        s_stat = Σ_{i<j} sign(x_j − x_i)          (trend direction)
        var18  = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)  (18·Var(S), ties t)

    plus the continuity-corrected z quantized to 1e-6 from one shared
    double tree: z = (S − sign(S))·√18/√var18, null when var18 = 0
    (all bins tied).  n = bins per cell.

    Scale shape: the pairwise i<j self-join fans each cell's T bins to
    T(T−1)/2 rows — bounded by the STUDY-WINDOW length (e.g. 30 days
    → 435 pairs/cell), never by the data; both join sides arrive on
    one hash exchange over the cell key and the tie rollup reuses the
    same partitioning.  Everything else is map-side arithmetic.
    """
    binned = binned.repartition("cell")  # ONE exchange, reused by every branch
    a = binned.select("cell", F.col("day").alias("d1"), F.col("x").alias("x1"))
    b = binned.select("cell", F.col("day").alias("d2"), F.col("x").alias("x2"))
    sgn = (
        F.when(F.col("x2") > F.col("x1"), 1)
        .when(F.col("x2") < F.col("x1"), -1)
        .otherwise(0)
    )
    s = (
        a.join(b, on="cell")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("cell")
        .agg(F.sum(sgn).alias("s_stat"))
    )
    per_val = binned.groupBy("cell", "x").agg(F.count(F.lit(1)).alias("t"))
    t = F.col("t")
    ties = per_val.groupBy("cell").agg(
        F.sum(t).alias("n_bins"),
        F.sum(t * (t - 1) * (2 * t + 5)).alias("tie18"),
    )
    n = F.col("n_bins")
    j = s.join(ties, on="cell")
    var18 = (n * (n - 1) * (2 * n + 5) - F.col("tie18")).alias("var18")
    ssgn = (
        F.when(F.col("s_stat") > 0, 1)
        .when(F.col("s_stat") < 0, -1)
        .otherwise(0)
    )
    out = j.select("cell", "n_bins", "s_stat", var18)
    z_q = F.when(
        F.col("var18") > 0,
        F.floor(
            (F.col("s_stat") - ssgn).cast("double")
            * F.lit(1000000.0)
            * F.sqrt(F.lit(18.0))
            / F.sqrt(F.col("var18").cast("double"))
        ),
    )
    return out.withColumn("z_q", z_q)


def theil_sen(binned: DataFrame) -> DataFrame:
    """Theil-Sen trend magnitude per cell — the robust slope that
    pairs with :func:`mann_kendall`'s direction test in emerging-hot-
    spot pipelines.

    ``binned``: the zero-filled (cell, day, x) cube.  Every i<j pair
    contributes the integer-quantized slope

        slope_q = floor((x_j − x_i)·10⁶ / (d_j − d_i))

    (exact int64 floor division — day keys are distinct so the
    denominator is > 0), and the per-cell estimate is the LOWER MEDIAN
    of the sorted slopes (row_number = (m+1)//2) — median selection,
    not interpolation, so it stays an exact integer both engines
    reproduce bit-for-bit.

    Scale shape: the same bounded T(T−1)/2 pair fan as mann_kendall on
    one cell-keyed exchange; the median is one window + filter over
    the pair rows, reusing that partitioning (no second shuffle).
    """
    binned = binned.repartition("cell")  # ONE exchange, reused by both sides
    a = binned.select("cell", F.col("day").alias("d1"), F.col("x").alias("x1"))
    b = binned.select("cell", F.col("day").alias("d2"), F.col("x").alias("x2"))
    pairs = (
        a.join(b, on="cell")
        .where(F.col("d1") < F.col("d2"))
        .select(
            "cell",
            F.floor(
                (F.col("x2") - F.col("x1"))
                * F.lit(1000000)
                / (F.col("d2") - F.col("d1"))
            ).alias("slope_q"),
        )
    )
    w = Window.partitionBy("cell").orderBy("slope_q")
    ranked = pairs.select(
        "cell",
        "slope_q",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("cell")).alias("_m"),
    )
    return ranked.where(
        F.col("_rn") == F.floor((F.col("_m") + 1) / 2)
    ).select(
        "cell", F.col("_m").cast("long").alias("n_pairs"), "slope_q"
    )


def theil_sen_oracle_sql(src: str) -> str:
    """DuckDB mirror over the same (cell, day, x) rollup SQL: identical
    cube completion, integer slope quantization, lower-median pick."""
    return f"""
WITH ru AS ({src}),
uni AS (
  SELECT c.cell, d.day FROM (SELECT DISTINCT cell FROM ru) c,
                            (SELECT DISTINCT day FROM ru) d
),
f AS (
  SELECT uni.cell, uni.day, CAST(coalesce(ru.x, 0) AS BIGINT) AS x
  FROM uni LEFT JOIN ru ON ru.cell = uni.cell AND ru.day = uni.day
),
pairs AS (
  -- NOT DuckDB's '//' (truncates toward zero on negatives); Spark's
  -- F.floor(int / int) floors, and the double quotient is never within
  -- 1/(b.day - a.day) of an integer unless exact, so this tree is safe
  SELECT a.cell,
         CAST(floor(CAST((b.x - a.x) * 1000000 AS DOUBLE)
                    / (b.day - a.day)) AS BIGINT) AS slope_q
  FROM f a JOIN f b ON b.cell = a.cell AND a.day < b.day
),
ranked AS (
  SELECT cell, slope_q,
         row_number() OVER (PARTITION BY cell ORDER BY slope_q) AS rn,
         count(*) OVER (PARTITION BY cell) AS m
  FROM pairs
)
SELECT cell, CAST(m AS BIGINT) AS n_pairs, CAST(slope_q AS BIGINT) AS slope_q
FROM ranked WHERE rn = (m + 1) // 2
"""


def zero_fill_bins(rollup: DataFrame) -> DataFrame:
    """Complete a (cell, day, x) rollup to the full study cube: every
    occupied cell × every day observed anywhere, missing counts as 0.
    Both dimension tables are bounded (occupied cells, window days) and
    broadcast; the left join back to the rollup is the only exchange.
    """
    cells = rollup.select("cell").distinct()
    days = rollup.select("day").distinct()
    uni = cells.crossJoin(F.broadcast(days))
    return uni.join(rollup, on=["cell", "day"], how="left").select(
        "cell", "day", F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("x")
    )


def mann_kendall_oracle_sql(src: str) -> str:
    """DuckDB mirror over the same (cell, day, x) rollup SQL ``src``
    (pre-zero-fill): identical cube completion, pairwise sign sum, tie
    correction, and quantized z tree."""
    return f"""
WITH ru AS ({src}),
uni AS (
  SELECT c.cell, d.day FROM (SELECT DISTINCT cell FROM ru) c,
                            (SELECT DISTINCT day FROM ru) d
),
f AS (
  SELECT uni.cell, uni.day, CAST(coalesce(ru.x, 0) AS BIGINT) AS x
  FROM uni LEFT JOIN ru ON ru.cell = uni.cell AND ru.day = uni.day
),
s AS (
  SELECT a.cell,
         CAST(sum(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM f a JOIN f b ON b.cell = a.cell AND a.day < b.day
  GROUP BY 1
),
pv AS (
  SELECT cell, x, count(*) AS t FROM f GROUP BY 1, 2
),
ties AS (
  SELECT cell, CAST(sum(t) AS BIGINT) AS n_bins,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
  FROM pv GROUP BY 1
),
j AS (
  SELECT s.cell, ties.n_bins, s.s_stat,
         ties.n_bins * (ties.n_bins - 1) * (2 * ties.n_bins + 5) - ties.tie18 AS var18
  FROM s JOIN ties ON ties.cell = s.cell
)
SELECT cell, n_bins, s_stat, CAST(var18 AS BIGINT) AS var18,
       CASE WHEN var18 > 0 THEN
         CAST(floor(CAST(s_stat - (CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1 ELSE 0 END) AS DOUBLE)
                    * 1000000.0 * sqrt(18.0)
                    / sqrt(CAST(var18 AS DOUBLE))) AS BIGINT)
       END AS z_q
FROM j
"""


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
