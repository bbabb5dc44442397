"""Text-analysis operators for training-data curation, all native
expressions (zero Python per row): language ID, quality scoring,
token counting, document fingerprinting.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "zu", "ist", "ein", "mit", "von", "auf"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"],
    "es": ["el", "la", "los", "y", "de", "un", "una", "es", "para", "en"],
}

# BPE-ish token pattern: words, numbers, or single non-space symbols
TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def token_stats(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """n_tokens (whitespace), n_bpeish (regex pieces), n_chars,
    distinct-token count and mean token length per doc."""
    toks = F.split(F.trim(F.col(text)), r"\s+")
    # NOTE: F.regexp_extract_all with a lit pattern, NOT F.expr — SQL
    # string literals would eat the backslash in \s
    bpe = F.regexp_extract_all(F.col(text), F.lit(TOKEN_RE), F.lit(0))
    return df.select(
        id_col,
        F.length(text).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(bpe).alias("n_bpeish"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        (F.length(F.regexp_replace(F.col(text), r"\s+", "")) / F.size(toks)).alias(
            "mean_tok_len"
        ),
    )


def quality_score(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + composite score in [0,1]:
    length band, stopword ratio, punctuation ratio, repetition
    (distinct/total tokens)."""
    toks = F.split(F.trim(F.lower(F.col(text))), r"\s+")
    n_tok = F.size(toks)
    sw = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(toks, sw))  # distinct-hit count
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / n_tok
    )
    punct_ratio = (
        F.length(F.regexp_replace(F.col(text), r"[a-zA-Z0-9\s]", "")) / F.length(text)
    )
    rep_ratio = F.size(F.array_distinct(toks)) / n_tok
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    score = (
        0.35 * len_score
        + 0.25 * F.least(stop_ratio * 4.0, F.lit(1.0))
        + 0.25 * rep_ratio
        + 0.15 * (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0)))
    )
    return df.select(
        id_col,
        n_tok.alias("n_tokens"),
        n_stop.alias("n_stopword_kinds"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        rep_ratio.alias("rep_ratio"),
        score.alias("quality"),
    )


def language_id(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language classifier: predicted lang = argmax over
    languages of (stopword hits / n_tokens); ties broken by language
    code order.  Pure expressions (greatest + chained when)."""
    toks = F.split(F.trim(F.lower(F.col(text))), r"\s+")
    n_tok = F.size(toks)
    scores = {}
    for lang, words in LANG_STOPWORDS.items():
        sw = F.array([F.lit(w) for w in words])
        scores[lang] = (F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / n_tok)
    best = F.greatest(*scores.values())
    pred = F.lit("unknown")
    # reversed so earlier language codes win ties via later .when override
    for lang in sorted(scores, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best <= 0.0, F.lit("unknown")).otherwise(pred)
    out = df.select(
        id_col,
        *[scores[lg].alias(f"score_{lg}") for lg in sorted(scores)],
        pred.alias("pred_lang"),
    )
    return out


def fingerprint(df: DataFrame, text: str = "text", id_col: str = "doc_id", p: int = 2147483647) -> DataFrame:
    """Order-sensitive rolling document fingerprint.

    fp = sum over positions i of w(i) * len(token_i) * first_char_code
    with positional weight w(i) = (i*131 mod 997)+1 — bounded modular
    arithmetic, exact in float64, reproducible in ANSI SQL.  A content
    hash that detects re-ordering (unlike bag-of-words hashes).
    """
    toks = F.split(F.trim(F.lower(F.col(text))), r"\s+")
    contrib = F.expr(
        "aggregate(zip_with({t}, sequence(0, size({t}) - 1), (tok, i) -> "
        "((i * 131) % 997 + 1) * (length(tok) * 31 + ascii(tok))), "
        "cast(0 as long), (acc, x) -> (acc + x) % {p})".format(t="_toks", p=p)
    )
    return (
        df.withColumn("_toks", toks)
        .select(id_col, contrib.alias("fingerprint"))
    )


def boilerplate_lines(
    df: DataFrame,
    text: str = "text",
    min_docs: int = 2,
    min_chars: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document repeated lines (the C4-style boilerplate rule:
    a line occurring verbatim in many documents is navigation/footer
    chrome, not content).  Returns (line, n_docs) for normalized
    (trimmed, lowercased) lines of >= ``min_chars`` chars appearing in
    >= ``min_docs`` DISTINCT documents.

    Scale shape: explode -> distinct(doc, line) -> count per line —
    two shuffles on the line hash, algebraic all the way; the output
    (the boilerplate dictionary) is tiny and broadcastable."""
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text), r"\n")).alias("_raw"),
    ).select(id_col, F.trim(F.lower(F.col("_raw"))).alias("line"))
    lines = lines.where(F.length("line") >= min_chars).distinct()
    return (
        lines.groupBy("line")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


# dictionary sizes up to this ride inline as a literal array in a
# narrow higher-order filter; larger ones fall back to the join path
_BOILER_INLINE_CAP = 4096


def strip_boilerplate(
    df: DataFrame,
    boiler: DataFrame,
    text: str = "text",
    out_col: str = "text_clean",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove boilerplate lines from every document: keep each line
    whose normalized form is NOT in the dictionary, rejoin with
    newlines (order preserved).

    Physical plan: the dictionary is tiny by definition (lines
    repeated across MANY docs), so it is collected once and rides as
    a literal array inside one higher-order split->filter->array_join
    projection — the 10^12-row side stays NARROW, zero joins, zero
    shuffles, line order free.  Dictionaries beyond the inline cap
    fall back to a broadcast anti-join at line granularity with
    positional reassembly (one doc-keyed shuffle)."""
    from pyspark.sql.functions import broadcast

    # contract (all three paths): NULL text -> '' (a NULL-vs-'' flip
    # depending on dictionary size would break downstream filters)
    dict_rows = boiler.select("line").limit(_BOILER_INLINE_CAP + 1).collect()
    if not dict_rows:
        return df.withColumn(out_col, F.coalesce(F.col(text), F.lit("")))
    if len(dict_rows) <= _BOILER_INLINE_CAP:
        bdict = F.array(*[F.lit(r.line) for r in dict_rows])
        kept = F.filter(
            F.split(F.col(text), r"\n"),
            lambda x: ~F.array_contains(bdict, F.trim(F.lower(x))),
        )
        return df.withColumn(
            out_col, F.coalesce(F.array_join(kept, "\n"), F.lit(""))
        )

    # oversized dictionary: broadcast anti-join + ordered reassembly
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text), r"\n")).alias("_pos", "_raw"),
    ).withColumn("_norm", F.trim(F.lower(F.col("_raw"))))
    kept = lines.join(
        broadcast(boiler.select(F.col("line").alias("_norm"), F.lit(1).alias("_b"))),
        on="_norm",
        how="left",
    ).where(F.col("_b").isNull())
    reass = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_raw"))
                    ),
                    lambda s: s["_raw"],
                ),
                "\n",
            ).alias(out_col)
        )
    )
    return df.join(reass, on=id_col, how="left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(""))
    )


# PII patterns: the Java-regex / RE2 COMMON dialect (no lookaround),
# so the Spark expressions and the DuckDB oracle compile identically.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def scrub_pii(
    df: DataFrame,
    text: str = "text",
    out_col: str = "text_scrubbed",
    kinds: tuple = ("email", "phone", "ipv4"),
) -> DataFrame:
    """Replace PII spans with typed placeholders ([EMAIL], [PHONE],
    [IPV4]) and count each kind — the standard pre-training scrub
    pass.  Pure regexp expressions (whole-stage codegen, zero Python);
    patterns are deliberately lookaround-free so any RE2-class engine
    reproduces them.

    Each kind is counted on the text AFTER the previous kinds were
    scrubbed, so the reported counts always agree with the spans that
    were actually replaced (an IPv4 inside an already-scrubbed email's
    domain is not double-counted)."""
    out = df
    scrubbed = F.col(text)
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        # lit pattern, NOT F.expr — SQL literals would eat the \. \b
        out = out.withColumn(
            f"n_{kind}",
            F.coalesce(
                F.size(F.regexp_extract_all(scrubbed, F.lit(pat), F.lit(0))),
                F.lit(0),
            ).cast("long"),
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"[{kind.upper()}]")
    return out.withColumn(out_col, scrubbed)


def _grams_expr(w: int):
    """Array of w-gram strings from a ``_toks`` column (space-joined
    windows; empty array below w tokens — sequence() would otherwise
    run DESCENDING for a negative span).  The single source of truth
    for ngram_set / contamination / repetition_stats, so the
    decontamination unit can never drift from benchmark n-gram
    construction."""
    return F.when(
        F.size("_toks") >= w,
        F.expr(
            f"transform(sequence(1, size(_toks) - {w} + 1), "
            f"i -> array_join(slice(_toks, i, {w}), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_set(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    w: int = 13,
) -> DataFrame:
    """Distinct w-gram strings per document (whitespace tokens joined
    by single spaces) — the unit of train/test decontamination."""
    toks = F.split(F.trim(F.col(text)), r"\s+")
    grams = _grams_expr(w)
    return (
        df.withColumn("_toks", toks)
        .select(id_col, F.explode(grams).alias("ngram"))
        .distinct()
    )


def contamination(
    docs: DataFrame,
    bench_ngrams: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    w: int = 13,
) -> DataFrame:
    """Per-document count of w-grams colliding with a benchmark n-gram
    set — the standard decontamination check before training (e.g.
    GPT-3 appendix C / PaLM: drop or flag docs sharing 13-grams with
    eval sets).  ``bench_ngrams`` needs one ``ngram`` string column
    (build it with :func:`ngram_set` over the benchmark).

    Scale shape: the benchmark set is small and broadcast, and the
    broadcast join runs BEFORE any shuffle — the corpus side is a
    narrow explode+filter; only the (rare) colliding (doc, gram) pairs
    reach the distinct + per-doc count, so no full-corpus n-gram
    shuffle ever happens.  The count left-joins back so clean docs
    report 0."""
    toks = F.split(F.trim(F.col(text)), r"\s+")
    grams = (
        docs.withColumn("_toks", toks)
        .select(id_col, F.explode(_grams_expr(w)).alias("ngram"))
    )
    hits = (
        grams.join(
            F.broadcast(bench_ngrams.select("ngram").distinct()), on="ngram"
        )
        .distinct()  # per-doc distinct AFTER the filter: tiny
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return docs.select(id_col).join(hits, on=id_col, how="left").select(
        id_col,
        F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
    )


def repetition_stats(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    gram_w: int = 2,
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1: docs
    dominated by repeated lines / n-grams are low-quality):

    - dup_line_frac: fraction of lines that are repeats of an earlier
      line (0 for single-line docs)
    - top_gram_frac: fraction of characters covered by the most
      frequent ``gram_w``-gram (count * gram chars / total non-space
      chars); modal gram ties break lexicographically (deterministic
      under any partitioning)

    Scale shape: line stats are pure per-row expressions; the n-gram
    mode is explode -> per-(doc, gram) count -> per-doc max — two
    shuffles keyed by doc/gram, both map-side combinable."""
    lines = F.split(F.col(text), r"\n")
    n_lines = F.size(lines)
    n_distinct_lines = F.size(F.array_distinct(lines))
    toks = F.split(F.trim(F.lower(F.col(text))), r"\s+")
    grams = _grams_expr(gram_w)
    base = df.withColumn("_toks", toks).withColumn(
        "_nchars", F.length(F.regexp_replace(F.col(text), r"\s+", ""))
    )
    per_gram = (
        base.select(id_col, "_nchars", F.explode(grams).alias("_g"))
        .groupBy(id_col, "_nchars", "_g")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("_n").desc(), F.col("_g").asc())
    top = (
        per_gram.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            id_col,
            F.col("_g").alias("top_gram"),
            F.col("_n").alias("top_gram_n"),
            (
                F.col("_n")
                * F.length(F.regexp_replace(F.col("_g"), r"\s+", ""))
                / F.col("_nchars")
            ).alias("top_gram_frac"),
        )
    )
    line_stats = df.select(
        id_col,
        n_lines.cast("long").alias("n_lines"),
        ((n_lines - n_distinct_lines) / n_lines).alias("dup_line_frac"),
    )
    return line_stats.join(top, on=id_col, how="left").select(
        id_col,
        "n_lines",
        "dup_line_frac",
        F.coalesce("top_gram", F.lit("")).alias("top_gram"),
        F.coalesce("top_gram_n", F.lit(0)).cast("long").alias("top_gram_n"),
        F.coalesce("top_gram_frac", F.lit(0.0)).alias("top_gram_frac"),
    )
