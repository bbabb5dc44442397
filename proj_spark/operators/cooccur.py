"""Token co-occurrence + PMI: which terms appear together in documents.

The caption-analysis primitive behind phrase mining, tag suggestion,
and embedding sanity checks: for every pair of vocabulary terms,
count the documents containing BOTH, and score the association with
pointwise mutual information pmi = ln(n_ab * N / (n_a * n_b)).

Scale shape: the all-pairs explosion is tamed the standard way —
(1) per-document DISTINCT terms (a 100-repeat spam token costs one
row), (2) a document-frequency band [min_df, max_df] that drops both
hapaxes and stopwords BEFORE the pair join (the stopword ceiling is
what keeps the fan quadratic-in-vocabulary-per-doc, not
quadratic-in-corpus), (3) the pair join is an equi-join on doc_id
with a < total order so each unordered pair appears once, and
(4) the final n_ab >= min_pairs filter runs on the aggregated counts.
Doc-frequency tables are tiny and broadcast.  At 10^12 docs every
stage is a bounded-fan shuffle keyed by doc or by term pair —
never a cross join.

Counts are exact integers; only the final pmi value touches libm
(one ln), floor-quantized at 1e-4 — the DuckDB oracle replays the
identical expression.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PMIQ = 1e4


def pmi_pairs(
    docs: DataFrame,
    min_df: int = 5,
    max_df_ratio: float = 0.8,
    min_pairs: int = 5,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(term_a, term_b, n_ab, n_a, n_b, pmi_q) for vocabulary term
    pairs co-occurring in >= min_pairs documents; term_a < term_b."""
    toks = (
        docs.select(
            F.col(doc_id).alias("_doc"),
            F.explode(F.split(F.trim(F.col(text)), r"\s+")).alias("_raw"),
        )
        .select("_doc", F.lower(F.col("_raw")).alias("_term"))
        .where(F.col("_term").rlike("^[a-z]+$"))
        .distinct()
    )
    n_docs = docs.select(F.countDistinct(doc_id).alias("_n"))
    dfreq = toks.groupBy("_term").agg(F.count(F.lit(1)).alias("_df"))
    vocab = dfreq.crossJoin(F.broadcast(n_docs)).where(
        (F.col("_df") >= min_df)
        & (F.col("_df") <= F.col("_n") * max_df_ratio)
    )
    tv = toks.join(F.broadcast(vocab.select("_term", "_df", "_n")), on="_term")
    a = tv.select(
        F.col("_doc"),
        F.col("_term").alias("term_a"),
        F.col("_df").alias("n_a"),
        F.col("_n"),
    )
    b = tv.select(
        F.col("_doc"), F.col("_term").alias("term_b"), F.col("_df").alias("n_b")
    )
    pairs = a.join(b, on="_doc").where(F.col("term_a") < F.col("term_b"))
    agg = pairs.groupBy("term_a", "term_b").agg(
        F.count(F.lit(1)).alias("n_ab"),
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.first("_n").alias("_n"),
    )
    pmi = F.log(
        (F.col("n_ab").cast("double") * F.col("_n").cast("double"))
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    return (
        agg.where(F.col("n_ab") >= min_pairs)
        .select(
            "term_a",
            "term_b",
            "n_ab",
            "n_a",
            "n_b",
            F.floor(pmi * _PMIQ).cast("long").alias("pmi_q"),
        )
    )
