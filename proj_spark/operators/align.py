"""Caption <-> image-embedding alignment filtering — the LAION-style
curation stage that drops image+caption pairs whose caption does not
describe the image.

In production the two sides are a CLIP text embedding and a CLIP image
embedding; this module supplies the Spark-side machinery with a
deterministic, cross-engine-reproducible text featurizer standing in
for the text encoder (swap :func:`text_pseudo_embedding` for a real
encoder column when one exists — everything downstream is unchanged):

- :func:`text_pseudo_embedding`: rolling-hash fingerprint of the
  caption (operators/text.py:fingerprint — exact int64 modular math)
  seeds a Lehmer LCG expanded to ``dim`` components in [-1, 1).  Pure
  ``sequence``/``transform`` expressions, whole-stage codegen, exactly
  replayable in ANSI SQL.
- :func:`cosine_col`: ordered-fold cosine between two array columns
  (same sequential fold as operators/ann.py, so DuckDB ``list_reduce``
  reproduces it bit-for-bit).
- :func:`alignment_stats`: per-row floor-quantized score (partition-
  invariant integer aggregates) + threshold verdict.

100 TB shape: the join is id-keyed (caption table x embedding table,
co-partitioned or bucketed on the id), the score is a narrow projection
— no shuffle beyond the join, vectors never pass through an exchange
twice (score computed immediately after the join, vectors dropped).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALIGN_M = 2147483647  # 2^31-1 Mersenne prime (Lehmer modulus)
ALIGN_A = 16807  # Park-Miller multiplier
ALIGN_B = 12345


def text_pseudo_embedding(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """(id, text) -> (id, text_vec: array<double>) deterministic
    hash-projection featurizer: component i is
    ``((fp * A + i * B) mod M) / M * 2 - 1`` with fp the rolling-hash
    fingerprint of the caption.  Bounded int64 arithmetic (fp < 2^31,
    so fp*A < 2^45), exact in SQL."""
    from proj_spark.operators.text import fingerprint

    fp = fingerprint(df, text=text, id_col=id_col)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            (F.col("fingerprint") * ALIGN_A + i.cast("long") * ALIGN_B) % ALIGN_M
        ).cast("double")
        / float(ALIGN_M)
        * 2.0
        - 1.0,
    )
    return fp.select(id_col, vec.alias("text_vec"))


def cosine_col(a: Column, b: Column) -> Column:
    """Ordered-fold cosine of two array<numeric> columns (sequential
    accumulation, DuckDB list_reduce parity; see operators/ann.py)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    dot = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (na * nb)


def alignment_stats(
    captions: DataFrame,
    embeddings: DataFrame,
    caption_id: str = "doc_id",
    emb_id: str = "vec_id",
    text: str = "text",
    emb_col: str = "embedding",
    group_col: str | None = None,
    threshold_e4: int = 0,
    dim: int = 64,
) -> DataFrame:
    """Join captions to their image embeddings by id, score alignment,
    and roll up exact integer stats (optionally per ``group_col``):
    n pairs, n_aligned (floor(cos*1e4) >= threshold_e4), sum_cos_e4.

    Per-row floor BEFORE aggregation keeps the rollup bit-identical
    under any partitioning (float summation order cannot flip it)."""
    tv = text_pseudo_embedding(captions, text=text, id_col=caption_id, dim=dim)
    keep = [emb_id, emb_col] + ([group_col] if group_col else [])
    sel = embeddings.select(*keep)
    j = tv.join(sel, tv[caption_id] == sel[emb_id], "inner")
    cos_e4 = F.floor(cosine_col(F.col("text_vec"), F.col(emb_col)) * 1e4).cast(
        "long"
    )
    scored = j.select(
        *( [F.col(group_col)] if group_col else [] ),
        cos_e4.alias("cos_e4"),
    )
    gb = scored.groupBy(group_col) if group_col else scored.groupBy()
    return gb.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("cos_e4") >= threshold_e4, 1).otherwise(0)
        ).alias("n_aligned"),
        F.sum("cos_e4").alias("sum_cos_e4"),
    )
