"""Dedup operator plan-shape parity tests."""
from __future__ import annotations

from pyspark.sql import functions as F


def test_minhash_fast_narrow_equals_explode_formulation(spark):
    """The fast minhash path (array_min over transform — narrow, no
    shuffle) must produce the signatures of the original explode ->
    distinct -> groupBy(min) formulation exactly."""
    from proj_spark.operators.dedup import minhash_signatures, shingle, tokenize

    docs = spark.createDataFrame(
        [
            ("d1", "the quick brown fox jumps over the lazy dog"),
            ("d2", "the quick brown fox jumps over the lazy cat"),
            ("d3", "completely different text with its own tokens here"),
            ("d4", "  "),  # no usable tokens -> must be dropped
            ("d5", "tiny"),  # < w tokens -> single shingle
        ],
        ["doc_id", "text"],
    )
    sh = shingle(tokenize(docs), w=3)
    fast = {
        r.doc_id: tuple(r[f"mh{i}"] for i in range(8))
        for r in minhash_signatures(sh, deterministic=False).collect()
    }

    # reference formulation, inline
    toks = (
        sh.select("doc_id", F.explode_outer("tokens").alias("token"))
        .where(F.col("token") != "")
        .distinct()
    )
    hashed = toks.select(
        "doc_id", *[F.xxhash64("token", F.lit(i)).alias(f"_h{i}") for i in range(8)]
    )
    ref = {
        r.doc_id: tuple(r[f"mh{i}"] for i in range(8))
        for r in hashed.groupBy("doc_id")
        .agg(*[F.min(f"_h{i}").alias(f"mh{i}") for i in range(8)])
        .collect()
    }
    assert fast == ref
    assert "d4" not in fast
