"""Caption<->embedding alignment operator: featurizer determinism,
cosine fold exactness, threshold semantics, partitioning invariance.
"""
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from proj_spark.operators.align import (
    ALIGN_A,
    ALIGN_B,
    ALIGN_M,
    alignment_stats,
    cosine_col,
    text_pseudo_embedding,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame(
            [(i, t) for i, t in enumerate(texts)], columns=["doc_id", "text"]
        )
    )


def test_pseudo_embedding_deterministic_and_bounded(spark):
    texts = ["the quick brown fox", "jumps over", "the quick brown fox", "x"]
    df = _docs(spark, texts)
    a = {r["doc_id"]: r["text_vec"] for r in text_pseudo_embedding(df).collect()}
    b = {
        r["doc_id"]: r["text_vec"]
        for r in text_pseudo_embedding(df.repartition(5)).collect()
    }
    assert a == b  # partitioning-invariant, exact doubles
    assert a[0] == a[2]  # same text -> same vector
    assert a[0] != a[1]
    for vec in a.values():
        assert len(vec) == 64
        assert all(-1.0 <= v < 1.0 for v in vec)
    # replay component 0 of doc 0 against the closed form
    from proj_spark.operators.text import fingerprint

    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    exp0 = ((fp[0] * ALIGN_A + 0 * ALIGN_B) % ALIGN_M) / ALIGN_M * 2.0 - 1.0
    assert a[0][0] == exp0


def test_cosine_col_identity_and_orthogonal(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "a": [[1.0, 0.0, 2.0], [1.0, 0.0, 0.0]],
                "b": [[1.0, 0.0, 2.0], [0.0, 1.0, 0.0]],
            }
        )
    )
    got = [r["c"] for r in df.select(cosine_col(F.col("a"), F.col("b")).alias("c")).collect()]
    assert abs(got[0] - 1.0) < 1e-12
    assert abs(got[1]) < 1e-12


def test_alignment_stats_threshold_and_grouping(spark):
    docs = _docs(spark, [f"caption number {i} words" for i in range(40)])
    # embeddings: half are the doc's own pseudo-embedding (cos == 1),
    # half its negation (cos == -1) — exact threshold split
    tv = {r["doc_id"]: np.array(r["text_vec"]) for r in text_pseudo_embedding(docs).collect()}
    rows = []
    for i in range(40):
        vec = tv[i] if i % 2 == 0 else -tv[i]
        rows.append((i, [float(v) for v in vec], i % 4))
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    out = {
        r["label"]: r
        for r in alignment_stats(docs, emb, group_col="label").collect()
    }
    assert set(out) == {0, 1, 2, 3}
    for lbl, r in out.items():
        assert r["n"] == 10
        # even doc_ids align (cos=1 -> 10000), odd anti-align (-10000);
        # labels 0,2 hold even ids only, 1,3 odd ids only
        if lbl % 2 == 0:
            # cos == 1 up to the fold's last-ulp: floor(1e4*cos) is
            # 10000 or 9999 per row, never below
            assert r["n_aligned"] == 10
            assert 99990 <= r["sum_cos_e4"] <= 100000
        else:
            assert r["n_aligned"] == 0 and r["sum_cos_e4"] == -100000
    # ungrouped global rollup
    g = alignment_stats(docs, emb).collect()[0]
    assert (g["n"], g["n_aligned"]) == (40, 20)
    assert -10 <= g["sum_cos_e4"] <= 0
