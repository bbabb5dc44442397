"""Approximate-nearest-neighbor search over embedding columns.

- :func:`cosine_topk` — brute-force baseline: broadcast the query set,
  dot products via ``F.zip_with`` + ``F.aggregate`` (native, JVM-side,
  no Python), window top-k.  Exact; linear in |corpus| x |queries|.
- :func:`lsh_topk` — scale path: random-hyperplane LSH.  Signature
  bits are sign(dot(v, plane_j)) with planes drawn from a seeded
  driver RNG and inlined as literal arrays (tiny: bits x dim floats).
  Corpus is bucketed by signature; queries probe their bucket plus
  multi-probe flips of the lowest-margin bits, then refine exactly.

Scale notes (10^12 rows x 64 dims):
- both paths avoid shuffling the corpus for the join (broadcast
  queries / broadcast probe table); the only wide op is the final
  per-query top-k window over candidate rows.
- signatures are one narrow pass; store them bucketed/Z-ordered so
  repeated queries prune at scan time (partition filter on sig).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: returns (query_id, neighbor_id, rank, cos)."""
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).cast("array<double>").alias("_qv"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).cast("array<double>").alias("_cv"),
    )
    pairs = c.crossJoin(F.broadcast(q))
    cos = _dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv")))
    pairs = pairs.withColumn("cos", cos)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    """Seeded random hyperplane matrix (bits x dim), unit rows."""
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((bits, dim))
    return h / np.linalg.norm(h, axis=1, keepdims=True)


def signature_col(vec, planes: np.ndarray):
    """int64 signature column: bit j = 1 iff dot(vec, plane_j) >= 0."""
    sig = F.lit(0).cast("long")
    for j, row in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in row])
        sig = sig + F.when(_dot(vec, lit_plane) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe_bits: int = 2,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """LSH-bucketed cosine top-k (approximate).

    Queries probe their own bucket plus every bucket within hamming
    distance ``multiprobe_bits`` lowest bits flipped (cheap static
    multi-probe: 1 + bits + C(bits,2) probes for 2 bits).
    """
    planes = hyperplanes(dim, bits, seed)
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).cast("array<double>").alias("_cv"),
    ).withColumn("_sig", signature_col(F.col("_cv"), planes))

    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).cast("array<double>").alias("_qv"),
    ).withColumn("_sig", signature_col(F.col("_qv"), planes))

    # probe signatures: identity + single-bit flips (+ pairs if asked)
    probes = [F.col("_sig")]
    for j in range(bits):
        probes.append(F.col("_sig").bitwiseXOR(F.lit(1 << j)))
    if multiprobe_bits >= 2:
        for j in range(bits):
            for l in range(j + 1, bits):
                probes.append(F.col("_sig").bitwiseXOR(F.lit((1 << j) | (1 << l))))
    qp = q.withColumn("_probe", F.explode(F.array(*probes)))

    cand = c.join(F.broadcast(qp), c["_sig"] == qp["_probe"], "inner")
    cos = _dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv")))
    cand = cand.withColumn("cos", cos)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


# ----------------------------------------------------------------- IVF
def train_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    sample_n: int = 4096,
    iters: int = 10,
    seed: int = 7,
) -> np.ndarray:
    """Driver-side Lloyd k-means on a deterministic bounded sample
    (TakeOrdered by id — one pass over the corpus, no full collect).
    Returns float64 [n_centroids, dim].  At 10^12 rows the sample stays
    the same size; training cost is independent of corpus scale."""
    rows = (
        corpus.select(corpus_id, corpus_vec)
        .orderBy(corpus_id)
        .limit(sample_n)
        .collect()
    )
    X = np.array([r[1] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    return cents


def _assign_udf(cents: np.ndarray, top: int = 1):
    """pandas UDF: vector -> nearest-centroid id (top=1) or the id
    array of the ``top`` nearest centroids (vectorized matmul)."""
    from pyspark.sql.types import ArrayType, IntegerType

    C = cents.astype(np.float64)

    if top == 1:

        @F.pandas_udf(IntegerType())
        def one(s: pd.Series) -> pd.Series:
            X = np.array(s.tolist(), dtype=np.float64)
            X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            return pd.Series(np.argmax(X @ C.T, axis=1).astype(np.int32))

        return one

    @F.pandas_udf(ArrayType(IntegerType()))
    def many(s: pd.Series) -> pd.Series:
        X = np.array(s.tolist(), dtype=np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ C.T
        idx = np.argsort(-sims, axis=1)[:, :top]
        return pd.Series([row.astype(np.int32).tolist() for row in idx])

    return many


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """IVF cosine top-k: corpus rows carry their nearest-centroid cell
    (one narrow pandas pass — store it as a partition column at 10^12
    rows so probes prune at scan time); queries probe their ``nprobe``
    nearest cells via a broadcast join, then refine with the exact
    ordered-fold cosine and a per-query top-k window.

    ``nprobe = len(centroids)`` probes every cell and is EXACTLY
    equivalent to brute force (each corpus row lives in exactly one
    cell) — the oracle mode; small nprobe is the recall/cost dial.
    """
    assign1 = _assign_udf(centroids, top=1)
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).cast("array<double>").alias("_cv"),
    ).withColumn("_cell", assign1(F.col("_cv")))

    assign_n = _assign_udf(centroids, top=min(nprobe, len(centroids)))
    q = (
        queries.select(
            F.col(query_id).alias("query_id"),
            F.col(query_vec).cast("array<double>").alias("_qv"),
        )
        .withColumn("_probes", assign_n(F.col("_qv")))
        .withColumn("_probe", F.explode("_probes"))
        .drop("_probes")
    )

    cand = c.join(F.broadcast(q), c["_cell"] == q["_probe"], "inner")
    cos = _dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv")))
    cand = cand.withColumn("cos", cos)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


# ------------------------------------------------- cosine near-dup pairs
def cosine_dedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe_bits: int = 1,
    pair_cap: int = 10000,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (id_a < id_b, cos >=
    threshold) — the embedding leg of the dedup suite.

    Scale shape mirrors minhash LSH: hyperplane signatures bucket the
    corpus (narrow), candidates come from same-bucket self-joins plus
    ``multiprobe_bits`` single-bit-flip buckets (high-cos pairs differ
    in few sign bits), per-(probe, bucket) membership is capped at
    ``pair_cap`` by id order, and survivors are verified with the
    exact ordered-fold cosine.  bits=0 degrades to exact all-pairs
    (the oracle mode).
    """
    c = corpus.select(
        F.col(corpus_id).alias("id"),
        F.col(corpus_vec).cast("array<double>").alias("_v"),
    )
    if bits <= 0:
        a = c.select(F.col("id").alias("id_a"), F.col("_v").alias("_va"))
        b = c.select(F.col("id").alias("id_b"), F.col("_v").alias("_vb"))
        pairs = a.join(b, a["id_a"] < b["id_b"])
    else:
        planes = hyperplanes(dim, bits, seed)
        # signatures only — the candidate join and its dedup shuffle
        # carry (id, sig) ints, never the embedding vectors (SURVEY §7:
        # join ids first, re-attach payload last)
        s = c.select("id", signature_col(F.col("_v"), planes).alias("_sig"))
        probes = [F.col("_sig")]
        if multiprobe_bits >= 1:
            for j in range(bits):
                probes.append(F.col("_sig").bitwiseXOR(F.lit(1 << j)))
        e = s.withColumn("_probe", F.explode(F.array(*probes)))
        # cap every (probe-bucket) membership like minhash_lsh_pairs
        w = Window.partitionBy("_probe").orderBy("id")
        e = e.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= pair_cap)
        a = e.select(F.col("_probe"), F.col("id").alias("id_a"))
        # b side from the UN-exploded signatures: each home-bucket row
        # appears once, so a probe hit produces each candidate pair at
        # most once per flip direction (not once per b probe row);
        # capped per home bucket so a degenerate bucket stays bounded
        # by ~pair_cap^2/2 candidates, as before
        wb = Window.partitionBy("_sig").orderBy("id")
        b = (
            s.withColumn("_rn", F.row_number().over(wb))
            .where(F.col("_rn") <= pair_cap)
            .select(F.col("_sig").alias("_sb"), F.col("id").alias("id_b"))
        )
        ids = (
            a.join(b, (a["_probe"] == b["_sb"]) & (a["id_a"] < b["id_b"]))
            .select("id_a", "id_b")
            .distinct()
        )
        pairs = ids.join(
            c.select(F.col("id").alias("id_a"), F.col("_v").alias("_va")), "id_a"
        ).join(
            c.select(F.col("id").alias("id_b"), F.col("_v").alias("_vb")), "id_b"
        )
    cos = _dot(F.col("_va"), F.col("_vb")) / (
        _norm(F.col("_va")) * _norm(F.col("_vb"))
    )
    return (
        pairs.withColumn("cos", cos)
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
