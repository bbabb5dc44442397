"""Token-budget packing: assign documents to fixed-budget packs.

Training dataloaders consume documents in packs of ~budget tokens
(sequence packing); the pipeline must pre-assign a pack id that is
deterministic and stable under any partitioning — a greedy
per-partition packer would change assignments whenever partitioning
changed, breaking resume.

Rule: documents are ordered canonically (LCG hash of the id, id as
tie-break) WITHIN a hash bucket, and a document joins pack
floor(tokens_before_it / budget) — i.e. packs are cut at budget
boundaries of the running token count.  A document that straddles a
boundary belongs to the pack it started in (packs may overflow by at
most one document — the standard greedy-with-overflow rule; trimming
is the tokenizer's job downstream).

Scale shape: one window per bucket (``n_buckets`` controls the sort
width — each bucket sorts |rows|/n_buckets rows), no global sort, no
driver state.  pack_id = bucket * 2^40 + local pack index, collision-
free up to 2^40 packs per bucket.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import MINHASH_A, MINHASH_B, MINHASH_P

_PACK_SHIFT = 40


def pack_by_token_budget(
    df: DataFrame,
    budget: int,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    hash_idx: int = 0,
    tie_col: str | None = None,
) -> DataFrame:
    """Add ``pack_id`` (long) and ``pack_pos`` (the document's running
    token offset within its pack) to ``df``.

    ``tie_col``: optional extra ordering column after (hash, id) — pass
    it when ``id_col`` is itself a derived hash that may collide (e.g.
    xxhash64 of a string key), so the canonical order stays total and
    the assignment deterministic."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    a, b = MINHASH_A[hash_idx % 8], MINHASH_B[hash_idx % 8]
    x = F.pmod(F.col(id_col).cast("long"), F.lit(MINHASH_P))
    h = F.pmod(F.lit(a) * x + F.lit(b), F.lit(MINHASH_P))
    bucket = F.pmod(h, F.lit(n_buckets))
    out = df.withColumn("_h", h).withColumn("_bkt", bucket)
    order = [F.col("_h").asc(), F.col(id_col).asc()]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    w = Window.partitionBy("_bkt").orderBy(*order)
    before = F.coalesce(
        F.sum(n_tokens_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    local = F.floor(before / F.lit(float(budget))).cast("long")
    return (
        out.withColumn("_before", before)
        .withColumn(
            "pack_id", (F.col("_bkt").cast("long") * F.lit(1 << _PACK_SHIFT)) + local
        )
        .withColumn(
            "pack_pos",
            (F.col("_before") - local * F.lit(budget)).cast("long"),
        )
        .drop("_h", "_bkt", "_before")
    )
