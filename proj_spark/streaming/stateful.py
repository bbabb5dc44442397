"""Custom stateful streaming operator: per-tile running accumulator
via applyInPandasWithState.

The brief's 'custom stateful operators' slot: where the built-in
windowed aggregation (streaming/tiles.py) covers watermarked counts,
this operator keeps arbitrary per-key running state across
micro-batches — cumulative count, running centroid of the points in
the tile, and the max event-time seen — the shape a progressive tile
materializer needs (emit refined tiles as data arrives).

State size is bounded by the live tile universe (keys), not input
volume; a processing-time timeout evicts idle tiles.
"""
from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions import expressions as E

_OUT_SCHEMA = (
    "tile_x LONG, tile_y LONG, n_total LONG, centroid_lon DOUBLE, "
    "centroid_lat DOUBLE, batches LONG"
)
_STATE_SCHEMA = "n LONG, sum_lon DOUBLE, sum_lat DOUBLE, batches LONG"


def _make_accumulator_update(ttl: int):
    """Module-level factory so the timeout-eviction path is unit
    testable with a fake GroupState (a real ProcessingTimeTimeout
    firing needs a long-lived wall-clock stream)."""

    def _update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle-tile eviction: drop state, emit nothing, do NOT
            # re-arm the timeout (re-arming would recur forever and
            # the advertised TTL eviction would never happen)
            state.remove()
            return
        n, sum_lon, sum_lat, batches = (
            state.get if state.exists else (0, 0.0, 0.0, 0)
        )
        for pdf in pdfs:
            n += len(pdf)
            sum_lon += float(pdf["lon"].sum())
            sum_lat += float(pdf["lat"].sum())
        batches += 1
        state.update((n, sum_lon, sum_lat, batches))
        if ttl:
            state.setTimeoutDuration(ttl)
        yield pd.DataFrame(
            {
                "tile_x": [key[0]],
                "tile_y": [key[1]],
                "n_total": [n],
                "centroid_lon": [sum_lon / n if n else 0.0],
                "centroid_lat": [sum_lat / n if n else 0.0],
                "batches": [batches],
            }
        )

    return _update


def stream_tile_accumulator(
    events: DataFrame,
    zoom: int,
    lon: str = "lon",
    lat: str = "lat",
    ttl_ms: int = 0,
) -> DataFrame:
    """Streaming DataFrame -> per-tile running (count, centroid,
    batch count), updated each micro-batch (update output mode).

    ``ttl_ms`` > 0 enables idle-tile eviction (ProcessingTimeTimeout)
    for long-running queries; leave 0 under Trigger.AvailableNow —
    with a processing-time timeout Spark schedules endless
    timeout-check micro-batches and the drain never terminates."""
    ttl = int(ttl_ms)
    _update = _make_accumulator_update(ttl)
    tiled = events.select(
        E.tile_x(lon, zoom).alias("tile_x"),
        E.tile_y(lat, zoom).alias("tile_y"),
        F.col(lon).alias("lon"),
        F.col(lat).alias("lat"),
    )
    return tiled.groupBy("tile_x", "tile_y").applyInPandasWithState(
        _update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl
            else GroupStateTimeout.NoTimeout
        ),
    )


# --------------------------------------------------------- streaming dedup
_DEDUP_OUT_SCHEMA = "content_key LONG, doc_id STRING, n_dupes_seen LONG"
_DEDUP_STATE_SCHEMA = "first_id STRING, n_seen LONG"


def _make_dedup_update(ttl: int):
    """Module-level factory (see _make_accumulator_update)."""

    def _update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL eviction: forget the key (exactness beyond the TTL
            # horizon is probabilistic by design — docstring above)
            state.remove()
            return
        first_id, n_seen = state.get if state.exists else (None, 0)
        new = first_id is None
        for pdf in pdfs:
            for did in pdf["doc_id"]:
                n_seen += 1
                if first_id is None:
                    first_id = str(did)
        state.update((first_id, n_seen))
        if ttl:
            state.setTimeoutDuration(ttl)
        if new:
            # emit ONLY on first sight: each content key surfaces once
            yield pd.DataFrame(
                {"content_key": [key[0]], "doc_id": [first_id], "n_dupes_seen": [n_seen]}
            )
        else:
            yield pd.DataFrame(
                {"content_key": [], "doc_id": [], "n_dupes_seen": []}
            ).astype({"content_key": "int64", "doc_id": "str", "n_dupes_seen": "int64"})

    return _update


def stream_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    output_mode: str = "update",
    ttl_ms: int = 0,
) -> DataFrame:
    """Streaming EXACT dedup: the canonical training-data ingest
    filter.  Documents are keyed by xxhash64(content) (narrow, native);
    per-key state remembers the first-seen id, and a key's row is
    emitted ONLY on first sight — later micro-batches containing the
    same content produce nothing.

    Scale design (10^12 docs): state size is bounded by DISTINCT
    content keys, not volume; ``ttl_ms`` idle eviction bounds cold keys
    (exactness beyond the TTL horizon is then probabilistic, the
    standard trade for unbounded streams — put a bloom-filter stage
    upstream if re-ingest storms are expected).  The groupBy shuffles
    only (key, id) pairs, never payloads.
    """
    keyed = docs.select(
        F.xxhash64(F.col(text_col)).alias("content_key"),
        F.col(id_col).cast("string").alias("doc_id"),
    )
    # emissions are one-shot per key (first sight only), so 'append'
    # is equally valid and enables file sinks with checkpoint recovery
    ttl = int(ttl_ms)
    _update = _make_dedup_update(ttl)
    return keyed.groupBy("content_key").applyInPandasWithState(
        _update,
        outputStructType=_DEDUP_OUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl
            else GroupStateTimeout.NoTimeout
        ),
    )


def minhash_key_udf(n_hashes: int = 8, w: int = 3):
    """Per-row minhash signature key (narrow pandas UDF, no shuffle):
    crc32 shingle ids -> min over the dedup LCG family
    (operators/dedup.py MINHASH_*), folded to one int64.  A pure
    function of the text, so checkpoint restarts recompute identical
    keys.  Two documents share the key iff ALL n component minhashes
    agree — Jaccard ~>= 0.9 with high probability at n=8.  Documents
    too short to form a w-shingle get an exact-text key (negative
    range, disjoint from signature keys), so distinct short docs are
    never conflated."""
    import zlib

    import numpy as np

    from ..operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    @F.pandas_udf("long")
    def _udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = str(t).lower().split()
            shingles = {
                " ".join(toks[i : i + w]) for i in range(max(len(toks) - w + 1, 0))
            }
            if shingles:
                tids = np.fromiter(
                    (zlib.crc32(s.encode()) & 0x7FFFFFFF for s in shingles),
                    dtype=np.int64,
                    count=len(shingles),
                )
                key = np.int64(0)
                for i in range(n_hashes):
                    mh = int(
                        (
                            (MINHASH_A[i % 8] * tids + MINHASH_B[i % 8]) % MINHASH_P
                        ).min()
                    )
                    key = np.int64(
                        (int(key) * 6364136223846793005 + mh) % (1 << 63)
                    )
            else:
                # sub-shingle doc: fall back to an exact-text key in
                # the negative range (disjoint from signature keys) so
                # distinct short docs dedup only against identical
                # text.  62-bit blake2b, not crc32 — 31 bits would
                # birthday-collide distinct short docs past ~80k keys
                import hashlib

                d = hashlib.blake2b(str(t).encode(), digest_size=8).digest()
                key = np.int64(-2 - (int.from_bytes(d, "big") >> 2))
            out.append(int(key))
        return pd.Series(out, dtype="int64")

    return _udf


def stream_near_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    w: int = 3,
    output_mode: str = "update",
    ttl_ms: int = 0,
) -> DataFrame:
    """Streaming NEAR-dup filter at minhash-signature granularity:
    like :func:`stream_dedup`, but the content key is the folded
    n-minhash signature over w-shingles, so whitespace/case noise and
    other edits that keep the w-shingle set identical dedup to one
    emission (edits that change shingles — reorders, rewrites — are
    the batch LSH path's job).

    Granularity note: signature EQUALITY (all n minhashes agree), not
    banded LSH — single-band streaming recall of lower-similarity
    pairs needs cross-key coordination that a per-key stateful op
    cannot see; run the batch ``lsh_candidate_pairs`` ->
    ``connected_components`` path over the survivors for that.  Same
    scale/state story as stream_dedup (state ~ distinct signatures,
    TTL eviction opt-in)."""
    keyed = docs.select(
        minhash_key_udf(n_hashes, w)(F.col(text_col)).alias("content_key"),
        F.col(id_col).cast("string").alias("doc_id"),
    )
    ttl = int(ttl_ms)
    _update = _make_dedup_update(ttl)
    return keyed.groupBy("content_key").applyInPandasWithState(
        _update,
        outputStructType=_DEDUP_OUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl
            else GroupStateTimeout.NoTimeout
        ),
    )
