"""Streaming image+caption ingest (the north-star table's front door).

A 10^12-image table is not loaded in one batch — it arrives as a
stream of files/shards.  This lane is the Structured Streaming form of
the ingest gate: readStream over the landing directory -> decode +
payload invariants (PSNR>=40 for lossy, exact for png, caption
equality) -> derived centroid + tile key -> append sink, with the
checkpoint making the whole ingest exactly-once and resumable (kill
the job mid-stream, restart with the same checkpointLocation, and
already-committed source files are never re-processed).

Every transformation here is stateless per row (mapInPandas decode,
pandas-UDF centroid, tile expressions), so the stream needs no
watermark and no state store: throughput scales with executors exactly
like the batch payload gate (BENCH_SCALING.json payload_decode_pair —
0.82 N->4N efficiency, pure Python-worker compute).

The gate uses :func:`proj_spark.sources.images.gate_payloads` (one
fused mapInPandas pass) rather than verify_payloads + join: joining
verdicts back to rows would be a stream-stream join — stateful,
watermark-bound, and pointlessly expensive when the verdict is
computable in the same pass that reads the row.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import expressions as E
from ..sources.images import gate_payloads, with_centroids


def stream_image_ingest(
    images: DataFrame,
    zoom: int = 11,
    min_psnr: float = 40.0,
    keep_bytes: bool = False,
) -> DataFrame:
    """Gate + geo-key a (streaming or batch) image+caption DataFrame.

    Returns rows that pass the payload invariants, with the derived
    centroid (lon, lat), the zoom-``zoom`` tile key (tile_x, tile_y)
    and the measured psnr_db appended — the shape the tile-bucketed
    production table wants at write time (sources/tables.py).  Rows
    failing the gate are dropped; count them upstream via
    ``gate_payloads`` directly if a rejects audit stream is needed.
    """
    gated = gate_payloads(images, min_psnr=min_psnr, keep_bytes=keep_bytes)
    ok = gated.where(F.col("caption_ok") & F.col("pixels_ok"))
    keyed = with_centroids(ok)
    return (
        keyed.withColumn("tile_x", E.tile_x("lon", F.lit(zoom)))
        .withColumn("tile_y", E.tile_y("lat", F.lit(zoom)))
        .drop("caption_ok", "pixels_ok")
    )


def run_image_ingest(
    spark,
    src_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    zoom: int = 11,
    min_psnr: float = 40.0,
) -> None:
    """One availableNow ingest pass: drain whatever landed under
    ``src_dir`` since the last committed offset into the parquet sink,
    exactly once, then stop.  Repeated calls with the same
    ``checkpoint_dir`` resume; a crash between calls loses nothing
    (the sink commit and the source offsets are both checkpointed).
    """
    from ..sources.images import IMAGE_SCHEMA

    stream = spark.readStream.schema(IMAGE_SCHEMA).parquet(src_dir)
    out = stream_image_ingest(stream, zoom=zoom, min_psnr=min_psnr)
    (
        out.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
