"""Checkpoint-resumable pipeline stages with per-partition lineage +
metrics tables (north-rule requirement).

Model: a pipeline is a named sequence of stages; each stage writes its
output to ``<root>/<stage>/data`` (parquet, atomic via Spark's
committer), then appends one row per output partition to the lineage
table and one summary row to the metrics table.  ``run_stage`` skips
stages whose _SUCCESS marker already exists, so a killed job re-run
with the same root resumes after the last completed stage — the batch
analog of Structured Streaming state recovery (SURVEY.md §2.8).

Lineage row:   (stage, part_id, n_rows, min_key, max_key, wall_ts)
Metrics row:   (stage, n_rows, n_parts, elapsed_s, wall_ts, extra)

At 10^12 rows checkpoints are Iceberg snapshots in production; plain
parquet directories here keep the sandbox dependency-free while
exercising identical resume semantics (existence check + atomic
commit + lineage audit).
"""
from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _success(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


class CheckpointedPipeline:
    def __init__(self, spark: SparkSession, root: str, key_col: str | None = None):
        self.spark = spark
        self.root = root
        self.key_col = key_col
        os.makedirs(root, exist_ok=True)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage, "data")

    def run_stage(
        self,
        stage: str,
        build,  # Callable[[], DataFrame]
        key_col: str | None = None,
        extra_metrics: dict | None = None,
    ) -> DataFrame:
        """Materialize ``build()`` under this stage name, or reload the
        existing checkpoint if the stage already completed."""
        data_dir = self._stage_dir(stage)
        key = key_col or self.key_col
        if _success(data_dir):
            return self.spark.read.parquet(data_dir)

        t0 = time.time()
        df = build()
        df.write.mode("overwrite").parquet(data_dir)
        out = self.spark.read.parquet(data_dir)
        elapsed = time.time() - t0

        # per-partition lineage (partition = output file); the stage
        # totals for the metrics row fall out of the same aggregate, so
        # the freshly-written data is re-scanned exactly once — at 10^12
        # rows a separate count() would be a second full pass.
        lin = out.withColumn("_file", F.input_file_name()).groupBy("_file")
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        if key and key in out.columns:
            aggs += [F.min(key).alias("min_key"), F.max(key).alias("max_key")]
        lineage = (
            lin.agg(*aggs)
            .withColumn("stage", F.lit(stage))
            .withColumn("wall_ts", F.lit(time.time()))
        )
        lineage = lineage.persist()
        lineage.write.mode("append").parquet(os.path.join(self.root, "_lineage"))
        tot = lineage.agg(
            F.sum("n_rows").alias("n"), F.count(F.lit(1)).alias("p")
        ).collect()[0]
        lineage.unpersist()
        n_rows = int(tot["n"] or 0)
        n_parts = int(tot["p"])
        metrics_row = {
            "stage": stage,
            "n_rows": n_rows,
            "n_parts": n_parts,
            "elapsed_s": round(elapsed, 3),
            "wall_ts": time.time(),
            "extra": json.dumps(extra_metrics or {}),
        }
        self.spark.createDataFrame([metrics_row]).write.mode("append").parquet(
            os.path.join(self.root, "_metrics")
        )
        return out

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_lineage"))

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_metrics"))

    def completed_stages(self) -> list[str]:
        out = []
        for name in sorted(os.listdir(self.root)):
            if name.startswith("_"):
                continue
            if _success(self._stage_dir(name)):
                out.append(name)
        return out
