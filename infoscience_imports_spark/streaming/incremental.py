"""Incremental dedup via Structured Streaming (foreachBatch).

The reference is a batch pipeline — "incrementality comes from the sliding
time window and deduplication" (``README.md:463-471``); it has no streaming
operators (SURVEY.md §2.10). This module is the Spark-native upgrade of that
incrementality story: new page files land in a directory, a file-source
stream picks them up, and each micro-batch is deduplicated **against the
accumulated signature state** — the same move as the reference's
"dedup against the repository" second pass (``deduplicator.py:146-162``),
with the per-row Solr lookup replaced by a digest anti-join.

Kept deliberately narrow (exact-dup increments + signature accumulation);
full incremental LSH would re-bucket only new signatures against stored
buckets — same joins as the batch stages, driven per micro-batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DedupConfig, DEFAULT_CONFIG
from ..functions.text import extract_text_col, normalize_text_col
from ..operators import signatures as sigs


class IncrementalDedup:
    """Streaming exact-dedup: state = signatures parquet dir, keyed by digest."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        cfg: DedupConfig = DEFAULT_CONFIG,
    ):
        self.spark = spark
        self.cfg = cfg
        self.state_dir = state_dir
        self.sig_dir = os.path.join(state_dir, "signatures")
        self.new_dir = os.path.join(state_dir, "new_unique")
        self.checkpoint_dir = os.path.join(state_dir, "_stream_checkpoint")

    # -- batch kernel (also used by foreachBatch) ------------------------------
    def process_batch(self, pages: DataFrame, batch_id: int) -> None:
        ext = pages.select(
            F.xxhash64("url").alias("doc_id"),
            normalize_text_col(extract_text_col(F.col("html"))).alias("text_norm"),
        )
        sg = sigs.compute_signatures(ext, self.cfg)
        if os.path.isdir(self.sig_dir) and any(
            f.endswith(".parquet") for f in os.listdir(self.sig_dir)
        ):
            known = self.spark.read.parquet(self.sig_dir).select("digest").distinct()
            fresh = sg.join(known, on="digest", how="left_anti")
        else:
            fresh = sg
        # within-batch exact dedup: keep min doc_id per digest
        from pyspark.sql import Window

        w = Window.partitionBy("digest").orderBy("doc_id")
        fresh_unique = (
            fresh.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        fresh_unique.write.mode("append").parquet(self.sig_dir)
        fresh_unique.select("doc_id", "digest").withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(self.new_dir)

    # -- streaming driver -------------------------------------------------------
    def start(self, input_dir: str, schema, trigger_available_now: bool = True):
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 16)
            .parquet(input_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("update")
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def unique_docs(self) -> DataFrame:
        return self.spark.read.parquet(self.new_dir)
