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

State layout (scale design): the accumulated digest state is written
hash-partitioned by ``state_bucket = pmod(xxhash64(digest), n_buckets)``.
Each micro-batch computes the distinct buckets it touches (≤ n_buckets, a
tiny driver list) and reads ONLY those partitions via partition pruning —
per-batch state I/O is proportional to the batch's bucket fan-out, not to
the total state size, so the "known digests" read no longer grows unbounded
per micro-batch. With Iceberg state tables the same pruning falls out of
min/max data skipping on a digest-sorted table.
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
        n_state_buckets: int = 64,
    ):
        self.spark = spark
        self.cfg = cfg
        self.state_dir = state_dir
        self.sig_dir = os.path.join(state_dir, "signatures")
        self.new_dir = os.path.join(state_dir, "new_unique")
        self.checkpoint_dir = os.path.join(state_dir, "_stream_checkpoint")
        self.n_state_buckets = n_state_buckets

    def _bucket_col(self):
        return F.pmod(F.xxhash64("digest"), F.lit(self.n_state_buckets)).alias(
            "state_bucket"
        )

    # -- legacy state migration ------------------------------------------------
    def _legacy_flat_files(self) -> list[str]:
        """Flat ``*.parquet`` files written by the pre-partitioned layout."""
        if not os.path.isdir(self.sig_dir):
            return []
        return sorted(
            os.path.join(self.sig_dir, f)
            for f in os.listdir(self.sig_dir)
            if f.endswith(".parquet") and os.path.isfile(os.path.join(self.sig_dir, f))
        )

    def _migrate_legacy_state(self) -> None:
        """One-time rewrite of flat (unpartitioned) state into bucket dirs.

        A state dir written before the hash-bucket layout holds bare
        ``part-*.parquet`` files; treating it as empty would silently
        re-admit every known digest. Rewrite those rows partitioned, then
        drop the flat files. A crash between write and delete re-migrates on
        the next batch — digests get duplicated in state, which the
        anti-join semantics tolerate (the digest SET is unchanged).
        """
        flat = self._legacy_flat_files()
        if not flat:
            return
        legacy = self.spark.read.parquet(*flat)
        if "state_bucket" in legacy.columns:
            legacy = legacy.drop("state_bucket")
        legacy.withColumn("state_bucket", self._bucket_col()).write.mode(
            "append"
        ).partitionBy("state_bucket").parquet(self.sig_dir)
        for p in flat:
            os.remove(p)

    # -- batch kernel (also used by foreachBatch) ------------------------------
    def process_batch(self, pages: DataFrame, batch_id: int) -> None:
        from pyspark.storagelevel import StorageLevel

        self._migrate_legacy_state()
        ext = pages.select(
            F.xxhash64("url").alias("doc_id"),
            normalize_text_col(extract_text_col(F.col("html"))).alias("text_norm"),
        )
        # persisted: the touched-buckets collect + the two writes below would
        # otherwise each recompute the full signature kernel pass
        sg = (
            sigs.compute_signatures(ext, self.cfg)
            .withColumn("state_bucket", self._bucket_col())
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            has_state = os.path.isdir(self.sig_dir) and any(
                d.startswith("state_bucket=") for d in os.listdir(self.sig_dir)
            )
            if has_state:
                # tiny driver list (≤ n_state_buckets ints) -> partition
                # pruning: only the state partitions this batch can collide
                # with are read
                touched = [
                    r[0] for r in sg.select("state_bucket").distinct().collect()
                ]
                known = (
                    self.spark.read.parquet(self.sig_dir)
                    .filter(F.col("state_bucket").isin(touched))
                    .select("digest")
                )
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
            fresh_unique.write.mode("append").partitionBy("state_bucket").parquet(
                self.sig_dir
            )
            fresh_unique.select("doc_id", "digest").withColumn(
                "batch_id", F.lit(batch_id)
            ).write.mode("append").parquet(self.new_dir)
        finally:
            sg.unpersist()

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


def watermark_dedup_stream(pages_stream: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Spark-native bounded-state streaming exact-dedup.

    ``dropDuplicatesWithinWatermark`` on the content digest: the state store
    holds only digests younger than the watermark — state is bounded by the
    event-time window instead of growing with the corpus, the right contract
    when upstream guarantees duplicates arrive within ``delay`` of each other
    (e.g. re-crawls inside one WARC dump). Complements ``IncrementalDedup``,
    which keeps the full digest history (bucket-pruned) for unbounded lookback.
    """
    ext = pages_stream.select(
        F.xxhash64("url").alias("doc_id"),
        F.col("warc_ts"),
        F.xxhash64(
            normalize_text_col(extract_text_col(F.col("html")))
        ).alias("digest"),
    )
    return ext.withWatermark("warc_ts", delay).dropDuplicatesWithinWatermark(["digest"])
