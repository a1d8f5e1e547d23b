"""Checkpoint store: atomic snapshot commits + per-partition lineage/metrics.

Generalizes the reference's per-stage CSV artifacts + DuckDB run bookkeeping
(``data_pipeline/main.py:148-161``, ``db/pipeline_db.py:140-149, 441-460``)
into a table-format contract:

  {warehouse}/{stage}/snap-{fingerprint}/data/*.parquet   -- stage output
  {warehouse}/{stage}/snap-{fingerprint}/manifest.parquet -- per-file lineage
  {warehouse}/{stage}/_LATEST                             -- committed pointer

Commits are atomic: data lands in a temp dir, the pointer file is written
last via rename — a crashed run leaves no half-visible snapshot, so any stage
is resumable (north_rule). ``fingerprint`` chains the upstream fingerprint +
stage config, so resume only reuses a snapshot whose entire ancestry matches.

This container has no Iceberg runtime jars; on a cluster with Iceberg the
same contract maps 1:1 onto ``writeTo(...).createOrReplace()`` snapshots +
a manifest table — the store keeps that swap behind one class.

Lineage rows (one per data file): rows, xxhash64-sum checksum, min/max of the
stage key — generalizing ``source_stats`` (``pipeline_db.py:145-149``).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def chain_fingerprint(*parts: str) -> str:
    import hashlib

    h = hashlib.blake2b(digest_size=12)
    for p in parts:
        h.update(p.encode("utf-8"))
        h.update(b"\x00")
    return h.hexdigest()


@dataclass
class SnapshotInfo:
    stage: str
    fingerprint: str
    path: str
    rows: int


class CheckpointStore:
    def __init__(self, spark: SparkSession, warehouse: str, run_id: str | None = None):
        self.spark = spark
        self.warehouse = warehouse
        self.run_id = run_id or uuid.uuid4().hex[:12]
        os.makedirs(warehouse, exist_ok=True)

    # -- paths ---------------------------------------------------------------
    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.warehouse, stage)

    def _snap_dir(self, stage: str, fingerprint: str) -> str:
        return os.path.join(self._stage_dir(stage), f"snap-{fingerprint}")

    def _latest_file(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), "_LATEST")

    # -- commit / read -------------------------------------------------------
    def has_snapshot(self, stage: str, fingerprint: str) -> bool:
        snap = self._snap_dir(stage, fingerprint)
        latest = self._latest_file(stage)
        if not (os.path.isdir(os.path.join(snap, "data")) and os.path.isfile(latest)):
            return False
        with open(latest) as f:
            return f.read().strip() == fingerprint

    def write(
        self,
        stage: str,
        df: DataFrame,
        fingerprint: str,
        key_col: str | None = None,
    ) -> SnapshotInfo:
        """Write df as a new snapshot; returns after the atomic commit."""
        snap = self._snap_dir(stage, fingerprint)
        tmp = snap + f".tmp-{uuid.uuid4().hex[:8]}"
        data_dir = os.path.join(tmp, "data")
        df.write.mode("overwrite").parquet(data_dir)

        # per-file lineage from the committed bytes (not the logical plan).
        # The checksum hashes the key column (order-insensitive sum) — full
        # row hashing would re-read every wide column a second time per stage.
        written = self.spark.read.parquet(data_dir)
        key = F.col(key_col) if key_col and key_col in written.columns else F.lit(None)
        # input_file_name sees the pre-rename tmp dir — record the final path
        manifest = (
            written.select(
                F.regexp_replace(
                    F.input_file_name(), r"\.tmp-[0-9a-f]+/", "/"
                ).alias("file"),
                key.alias("_k"),
            )
            .groupBy("file")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.coalesce(
                    F.sum(F.pmod(F.xxhash64("_k"), F.lit(1 << 31))), F.lit(0)
                ).alias("checksum"),
                F.min("_k").cast("string").alias("min_key"),
                F.max("_k").cast("string").alias("max_key"),
            )
            .withColumn("run_id", F.lit(self.run_id))
            .withColumn("stage", F.lit(stage))
            .withColumn("fingerprint", F.lit(fingerprint))
            .withColumn("committed_at", F.current_timestamp())
        )
        manifest.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, "manifest.parquet")
        )
        total = sum(
            r["rows"]
            for r in self.spark.read.parquet(os.path.join(tmp, "manifest.parquet"))
            .select("rows")
            .collect()
        )
        with open(os.path.join(tmp, "_meta.json"), "w") as f:
            json.dump(
                {"stage": stage, "fingerprint": fingerprint, "rows": total, "run_id": self.run_id},
                f,
            )

        if os.path.isdir(snap):
            shutil.rmtree(snap)
        os.rename(tmp, snap)
        # pointer write is the commit point
        ptr_tmp = self._latest_file(stage) + ".tmp"
        with open(ptr_tmp, "w") as f:
            f.write(fingerprint)
        os.replace(ptr_tmp, self._latest_file(stage))
        return SnapshotInfo(stage, fingerprint, snap, total)

    def read(self, stage: str, fingerprint: str | None = None) -> DataFrame:
        fp = fingerprint or self.latest_fingerprint(stage)
        if fp is None:
            raise FileNotFoundError(f"no committed snapshot for stage {stage!r}")
        return self.spark.read.parquet(os.path.join(self._snap_dir(stage, fp), "data"))

    def latest_fingerprint(self, stage: str) -> str | None:
        latest = self._latest_file(stage)
        if not os.path.isfile(latest):
            return None
        with open(latest) as f:
            return f.read().strip()

    def manifest(self, stage: str | None = None) -> DataFrame:
        """All lineage rows across committed snapshots (optionally one stage)."""
        stages = [stage] if stage else [
            d for d in os.listdir(self.warehouse)
            if os.path.isdir(self._stage_dir(d))
        ]
        paths = []
        for st in stages:
            fp = self.latest_fingerprint(st)
            if fp:
                paths.append(os.path.join(self._snap_dir(st, fp), "manifest.parquet"))
        if not paths:
            raise FileNotFoundError("no committed snapshots")
        return self.spark.read.parquet(*paths)
