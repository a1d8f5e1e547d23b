"""Drill-down resource profile of the EDGES stage sub-operations.

The edges stage owns ~half the pipeline wall at 2M pages
(BENCH/BASELINE.md production-gate soak) but the stage-level fingerprint
(scripts/resource_profile.py) can't say which of its sub-plans —
minhash candidate self-join, simhash block-combination self-join,
containment bottom-k postings, the two verify text joins + Arrow kernel,
or the combine window — owns the cost. This script materializes each
sub-operation under its own job group and reports, per group:

  executor_cpu_sec   JVM task-thread CPU (contention-resistant)
  executor_run_sec   task wall (includes Python/Arrow worker time: the
                     PYTHON share of a mapInPandas op is ~run - cpu - io)
  shuffle bytes      plan-shape fingerprint (host-noise-immune)

Serializing the sub-operations changes concurrency vs the production
single-job union, so treat the numbers as ATTRIBUTION, not wall prediction.

Usage: python scripts/profile_edges.py [--pages 50000]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GROUPS = (
    "rep_texts",
    "cand_minhash",
    "cand_simhash",
    "cand_contain",
    "verify_fuzzy",
    "verify_simhash",
    "combine_exact",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=50000)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from infoscience_imports_spark.config import DedupConfig
    from infoscience_imports_spark.operators import containment as cont
    from infoscience_imports_spark.operators import lsh, verify
    from infoscience_imports_spark.plans.pipeline import DedupPipeline
    from infoscience_imports_spark.session import get_spark
    from infoscience_imports_spark.sources.catalog import CheckpointStore
    from infoscience_imports_spark.sources.synthetic import (
        generate_web_pages,
        pipeline_input,
    )

    evdir = tempfile.mkdtemp(prefix="evlog-")
    spark = get_spark(
        app_name="profile-edges",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    sc = spark.sparkContext
    cfg = DedupConfig()

    corpus = tempfile.mkdtemp(prefix="profile-corpus-")
    pipeline_input(generate_web_pages(spark, args.pages, seed=42)).write.mode(
        "overwrite"
    ).parquet(corpus)
    pages = spark.read.parquet(corpus)

    wh = tempfile.mkdtemp(prefix="profile-wh-")
    store = CheckpointStore(spark, wh)
    pipe = DedupPipeline(spark, store, cfg, input_fingerprint="profile")
    # materialize the upstream stages outside any group
    pipe.run(pages, stages=("extract", "signatures", "buckets"), resume=True)
    signatures = store.read("signatures", pipe.fingerprint("signatures"))
    buckets = store.read("buckets", pipe.fingerprint("buckets"))
    extract_df = store.read("extract", pipe.fingerprint("extract"))
    reps = signatures.filter(F.col("is_rep"))

    counts: dict[str, int] = {}

    sc.setJobGroup("rep_texts", "rep text semi-join + persist")
    rep_texts = (
        extract_df.join(reps.select("doc_id"), on="doc_id", how="left_semi")
        .select("doc_id", "text_norm")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts["rep_texts"] = rep_texts.count()

    sc.setJobGroup("cand_minhash", "minhash band self-join")
    mh = lsh.candidate_pairs(buckets, cfg).select(
        "id1", "id2", F.lit("minhash").alias("rule")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    counts["cand_minhash"] = mh.count()

    sc.setJobGroup("cand_simhash", "simhash block-combination self-join")
    sh = lsh.simhash_band_pairs(reps, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    counts["cand_simhash"] = sh.count()

    sc.setJobGroup("cand_contain", "bottom-k bloom postings join")
    co = cont.containment_candidates(
        reps, rep_texts, cfg, n_docs_hint=counts["rep_texts"]
    ).select(
        F.col("small_id").alias("id1"),
        F.col("big_id").alias("id2"),
        F.lit("contain").alias("rule"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    counts["cand_contain"] = co.count()

    sc.setJobGroup("verify_fuzzy", "text joins + Arrow jaccard/containment kernel")
    fz = mh.unionByName(co)
    small = (counts["cand_minhash"] + counts["cand_contain"]) <= cfg.broadcast_pair_limit
    if small:
        fz = fz.hint("broadcast")
    counts["verify_fuzzy"] = verify.verify_tagged_pairs(
        fz, rep_texts, cfg, pregated=True
    ).count()

    sc.setJobGroup("verify_simhash", "hamming filter joins")
    counts["verify_simhash"] = lsh.hamming_edges(
        sh.select("id1", "id2"),
        reps,
        cfg,
        gated=counts["cand_simhash"] <= cfg.broadcast_pair_limit,
    ).count()

    sc.setJobGroup("combine_exact", "exact star edges + precedence window")
    exact = verify.exact_edges(signatures)
    counts["combine_exact"] = exact.count()
    sc.setJobGroup("", "")

    app_id = sc.applicationId
    spark.stop()

    logs = sorted(
        glob.glob(os.path.join(evdir, f"eventlog_v2_{app_id}", "events_*"))
    ) or sorted(glob.glob(os.path.join(evdir, f"{app_id}*")))
    if not logs:
        raise SystemExit(f"no event log for {app_id} in {evdir}")

    stage_group: dict[int, str] = {}
    totals = {
        g: {
            "shuffle_write_mb": 0.0, "shuffle_read_mb": 0.0,
            "executor_cpu_sec": 0.0, "executor_run_sec": 0.0, "tasks": 0,
        }
        for g in GROUPS
    }
    for lg in logs:
        with open(lg) as f:
            for line in f:
                ev = json.loads(line)
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    group = (ev.get("Properties") or {}).get("spark.jobGroup.id", "")
                    if group in totals:
                        for sid in ev.get("Stage IDs", []):
                            stage_group[sid] = group
                elif kind == "SparkListenerTaskEnd":
                    group = stage_group.get(ev.get("Stage ID"))
                    if group is None:
                        continue
                    m = ev.get("Task Metrics") or {}
                    t = totals[group]
                    t["tasks"] += 1
                    t["shuffle_write_mb"] += (
                        (m.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0) / 1e6
                    )
                    srm = m.get("Shuffle Read Metrics") or {}
                    t["shuffle_read_mb"] += (
                        srm.get("Local Bytes Read", 0) + srm.get("Remote Bytes Read", 0)
                    ) / 1e6
                    t["executor_cpu_sec"] += m.get("Executor CPU Time", 0) / 1e9
                    t["executor_run_sec"] += m.get("Executor Run Time", 0) / 1e3

    print(json.dumps({
        "pages": args.pages,
        "counts": counts,
        "groups": {g: {k: round(v, 1) for k, v in t.items()} for g, t in totals.items()},
    }))

    import shutil

    for d in (evdir, corpus, wh):
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
