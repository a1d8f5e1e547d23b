"""Noise-free pipeline resource profile: bytes moved per stage.

Wall-clock on this shared host varies 2x+ under neighbor contention
(BENCH/BASELINE.md round-3 addendum), but the BYTES a plan scans, shuffles
and spills are a property of the plan alone. This script runs the dedup
pipeline one stage at a time under a job group, harvests task metrics from
the Spark event log, and prints per-stage totals — a fingerprint that
detects plan regressions (new shuffle, lost pruning, fatter exchange)
independent of host weather.

Primary signal: the SHUFFLE columns (+ task counts and executor CPU) —
shuffle metrics are recorded for every task. ``input_bytes`` is kept but
under-counts scans that feed Arrow kernels on the local filesystem
(observed: extract reported 0.4 MB against a 74 MB corpus, while the
edges stage's JVM-side join scans reported faithfully), so treat it as a
lower bound, not a fingerprint.

Usage: python scripts/resource_profile.py [--pages 20000]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=20000)
    args = ap.parse_args()

    from infoscience_imports_spark.config import DedupConfig
    from infoscience_imports_spark.plans.pipeline import STAGES, DedupPipeline
    from infoscience_imports_spark.session import get_spark
    from infoscience_imports_spark.sources.catalog import CheckpointStore
    from infoscience_imports_spark.sources.synthetic import (
        generate_web_pages,
        pipeline_input,
    )

    evdir = tempfile.mkdtemp(prefix="evlog-")
    spark = get_spark(
        app_name="resource-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            # keep every task's metrics (no rolling)
            "spark.eventLog.compress": "false",
        },
    )
    sc = spark.sparkContext

    corpus = tempfile.mkdtemp(prefix="profile-corpus-")
    pipeline_input(generate_web_pages(spark, args.pages, seed=42)).write.mode(
        "overwrite"
    ).parquet(corpus)
    pages = spark.read.parquet(corpus)

    wh = tempfile.mkdtemp(prefix="profile-wh-")
    pipe = DedupPipeline(
        spark, CheckpointStore(spark, wh), DedupConfig(), input_fingerprint="profile"
    )
    for stage in STAGES:
        sc.setJobGroup(stage, f"pipeline stage {stage}")
        pipe.run(pages, stages=(stage,), resume=True)
    sc.setJobGroup("", "")
    app_id = sc.applicationId
    spark.stop()  # flush the event log

    # Spark 4 rolling layout: eventlog_v2_<appId>/events_N_<appId>[...]
    logs = sorted(
        glob.glob(os.path.join(evdir, f"eventlog_v2_{app_id}", "events_*"))
    ) or sorted(glob.glob(os.path.join(evdir, f"{app_id}*")))
    if not logs:
        raise SystemExit(f"no event log for {app_id} in {evdir}")

    stage_group: dict[int, str] = {}
    totals: dict[str, dict[str, float]] = {
        s: {
            "input_bytes": 0, "shuffle_write_bytes": 0, "shuffle_read_bytes": 0,
            "spill_disk_bytes": 0, "executor_cpu_sec": 0.0, "tasks": 0,
        }
        for s in STAGES
    }
    def lines():
        for lg in logs:
            with open(lg) as f:
                yield from f

    for line in lines():
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
                t["input_bytes"] += (m.get("Input Metrics") or {}).get("Bytes Read", 0)
                t["shuffle_write_bytes"] += (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
                srm = m.get("Shuffle Read Metrics") or {}
                t["shuffle_read_bytes"] += srm.get("Local Bytes Read", 0) + srm.get(
                    "Remote Bytes Read", 0
                )
                t["spill_disk_bytes"] += m.get("Disk Bytes Spilled", 0)
                t["executor_cpu_sec"] += m.get("Executor CPU Time", 0) / 1e9

    out = {
        "pages": args.pages,
        "stages": {
            s: {k: (round(v, 1) if isinstance(v, float) else v) for k, v in t.items()}
            for s, t in totals.items()
        },
    }
    print(json.dumps(out))

    import shutil

    for d in (evdir, corpus, wh):
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
