"""Streaming near-dedup soak: planted corpus through sequential micro-batches.

The incremental LSH path (streaming/incremental.py IncrementalNearDedup) is
the newest surface; its unit tests use toy batches. This driver feeds a
planted synthetic corpus through N sequential micro-batches (hash-split so
every duplicate class straddles batches), then scores cluster assignments
against the planted truth:

  * recall over true dup pairs whose BOTH endpoints are admitted
    representatives (exact-dup followers collapse into digest state and are
    scored through their representative);
  * false-merge count (pairs co-clustered that are not true dups).

Expected semantics: the PER-BATCH recall can be < 1.0 only through the
documented no-retro-merge rule (a doc bridging two already-separate
clusters does not merge them), the bounded-degree bucket cap, and the
stream's minhash-only rule family (CONTAIN/TITLE_DUP-class dups split
across batches need the containment/simhash families); all are the price
of stable cluster ids + bounded per-batch work. The soak then runs the
retro-merge ``compact()`` pass (batch CC over accumulated edge state — the
cheap one) and scores, then ``compact(deep=True)`` (all three rule
families re-run over doc state) and scores again — post-deep recall must
be 1.0, the reference's rerun-merges-everything semantics. All three
numbers go into BENCH/BASELINE.md so the tradeoff is quantified, not
hand-waved.

``--periodic-deep`` (round-5): instead of one deep pass at the end, run
``compact(deep=True)`` after EVERY batch — the first is the full base-case
pass, the rest are watermark-scoped incremental passes. The report records
each pass's wall so the O(new docs) claim is measured, then forces a FULL
deep pass on the final state: it must find 0 extra merges (the incremental
cadence already converged) and its wall is the number the incremental
passes are a fraction of.

Usage: python scripts/soak_streaming.py [--pages 30000] [--batches 6]
       python scripts/soak_streaming.py --periodic-deep
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from infoscience_imports_spark.config import DedupConfig  # noqa: E402
from infoscience_imports_spark.session import get_spark  # noqa: E402
from infoscience_imports_spark.sources.synthetic import (  # noqa: E402
    generate_web_pages,
    pipeline_input,
    true_pairs,
)
from infoscience_imports_spark.streaming.incremental import IncrementalNearDedup  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=30_000)
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--periodic-deep", action="store_true")
    args = ap.parse_args()

    spark = get_spark(
        app_name="soak-streaming",
        master=f"local[{args.cores}]",
        shuffle_partitions=max(2 * args.cores, 8),
    )
    pages = generate_web_pages(spark, args.pages, seed=42).cache()
    pages.count()
    state = tempfile.mkdtemp(prefix="soak-stream-")
    inc = IncrementalNearDedup(
        spark, state, DedupConfig(shuffle_partitions=max(2 * args.cores, 8))
    )

    t0 = time.monotonic()
    deep_pass_walls: list[float] = []
    deep_pass_scopes: list[str] = []
    deep_pass_gen: list[float] = []
    deep_pass_scope_docs: list[int | None] = []
    deep_pass_cc: list[float | None] = []
    for b in range(args.batches):
        batch = pipeline_input(
            pages.filter(F.pmod(F.xxhash64("url"), F.lit(args.batches)) == b)
        )
        inc.process_batch(batch, b)
        if args.periodic_deep:
            tb = time.monotonic()
            # count_clusters=False: the cadence path's cost claim is
            # O(new docs + affected clusters) — don't pay a global
            # distinct-count per pass for a report nicety
            dm_b = inc.compact(deep=True, count_clusters=False)
            deep_pass_walls.append(round(time.monotonic() - tb, 1))
            deep_pass_scopes.append(dm_b["deep_scope"])
            deep_pass_gen.append(dm_b.get("deep_gen_s", 0.0))
            deep_pass_scope_docs.append(dm_b.get("scope_docs"))
            deep_pass_cc.append(dm_b.get("cc_rewrite_s"))
    wall = time.monotonic() - t0

    # every page maps through its content digest to its admitted
    # representative (first admitted doc per digest, by batch order)
    from infoscience_imports_spark.functions.text import extract_text_col, normalize_text_col

    ledger = spark.read.parquet(inc.new_dir)
    w_first = (
        ledger.groupBy("digest").agg(F.min_by("doc_id", "batch_id").alias("rep_id"))
    )
    doc_digest = pipeline_input(pages).select(
        F.xxhash64("url").alias("doc_id"),
        F.xxhash64(normalize_text_col(extract_text_col(F.col("html")))).alias("digest"),
    )
    doc_rep = doc_digest.join(w_first, on="digest").select("doc_id", "rep_id").cache()
    tp = true_pairs(pages).cache()

    def score(clusters):
        rep_cluster = clusters.withColumnRenamed("doc_id", "rep_id")
        doc_cluster = doc_rep.join(rep_cluster, on="rep_id").select("doc_id", "cluster_id")
        joined = (
            tp.join(
                doc_cluster.withColumnRenamed("doc_id", "id1").withColumnRenamed("cluster_id", "c1"),
                "id1",
            ).join(
                doc_cluster.withColumnRenamed("doc_id", "id2").withColumnRenamed("cluster_id", "c2"),
                "id2",
            )
        )
        n_true = joined.count()
        n_hit = joined.filter(F.col("c1") == F.col("c2")).count()
        # false merges: co-clustered admitted pairs that are not true dups
        a = doc_cluster.alias("a")
        b = doc_cluster.alias("b")
        co = (
            a.join(b, on=F.col("a.cluster_id") == F.col("b.cluster_id"))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        )
        false_merges = co.join(tp, on=["id1", "id2"], how="left_anti").count()
        return n_true, n_hit / max(1, n_true), false_merges

    n_true, recall, false_merges = score(inc.clusters())

    t1 = time.monotonic()
    cm = inc.compact()
    compact_wall = time.monotonic() - t1
    _, recall_post, false_post = score(inc.clusters())

    t2 = time.monotonic()
    # with --periodic-deep the final pass is FORCED FULL: its extra merges
    # must be 0 (incremental cadence already converged) and its wall is the
    # denominator for the per-pass incremental fractions
    dm = inc.compact(deep=True, full_deep=args.periodic_deep)
    deep_wall = time.monotonic() - t2
    _, recall_deep, false_deep = score(inc.clusters())

    report = {
        "pages": args.pages,
        "batches": args.batches,
        "wall_sec": round(wall, 1),
        "pages_per_sec": round(args.pages / wall, 1),
        "true_pairs": n_true,
        "recall": round(recall, 4),
        "false_merges": false_merges,
        "compact_wall_sec": round(compact_wall, 1),
        "compact_merged": cm["merged"],
        "compact_edges": cm["edges"],
        "recall_post_compact": round(recall_post, 4),
        "false_merges_post_compact": false_post,
        "deep_compact_wall_sec": round(deep_wall, 1),
        "deep_compact_merged": dm["merged"],
        "recall_post_deep": round(recall_deep, 4),
        "false_merges_post_deep": false_deep,
    }
    if args.periodic_deep:
        report["periodic_deep_walls_sec"] = deep_pass_walls
        report["periodic_deep_scopes"] = deep_pass_scopes
        report["periodic_deep_gen_sec"] = deep_pass_gen
        report["periodic_deep_scope_docs"] = deep_pass_scope_docs
        report["periodic_deep_cc_rewrite_sec"] = deep_pass_cc
        report["final_full_deep_gen_sec"] = dm.get("deep_gen_s")
        report["final_full_deep_extra_merged"] = dm["merged"]
    print("STREAMSOAK " + json.dumps(report), flush=True)

    md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "BASELINE.md"
    )
    with open(md, "a") as f:
        f.write(
            f"\n## Streaming near-dedup soak: {args.pages} pages in "
            f"{args.batches} micro-batches, local[{args.cores}]\n\n"
            f"- wall {report['wall_sec']} s ({report['pages_per_sec']} pages/sec "
            f"including per-batch state maintenance)\n"
            f"- dup-pair recall vs planted truth (both ends admitted, scored "
            f"through digest representatives): **{report['recall']}** over "
            f"{n_true} true pairs, false merges **{false_merges}** — per-batch "
            f"path only (stable ids, documented no-retro-merge rule)\n"
            f"- retro-merge compact(): {cm['merged']} cluster merges over "
            f"{cm['edges']} stored edges in {report['compact_wall_sec']} s -> "
            f"recall **{report['recall_post_compact']}**, false merges "
            f"**{false_post}** (bridges merged; O(stored edges))\n"
            f"- deep compact(deep=True): all three fuzzy rule families re-run "
            f"over doc state, {dm['merged']} further merges in "
            f"{report['deep_compact_wall_sec']} s -> recall "
            f"**{report['recall_post_deep']}**, false merges **{false_deep}** "
            f"(the reference's rerun-merges-everything semantics, in full)\n"
        )
        if args.periodic_deep:
            f.write(
                f"- periodic incremental deep passes (one per batch, scopes "
                f"{deep_pass_scopes}): walls {deep_pass_walls} s, of which "
                f"candidate-gen+verify (the watermark-scoped part) "
                f"{deep_pass_gen} s over scope sizes {deep_pass_scope_docs} "
                f"docs, CC+rewrite {deep_pass_cc} s (epoch-scoped since "
                f"round 5 — O(new edges + affected clusters), a converged "
                f"pass skips the rewrite entirely); the final FORCED-FULL "
                f"pass above took {report['deep_compact_wall_sec']} s (gen "
                f"{dm.get('deep_gen_s')} s) and found {dm['merged']} extra "
                f"merges — the incremental cadence had already converged\n"
            )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
