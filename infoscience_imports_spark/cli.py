"""spark-submit entry point: checkpointed stage driver with resume.

Usage (north_rule launch mode)::

    spark-submit --py-files infoscience_imports_spark.zip \
        -m infoscience_imports_spark.cli run \
        --input /path/to/web_pages_parquet \
        --warehouse /path/to/warehouse \
        --stage all|extract|signatures|buckets|edges|components \
        [--resume] [--cores N] [--shuffle-partitions P]

    python -m infoscience_imports_spark.cli synth --pages 100000 --out DIR
    python -m infoscience_imports_spark.cli manifest --warehouse DIR
    python -m infoscience_imports_spark.cli stream --input DIR --state DIR \
        [--compact-every N] [--deep-compact-every M]
    python -m infoscience_imports_spark.cli compact --state DIR [--deep] [--full-deep]
    python -m infoscience_imports_spark.cli decontaminate --corpus DIR \
        --probes DIR --out DIR [--ngram 13] [--min-frac 1/2]

Replaces the reference's CLI (``data_pipeline/main.py:521-829``): the
``--stage`` flag generalizes its step flags, ``--resume`` generalizes its
stateless re-run + dedup-against-sink recovery story (``README.md:463-471``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from . import caching
from .config import DedupConfig
from .plans.pipeline import STAGES, DedupPipeline
from .session import get_spark
from .sources.catalog import CheckpointStore, chain_fingerprint


def _cfg_from_args(args: argparse.Namespace, spark) -> DedupConfig:
    """DedupConfig from --config-json overrides + the session's parallelism.

    ``--config-json`` takes a JSON object of DedupConfig field overrides
    (unknown keys fail loudly — the dataclass rejects them). The SAME
    overrides must be passed to every command that touches one state/
    warehouse: fingerprints chain the config on the batch side, and on the
    streaming side ``compact --deep`` re-VERIFIES with these thresholds and
    persists the resulting edges permanently.
    """
    overrides = json.loads(args.config_json) if getattr(args, "config_json", None) else {}
    overrides.setdefault(
        "shuffle_partitions",
        args.shuffle_partitions or int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
    return DedupConfig(**overrides)


def cmd_run(args: argparse.Namespace) -> int:
    spark = get_spark(
        app_name="webdedup",
        master=f"local[{args.cores}]" if args.cores else None,
        shuffle_partitions=args.shuffle_partitions,
    )
    cfg = _cfg_from_args(args, spark)
    if args.input_format == "warc":
        from .sources.warc import read_warc, warc_pipeline_input

        pages = warc_pipeline_input(
            read_warc(spark, args.input, strict=not args.warc_tolerant)
        )
    else:
        pages = spark.read.parquet(args.input)
    store = CheckpointStore(spark, args.warehouse, run_id=args.run_id)
    pipe = DedupPipeline(
        spark, store, cfg, input_fingerprint=chain_fingerprint("input", args.input)
    )
    stages = STAGES if args.stage == "all" else tuple(
        s for s in STAGES if STAGES.index(s) <= STAGES.index(args.stage)
    )
    try:
        res = pipe.run(pages, stages=stages, resume=args.resume)
    finally:
        # drain operator-internal tracked persists (round-5 ADVICE): the
        # CLI process may be long-lived under a scheduler wrapper
        caching.release_all()
    print(
        json.dumps(
            {
                "run_id": res.run_id,
                "timings_sec": {k: round(v, 2) for k, v in res.timings.items()},
                "rows": res.rows,
                "fingerprints": res.fingerprints,
            }
        )
    )
    return 0


def cmd_synth(args: argparse.Namespace) -> int:
    from .sources.synthetic import generate_web_pages, pipeline_input

    spark = get_spark(app_name="webdedup-synth")
    df = generate_web_pages(spark, args.pages, seed=args.seed)
    if not args.keep_truth:
        df = pipeline_input(df)
    df.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"pages": args.pages, "out": args.out}))
    return 0


def cmd_decontaminate(args: argparse.Namespace) -> int:
    """Benchmark decontamination over two parquet dirs (operators/
    decontaminate.py): flag corpus docs sharing >= --min-frac of a probe
    doc's distinct word n-grams. Inputs may be (doc_id, text) doc tables or
    raw (url, html) page tables — pages get the pipeline's frozen extract
    kernel and xxhash64(url) ids, so the removal list anti-joins directly
    against a corpus this engine deduped."""
    from pyspark.sql import functions as F

    from .functions.text import extract_text_col
    from .operators.decontaminate import contamination_report, shingle_frame

    spark = get_spark(
        app_name="webdedup-decontaminate",
        master=f"local[{args.cores}]" if args.cores else None,
        shuffle_partitions=args.shuffle_partitions,
    )
    cfg = _cfg_from_args(args, spark)
    num, den = (int(x) for x in args.min_frac.split("/"))

    def docs_frame(path: str) -> "object":
        df = spark.read.parquet(path)
        if "text" in df.columns and "doc_id" in df.columns:
            return df.select("doc_id", "text")
        if "html" in df.columns and "url" in df.columns:
            return df.select(
                F.xxhash64("url").alias("doc_id"),
                extract_text_col(F.col("html")).alias("text"),
            )
        raise SystemExit(
            f"{path}: need (doc_id, text) or (url, html) columns, got {df.columns}"
        )

    corpus = shingle_frame(docs_frame(args.corpus), n=args.ngram)
    probes = shingle_frame(docs_frame(args.probes), n=args.ngram).withColumnRenamed(
        "doc_id", "probe_id"
    )
    rep = contamination_report(corpus, probes, cfg, (num, den))
    rep.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    stats = out.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.countDistinct("doc_id").alias("contaminated_docs"),
        F.countDistinct("probe_id").alias("probes_hit"),
    ).collect()[0]
    print(
        json.dumps(
            {
                "pairs": stats["pairs"],
                "contaminated_docs": stats["contaminated_docs"],
                "probes_hit": stats["probes_hit"],
                "min_frac": f"{num}/{den}",
                "ngram": args.ngram,
                "out": args.out,
            }
        )
    )
    caching.release_all()
    return 0


def cmd_manifest(args: argparse.Namespace) -> int:
    spark = get_spark(app_name="webdedup-manifest")
    store = CheckpointStore(spark, args.warehouse)
    store.manifest(args.stage).orderBy("stage", "file").show(100, truncate=False)
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    """Retro-merge a streaming near-dedup state dir (quiesce the stream
    first — the cluster-state swap races concurrent micro-batches).

    Shallow: CC over the stored verified-edge history (merges bridged
    clusters, O(stored edges)). ``--deep``: additionally re-runs all three
    fuzzy rule families over the text-self-contained doc state — the
    reference's stateless-re-run semantics (``README.md:463-471``) as a
    scheduled job instead of a full re-harvest.

    ``--deep`` VERIFIES with the thresholds in effect here and appends the
    resulting edges to permanent edge state: pass the stream's own config
    via ``--config-json`` (e.g. ``{"jaccard_threshold": 0.85}``) or the
    compaction would merge at thresholds the stream's policy rejects.
    """
    from .streaming.incremental import IncrementalNearDedup

    spark = get_spark(
        app_name="webdedup-compact",
        master=f"local[{args.cores}]" if args.cores else None,
        shuffle_partitions=args.shuffle_partitions,
    )
    cfg = _cfg_from_args(args, spark)
    # MUST match the stream's bucket count: the cluster-state rewrite
    # re-derives dpart with it, and later micro-batches partition-prune
    # their known-docs reads by the same function
    inc = IncrementalNearDedup(spark, args.state, cfg, n_state_buckets=args.state_buckets)
    print(
        json.dumps(
            inc.compact(
                deep=args.deep, full_deep=args.full_deep, full_cc=args.full_cc
            )
        )
    )
    return 0


def cmd_stream(args: argparse.Namespace) -> int:
    """Streaming near-dedup over a landing dir with the auto-compaction
    policy: ``--compact-every N`` ends every Nth micro-batch with a shallow
    retro-merge, ``--deep-compact-every M`` with a deep (watermark-scoped
    incremental) one — recall convergence no longer depends on an operator
    remembering to run ``compact`` (round-4 verdict #6). Runs with
    ``availableNow``: drains everything currently in the dir, then exits."""
    from .streaming.incremental import IncrementalNearDedup

    spark = get_spark(
        app_name="webdedup-stream",
        master=f"local[{args.cores}]" if args.cores else None,
        shuffle_partitions=args.shuffle_partitions,
    )
    cfg = _cfg_from_args(args, spark)
    inc = IncrementalNearDedup(
        spark,
        args.state,
        cfg,
        n_state_buckets=args.state_buckets,
        compact_every=args.compact_every,
        deep_compact_every=args.deep_compact_every,
    )
    try:
        if args.input_format == "warc":
            q = inc.start_warc(args.input, trigger_available_now=True)
        else:
            # file streams need an explicit schema: infer it once from the
            # files already present (the landing dir's format is fixed)
            schema = spark.read.parquet(args.input).schema
            q = inc.start(args.input, schema=schema)
        q.awaitTermination()
        out = {"docs": 0, "clusters": 0, "last_compact": inc.last_compact_metrics}
        if os.path.isdir(inc.cluster_dir):
            cl = inc.clusters()
            out["docs"] = cl.count()
            out["clusters"] = cl.select("cluster_id").distinct().count()
        print(json.dumps(out))
    finally:
        caching.release_all()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="infoscience_imports_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="run the dedup pipeline")
    p_run.add_argument("--input", required=True,
                       help="parquet dir, or a WARC glob with --input-format warc")
    p_run.add_argument("--input-format", default="parquet", choices=("parquet", "warc"))
    p_run.add_argument(
        "--warc-tolerant",
        action="store_true",
        help="dead-letter corrupt WARC members instead of failing the job "
        "(real-crawl inputs; see sources/warc.py read_warc_paths)",
    )
    p_run.add_argument("--warehouse", required=True)
    p_run.add_argument("--stage", default="all", choices=("all",) + STAGES)
    p_run.add_argument("--resume", action="store_true")
    p_run.add_argument("--run-id", default=None)
    p_run.add_argument("--cores", type=int, default=None)
    p_run.add_argument("--shuffle-partitions", type=int, default=None)
    p_run.add_argument("--config-json", default=None,
                       help="JSON object of DedupConfig field overrides")
    p_run.set_defaults(fn=cmd_run)

    p_syn = sub.add_parser("synth", help="generate the synthetic corpus")
    p_syn.add_argument("--pages", type=int, default=20000)
    p_syn.add_argument("--seed", type=int, default=42)
    p_syn.add_argument("--out", required=True)
    p_syn.add_argument("--keep-truth", action="store_true")
    p_syn.set_defaults(fn=cmd_synth)

    p_man = sub.add_parser("manifest", help="show stage lineage")
    p_man.add_argument("--warehouse", required=True)
    p_man.add_argument("--stage", default=None)
    p_man.set_defaults(fn=cmd_manifest)

    p_cmp = sub.add_parser(
        "compact", help="retro-merge streaming near-dedup state (quiesced)"
    )
    p_cmp.add_argument("--state", required=True, help="IncrementalNearDedup state dir")
    p_cmp.add_argument(
        "--deep",
        action="store_true",
        help="re-run all three fuzzy rule families over doc state "
        "(full stateless-re-run semantics, edges-stage cost)",
    )
    p_cmp.add_argument(
        "--full-deep",
        action="store_true",
        help="force a FULL deep pass (ignore the batch_id watermark)",
    )
    p_cmp.add_argument(
        "--full-cc",
        action="store_true",
        help="force a FULL connected-components rebuild over the whole edge "
        "history (ignore the edge-epoch watermark; base-case / audit path)",
    )
    p_cmp.add_argument(
        "--state-buckets",
        type=int,
        default=64,
        help="the stream's n_state_buckets (dpart layout must match)",
    )
    p_cmp.add_argument("--cores", type=int, default=None)
    p_cmp.add_argument("--shuffle-partitions", type=int, default=None)
    p_cmp.add_argument("--config-json", default=None,
                       help="JSON DedupConfig overrides — MUST match the stream's config")
    p_cmp.set_defaults(fn=cmd_compact)

    p_str = sub.add_parser(
        "stream", help="streaming near-dedup with auto-compaction cadence"
    )
    p_str.add_argument("--input", required=True,
                       help="parquet landing dir, or a WARC dir with --input-format warc")
    p_str.add_argument("--input-format", default="parquet", choices=("parquet", "warc"))
    p_str.add_argument("--state", required=True, help="IncrementalNearDedup state dir")
    p_str.add_argument("--state-buckets", type=int, default=64)
    p_str.add_argument("--compact-every", type=int, default=None,
                       help="shallow retro-merge every N micro-batches")
    p_str.add_argument("--deep-compact-every", type=int, default=None,
                       help="incremental deep retro-merge every M micro-batches")
    p_str.add_argument("--cores", type=int, default=None)
    p_str.add_argument("--shuffle-partitions", type=int, default=None)
    p_str.add_argument("--config-json", default=None,
                       help="JSON object of DedupConfig field overrides")
    p_str.set_defaults(fn=cmd_stream)

    p_dec = sub.add_parser(
        "decontaminate", help="flag corpus docs sharing n-grams with a probe set"
    )
    p_dec.add_argument("--corpus", required=True,
                       help="parquet dir: (doc_id, text) or (url, html)")
    p_dec.add_argument("--probes", required=True,
                       help="parquet dir of benchmark docs, same schemas accepted")
    p_dec.add_argument("--out", required=True, help="report parquet output dir")
    p_dec.add_argument("--ngram", type=int, default=13,
                       help="n-gram width (13 = GPT-3-style collision rule)")
    p_dec.add_argument("--min-frac", default="1/2",
                       help="rational threshold num/den on shared/probe n-grams")
    p_dec.add_argument("--cores", type=int, default=None)
    p_dec.add_argument("--shuffle-partitions", type=int, default=None)
    p_dec.add_argument("--config-json", default=None,
                       help="JSON object of DedupConfig field overrides")
    p_dec.set_defaults(fn=cmd_decontaminate)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
