"""Resumability + lineage tests (SURVEY.md §5 pyramid level 4)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from infoscience_imports_spark.config import DedupConfig
from infoscience_imports_spark.plans.pipeline import DedupPipeline, STAGES
from infoscience_imports_spark.sources.catalog import CheckpointStore
from infoscience_imports_spark.sources.synthetic import pipeline_input


def test_resume_skips_committed_stages(spark, tiny_pages):
    wh = tempfile.mkdtemp(prefix="wh-ck1-")
    store = CheckpointStore(spark, wh)
    pipe = DedupPipeline(spark, store, DedupConfig(), input_fingerprint="ck200")
    pages = pipeline_input(tiny_pages)
    r1 = pipe.run(pages)
    assert all(r1.timings[s] > 0 for s in STAGES)
    r2 = pipe.run(pages)
    assert all(r2.timings[s] == 0.0 for s in STAGES)
    shutil.rmtree(wh)


def test_resume_after_stage_loss_is_byte_identical(spark, tiny_pages):
    wh = tempfile.mkdtemp(prefix="wh-ck2-")
    store = CheckpointStore(spark, wh)
    pipe = DedupPipeline(spark, store, DedupConfig(), input_fingerprint="ck200")
    pages = pipeline_input(tiny_pages)
    pipe.run(pages)
    before = sorted((r["doc_id"], r["cluster_id"]) for r in pipe.clusters().collect())
    # simulate a crash that lost the two downstream stages
    shutil.rmtree(os.path.join(wh, "edges"))
    shutil.rmtree(os.path.join(wh, "components"))
    r = pipe.run(pages)
    assert r.timings["extract"] == 0.0 and r.timings["edges"] > 0
    after = sorted((r2["doc_id"], r2["cluster_id"]) for r2 in pipe.clusters().collect())
    assert before == after
    shutil.rmtree(wh)


def test_manifest_lineage_covers_all_stages(spark, tiny_pages):
    wh = tempfile.mkdtemp(prefix="wh-ck3-")
    store = CheckpointStore(spark, wh)
    pipe = DedupPipeline(spark, store, DedupConfig(), input_fingerprint="ck200")
    pipe.run(pipeline_input(tiny_pages))
    m = store.manifest()
    stages = {r["stage"] for r in m.select("stage").distinct().collect()}
    assert stages == set(STAGES)
    cols = set(m.columns)
    assert {"file", "rows", "checksum", "min_key", "max_key", "run_id", "stage"} <= cols
    # row counts in the manifest must equal actual stage row counts
    for st in STAGES:
        manifest_rows = (
            m.filter(F.col("stage") == st).agg(F.sum("rows")).collect()[0][0]
        )
        actual = store.read(st, pipe.fingerprint(st)).count()
        assert manifest_rows == actual, st
    shutil.rmtree(wh)


def test_config_change_invalidates_fingerprints(spark):
    wh = tempfile.mkdtemp(prefix="wh-ck4-")
    store = CheckpointStore(spark, wh)
    p1 = DedupPipeline(spark, store, DedupConfig(), input_fingerprint="x")
    p2 = DedupPipeline(spark, store, DedupConfig(jaccard_threshold=0.9), input_fingerprint="x")
    assert p1.fingerprint("edges") != p2.fingerprint("edges")
    # but input identity is part of the chain too
    p3 = DedupPipeline(spark, store, DedupConfig(), input_fingerprint="y")
    assert p1.fingerprint("extract") != p3.fingerprint("extract")
    shutil.rmtree(wh)
