"""Reference-semantics parity tests for the group-merge operator.

Fixtures per FIXTURES.md §2, asserting the behaviors of
``data_pipeline/deduplicator.py:55-144``: priority winner, per-column
coalescing, authors-from-winner, empty-key bypass, two-pass cascade order.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from infoscience_imports_spark.operators.merge import (
    cascade_dedup,
    cluster_representatives,
    group_merge,
    source_rank_col,
)


def _pubs(spark):
    rows = [
        # group A by doi: scopus wins over wos; scopus lacks pubyear -> filled from wos
        Row(source="wos", internal_id="WOS:1", title="T One", doi="10.1/a",
            pubyear=2021, authors=["w-auth"], extra="wos-extra"),
        Row(source="scopus", internal_id="SCOPUS:9", title="Title One!", doi="10.1/a",
            pubyear=None, authors=["s-auth"], extra=None),
        # empty-doi rows bypass pass 1 untouched, then merge on title+year in pass 2
        Row(source="crossref", internal_id="CR:7", title="same fuzzy", doi=None,
            pubyear=2020, authors=["c-auth"], extra=None),
        Row(source="openalex", internal_id="OA:3", title="same fuzzy", doi="",
            pubyear=2020, authors=["o-auth"], extra="oa-extra"),
        # singleton
        Row(source="zenodo", internal_id="Z:2", title="solo", doi="10.9/z",
            pubyear=2019, authors=["z-auth"], extra=None),
    ]
    df = spark.createDataFrame(rows)
    return (
        df.withColumn("_rank", source_rank_col())
        .withColumn("doi_id", F.lower(F.trim(F.coalesce("doi", F.lit("")))))
        .withColumn(
            "title_pubyear_id",
            F.concat_ws(
                "::",
                F.lower(F.regexp_replace("title", r"[^0-9A-Za-z]+", " ")),
                F.coalesce(F.col("pubyear").cast("string"), F.lit("")),
            ),
        )
    )


def test_priority_winner_and_coalesce(spark):
    df = _pubs(spark)
    out = group_merge(df, "doi_id").filter(F.col("doi_id") == "10.1/a").collect()
    assert len(out) == 1
    row = out[0]
    assert row["source"] == "scopus"            # priority winner
    assert row["title"] == "Title One!"         # winner's value kept
    assert row["pubyear"] == 2021               # coalesced from wos
    assert row["extra"] == "wos-extra"          # coalesced from wos
    assert row["authors"] == ["s-auth"]         # authors ALWAYS from winner


def test_empty_key_bypass(spark):
    df = _pubs(spark)
    out = group_merge(df, "doi_id")
    # the two empty-doi rows must both survive pass 1
    assert out.filter((F.col("doi_id").isNull()) | (F.trim("doi_id") == "")).count() == 2


def test_cascade_merges_fuzzy_after_exact(spark):
    df = _pubs(spark)
    out = cascade_dedup(df, exact_key="doi_id", fuzzy_key="title_pubyear_id")
    assert out.count() == 3  # A-merged, fuzzy-merged, solo
    fuzzy = out.filter(F.col("title_pubyear_id") == "same fuzzy::2020").collect()
    assert len(fuzzy) == 1
    assert fuzzy[0]["source"] == "crossref"     # crossref > openalex in priority
    assert fuzzy[0]["extra"] == "oa-extra"      # coalesced from the loser
    assert fuzzy[0]["authors"] == ["c-auth"]


def test_merge_deterministic_under_partitioning(spark):
    df = _pubs(spark)
    a = sorted(map(str, cascade_dedup(df.repartition(1), "doi_id", "title_pubyear_id").collect()))
    b = sorted(map(str, cascade_dedup(df.repartition(13), "doi_id", "title_pubyear_id").collect()))
    assert a == b


def test_cluster_representatives_argmax(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, cluster_id=1, warc_ts="2026-01-03"),
            Row(doc_id=2, cluster_id=1, warc_ts="2026-01-05"),
            Row(doc_id=3, cluster_id=1, warc_ts="2026-01-05"),
            Row(doc_id=9, cluster_id=9, warc_ts="2026-01-01"),
        ]
    )
    reps = cluster_representatives(
        df, [F.col("warc_ts").desc(), F.col("doc_id").asc()]
    )
    got = {r["cluster_id"]: r["doc_id"] for r in reps.collect()}
    assert got == {1: 2, 9: 9}  # latest ts wins, tie-break min doc_id
