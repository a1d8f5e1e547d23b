"""Version-link clustering parity tests (FIXTURES.md §3).

Oracle: pure-Python union-find over the decoded link graph; representative =
max ``registered``, tie-break max numeric suffix (``harvester.py:740-757``).
"""

from pyspark.sql import Row

from infoscience_imports_spark.operators.version_links import (
    dedupe_versions,
    version_link_edges,
)


def _links(spark):
    rows = [
        # component 1: v1 <-> v2 <-> v3 chain via HasVersion / IsVersionOf
        Row(internal_id="10.5/x.v1", HasVersion="https://doi.org/10.5/x.v2",
            IsVersionOf=None, registered="2024-01-01", client="cern.zenodo"),
        Row(internal_id="10.5/x.v2", HasVersion="10.5/x.v3",
            IsVersionOf="10.5/x.v1", registered="2024-06-01", client="cern.zenodo"),
        Row(internal_id="10.5/x.v3", HasVersion=None,
            IsVersionOf="10.5/x.v2", registered="2024-06-01", client="cern.zenodo"),
        # link to an absent id must be ignored (restricted to present ids)
        Row(internal_id="10.5/y.v1", HasVersion="10.5/zz.v9||",
            IsVersionOf=None, registered="2023-01-01", client="other"),
        # isolated
        Row(internal_id="10.5/w.v7", HasVersion=None, IsVersionOf=None,
            registered="2022-05-05", client="other"),
    ]
    return spark.createDataFrame(rows)


def test_edges_decode_and_restrict(spark):
    df = _links(spark)
    edges = {(r["id1"], r["id2"]) for r in version_link_edges(df).collect()}
    assert edges == {("10.5/x.v1", "10.5/x.v2"), ("10.5/x.v2", "10.5/x.v3")}


def test_component_representative(spark):
    df = _links(spark)
    out = dedupe_versions(df)
    kept = sorted(r["internal_id"] for r in out.collect())
    # x-component: max registered is tie (v2, v3) -> max numeric suffix wins (v3)
    assert kept == ["10.5/w.v7", "10.5/x.v3", "10.5/y.v1"]
