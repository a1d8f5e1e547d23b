"""Driver-contract tests: entry() smoke + Spark-vs-DuckDB parity subset.

Full parity (every oracle at sf0.001 and sf0.01) runs via
``python scripts/check_parity.py``; here a representative subset keeps the
suite fast while still catching contract regressions.
"""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from scripts.check_parity import TABLES, value_hash

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "text_lang_id",
    "text_quality",
    "ann_cosine_topk",
    "q1_pricing_summary",
    "events_sessionize",
    "orders_running_window",
    "nation_rollup",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"cluster_id", "n_docs", "members"}
    for r in rows:
        assert r["n_docs"] > 1 and len(r["members"]) == r["n_docs"]


def test_every_query_has_callable_and_most_have_oracles():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)
    # the vast majority must be SQL-checkable (weaker rows-only is exceptional)
    assert len(oracles) >= len(qs) - 4


@pytest.mark.parametrize("name", SUBSET)
def test_parity_subset(spark, duck, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = fn(spark, SF_DIR)
    rows = [tuple(r) for r in sdf.collect()]
    odf = duck.sql(sql)
    orows = [tuple(r) for r in odf.fetchall()]
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(rows) == len(orows)
    assert value_hash(rows, sdf.columns) == value_hash(orows, odf.columns)
