"""F27 ISSN/ISBN kernels + S12 report sink + F19/F20 JSON-variant query."""

import json
import os

import pytest
from pyspark.sql import functions as F

from infoscience_imports_spark.functions.scalars import normalize_isbn, normalize_issn
from infoscience_imports_spark.sources.reporting import write_report


def test_normalize_issn(spark):
    vals = ["0028-0836", "00280836", " 2049-3630 ", "205979x", "0028083", "garbage", None]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r["o"] for r in df.select(normalize_issn(F.col("s")).alias("o")).collect()]
    assert got == ["0028-0836", "0028-0836", "2049-3630", None, None, None, None]
    # 7 digits + X check digit re-hyphenates with uppercase X
    df2 = spark.createDataFrame([("2049363x",)], "s string")
    assert df2.select(normalize_issn(F.col("s")).alias("o")).collect()[0]["o"] == "2049-363X"


def test_normalize_isbn(spark):
    vals = ["978-0-306-40615-7", "0-306-40615-2", "030640615x", "12345", None]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r["o"] for r in df.select(normalize_isbn(F.col("s")).alias("o")).collect()]
    assert got == ["9780306406157", "0306406152", "030640615X", None, None]


def test_write_report(spark, tmp_path):
    sheets = {
        "by_lang": spark.createDataFrame([("en", 3), ("fr", 1)], "lang string, n int"),
        "totals": spark.createDataFrame([(4,)], "n int"),
    }
    out = str(tmp_path / "report")
    written = write_report(sheets, out)
    assert written == {"by_lang": 2, "totals": 1}
    with open(os.path.join(out, "index.json")) as f:
        assert json.load(f)["sheets"]["by_lang"] == 2
    assert sorted(os.listdir(out)) == ["by_lang.csv", "index.json", "totals.csv"]


def test_write_report_rejects_tables(spark, tmp_path):
    big = spark.range(50)
    with pytest.raises(ValueError, match="aggregates"):
        write_report({"raw": big}, str(tmp_path / "r2"), max_rows=10)


def test_events_json_variants_parity(spark):
    import duckdb

    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    sdf = entry_mod.queries()["events_json_variants"](spark, sf)
    rows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orows = sorted(tuple(r) for r in con.sql(entry_mod.oracle_sql()["events_json_variants"]).fetchall())
    assert rows == orows
