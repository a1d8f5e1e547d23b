"""Nested author schema (ArrayType(StructType)): P3 exists-filter, J1
explode-join, A3 author-row dedup, F15 org normalization, W4 seq ordering —
over the synthetic companion author table."""

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

from infoscience_imports_spark.operators.authors import (
    build_author_array,
    dedup_author_rows,
    explode_authors,
    filter_exists_author,
    normalize_orgs,
)
from infoscience_imports_spark.sources.synthetic import generate_author_table

EPFL_RE = r"(?i)\(EPFL\)"


def test_author_table_is_nested(spark):
    at = generate_author_table(spark, 100, seed=42)
    f = at.schema["authors"].dataType
    assert isinstance(f, ArrayType) and isinstance(f.elementType, StructType)
    names = [x.name for x in f.elementType.fields]
    assert names == ["seq_no", "author", "orcid_id", "organizations", "is_corresponding"]


def test_exists_filter_matches_exploded_ground_truth(spark):
    at = generate_author_table(spark, 300, seed=42).cache()
    kept = filter_exists_author(
        at, lambda a: a["organizations"].rlike(EPFL_RE)
    )
    # ground truth via the explode path: urls with any matching author
    ex = explode_authors(at, id_col="url")
    truth = (
        ex.filter(F.col("organizations").rlike(EPFL_RE))
        .select("url")
        .distinct()
    )
    got = set(r["url"] for r in kept.select("url").collect())
    want = set(r["url"] for r in truth.collect())
    assert got == want
    assert 0 < len(got) < 300  # predicate is selective, not degenerate


def test_explode_join_roundtrip(spark):
    """J1: explode to an author frame, equi-join back to metadata on url."""
    at = generate_author_table(spark, 200, seed=42)
    ex = explode_authors(at, id_col="url")
    meta = at.select("url", F.size("authors").alias("n_authors"))
    joined = ex.join(meta, on="url")
    per_url = joined.groupBy("url", "n_authors").agg(F.count(F.lit(1)).alias("n_rows"))
    bad = per_url.filter(F.col("n_rows") != F.col("n_authors")).count()
    assert bad == 0


def test_dedup_author_rows(spark):
    at = generate_author_table(spark, 200, seed=42)
    ex = explode_authors(at, id_col="url")
    doubled = ex.unionByName(ex)
    deduped = dedup_author_rows(doubled, ("url", "author", "orcid_id"))
    assert deduped.count() == ex.dropDuplicates(["url", "author", "orcid_id"]).count()


def test_seq_ordering_roundtrip(spark):
    """W4: rebuilding the nested array from exploded rows restores seq order."""
    at = generate_author_table(spark, 100, seed=42).cache()
    ex = explode_authors(at, id_col="url")
    rebuilt = build_author_array(
        ex.withColumnRenamed("seq_no", "sq"),
        group_col="url",
        struct_cols=("author",),
        order_col="sq",
    )
    check = at.select(
        "url", F.transform("authors", lambda a: a["author"]).alias("names")
    ).join(
        rebuilt.select(
            "url", F.transform("authors", lambda a: a["author"]).alias("names2")
        ),
        on="url",
    )
    assert check.filter(F.col("names") != F.col("names2")).count() == 0


def test_normalize_orgs(spark):
    df = spark.createDataFrame(
        [("b | a|a ||c",), ("solo",), ("",)], "orgs string"
    )
    got = [r["o"] for r in df.select(normalize_orgs(F.col("orgs")).alias("o")).collect()]
    assert got == ["a|b|c", "solo", ""]
