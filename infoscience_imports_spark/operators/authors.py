"""Nested author-schema operators: ArrayType(StructType) end-to-end.

The reference's richest data-model feature is the per-record author list —
``authors: list[dict]`` with per-author structs (``clients/wos_client_v2.py:
1164-1176``, ``clients/openalex_client.py:668-676``). Three consumption
patterns generalize here over a native ``ArrayType(StructType)`` column:

  P3  — EPFL-affiliation regex over nested authors: a record is kept iff ANY
        author's organizations string matches a regex/ROR id
        (``data_pipeline/harvester.py:490-509``) -> ``F.exists`` over the
        array, no explode, no shuffle;
  J1  — metadata<->authors linkage: the reference splits records into a
        metadata frame and an exploded author frame joined on row_id
        (``data_pipeline/deduplicator.py:192-264``) -> ``posexplode`` +
        equi-join;
  A3  — author-row dedup by a subset of struct fields
        (``deduplicator.py:236-250``) -> ``dropDuplicates(subset)`` on the
        exploded rows.

Everything is Column-expression / built-in operators — the reference's
per-row Python loop over ``record['authors']`` never appears.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_author_array(
    df: DataFrame,
    group_col: str,
    struct_cols: tuple[str, ...],
    order_col: str,
) -> DataFrame:
    """Rows -> one row per group with a seq-ordered ``authors`` struct array.

    The inverse of the explode path: ``sort_array(collect_list(struct))``
    reproduces the reference's seq_no author ordering (W4,
    ``wos_client_v2.py:1185``) — the order key leads the struct so the array
    sort is the seq sort.
    """
    s = F.struct(F.col(order_col).alias("seq_no"), *[F.col(c) for c in struct_cols])
    return df.groupBy(group_col).agg(
        F.sort_array(F.collect_list(s)).alias("authors")
    )


def filter_exists_author(
    nested: DataFrame, predicate, authors_col: str = "authors"
) -> DataFrame:
    """P3: keep rows where ANY author satisfies ``predicate(author_struct)``.

    ``predicate`` maps a struct Column to a boolean Column, e.g.
    ``lambda a: a["organizations"].rlike(r"(?i)\\bEPFL\\b|02s376052")``.
    Evaluates inside the row (no explode, no shuffle) — the Spark form of the
    reference's per-row any() loop (``harvester.py:490-509``).
    """
    return nested.filter(F.exists(F.col(authors_col), predicate))


def explode_authors(
    nested: DataFrame, id_col: str, authors_col: str = "authors"
) -> DataFrame:
    """J1 split: one row per (record, author) with the struct fields lifted."""
    ex = nested.select(
        F.col(id_col), F.posexplode(F.col(authors_col)).alias("_pos", "_a")
    )
    return ex.select(id_col, "_pos", "_a.*")


def dedup_author_rows(
    exploded: DataFrame, subset: tuple[str, ...]
) -> DataFrame:
    """A3: drop duplicate author rows by a subset of struct fields
    (``deduplicator.py:236-250``)."""
    return exploded.dropDuplicates(list(subset))


def normalize_orgs(col: Column) -> Column:
    """F15: '|'-joined org list -> split, trim, dedup, sort, rejoin
    (``deduplicator.py:224-231``)."""
    return F.array_join(
        F.array_sort(
            F.array_distinct(
                F.filter(
                    F.transform(F.split(col, r"\|"), lambda x: F.trim(x)),
                    lambda x: x != "",
                )
            )
        ),
        "|",
    )
