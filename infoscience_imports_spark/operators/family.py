"""Family aggregation — parity with the reference's EPO patent family merge.

Reproduces ``clients/epo_ops_client.py:775-897`` (A10/G5 in SURVEY.md §2):
group records by ``family_id``; the most recent member's scalar metadata
wins; multi-valued fields are union-deduped and sorted across the family.

The reference encodes multi-value fields as ``"||"``-joined strings with
``"::"``-separated struct fields (``epo_ops_client.py:820-826``); here they
are native arrays end-to-end, with ``split``/``concat_ws`` only at I/O edges
(SURVEY.md §1.3 mapping).

Also hosts the in-record hash-join pattern of the reference's WoS
author<->address linkage (``clients/wos_client_v2.py:1111-1157``, J8):
explode the address list, join on ``addr_no``, regroup ordered by seq_no.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_families(
    df: DataFrame,
    family_col: str = "family_id",
    recency_col: str = "first_creation",
    scalar_cols: tuple[str, ...] = (),
    multi_cols: tuple[str, ...] = (),
    id_col: str = "internal_id",
) -> DataFrame:
    """One row per family: latest member's scalars + union-deduped arrays.

    Deterministic: recency ties break on ``id_col`` descending (the
    reference sorts by date only, ``epo_ops_client.py:896-897`` — we add the
    total order, SURVEY.md §7.4).
    """
    winner_struct = F.struct(
        F.col(recency_col).alias("_r"),
        F.col(id_col).alias("_i"),
        *[F.col(c).alias(c) for c in scalar_cols],
    )
    aggs = [F.max(winner_struct).alias("_winner")]
    for c in multi_cols:
        aggs.append(F.array_sort(F.array_distinct(F.flatten(F.collect_list(c)))).alias(c))
    aggs.append(F.array_sort(F.collect_set(id_col)).alias("members_internal_ids"))
    aggs.append(F.count(F.lit(1)).alias("family_size"))

    out = df.groupBy(family_col).agg(*aggs)
    for c in scalar_cols:
        out = out.withColumn(c, F.col(f"_winner.{c}"))
    out = out.withColumn(recency_col, F.col("_winner._r")).drop("_winner")
    return out


def link_authors_addresses(
    authors: DataFrame,
    addresses: DataFrame,
    doc_col: str = "doc_id",
    addr_list_col: str = "addr_nos",
) -> DataFrame:
    """J8 parity: explode each author's address-number list, equi-join the
    address table on (doc, addr_no), regroup ordered by seq_no."""
    exploded = authors.select(
        doc_col,
        "seq_no",
        "author",
        F.explode_outer(addr_list_col).alias("addr_no"),
    )
    joined = exploded.join(addresses, on=[doc_col, "addr_no"], how="left")
    return (
        joined.groupBy(doc_col, "seq_no", "author")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("addr_no", "organization"))
            ).alias("addresses")
        )
        .withColumn(
            "organizations",
            F.array_join(
                F.array_distinct(
                    F.transform(F.col("addresses"), lambda a: a["organization"])
                ),
                "|",
            ),
        )
    )
