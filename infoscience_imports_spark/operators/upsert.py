"""Upsert (merge-into) semantics over snapshot tables — parity with the
reference's DuckDB sink (``db/pipeline_db.py:464-539``, S10/A12):

  - match on a stable entity key (``pub_id`` = lower(trim(doi)) else
    source:internal_id — ``pipeline_db.py:232-243``);
  - WHEN MATCHED: bump ``seen_count``, refresh ``last_seen``, COALESCE each
    payload column (new value wins only when non-null);
  - WHEN NOT MATCHED: insert with ``seen_count = 1``.

Without an Iceberg catalog this composes the same result functionally
(union + window latest-wins + coalesce) and writes a fresh snapshot via
``CheckpointStore`` — on Iceberg the identical semantics map 1:1 onto
``MERGE INTO ... WHEN MATCHED THEN UPDATE``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stable_entity_key(
    doi_col: str = "doi", source_col: str = "source", id_col: str = "internal_id"
) -> Column:
    """pub_id rule of ``pipeline_db.py:232-243`` as one expression."""
    doi = F.lower(F.trim(F.col(doi_col)))
    doi = F.when(doi.isin("", "none", "nan"), F.lit(None)).otherwise(doi)
    return F.coalesce(doi, F.concat_ws(":", F.col(source_col), F.col(id_col)))


def upsert(
    existing: DataFrame | None,
    incoming: DataFrame,
    key_col: str,
    payload_cols: tuple[str, ...],
    now_col: Column | None = None,
) -> DataFrame:
    """Merge ``incoming`` into ``existing`` with counter/COALESCE semantics.

    Returns the merged table: one row per key, ``seen_count`` accumulated,
    ``first_seen``/``last_seen`` maintained, payload coalesced new-over-old.
    """
    now = now_col if now_col is not None else F.current_timestamp()
    inc = incoming.select(
        key_col,
        *payload_cols,
        F.lit(1).alias("seen_count"),
        now.alias("first_seen"),
        now.alias("last_seen"),
        F.lit(1).alias("_recency"),
    )
    if existing is None:
        base = inc.limit(0)
    else:
        base = existing.select(
            key_col, *payload_cols, "seen_count", "first_seen", "last_seen",
            F.lit(0).alias("_recency"),
        )
    unioned = base.unionByName(inc)

    payload_aggs = []
    for c in payload_cols:
        # new value wins when non-null, else keep old: max by (non-null, recency)
        ranked = F.struct(
            F.col(c).isNotNull().alias("_nn"),
            F.col("_recency").alias("_r"),
            F.col(c).alias("v"),
        )
        payload_aggs.append(F.max(ranked).getField("v").alias(c))

    return unioned.groupBy(key_col).agg(
        *payload_aggs,
        F.sum("seen_count").alias("seen_count"),
        F.min("first_seen").alias("first_seen"),
        F.max("last_seen").alias("last_seen"),
    )
