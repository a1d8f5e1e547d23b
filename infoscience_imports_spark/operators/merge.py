"""Group-merge (coalescing aggregation) — the reference's core dedup operator.

Reproduces ``data_pipeline/deduplicator.py:55-144`` semantics Spark-first:

  * rows are ranked inside each key group by source priority (the reference
    uses an ordered pandas Categorical sort + ``iloc[0]``,
    ``deduplicator.py:73-87``; here: a rank column + window functions);
  * the highest-priority row "wins"; every other column is coalesced from
    the first non-null/non-empty value in priority order
    (``merge_complementary_info``, ``deduplicator.py:84-106``);
  * ``authors``-style designated columns are always taken from the winner,
    never coalesced (``deduplicator.py:97-101``);
  * rows whose key is null/empty bypass grouping unchanged
    (``deduplicator.py:108-115``);
  * the two-pass cascade runs the merge on the exact key first, then on the
    fuzzy surrogate key over the survivors (``deduplicator.py:117-139``).

Implementation is pure window/agg (whole-stage codegen): one shuffle per
pass, partial aggregation map-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import SOURCE_PRIORITY


def source_rank_col(source_col: str = "source", priority: tuple[str, ...] = SOURCE_PRIORITY):
    """Integer rank expression for the source-priority ordering (lower wins)."""
    mapping = F.create_map(
        *[x for i, s in enumerate(priority) for x in (F.lit(s), F.lit(i))]
    )
    return F.coalesce(mapping[F.col(source_col)], F.lit(len(priority)))


def group_merge(
    df: DataFrame,
    key_col: str,
    rank_col: str = "_rank",
    winner_cols: tuple[str, ...] = ("authors",),
    tiebreak_cols: tuple[str, ...] = ("internal_id",),
) -> DataFrame:
    """Merge each key group to one row with coalescing semantics.

    ``rank_col`` must already exist (see :func:`source_rank_col`); ties are
    broken by ``tiebreak_cols`` so the merge is deterministic under any
    partitioning.
    """
    key = F.col(key_col)
    empty_key = key.isNull() | (F.trim(key.cast("string")) == "")
    keyed = df.filter(~empty_key)
    bypass = df.filter(empty_key)

    order = [F.col(rank_col).asc()] + [F.col(c).asc_nulls_last() for c in tiebreak_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    data_cols = [c for c in df.columns if c != key_col]
    merged = keyed.withColumn("_rn", F.row_number().over(w))
    for c in data_cols:
        if c == rank_col:
            continue
        if c in winner_cols:
            merged = merged.withColumn(c, F.first(c, ignorenulls=False).over(w_full))
        else:
            # first non-null, non-empty-string value in priority order
            candidate = F.when(
                F.col(c).isNotNull()
                & (F.trim(F.col(c).cast("string")) != ""),
                F.col(c),
            )
            merged = merged.withColumn(c, F.first(candidate, ignorenulls=True).over(w_full))
    merged = merged.filter(F.col("_rn") == 1).drop("_rn")
    return merged.unionByName(bypass.select(merged.columns))


def cascade_dedup(
    df: DataFrame,
    exact_key: str = "doi_id",
    fuzzy_key: str = "title_pubyear_id",
    rank_col: str = "_rank",
    winner_cols: tuple[str, ...] = ("authors",),
) -> DataFrame:
    """Two-pass cascade: exact-key merge, then fuzzy-key merge on survivors.

    Order matters and is preserved from the reference
    (``deduplicator.py:117-139``).
    """
    pass1 = group_merge(df, exact_key, rank_col=rank_col, winner_cols=winner_cols)
    pass2 = group_merge(pass1, fuzzy_key, rank_col=rank_col, winner_cols=winner_cols)
    return pass2


def cluster_representatives(
    docs_with_clusters: DataFrame,
    order_cols: list,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Pick one deterministic representative row per cluster.

    Generalizes the reference's per-component argmax(registered, suffix)
    (``harvester.py:740-757``): callers pass the ordering, e.g.
    ``[F.col("warc_ts").desc(), F.col("doc_id").asc()]``.
    """
    w = Window.partitionBy(cluster_col).orderBy(*order_cols)
    return (
        docs_with_clusters.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
