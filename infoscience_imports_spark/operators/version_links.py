"""Version-link clustering — parity with the reference's DataCite dedup.

Reproduces ``data_pipeline/harvester.py:642-757`` as declarative Spark:

  G1 containment removal: drop any row whose ``HasVersion`` list intersects
     surviving ids (``harvester.py:683-689``) -> explode + left_anti;
  G2 keep-max-version: per ``IsVersionOf`` parent keep the child with the
     max numeric suffix (``harvester.py:691-708``) -> window argmax;
  G3 connected components over the HasVersion+IsVersionOf link graph
     restricted to present ids, then per-component representative =
     argmax(registered, then numeric suffix) (``harvester.py:710-757``)
     -> operators/components.py + window row_number.

Link columns arrive in the reference's "||"-joined string encoding with
optional ``https://doi.org/`` prefixes (``harvester.py:675-677``); decoding
is a pure column expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DedupConfig, DEFAULT_CONFIG
from .components import connected_components


def parse_link_col(col) -> "F.Column":
    """'a||https://doi.org/b||c' -> array('a','b','c'), empty-safe."""
    arr = F.split(F.coalesce(col, F.lit("")), r"\|\|")
    arr = F.transform(arr, lambda x: F.lower(F.regexp_replace(F.trim(x), r"^https?://(dx\.)?doi\.org/", "")))
    return F.filter(arr, lambda x: x != "")


def numeric_suffix(col) -> "F.Column":
    """Trailing digits of an id as int, 0 if none (``harvester.py:679-681``)."""
    return F.coalesce(
        F.nullif(F.regexp_extract(col, r"(\d+)$", 1), F.lit("")).cast("int"),
        F.lit(0),
    )


def version_link_edges(df: DataFrame, id_col: str = "internal_id") -> DataFrame:
    """Undirected edges between present ids linked by HasVersion/IsVersionOf."""
    ids = df.select(F.lower(F.trim(F.col(id_col))).alias("nid")).distinct()
    links = df.select(
        F.lower(F.trim(F.col(id_col))).alias("src"),
        F.explode(
            F.concat(
                parse_link_col(F.col("HasVersion")),
                parse_link_col(F.col("IsVersionOf")),
            )
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    # restrict to ids present in the batch (harvester.py:715-723)
    links = links.join(ids.select(F.col("nid").alias("dst")), on="dst", how="left_semi")
    return links.select(
        F.least("src", "dst").alias("id1"), F.greatest("src", "dst").alias("id2")
    ).distinct()


def dedupe_versions(
    df: DataFrame,
    id_col: str = "internal_id",
    registered_col: str = "registered",
    cfg: DedupConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Keep one representative row per version component.

    Representative = max ``registered`` timestamp, tie-break max numeric
    suffix, final tie-break min id (determinism guard the reference lacks).
    """
    base = df.withColumn("_nid", F.lower(F.trim(F.col(id_col))))

    # string-id components reuse the long-typed engine via a dense hash; the
    # risk-free route at parity scale is a direct string edge list, so the
    # components operator accepts any orderable id type — here we map through
    # xxhash64 and keep a lookup to translate back.
    edges = version_link_edges(df, id_col=id_col)
    hashed_edges = edges.select(
        F.xxhash64("id1").alias("id1"), F.xxhash64("id2").alias("id2")
    )
    assign = connected_components(hashed_edges, cfg)

    keyed = base.withColumn("_hid", F.xxhash64("_nid")).join(
        assign.withColumnRenamed("doc_id", "_hid"), on="_hid", how="left"
    )
    keyed = keyed.withColumn("cluster_id", F.coalesce("cluster_id", F.col("_hid")))

    w = Window.partitionBy("cluster_id").orderBy(
        F.col(registered_col).desc_nulls_last(),
        numeric_suffix(F.col("_nid")).desc(),
        F.col("_nid").asc(),
    )
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_nid", "_hid", "cluster_id")
    )
