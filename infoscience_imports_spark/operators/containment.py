"""Exact-substring containment pass (stage 4b).

Reference parity: the ``HasVersion`` containment removal
(``data_pipeline/harvester.py:683-689``) drops records whose version list
intersects surviving IDs — i.e., records *contained by* another record's
lineage. The web-scale analogue links page B to page A when B's normalized
text is an exact substring of A's (quotes, scrapes, partial mirrors), which
MinHash structurally misses when |A| >> |B| (Jaccard ~ |B|/|A|).

Distributed plan (no O(n^2)):
  1. candidate generation — bottom-k sketch: the k smallest shingle hashes of
     each doc are a uniform sample of its shingle set; if S_B ⊆ S_A then all
     of B's bottom-k hashes appear somewhere in S_A. Build postings of B-side
     bottom-k hashes, semi-join the A-side full shingle postings down to just
     those hash values (Catalyst pushes this into the explode's child scan),
     and count matches per (small, big) pair;
  2. shingle-containment screen — |S_B ∩ S_A| / |S_B| >= threshold,
     JVM-side via array_intersect;
  3. exact verify — Python substring check (Arrow-batched over the surviving
     candidate pairs only) against the normalized texts. This is the
     "suffix-array pass" semantics: exact substring, not similarity; at
     candidate-pair cardinality the direct check is cheaper than maintaining
     a distributed suffix array.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..config import DedupConfig, DEFAULT_CONFIG


def containment_candidates(
    signatures: DataFrame, cfg: DedupConfig = DEFAULT_CONFIG
) -> DataFrame:
    """(small_id, big_id) candidate pairs where small may be ⊂ big."""
    k = cfg.bottomk
    # bottom-k = first k values of the sorted unique shingle array
    bk = signatures.select(
        F.col("doc_id").alias("small_id"),
        F.col("n_shingles").alias("small_n"),
        F.explode(F.slice(F.array_sort("shingles"), 1, k)).alias("sh"),
    )
    postings = signatures.select(
        F.col("doc_id").alias("big_id"),
        F.col("n_shingles").alias("big_n"),
        F.explode("shingles").alias("sh"),
    )
    # keep only postings for hash values that are someone's bottom-k;
    # the distinct bottom-k set is ~k rows/doc of one long — broadcast it so
    # the full postings explode is filtered map-side with no shuffle
    needed = bk.select("sh").distinct()
    postings = postings.join(F.broadcast(needed), on="sh", how="left_semi")

    matched = (
        bk.join(postings, on="sh")
        .filter(F.col("small_id") != F.col("big_id"))
        # strict containment direction: small into strictly larger set
        .filter(F.col("big_n") > F.col("small_n"))
        .groupBy("small_id", "big_id")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= F.least(F.lit(cfg.bottomk_min_match), F.lit(k)))
        .select("small_id", "big_id")
    )
    return matched


def containment_edges(
    candidates: DataFrame,
    signatures: DataFrame,
    texts: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Verified containment edges (id1, id2, jaccard=containment, rule).

    ``texts`` must carry (doc_id, text_norm). Screen with shingle containment
    (JVM), then exact substring check in an Arrow kernel.
    """
    sig = signatures.select("doc_id", "shingles", "n_shingles")
    screened = (
        candidates.join(
            sig.select(
                F.col("doc_id").alias("small_id"),
                F.col("shingles").alias("sh_s"),
                F.col("n_shingles").alias("n_s"),
            ),
            on="small_id",
        )
        .join(
            sig.select(
                F.col("doc_id").alias("big_id"),
                F.col("shingles").alias("sh_b"),
            ),
            on="big_id",
        )
        .withColumn(
            "containment",
            F.when(
                F.col("n_s") > 0,
                F.size(F.array_intersect("sh_s", "sh_b")) / F.col("n_s"),
            ).otherwise(F.lit(0.0)),
        )
        .filter(F.col("containment") >= cfg.containment_threshold)
        .select("small_id", "big_id", "containment")
    )

    t = texts.select("doc_id", "text_norm")
    with_texts = screened.join(
        t.select(F.col("doc_id").alias("small_id"), F.col("text_norm").alias("txt_s")),
        on="small_id",
    ).join(
        t.select(F.col("doc_id").alias("big_id"), F.col("text_norm").alias("txt_b")),
        on="big_id",
    )

    out_schema = StructType(
        [
            StructField("small_id", LongType(), False),
            StructField("big_id", LongType(), False),
            StructField("containment", DoubleType(), True),
            StructField("is_substring", BooleanType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sub = [
                (s in b) if isinstance(s, str) and isinstance(b, str) else False
                for s, b in zip(pdf["txt_s"], pdf["txt_b"])
            ]
            yield pd.DataFrame(
                {
                    "small_id": pdf["small_id"],
                    "big_id": pdf["big_id"],
                    "containment": pdf["containment"],
                    "is_substring": sub,
                }
            )

    verified = with_texts.mapInPandas(kernel, schema=out_schema)
    return (
        verified.filter(F.col("is_substring"))
        .select(
            F.least("small_id", "big_id").alias("id1"),
            F.greatest("small_id", "big_id").alias("id2"),
            F.col("containment").alias("jaccard"),
            F.lit("contain").alias("rule"),
        )
        .distinct()
    )
