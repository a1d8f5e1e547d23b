"""Exact-substring containment pass (stage 4b).

Reference parity: the ``HasVersion`` containment removal
(``data_pipeline/harvester.py:683-689``) drops records whose version list
intersects surviving IDs — i.e., records *contained by* another record's
lineage. The web-scale analogue links page B to page A when B's normalized
text is an exact substring of A's (quotes, scrapes, partial mirrors), which
MinHash structurally misses when |A| >> |B| (Jaccard ~ |B|/|A|).

Distributed plan (no O(n^2), no stored shingle sets):
  1. candidate generation — bottom-k sketch: the k smallest shingle hashes of
     each doc (stored in the signature table, 8 longs/doc) are a uniform
     sample of its shingle set; if S_B ⊆ S_A then all of B's bottom-k hashes
     appear somewhere in S_A. The A-side postings are *recomputed* from
     ``text_norm`` in an Arrow kernel (CPU scales with cores; re-reading a
     stored posting table does not) and filtered map-side against the
     broadcast bottom-k hash set before they ever hit a shuffle;
  2. verify — one Arrow kernel per candidate pair over the two normalized
     texts: shingle-containment score |S_B ∩ S_A| / |S_B| plus the exact
     Python substring check. This is the "suffix-array pass" semantics —
     exact substring — at candidate-pair cardinality, where a direct check
     beats maintaining a distributed suffix array.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..config import DedupConfig, DEFAULT_CONFIG
from ..functions.shingles import shingle_hashes, token_hashes

_POSTINGS_SCHEMA = StructType(
    [
        StructField("big_id", LongType(), False),
        StructField("big_n", LongType(), False),
        StructField("sh", LongType(), False),
    ]
)


def _shingle_postings(texts: DataFrame, cfg: DedupConfig, needed_bc) -> DataFrame:
    """(doc_id, text_norm) -> exploded (big_id, big_n, sh) posting rows.

    ``needed_bc`` is a SparkContext broadcast of a sorted uint64 array of
    bottom-k hash values; postings are filtered inside the kernel, so
    irrelevant shingles are never emitted, let alone shuffled.
    """
    k = cfg.shingle_k

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        needed = needed_bc.value
        for pdf in batches:
            memo: dict[str, int] = {}
            ids, ns, hs = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text_norm"]):
                sh = shingle_hashes(
                    token_hashes(text.split() if isinstance(text, str) else [], memo), k
                )
                if needed.size == 0 or sh.size == 0:
                    continue
                # sorted-array membership: searchsorted beats np.isin's
                # internal sort when `needed` is reused across rows
                pos = np.searchsorted(needed, sh)
                pos[pos == needed.size] = 0
                keep = sh[needed[pos] == sh]
                for h in keep.tolist():
                    ids.append(int(doc_id))
                    ns.append(int(sh.size))
                    hs.append(int(np.int64(np.uint64(h))))
            yield pd.DataFrame(
                {
                    "big_id": np.array(ids, dtype=np.int64),
                    "big_n": np.array(ns, dtype=np.int64),
                    "sh": np.array(hs, dtype=np.int64),
                }
            )

    return texts.select("doc_id", "text_norm").mapInPandas(kernel, schema=_POSTINGS_SCHEMA)


def containment_candidates(
    signatures: DataFrame,
    texts: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """(small_id, big_id) candidate pairs where small may be ⊂ big.

    ``signatures`` must carry (doc_id, bottomk, n_shingles); ``texts`` must
    carry (doc_id, text_norm) for the posting recompute.
    """
    k = cfg.bottomk
    bk = signatures.select(
        F.col("doc_id").alias("small_id"),
        F.col("n_shingles").alias("small_n"),
        F.explode("bottomk").alias("sh"),
    )
    # ship the distinct bottom-k hash set into the posting kernel as a
    # broadcast sorted uint64 array (8 bytes/doc-sketch-entry; ~80 MB per
    # 10^7 docs per partition-batch of the corpus — at larger scale,
    # partition the small side and run this pass per partition)
    needed_vals = [r["sh"] for r in bk.select("sh").distinct().collect()]
    needed_arr = np.array(sorted(needed_vals), dtype=np.int64).astype(np.uint64)
    needed_bc = texts.sparkSession.sparkContext.broadcast(needed_arr)
    postings = _shingle_postings(texts, cfg, needed_bc)

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


_VERIFY_SCHEMA = StructType(
    [
        StructField("id1", LongType(), False),
        StructField("id2", LongType(), False),
        StructField("jaccard", DoubleType(), True),
    ]
)


def containment_edges(
    candidates: DataFrame,
    texts: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Verified containment edges (id1, id2, score=containment, rule).

    One Arrow kernel computes the shingle-containment screen AND the exact
    substring check per candidate pair — no stored arrays, two text joins.
    """
    t = texts.select("doc_id", "text_norm")
    with_texts = (
        candidates.select("small_id", "big_id")
        .hint("broadcast")
        .join(t.select(F.col("doc_id").alias("small_id"), F.col("text_norm").alias("_ts")), on="small_id")
        .join(t.select(F.col("doc_id").alias("big_id"), F.col("text_norm").alias("_tb")), on="big_id")
    )
    k = cfg.shingle_k
    thr = cfg.containment_threshold

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            memo: dict[str, int] = {}
            out_i1, out_i2, out_c = [], [], []
            for sid, bid, ts, tb in zip(pdf["small_id"], pdf["big_id"], pdf["_ts"], pdf["_tb"]):
                if not isinstance(ts, str) or not isinstance(tb, str):
                    continue
                ss = shingle_hashes(token_hashes(ts.split(), memo), k)
                if ss.size == 0:
                    continue
                sb = shingle_hashes(token_hashes(tb.split(), memo), k)
                inter = np.intersect1d(ss, sb, assume_unique=True).size
                containment = inter / ss.size
                if containment >= thr and ts in tb:
                    out_i1.append(min(int(sid), int(bid)))
                    out_i2.append(max(int(sid), int(bid)))
                    out_c.append(float(containment))
            yield pd.DataFrame({"id1": out_i1, "id2": out_i2, "jaccard": out_c})

    return (
        with_texts.mapInPandas(kernel, schema=_VERIFY_SCHEMA)
        .withColumn("rule", F.lit("contain"))
        .distinct()
    )
