"""Benchmark decontamination: n-gram collision between a corpus and a probe set.

The standard training-data hygiene pass (GPT-3 appendix C / PaLM §C use
13-gram collision; the n is a parameter here): a corpus document is
contaminated by a benchmark ("probe") document when they share enough
word n-grams. This generalizes the reference's fuzzy-match family — the
same shingle machinery its record dedup uses (``deduplicator.py``'s
title/abstract similarity cascade), pointed at a held-out probe set
instead of at the corpus itself.

Scale shape (the asymmetry IS the design): benchmark sets are tiny
(thousands of docs, ~1e6 n-grams) next to a web corpus (1e12 docs).
The probe posting table (n-gram hash -> probe_id) is therefore
measured-gated and BROADCAST: the corpus side explodes its shingle
postings map-side and hash-joins against the broadcast — the corpus is
never shuffled; the only exchange carries the HITS (doc, probe, gram)
rows, orders of magnitude below corpus postings. Past the gate (a probe
set that is itself corpus-sized) the join degrades to an explicit
shuffle_hash, never a size-estimate flip to a corpus-side broadcast.

Thresholding is exact integer arithmetic (``hits * den >= probe_n *
num``), not a float fraction — the same boundary discipline as the
prefix-filter epsilon in the AllPairs query (a 0.5 threshold must not
hinge on double rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, DedupConfig


def contamination_report(
    corpus_shingles: DataFrame,
    probe_shingles: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    min_frac: tuple[int, int] = (1, 2),
) -> DataFrame:
    """Corpus docs sharing >= num/den of a probe doc's n-grams with it.

    Inputs are shingle-set frames — ``corpus_shingles(doc_id, shs, n)`` and
    ``probe_shingles(probe_id, shs, n)`` with ``shs`` an array of DISTINCT
    n-gram hashes (the :mod:`..functions.shingles` kernels' output shape) —
    so one n-gram contributes exactly one hit however often it repeats in
    either text. Returns ``(doc_id, probe_id, hits, probe_n, frac)`` where
    ``hits`` counts shared distinct n-grams, ``probe_n`` is the probe's
    n-gram count, and ``frac = hits / probe_n`` (rounded, reporting only —
    the filter runs on integers). ``min_frac`` is a rational (num, den):
    keep pairs with ``hits * den >= probe_n * num``.
    """
    num, den = min_frac
    if num < 0 or den <= 0:
        raise ValueError(f"min_frac must be (num >= 0, den > 0), got {min_frac}")
    probe_post = probe_shingles.select(
        "probe_id",
        F.col("n").cast("long").alias("probe_n"),
        F.explode("shs").alias("g"),
    )
    # measured broadcast gate (same budget class as the pair-gate): probe
    # postings usually number ~1e6 — broadcast keeps the corpus unshuffled.
    # The count is cheap by the operator's own premise (probes are small);
    # when the premise fails, the same measurement routes to shuffle_hash.
    from .verify import gate_broadcast_info

    probe_post, gated = gate_broadcast_info(probe_post, cfg.broadcast_pair_limit)
    if not gated:
        probe_post = probe_post.hint("shuffle_hash")
    corpus_post = corpus_shingles.select("doc_id", F.explode("shs").alias("g"))
    hits = (
        corpus_post.join(probe_post, on="g")
        .groupBy("doc_id", "probe_id", "probe_n")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        hits.filter(F.col("hits") * F.lit(den) >= F.col("probe_n") * F.lit(num))
        .select(
            "doc_id",
            "probe_id",
            "hits",
            "probe_n",
            F.round(F.col("hits") / F.col("probe_n"), 6).alias("frac"),
        )
    )


def contaminated_doc_ids(
    corpus_shingles: DataFrame,
    probe_shingles: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    min_frac: tuple[int, int] = (1, 2),
) -> DataFrame:
    """Distinct corpus doc_ids hit by ANY probe — the removal list a
    training-data pipeline anti-joins against its corpus."""
    return (
        contamination_report(corpus_shingles, probe_shingles, cfg, min_frac)
        .select("doc_id")
        .distinct()
    )


def shingle_frame(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, shs, n) — distinct word n-gram hashes per doc, built with
    the frozen Arrow shingle kernels (:mod:`..functions.shingles`), the
    same normalize/tokenize/hash chain the dedup signature stage uses, so
    a corpus deduped by this engine and a probe set shingled here agree
    byte-for-byte on what an n-gram is. Docs with < n normalized tokens
    emit no row (no n-grams exist — mirrors the dedup contract)."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from ..functions.shingles import shingle_hashes, token_hashes
    from ..functions.text import normalize_text_py

    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("shs", ArrayType(LongType(), False), False),
            StructField("n", IntegerType(), False),
        ]
    )
    src = docs.select(F.col(id_col).cast("long"), F.col(text_col).alias("text"))

    def kernel(batches):
        import numpy as np
        import pandas as pd

        memo: dict[str, int] = {}
        for pdf in batches:
            ids, arrs, ns = [], [], []
            for did, text in zip(pdf[id_col], pdf["text"]):
                toks = normalize_text_py(text if isinstance(text, str) else "").split()
                if len(toks) < n:
                    continue
                sh = shingle_hashes(token_hashes(toks, memo), n)
                ids.append(int(did))
                arrs.append(sh.astype(np.int64))
                ns.append(int(sh.size))
            yield pd.DataFrame({id_col: ids, "shs": arrs, "n": ns})

    return src.mapInPandas(kernel, schema=schema)
