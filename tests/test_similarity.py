"""Embedding similarity: blocked all-pairs exactness, sign-LSH pair recall,
multi-probe ANN recall vs brute force (round-1 verdict #4/#5)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from infoscience_imports_spark.operators.similarity import (
    ann_signlsh_topk,
    cosine_topk,
    probe_masks,
    similar_pairs,
    similar_pairs_lsh,
)

DIM = 32
N_BASE = 150
N_DUP = 30


@pytest.fixture(scope="module")
def planted(spark):
    """Unit vectors with planted near-duplicates (cos ~ 0.95-0.99)."""
    rng = np.random.default_rng(123)
    base = rng.standard_normal((N_BASE, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # noise norm ~0.25 -> cos(base, dup) ~ 0.97
    dups = base[:N_DUP] + (0.25 / np.sqrt(DIM)) * rng.standard_normal((N_DUP, DIM))
    dups /= np.linalg.norm(dups, axis=1, keepdims=True)
    vecs = np.vstack([base, dups])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    sims = vecs @ vecs.T
    return df, sims


def _true_pairs(sims, threshold):
    n = sims.shape[0]
    return {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if sims[i, j] >= threshold
    }


def test_blocked_all_pairs_exact(spark, planted):
    df, sims = planted
    got = {
        (r["id1"], r["id2"]) for r in similar_pairs(df, threshold=0.9, n_blocks=5).collect()
    }
    assert got == _true_pairs(sims, 0.9)
    assert len(got) >= N_DUP  # every planted twin qualifies


def test_blocked_no_duplicate_pairs(spark, planted):
    df, _ = planted
    out = similar_pairs(df, threshold=0.0, n_blocks=4)
    n = out.count()
    assert n == out.select("id1", "id2").distinct().count()


def test_lsh_pairs_recall_and_precision(spark, planted):
    df, sims = planted
    truth = _true_pairs(sims, 0.9)
    got = {
        (r["id1"], r["id2"])
        for r in similar_pairs_lsh(
            df, threshold=0.9, dim=DIM, bands=16, rows_per_band=4
        ).collect()
    }
    # precision 1.0 by construction (exact re-rank); recall from the S-curve:
    # p(0.9) = 0.856, 16 bands x 4 rows -> miss < 1e-3 per pair
    assert got <= truth
    recall = len(got & truth) / max(1, len(truth))
    assert recall >= 0.97, (len(got), len(truth))


def test_multiprobe_beats_single_probe(spark, planted):
    df, sims = planted
    queries = df.filter(F.col("vec_id") < N_BASE).limit(25).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).cache()
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(queries, df, k=1).collect()
    }

    def recall(radius):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_signlsh_topk(
                queries, df, dim=DIM, k=1, bits=8, probe_radius=radius
            ).collect()
            if r["rank"] == 1
        }
        return len(got & brute) / len(brute)

    r0, r2 = recall(0), recall(2)
    assert r2 >= r0
    assert r2 >= 0.8, (r0, r2)


def test_probe_masks():
    masks = probe_masks(6, 2)
    assert len(masks) == 1 + 6 + 15
    assert len(set(masks)) == len(masks)
    assert all(bin(m).count("1") <= 2 for m in masks)
