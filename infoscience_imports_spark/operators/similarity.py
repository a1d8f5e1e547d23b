"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

The brute-force path is the correctness baseline (JVM-side ``zip_with`` dot
products in double precision — deterministic across engines); the
random-hyperplane LSH path is the scale path: it buckets vectors by sign
patterns so the candidate join touches ~1/2^bits of the corpus per probe
instead of all of it, then re-ranks candidates exactly.

At 100 TB the brute-force form is a cross join — only valid for small query
sets against broadcastable corpora or as the within-bucket re-rank. The LSH
plan (bucket equi-join) is the one that survives scale-up.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_col(a, b):
    """Cosine similarity of two array<float|double> columns, in double.

    Summation is sequential in array order in both Spark's ``aggregate`` and
    reference engines' list functions — results are bit-stable for the
    oracle comparison.
    """
    return _dot(a, b) / (_norm(a) * _norm(b))


def _cosine_pandas_udf():
    """Arrow-vectorized cosine, bit-identical to the JVM fold / SQL engines.

    Spark's higher-order ``aggregate`` is CodegenFallback (interpreted per
    evaluation, re-evaluated by every operator that references it); this UDF
    evaluates once per pair in NumPy. Summation uses ``cumsum[:, -1]`` —
    strictly sequential left-to-right, the same order as the JVM fold and
    reference engines' list functions, so results hash-match the oracle
    (``np.sum``'s pairwise summation would not).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NB: no type annotations — `from __future__ import annotations` turns
    # them into strings, which pandas_udf's signature inference rejects
    @pandas_udf("double")
    def cos(a, b):
        va = np.stack(a.to_numpy()).astype(np.float64)
        vb = np.stack(b.to_numpy()).astype(np.float64)
        dots = (va * vb).cumsum(axis=1)[:, -1]
        na = np.sqrt((va * va).cumsum(axis=1)[:, -1])
        nb = np.sqrt((vb * vb).cumsum(axis=1)[:, -1])
        return pd.Series(dots / (na * nb))

    return cos


def unit_vec(a):
    """Vector divided by its L2 norm (one pass per row, done once — pair
    scoring then needs only a dot product instead of dot + two norms)."""
    n = _norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_q: str = "query_id",
    id_c: str = "vec_id",
    vec_q: str = "embedding",
    vec_c: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (brute force; broadcast the queries).

    NB: cosine is computed as dot/(|a|*|b|) per pair (NOT via pre-normalized
    vectors) to stay bit-identical with reference engines' list_cosine — the
    oracle-parity contract. The hot path for scale is ann_signlsh_topk.
    """
    cos = _cosine_pandas_udf()
    q = queries.select(F.col(id_q).alias("query_id"), F.col(vec_q).alias("_qv"))
    c = corpus.select(F.col(id_c).alias("neighbor_id"), F.col(vec_c).alias("_cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cos(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def similar_pairs(corpus: DataFrame, threshold: float, id_c: str = "vec_id", vec_c: str = "embedding") -> DataFrame:
    """All pairs with cosine >= threshold (id1 < id2) — embedding near-dup.

    cosine(a,b) == dot(a,b)/(|a|*|b|) evaluated per pair so the result is
    bit-identical to the SQL oracle; the norms are joined in as precomputed
    scalars (one array pass per row instead of two per pair).
    """
    cos = _cosine_pandas_udf()
    a = corpus.select(F.col(id_c).alias("id1"), F.col(vec_c).alias("_v1"))
    b = corpus.select(F.col(id_c).alias("id2"), F.col(vec_c).alias("_v2"))
    return (
        F.broadcast(a)
        .join(b, F.col("id1") < F.col("id2"))
        .withColumn("sim", cos(F.col("_v1"), F.col("_v2")))
        .filter(F.col("sim") >= F.lit(threshold))
        .select("id1", "id2", F.round("sim", 6).alias("sim"))
    )


def hyperplanes(dim: int, bits: int, seed: int = 7) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def signlsh_bucket_col(vec, planes: list[list[float]]):
    """Sign-pattern bucket id of a vector column under fixed hyperplanes."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        d = _dot(vec, F.array(*[F.lit(float(x)) for x in p]))
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def ann_signlsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 3,
    bits: int = 8,
    id_q: str = "query_id",
    id_c: str = "vec_id",
    vec: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: candidates share the sign-LSH bucket, exact re-rank.

    Scale path: the corpus is bucketed once (a cheap narrow column), queries
    probe via equi-join on bucket — shuffle keyed by bucket instead of a
    cross join. Recall is tunable via ``bits`` (fewer bits = more recall,
    more candidates) or multi-probe; this is the IVF-style trade.
    """
    planes = hyperplanes(dim, bits, seed)
    q = queries.select(
        F.col(id_q).alias("query_id"),
        F.col(vec).alias("_qv"),
        signlsh_bucket_col(F.col(vec), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_c).alias("neighbor_id"),
        F.col(vec).alias("_cv"),
        signlsh_bucket_col(F.col(vec), planes).alias("bucket"),
    )
    scored = (
        q.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_col(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )
