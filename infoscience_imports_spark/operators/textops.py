"""Text-analysis operators for training-data pipelines.

All hot paths are pure Column expressions (whole-stage codegen) — language
ID, quality scoring and token counting never leave the JVM. The winnowing
fingerprint uses explode + window over JVM xxhash64 (no Python).

These generalize the reference's scalar-function surface (SURVEY.md §2.8:
clean_title/clean_value normalization kernels, fuzzy keyword predicates)
into the standard web-corpus curation set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_text_col

# deliberately small, deterministic marker lists (shared with oracle SQL)
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
    "es": ("el", "los", "las"),
}

STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it")

# BPE-ish token pattern: letter runs, digit runs, single other glyphs
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of normalized text (empty text -> empty array)."""
    norm = normalize_text_col(text)
    return F.filter(F.split(norm, " "), lambda x: x != "")


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def bpe_ish_count(text: Column) -> Column:
    """Sub-token count under the BPE-ish regex (raw text, pre-normalization)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0))


def lang_id_col(text: Column) -> Column:
    """Marker-word language ID: the language with the most marker hits wins.

    Deterministic tie-break by fixed language order; 'und' when no marker
    appears. Shares its exact semantics with the SQL oracle in
    ``__spark_entry__`` — keep both in sync.
    """
    toks = tokens_col(text)

    def marker_count(marker: str):
        # NB: a two-arg lambda in F.filter means (element, index) — keep one arg
        return F.size(F.filter(toks, lambda x: x == F.lit(marker)))

    scores = []
    for lang, markers in LANG_MARKERS.items():
        score = sum((marker_count(m) for m in markers), start=F.lit(0))
        scores.append((lang, score))
    # argmax with fixed order tie-break: fold over pairs
    best_lang, best_score = F.lit("und"), F.lit(0)
    for lang, score in scores:
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword ratio features + a composite score."""
    text = F.col(text_col)
    toks = tokens_col(text)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(text).cast("double")
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("double")
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).cast("double")
    n_stop = F.size(
        F.filter(toks, lambda x: x.isin([F.lit(s) for s in STOPWORDS]))
    ).cast("double")

    safe = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))  # noqa: E731
    return df.withColumns(
        {
            "n_tokens": F.size(toks),
            "avg_token_len": safe(n_alpha, n_tok),
            "alpha_ratio": safe(n_alpha, n_chars),
            "punct_ratio": safe(n_punct, n_chars),
            "stopword_ratio": safe(n_stop, n_tok),
        }
    ).withColumn(
        "quality_score",
        F.round(
            F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.4
            + F.col("alpha_ratio") * 0.4
            + (F.lit(1.0) - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.2,
            6,
        ),
    )


def portable_token_hash(tok: Column) -> Column:
    """Engine-portable token hash: polynomial fold over ASCII codes, mod a
    prime. Normalized tokens are [0-9a-z] only, so ``ascii``/``unicode``
    agree across engines — this is what lets the winnowing output be
    verified row-for-row by an independent SQL engine (the xxhash64 default
    has no cross-engine twin)."""
    codes = F.transform(F.split(tok, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(7).cast("long"),
        lambda acc, c: (acc * F.lit(31) + c) % F.lit(1_000_003),
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    portable_hash: bool = True,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 — public).

    k-gram rolling hashes, then the min hash of every sliding window of
    ``window`` consecutive k-grams is selected; distinct selected hashes are
    the doc's fingerprints. Fully JVM-side: posexplode + token hash + a
    min-over-rolling-frame window. ``portable_hash=True`` (default) uses the
    oracle-checkable polynomial hash; pass False for xxhash64 (whole-stage
    codegen, the 100-TB hot path — fingerprint *counts* are statistically
    identical, values differ).
    """
    toks = df.select(F.col(id_col).alias("doc_id"), F.posexplode(tokens_col(F.col(text_col))).alias("pos", "tok"))
    h_col = portable_token_hash(F.col("tok")) if portable_hash else F.xxhash64("tok")
    hashed = toks.withColumn("h", h_col)
    w_gram = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, k - 1)
    )
    grams = (
        hashed.withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
        .withColumn("gram_h", F.pmod(F.sum(F.pmod(F.col("h"), F.lit(1 << 31))).over(w_gram), F.lit(1 << 31)))
        .filter(F.col("pos") <= F.col("n") - k)
    )
    w_win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    selected = grams.withColumn("fp", F.min("gram_h").over(w_win))
    return selected.groupBy("doc_id").agg(
        F.array_sort(F.array_distinct(F.collect_list("fp"))).alias("fingerprints"),
        F.size(F.array_distinct(F.collect_list("fp"))).alias("n_fingerprints"),
    )


def top_ngrams(docs: DataFrame, n: int = 5, k: int = 100, text_col: str = "text") -> DataFrame:
    """Top-k word n-grams by document frequency — corpus statistics for
    boilerplate detection and tokenizer-corpus curation.

    df counts DOCUMENTS containing the n-gram (``array_distinct`` per doc
    before the explode), not occurrences — the quantity the LSH hot-bucket
    cap and the AllPairs df-ascending prefix order key off, surfaced as a
    user-facing report. Pure Column expressions into a partial-agg count;
    the final top-k is ``orderBy().limit()`` which Spark executes as
    TakeOrdered (per-partition heaps + a k-row driver merge), so nothing
    global is ever sorted. Ties at the k boundary break on the gram string
    for a deterministic result set."""
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("_t") - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice("_t", i, n)),
        )
    )
    return (
        docs.select(tokens_col(F.col(text_col)).alias("_t"))
        .filter(F.size("_t") >= n)
        .select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("gram").asc())
        .limit(k)
    )
