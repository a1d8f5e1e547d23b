"""Deterministic synthetic web-page corpus with planted duplicate classes.

Implements the fixture contract of ``FIXTURES.md §1``: an
``(url, warc_ts, html, text, lang)`` table whose ground-truth duplicate
clusters are known (hidden ``dup_class`` / ``group_key`` columns carried
alongside for tests; the pipeline input view drops them).

Planted classes (fractions of n):
  HOT        [0.00, 0.05)  one shared boilerplate text — skew stressor
  EXACT      [0.05, 0.15)  byte-identical text pairs, different url/ts
  NEAR_HIGH  [0.15, 0.25)  ~2% contiguous-block token substitution (J >~ 0.9)
  NEAR_MED   [0.25, 0.33)  ~6-9% contiguous-block edits (J ~ 0.72-0.87)
  CONTAIN    [0.33, 0.39)  odd member = contiguous 30-45% slice of even member
  TITLE_DUP  [0.39, 0.45)  identical 12-token title, unrelated bodies
  CHAIN      [0.45, 0.51)  A~B, B~C, A!~C triples (transitivity test)
  UNIQUE     [0.51, 1.00)  singletons — precision guard

Generation is a pure function of (seed, n, i), so it runs **distributed**
via ``spark.range(n).mapInPandas`` — no driver-side materialization; the
same generator scales the bench corpus. (Driver-provided constraint: no
wall-clock or global RNG; everything keyed off the explicit seed.)
"""

from __future__ import annotations

import html as html_mod
import random
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_SYLLABLES = [c + v for c in "bcdfghjklmnprstvwz" for v in ["a", "e", "i", "o", "u", "ar", "en", "il", "on", "us"]]


def _rng(*parts) -> random.Random:
    """Process-independent seeded RNG.

    ``random.Random(tuple)`` would go through ``hash()``, which is salted by
    PYTHONHASHSEED and differs across executor processes — so seeds are
    derived from a blake2b digest of the repr instead.
    """
    import hashlib

    digest = hashlib.blake2b(repr(parts).encode(), digest_size=8).digest()
    return random.Random(int.from_bytes(digest, "big"))

_BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)

SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("dup_class", StringType(), False),
        StructField("group_key", StringType(), False),
    ]
)


def _vocab(seed: int, size: int = 2000) -> list[str]:
    rng = _rng("vocab", seed)
    return ["".join(rng.choices(_SYLLABLES, k=rng.randint(2, 4))) for _ in range(size)]


def _decorate(word: str, rng: random.Random) -> str:
    r = rng.random()
    if r < 0.05:
        word = word.capitalize()
    if rng.random() < 0.08:
        word += rng.choice([",", ".", ";", "!"])
    return word


def _base_tokens(vocab: list[str], rng: random.Random, lo: int, hi: int) -> list[str]:
    n = rng.randint(lo, hi)
    return [_decorate(rng.choice(vocab), rng) for _ in range(n)]


def _block_substitute(tokens: list[str], vocab: list[str], rng: random.Random, frac: float, blocks: int) -> list[str]:
    """Replace `frac` of the tokens in `blocks` contiguous runs (keeps 5-gram
    shingle damage ~ frac instead of ~ 5*frac for scattered edits)."""
    out = list(tokens)
    n = len(out)
    per_block = max(1, int(n * frac / blocks))
    for b in range(blocks):
        if n - per_block <= 1:
            break
        start = rng.randint(0, n - per_block - 1)
        for j in range(start, start + per_block):
            out[j] = _decorate(rng.choice(vocab), rng)
    return out


_CLASS_BOUNDS = [
    ("HOT", 0.00, 0.05, 1),
    ("EXACT", 0.05, 0.15, 2),
    ("NEAR_HIGH", 0.15, 0.25, 2),
    ("NEAR_MED", 0.25, 0.33, 2),
    ("CONTAIN", 0.33, 0.39, 2),
    ("TITLE_DUP", 0.39, 0.45, 2),
    ("CHAIN", 0.45, 0.51, 3),
    ("UNIQUE", 0.51, 1.01, 1),
]


def _class_of(i: int, n: int, width_scale: int = 1) -> tuple[str, int, int]:
    """-> (class, group ordinal within class, member index within group).

    ``width_scale`` multiplies every dup-group width (pair classes become
    2*s-member groups, chains 3*s-member chains) without touching the class
    fractions — the dup-heavier mix for gate soaks: true/candidate pairs per
    group grow ~C(w*s, 2)/C(w, 2) ≈ s² while the corpus mix stays put.
    """
    frac = i / n
    for name, lo, hi, width in _CLASS_BOUNDS:
        if width > 1 and width_scale > 1:
            width = width * width_scale
        if lo <= frac < hi:
            start = int(lo * n)
            end = int(hi * n) if hi <= 1.0 else n
            off = i - start
            if name == "HOT":
                return name, 0, off
            if name == "UNIQUE":
                return name, off, 0
            # incomplete trailing group degrades to UNIQUE
            if off // width >= (end - start) // width:
                return "UNIQUE", i, 0
            return name, off // width, off % width
    return "UNIQUE", i, 0


def _tokens_for(name: str, group: int, member: int, seed: int, vocab: list[str]) -> list[str]:
    g_rng = _rng(seed, name, group)
    if name == "HOT":
        return _base_tokens(vocab, _rng(seed, "hotbase"), 200, 300)
    if name == "UNIQUE":
        return _base_tokens(vocab, g_rng, 50, 800)
    if name == "EXACT":
        return _base_tokens(vocab, g_rng, 100, 800)
    if name == "NEAR_HIGH":
        base = _base_tokens(vocab, g_rng, 300, 800)
        if member == 0:
            return base
        m_rng = _rng(seed, name, group, member)
        return _block_substitute(base, vocab, m_rng, frac=0.02, blocks=2)
    if name == "NEAR_MED":
        base = _base_tokens(vocab, g_rng, 300, 800)
        if member == 0:
            return base
        m_rng = _rng(seed, name, group, member)
        return _block_substitute(base, vocab, m_rng, frac=0.07, blocks=3)
    if name == "CONTAIN":
        base = _base_tokens(vocab, g_rng, 300, 800)
        if member == 0:
            return base
        m_rng = _rng(seed, name, group, member)
        length = max(20, int(len(base) * m_rng.uniform(0.30, 0.45)))
        start = m_rng.randint(0, len(base) - length)
        return base[start : start + length]
    if name == "TITLE_DUP":
        title_rng = _rng(seed, name, group, "title")
        title = _base_tokens(vocab, title_rng, 12, 12)
        body = _base_tokens(vocab, _rng(seed, name, group, member, "body"), 100, 400)
        return title + body
    if name == "CHAIN":
        base = _base_tokens(vocab, g_rng, 400, 800)
        if member == 0:
            return base
        m_rng = _rng(seed, name, group, member)
        if member == 1:
            # B: edit a block near the front -> J(A,B) ~ 0.8
            return _block_substitute(base, vocab, m_rng, frac=0.10, blocks=1)
        # C: B's front edit plus a distinct back edit -> J(B,C) ~ 0.8, J(A,C) ~ 0.65
        b_rng = _rng(seed, name, group, 1)
        b = _block_substitute(base, vocab, b_rng, frac=0.10, blocks=1)
        out = list(b)
        per = max(1, int(len(out) * 0.10))
        start = len(out) - per - 1
        for j in range(start, start + per):
            out[j] = _decorate(m_rng.choice(vocab), m_rng)
        return out
    raise AssertionError(name)


_BOILER_NAV = "<nav><a href=\"/\">home</a><a href=\"/about\">about</a><a href=\"/archive\">archive</a></nav>"
_BOILER_FOOT = "<footer>&copy; example press — all rights reserved</footer>"


def render_html(text: str, title: str) -> bytes:
    body = html_mod.escape(text, quote=False)
    doc = (
        "<html><head><title>" + html_mod.escape(title, quote=False) + "</title></head>"
        "<body>" + _BOILER_NAV + '<main id="content">' + body + "</main>" + _BOILER_FOOT + "</body></html>"
    )
    return doc.encode("utf-8")


def gen_row(i: int, n: int, seed: int, vocab: list[str], width_scale: int = 1) -> dict:
    name, group, member = _class_of(i, n, width_scale)
    toks = _tokens_for(name, group, member, seed, vocab)
    text = " ".join(toks)
    rng = _rng(seed, "row", i)
    url = f"https://example{i % 97}.test/p/{i}"
    ts = _BASE_TS + timedelta(seconds=rng.randint(0, 30 * 86400 - 1))
    lang = rng.choices(["en", "fr", "de"], weights=[8, 1, 1])[0]
    return {
        "url": url,
        "warc_ts": ts,
        "html": render_html(text, " ".join(toks[:8])),
        "text": text,
        "lang": lang,
        "dup_class": name,
        "group_key": f"{name}:{group}" if name not in ("UNIQUE",) else f"UNIQUE:{i}",
    }


_INTERLEAVE_PRIME = 1_000_003  # gcd(p, n) == 1 whenever n < p


def _interleave_prime(n: int) -> int:
    """Smallest usable interleave prime for an n-page corpus: the fixed
    1,000,003 below it (so every historical corpus keeps its exact row->
    partition mapping), else the first prime > n (deterministic; > n makes
    it coprime with n, so i -> i*p mod n stays a bijection)."""
    if n < _INTERLEAVE_PRIME:
        return _INTERLEAVE_PRIME
    p = n + 1
    while True:
        if p % 2 and all(p % d for d in range(3, int(p**0.5) + 1, 2)):
            return p
        p += 1


def generate_web_pages(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    partitions: int | None = None,
    interleave: bool = False,
    width_scale: int = 1,
) -> DataFrame:
    """Distributed deterministic corpus of n pages (truth columns included).

    ``interleave=True`` permutes the generation order (i -> i*p mod n, p prime
    > n, a bijection) so every output partition carries the same class mix.
    Without it, contiguous index ranges colocate planted classes per file:
    the HOT class dictionary-compresses to ~nothing while costing full kernel
    CPU per row, so byte-sized scan splits get wildly uneven CPU — the
    round-1 extract-stage scaling ceiling. The doc set is identical either
    way (ids derive from url).
    """
    parts = partitions or max(4, spark.sparkContext.defaultParallelism)
    prime = _interleave_prime(n)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab = _vocab(seed)
        for pdf in batches:
            ids = (
                [(int(i) * prime) % n for i in pdf["id"]]
                if interleave
                else [int(i) for i in pdf["id"]]
            )
            rows = [gen_row(i, n, seed, vocab, width_scale) for i in ids]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n, numPartitions=parts)
        .mapInPandas(kernel, schema=SCHEMA)
    )


_AUTHOR_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField(
            "authors",
            ArrayType(
                StructType(
                    [
                        StructField("seq_no", IntegerType(), False),
                        StructField("author", StringType(), False),
                        StructField("orcid_id", StringType(), True),
                        StructField("organizations", StringType(), False),
                        StructField("is_corresponding", BooleanType(), False),
                    ]
                ),
                False,
            ),
            False,
        ),
    ]
)

_ORG_POOL = [
    "Example Polytechnic (EPFL)",
    "Institute of Web Studies",
    "Univ. of Testing",
    "Acme Research Lab",
    "Center for Synthetic Data",
]


def generate_author_table(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic nested-author companion table: (url, authors array<struct>).

    Mirrors the reference's per-record author list
    (``clients/wos_client_v2.py:1164-1176``: seq_no/author/orcid_id/
    organizations('|'-joined)/is_corresponding) so P3/J1/A3 run against a
    real ``ArrayType(StructType)`` column. Joins to the page corpus on url.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = _rng(seed, "authors", i)
                n_auth = rng.randint(1, 4)
                authors = []
                for s in range(n_auth):
                    name = " ".join(
                        "".join(rng.choices(_SYLLABLES, k=2)).capitalize()
                        for _ in range(2)
                    )
                    orgs = rng.sample(_ORG_POOL, k=rng.randint(1, 3))
                    authors.append(
                        {
                            "seq_no": s + 1,
                            "author": name,
                            "orcid_id": (
                                f"0000-000{rng.randint(1,9)}-{rng.randint(1000,9999)}-{rng.randint(1000,9999)}"
                                if rng.random() < 0.6
                                else None
                            ),
                            "organizations": "|".join(orgs),
                            "is_corresponding": s == 0,
                        }
                    )
                rows.append({"url": f"https://example{i % 97}.test/p/{i}", "authors": authors})
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=max(4, spark.sparkContext.defaultParallelism)).mapInPandas(
        kernel, schema=_AUTHOR_SCHEMA
    )


def pipeline_input(pages: DataFrame) -> DataFrame:
    """Drop truth columns — the (url, warc_ts, html, text, lang) input view."""
    return pages.select("url", "warc_ts", "html", "text", "lang")


def true_pairs(pages: DataFrame) -> DataFrame:
    """Ground-truth duplicate pairs (by doc_id = xxhash64(url)) from groups."""
    ids = pages.select(
        F.xxhash64("url").alias("doc_id"), "group_key", "dup_class"
    ).filter(F.col("dup_class") != "UNIQUE")
    a, b = ids.alias("a"), ids.alias("b")
    return (
        a.join(b, on=F.col("a.group_key") == F.col("b.group_key"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            F.col("a.dup_class").alias("dup_class"),
        )
    )


def grouped_pair_recall(pages: DataFrame, clusters: DataFrame) -> tuple[float, int]:
    """Pairwise dup recall, computed group-wise in LINEAR space.

    Same value as joining :func:`true_pairs` against the cluster assignment
    (a truth group whose members land in clusters of sizes c_1..c_m scores
    Σ C(c_j, 2) hit pairs of C(g, 2) true pairs; docs missing a cluster row
    drop out of both, matching a both-ends inner join) — but it never
    materializes the quadratic pair list, which the explicit join must: the
    HOT class alone is C(100k, 2) ≈ 5e9 pairs at a 2M-page corpus. Returns
    ``(recall, true_pair_count)``.
    """
    ids = pages.select(
        F.xxhash64("url").alias("doc_id"), "group_key", "dup_class"
    ).filter(F.col("dup_class") != "UNIQUE")
    sub = (
        ids.join(clusters.select("doc_id", "cluster_id"), on="doc_id")
        .groupBy("group_key", "cluster_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_group = sub.groupBy("group_key").agg(
        F.sum(F.col("c") * (F.col("c") - F.lit(1)) / F.lit(2)).alias("hit"),
        (F.sum("c") * (F.sum("c") - F.lit(1)) / F.lit(2)).alias("tru"),
    )
    row = per_group.agg(
        F.sum("hit").alias("h"), F.sum("tru").alias("t")
    ).collect()[0]
    t = float(row["t"] or 0.0)
    return (float(row["h"] or 0.0) / t if t else 1.0), int(t)
