"""Byte-identity of the frozen text kernels: Python oracle == Spark expression.

This is the BASELINE.json input_hint invariant: "byte-identical extracted
text per url".
"""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

from infoscience_imports_spark.functions.text import (
    extract_text_col,
    extract_text_py,
    normalize_text_col,
    normalize_text_py,
)
from infoscience_imports_spark.sources.synthetic import render_html, _vocab, _rng

ADVERSARIAL = [
    "",
    "plain words only",
    "Hello, World! How's it going?",
    "tags <b>inside</b> the <i>text</i>",
    "unicode: café naïve Zürich ファイル 数据 — em-dash",
    "entities &amp; &lt;kept&gt; as escaped",
    "newlines\nand\ttabs\r\nand   runs    of spaces",
    "UPPER lower MiXeD 123 4e5 0x1F",
    "trailing punctuation!!! ...",
    "   leading and trailing   ",
    "a<br/>b<hr>c",
    "İstanbul ß ﬁ ligature edge-cases",
]


def _random_texts(n=40, seed=99):
    rng = _rng("txt", seed)
    alphabet = "abc XYZ 012 .,;!? <b> </b> & é ü ¿ \n \t — ç"
    out = []
    for _ in range(n):
        out.append("".join(rng.choice(alphabet) for _ in range(rng.randint(0, 300))))
    return out


def test_normalize_byte_identity(spark):
    texts = ADVERSARIAL + _random_texts()
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    got = [r[0] for r in df.select(normalize_text_col(F.col("t"))).collect()]
    want = [normalize_text_py(t) for t in texts]
    assert got == want


def test_extract_byte_identity_roundtrip(spark):
    """extract(render_html(text)) must recover text byte-for-byte."""
    vocab = _vocab(42)
    rng = _rng("extract", 1)
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 200)))
        for _ in range(30)
    ] + ["with & ampersand < less > greater", "", "x"]
    rows = [(render_html(t, t[:20]),) for t in texts]
    schema = StructType([StructField("html", BinaryType())])
    df = spark.createDataFrame(rows, schema)
    got = [r[0] for r in df.select(extract_text_col(F.col("html"))).collect()]
    # Spark twin == Python oracle == original text
    assert got == [extract_text_py(r[0]) for r in rows]
    assert got == texts


def test_extract_no_main_block(spark):
    html = b"<html><body><p>no main here</p></body></html>"
    df = spark.createDataFrame([(html,)], StructType([StructField("html", BinaryType())]))
    assert df.select(extract_text_col(F.col("html"))).collect()[0][0] == ""
    assert extract_text_py(html) == ""


def test_normalize_is_idempotent():
    for t in ADVERSARIAL:
        once = normalize_text_py(t)
        assert normalize_text_py(once) == once
