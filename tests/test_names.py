"""F25/F26 kernels: byte-equality between the Column twins and the Python
oracles (same discipline as tests/test_text.py)."""

import pytest
from pyspark.sql import functions as F

from infoscience_imports_spark.functions.names import (
    parse_name_col,
    parse_name_py,
    title_case_acronyms_col,
    title_case_acronyms_py,
)

TITLES = [
    "METHOD AND APPARATUS FOR LASER WELDING",
    "a study of epfl campus wifi",
    "DNA SEQUENCING AT MIT AND CNRS",
    "mixed CASE with A single X",
    "doubled  spaces,   punctuation; kept-intact!",
    "",
    "anti-noise x-ray device (EU market)",
    "!!! ???",
]

NAMES = [
    "Doe, John A.",
    "John Archibald Doe",
    "Curie, Marie",
    "  van  der   Berg,  Hans ",
    "Plato",
    "Smith, ",
    "J. R. R. Tolkien",
    "",
    "One, Two, Three",
]


def test_title_case_acronyms_byte_equality(spark):
    df = spark.createDataFrame([(t,) for t in TITLES], "t string")
    got = df.select(title_case_acronyms_col(F.col("t")).alias("o")).collect()
    for row, t in zip(got, TITLES):
        assert row["o"] == title_case_acronyms_py(t), repr(t)


def test_title_case_semantics():
    assert (
        title_case_acronyms_py("METHOD AND APPARATUS FOR LASER WELDING")
        == "Method And Apparatus For Laser Welding"
    )
    # whitelisted acronyms are restored to caps regardless of input case
    assert title_case_acronyms_py("the epfl campus") == "The EPFL Campus"
    assert title_case_acronyms_py("DNA and dna") == "DNA And DNA"
    # every regex word is capitalized — including after intra-word hyphens
    assert title_case_acronyms_py("x-ray anti-noise") == "X-Ray Anti-Noise"


def test_parse_name_byte_equality(spark):
    df = spark.createDataFrame([(n,) for n in NAMES], "n string")
    got = df.select(parse_name_col(F.col("n")).alias("o")).collect()
    for row, n in zip(got, NAMES):
        exp = parse_name_py(n)
        assert row["o"].asDict() == exp, repr(n)


def test_parse_name_semantics():
    assert parse_name_py("Doe, John A.") == {"first": "John", "last": "Doe", "initials": "JA"}
    assert parse_name_py("John Archibald Doe") == {
        "first": "John", "last": "Doe", "initials": "JA",
    }
    assert parse_name_py("Plato") == {"first": "", "last": "Plato", "initials": ""}


@pytest.mark.parametrize("name", NAMES)
def test_parse_name_total(name):
    out = parse_name_py(name)
    assert set(out) == {"first", "last", "initials"}
