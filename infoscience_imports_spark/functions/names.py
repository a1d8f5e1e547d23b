"""F25/F26 string kernels: title-casing with acronym preservation + minimal
name parsing.

Reference parity:
  F25 — ``clients/epo_ops_client.py:83-132`` / ``clients/wos_client_v2.py:
        856-888``: patent/WoS titles arrive ALL-CAPS; title-case each word
        but leave real acronyms (all-caps tokens with >= 2 letters that the
        title-case would destroy) untouched. Pure string logic — no library.
  F26 — ``data_pipeline/enricher.py:207-291`` uses nameparser.HumanName; the
        kernel here freezes the subset the pipeline relies on: comma form
        ("Last, First M.") vs natural form ("First M. Last"), first/last
        extraction and given-name initials.

Each kernel is one Column expression (whole-stage codegen) with a pure-Python
twin asserted byte-identical in tests — the same frozen-kernel discipline as
functions/text.py.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- F25: title-case with acronym preservation --------------------------------
# Reference semantics (``epo_ops_client.py:83-102``): every regex word
# (\b\w+\b) is lowercased-then-capitalized, EXCEPT words whose lowercase form
# is on an acronym whitelist, which are uppercased — punctuation and spacing
# pass through untouched. The whitelist mirrors DEFAULT_ACRONYMS
# (``epo_ops_client.py:32-39``).

DEFAULT_ACRONYMS: tuple[str, ...] = ("epfl", "ai", "dna", "eu", "cnrs", "mit")

# word/non-word runs partition the string exactly; both engines run the
# unicode-aware \w ((?U) on the JVM, re.UNICODE in Python)
_RUN_RE = re.compile(r"\w+|\W+", re.UNICODE)


def title_case_acronyms_py(text: str, acronyms: tuple[str, ...] = DEFAULT_ACRONYMS) -> str:
    """Pure-Python oracle for F25 (byte-identical target)."""
    if text is None:
        return ""
    s = text.strip()
    out = []
    acr = set(acronyms)
    for run in _RUN_RE.findall(s):
        if not run[:1].isalnum() and run[:1] != "_":
            out.append(run)
        elif run.lower() in acr:
            out.append(run.upper())
        else:
            out.append(run.lower().capitalize())
    return "".join(out)


def title_case_acronyms_col(
    text: Column, acronyms: tuple[str, ...] = DEFAULT_ACRONYMS
) -> Column:
    """Spark twin of :func:`title_case_acronyms_py` (whole-stage codegen).

    The string is partitioned into word / non-word runs with
    ``regexp_extract_all``; word runs are whitelist-uppercased or
    lowercase-capitalized; runs are rejoined without separators, so
    punctuation and spacing are byte-preserved (ASCII + common unicode —
    both engines' case maps agree there).
    """
    runs = F.regexp_extract_all(F.trim(text), F.lit(r"(?U)(\w+|\W+)"), 1)

    def fix(run: Column) -> Column:
        is_word = run.rlike(r"(?U)^\w")
        lw = F.lower(run)
        capitalized = F.concat(
            F.upper(F.substring(lw, 1, 1)),
            F.substring(lw, F.lit(2), F.lit(1 << 30)),
        )
        return F.when(~is_word, run).otherwise(
            F.when(lw.isin(*acronyms), F.upper(run)).otherwise(capitalized)
        )

    return F.array_join(F.transform(runs, fix), "")


# --- F26: minimal name parsing -------------------------------------------------

_MULTISPACE_RE = re.compile(r"\s+")


def parse_name_py(name: str) -> dict:
    """Pure-Python oracle for F26: {first, last, initials}.

    Semantics (frozen): periods become spaces; whitespace collapses; a comma
    splits "Last, Given..." else the final token is the last name; initials
    are the uppercased first letters of the given tokens.
    """
    if name is None:
        return {"first": "", "last": "", "initials": ""}
    s = _MULTISPACE_RE.sub(" ", name.replace(".", " ")).strip()
    if s == "":
        return {"first": "", "last": "", "initials": ""}
    if "," in s:
        last, _, rest = s.partition(",")
        given = rest.strip().split(" ") if rest.strip() else []
        last = last.strip()
    else:
        toks = s.split(" ")
        last = toks[-1]
        given = toks[:-1]
    given = [g for g in given if g]
    first = given[0] if given else ""
    initials = "".join(g[0].upper() for g in given)
    return {"first": first, "last": last, "initials": initials}


def parse_name_col(name: Column) -> Column:
    """Spark twin of :func:`parse_name_py` — returns struct(first, last, initials)."""
    s = F.trim(F.regexp_replace(F.regexp_replace(name, r"\.", " "), r"\s+", " "))
    has_comma = s.contains(",")
    # split at the FIRST comma (substring_index(-1) would take the last)
    last_comma = F.trim(F.substring_index(s, ",", 1))
    rest_comma = F.trim(
        F.substring(
            s,
            F.length(F.substring_index(s, ",", 1)) + F.lit(2),
            F.lit(1 << 30),
        )
    )
    toks = F.filter(F.split(s, " "), lambda x: x != "")
    given = F.when(
        has_comma,
        F.filter(F.split(rest_comma, " "), lambda x: x != ""),
    ).otherwise(F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))))
    # try_element_at: ANSI mode makes plain element_at throw on empty arrays
    last = F.when(has_comma, last_comma).otherwise(
        F.coalesce(F.try_element_at(toks, F.lit(-1)), F.lit(""))
    )
    first = F.coalesce(F.try_element_at(given, F.lit(1)), F.lit(""))
    initials = F.array_join(
        F.transform(given, lambda g: F.upper(F.substring(g, 1, 1))), ""
    )
    empty = s == ""
    return F.struct(
        F.when(empty, F.lit("")).otherwise(first).alias("first"),
        F.when(empty, F.lit("")).otherwise(last).alias("last"),
        F.when(empty, F.lit("")).otherwise(initials).alias("initials"),
    )
