"""URL canonicalization: Python/Spark twin byte-equality + properties."""

import pytest
from pyspark.sql import functions as F

from infoscience_imports_spark.functions.urls import (
    canonical_url_col,
    canonical_url_py,
    registered_domain_col,
    registered_domain_py,
    url_host_col,
    url_host_py,
)

MESSY = [
    "HTTP://WWW.Example.COM:80/a/b/?utm_source=t&z=1&a=2#frag",
    "https://sub.Site.example.co.uk/path/x/",
    "https://example.com",
    "https://example.com/",
    "HTTPS://host.EXAMPLE.com:8080/b?fbclid=x",
    "http://example.com:8080/",
    "https://www.example.com:443/q?b=2&a=1&a=0",
    "https://example.com/p?utm_medium=a&utm_campaign=b&gclid=1&msclkid=2&ref=nav",
    "ftp://Files.Example.org/pub/",
    "https://example.com/p#only-fragment",
    "https://example.com/p?",
    "https://example.com/trailing///",
    "  https://spaces.example.com/x  ",
    "notaurl",
    "",
    "https://single",
    "https://a.b.co.jp/x",
]

EXPECT = {
    "HTTP://WWW.Example.COM:80/a/b/?utm_source=t&z=1&a=2#frag": "http://example.com/a/b?a=2&z=1",
    "https://sub.Site.example.co.uk/path/x/": "https://sub.site.example.co.uk/path/x",
    "https://example.com": "https://example.com",
    "https://example.com/": "https://example.com",
    "HTTPS://host.EXAMPLE.com:8080/b?fbclid=x": "https://host.example.com:8080/b",
    "https://www.example.com:443/q?b=2&a=1&a=0": "https://example.com/q?a=0&a=1&b=2",
    "notaurl": "",
    "": "",
}


def test_python_twin_expected_values():
    for url, want in EXPECT.items():
        assert canonical_url_py(url) == want, url
    assert registered_domain_py("https://sub.site.example.co.uk/p") == "example.co.uk"
    assert registered_domain_py("https://a.b.co.jp/x") == "b.co.jp"
    assert registered_domain_py("https://deep.sub.example.com") == "example.com"
    assert registered_domain_py("https://single") == "single"
    assert url_host_py("  https://spaces.example.com/x  ") == "spaces.example.com"


def test_spark_matches_python_twin(spark):
    df = spark.createDataFrame([(u,) for u in MESSY], ["url"])
    got = df.select(
        "url",
        canonical_url_col(F.col("url")).alias("canon"),
        url_host_col(F.col("url")).alias("host"),
        registered_domain_col(F.col("url")).alias("dom"),
    ).collect()
    for r in got:
        assert r["canon"] == canonical_url_py(r["url"]), r["url"]
        assert r["host"] == url_host_py(r["url"]), r["url"]
        assert r["dom"] == registered_domain_py(r["url"]), r["url"]


def test_canonical_is_idempotent_property():
    from hypothesis import given, settings, strategies as st

    label = st.text(alphabet="abcdefgh", min_size=1, max_size=5)
    param = st.text(alphabet="abz=12_", min_size=1, max_size=6)

    @settings(max_examples=200, deadline=None)
    @given(
        scheme=st.sampled_from(["http", "HTTPS", "ftp"]),
        www=st.booleans(),
        labels=st.lists(label, min_size=1, max_size=4),
        port=st.sampled_from(["", ":80", ":443", ":8080"]),
        path=st.lists(label, min_size=0, max_size=3),
        params=st.lists(param, min_size=0, max_size=4),
        frag=st.sampled_from(["", "#f"]),
    )
    def check(scheme, www, labels, port, path, params, frag):
        url = (
            scheme + "://" + ("www." if www else "") + ".".join(labels) + port
            + ("/" + "/".join(path) if path else "")
            + ("?" + "&".join(params) if params else "")
            + frag
        )
        once = canonical_url_py(url)
        assert canonical_url_py(once) == once  # idempotent fixed point

    check()
