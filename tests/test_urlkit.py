"""Unit tests for the URL kernel (SURVEY.md §5.1: U2/U5/U9 + parts parity).

Each case runs BOTH backends — the Column expressions (urlkit.py) and the
oracle mirror (oracle.py) — and asserts they agree; selected cases also pin
exact expected values so both can't be wrong together.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dumb_crawler_spark import oracle as O
from dumb_crawler_spark import urlkit as U

URLS = [
    "http://Site.Example.com/Articles/9",
    "https://site.example.com:443/a?b=2&a=1#frag",
    "http://site.example.com:8080/a?z=1&a=2",
    "http://site.example.com",
    "http://user:pw@site.example.com:80/x",
    "https://site.example.com/deep/path/page.html?q=x",
    "ftp://files.example.com/x",
    "not a url",
    "http://site.example.com/img/photo.jpg",
    "http://site.example.com/style.CSS",
]


def _spark_map(spark, col_fn, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["out"] for r in df.select(col_fn(F.col("url")).alias("out")).collect()]


def test_canonicalize_parity_and_values(spark):
    got = _spark_map(spark, U.canonicalize, URLS)
    for u, g in zip(URLS, got):
        assert g == O.canonicalize(u), u
    cases = dict(zip(URLS, got))
    assert cases["http://Site.Example.com/Articles/9"] == "http://site.example.com/Articles/9"
    assert cases["https://site.example.com:443/a?b=2&a=1#frag"] == "https://site.example.com/a?a=1&b=2"
    assert cases["http://site.example.com:8080/a?z=1&a=2"] == "http://site.example.com:8080/a?a=2&z=1"
    assert cases["http://site.example.com"] == "http://site.example.com/"
    assert cases["http://user:pw@site.example.com:80/x"] == "http://user:pw@site.example.com/x"
    assert cases["ftp://files.example.com/x"] == "ftp://files.example.com/x"  # pass-through


def test_canonicalize_idempotent(spark):
    once = _spark_map(spark, U.canonicalize, URLS)
    twice = _spark_map(spark, U.canonicalize, once)
    assert once == twice


def test_url_id_md5_fallback(spark):
    got = _spark_map(spark, lambda c: U.url_id(c, None), ["http://a.com/x"])
    expected = hashlib.md5(b"http://a.com/x").hexdigest()
    assert got == [expected] == [O.url_id("http://a.com/x", None)]


def test_url_id_pattern_full_match_only(spark):
    # URLHasher.java:31-42 — matches() is FULL string; partial match ⇒ md5
    pat = r"https?://site\.example\.com/articles/(?<id>[0-9]+)"
    urls = [
        "http://site.example.com/articles/123",       # full match → "123"
        "http://site.example.com/articles/123?x=1",   # trailing ⇒ no full match → md5
        "http://other.com/articles/5",
    ]
    got = _spark_map(spark, lambda c: U.url_id(c, pat), urls)
    assert got[0] == "123"
    assert got[1] == hashlib.md5(urls[1].encode()).hexdigest()
    assert got[2] == hashlib.md5(urls[2].encode()).hexdigest()
    for u, g in zip(urls, got):
        assert g == O.url_id(u, pat)


def test_url_parts_parity(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    rows = df.select(U.url_parts(F.col("url")).alias("p")).collect()
    for u, r in zip(URLS, rows):
        p = r["p"].asDict()
        o = O.url_parts(u)
        for k in ("protocol", "host", "path", "port", "query", "fragment"):
            assert p[k] == o[k], (u, k, p[k], o[k])


def test_is_resource(spark):
    paths = ["/img/a.jpg", "/x.css", "/x.CSS", "/doc/readme", "/a.mp4", "/a.jpg?x=1"]
    df = spark.createDataFrame([(p,) for p in paths], "p string")
    got = [r[0] for r in df.select(U.is_resource(F.col("p"))).collect()]
    # case-sensitive like the reference Pattern; query suffix breaks the $ anchor
    assert got == [True, True, False, False, True, False]


def test_part_of_range_and_host_grouping(spark):
    df = spark.createDataFrame(
        [(f"http://h{i % 5}.com/x{i}",) for i in range(100)], "url string"
    )
    parts = df.select(
        U.part_of(U.host_of(F.col("url")), U.url_id(F.col("url"), None), 16, 3).alias("part")
    )
    vals = [r["part"] for r in parts.collect()]
    assert all(0 <= v < 16 for v in vals)
    # salt=3 ⇒ each host spreads over ≤3 distinct parts
    from collections import defaultdict
    by_host = defaultdict(set)
    for i, v in enumerate(vals):
        by_host[i % 5].add(v)
    assert all(len(s) <= 3 for s in by_host.values())
