"""L2/L3 link extraction + span-order tests, engine vs oracle vs pinned
(SURVEY.md §2.7; F4 nofollow, relative resolution, first-occurrence dedup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dumb_crawler_spark import oracle as O
from dumb_crawler_spark.corpus import SPAN_TYPE
from dumb_crawler_spark.extract import extract_links, order_spans, resolve_url

BASE = "http://site.example.com/deep/path/page.html?q=1"

SPANS = [
    {"kind": "text", "text": 'intro <a href="http://abs.com/x"> mid <a href="/root/y">', "media_ref": None, "offset": 0},
    {"kind": "media", "text": None, "media_ref": "http://cdn.com/img.jpg", "offset": 1},
    {"kind": "text", "text": '<a href="rel/z"> <a href="//proto.com/p"> <a href="http://no.com/f" rel="nofollow"> '
                             '<link href="http://linked.com/l"> <a href="ftp://files/x"> <a href="http://abs.com/x">',
     "media_ref": None, "offset": 2},
]

EXPECTED = [
    "http://abs.com/x",
    "http://site.example.com/root/y",
    "http://cdn.com/img.jpg",
    "http://site.example.com/deep/path/rel/z",
    "http://proto.com/p",
    "http://linked.com/l",
    # nofollow and ftp dropped; duplicate abs.com/x deduped (first occurrence kept)
]


def _spans_df(spark, spans, base):
    rows = [(base, [(s["kind"], s.get("text"), s.get("media_ref"), s["offset"]) for s in spans])]
    return spark.createDataFrame(rows, f"url string, spans {SPAN_TYPE.simpleString()}")


def test_extract_links_engine_vs_oracle_vs_pinned(spark):
    df = _spans_df(spark, SPANS, BASE)
    got = df.select(extract_links(F.col("spans"), F.col("url")).alias("links")).collect()[0]["links"]
    assert got == EXPECTED
    assert O.extract_links(SPANS, BASE) == EXPECTED


def test_resolve_url_cases(spark):
    cases = [
        (BASE, "http://a.com/x", "http://a.com/x"),
        (BASE, "//h.com/p", "http://h.com/p"),
        (BASE, "/top", "http://site.example.com/top"),
        (BASE, "sibling", "http://site.example.com/deep/path/sibling"),
        ("http://h.com", "x", "http://h.com/x"),  # empty base path → root dir
        ("https://h.com/a", "b", "https://h.com/b"),
    ]
    df = spark.createDataFrame([(b, h) for b, h, _ in cases], "base string, href string")
    got = [r[0] for r in df.select(resolve_url(F.col("base"), F.col("href"))).collect()]
    for (b, h, exp), g in zip(cases, got):
        assert g == exp, (b, h)
        assert O.resolve_url(b, h) == exp, (b, h)


def test_order_spans_by_offset(spark):
    shuffled = [SPANS[2], SPANS[0], SPANS[1]]
    df = _spans_df(spark, shuffled, BASE)
    got = df.select(order_spans(F.col("spans")).alias("s")).collect()[0]["s"]
    assert [s["offset"] for s in got] == [0, 1, 2]
    # L3 invariant: (kind, text, media_ref, order) sequence preserved
    assert [(s["kind"], s["text"], s["media_ref"]) for s in got] == [
        (s["kind"], s["text"], s["media_ref"]) for s in SPANS
    ]
