"""T1/T2/T3 tagging+scoring and F2/F3/F7 filters vs oracle + pinned values
(SURVEY.md §5.1: tag sets incl. 'other' + reserved-key strip, max-priority,
white/blacklist precedence incl. allowByDefault, storage gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dumb_crawler_spark import oracle as O
from dumb_crawler_spark.config import CrawlConfig
from dumb_crawler_spark.corpus import canonical_config
from dumb_crawler_spark.filters import is_url_allowed, should_store, tag_filter_verdict
from dumb_crawler_spark.tagging import priority_for_tags, tag_urls, with_seed_tag
from dumb_crawler_spark.urlkit import url_parts

URLS = [
    "http://site.example.com/articles/12",   # internal + article
    "http://site.example.com/img/x.png",     # internal + resource
    "http://elsewhere.org/articles/3",       # article only (external)
    "http://elsewhere.org/other",            # no tag → other
    "http://hot.example.com/articles/1",     # internal + article (hot host)
]


def _tag_rows(spark, cfg, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    p = url_parts(F.col("url"))
    return df.select(
        "url",
        tag_urls(p, cfg).alias("tags"),
        priority_for_tags(tag_urls(p, cfg), cfg).alias("prio"),
    ).collect()


def test_tagging_and_priority(spark):
    cfg = canonical_config()
    kernel = O.Kernel(cfg)
    rows = _tag_rows(spark, cfg, URLS)
    expected_tags = [
        ["internal", "article"],
        ["internal", "resource"],
        ["article"],
        ["other"],
        ["internal", "article"],
    ]
    for r, exp in zip(rows, expected_tags):
        assert r["tags"] == exp, r["url"]
        assert r["tags"] == kernel.tag(r["url"])
        assert r["prio"] == kernel.priority(exp)
    # priorities: article=900, other=10, missing tag → 0
    assert rows[0]["prio"] == 900
    assert rows[1]["prio"] == 0  # internal/resource both unscored
    assert rows[3]["prio"] == 10


def test_other_reserved_tag_stripped():
    cfg = CrawlConfig(tagger={"other": "matches(host, '.*')", "a": "isResource(path)"})
    assert "other" not in cfg.tagger  # UrlTagger.java:34-37 semantics


def test_filter_precedence_table(spark):
    # LinkFilter.java:24-44: first decisive tag in ARRAY ORDER wins
    cfg = CrawlConfig(whitelist=("w",), blacklist=("b",), allow_by_default=False)
    cases = [
        (["w", "b"], True),    # whitelist seen first
        (["b", "w"], False),   # blacklist seen first
        (["x", "w"], True),
        (["x", "b", "w"], False),
        (["x", "y"], False),   # fallthrough, allowByDefault=false
        ([], False),
    ]
    df = spark.createDataFrame(
        [("http://s.com/", tags) for tags, _ in cases], "url string, tags array<string>"
    )
    got = df.select(
        is_url_allowed(F.col("url"), F.col("tags"), cfg).alias("ok"),
        tag_filter_verdict(F.col("tags"), cfg).alias("v"),
    ).collect()
    for (tags, expected), r in zip(cases, got):
        assert r["ok"] == expected, tags
        assert O.Kernel(cfg).allowed("http://s.com/", tags) == expected

    cfg2 = CrawlConfig(whitelist=("w",), blacklist=("b",), allow_by_default=True)
    df2 = spark.createDataFrame([("http://s.com/", ["x"])], "url string, tags array<string>")
    assert df2.select(is_url_allowed(F.col("url"), F.col("tags"), cfg2)).collect()[0][0] is True


def test_non_http_always_rejected(spark):
    cfg = CrawlConfig(allow_by_default=True)
    df = spark.createDataFrame([("ftp://x/y", ["w"])], "url string, tags array<string>")
    assert df.select(is_url_allowed(F.col("url"), F.col("tags"), cfg)).collect()[0][0] is False


def test_seed_tag_prepended_after_scoring(spark):
    cfg = canonical_config()
    df = spark.createDataFrame([("http://site.example.com/articles/5",)], "url string")
    p = url_parts(F.col("url"))
    tags = tag_urls(p, cfg)
    row = df.select(
        with_seed_tag(tags).alias("tags"),
        priority_for_tags(tags, cfg).alias("prio"),  # scored WITHOUT seed (DumbCrawler.java:292-300)
    ).collect()[0]
    assert row["tags"] == ["seed", "internal", "article"]
    assert row["prio"] == 900  # seed=1000 does NOT apply


def test_storage_gate(spark):
    cfg = canonical_config()  # includedTags = (article,)
    df = spark.createDataFrame(
        [(["internal", "article"],), (["internal"],), ([],)], "tags array<string>"
    )
    got = [r[0] for r in df.select(should_store(F.col("tags"), cfg)).collect()]
    assert got == [True, False, False]
    # empty includedTags ⇒ store NOTHING (AbstractStorageManager.java:29-35)
    cfg2 = CrawlConfig()
    got2 = [r[0] for r in df.select(should_store(F.col("tags"), cfg2)).collect()]
    assert got2 == [False, False, False]
