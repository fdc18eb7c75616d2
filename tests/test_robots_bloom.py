"""North-rule additions: robots politeness (J6-NR) and the partitioned bloom
URL-seen prefilter (J3-NR). Bloom exactness = prefiltered result identical to
the plain anti-join (no false negatives, false positives verified away)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dumb_crawler_spark import frontier as FR
from dumb_crawler_spark.bloom import PartitionedBloom, prefiltered_new_rows
from dumb_crawler_spark.config import CrawlConfig, Politeness
from dumb_crawler_spark.corpus import canonical_config, docs_to_spark, generate_web
from dumb_crawler_spark.crawler import Crawler
from dumb_crawler_spark.robots import (
    ROBOTS_SCHEMA,
    filter_robots_allowed,
    host_budgets,
    parse_robots_txt,
)

ROBOTS_TXT = """
# comments ignored
User-agent: googlebot
Disallow: /only-for-google

User-agent: *
Disallow: /private
Disallow: /tmp/
Crawl-delay: 2.5
"""


def test_parse_robots_txt():
    row = parse_robots_txt("site.example.com", ROBOTS_TXT)
    assert row == {
        "host": "site.example.com",
        "disallow": ["/private", "/tmp/"],
        "crawl_delay_ms": 2500,
    }


def test_filter_robots_allowed(spark):
    robots = spark.createDataFrame(
        [("site.example.com", ["/private", "/tmp/"], 2500)], ROBOTS_SCHEMA
    )
    cands = spark.createDataFrame(
        [
            ("a", "http://site.example.com/private/x", "site.example.com"),
            ("b", "http://site.example.com/public/x", "site.example.com"),
            ("c", "http://other.com/private/x", "other.com"),  # no robots row → allowed
            ("d", "http://site.example.com/tmp/y", "site.example.com"),
        ],
        "url_id string, url string, host string",
    )
    got = {r["url_id"] for r in filter_robots_allowed(cands, robots).collect()}
    assert got == {"b", "c"}


def test_host_budgets_and_dequeue(spark):
    robots = spark.createDataFrame(
        [("h1.com", [], 10_000), ("h2.com", [], 100)], ROBOTS_SCHEMA
    )
    budgets = host_budgets(robots, round_interval_ms=30_000, default_budget=50)
    got = {r["host"]: r["host_budget"] for r in budgets.collect()}
    assert got == {"h1.com": 3, "h2.com": 50}  # 30s/10s=3; 30s/0.1s=300 capped at 50

    rows = [
        (f"u{h}{i}", f"http://h{h}.com/{i}", f"h{h}.com", ["t"], 0, 10 - i, 0, 0, 0, None, None, None, 0)
        for h in (1, 2, 3) for i in range(5)
    ]
    fr = spark.createDataFrame(rows, FR.FRONTIER_SCHEMA)
    cfg = CrawlConfig(politeness=Politeness(budget_per_host_per_round=4))
    dq = FR.dequeue(fr, cfg, k=None, host_budgets=budgets).collect()
    from collections import Counter
    per_host = Counter(r["host"] for r in dq)
    assert per_host == {"h1.com": 3, "h2.com": 4, "h3.com": 4}  # robots < cfg < no-row default


def test_robots_crawl_end_to_end(spark, tmp_path):
    docs, url_of = generate_web(n_articles=30, seed=9)
    robots = spark.createDataFrame(
        [("site.example.com", ["/articles/1"], None)], ROBOTS_SCHEMA
    )
    cfg = canonical_config(politeness=Politeness(respect_robots=True))
    c = Crawler(spark, cfg, docs_to_spark(spark, docs), tmp_path / "wh", robots=robots)
    c.run(max_rounds=6)
    urls = [r["url"] for r in c.wh.read_frontier().collect()]
    # /articles/1* paths were never merged (except the seed-round has none)
    assert not any("/articles/1" in u for u in urls)
    assert any("/articles/2" in u for u in urls)
    assert c.metrics_total().get("ROBOTS_BLOCKED_LINKS", 0) > 0


def test_bloom_no_false_negatives_and_exactness(spark):
    cfg = CrawlConfig(partitions=8, salt=2)
    from dumb_crawler_spark.corpus import frontier_urls_from_range

    urls = frontier_urls_from_range(spark, 3000)
    cands_all = FR.make_candidates(urls, cfg)
    frontier = FR.merge_new_links(
        FR.empty_frontier(spark), cands_all.limit(2000), cfg, 0, depth=0
    ).cache()
    bloom = PartitionedBloom.build(frontier.select("url_id", "part"))

    probe = bloom.might_contain(cands_all)
    seen_ids = {r["url_id"] for r in frontier.select("url_id").collect()}
    rows = probe.select("url_id", "_maybe_seen").collect()
    fp = sum(1 for r in rows if r["_maybe_seen"] and r["url_id"] not in seen_ids)
    for r in rows:
        if r["url_id"] in seen_ids:
            assert r["_maybe_seen"], f"false negative for {r['url_id']}"
    assert fp / len(rows) < 0.05  # fpr sane

    exact = {r["url_id"] for r in cands_all.join(frontier.select("url_id"), "url_id", "left_anti").collect()}
    fast = {r["url_id"] for r in prefiltered_new_rows(cands_all, frontier, bloom).collect()}
    assert fast == exact


def test_bloom_crawl_matches_plain_crawl(spark, tmp_path):
    docs, _ = generate_web(n_articles=30, seed=4)
    cfg = canonical_config()
    plain = Crawler(spark, cfg, docs_to_spark(spark, docs), tmp_path / "plain")
    plain.run(max_rounds=4)
    bloomed = Crawler(spark, cfg, docs_to_spark(spark, docs), tmp_path / "bloom", use_bloom=True)
    bloomed.run(max_rounds=4)

    def state(c):
        return sorted(
            (r["url_id"], r["status"], r["attempt"]) for r in c.wh.read_frontier().collect()
        )

    assert state(plain) == state(bloomed)
    assert plain.metrics_total() == bloomed.metrics_total()


def test_bloom_ships_via_broadcast_once(spark):
    """Round-2 fix (VERDICT item 4): the bitmap dict must ship through ONE
    sc.broadcast per filter version (fetched once per executor), never be
    closure-captured per task; union releases consumed broadcasts."""
    cfg = CrawlConfig(partitions=4, salt=2)
    from dumb_crawler_spark.corpus import frontier_urls_from_range

    urls = frontier_urls_from_range(spark, 500)
    cands = FR.make_candidates(urls, cfg)
    bloom = PartitionedBloom.build(cands.select("url_id", "part"), expected_per_part=4096)
    assert bloom._bcast is None  # lazy: nothing shipped until first probe
    bloom.might_contain(cands).count()
    b1 = bloom._bcast
    assert b1 is not None and bloom.broadcast_bytes() > 0
    bloom.might_contain(cands).count()
    assert bloom._bcast is b1  # same version -> same broadcast, no re-ship

    more = PartitionedBloom.build(cands.select("url_id", "part"), expected_per_part=4096)
    merged = bloom.union(more)
    assert bloom._bcast is None  # consumed inputs released
    assert merged._bcast is None
    merged.might_contain(cands).count()
    assert merged._bcast is not None and merged._bcast is not b1
