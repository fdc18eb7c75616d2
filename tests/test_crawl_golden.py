"""Golden end-to-end (SURVEY.md §5.2-5.3): engine crawl == oracle crawl on
the same deterministic synthetic web — exact dequeue order per round (D2),
final URL-seen set, status histogram (A2), counters (A3), and the per-row
span-sequence invariant (BASELINE.json input_hint)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dumb_crawler_spark.config import Politeness
from dumb_crawler_spark.corpus import canonical_config, docs_to_spark, generate_web
from dumb_crawler_spark.crawler import Crawler
from dumb_crawler_spark.oracle import OracleCrawler

ROUNDS = 6


@pytest.fixture(scope="module")
def web():
    return generate_web(n_articles=40, seed=42)


def _run_pair(spark, tmp_path, cfg, docs, max_rounds=ROUNDS):
    oracle = OracleCrawler(cfg, docs).run(max_rounds=max_rounds)
    engine = Crawler(spark, cfg, docs_to_spark(spark, docs), tmp_path / "wh")
    engine.run(max_rounds=max_rounds)
    return oracle, engine


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory, web):
    docs, _ = web
    cfg = canonical_config()
    return _run_pair(spark, tmp_path_factory.mktemp("golden"), cfg, docs)


def test_dequeue_order_exact(pair):
    oracle, engine = pair
    got = [
        (r["round"], r["seq"], r["url_id"])
        for r in engine.dequeue_order().orderBy("round", "seq").collect()
    ]
    assert got == oracle.dequeue_order


def test_final_seen_set(pair):
    oracle, engine = pair
    fr = engine.wh.read_frontier()
    assert {r["url_id"] for r in fr.select("url_id").collect()} == oracle.seen_set()


def test_status_histogram(pair):
    oracle, engine = pair
    from dumb_crawler_spark.frontier import status_counts
    got = {r["status"]: r["count"] for r in status_counts(engine.wh.read_frontier()).collect()}
    assert got == oracle.status_hist()


def test_counters(pair):
    oracle, engine = pair
    got = engine.metrics_total()
    exp = {k: v for k, v in oracle.counters.items() if v}
    assert got == exp


def test_span_sequence_invariant(pair, web):
    """Per-row invariant: stored pages preserve (kind, text, media_ref, order)
    exactly as in the docs input (L3)."""
    docs, _ = web
    oracle, engine = pair
    pages = engine.pages()
    assert pages is not None
    rows = pages.select("url_id", "spans").collect()
    assert len(rows) == len(oracle.pages)
    oracle_by_id = {p["url_id"]: p for p in oracle.pages}
    for r in rows:
        src = sorted(docs[r["url_id"]], key=lambda s: s["offset"])
        got = [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        exp = [(s["kind"], s["text"], s["media_ref"]) for s in src]
        assert got == exp, r["url_id"]
        assert r["url_id"] in oracle_by_id


def test_frontier_urls_match(pair):
    """Beyond ids: stored url/priority/attempt/error values match the oracle."""
    oracle, engine = pair
    fr = {r["url_id"]: r for r in engine.wh.read_frontier().collect()}
    for uid, e in oracle.frontier.items():
        r = fr[uid]
        assert r["url"] == e.url and r["priority"] == e.priority, uid
        assert r["status"] == e.status and r["attempt"] == e.attempt, uid
        assert r["error"] == e.error, uid
        assert r["tags"] == e.tags, uid
        assert r["depth"] == e.depth and r["created_round"] == e.created_round, uid


def test_politeness_budget_parity(spark, tmp_path, web):
    """Same run with a per-host budget: engine and oracle agree (north rule)."""
    docs, _ = web
    cfg = canonical_config(politeness=Politeness(budget_per_host_per_round=3), thread_count=4)
    oracle, engine = _run_pair(spark, tmp_path, cfg, docs, max_rounds=4)
    got = [
        (r["round"], r["seq"], r["url_id"])
        for r in engine.dequeue_order().orderBy("round", "seq").collect()
    ]
    assert got == oracle.dequeue_order
    assert {r["url_id"] for r in engine.wh.read_frontier().select("url_id").collect()} == oracle.seen_set()
    assert engine.metrics_total() == {k: v for k, v in oracle.counters.items() if v}


def test_threshold_path_crawl_matches_oracle(spark, tmp_path, web, monkeypatch):
    """Round-2 pin: with the threshold cutoff forced to 0 the WHOLE crawl
    runs on the large-k planner path — plan-walk dequeued counts, footer-based
    ALLOWED/IGNORED counters, offset-based lineage. Everything must still
    match the oracle exactly (order, seen set, histogram, counters)."""
    from dumb_crawler_spark import frontier as FR

    monkeypatch.setattr(FR, "_TOPK_THRESHOLD_CUTOFF", 0)
    docs, _ = web
    cfg = canonical_config()
    oracle, engine = _run_pair(spark, tmp_path, cfg, docs)
    got = [
        (r["round"], r["seq"], r["url_id"])
        for r in engine.dequeue_order().orderBy("round", "seq").collect()
    ]
    assert got == oracle.dequeue_order
    fr = engine.wh.read_frontier()
    assert {r["url_id"] for r in fr.select("url_id").collect()} == oracle.seen_set()
    assert engine.metrics_total() == {k: v for k, v in oracle.counters.items() if v}


def test_warmup_pass_is_invisible(spark, tmp_path, web):
    """The round-4 codegen warm-up (Crawler.warmup: one 2-row pass through
    the round dataflow before round 1, JIT-compiling the generated classes
    while the machine is idle) must leave ZERO trace in crawl semantics:
    identical dequeue order, counters and final frontier vs warmup off, and
    no leftover fetch artifact."""
    docs, _ = web
    cfg = canonical_config()
    on = Crawler(spark, cfg, docs_to_spark(spark, docs), tmp_path / "on", warmup_codegen=True)
    on.run(max_rounds=3)
    assert on._warmed
    off = Crawler(spark, cfg, docs_to_spark(spark, docs), tmp_path / "off", warmup_codegen=False)
    off.run(max_rounds=3)
    order = lambda c: [
        (r["round"], r["seq"], r["url_id"])
        for r in c.dequeue_order().orderBy("round", "seq").collect()
    ]
    assert order(on) == order(off)
    assert on.metrics_total() == off.metrics_total()
    f = lambda c: {
        (r["url_id"], r["status"], r["attempt"]) for r in c.wh.read_frontier().collect()
    }
    assert f(on) == f(off)
    # the throwaway warm-up artifact is gone
    assert not any("fetch" in d and "00000000" in d for d in
                   (str(p) for p in (tmp_path / "on").rglob("*")))
