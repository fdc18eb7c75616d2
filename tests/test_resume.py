"""Checkpoint/resume tests (SURVEY.md §5.4): interrupted run + resume ==
uninterrupted run; crash mid-round rolls back to the last committed round
(C2 orphan semantics via snapshot rollback)."""

from __future__ import annotations

import os

from dumb_crawler_spark.corpus import canonical_config, docs_to_spark, generate_web
from dumb_crawler_spark.crawler import Crawler
from dumb_crawler_spark.storage import Warehouse


def _frontier_state(crawler):
    rows = crawler.wh.read_frontier().collect()
    return sorted((r["url_id"], r["status"], r["attempt"], r["error"]) for r in rows)


def _dq(crawler):
    return [(r["round"], r["seq"], r["url_id"]) for r in crawler.dequeue_order().orderBy("round", "seq").collect()]


def test_resume_equals_uninterrupted(spark, tmp_path):
    docs, _ = generate_web(n_articles=30, seed=7)
    cfg = canonical_config()
    sdocs = docs_to_spark(spark, docs)

    # uninterrupted: 5 rounds
    full = Crawler(spark, cfg, sdocs, tmp_path / "full")
    full.run(max_rounds=5)

    # interrupted: 2 rounds, then a NEW crawler resumes for 3 more
    a = Crawler(spark, cfg, sdocs, tmp_path / "split")
    a.run(max_rounds=2)
    b = Crawler(spark, cfg, sdocs, tmp_path / "split")
    assert b.wh.last_committed_round() == 2  # resume detection (S3/A6)
    b.run(max_rounds=3)

    assert _frontier_state(b) == _frontier_state(full)
    assert _dq(b) == _dq(full)
    assert b.wh.read_deltas("metrics").count() == full.wh.read_deltas("metrics").count()


def test_crash_mid_round_rolls_back(spark, tmp_path):
    docs, _ = generate_web(n_articles=30, seed=7)
    cfg = canonical_config()
    sdocs = docs_to_spark(spark, docs)

    c = Crawler(spark, cfg, sdocs, tmp_path / "wh")
    c.run(max_rounds=3)
    state_r2_marker = tmp_path / "wh" / "_commits" / "_round-00000003.json"

    # simulate crash AFTER round-3 table writes but BEFORE the commit marker
    os.remove(state_r2_marker)
    resumed = Crawler(spark, cfg, sdocs, tmp_path / "wh")
    start = resumed.bootstrap()
    assert start == 2
    # round-3 snapshot/deltas were rolled back
    assert not (tmp_path / "wh" / "frontier" / "snap-00000003").exists()
    assert not (tmp_path / "wh" / "pages" / "delta-00000003").exists()

    # re-running from round 2 reproduces the same round 3 (determinism)
    ref = Crawler(spark, cfg, sdocs, tmp_path / "ref")
    ref.run(max_rounds=3)
    resumed.run(max_rounds=1)
    assert _frontier_state(resumed) == _frontier_state(ref)
    assert _dq(resumed) == _dq(ref)


def test_terminated_marker_on_empty_frontier(spark, tmp_path):
    docs, _ = generate_web(n_articles=6, seed=3)
    cfg = canonical_config(thread_count=50)  # huge budget → exhaust quickly
    c = Crawler(spark, cfg, docs_to_spark(spark, docs), tmp_path / "wh")
    c.run(max_rounds=30)
    wh = Warehouse(spark, tmp_path / "wh")
    assert wh.is_terminated()  # S12 marker (CrawlingSessionContext.java:203-218)
