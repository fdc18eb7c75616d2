"""Frontier operator tests (SURVEY.md §5.1/§5.5): J1-J3 dedup+anti-join,
A1 dequeue ordering + politeness budget, C2/C3 status transitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from dumb_crawler_spark import frontier as FR
from dumb_crawler_spark.config import CrawlConfig, Politeness
from dumb_crawler_spark.corpus import canonical_config


def _mk_frontier(spark, rows):
    """rows: (url_id, url, host, priority, status, attempt)"""
    data = [
        (uid, url, host, ["t"], status, prio, att, 0, 0, None, None, None, 0)
        for uid, url, host, prio, status, att in rows
    ]
    return spark.createDataFrame(data, FR.FRONTIER_SCHEMA)


def test_merge_antijoin_and_batch_dedup(spark):
    cfg = canonical_config()
    fr = _mk_frontier(spark, [("a", "http://site.example.com/a", "site.example.com", 5, 0, 0)])
    cands = spark.createDataFrame(
        [
            ("a", "http://site.example.com/a", "site.example.com", ["t"], 9, 0),   # seen → skipped
            ("b", "http://site.example.com/b", "site.example.com", ["t"], 1, 0),
            ("b", "http://site.example.com/b2", "site.example.com", ["t"], 7, 0),  # D1: max prio wins
            ("c", "http://x.com/c1", "x.com", ["t"], 3, 0),
            ("c", "http://x.com/c0", "x.com", ["t"], 3, 0),                        # D1 tie: min url wins
            ("f", "ftp://x.com/f", "x.com", ["t"], 3, 0),                          # F1 drop
        ],
        "url_id string, url string, host string, tags array<string>, priority int, part int",
    )
    out = FR.merge_new_links(fr, cands, cfg, round_no=2, depth=2)
    rows = {r["url_id"]: r for r in out.collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"]["priority"] == 5  # untouched
    assert rows["b"]["url"] == "http://site.example.com/b2" and rows["b"]["priority"] == 7
    assert rows["c"]["url"] == "http://x.com/c0"
    assert rows["b"]["created_round"] == 2 and rows["b"]["depth"] == 2
    assert rows["b"]["status"] == FR.QUEUED and rows["b"]["attempt"] == 0


def test_dequeue_order_and_limit(spark):
    cfg = CrawlConfig(max_attempt_count=5)
    fr = _mk_frontier(spark, [
        ("u1", "http://h1/a", "h1", 10, 0, 0),
        ("u2", "http://h1/b", "h1", 10, 0, 1),   # same prio, higher attempt → later
        ("u0", "http://h1/c", "h1", 10, 0, 0),   # same prio/attempt, url_id tiebreak
        ("u3", "http://h2/d", "h2", 99, 0, 0),   # top priority
        ("u4", "http://h2/e", "h2", 1, 1, 0),    # PROCESSING → ineligible
        ("u5", "http://h2/f", "h2", 1, 0, 5),    # attempt ≥ max → ineligible (F7)
    ])
    got = [r["url_id"] for r in FR.dequeue(fr, cfg, k=10).collect()]
    assert got == ["u3", "u0", "u1", "u2"]  # D2: prio DESC, attempt ASC, url_id ASC
    assert [r["url_id"] for r in FR.dequeue(fr, cfg, k=2).collect()] == ["u3", "u0"]


def test_dequeue_politeness_budget(spark):
    cfg = CrawlConfig(politeness=Politeness(budget_per_host_per_round=2))
    fr = _mk_frontier(spark, [
        ("a1", "http://h1/1", "h1", 9, 0, 0),
        ("a2", "http://h1/2", "h1", 8, 0, 0),
        ("a3", "http://h1/3", "h1", 7, 0, 0),   # over h1 budget
        ("b1", "http://h2/1", "h2", 5, 0, 0),
    ])
    got = [r["url_id"] for r in FR.dequeue(fr, cfg, k=10).collect()]
    assert got == ["a1", "a2", "b1"]


def test_mark_taken_and_completed(spark):
    cfg = CrawlConfig(max_attempt_count=5)
    fr = _mk_frontier(spark, [
        ("a", "http://h/a", "h", 1, 0, 0),
        ("b", "http://h/b", "h", 1, 0, 0),
        ("c", "http://h/c", "h", 1, 0, 0),
    ])
    dq = FR.dequeue(fr, cfg, k=2)
    fr1 = FR.mark_taken(fr, dq, round_no=3)
    st = {r["url_id"]: r for r in fr1.collect()}
    assert st["a"]["status"] == FR.PROCESSING and st["a"]["taken_round"] == 3
    assert st["c"]["status"] == FR.QUEUED and st["c"]["taken_round"] is None

    results = spark.createDataFrame(
        [("a", ["fresh"], True, None), ("b", ["fresh"], False, "INVALID_STATUS_CODE_404")],
        "url_id string, tags array<string>, ok boolean, error string",
    )
    fr2 = FR.mark_completed(fr1, results, cfg, round_no=3)
    st2 = {r["url_id"]: r for r in fr2.collect()}
    assert st2["a"]["status"] == FR.PROCESSED and st2["a"]["attempt"] == 1
    assert st2["a"]["tags"] == ["fresh"] and st2["a"]["completed_round"] == 3
    assert st2["b"]["status"] == FR.FAILED and st2["b"]["error"] == "INVALID_STATUS_CODE_404"
    assert st2["c"]["status"] == FR.QUEUED and st2["c"]["attempt"] == 0


def test_reset_orphans(spark):
    fr = _mk_frontier(spark, [("a", "http://h/a", "h", 1, 1, 0), ("b", "http://h/b", "h", 1, 2, 0)])
    st = {r["url_id"]: r for r in FR.reset_orphans(fr).collect()}
    assert st["a"]["status"] == FR.QUEUED and st["a"]["taken_round"] is None
    assert st["b"]["status"] == FR.PROCESSED


def test_status_counts(spark):
    fr = _mk_frontier(spark, [
        ("a", "http://h/a", "h", 1, 0, 0),
        ("b", "http://h/b", "h", 1, 2, 0),
        ("c", "http://h/c", "h", 1, 2, 0),
    ])
    got = {r["status"]: r["count"] for r in FR.status_counts(fr).collect()}
    assert got == {0: 1, 2: 2}


def test_apply_round_updates_equals_two_step(spark):
    """The fused taken+completed join must equal mark_taken → mark_completed."""
    cfg = CrawlConfig(max_attempt_count=5)
    fr = _mk_frontier(spark, [
        ("a", "http://h/a", "h", 1, 0, 0),
        ("b", "http://h/b", "h", 1, 0, 0),
        ("c", "http://h/c", "h", 1, 0, 0),   # dequeued but filtered → leaked PROCESSING
        ("d", "http://h/d", "h", 1, 0, 0),   # untouched
    ])
    dq = spark.createDataFrame([("a",), ("b",), ("c",)], "url_id string")
    results = spark.createDataFrame(
        [("a", ["fresh"], True, None), ("b", ["fresh"], False, "E")],
        "url_id string, tags array<string>, ok boolean, error string",
    )
    fused = FR.apply_round_updates(fr, dq, results, cfg, round_no=4)
    two_step = FR.mark_completed(FR.mark_taken(fr, dq, 4), results, cfg, 4)
    cols = sorted(fr.columns)
    key = lambda t: repr(t)
    fused_rows = sorted((tuple(r[c] for c in cols) for r in fused.collect()), key=key)
    two_rows = sorted((tuple(r[c] for c in cols) for r in two_step.collect()), key=key)
    assert fused_rows == two_rows
    st = {r["url_id"]: r for r in fused.collect()}
    assert st["c"]["status"] == FR.PROCESSING and st["c"]["taken_round"] == 4
    assert st["d"]["status"] == FR.QUEUED
