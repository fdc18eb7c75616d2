"""The incremental dequeue planner (planner.py) must be EXACTLY equivalent to
the legacy fused per-round planning (frontier.plan_dequeue) over whole crawls,
and its driver-held state must stay in perfect sync with the true eligible
set after every round's algebraic update."""

from __future__ import annotations

from pyspark.sql import functions as F

from dumb_crawler_spark import frontier as FR
from dumb_crawler_spark.config import Politeness
from dumb_crawler_spark.corpus import canonical_config, docs_to_spark, generate_web
from dumb_crawler_spark.crawler import Crawler
from dumb_crawler_spark.planner import taken_cells_from_offsets


def test_taken_cells_from_offsets_roundtrip():
    offsets = [(900, 0, "0a", 0), (900, 0, "0b", 5), (900, 1, "1f", 5), (10, 0, "00", 9)]
    # planned 12 → takes: 5, 0, 4, 3 (zero-take bucket dropped)
    assert taken_cells_from_offsets(offsets, 12) == [
        (900, 0, "0a", 5), (900, 1, "1f", 4), (10, 0, "00", 3)
    ]


def _crawl(spark, tmp_path, docs, cfg, rounds, disable_planner=False):
    c = Crawler(spark, cfg, docs_to_spark(spark, docs), tmp_path)
    if disable_planner:
        c._planner.disabled = True
    c.run(max_rounds=rounds)
    return c


def _order(c):
    return [
        (r["round"], r["seq"], r["url_id"])
        for r in c.dequeue_order().orderBy("round", "seq").collect()
    ]


def test_incremental_crawl_equals_legacy_with_budget(spark, tmp_path, monkeypatch):
    """Whole crawl on the threshold path with a BINDING politeness budget:
    incremental planning (hist/host algebra + beyond-cap correction) must
    reproduce the legacy fused plan bit-for-bit — dequeue order, counters,
    final frontier."""
    monkeypatch.setattr(FR, "_TOPK_THRESHOLD_CUTOFF", 0)
    docs, _ = generate_web(n_articles=40, seed=42)
    cfg = canonical_config(politeness=Politeness(budget_per_host_per_round=3), thread_count=4)
    inc = _crawl(spark, tmp_path / "inc", docs, cfg, 5)
    leg = _crawl(spark, tmp_path / "leg", docs, cfg, 5, disable_planner=True)
    assert inc._planner.ready  # the incremental path actually ran
    assert not leg._planner.ready
    assert _order(inc) == _order(leg)
    assert inc.metrics_total() == leg.metrics_total()
    f_inc = {(r["url_id"], r["status"], r["attempt"]) for r in inc.wh.read_frontier().collect()}
    f_leg = {(r["url_id"], r["status"], r["attempt"]) for r in leg.wh.read_frontier().collect()}
    assert f_inc == f_leg


def test_planner_state_matches_full_recount(spark, tmp_path, monkeypatch):
    """After N incremental rounds the driver-held histogram and host counts
    must equal a from-scratch aggregation of the true eligible set — the
    algebra (seed − taken + inserts) drifts by exactly zero."""
    monkeypatch.setattr(FR, "_TOPK_THRESHOLD_CUTOFF", 0)
    docs, _ = generate_web(n_articles=40, seed=7)
    cfg = canonical_config(politeness=Politeness(budget_per_host_per_round=4), thread_count=3)
    c = _crawl(spark, tmp_path, docs, cfg, 4)
    assert c._planner.ready
    last = c.wh.last_committed_round()
    eligible = FR.eligible_raw(c.wh.read_frontier_queued(last), cfg)
    pre = F.substring("url_id", 1, c._planner.prefix_len)
    truth_hist = {
        (r["priority"], r["attempt"], r["_p"]): r["count"]
        for r in eligible.groupBy("priority", "attempt", pre.alias("_p")).count().collect()
    }
    truth_hosts = {r["host"]: r["count"] for r in eligible.groupBy("host").count().collect()}
    assert c._planner.hist == truth_hist
    assert c._planner.hosts == truth_hosts


def test_incremental_without_budget(spark, tmp_path, monkeypatch):
    """No politeness budget: planner tracks only the class histogram; the
    crawl must still match the legacy path exactly."""
    monkeypatch.setattr(FR, "_TOPK_THRESHOLD_CUTOFF", 0)
    docs, _ = generate_web(n_articles=30, seed=9)
    cfg = canonical_config()
    inc = _crawl(spark, tmp_path / "inc", docs, cfg, 4)
    leg = _crawl(spark, tmp_path / "leg", docs, cfg, 4, disable_planner=True)
    assert inc._planner.ready and inc._planner.hosts is None
    assert _order(inc) == _order(leg)
    assert inc.metrics_total() == leg.metrics_total()


def test_planner_many_over_hosts_window_fallback(spark, monkeypatch):
    """VERDICT r03 item 3 (adversarial): 500 over-budget hosts — a budget
    modestly below typical host size, not degenerate — must NOT compile a
    500-branch CASE + 500-way union (the algebra form); the planner falls
    back to the bounded per-host window over just the over set, stays
    enabled, and still equals the legacy fused plan row-for-row."""
    import hashlib as _hl

    from dumb_crawler_spark import planner as PL
    from dumb_crawler_spark.config import CrawlConfig, Politeness
    from dumb_crawler_spark.planner import IncrementalPlanner

    monkeypatch.setattr(FR, "_TOPK_THRESHOLD_CUTOFF", 0)
    budget, n_hosts, per_host = 2, 500, 4
    rows = []
    for h in range(n_hosts):
        for j in range(per_host):
            uid = _hl.md5(f"{h}-{j}".encode()).hexdigest()
            rows.append((
                uid, f"http://h{h}.example.com/{j}", f"h{h}.example.com",
                ["t"], 0, 100 + (j % 2), 0, 0, 0, None, None, None, h % 8,
            ))
    fr = spark.createDataFrame(rows, FR.FRONTIER_SCHEMA)
    cfg = CrawlConfig(politeness=Politeness(budget_per_host_per_round=budget))
    eligible = FR.eligible_raw(fr, cfg)
    pl = IncrementalPlanner(cfg)
    assert pl.seed_from(eligible)
    assert n_hosts > PL._ALGEBRA_OVER_MAX

    def boom(*a, **kw):  # the inline-algebra form must not be chosen here
        raise AssertionError("_capped_by_algebra called for 500 over hosts")

    monkeypatch.setattr(pl, "_capped_by_algebra", boom)
    res = pl.plan(eligible, 600)
    assert res is not None and not pl.disabled
    dq, _, taken = res
    leg_df, _, leg_taken = FR.plan_dequeue(eligible, cfg, 600)
    got = sorted(r["url_id"] for r in dq.collect())
    want = sorted(r["url_id"] for r in leg_df.collect())
    assert taken == leg_taken == 600
    assert got == want


def test_incremental_dq_plan_pushes_down(spark, tmp_path, monkeypatch):
    """The incremental path's dequeue plan reads the frontier parquet
    DIRECTLY (no eligible cache) — so the threshold walk's class predicate
    (priority/attempt) and the queued filter must reach the scan as
    PushedFilters, and the scan must stay column-pruned. This is the plan
    shape that makes skipping the per-round cache a win, not a regression."""
    monkeypatch.setattr(FR, "_TOPK_THRESHOLD_CUTOFF", 0)
    docs, _ = generate_web(n_articles=40, seed=21)
    cfg = canonical_config(politeness=Politeness(budget_per_host_per_round=3), thread_count=4)
    c = Crawler(spark, cfg, docs_to_spark(spark, docs), tmp_path)
    c.run(max_rounds=2)
    assert c._planner.ready
    eligible = FR.eligible_raw(c.wh.read_frontier_queued(), cfg)
    dq, _, _ = c._planner.plan(eligible, 8)
    plan = dq._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "EqualTo(status,0)" in plan or "IsNotNull(status)" in plan, plan[:2000]
    assert "priority" in plan.split("PushedFilters")[1][:400], plan[:2000]
    # no InMemoryTableScan: the plan must read parquet, not a cache
    assert "InMemoryTableScan" not in plan
