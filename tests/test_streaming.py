"""Structured Streaming surface (SURVEY.md §2.9): continuous link ingest via
foreachBatch merges into the frontier exactly like batch rounds; watermarked
windowed metrics seal correctly."""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dumb_crawler_spark.corpus import canonical_config
from dumb_crawler_spark.storage import Warehouse
from dumb_crawler_spark.streaming import (
    URL_SCHEMA,
    stream_event_metrics,
    stream_ingest_links,
    windowed_event_counts,
)


def _write_urls(spark, path, urls):
    spark.createDataFrame([(u,) for u in urls], URL_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(path))


def test_stream_ingest_links(spark, tmp_path):
    cfg = canonical_config()
    incoming = tmp_path / "incoming"
    _write_urls(spark, incoming, [
        "http://site.example.com/articles/1",
        "http://site.example.com/img/x.png",   # [internal, resource]: whitelist hit first → ACCEPT (F2 fold order)
        "http://elsewhere.org/img/x.png",      # [resource] only → blacklisted
        "http://elsewhere.org/a",              # not whitelisted → allowByDefault=false
    ])
    q = stream_ingest_links(
        spark, cfg, str(tmp_path / "wh"), str(incoming), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    wh = Warehouse(spark, tmp_path / "wh")
    urls = {r["url"] for r in wh.read_frontier().collect()}
    assert urls == {
        "http://site.example.com/articles/1",
        "http://site.example.com/img/x.png",
    }

    # second batch: one replayed URL (idempotent merge) + one new
    _write_urls(spark, incoming, [
        "http://site.example.com/articles/1",
        "http://site.example.com/articles/2",
    ])
    q2 = stream_ingest_links(
        spark, cfg, str(tmp_path / "wh"), str(incoming), str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    rows = Warehouse(spark, tmp_path / "wh").read_frontier().collect()
    assert {r["url"] for r in rows} == {
        "http://site.example.com/articles/1",
        "http://site.example.com/img/x.png",
        "http://site.example.com/articles/2",
    }
    by_url = {r["url"]: r for r in rows}
    assert by_url["http://site.example.com/articles/1"].created_round == 1  # not re-inserted


def test_windowed_event_counts_batch_and_stream(spark, tmp_path):
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    rows = [
        ("2024-01-01 00:01:00", "click", 1.0),
        ("2024-01-01 00:05:00", "click", 2.0),
        ("2024-01-01 00:11:00", "click", 4.0),
        ("2024-01-01 02:00:00", "view", 8.0),  # advances watermark far past the first windows
    ]
    df = spark.createDataFrame(rows, "ts string, event_type string, value double").select(
        F.col("ts").cast("timestamp"), "event_type", "value"
    )
    batch = {(str(r["window_start"]), r["event_type"]): (r["n"], r["sum_value"])
             for r in windowed_event_counts(df).collect()}
    assert batch[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert batch[("2024-01-01 00:10:00", "click")] == (1, 4.0)

    incoming = tmp_path / "ev"
    df.coalesce(1).write.mode("append").parquet(str(incoming))
    q = stream_event_metrics(
        spark, str(incoming), str(tmp_path / "ckpt2"), "ev_counts", schema
    )
    q.awaitTermination(120)
    got = {(str(r["window_start"]), r["event_type"]): (r["n"], r["sum_value"])
           for r in spark.sql("SELECT * FROM ev_counts").collect()}
    # append mode emits only watermark-sealed windows: both click windows are
    # sealed by the 02:00 event (watermark 30m), the view window is not
    assert got[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 00:10:00", "click")] == (1, 4.0)
    assert ("2024-01-01 02:00:00", "view") not in got


def test_politeness_gate_state_across_batches(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): per-host event-time
    budget must persist ACROSS micro-batches — batch 2's admissions see batch
    1's consumption; a newer window refills the budget."""
    from dumb_crawler_spark.streaming import stream_politeness_gate

    schema = "host string, url string, ts timestamp"
    incoming = tmp_path / "cand"

    def push(rows):
        spark.createDataFrame(rows, "host string, url string, ts string").select(
            "host", "url", F.col("ts").cast("timestamp")
        ).coalesce(1).write.mode("append").parquet(str(incoming))

    # batch 1: host A has 5 candidates in window [00:00, 00:01) — budget 3
    push([
        ("a.com", f"http://a.com/{i}", "2024-01-01 00:00:10") for i in range(5)
    ] + [("b.com", "http://b.com/0", "2024-01-01 00:00:10")])
    out = tmp_path / "gated"
    q = stream_politeness_gate(
        spark, str(incoming), str(tmp_path / "ck"), str(out), budget_per_host=3,
        window_seconds=60,
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(str(out)).collect()
    a1 = [r for r in rows if r["host"] == "a.com"]
    assert sum(r["admitted"] for r in a1) == 3 and len(a1) == 5
    # deterministic order: smallest urls admitted first
    assert {r["url"] for r in a1 if r["admitted"]} == {f"http://a.com/{i}" for i in range(3)}
    assert all(r["admitted"] for r in rows if r["host"] == "b.com")

    # batch 2: same window -> budget already consumed; next window -> refill
    push([
        ("a.com", "http://a.com/late1", "2024-01-01 00:00:30"),   # same window: reject
        ("a.com", "http://a.com/next1", "2024-01-01 00:01:30"),   # new window: admit
    ])
    q2 = stream_politeness_gate(
        spark, str(incoming), str(tmp_path / "ck"), str(out), budget_per_host=3,
        window_seconds=60,
    )
    q2.awaitTermination(120)
    batch2 = {
        r["url"]: r["admitted"]
        for r in spark.read.parquet(str(out)).collect()
        if "late1" in r["url"] or "next1" in r["url"]
    }
    assert batch2 == {"http://a.com/late1": False, "http://a.com/next1": True}


def test_stream_gated_ingest_end_to_end(spark, tmp_path):
    """Continuous pipeline integration (round 3 + the round-4 re-feed loop):
    files → URL kernel → stateful politeness gate → frontier merge, with
    budget-rejected rows PARKED back into the stream one window forward.
    Across restarts on the same checkpoint: the per-host budget holds in
    every event-time window (≤ 2 new frontier URLs per window here), AND
    every candidate eventually merges — the batch engine's beyond-cap rows
    re-dequeue next round; this is the streaming equivalent (VERDICT r03
    item 7 / ADVICE r03: previously rejects were silently dropped)."""
    from dumb_crawler_spark.streaming import stream_gated_ingest

    cfg = canonical_config()
    incoming = tmp_path / "in"

    def push(rows):
        spark.createDataFrame(rows, "url string, ts string").select(
            "url", F.col("ts").cast("timestamp")
        ).coalesce(1).write.mode("append").parquet(str(incoming))

    def run():
        q = stream_gated_ingest(
            spark, cfg, str(tmp_path / "wh"), str(incoming), str(tmp_path / "ck"),
            budget_per_host=2, window_seconds=60,
        )
        q.awaitTermination(120)
        return {r["url"] for r in Warehouse(spark, tmp_path / "wh").read_frontier().collect()}

    a = lambda i: f"http://site.example.com/articles/{i}"
    # batch 1: 4 candidates in one window, budget 2 → the 2 smallest (ts, url)
    # rows merge; 3 and 4 are parked into the next window (not dropped)
    push([(a(i), "2024-01-01 00:00:10") for i in range(1, 5)])
    assert run() == {a(1), a(2)}

    # run 2: fresh rows 7 (same window w0 → over budget → parked) and
    # 8 (window w1 @00:01:30), plus the parked 3,4 (@00:01:10). Window w1
    # in (ts, url) order is [3, 4, 8] → 3,4 admitted, 8 parked to w2.
    push([
        (a(7), "2024-01-01 00:00:30"),
        (a(8), "2024-01-01 00:01:30"),
    ])
    assert run() == {a(1), a(2), a(3), a(4)}
    # run 3: parked 7 (w1, budget consumed → re-parked) + parked 8 (w2 → admit)
    assert run() == {a(1), a(2), a(3), a(4), a(8)}
    # run 4: parked 7 lands in w2 (one admission left: w2 used 1 of 2) → admit.
    # EVERY candidate has now merged; no window ever exceeded budget 2.
    assert run() == {a(i) for i in (1, 2, 3, 4, 7, 8)}


def test_stream_gated_ingest_skewed_hosts_no_late_drop(spark, tmp_path):
    """ADVICE r04 (medium): with multi-host EVENT-TIME SKEW, a budget-rejected
    row from the laggard host re-fed at ts+window would land below the
    watermark the leading host advanced (max event − window) and be silently
    dropped as late data. The park clamp (greatest(ts + window, batch max
    event time)) must keep the drain guarantee: every candidate merges."""
    import os

    from dumb_crawler_spark.streaming import stream_gated_ingest

    cfg = canonical_config()
    incoming = tmp_path / "in"

    def push(rows):
        spark.createDataFrame(rows, "url string, ts string").select(
            "url", F.col("ts").cast("timestamp")
        ).coalesce(1).write.mode("append").parquet(str(incoming))

    def run():
        q = stream_gated_ingest(
            spark, cfg, str(tmp_path / "wh"), str(incoming), str(tmp_path / "ck"),
            budget_per_host=2, window_seconds=60,
        )
        q.awaitTermination(120)
        return {r["url"] for r in Warehouse(spark, tmp_path / "wh").read_frontier().collect()}

    a = lambda i: f"http://site.example.com/articles/{i}"   # laggard host
    b = lambda i: f"http://hot.example.com/articles/{i}"  # leading host
    # host A: 4 candidates in window 00:00 (budget 2 → 2 parked). Host B's
    # lone row sits 10 minutes AHEAD, so the batch watermark lands at 00:09 —
    # far above A's next window (00:01). The unclamped park would re-feed
    # A's rejects at 00:01:10 < watermark → dropped before the gate.
    push([(a(i), "2024-01-01 00:00:10") for i in range(1, 5)]
         + [(b(1), "2024-01-01 00:10:00")])
    assert run() == {a(1), a(2), b(1)}
    # parked 3,4 re-enter clamped to ≥ 00:10:00 — a fresh window, both admit
    assert run() == {a(1), a(2), a(3), a(4), b(1)}
    # drained park dirs from committed batches are pruned (bounded listing);
    # only dirs within the safety margin of the newest batch may remain
    refeeds = sorted(
        int(d.split("=")[1]) for d in os.listdir(incoming) if d.startswith("refeed=")
    )
    assert all(r >= max(refeeds, default=0) - 1 for r in refeeds)
