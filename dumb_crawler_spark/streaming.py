"""Structured Streaming surface (SURVEY.md §2.9).

The reference has no streaming runtime — its "stream" is a 1-second poll loop
(DumbCrawler.java:302-310), which crawler.py re-expresses as batch rounds.
This module adds the two streaming shapes a production frontier actually
needs, built on the same operators:

- :func:`stream_ingest_links` — continuous seed/link ingest: parquet files of
  raw URLs landing in a directory are canonicalized → tagged → scored →
  filtered → MERGEd into the frontier, one snapshot commit per micro-batch
  (``foreachBatch``). Effective exactly-once: the streaming checkpoint
  dedups file replay, and the merge itself is idempotent by url_id (re-merging
  a replayed batch inserts nothing — property-tested in test_properties).
- :func:`windowed_event_counts` — watermarked tumbling-window counters, the
  streaming analog of the metrics table (late rows beyond the watermark are
  dropped rather than corrupting closed windows).

Scale: each micro-batch reuses the batch operators, so partitioning/shuffle
behavior is identical to the round loop; the streaming runtime only schedules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from . import frontier as FR
from .config import CrawlConfig
from .storage import Warehouse

URL_SCHEMA = T.StructType([T.StructField("url", T.StringType(), False)])


def stream_ingest_links(
    spark: SparkSession,
    cfg: CrawlConfig,
    warehouse_dir: str,
    incoming_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """readStream(url files) → foreachBatch(merge into frontier snapshot)."""
    wh = Warehouse(spark, warehouse_dir)

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        last = wh.last_committed_round()
        fr = wh.read_frontier(last) if last is not None else FR.empty_frontier(spark)
        rnd = (last or 0) + 1
        cands = FR.filter_allowed(FR.make_candidates(batch, cfg), cfg)
        merged = FR.merge_new_links(fr, cands, cfg, rnd, depth=rnd)
        wh.write_snapshot("frontier", rnd, merged.repartition(cfg.partitions, "part"))
        wh.commit_round(rnd, {"stream_batch": batch_id})

    stream = spark.readStream.schema(URL_SCHEMA).parquet(incoming_dir)
    writer = stream.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts — works on both a streaming and a
    batch DataFrame (same plan, Catalyst decides)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )


def stream_event_metrics(
    spark: SparkSession,
    incoming_dir: str,
    checkpoint_dir: str,
    out_table: str,
    schema: T.StructType,
    available_now: bool = True,
) -> StreamingQuery:
    """File-stream → windowed counts → in-memory table (append mode: only
    windows sealed by the watermark are emitted)."""
    stream = spark.readStream.schema(schema).parquet(incoming_dir)
    agg = windowed_event_counts(stream)
    writer = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
