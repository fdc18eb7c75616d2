"""SparkSession factory tuned for the sandbox (local[N]) and documented for
the 1000-executor design point.

Scale notes (100 TB / 10^10-URL frontier):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting.
- shuffle.partitions tracks parallelism locally; on a real cluster this is
  2-3× total cores and the frontier's explicit `part` bucketing (frontier.py)
  keeps the hot-path window/merge shuffles partition-aligned regardless.
- Arrow enabled: every pandas UDF crosses the JVM↔Python boundary in Arrow
  batches (BASELINE.json input_hint: vectorized, no per-row Python).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "dumb_crawler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    # SPARK_GRAFT_MASTER overrides the thread-mode master — e.g.
    # "local-cluster[8,2,6144]" runs 8 SEPARATE executor JVMs × 2 cores
    # (own heap, GC, python workers), the closest single-box analog of the
    # north rule's N-vs-4N executor-cluster ladder (scripts/scaling_report.py)
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # only meaningful under local-cluster masters (ignored by local[N],
        # where executor == driver); must fit inside the worker memory slice
        # given in the master spec
        .config("spark.executor.memory", os.environ.get("SPARK_EXECUTOR_MEM", "4g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Smaller file splits: the crawl's scan stages run compute-heavy
        # per-row kernels (URL canonicalize/tag/hash over exploded links),
        # so a 128 MB default split yields ~10 tasks for a round's fetch
        # artifact — 2 ragged waves on 8+ cores (measured: 6 idle cores for
        # a full wave, scripts/phase_jobs.py). 32 MB keeps scan stages at
        # ≥2-3 tasks/core; AQE coalescing re-merges where they're too small.
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        # HotSpot refuses to JIT methods over 8 KB of bytecode
        # (-XX:DontCompileHugeMethods): a whole-stage-codegen method past
        # that limit runs INTERPRETED — measured 10-15x slowdowns on wide
        # frontier plans. Capping hugeMethodLimit makes Spark fall back to
        # non-codegen execution for exactly those stages, which is merely
        # ~2x slower and, critically, predictable. Overridable for A/B
        # (SPARK_GRAFT_HUGE_METHOD_LIMIT; round-4 warm-up-convoy triage).
        .config(
            "spark.sql.codegen.hugeMethodLimit",
            os.environ.get("SPARK_GRAFT_HUGE_METHOD_LIMIT", "8000"),
        )
        # the per-round eligible cache is read several times per round; RLE
        # re-decode on every pass showed up as a top CPU frame — trade memory
        # for decode-free columnar reads
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
    )
    java_opts = os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS")
    if java_opts:
        # e.g. "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m"
        # (in local[N] the driver JVM IS the executor, so these govern task
        # execution too; used by the round-4 JIT warm-up-convoy experiments)
        b = b.config("spark.driver.extraJavaOptions", java_opts)
    ev_dir = os.environ.get("SPARK_GRAFT_EVENTLOG")
    if ev_dir:  # per-stage metrics for the scaling report's CPU accounting
        os.makedirs(ev_dir, exist_ok=True)
        b = b.config("spark.eventLog.enabled", "true").config("spark.eventLog.dir", ev_dir)
    if master.startswith("local-cluster"):
        # single-box multi-JVM mode: shuffle/broadcast bytes cross processes
        # over LOOPBACK (+ tmpfs), so lz4 is pure CPU with nothing to save —
        # measured −15% total task CPU at 8×1-core executors
        # (EXEC_LADDER_nocompress.json). A real cluster keeps compression for
        # the network it actually has; SPARK_GRAFT_EXTRA_CONF overrides.
        b = (
            b.config("spark.shuffle.compress", "false")
            .config("spark.broadcast.compress", "false")
            .config("spark.shuffle.spill.compress", "false")
        )
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if env_conf:
        # JSON dict of arbitrary spark confs — lets subprocess-driven A/B
        # experiments (scaling ladders) toggle e.g. shuffle compression or
        # locality wait without code edits
        import json

        for k, v in json.loads(env_conf).items():
            b = b.config(k, str(v))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
