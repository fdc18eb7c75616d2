"""Resume-at-scale evidence (VERDICT r04 item 7): what does restarting a
crawl cost at the bench input?

A resumed process pays three one-time costs before its first round is at
steady state:
  1. bootstrap: rollback scan + frontier count (storage.py),
  2. the incremental planner's seed pass — the ONE full grouping-sets scan
     per process lifetime (planner.seed_from),
  3. the pages-seen bloom rebuild — one distinct id scan over pages history
     (crawler._pages_seen_bloom).
This script runs R rounds of the standard bench crawl, then constructs a
FRESH Crawler on the same warehouse (the process-restart analog) and runs
one more round, reporting the resumed round's phase split vs a steady-state
round. Prints one JSON line; numbers go to BENCH.md.

Env: RESUME_FRONTIER_N (default 2000000), RESUME_K (200000), RESUME_ROUNDS (2),
SPARK_GRAFT_CPUS (32).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    import tempfile

    n = int(os.environ.get("RESUME_FRONTIER_N", "2000000"))
    k = int(os.environ.get("RESUME_K", "200000"))
    rounds = int(os.environ.get("RESUME_ROUNDS", "2"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import bench
    from dumb_crawler_spark.crawler import Crawler
    from dumb_crawler_spark.session import get_spark

    spark = get_spark(app="resume-probe", cores=cpus, shuffle_partitions=cpus)
    scratch = os.environ.get("BENCH_TMPDIR") or (
        "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    with tempfile.TemporaryDirectory(prefix="dcs-resume-", dir=scratch) as tmpdir:
        # phase 1: standard crawl (reuses bench's corpus + bootstrap), R rounds
        bench.FRONTIER_N = n
        bench.K_PER_ROUND = k
        bench.ROUNDS = rounds
        first = bench.bench_crawl_rounds(spark, tmpdir)

        # phase 2: process-restart analog — fresh Crawler, all driver state
        # (planner histogram, pages bloom, codegen warm flags) gone
        cfg_docs = spark.read.parquet(os.path.join(tmpdir, "_docs"))
        from dumb_crawler_spark.config import CrawlConfig, Politeness

        cfg = CrawlConfig(
            tagger={
                "internal": r"matches(host, '.*\.corpus\.example\.com')",
                "doc": r"matches(path, '/doc/[0-9]+')",
            },
            priorities={"doc": 900, "other": 10},
            whitelist=("internal",),
            allow_by_default=False,
            storage_included_tags=("doc",),
            thread_count=k // 2,
            politeness=Politeness(budget_per_host_per_round=k // 10),
            partitions=cpus,
        )
        c2 = Crawler(spark, cfg, cfg_docs, tmpdir, compact_every=3)
        t0 = time.time()
        c2.run(max_rounds=1)
        resumed_round_wall = time.time() - t0
        out = {
            "input": {"frontier_n": n, "k": k, "pre_rounds": rounds},
            "first_run_round_seconds": first["round_seconds"],
            "first_run_phases": first["phases"],
            "resumed_round_wall": round(resumed_round_wall, 2),
            "resumed_phases": {
                k2: round(v, 2) for k2, v in sorted(c2.phase_times.items())
            },
            "resumed_round_phase_slices": [s.phase_seconds for s in c2.history],
        }
        print(json.dumps(out))


if __name__ == "__main__":
    main()
