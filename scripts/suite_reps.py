"""Operator-suite attribution protocol (VERDICT r05 item 2): run the FULL
bench (crawl + suite, the driver's exact conditions) N times in fresh JVMs,
report per-query all-samples + medians. Single-run suite numbers on this
multi-tenant box swing ±40%; regressions are only real if they survive the
median of alternating reps. Writes SUITE_REPS.json.

Env: SUITE_REPS (default 3), SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS pass through.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    reps = int(os.environ.get("SUITE_REPS", "3"))
    runs = []
    for rep in range(reps):
        env = dict(
            os.environ,
            BENCH_TMPDIR="/dev/shm/bench",
            SPARK_LOCAL_DIRS="/dev/shm/spark-local",
        )
        os.makedirs("/dev/shm/bench", exist_ok=True)
        out = subprocess.run(
            [sys.executable, str(REPO / "bench.py")], env=env, capture_output=True, text=True
        )
        if out.returncode != 0:
            print(f"rep {rep} FAILED: {out.stderr[-1500:]}", flush=True)
            continue
        r = json.loads(out.stdout.strip().splitlines()[-1])
        runs.append(r)
        print(f"rep {rep}: total {r['value']}s crawl {r['queries']['crawl_rounds']}s", flush=True)
    queries = sorted({q for r in runs for q in r["queries"]})
    report = {
        "reps": len(runs),
        "per_query": {
            q: {
                "samples": [r["queries"].get(q) for r in runs],
                "median": round(
                    statistics.median(r["queries"][q] for r in runs if q in r["queries"]), 2
                ),
            }
            for q in queries
        },
        "crawl_urls_per_sec": [r["crawl"]["urls_per_sec"] for r in runs],
        "crawl_steady_urls_per_sec": [
            r["crawl"].get("steady_urls_per_sec") for r in runs
        ],
    }
    (REPO / "SUITE_REPS.json").write_text(json.dumps(report, indent=2))
    for q in queries:
        p = report["per_query"][q]
        print(f"{q:28s} median {p['median']:>8} samples {p['samples']}")


if __name__ == "__main__":
    main()
