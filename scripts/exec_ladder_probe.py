"""Executor-ladder forensics (VERDICT r05 item 1): attribute the
local-cluster[2,1] vs [8,1] negative steady-state scaling.

For each input size multiplier and each ladder level, run bench.py's crawl
(fresh JVMs, tmpfs, event logs kept) and fold the event log into per-phase
{wall, task-CPU, effective parallelism, GC} via scripts/phase_jobs.analyze.
The report answers two questions the round-4 ladder left open:

1. WHERE does the 2.46x task-CPU/URL inflation at 8 single-core executor
   JVMs live — uniform across phases (DRAM + per-JVM constants) or
   concentrated in shuffle-crossing phases (netty/compression)?
2. Does the overhead AMORTIZE with round size — i.e. is it a fixed per-JVM
   cost (JIT, codegen, python daemons) that a production-size round dwarfs,
   or a proportional tax that would survive on a real cluster?

Env knobs:
  EXEC_PROBE_SIZES    comma list of k multipliers (default "1,4";
                      size 1 = frontier 1M / 2 rounds / k=100k — the
                      round-4 exec-ladder input)
  EXEC_PROBE_REPS     reps per (size, level), alternating (default 1)
  EXEC_PROBE_CONF     JSON spark-conf overrides for an A/B arm
  EXEC_PROBE_LEVELS   default "2,8" (executor counts, 1 core each)
Writes EXEC_LADDER.json and prints a readable table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))
from phase_jobs import analyze  # noqa: E402


def run_one(n_exec: int, frontier_n: int, rounds: int, k: int, conf: str | None) -> dict:
    os.makedirs("/dev/shm/bench", exist_ok=True)
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    ev_dir = f"/dev/shm/exec-probe-events-{n_exec}-{time.time_ns()}"
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(n_exec),
        SPARK_GRAFT_MASTER=f"local-cluster[{n_exec},1,5120]",
        SPARK_EXECUTOR_MEM="4g",
        SPARK_DRIVER_MEM="24g",
        BENCH_FRONTIER_N=str(frontier_n),
        BENCH_ROUNDS=str(rounds),
        BENCH_K=str(k),
        BENCH_CRAWL_ONLY="1",
        BENCH_ROUND_PHASES="1",
        BENCH_TMPDIR="/dev/shm/bench",
        SPARK_LOCAL_DIRS="/dev/shm/spark-local",
        SPARK_GRAFT_EVENTLOG=ev_dir,
    )
    if conf:
        env["SPARK_GRAFT_EXTRA_CONF"] = conf
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")], env=env, capture_output=True, text=True
    )
    if out.returncode != 0:
        subprocess.run(["rm", "-rf", ev_dir], check=False)
        raise RuntimeError(f"bench failed at {n_exec} exec: {out.stderr[-2000:]}")
    crawl = json.loads(out.stdout.strip().splitlines()[-1])["crawl"]
    phases = analyze(ev_dir)
    subprocess.run(["rm", "-rf", ev_dir, "/dev/shm/bench"], check=False)
    return {
        "crawl": crawl,
        "phases": {
            name: {
                "wall": round(p["wall"], 2),
                "task_s": round(p["task_s"], 2),
                "par": round(p["task_s"] / p["wall"], 2) if p["wall"] else 0.0,
                "tasks": p["tasks"],
                "gc_s": round(p["gc_s"], 2),
            }
            for name, p in phases.items()
        },
    }


def main() -> None:
    sizes = [int(s) for s in os.environ.get("EXEC_PROBE_SIZES", "1,4").split(",")]
    reps = int(os.environ.get("EXEC_PROBE_REPS", "1"))
    conf = os.environ.get("EXEC_PROBE_CONF")
    levels = [int(s) for s in os.environ.get("EXEC_PROBE_LEVELS", "2,8").split(",")]
    base = {"frontier_n": 1_000_000, "rounds": 2, "k": 100_000}
    report: dict = {"conf": conf, "sizes": {}}
    for size in sizes:
        inp = {
            "frontier_n": base["frontier_n"] * size,
            "rounds": base["rounds"],
            "k": base["k"] * size,
        }
        runs: dict[int, list[dict]] = {n: [] for n in levels}
        for rep in range(reps):
            for n in reversed(levels):
                r = run_one(n, inp["frontier_n"], inp["rounds"], inp["k"], conf)
                runs[n].append(r)
                print(
                    f"size x{size} exec={n} rep={rep}: {r['crawl']['seconds']}s "
                    f"(steady {r['crawl'].get('steady_seconds')}s)",
                    flush=True,
                )
        best = {n: min(rs, key=lambda r: r["crawl"]["seconds"]) for n, rs in runs.items()}
        lo, hi = levels[0], levels[-1]
        t = {n: b["crawl"]["urls_per_sec"] for n, b in best.items()}
        st = {
            n: b["crawl"]["steady_urls_processed"] / b["crawl"]["steady_seconds"]
            for n, b in best.items()
            if b["crawl"].get("steady_seconds")
        }
        report["sizes"][f"x{size}"] = {
            "input": inp,
            "efficiency": round(t[hi] / ((hi / lo) * t[lo]), 3) if t[lo] else None,
            "steady_efficiency": round(st[hi] / ((hi / lo) * st[lo]), 3)
            if lo in st and hi in st
            else None,
            "all_samples_seconds": {
                n: [r["crawl"]["seconds"] for r in rs] for n, rs in runs.items()
            },
            "all_steady_seconds": {
                n: [r["crawl"].get("steady_seconds") for r in rs] for n, rs in runs.items()
            },
            "best": {
                str(n): {"crawl": b["crawl"], "phases": b["phases"]}
                for n, b in best.items()
            },
        }
        # per-phase CPU inflation lo -> hi (best runs)
        infl = {}
        for name, p_hi in best[hi]["phases"].items():
            p_lo = best[lo]["phases"].get(name)
            if p_lo and p_lo["task_s"] > 0.5:
                infl[name] = {
                    "task_s_lo": p_lo["task_s"],
                    "task_s_hi": p_hi["task_s"],
                    "inflation": round(p_hi["task_s"] / p_lo["task_s"], 2),
                    "par_lo": p_lo["par"],
                    "par_hi": p_hi["par"],
                    "gc_lo": p_lo["gc_s"],
                    "gc_hi": p_hi["gc_s"],
                }
        report["sizes"][f"x{size}"]["phase_inflation"] = infl
    (REPO / "EXEC_LADDER.json").write_text(json.dumps(report, indent=2))
    for size, s in report["sizes"].items():
        print(f"\n== size {size}: eff={s['efficiency']} steady={s['steady_efficiency']}")
        print(f"{'phase':28s} {'cpu@2':>8s} {'cpu@8':>8s} {'infl':>6s} {'par2':>5s} {'par8':>5s}")
        for name, r in sorted(s["phase_inflation"].items(), key=lambda kv: -kv[1]["task_s_hi"]):
            print(
                f"{name[:28]:28s} {r['task_s_lo']:8.1f} {r['task_s_hi']:8.1f} "
                f"{r['inflation']:6.2f} {r['par_lo']:5.2f} {r['par_hi']:5.2f}"
            )


if __name__ == "__main__":
    main()
