"""Per-phase job attribution from a Spark event log.

For each job (grouped by the crawler's ``phase:*`` job description) report:
wall (submission→completion), #tasks, sum of executor run time, and the
effective parallelism (task-time / wall). A phase whose parallelism sits
near 1 at local[8] is driver- or single-task-bound — the thing the thread
ladder cannot speed up. Usage: python scripts/phase_jobs.py <event-log-dir>
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict
from pathlib import Path


def analyze(ev_dir: str) -> dict:
    job_phase: dict[int, str] = {}
    job_wall: dict[int, float] = {}
    job_start: dict[int, float] = {}
    stage_job: dict[int, int] = {}
    stage_task_ms: dict[int, float] = defaultdict(float)
    stage_tasks: dict[int, int] = defaultdict(int)
    stage_max_task: dict[int, float] = defaultdict(float)
    stage_gc_ms: dict[int, float] = defaultdict(float)
    import io
    import subprocess

    for f in Path(ev_dir).glob("**/*"):
        if not f.is_file() or f.name.startswith((".", "appstatus")):
            continue
        if f.name.endswith(".zstd"):
            raw = subprocess.run(["zstd", "-dc", str(f)], capture_output=True, check=True).stdout
            fh = io.StringIO(raw.decode(errors="replace"))
        else:
            fh = open(f, errors="replace")
        with fh:
            for line in fh:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if not isinstance(e, dict):
                    continue
                ev = e.get("Event")
                if ev == "SparkListenerJobStart":
                    jid = e["Job ID"]
                    desc = (e.get("Properties") or {}).get("spark.job.description", "?")
                    job_phase[jid] = desc
                    job_start[jid] = e["Submission Time"]
                    for sid in e.get("Stage IDs", []):
                        stage_job[sid] = jid
                elif ev == "SparkListenerJobEnd":
                    jid = e["Job ID"]
                    if jid in job_start:
                        job_wall[jid] = (e["Completion Time"] - job_start[jid]) / 1e3
                elif ev == "SparkListenerTaskEnd":
                    sid = e["Stage ID"]
                    tm = e.get("Task Metrics") or {}
                    rt = tm.get("Executor Run Time", 0)
                    stage_task_ms[sid] += rt
                    stage_tasks[sid] += 1
                    stage_max_task[sid] = max(stage_max_task[sid], rt)
                    stage_gc_ms[sid] += tm.get("JVM GC Time", 0)
    phases: dict[str, dict] = defaultdict(
        lambda: {"jobs": 0, "wall": 0.0, "task_s": 0.0, "tasks": 0, "max_task_s": 0.0, "gc_s": 0.0}
    )
    per_job_task_ms: dict[int, float] = defaultdict(float)
    per_job_tasks: dict[int, int] = defaultdict(int)
    per_job_max: dict[int, float] = defaultdict(float)
    per_job_gc: dict[int, float] = defaultdict(float)
    for sid, jid in stage_job.items():
        per_job_task_ms[jid] += stage_task_ms[sid]
        per_job_tasks[jid] += stage_tasks[sid]
        per_job_max[jid] = max(per_job_max[jid], stage_max_task[sid])
        per_job_gc[jid] += stage_gc_ms[sid]
    for jid, wall in job_wall.items():
        p = phases[job_phase.get(jid, "?")]
        p["jobs"] += 1
        p["wall"] += wall
        p["task_s"] += per_job_task_ms[jid] / 1e3
        p["tasks"] += per_job_tasks[jid]
        p["max_task_s"] = max(p["max_task_s"], per_job_max[jid] / 1e3)
        p["gc_s"] += per_job_gc[jid] / 1e3
    return dict(phases)


def main() -> None:
    ev_dir = sys.argv[1]
    phases = analyze(ev_dir)
    rows = sorted(phases.items(), key=lambda kv: -kv[1]["wall"])
    print(f"{'phase':34s} {'jobs':>4s} {'wall_s':>8s} {'task_s':>8s} {'par':>5s} {'tasks':>6s} {'maxT_s':>7s} {'gc_s':>6s}")
    for name, p in rows:
        par = p["task_s"] / p["wall"] if p["wall"] else 0.0
        print(
            f"{name[:34]:34s} {p['jobs']:4d} {p['wall']:8.2f} {p['task_s']:8.2f} "
            f"{par:5.2f} {p['tasks']:6d} {p['max_task_s']:7.2f} {p['gc_s']:6.2f}"
        )
    tot_wall = sum(p["wall"] for p in phases.values())
    tot_task = sum(p["task_s"] for p in phases.values())
    print(f"{'TOTAL(job wall, may overlap)':34s} {'':4s} {tot_wall:8.2f} {tot_task:8.2f}")


if __name__ == "__main__":
    main()
