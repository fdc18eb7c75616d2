"""C1: the crawl-round loop (SURVEY.md §2.8, §3.1 step 4-6 as set operations).

The reference's main loop polls futures every second
(DumbCrawler.java:61-79,302-310); one Spark **round** executes the same
dataflow as one declarative plan over the whole batch:

    dequeue (A1) → mark PROCESSING → re-tag/re-filter (T4/F2)
    → fetch-simulate join docs (J4) → validate (F5/F6)
    → extract links (L2) → canonicalize/tag/score/filter (U9/U2/T1/T2/F2)
    → merge new links into frontier (J1-J3/S4)
    → mark PROCESSED/FAILED (C3) → append pages (J5/S7/S8)
    → append metrics (A3/S10) + errors (S11) → commit round (lineage)

Exactly-once rounds: all table writes land BEFORE the round's commit marker
(storage.py); a crash mid-round leaves the previous round's state intact —
the batch analog of the reference's orphan recovery (URLStore.java:54-58).

Termination: C6 empty-frontier stop (DumbCrawler.java:280-285) and the C5
task-killer analog — stop after N consecutive rounds with no new saved page
(TaskKiller.java:18-35; WarcStorageManager.java:27,93 sets the wall-clock
variable; rounds replace wall-clock per SURVEY.md D3).
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import ThreadPoolExecutor
from contextlib import contextmanager
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import frontier as FR
from .config import CrawlConfig
from .extract import order_spans
from .fetch import fetch_simulate
from .filters import is_url_allowed, should_store
from .planner import IncrementalPlanner
from .storage import Warehouse

PAGES_SCHEMA_COLS = ("url_id", "url", "round", "spans", "fetched_round")

# auto-warmup threshold: below this frontier size a round's first wave is
# small enough that the cold-codegen convoy costs less than the warm pass
_WARMUP_MIN_FRONTIER = 50_000


@dataclass
class RoundStats:
    round_no: int
    dequeued: int = 0
    counters: dict[str, int] = field(default_factory=dict)
    wall_seconds: float = 0.0  # run_round wall — steady-state vs warmup triage
    # per-round slice of Crawler.phase_times (run() diffs the accumulator
    # around each round) — lets a bench assert a phase is FLAT across rounds
    # (e.g. pages_split independence from crawl history) without event logs
    phase_seconds: dict[str, float] = field(default_factory=dict)

    def add(self, name: str, value: int) -> None:
        if value:
            self.counters[name] = self.counters.get(name, 0) + int(value)


class Crawler:
    def __init__(
        self,
        spark: SparkSession,
        cfg: CrawlConfig,
        docs: DataFrame,
        warehouse_dir: str | Path,
        robots: DataFrame | None = None,
        use_bloom: bool = False,
        round_interval_ms: int = 60_000,
        compact_every: int = 16,
        concurrent_sinks: bool = False,
        warmup_codegen: bool | None = None,
    ):
        self.spark = spark
        self.cfg = cfg
        self.docs = docs
        self.wh = Warehouse(spark, warehouse_dir)
        self.history: list[RoundStats] = []
        self.robots = robots if cfg.politeness.respect_robots else None
        self.use_bloom = use_bloom
        self.compact_every = compact_every  # MoR delta-window bound (frontier.py)
        # On a real cluster concurrent chain submission overlaps stage
        # latencies (each sink chain's stages interleave on idle executors).
        # In local[N] the driver IS the executor — measured: concurrent
        # chains contend on the same cores + single DAGScheduler event loop
        # for zero net win — so the sandbox default is sequential.
        self.concurrent_sinks = concurrent_sinks
        self._fr_count = 0  # remembered frontier size (avoids before/after double counts)
        self.phase_times: dict[str, float] = {}  # accumulated per-phase secs (perf triage)
        self._phase_lock = threading.Lock()  # chains run concurrently with concurrent_sinks
        self._bloom = None
        self._bloom_capacity = 0
        self._pages_bloom = None  # J5 pages-seen filter (incremental, _pages_split)
        self._pages_bloom_capacity = 0
        self._host_budgets = None
        # Incremental dequeue planning (planner.py): the per-round full
        # eligible-set scan was the dominant serial phase (BENCH.md round 2);
        # the planner replaces it with k-bounded driver algebra after one
        # seed pass. Applies to the large-k threshold path; legacy fused
        # planning remains for small-k / per-host-budget-table rounds.
        self._planner = IncrementalPlanner(cfg)
        # First-execution JIT convoy guard (round-4 finding): the links-chain
        # codegen class first executes in round 1 with EVERY core already
        # running it interpreted — on a saturated 32-thread local run the
        # C1/C2 compile of the big generated methods lags the wave, and the
        # whole first stage burns ~30× CPU interpreted (measured: 585 s task
        # CPU at local[32] vs 20 s at local[8] for identical work; rounds 2+
        # reuse the compiled class and run fast). Running the IDENTICAL plan
        # shape once over a 2-row artifact compiles those classes while the
        # machine is idle, so the convoy never forms. Spark folds literals
        # into codegen references, which is why one warm pass covers every
        # round. Auto mode enables it only where the convoy exists (≥16
        # concurrent tasks); a real cluster's executors warm the same way.
        # auto mode warms only when (a) enough concurrent tasks exist for the
        # convoy to form (≥16-way) and (b) the frontier is big enough that a
        # round's first wave outweighs the one-time ~5-10 s warm pass — a
        # tiny corpus pays the convoy in milliseconds either way (run()
        # checks the bootstrap row count against _WARMUP_MIN_FRONTIER).
        self._warmup_auto = warmup_codegen is None
        self.warmup_codegen = (
            spark.sparkContext.defaultParallelism >= 16
            if warmup_codegen is None
            else warmup_codegen
        )
        self._warmed = False
        if self.robots is not None:
            from .robots import host_budgets

            default = cfg.politeness.budget_per_host_per_round or 2**31 - 1
            self._host_budgets = host_budgets(self.robots, round_interval_ms, default).cache()

    @contextmanager
    def _phase(self, name: str):
        t0 = time.time()
        main = threading.current_thread() is threading.main_thread()
        if main:  # job-description local properties are per-JVM-thread;
            # only the main thread's py4j connection is stable enough to tag.
            # Save/restore so nested phases reinstate the outer description.
            sc = self.spark.sparkContext
            prev = sc.getLocalProperty("spark.job.description")
            sc.setJobDescription(f"phase:{name}")
        try:
            yield
        finally:
            if main:
                sc.setJobDescription(prev)
            with self._phase_lock:
                self.phase_times[name] = self.phase_times.get(name, 0.0) + (time.time() - t0)

    def _write_frontier(self, round_no: int, fr) -> None:
        """Snapshot write with explicit layout: repartition by `part` (the
        salted host bucket — Iceberg bucket-spec analog) and sort within
        partitions by (status, priority DESC) — the `WRITE ORDERED BY`
        analog, so parquet row-group min/max stats let the dequeue's
        status==0 pushdown skip completed row groups entirely."""
        out = fr.repartition(self.cfg.partitions, "part").sortWithinPartitions(
            "status", F.desc("priority")
        )
        self.wh.write_snapshot("frontier", round_no, out)

    # -- bootstrap / resume ----------------------------------------------------
    def bootstrap(self) -> int:
        """Seed injection (S2) as round 0, or resume from the last committed
        round (S3 frontier-scan; A6 latest-session max). Phase-tagged so
        event-log attribution separates one-time setup from round work."""
        with self._phase("bootstrap"):
            last = self.wh.last_committed_round()
            if last is not None:
                self.wh.rollback_uncommitted()
                self._fr_count = self.wh.read_frontier(last).count()
                return last
            seeds_df = self.spark.createDataFrame(
                [(s,) for s in self.cfg.seeds], T.StructType([T.StructField("url", T.StringType())])
            )
            cands = FR.make_candidates(seeds_df, self.cfg, seeds=True)
            stats = RoundStats(0)
            non_http = cands.where(~F.col("url").startswith("http")).count()
            stats.add("IGNORED_URLS", non_http)
            fr = FR.merge_new_links(FR.empty_frontier(self.spark), cands, self.cfg, 0, depth=0)
            self._write_frontier(0, fr)
            self._fr_count = self.wh.read_snapshot("frontier", 0).count()
            stats.add("DISCOVERED_URLS", self._fr_count)
            self._append_metrics(0, stats)
            self.wh.commit_round(0, {"dequeued": 0, "seeded": len(self.cfg.seeds)})
            self.history.append(stats)
            return 0

    def _fetch_artifact(self, allowed: DataFrame) -> DataFrame:
        """J4+F5/F6+L2 fetch artifact plan (one row per allowed input row) —
        shared by run_round and the codegen warm-up so both compile the SAME
        generated classes."""
        from .extract import BASE_PART_COLS, extract_links_with_base, with_base_parts

        return (
            with_base_parts(fetch_simulate(allowed, self.docs, self.cfg))
            .withColumn("links", F.when(F.col("ok"), extract_links_with_base(F.col("spans"))))
            .withColumn("n_links", F.size("links"))
            .drop(*BASE_PART_COLS)
        )

    def _link_candidates(self, ok_rows: DataFrame) -> DataFrame:
        """§3.2 link-ingest kernel over the fetch artifact (explode →
        canonicalize/tag/score/hash) — the heaviest codegen class of a round;
        shared with the warm-up pass."""
        exploded = ok_rows.select(F.explode_outer("links").alias("url")).where(
            F.col("url").isNotNull()
        )
        return FR.make_candidates(exploded, self.cfg)

    def warmup(self) -> None:
        """One 2-row pass through the round dataflow so its generated classes
        JIT-compile while the machine is idle (see __init__ docstring; the
        measured first-round interpreted convoy at local[32] was ~30× task
        CPU). Uses the real operators over a real (tiny) fetch artifact so
        the codegen source — hence the compiled class — matches the rounds'.
        Leaves no state behind: the throwaway artifact is dropped, nothing
        else is written."""
        cfg = self.cfg
        frq = self.wh.read_frontier_queued()
        dq = FR.eligible_raw(frq, cfg).limit(2)
        allowed = FR.retag_dequeued(dq, cfg).where(F.col("_allowed")).drop("_allowed")
        with self._phase("warmup"):
            self.wh.append_delta("fetch", 0, self._fetch_artifact(allowed))
            try:
                fetched = self.wh.read_delta("fetch", 0)
                cands = self._link_candidates(fetched.where(F.col("ok")))
                last = self.wh.last_committed_round() or 0
                seen = self.wh.read_frontier_seen_ids(last).limit(2)
                FR.new_link_rows(seen, cands, 1, depth=1).write.format("noop").mode(
                    "overwrite"
                ).save()
            finally:
                self.wh.drop_delta("fetch", 0)
        self._warmed = True

    # -- one round ----------------------------------------------------------------
    def run_round(self, round_no: int) -> RoundStats:
        cfg = self.cfg
        stats = RoundStats(round_no)
        # dequeue-eligible view: pushdown-friendly, no column reconciliation
        # (frontier.queued_view — terminal-transition invariant)
        frq = self.wh.read_frontier_queued(round_no - 1)

        # A1 dequeue; k mirrors the reference's 2×pool backpressure budget
        # (DumbCrawler.java:266-274).
        k = cfg.thread_count * 2
        eligible = FR.eligible_raw(frq, cfg)
        use_inc = self._planner.applicable(k, self._host_budgets)
        elig_cached = False
        with self._phase("dequeue_plan"):
            plan = None
            if use_inc:
                # incremental path (planner.py): driver-held histogram +
                # host counts → the only pre-dequeue Spark work is the small
                # beyond-cap job on over-budget rounds. The dequeue filter
                # itself then reads the frontier parquet directly — status/
                # priority/attempt predicates push down to row-group stats
                # (the snapshot is written sorted by (status, priority DESC)),
                # so no 10^6-row executor cache is ever built.
                if not self._planner.ready:
                    # seed pass: the ONE full grouping-sets scan per
                    # bootstrap/resume (the legacy path paid it every round)
                    self._planner.seed_from(eligible)
                if self._planner.ready:
                    plan = self._planner.plan(eligible, k)
            if plan is not None:
                dq_plan, dq_offsets, planned_n = plan
            else:
                use_inc = False
                # legacy fused planning: cache the eligible set once — the
                # grouping-sets probe, the politeness window and the top-K
                # all read the cache (frontier.plan_dequeue)
                eligible = eligible.cache()
                elig_cached = True
                dq_plan, dq_offsets, planned_n = FR.plan_dequeue(
                    eligible, cfg, k, self._host_budgets
                )
            dq = dq_plan.cache()
        if not use_inc:
            # this round's transitions won't be fed back — stale state must
            # not survive into a later incremental round
            self._planner.invalidate()

        # T4 re-tag + re-filter; disallowed rows leak as PROCESSING (reference
        # marks taken before filtering, URLStore.java:191-206 + DumbCrawler.java:275-279).
        retagged = None
        if planned_n is not None:
            # threshold path: dequeued count is known from the plan walk; the
            # ALLOWED/IGNORED split falls out of the fetch artifact's footer
            # row count below. The D2 ORDER-INDEX WRITE is the CACHE
            # MATERIALIZATION BARRIER (VERDICT r04 item 5 — the former bare
            # count() job is fused away): without a barrier the fetch join's
            # several subplan references to dq (broadcast build + miss
            # anti-join) race to evaluate the whole dequeue pipeline against
            # a cold cache and duplicate the heavy window/filter work
            # (measured ~2.5x fetch_write at local[8]). The lineage write
            # evaluates that pipeline exactly once (k-row bucket window +
            # parquet), its footer count IS the walk-count invariant check,
            # and the planner's per-host decrement aggregates the just-
            # written k-row delta (host rides in keep_cols) instead of
            # re-running the pipeline.
            stats.dequeued = planned_n
            assert dq_offsets is not None  # threshold ⇒ walk offsets exist
            with self._phase("dq_order"):
                got_n = self.wh.append_delta(
                    "dequeue_order",
                    round_no,
                    FR.dequeue_order_index(
                        dq, round_no, prefix_len=3, offsets=dq_offsets,
                        keep_cols=("host",),
                    ),
                )
            if got_n != planned_n:
                raise AssertionError(
                    f"threshold dequeue drift: plan walk={planned_n}, executed={got_n}"
                )
            if use_inc:
                hc = None
                if self._planner.hosts is not None:
                    with self._phase("dequeue"):
                        hc = {
                            r["host"]: r["n"]
                            for r in self.wh.read_delta("dequeue_order", round_no)
                            .groupBy("host")
                            .agg(F.count(F.lit(1)).alias("n"))
                            .collect()
                        }
                self._planner.on_dequeued(hc)
            allowed = FR.retag_dequeued(dq, cfg).where(F.col("_allowed")).drop("_allowed")
        else:
            # small-k path: one job materializes dq+retagged AND yields counts
            retagged = FR.retag_dequeued(dq, cfg).cache()
            allowed = retagged.where(F.col("_allowed")).drop("_allowed")
            with self._phase("dequeue"):
                verdicts = {r["_allowed"]: r["n"] for r in retagged.groupBy("_allowed").agg(F.count("*").alias("n")).collect()}
            stats.dequeued = verdicts.get(True, 0) + verdicts.get(False, 0)
        if stats.dequeued == 0:
            for c in (dq, retagged, eligible):
                if c is not None:
                    c.unpersist()
            return stats
        if planned_n is None:
            stats.add("ALLOWED_LINKS", verdicts.get(True, 0))
            stats.add("IGNORED_LINKS", verdicts.get(False, 0))

        # J4 + F5/F6 + L2 link extraction, materialized as a per-round parquet
        # artifact (`fetch` table) instead of an executor-heap cache: the rows
        # carry full span payloads (~KBs each), and columnar-compressed files
        # + column-pruned re-reads beat caching GBs of span data in the heap
        # (measured: the cache build GC-thrashed local[32] into anti-scaling).
        # Downstream consumers each read only the columns they need.
        with self._phase("fetch_write"):
            allowed_n = self.wh.append_delta("fetch", round_no, self._fetch_artifact(allowed))
        if planned_n is not None:
            # fetch_simulate emits exactly one row per allowed input row, so
            # the artifact's footer count IS the T4-allowed count
            stats.add("ALLOWED_LINKS", allowed_n)
            stats.add("IGNORED_LINKS", planned_n - allowed_n)
        fetched = self.wh.read_delta("fetch", round_no)
        ok_rows = fetched.where(F.col("ok"))

        # ---- independent chains over the immutable fetch artifact run
        # CONCURRENTLY. The reference overlaps fetch workers with the store
        # thread (DumbCrawler.java:183-193); the batch analog is concurrent
        # job submission — Spark's scheduler interleaves their stages across
        # the executor cores, so round wall time approaches max(chain)
        # instead of sum(chain). Each chain returns its counter increments;
        # the main thread merges them (RoundStats is not touched off-thread).

        def links_chain() -> dict[str, int]:
            # link-ingest (§3.2): explode → canonicalize/tag/score → F2
            # counters → J3 anti-join → ins delta
            out: dict[str, int] = {}
            link_cands = self._link_candidates(ok_rows)
            obs = None
            flagged = link_cands.withColumn(
                "_ok", is_url_allowed(F.col("url"), F.col("tags"), cfg)
            )
            if self.robots is None and not self.use_bloom:
                # F2 counters ride the ins-write job as observed metrics
                # (CollectMetrics) instead of a separate full candidate pass;
                # the candidate pipeline is therefore evaluated exactly once
                # per round and needs no executor cache. The robots/bloom
                # configs keep the legacy count job: their plans reference
                # the candidate subtree from more than one branch/action, so
                # an observed node would double-count.
                from pyspark.sql import Observation

                obs = Observation()
                flagged = flagged.observe(
                    obs,
                    F.count(F.lit(1)).alias("n_total"),
                    F.sum(F.col("_ok").cast("long")).alias("n_ok"),
                )
                allowed_cands = flagged.where(F.col("_ok")).drop("_ok")
            else:
                # robots/bloom path: ONE aggregation over the cached verdict
                # columns yields the F2 split AND the robots-blocked count —
                # previously links_count plus two per-round full-candidate
                # count() jobs on robots rounds (VERDICT r03 item 6). J6-NR
                # robots gate rides as a broadcast-joined verdict column.
                if self.robots is not None:
                    from .robots import with_robots_verdict

                    flagged = with_robots_verdict(flagged, self.robots)
                else:
                    flagged = flagged.withColumn("_robots_blocked", F.lit(False))
                flagged = flagged.cache()
                link_cands = flagged  # cached handle for the final unpersist
                with self._phase("links_count"):
                    lc = (
                        flagged.groupBy("_ok", "_robots_blocked")
                        .agg(F.count("*").alias("n")).collect()
                    )
                out["ALLOWED_LINKS"] = sum(r["n"] for r in lc if r["_ok"])
                out["IGNORED_LINKS"] = sum(r["n"] for r in lc if not r["_ok"])
                if self.robots is not None:
                    out["ROBOTS_BLOCKED_LINKS"] = sum(
                        r["n"] for r in lc if r["_ok"] and r["_robots_blocked"]
                    )
                allowed_cands = flagged.where(
                    F.col("_ok") & ~F.col("_robots_blocked")
                ).drop("_ok", "_robots_blocked")

            seen_ids = self.wh.read_frontier_seen_ids(round_no - 1)
            bloom = None
            if self.use_bloom:
                from .bloom import PartitionedBloom

                if self._bloom is None:
                    # first build presizes capacity so later increments union
                    self._bloom_capacity = max(4096, (self._fr_count // cfg.partitions + 1) * 8)
                    self._bloom = PartitionedBloom.build(
                        seen_ids, expected_per_part=self._bloom_capacity
                    )
                bloom = self._bloom
            new_rows = FR.new_link_rows(seen_ids, allowed_cands, round_no, depth=round_no, bloom=bloom)
            with self._phase("ins_write"):
                # returns the footer row count — no read-back count job; a
                # zero-insert round leaves no ins- dir at all
                inserted_n = self.wh.write_frontier_inserts(round_no, new_rows)
            out["DISCOVERED_URLS"] = inserted_n
            if obs is not None:
                vals = obs.get
                out["ALLOWED_LINKS"] = int(vals["n_ok"] or 0)
                out["IGNORED_LINKS"] = int(vals["n_total"] or 0) - int(vals["n_ok"] or 0)
            if use_inc and inserted_n:
                # fold the k-bounded ins-delta into the planner state — the
                # small aggregation that replaces next round's frontier scan
                with self._phase("plan_ins_update"):
                    self._planner.on_inserts(self.wh.read_frontier_inserts(round_no))
            if self.use_bloom and inserted_n:
                # incremental: hash ONLY this round's inserts into the filter
                from .bloom import PartitionedBloom

                self._bloom = self._bloom.union(
                    PartitionedBloom.build(
                        self.wh.read_frontier_inserts(round_no).select("url_id", "part"),
                        expected_per_part=self._bloom_capacity,
                    )
                )
            if obs is None:
                link_cands.unpersist()
            return out

        def fstats_chain() -> dict[str, int]:
            # ONE aggregation pass yields PROCESSED_URLS, every ERROR_*,
            # MAX_ATTEMPT_COUNT_REACHED, the F3 store split and A4 warns
            # (A3; URLStore.java:176-180, AbstractStorageManager.java:37-50,
            # DumbCrawler.java:108-110); errors sink (S11) rides behind it
            out: dict[str, int] = {}
            with self._phase("fetch_stats"):
                fstats = (
                    fetched.select(
                        "error",
                        (F.col("attempt") + 1 >= cfg.max_attempt_count).alias("maxed"),
                        (F.col("ok") & should_store(F.col("tags"), cfg)).alias("store"),
                        (F.col("ok") & (F.col("n_links") == 0)).alias("no_links"),
                        (F.col("ok") & (F.col("n_links") > 300)).alias("many_links"),
                        "ok",
                    )
                    .groupBy("error", "maxed", "store", "no_links", "many_links", "ok")
                    .count()
                    .collect()
                )
            n_errors = 0
            for r in fstats:
                if r["error"] is None:
                    out["PROCESSED_URLS"] = out.get("PROCESSED_URLS", 0) + r["count"]
                else:
                    out[f"ERROR_{r['error']}"] = out.get(f"ERROR_{r['error']}", 0) + r["count"]
                    n_errors += r["count"]
                if r["maxed"]:
                    out["MAX_ATTEMPT_COUNT_REACHED"] = out.get("MAX_ATTEMPT_COUNT_REACHED", 0) + r["count"]
                if r["ok"] and not r["store"]:
                    out["UNSAVED_PAGES"] = out.get("UNSAVED_PAGES", 0) + r["count"]
                if r["no_links"]:
                    out["WARN_EMPTY_LINKS"] = out.get("WARN_EMPTY_LINKS", 0) + r["count"]
                if r["many_links"]:
                    out["WARN_TOO_MANY_LINKS"] = out.get("WARN_TOO_MANY_LINKS", 0) + r["count"]
            if n_errors:
                with self._phase("errors_write"):
                    self.wh.append_delta(
                        "errors",
                        round_no,
                        fetched.where(~F.col("ok")).select(
                            "url_id", "url", "error", F.lit(round_no).alias("round"), "spans"
                        ),
                    )
            return out

        def upd_chain() -> dict[str, int]:
            # C3 as a k-row MoR update delta — the frontier is NEVER
            # rewritten in-round (frontier.round_update_delta; compaction
            # bounds the delta window). At 10^10 rows this is O(k) instead
            # of O(frontier) per-round write cost.
            results = fetched.select("url_id", "tags", "ok", "error")
            with self._phase("upd_write"):
                self.wh.write_frontier_updates(
                    round_no, FR.round_update_delta(dq, results, round_no)
                )
            return {}

        def pages_chain() -> dict[str, int]:
            # S7/S8 pages sink with F3 gate + J5 new-vs-update. The span
            # payload makes one pass (gate → order_spans → parquet); the
            # new-vs-update split is INCREMENTAL (VERDICT r04 item 3): a
            # per-round O(k) probe of the pages-seen bloom, exact-checking
            # only bloom positives — never a per-round scan of the full
            # pages history (see _pages_split).
            saved = ok_rows.where(should_store(F.col("tags"), cfg)).select(
                "url_id", "url", F.lit(round_no).alias("round"),
                order_spans(F.col("spans")).alias("spans"),
            )
            with self._phase("pages_write"):
                saved_n = self.wh.append_delta("pages", round_no, saved, keep_empty=False)
            if saved_n == 0:
                return {"NEW_SAVED_PAGES": 0, "UPDATED_PAGES": 0, "SAVED_PAGES": 0}
            with self._phase("pages_split"):
                upd_n = self._pages_split(round_no)
            new_n = saved_n - upd_n
            return {"NEW_SAVED_PAGES": new_n, "UPDATED_PAGES": upd_n, "SAVED_PAGES": saved_n}

        def dq_order_chain() -> dict[str, int]:
            # dequeue-order lineage (golden-comparable): distributed
            # contiguous D2 rank, all-JVM (frontier.dequeue_order_index).
            # Threshold rounds already wrote it as the materialization
            # barrier above (with the walk's offsets — no histogram job);
            # only the small-k path writes it here.
            if planned_n is not None:
                return {}
            with self._phase("dq_order"):
                # host kept on BOTH paths so the table's schema is uniform
                # across rounds (read_deltas unions the per-round dirs)
                self.wh.append_delta(
                    "dequeue_order",
                    round_no,
                    FR.dequeue_order_index(dq, round_no, prefix_len=2, keep_cols=("host",)),
                )
            return {}

        chains = [links_chain, fstats_chain, upd_chain, pages_chain, dq_order_chain]
        with self._phase("chains_wall"):
            if self.concurrent_sinks:
                with ThreadPoolExecutor(max_workers=len(chains)) as pool:
                    results = list(pool.map(lambda c: c(), chains))
            else:
                results = [c() for c in chains]
            for result in results:
                for name, value in result.items():
                    stats.add(name, value)
        self._fr_count += stats.counters.get("DISCOVERED_URLS", 0)

        # periodic MoR compaction: reconcile deltas into a fresh base snapshot
        # so the delta window (and the broadcast upd side) stays bounded —
        # the Iceberg rewrite_data_files analog, amortized over compact_every
        # rounds
        if self.compact_every and round_no % self.compact_every == 0:
            with self._phase("compact"):
                self._write_frontier(round_no, self.wh.read_frontier(round_no))

        with self._phase("commit"):
            self._append_metrics(round_no, stats)
            self.wh.commit_round(round_no, {"dequeued": stats.dequeued, **stats.counters})
            # the per-round fetch artifact (full span payloads) is consumed
            # only within its round — spans persist in pages/errors; without
            # this the warehouse grows O(k × page bytes) every round
            self.wh.drop_delta("fetch", round_no)
        for c in (dq, retagged, eligible):
            if c is not None:
                c.unpersist()
        return stats

    # -- J5 incremental new-vs-update split (VERDICT r04 item 3) ----------------
    # The old split semi-joined the round's fresh ids against EVERY pages
    # delta ever written — cheap per round (broadcast, url_id-pruned) but
    # O(total pages history), so on a months-long crawl the per-round cost
    # grows without bound. A page is UPDATED iff its url_id was saved in a
    # prior round, which is a seen-set question — the same shape the frontier
    # already solves with a partitioned bloom (bloom.py). Per round:
    #   probe the k-bounded fresh ids against the pages-seen bloom (O(k));
    #   zero positives (the common forward-crawl case at fpr 1e-6) ⇒ upd=0
    #   with NO history touch; otherwise exact-check ONLY the positives —
    #   an IN-pushdown id-column scan for small positive sets, a broadcast
    #   semi-join for the rare mass-update (refetch) case. The bloom then
    #   grows by this round's first-time ids (k-bounded driver-side numpy
    #   fold, bloom.add_local — no per-round Spark job for the increment).
    # The bloom bucket is derived (xxhash64(url_id) mod partitions), NOT the
    # frontier's salted-host `part`, so the filter needs nothing but the ids
    # and a resume can rebuild it from pages history alone (one distinct
    # per process lifetime — the same restart cost class as the planner
    # seed). Exactness: blooms have no false negatives, and over-approximation
    # after a rolled-back round only causes spurious exact checks, never a
    # wrong split. At the 10^10 design point the per-part bitmaps live next
    # to the Iceberg partitions like the frontier's (bloom.py design note).
    _PAGES_BLOOM_FPR = 1e-6  # E[false positives]/round = k·fpr ≪ 1 ⇒ most
    # rounds skip the exact check entirely
    _PAGES_SPLIT_IN_LIMIT = 10_000  # positives collected for IN-pushdown up
    # to this; beyond it (mass refetch) the broadcast semi-join path runs

    def _pages_part(self):
        return F.pmod(F.xxhash64("url_id"), F.lit(self.cfg.partitions)).cast(
            "int"
        ).alias("part")

    def _pages_seen_bloom(self, round_no: int):
        """Lazy pages-seen filter: empty on a fresh crawl, rebuilt from the
        committed pages history on resume (one distinct id scan per process,
        NOT per round)."""
        from .bloom import PartitionedBloom

        if self._pages_bloom is None:
            self._pages_bloom_capacity = max(
                4096, (self._fr_count // self.cfg.partitions + 1) * 4
            )
            hist = self.wh.read_deltas("pages", upto_round=round_no - 1)
            if hist is None:
                self._pages_bloom = PartitionedBloom({}, self._pages_bloom_capacity)
            else:
                self._pages_bloom = PartitionedBloom.build(
                    hist.select("url_id").distinct().select("url_id", self._pages_part()),
                    fpr=self._PAGES_BLOOM_FPR,
                    expected_per_part=self._pages_bloom_capacity,
                )
        return self._pages_bloom

    def _pages_split(self, round_no: int) -> int:
        """UPDATED_PAGES count for this round's saved pages; folds the
        first-time ids into the pages-seen bloom.

        The whole probe+fold runs DRIVER-side over ONE k-bounded collect
        (url_id + JVM xxhash64 pair + derived part, Arrow toPandas): the
        fresh side is ≤ the round budget by construction, so a 4 MB collect
        plus vectorized numpy beats launching pandas-UDF probe + shuffle
        fold jobs per round (measured 10× on the 25k-row bench; the
        distributed probe path in bloom.py remains the tool for UNBOUNDED
        probe sides like the frontier candidate stream). O(k) per round,
        independent of crawl history."""
        import numpy as np

        from .bloom import _h1h2

        h1, h2 = _h1h2(F.col("url_id"))
        pdf = (
            self.wh.read_delta("pages", round_no)
            .select("url_id", self._pages_part(), h1.alias("h1"), h2.alias("h2"))
            .toPandas()
        )
        bloom = self._pages_seen_bloom(round_no)
        parts = pdf["part"].to_numpy()
        a = pdf["h1"].to_numpy()
        b = pdf["h2"].to_numpy()
        hit = (
            bloom.probe_local(parts, a, b)
            if bloom.filters
            else np.zeros(len(pdf), dtype=bool)
        )
        seen: set[str] = set()
        if hit.any():
            # exact check ONLY the bloom positives (no false negatives ⇒
            # every true update is in `pos`); small sets push down as an
            # IN-literal on the id-column scan, the rare mass-update
            # (refetch) case broadcast-semi-joins instead
            pos = pdf.loc[hit, "url_id"].tolist()
            hist = self.wh.read_deltas("pages", upto_round=round_no - 1)
            ids = hist.select("url_id")
            if len(pos) <= self._PAGES_SPLIT_IN_LIMIT:
                matched = ids.where(F.col("url_id").isin(pos)).distinct()
            else:
                pos_df = self.spark.createDataFrame(
                    [(u,) for u in pos], "url_id string"
                )
                matched = ids.join(F.broadcast(pos_df), "url_id", "left_semi").distinct()
            seen = {r["url_id"] for r in matched.collect()}
        new_mask = (
            ~pdf["url_id"].isin(seen).to_numpy()
            if seen
            else np.ones(len(pdf), dtype=bool)
        )
        self._pages_bloom = bloom.add_local(
            parts[new_mask], a[new_mask], b[new_mask], fpr=self._PAGES_BLOOM_FPR
        )
        return len(seen)

    def _append_metrics(self, round_no: int, stats: RoundStats) -> None:
        import pyarrow as pa

        items = sorted(stats.counters.items())
        self.wh.append_delta_rows(
            "metrics",
            round_no,
            pa.table(
                {
                    "round": pa.array([round_no] * len(items), pa.int32()),
                    "counter": pa.array([k for k, _ in items], pa.string()),
                    "value": pa.array([int(v) for _, v in items], pa.int64()),
                }
            ),
        )

    # -- loop -------------------------------------------------------------------
    def run(
        self, max_rounds: int | None = None, refetch: bool = False, verbose: bool = False
    ) -> list[RoundStats]:
        start = self.bootstrap()
        if self.warmup_codegen and not self._warmed and (
            not self._warmup_auto or self._fr_count >= _WARMUP_MIN_FRONTIER
        ):
            self.warmup()
        if refetch and start > 0:
            # C4 refetch-all reset (dormant in the reference: URLStore.java:60-68
            # hardcodes refetch=false — `UPDATE links SET status = 0`)
            fr = self.wh.read_frontier(start).withColumn(
                "status", F.lit(FR.QUEUED).cast("tinyint")
            )
            self.wh.write_snapshot("frontier", start, fr)
        limit = max_rounds if max_rounds is not None else self.cfg.max_rounds
        rnd = start
        rounds_without_new_pages = 0
        t_start = time.time()
        while limit is None or rnd - start < limit:
            rnd += 1
            _t_round = time.time()
            _ph_before = dict(self.phase_times)
            stats = self.run_round(rnd)
            stats.wall_seconds = time.time() - _t_round
            stats.phase_seconds = {
                k: round(v - _ph_before.get(k, 0.0), 3)
                for k, v in self.phase_times.items()
                if v - _ph_before.get(k, 0.0) > 0.0005
            }
            self.history.append(stats)
            if verbose:
                # C8 stats printer analog (DumbCrawler.java:196-231): one
                # structured line per round instead of a 60s wall-clock timer,
                # carrying the reference's uptime + JVM heap readings
                import json as _json

                rt = self.spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
                print(_json.dumps({
                    "round": rnd,
                    "dequeued": stats.dequeued,
                    **stats.counters,
                    "uptime_s": round(time.time() - t_start, 1),
                    "jvm_used_mb": int((rt.totalMemory() - rt.freeMemory()) / 1048576),
                    "jvm_max_mb": int(rt.maxMemory() / 1048576),
                }))
            if stats.dequeued == 0:  # C6 empty-frontier stop
                self.wh.write_terminated({"round": rnd, "reason": "frontier_empty"})
                break
            if stats.counters.get("NEW_SAVED_PAGES", 0) == 0:
                rounds_without_new_pages += 1
            else:
                rounds_without_new_pages = 0
            # C5 task-killer analog (rounds replace wall-clock per D3)
            if self.cfg.max_rounds is None and rounds_without_new_pages >= 1000:
                self.wh.write_terminated({"round": rnd, "reason": "task_killer"})
                break
        return self.history

    # -- inspection helpers (S13 WarcViewer analog: ad-hoc queries on pages) ----
    def pages(self) -> DataFrame | None:
        return self.wh.read_deltas("pages")

    def dequeue_order(self) -> DataFrame | None:
        return self.wh.read_deltas("dequeue_order")

    def metrics_total(self) -> dict[str, int]:
        m = self.wh.read_deltas("metrics")
        if m is None:
            return {}
        return {r["counter"]: r["total"] for r in m.groupBy("counter").agg(F.sum("value").alias("total")).collect()}
