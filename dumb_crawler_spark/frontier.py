"""The frontier: priority queue + exact URL-seen set + crawl state
(SURVEY.md §2.1 S2-S4, §2.5 J1-J3, §2.6 A1/A2, §2.8 C2-C4).

The reference realizes all three roles in one SQLite table ``links``
(URLStore.java:82-97). Here the frontier is a DataFrame with explicit
partition column ``part`` (salted murmur3 host bucket — urlkit.part_of), and
every mutation is a declarative plan:

- insert        = left-anti join + union          (URLStore.java:127-147)
- dequeue       = window rank / ordered limit     (URLStore.java:185-208)
- state change  = left join + conditional select  (URLStore.java:159-183)

Scale notes (10^10 rows, 1000 executors):
- Every operation here keys on ``url_id`` or groups by ``host``; both are
  functionally dependent on ``part``, so with the frontier stored as an
  Iceberg table bucketed by ``part`` these shuffles become storage-partitioned
  joins (SPJ) / partition-local windows — no full-table shuffle. Locally,
  AQE handles sizing.
- The anti-join (J3) is the hot spot: the bloom prefilter (bloom.py) prunes
  candidate links that are definitely-unseen BEFORE the shuffle, so only
  bloom-positives (≈ duplicates + fpr) reach the exact join.
- The dequeue top-K never sorts the whole frontier: with a politeness budget
  it is a per-host window (partition-local after the part bucketing); the
  global-K variant compiles to TakeOrderedAndProject (per-partition heap
  top-K, then a K-row merge on the driver) — not a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .config import CrawlConfig
from .filters import can_attempt, is_http, is_url_allowed, tag_filter_verdict
from .tagging import priority_for_tags, tag_urls, with_seed_tag
from .urlkit import (
    canonicalize,
    host_of,
    part_of,
    url_id,
    url_parts,
    with_canonical_url,
    with_url_parts,
)

# Status codes, verbatim from URLStore.java:17-22
QUEUED, PROCESSING, PROCESSED, FAILED = 0, 1, 2, 3

FRONTIER_SCHEMA = T.StructType([
    T.StructField("url_id", T.StringType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("host", T.StringType(), True),
    T.StructField("tags", T.ArrayType(T.StringType()), False),
    T.StructField("status", T.ByteType(), False),
    T.StructField("priority", T.IntegerType(), False),
    T.StructField("attempt", T.IntegerType(), False),
    T.StructField("depth", T.IntegerType(), False),
    T.StructField("created_round", T.IntegerType(), False),
    T.StructField("taken_round", T.IntegerType(), True),
    T.StructField("completed_round", T.IntegerType(), True),
    T.StructField("error", T.StringType(), True),
    T.StructField("part", T.IntegerType(), False),
])


def empty_frontier(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], FRONTIER_SCHEMA)


def make_candidates(urls: DataFrame, cfg: CrawlConfig, *, seeds: bool = False) -> DataFrame:
    """§3.2 link-ingest pipeline: url → canonicalize (U9) → parts (U1) →
    tags (T1) → priority (T2, from expression tags only) → url_id (U2) →
    host/part. One narrow select chain — single stage, zero shuffle.

    ``seeds=True`` prepends the 'seed' extra tag AFTER scoring
    (DumbCrawler.java:292-300) and marks depth 0.
    """
    df = with_canonical_url(urls.select("url"), "url", "url")
    df = with_url_parts(df, "url", out="_parts", host_out="host")
    df = df.withColumn("tags", tag_urls(F.col("_parts"), cfg))
    df = df.withColumn("priority", priority_for_tags(F.col("tags"), cfg))
    if seeds:
        df = df.withColumn("tags", with_seed_tag(F.col("tags")))
    df = df.withColumn("url_id", url_id(F.col("url"), cfg.id_extractor_pattern))
    df = df.withColumn("part", part_of(F.col("host"), F.col("url_id"), cfg.partitions, cfg.salt))
    return df.drop("_parts").select("url", "tags", "priority", "url_id", "host", "part")


def filter_allowed(candidates: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """F2 LinkFilter gate with verdict column kept for counters
    (LinkFilter.java:24-44). Seeds bypass this (reference initialize() calls
    addTasks directly, DumbCrawler.java:61-67,143-146)."""
    return candidates.withColumn("_verdict", tag_filter_verdict(F.col("tags"), cfg)).where(
        is_url_allowed(F.col("url"), F.col("tags"), cfg)
    ).drop("_verdict")


def dedupe_in_batch(candidates: DataFrame) -> DataFrame:
    """J1+J2 in-batch dedup by url_id.

    The reference's "last wins" toMap merge (URLStore.java:134) iterates a
    HashSet — nondeterministic; per SURVEY.md §2.8-D1 the deterministic spec
    keeps (max priority, then min url) per url_id. Window + rank=1, shuffle
    keyed like every other frontier op.
    """
    w = Window.partitionBy("url_id").orderBy(F.desc("priority"), F.asc("url"))
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_new_links(
    frontier: DataFrame,
    candidates: DataFrame,
    cfg: CrawlConfig,
    round_no: int,
    depth: int,
    bloom=None,
) -> DataFrame:
    """S4+J3: insert candidates not already in the seen-set.

    candidates must already be tagged/scored (make_candidates) and F2-filtered
    for non-seed links (filter_allowed). The F1 protocol filter is re-applied
    here because URLStore does its own (URLStore.java:102-111).

    Equivalent Iceberg DDL at scale:
        MERGE INTO frontier t USING cands s ON t.url_id = s.url_id
        WHEN NOT MATCHED THEN INSERT (…status 0, attempt 0…)
    Locally: left-anti join + union. Both sides are bucketed by part/url_id,
    so the join is co-partitioned at scale (SPJ).
    """
    return frontier.unionByName(
        new_link_rows(frontier.select("url_id"), candidates, round_no, depth, bloom=bloom)
    )


def new_link_rows(
    seen_ids: DataFrame, candidates: DataFrame, round_no: int, depth: int, bloom=None
) -> DataFrame:
    """The not-yet-seen candidate rows in frontier schema (the MERGE's
    WHEN NOT MATCHED INSERT set). ``seen_ids`` needs only a url_id column —
    the MoR ins-delta path passes base∪inserts ids (storage.py
    read_frontier_seen_ids), a column-pruned scan."""
    cands = dedupe_in_batch(candidates.where(is_http(F.col("url"))))
    if bloom is not None:
        # J3-NR: bloom prefilter — definitely-unseen candidates skip the
        # shuffle; only bloom-positives hit the exact anti-join (bloom.py)
        from .bloom import prefiltered_new_rows

        new_src = prefiltered_new_rows(cands, seen_ids, bloom)
    else:
        new_src = cands.join(seen_ids.select("url_id"), "url_id", "left_anti")
    return new_src.select(
        "url_id",
        "url",
        "host",
        "tags",
        F.lit(QUEUED).cast("tinyint").alias("status"),
        F.col("priority").cast("int"),
        F.lit(0).alias("attempt"),
        F.lit(depth).alias("depth"),
        F.lit(round_no).alias("created_round"),
        F.lit(None).cast("int").alias("taken_round"),
        F.lit(None).cast("int").alias("completed_round"),
        F.lit(None).cast("string").alias("error"),
        "part",
    )


def dequeue(
    frontier: DataFrame,
    cfg: CrawlConfig,
    k: int | None,
    host_budgets: DataFrame | None = None,
) -> DataFrame:
    """A1: priority-ordered top-K of QUEUED rows (URLStore.java:185-190).

    Total order per SURVEY.md §2.8-D2: (priority DESC, attempt ASC, url_id ASC)
    — SQLite's ORDER BY priority DESC, attempt_count leaves ties unordered;
    this totalizes it and the oracle uses the same rule.

    With a politeness budget the ranking is per-host (north rule): a window
    PARTITION BY host caps each host's rows per round; the cross-host result
    is then globally ordered by the same rule. Without a budget and with k
    set, this is exactly the reference's global top-K.
    """
    return topk_from_eligible(eligible_capped(frontier, cfg, host_budgets), k)


DEQUEUE_COLS = ["url_id", "url", "host", "tags", "priority", "attempt", "depth", "part"]


def eligible_capped(
    frontier: DataFrame, cfg: CrawlConfig, host_budgets: DataFrame | None = None
) -> DataFrame:
    """Stage 1 of A1: QUEUED ∧ attempt<max ∧ per-host politeness cap, column-
    pruned to the dequeue columns (the crawler splits these steps so the raw
    eligible set is cached once and the cap reads the cache)."""
    raw = eligible_raw(frontier, cfg)
    over = over_budget_hosts(raw, cfg, host_budgets)
    return apply_host_cap(raw, cfg, over, host_budgets)


def eligible_raw(frontier: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """QUEUED ∧ attempt<max, pruned to dequeue columns. The crawler
    materializes THIS into the executor cache once per round (the hot
    working set — at 10^10 rows × ~300 B that is ~3 GB/executor on 1000
    executors), so the over-budget probe, the top-K histogram and the
    dequeue itself never re-scan the frontier or rebuild the queued-view
    broadcast."""
    return frontier.where(
        (F.col("status") == QUEUED) & can_attempt(F.col("attempt"), cfg)
    ).select(*DEQUEUE_COLS)


def _host_cap_expr(cfg: CrawlConfig, host_budgets: DataFrame | None) -> Column:
    budget = cfg.politeness.budget_per_host_per_round
    if host_budgets is None:
        return F.lit(budget)
    cap = F.coalesce(F.col("host_budget"), F.lit(budget if budget is not None else 2**31 - 1))
    return F.least(cap, F.lit(budget)) if budget is not None else cap


def over_budget_hosts(
    eligible: DataFrame, cfg: CrawlConfig, host_budgets: DataFrame | None = None
) -> list[str] | None:
    """Hosts exceeding their politeness cap — small BY CONSTRUCTION (the
    budget exists to throttle the few hot hosts), so one collect of the
    violators replaces per-row join machinery. Returns None when the list
    is too large to in-line (degenerate config: budget ≪ typical host size)
    — callers then fall back to the broadcast-join path (_cap_per_host)."""
    budget = cfg.politeness.budget_per_host_per_round
    if budget is None and host_budgets is None:
        return []
    counts = eligible.groupBy("host").agg(F.count(F.lit(1)).alias("_n"))
    if host_budgets is not None:
        counts = counts.join(F.broadcast(host_budgets), "host", "left")
    over = counts.where(F.col("_n") > _host_cap_expr(cfg, host_budgets)).select("host")
    rows = over.limit(10_001).collect()
    if len(rows) > 10_000:
        return None
    return [r["host"] for r in rows]


def apply_host_cap(
    eligible: DataFrame,
    cfg: CrawlConfig,
    over_hosts: list[str] | None,
    host_budgets: DataFrame | None = None,
) -> DataFrame:
    """Politeness budget: rank-cap ONLY the over-budget hosts; everyone else
    passes wholesale with zero shuffle (see over_budget_hosts). NULL hosts
    (can't occur for F1-filtered http URLs) pass uncapped."""
    budget = cfg.politeness.budget_per_host_per_round
    if budget is None and host_budgets is None:
        return eligible
    if over_hosts is None:
        # too many violators to inline — broadcast-join form
        if host_budgets is not None:
            joined = eligible.join(F.broadcast(host_budgets), "host", "left")
            return _cap_per_host(joined, _host_cap_expr(cfg, host_budgets)).drop("host_budget")
        return _cap_per_host(eligible, F.lit(budget))
    if not over_hosts:
        return eligible
    in_over = F.col("host").isin(over_hosts)
    under = eligible.where(~in_over | F.col("host").isNull())
    over = eligible.where(in_over)
    if host_budgets is not None:
        over = over.join(F.broadcast(host_budgets), "host", "left")
    w = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.asc("attempt"), F.asc("url_id")
    )
    over = (
        over.withColumn("_hr", F.row_number().over(w))
        .where(F.col("_hr") <= _host_cap_expr(cfg, host_budgets))
        .drop("_hr")
    )
    if host_budgets is not None:
        over = over.drop("host_budget")
    return under.unionByName(over)


def topk_from_eligible(eligible: DataFrame, k: int | None) -> DataFrame:
    """Stage 2 of A1: exact global top-K in D2 order over the capped set."""
    return topk_with_offsets(eligible, k)[0]


def topk_with_offsets(
    eligible: DataFrame, k: int | None, hist: list[tuple] | None = None, prefix_len: int = 3
) -> tuple[DataFrame, list[tuple] | None, int | None]:
    """topk_from_eligible + (threshold path only) the walk's bucket-offset
    table (priority, attempt, url_id-prefix, global D2 offset) and the EXACT
    planned row count. dequeue_order_index reuses the offsets instead of
    re-collecting its own histogram, and the crawler uses the count instead
    of launching a count job over the dequeued batch (two driver round-trips
    per round saved). ``hist`` lets the caller hand in a pre-collected
    (priority, attempt, prefix, count) histogram (plan_dequeue's fused
    probe) so the threshold path launches ZERO extra aggregation jobs."""
    if k is None:
        return eligible.select(*DEQUEUE_COLS), None, None
    if k <= _TOPK_THRESHOLD_CUTOFF:
        # TakeOrderedAndProject: per-partition heap top-k, k-row driver merge
        out = eligible.orderBy(F.desc("priority"), F.asc("attempt"), F.asc("url_id"))
        return out.limit(k).select(*DEQUEUE_COLS), None, None
    df, offsets, taken = _dequeue_threshold_ex(eligible, k, prefix_len, hist=hist)
    return df.select(*DEQUEUE_COLS), offsets, taken


# driver-memory bound on the fused probe's collect: class histogram
# (classes × 16^prefix_len) + over-budget hosts (≤ _OVER_HOST_INLINE_MAX);
# hitting the limit falls back to the legacy two-job path.
_PLAN_COLLECT_LIMIT = 500_000
_OVER_HOST_INLINE_MAX = 10_000


def plan_dequeue(
    eligible: DataFrame,
    cfg: CrawlConfig,
    k: int | None,
    host_budgets: DataFrame | None = None,
    prefix_len: int = 3,
) -> tuple[DataFrame, list[tuple] | None, int | None]:
    """A1 round planner: ONE grouping-sets aggregation over the (cached)
    eligible set yields BOTH driver-side inputs the round needs — the
    over-budget host list (politeness probe) and the (priority, attempt,
    url_id-prefix) class histogram (large-k threshold walk). The legacy path
    ran these as two separate full passes; at 10^10 rows each pass is a full
    frontier scan, and per-round driver round-trips are exactly the serial
    fraction that caps N→4N scaling (BENCH.md).

    Exactness with a binding cap: the raw histogram counts rows the per-host
    cap will remove, so a second SMALL job aggregates the beyond-cap rows of
    just the over-budget hosts (the skewed few) and the driver subtracts —
    capped_hist = raw_hist − beyond_hist. No full-eligible second pass ever.

    Returns (dq plan, bucket-offset table | None, exact planned row count |
    None) — see topk_with_offsets.
    """
    budget = cfg.politeness.budget_per_host_per_round
    need_hosts = budget is not None or host_budgets is not None
    need_hist = k is not None and k > _TOPK_THRESHOLD_CUTOFF
    if not need_hosts:
        return topk_with_offsets(eligible, k, prefix_len=prefix_len)

    pre = F.substring("url_id", 1, prefix_len)
    proj = eligible.select("host", "priority", "attempt", pre.alias("_p"))
    if need_hist:
        # grouping_id: 7 = host slice (priority/attempt/_p aggregated away),
        # 8 = class slice (host aggregated away) — probed constants, pinned
        # by test_dequeue_threshold.
        agg = proj.groupingSets(
            [["host"], ["priority", "attempt", "_p"]], "host", "priority", "attempt", "_p"
        ).agg(F.count(F.lit(1)).alias("_n"), F.grouping_id().alias("_gid"))
        host_slice = F.col("_gid") == 7
    else:
        agg = proj.groupBy("host").agg(F.count(F.lit(1)).alias("_n"))
        agg = agg.withColumn("_gid", F.lit(7))
        host_slice = F.lit(True)
    if host_budgets is not None:
        agg = agg.join(F.broadcast(host_budgets), "host", "left")
    # host rows are pre-filtered to the over-budget few BEFORE collect —
    # same bail-out contract as over_budget_hosts
    agg = agg.where(~host_slice | (F.col("_n") > _host_cap_expr(cfg, host_budgets)))
    rows = agg.limit(_PLAN_COLLECT_LIMIT).collect()

    over_rows = [r for r in rows if r["_gid"] == 7]
    hist = [(r["priority"], r["attempt"], r["_p"], r["_n"]) for r in rows if r["_gid"] == 8]
    if len(rows) >= _PLAN_COLLECT_LIMIT or len(over_rows) > _OVER_HOST_INLINE_MAX:
        # degenerate config (budget ≪ typical host size): broadcast-join cap
        # for every host, threshold walk collects its own capped histogram
        capped = apply_host_cap(eligible, cfg, None, host_budgets)
        return topk_with_offsets(capped, k, prefix_len=prefix_len)
    over_hosts = [r["host"] for r in over_rows]
    if not over_hosts:
        return topk_with_offsets(
            eligible, k, hist=hist if need_hist else None, prefix_len=prefix_len
        )
    capped, beyond = host_cap_split(eligible, cfg, over_hosts, host_budgets)
    if not need_hist:
        return topk_with_offsets(capped, k, prefix_len=prefix_len)
    removed = beyond.groupBy("priority", "attempt", pre.alias("_p")).count().collect()
    cells = {(p, a, pfx): n for p, a, pfx, n in hist}
    for r in removed:
        key = (r["priority"], r["attempt"], r["_p"])
        cells[key] -= r["count"]
        assert cells[key] >= 0, f"capped histogram underflow at {key}"
    capped_hist = [(p, a, pfx, n) for (p, a, pfx), n in cells.items() if n > 0]
    return topk_with_offsets(capped, k, hist=capped_hist, prefix_len=prefix_len)


def host_cap_split(
    eligible: DataFrame,
    cfg: CrawlConfig,
    over_hosts: list[str],
    host_budgets: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(capped, beyond): rank the over-budget hosts' rows once; ``capped`` is
    the politeness-capped eligible set (under-budget hosts pass wholesale,
    zero shuffle of their rows), ``beyond`` the rows the cap removed (the
    planner's histogram correction). Same semantics as apply_host_cap —
    equivalence pinned by tests."""
    in_over = F.col("host").isin(over_hosts)
    under = eligible.where(~in_over | F.col("host").isNull())
    over = eligible.where(in_over)
    if host_budgets is not None:
        over = over.join(F.broadcast(host_budgets), "host", "left")
    w = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.asc("attempt"), F.asc("url_id")
    )
    ranked = over.withColumn("_hr", F.row_number().over(w))
    cap = _host_cap_expr(cfg, host_budgets)
    drop_cols = ["_hr"] + (["host_budget"] if host_budgets is not None else [])
    kept = ranked.where(F.col("_hr") <= cap).drop(*drop_cols)
    beyond = ranked.where(F.col("_hr") > cap).drop(*drop_cols)
    return under.unionByName(kept), beyond


def _cap_per_host(eligible: DataFrame, cap: Column) -> DataFrame:
    """Politeness budget: top-``cap`` rows per host in D2 order.

    Naive form is a row_number window PARTITION BY host — a full-row shuffle
    + sort of every eligible row every round. But almost every host is UNDER
    its budget (the budget exists to throttle the few hot hosts), so: count
    rows per host (map-side partial agg, tiny byte volume), broadcast the
    over-budget host list, pass under-budget hosts wholesale (scan-only,
    zero shuffle of their rows), and run the ranking window ONLY on the
    over-budget subset. Skew-defusing for the window itself comes free: the
    subset is exactly the skewed hosts, already isolated. ``cap`` must be an
    expression over columns available on ``eligible`` (or a literal).
    NULL hosts (can't occur for F1-filtered http URLs) pass uncapped — null
    join keys never match the over-host list."""
    per_host = eligible.groupBy("host").agg(F.count(F.lit(1)).alias("_n"))
    over_hosts = F.broadcast(
        eligible.select("host", cap.alias("_cap")).distinct()
        .join(per_host, "host")
        .where(F.col("_n") > F.col("_cap"))
        .select("host")
    )
    under = eligible.join(over_hosts, "host", "left_anti")
    w = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.asc("attempt"), F.asc("url_id")
    )
    over = (
        eligible.join(over_hosts, "host", "left_semi")
        .withColumn("_hr", F.row_number().over(w))
        .where(F.col("_hr") <= cap)
        .drop("_hr")
    )
    return under.unionByName(over)


# Above this k, TakeOrderedAndProject's single-task merge of
# (numPartitions × k) rows becomes the serial bottleneck; switch to the
# histogram-threshold plan (same exact D2 semantics, measured in BENCH.md).
_TOPK_THRESHOLD_CUTOFF = 10_000


def _dequeue_threshold(eligible: DataFrame, k: int, prefix_len: int = 3) -> DataFrame:
    return _dequeue_threshold_ex(eligible, k, prefix_len)[0]


def _dequeue_threshold_ex(
    eligible: DataFrame, k: int, prefix_len: int = 3, hist: list[tuple] | None = None
) -> tuple[DataFrame, list[tuple], int]:
    """Exact large-k top-K without a global sort — ONE histogram pass.

    Priorities are small ints (tag scores), so the joint
    (priority, attempt, url_id-prefix) histogram is tiny (classes × 16^len
    for hex ids): collect it once (or take it pre-collected via ``hist``),
    walk it in D2 order until the cumulative count reaches k. Whole classes
    above the boundary are taken wholesale; within the single boundary class
    whole PREFIX buckets below the cut are taken (prefix truncation preserves
    lexicographic order, and buckets are consumed ascending — so the filter
    is a RANGE comparison ``prefix < cut``, one string compare per row, never
    a giant INSET); only the boundary bucket itself is topped-off with a
    small TakeOrdered. At 10^10 rows this replaces a k×P-row single-task
    merge with one aggregation + one cheap filter, and the degenerate
    uniform-priority frontier (boundary class = everything) costs the same
    as the easy case.

    Also returns the walk's bucket-offset table [(priority, attempt, prefix,
    global_offset)] — every bucket the dequeue touches, in D2 order. Within
    any bucket the taken rows are exactly the smallest url_ids (whole bucket,
    or the TakeOrdered/recursive edge), so (offset + within-bucket url_id
    rank) IS the contiguous global D2 rank: dequeue_order_index consumes
    these offsets with no second histogram job.
    """
    pre = F.substring("url_id", 1, prefix_len)
    if hist is None:
        hist = [
            (r["priority"], r["attempt"], r["_p"], r["count"])
            for r in eligible.groupBy("priority", "attempt", pre.alias("_p")).count().collect()
        ]
    classes: dict[tuple, list] = {}
    for p, a, pfx, n in hist:
        classes.setdefault((p, a), []).append((pfx, n))
    offsets: list[tuple] = []  # (priority, attempt, prefix, global D2 offset)
    acc = 0
    taken_classes, boundary, remaining = [], None, k
    for cls_key in sorted(classes, key=lambda c: (-c[0], c[1])):
        n = sum(c for _, c in classes[cls_key])
        if n <= remaining:
            taken_classes.append(cls_key)
            for pfx, cn in sorted(classes[cls_key]):
                offsets.append((cls_key[0], cls_key[1], pfx, acc))
                acc += cn
            remaining -= n
            if remaining == 0:
                break
        else:
            boundary = cls_key
            break
    whole: Column = F.lit(False)
    for p, a in taken_classes:
        whole = whole | ((F.col("priority") == p) & (F.col("attempt") == a))
    out = eligible.where(whole)
    if boundary is not None and remaining > 0:
        p, a = boundary
        cls = eligible.where((F.col("priority") == p) & (F.col("attempt") == a))
        cut_prefix = None
        for prefix, n in sorted(classes[boundary]):
            if n <= remaining:
                offsets.append((p, a, prefix, acc))
                acc += n
                remaining -= n
                cut_prefix = prefix  # whole buckets ≤ cut taken via range filter
                if remaining == 0:
                    break
            else:
                # partial boundary bucket: range-take everything below it,
                # TakeOrdered the remainder inside it (the remainder = the
                # bucket's `remaining` SMALLEST url_ids, so the parent-level
                # bucket offset stays rank-exact)
                offsets.append((p, a, prefix, acc))
                acc += remaining
                edge = (
                    cls.where(pre == prefix).orderBy(F.asc("url_id")).limit(remaining)
                    if remaining <= _TOPK_THRESHOLD_CUTOFF
                    else _dequeue_threshold(
                        cls.where(pre == prefix), remaining, prefix_len + 2
                    )
                )
                out = out.unionByName(edge)
                remaining = 0
                if cut_prefix is None:
                    return out, offsets, k
                break
        out = out.unionByName(cls.where(pre <= cut_prefix)) if cut_prefix else out
    # k - remaining = EXACT rows the plan selects (remaining > 0 only when
    # the eligible set ran dry below k)
    return out, offsets, k - remaining


def dequeue_order_index(
    dq: DataFrame,
    round_no: int,
    prefix_len: int = 2,
    offsets: list[tuple] | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(round, seq, url_id) lineage rows: seq = contiguous 0-based global
    rank of the dequeued batch in D2 order (priority DESC, attempt ASC,
    url_id ASC) — golden-comparable against the oracle's enumerate().

    Distributed contiguous ranking without a global sort, a single-partition
    window, or an RDD zipWithIndex (which round-trips every row through
    Python): bucket rows by (priority, attempt, url_id-prefix) — prefix
    truncation preserves lexicographic order, so concatenating buckets in
    D2-bucket order IS the global order. Each bucket's global offset comes
    either from the large-k threshold walk (``offsets``, zero extra jobs —
    ``prefix_len`` must then match the walk's) or from one tiny
    groupBy().count() collect; a per-bucket row_number window (parallel
    across buckets, k-row shuffle at most) finishes the rank.
    All JVM/codegen — zero Python in the loop.

    ``keep_cols`` carries extra dq columns (e.g. ``host``) into the lineage
    rows — the threshold path writes this index as the round's dq-cache
    materialization BARRIER and re-reads the tiny delta for the planner's
    per-host decrement, so the host must ride along (crawler.run_round)."""
    pre = F.substring("url_id", 1, prefix_len)
    b = dq.select("priority", "attempt", pre.alias("_pre"), "url_id", *keep_cols)
    if offsets is None:
        counts = b.groupBy("priority", "attempt", "_pre").count().collect()
        counts.sort(key=lambda r: (-r["priority"], r["attempt"], r["_pre"]))
        offsets, acc = [], 0
        for r in counts:
            offsets.append((r["priority"], r["attempt"], r["_pre"], acc))
            acc += r["count"]
    odf = F.broadcast(
        b.sparkSession.createDataFrame(
            offsets, "priority int, attempt int, _pre string, _off long"
        )
    )
    w = Window.partitionBy("priority", "attempt", "_pre").orderBy("url_id")
    return (
        b.join(odf, ["priority", "attempt", "_pre"])
        .withColumn("seq", F.col("_off") + F.row_number().over(w) - 1)
        .select(F.lit(round_no).alias("round"), "seq", "url_id", *keep_cols)
    )


def retag_dequeued(dequeued: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """T4: re-tag + re-filter at dequeue (DumbCrawler.java:276-279) — stored
    tags may be stale vs current config. Fresh tags REPLACE stored ones (so a
    seed's extra 'seed' tag is dropped here, exactly like the reference, which
    re-tags from the bare url). Returns all rows with fresh tags + '_allowed'
    flag; caller diverts disallowed rows (they stay PROCESSING — the reference
    leaks them the same way: filtered tasks were already marked taken and are
    never completed, DumbCrawler.java:275-279 + URLStore.java:191-206)."""
    fresh = with_url_parts(dequeued, "url", out="_parts")
    fresh = fresh.withColumn("tags", tag_urls(F.col("_parts"), cfg)).drop("_parts")
    return fresh.withColumn("_allowed", is_url_allowed(F.col("url"), F.col("tags"), cfg))


def mark_taken(frontier: DataFrame, dequeued: DataFrame, round_no: int) -> DataFrame:
    """status QUEUED→PROCESSING + taken_round (URLStore.java:191-206).
    Iceberg: MERGE … WHEN MATCHED UPDATE; locally left join + conditional."""
    # broadcast the k-bounded update side — the frontier (10^10 rows) must
    # never shuffle for a status flip
    taken = F.broadcast(dequeued.select("url_id", F.lit(True).alias("_taken")))
    return (
        frontier.join(taken, "url_id", "left")
        .withColumn(
            "status",
            F.when(F.col("_taken"), F.lit(PROCESSING).cast("tinyint")).otherwise(F.col("status")),
        )
        .withColumn(
            "taken_round",
            F.when(F.col("_taken"), F.lit(round_no)).otherwise(F.col("taken_round")),
        )
        .drop("_taken")
    )


def mark_completed(frontier: DataFrame, results: DataFrame, cfg: CrawlConfig, round_no: int) -> DataFrame:
    """C3: completion MERGE (URLStore.java:159-183).

    ``results`` needs columns: url_id, tags (fresh, written back like the
    reference's markProcessed), ok (bool), error (null when ok).
    Semantics: status → PROCESSED(2) | FAILED(3); FAILED is terminal —
    CrawlingException.shouldRetry is never used to requeue
    (CrawlingException.java:11, SURVEY.md §2.8-C3). attempt += 1 always.
    """
    upd = F.broadcast(  # k-bounded update side; frontier stays un-shuffled
        results.select(
            "url_id",
            F.col("tags").alias("_new_tags"),
            F.when(F.col("ok"), F.lit(PROCESSED)).otherwise(F.lit(FAILED)).cast("tinyint").alias("_new_status"),
            F.col("error").alias("_new_error"),
        )
    )
    out = (
        frontier.join(upd, "url_id", "left")
        .withColumn("status", F.coalesce(F.col("_new_status"), F.col("status")))
        .withColumn("tags", F.when(F.col("_new_status").isNotNull(), F.col("_new_tags")).otherwise(F.col("tags")))
        .withColumn("error", F.when(F.col("_new_status").isNotNull(), F.col("_new_error")).otherwise(F.col("error")))
        .withColumn(
            "attempt",
            F.when(F.col("_new_status").isNotNull(), F.col("attempt") + 1).otherwise(F.col("attempt")),
        )
        .withColumn(
            "completed_round",
            F.when(F.col("_new_status").isNotNull(), F.lit(round_no)).otherwise(F.col("completed_round")),
        )
        .drop("_new_tags", "_new_status", "_new_error")
    )
    return out


def apply_round_updates(
    frontier: DataFrame, dequeued: DataFrame, results: DataFrame, cfg: CrawlConfig, round_no: int
) -> DataFrame:
    """mark_taken + mark_completed fused into ONE frontier join (one broadcast
    of the k-bounded update side instead of two full-frontier passes).

    Exact same semantics: every dequeued row → PROCESSING + taken_round;
    rows with a result → PROCESSED/FAILED + fresh tags + error + attempt+1 +
    completed_round; dequeued-but-filtered rows stay PROCESSING (the
    reference's leak, URLStore.java:191-206 + DumbCrawler.java:275-279).
    Equivalence to the two-step path is pinned in tests.
    """
    upd = F.broadcast(
        dequeued.select("url_id")
        .join(
            results.select(
                "url_id", F.col("tags").alias("_nt"), "ok", F.col("error").alias("_ne")
            ),
            "url_id",
            "left",
        )
        .select(
            "url_id",
            F.when(F.col("ok").isNull(), F.lit(PROCESSING))
            .when(F.col("ok"), F.lit(PROCESSED))
            .otherwise(F.lit(FAILED))
            .cast("tinyint")
            .alias("_ns"),
            "_nt",
            "_ne",
            F.col("ok").isNotNull().alias("_done"),
        )
    )
    j = frontier.join(upd, "url_id", "left")
    touched = F.col("_ns").isNotNull()
    done = F.coalesce(F.col("_done"), F.lit(False))
    return (
        j.withColumn("status", F.coalesce(F.col("_ns"), F.col("status")))
        .withColumn("taken_round", F.when(touched, F.lit(round_no)).otherwise(F.col("taken_round")))
        .withColumn("tags", F.when(done, F.col("_nt")).otherwise(F.col("tags")))
        .withColumn("error", F.when(done, F.col("_ne")).otherwise(F.col("error")))
        .withColumn("attempt", F.when(done, F.col("attempt") + 1).otherwise(F.col("attempt")))
        .withColumn("completed_round", F.when(done, F.lit(round_no)).otherwise(F.col("completed_round")))
        .drop("_ns", "_nt", "_ne", "_done")
    )


# -- merge-on-read round deltas (Iceberg MoR analog; SURVEY.md §4 "Iceberg
# MERGE churn" risk) -----------------------------------------------------------
#
# Rewriting the whole frontier every round is O(frontier) work per round —
# catastrophic at 10^10 rows. Instead a round persists only its k-bounded
# deltas and reads compose them:
#
#   frontier(R) = (base snapshot ∪ ins-deltas(s..R])  ⟕  upd-deltas(s..R]
#
# The upd side stays broadcast-sized because status transitions are
# TERMINAL (QUEUED→{PROCESSING-leak, PROCESSED, FAILED}; SURVEY.md §2.8-C3):
# each url_id appears in AT MOST ONE upd delta per base epoch, so composition
# is a plain union + one broadcast join — no per-read aggregation, no
# last-wins window. Periodic compaction (Crawler.compact_every) rewrites the
# reconciled snapshot and resets the delta window.

def round_update_delta(dequeued: DataFrame, results: DataFrame, round_no: int) -> DataFrame:
    """The k-bounded status-transition delta of one round (C3 + the
    taken-mark, URLStore.java:159-206): every dequeued row appears exactly
    once — PROCESSING if it was filtered before fetch (the reference's leak),
    else PROCESSED/FAILED with fresh tags + error."""
    return (
        dequeued.select("url_id")
        .join(
            results.select(
                "url_id", F.col("tags").alias("_nt"), "ok", F.col("error").alias("_ne")
            ),
            "url_id",
            "left",
        )
        .select(
            "url_id",
            F.when(F.col("ok").isNull(), F.lit(PROCESSING))
            .when(F.col("ok"), F.lit(PROCESSED))
            .otherwise(F.lit(FAILED))
            .cast("tinyint")
            .alias("status"),
            F.col("_nt").alias("tags"),
            F.col("_ne").alias("error"),
            F.col("ok").isNotNull().alias("done"),
            F.lit(round_no).alias("round"),
        )
    )


def compose_frontier(base: DataFrame, inserts: DataFrame | None, upds: DataFrame | None) -> DataFrame:
    """Reconcile base ∪ inserts with the update deltas (exact equivalent of
    the old full-rewrite apply_round_updates path; equivalence pinned by the
    golden tests). The upd side is k×rounds rows — broadcast."""
    full = base if inserts is None else base.unionByName(inserts)
    if upds is None:
        return full
    u = F.broadcast(
        upds.select(
            "url_id",
            F.col("status").alias("_us"),
            F.col("tags").alias("_ut"),
            F.col("error").alias("_ue"),
            F.col("done").alias("_ud"),
            F.col("round").alias("_ur"),
        )
    )
    j = full.join(u, "url_id", "left")
    touched = F.col("_us").isNotNull()
    done = F.coalesce(F.col("_ud"), F.lit(False))
    return (
        j.withColumn("status", F.coalesce(F.col("_us"), F.col("status")))
        .withColumn("taken_round", F.when(touched, F.col("_ur")).otherwise(F.col("taken_round")))
        .withColumn("tags", F.when(done, F.col("_ut")).otherwise(F.col("tags")))
        .withColumn("error", F.when(done, F.col("_ue")).otherwise(F.col("error")))
        .withColumn("attempt", F.when(done, F.col("attempt") + 1).otherwise(F.col("attempt")))
        .withColumn("completed_round", F.when(done, F.col("_ur")).otherwise(F.col("completed_round")))
        .drop("_us", "_ut", "_ue", "_ud", "_ur")
    )


def queued_view(base: DataFrame, inserts: DataFrame | None, upds: DataFrame | None) -> DataFrame:
    """The dequeue-eligible frontier WITHOUT column reconciliation.

    Because updates are terminal, status==QUEUED ⟺ (base-or-ins row is
    QUEUED) ∧ (url_id has no update). The status filter therefore pushes
    down to the parquet scan (PushedFilters: EqualTo(status,0) — pinned by
    test), and the update side degrades to a broadcast anti-join on ids.
    Columns (attempt, tags, priority…) are exact for QUEUED rows: only done
    rows ever mutate them."""
    full = base if inserts is None else base.unionByName(inserts)
    q = full.where(F.col("status") == QUEUED)
    if upds is None:
        return q
    return q.join(F.broadcast(upds.select("url_id")), "url_id", "left_anti")


def status_counts(frontier: DataFrame) -> DataFrame:
    """A2: SELECT status, count(*) GROUP BY status (URLStore.java:41-52) —
    partial/final hash agg, no full shuffle of data, only of counts."""
    return frontier.groupBy("status").count()


def reset_orphans(frontier: DataFrame) -> DataFrame:
    """C2: PROCESSING → QUEUED on resume (URLStore.java:54-58). With the
    commit protocol in storage.py this is normally a no-op (uncommitted
    rounds vanish wholesale), but it also heals snapshots that committed a
    'taken' state mid-round (the crawler commits only at round end, so only
    reference-imported or hand-edited state ever needs it)."""
    orphan = F.col("status") == PROCESSING
    return frontier.select(
        *[c for c in frontier.columns if c not in ("status", "taken_round")],
        F.when(orphan, F.lit(QUEUED).cast("tinyint")).otherwise(F.col("status")).alias("status"),
        F.when(orphan, F.lit(None).cast("int")).otherwise(F.col("taken_round")).alias("taken_round"),
    ).select(*frontier.columns)
