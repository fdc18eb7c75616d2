"""T1-T4: URL tagging + priority scoring (SURVEY.md §2.4).

All pure Column expressions built once on the driver from config —
per-URL work runs entirely inside whole-stage codegen.

Determinism (SURVEY.md §2.8-D1): the reference iterates a ``HashMap`` of tag
expressions (UrlTagger.java:19,41-44), so its tag ORDER is JVM-nondeterministic;
tag order matters because LinkFilter folds tags in order (LinkFilter.java:29-40).
This engine fixes tag order = config key order, which the Python oracle
(oracle.py) mirrors exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .config import CrawlConfig
from .expressions import compile_expression

OTHER_TAG = "other"  # reserved (UrlTagger.java:17,34-37)
SEED_TAG = "seed"  # extra tag for seeds (DumbCrawler.java:143-146,292-300)


def tag_urls(parts: Column, cfg: CrawlConfig) -> Column:
    """T1: array of tags whose compiled expression is true, in config order;
    empty ⇒ ['other'] (UrlTagger.java:40-48)."""
    if not cfg.tagger:
        return F.array(F.lit(OTHER_TAG))
    slots = [
        F.when(compile_expression(expr, parts), F.lit(tag))
        for tag, expr in cfg.tagger.items()
        if tag != OTHER_TAG
    ]
    tags = F.array_compact(F.array(*slots))
    return F.when(F.size(tags) == 0, F.array(F.lit(OTHER_TAG))).otherwise(tags)


def priority_for_tags(tags: Column, cfg: CrawlConfig) -> Column:
    """T2: max over tags of priorities[tag] (missing tag → 0); no tags → 0
    (LinkPrioritizer.java:22-31, reference README.md:177-196)."""
    if not cfg.priorities:
        return F.lit(0)
    prio_map = F.create_map(
        *[x for k, v in cfg.priorities.items() for x in (F.lit(k), F.lit(int(v)))]
    )
    scored = F.transform(tags, lambda t: F.coalesce(prio_map[t], F.lit(0)))
    return F.coalesce(F.array_max(scored), F.lit(0))


def with_seed_tag(tags: Column) -> Column:
    """T3: seeds carry ['seed'] + expression tags (prepended — the reference
    builds LinkedList(extraTags) then addAll(tags), DumbCrawler.java:292-300).
    Priority must be computed from the expression tags BEFORE this call."""
    return F.concat(F.array(F.lit(SEED_TAG)), tags)
