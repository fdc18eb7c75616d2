"""F1-F7: predicates (SURVEY.md §2.2), all pure Column expressions.

The tag white/blacklist filter (F2) is the subtle one: the reference iterates
a task's tags IN ARRAY ORDER and the first decisive tag wins
(LinkFilter.java:24-44) — blacklist hit ⇒ reject, whitelist hit ⇒ accept,
no decisive tag ⇒ allowByDefault (default false, LinkFilter.java:53-58).
That first-match fold is expressed with ``F.aggregate`` over the tags array —
still a JVM-side higher-order function, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .config import CrawlConfig
from .urlkit import is_http  # re-exported: F1 lives in urlkit

__all__ = ["is_http", "tag_filter_verdict", "is_url_allowed", "should_store", "can_attempt"]

_PENDING, _ACCEPT, _REJECT = "pending", "accept", "reject"


def _isin(col: Column, values: tuple[str, ...]) -> Column:
    # Column.isin(()) raises; an empty list never matches anything.
    return col.isin(*values) if values else F.lit(False)


def tag_filter_verdict(tags: Column, cfg: CrawlConfig) -> Column:
    """F2 core: fold tags in order → 'accept' | 'reject' | 'pending'.

    Exposed separately from the boolean so counters can distinguish
    ALLOWED_LINKS vs IGNORED_LINKS including the allowByDefault fallthrough
    (LinkFilter.java:31,36,41).
    """
    def step(acc: Column, t: Column) -> Column:
        return (
            F.when(acc != _PENDING, acc)
            .when(_isin(t, cfg.blacklist), F.lit(_REJECT))
            .when(_isin(t, cfg.whitelist), F.lit(_ACCEPT))
            .otherwise(acc)
        )

    return F.aggregate(tags, F.lit(_PENDING), step)


def is_url_allowed(url: Column, tags: Column, cfg: CrawlConfig) -> Column:
    """F2 (+ the F1 protocol guard that LinkFilter re-applies,
    LinkFilter.java:26-28): the boolean the scheduler uses."""
    verdict = tag_filter_verdict(tags, cfg)
    decided = F.when(verdict == _ACCEPT, F.lit(True)).when(
        verdict == _REJECT, F.lit(False)
    ).otherwise(F.lit(cfg.allow_by_default))
    return is_http(url) & decided


def should_store(tags: Column, cfg: CrawlConfig) -> Column:
    """F3: store iff any tag ∈ storage.includedTags; EMPTY includedTags means
    store NOTHING (AbstractStorageManager.java:22-35 — shouldStore can only
    return true on a tag hit)."""
    if not cfg.storage_included_tags:
        return F.lit(False)
    return F.arrays_overlap(tags, F.array(*[F.lit(t) for t in cfg.storage_included_tags]))


def can_attempt(attempt: Column, cfg: CrawlConfig) -> Column:
    """F7: dequeue-eligibility on attempt count (URLStore.java:186-187)."""
    return attempt < F.lit(cfg.max_attempt_count)
