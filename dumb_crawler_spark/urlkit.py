"""URL kernel (SURVEY.md §2.3): parse, canonicalize, hash, resource test.

Everything here is a **pure Column expression** — JVM-side, inside
whole-stage codegen, no Python on the executor path at all (stronger than the
input_hint's "vectorized pandas UDF" floor). At 10^10 URLs/round this layer
runs inside the scan/project stage with zero serialization cost.

Reference parity notes:
- U1 mirrors okhttp ``HttpUrl.parse`` variables (URLExpressionEvaluator.java:29-49):
  url, protocol, host, path ('' → '/'), port (default 80/443 by scheme),
  query (null if absent), fragment (null if absent). okhttp parses only
  http/https; other schemes yield null parts (→ no tags, like the reference).
- U2 mirrors ``URLHasher.hashUrl`` (URLHasher.java:31-42): full-match of
  ``idExtractorPattern`` → named group ``id``; else md5 hex of the url.
  Java ``Matcher.matches()`` is FULL-string — patterns are anchored here.
- U5 mirrors ``ExpressionFunctions._isResource`` (ExpressionFunctions.java:11-17,46-52).
- U9 (canonicalize) is a north-rule addition with no reference counterpart
  (the reference only resolves relative links, CrawlingTaskCallable.java:97):
  lowercase scheme+host, strip fragment, strip default port, sort query
  params, '' path → '/'.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18 static-asset extensions, verbatim list from ExpressionFunctions.java:11-14
RESOURCE_EXTENSIONS = (
    "css", "js", "sass", "less", "ico", "jpeg", "jpg", "png", "webp",
    "pdf", "mpeg", "mpg", "mp3", "mp4", "avi", "ogg", "wav", "iso",
)
_RESOURCE_RE = r"^.*\.(" + "|".join(RESOURCE_EXTENSIONS) + r")$"

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://.*$"


def anchor(pattern: str) -> str:
    """Wrap a Java regex for full-string semantics (U3: String.matches)."""
    return f"^(?:{pattern})$"


def named_group_index(pattern: str, name: str) -> int:
    """Resolve a Java named capture group ``(?<name>…)`` to its group index,
    so Spark's index-based ``regexp_extract`` can address it. Parsed on the
    driver once per config; Java named-group syntax is translated to Python's
    for introspection only — the JVM still receives the original pattern.
    """
    py_pattern = re.sub(r"\(\?<([A-Za-z][A-Za-z0-9]*)>", r"(?P<\1>", pattern)
    idx = re.compile(py_pattern).groupindex.get(name)
    if idx is None:
        raise ValueError(f"pattern has no (?<{name}>…) group: {pattern}")
    return idx


def is_http(url: Column) -> Column:
    """F1 protocol filter predicate (URLStore.java:102-111, LinkFilter.java:26-28).

    The reference tests ``url.startsWith("http")`` — which admits http, https
    (and technically any http* scheme); replicated exactly.
    """
    return url.startswith("http")


def is_resource(path: Column) -> Column:
    """U5: path ends with a static-asset extension (case-sensitive, like the
    reference's Pattern without CASE_INSENSITIVE)."""
    return path.rlike(_RESOURCE_RE)


def url_parts(url: Column) -> Column:
    """U1: struct<url, protocol, host, path, port, query, fragment>.

    Only http/https URLs produce non-null parts (okhttp behaviour); the
    expression compiler treats null parts as falsey, matching the reference's
    "unparseable ⇒ expression false ⇒ no tags" path
    (URLExpressionEvaluator.java:33-38, ThreadLocalEvaluator coercion).
    """
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    ok = scheme.isin("http", "https")
    protocol = F.when(ok, scheme)
    authority = F.when(ok, F.try_parse_url(url, F.lit("AUTHORITY")))
    host = F.lower(F.regexp_extract(authority, r"^(?:[^@]*@)?([^:]+)", 1))
    host = F.when(ok & (host != ""), host)
    explicit_port = F.regexp_extract(authority, r":(\d+)$", 1)
    port = F.when(~ok, F.lit(None).cast("int")).otherwise(
        F.when(explicit_port != "", explicit_port.cast("int")).otherwise(
            F.when(scheme == "https", F.lit(443)).otherwise(F.lit(80))
        )
    )
    raw_path = F.try_parse_url(url, F.lit("PATH"))
    path = F.when(ok, F.when(raw_path.isNull() | (raw_path == ""), F.lit("/")).otherwise(raw_path))
    query = F.when(ok, F.try_parse_url(url, F.lit("QUERY")))
    fragment = F.when(ok, F.try_parse_url(url, F.lit("REF")))
    return F.struct(
        url.alias("url"),
        protocol.alias("protocol"),
        host.alias("host"),
        path.alias("path"),
        port.alias("port"),
        query.alias("query"),
        fragment.alias("fragment"),
    )


def canonicalize(url: Column) -> Column:
    """U9 [north-rule]: canonical URL string.

    lowercase scheme+host · strip fragment · strip default port (:80 http,
    :443 https) · sort query params lexicographically · '' path → '/'.
    Idempotent (property-tested). Non-http(s) input passes through trimmed —
    F1 drops it before it ever reaches the frontier.
    """
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    ok = scheme.isin("http", "https")
    no_frag = F.regexp_replace(u, r"#.*$", "")
    authority = F.try_parse_url(no_frag, F.lit("AUTHORITY"))
    userinfo = F.regexp_extract(authority, r"^([^@]*@)", 1)
    host = F.lower(F.regexp_extract(authority, r"^(?:[^@]*@)?([^:]+)", 1))
    explicit_port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = F.when(scheme == "https", F.lit("443")).otherwise(F.lit("80"))
    port_part = F.when(
        (explicit_port == "") | (explicit_port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), explicit_port))
    raw_path = F.try_parse_url(no_frag, F.lit("PATH"))
    path = F.when(raw_path.isNull() | (raw_path == ""), F.lit("/")).otherwise(raw_path)
    query = F.try_parse_url(no_frag, F.lit("QUERY"))
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    query_part = F.when(query.isNull() | (query == ""), F.lit("")).otherwise(
        F.concat(F.lit("?"), sorted_query)
    )
    canon = F.concat(scheme, F.lit("://"), userinfo, host, port_part, path, query_part)
    return F.when(ok & (host != ""), canon).otherwise(u)


# -- layered kernel (the hot path) -------------------------------------------
#
# The Column-expression forms above are convenient and exact, but COMPOSING
# them (canonicalize → url_parts → tags) builds one giant expression tree in
# which every `when`/`nullif` duplicates its heavyweight argument
# (parse_url, regexp_extract) — multiplicatively. Measured: ~100-200 core-µs
# per URL, and the generated code can outgrow HotSpot's JIT method limit
# (→ interpreted execution, another ~10×). The DataFrame-level forms below
# evaluate each heavy sub-expression EXACTLY ONCE per row by aliasing it as
# an intermediate column: Catalyst's CollapseProject never inlines a
# non-cheap alias that is referenced more than once, so the layering
# survives optimization. Same semantics (pinned by tests), ~10× cheaper.


def with_canonical_url(df, url_col: str = "url", out: str = "url"):
    """U9 as a DataFrame transform — identical results to
    ``canonicalize(col)``, with each parse/regex evaluated once per row."""
    df = df.withColumn("_u", F.trim(F.col(url_col)))
    df = df.withColumn("_scheme", F.lower(F.regexp_extract(F.col("_u"), _SCHEME_RE, 1)))
    df = df.withColumn("_nofrag", F.regexp_replace(F.col("_u"), r"#.*$", ""))
    df = (
        df.withColumn("_auth", F.try_parse_url(F.col("_nofrag"), F.lit("AUTHORITY")))
        .withColumn("_rawpath", F.try_parse_url(F.col("_nofrag"), F.lit("PATH")))
        .withColumn("_q", F.try_parse_url(F.col("_nofrag"), F.lit("QUERY")))
    )
    df = (
        df.withColumn("_host", F.lower(F.regexp_extract(F.col("_auth"), r"^(?:[^@]*@)?([^:]+)", 1)))
        .withColumn("_eport", F.regexp_extract(F.col("_auth"), r":(\d+)$", 1))
        .withColumn("_userinfo", F.regexp_extract(F.col("_auth"), r"^([^@]*@)", 1))
    )
    default_port = F.when(F.col("_scheme") == "https", F.lit("443")).otherwise(F.lit("80"))
    port_part = F.when(
        (F.col("_eport") == "") | (F.col("_eport") == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), F.col("_eport")))
    path = F.when(
        F.col("_rawpath").isNull() | (F.col("_rawpath") == ""), F.lit("/")
    ).otherwise(F.col("_rawpath"))
    sorted_query = F.array_join(F.array_sort(F.split(F.col("_q"), "&")), "&")
    query_part = F.when(F.col("_q").isNull() | (F.col("_q") == ""), F.lit("")).otherwise(
        F.concat(F.lit("?"), sorted_query)
    )
    ok = F.col("_scheme").isin("http", "https") & (F.col("_host") != "")
    canon = F.concat(
        F.col("_scheme"), F.lit("://"), F.col("_userinfo"), F.col("_host"),
        port_part, path, query_part,
    )
    df = df.withColumn("_canon_out", F.when(ok, canon).otherwise(F.col("_u")))
    df = df.drop("_u", "_scheme", "_nofrag", "_auth", "_rawpath", "_q", "_host", "_eport", "_userinfo")
    if out in df.columns:
        df = df.drop(out)
    return df.withColumnRenamed("_canon_out", out)


def with_url_parts(df, url_col: str = "url", out: str = "parts", host_out: str | None = None):
    """U1 as a DataFrame transform — identical struct to ``url_parts(col)``,
    each parse/regex evaluated once per row. ``host_out`` optionally exports
    the any-scheme host (the ``host_of`` semantics used for the frontier
    host column — non-null even for non-http schemes)."""
    df = df.withColumn("_p_scheme", F.lower(F.regexp_extract(F.col(url_col), _SCHEME_RE, 1)))
    df = (
        df.withColumn("_p_auth", F.try_parse_url(F.col(url_col), F.lit("AUTHORITY")))
        .withColumn("_p_rawpath", F.try_parse_url(F.col(url_col), F.lit("PATH")))
        .withColumn("_p_query", F.try_parse_url(F.col(url_col), F.lit("QUERY")))
        .withColumn("_p_frag", F.try_parse_url(F.col(url_col), F.lit("REF")))
    )
    df = (
        df.withColumn("_p_host", F.lower(F.regexp_extract(F.col("_p_auth"), r"^(?:[^@]*@)?([^:]+)", 1)))
        .withColumn("_p_eport", F.regexp_extract(F.col("_p_auth"), r":(\d+)$", 1))
    )
    ok = F.col("_p_scheme").isin("http", "https")
    port = F.when(~ok, F.lit(None).cast("int")).otherwise(
        F.when(F.col("_p_eport") != "", F.col("_p_eport").cast("int")).otherwise(
            F.when(F.col("_p_scheme") == "https", F.lit(443)).otherwise(F.lit(80))
        )
    )
    path = F.when(
        ok,
        F.when(
            F.col("_p_rawpath").isNull() | (F.col("_p_rawpath") == ""), F.lit("/")
        ).otherwise(F.col("_p_rawpath")),
    )
    df = df.withColumn(
        out,
        F.struct(
            F.col(url_col).alias("url"),
            F.when(ok, F.col("_p_scheme")).alias("protocol"),
            F.when(ok & (F.col("_p_host") != ""), F.col("_p_host")).alias("host"),
            path.alias("path"),
            port.alias("port"),
            F.when(ok, F.col("_p_query")).alias("query"),
            F.when(ok, F.col("_p_frag")).alias("fragment"),
        ),
    )
    if host_out is not None:
        df = df.withColumn(
            host_out, F.when(F.col("_p_host") == "", F.lit(None)).otherwise(F.col("_p_host"))
        )
    return df.drop("_p_scheme", "_p_auth", "_p_rawpath", "_p_query", "_p_frag", "_p_host", "_p_eport")


def url_id(url: Column, id_extractor_pattern: str | None = None) -> Column:
    """U2: stable URL identity (URLHasher.java:31-42).

    Full-string match of ``id_extractor_pattern`` → its ``(?<id>…)`` group;
    otherwise md5 hex of the url. The pattern is anchored because Java's
    ``matches()`` is full-string while Spark's regexp_extract is find-based.
    """
    fallback = F.md5(url)
    if not id_extractor_pattern:
        return fallback
    grp = named_group_index(id_extractor_pattern, "id")
    extracted = F.regexp_extract(url, anchor(id_extractor_pattern), grp)
    return F.coalesce(F.nullif(extracted, F.lit("")), fallback)


def host_of(url: Column) -> Column:
    """Lowercased host (politeness/partition key)."""
    authority = F.try_parse_url(F.trim(url), F.lit("AUTHORITY"))
    h = F.lower(F.regexp_extract(authority, r"^(?:[^@]*@)?([^:]+)", 1))
    return F.when(h == "", F.lit(None)).otherwise(h)


def part_of(host: Column, url_id_col: Column, partitions: int, salt: int) -> Column:
    """Explicit frontier partition [north-rule]: murmur3 host bucket with a
    per-url salt sub-split so one mega-host spreads across ``salt`` buckets
    while politeness still groups by ``host`` (SURVEY.md §4 skew row).

    ``F.hash`` is Spark's murmur3_x86_32 — the same function Iceberg's
    bucket transform family uses, so this column ports directly to a
    ``bucket(partitions, …)`` partition spec at cluster scale.
    """
    sub = F.pmod(F.hash(url_id_col), F.lit(salt))
    return F.pmod(F.hash(host, sub), F.lit(partitions))
