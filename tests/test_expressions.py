"""U3/U4/U7 expression compiler: Column backend vs Python backend vs pinned
expected values (SURVEY.md §5.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dumb_crawler_spark import oracle as O
from dumb_crawler_spark.expressions import PythonEvaluator, compile_expression
from dumb_crawler_spark.urlkit import url_parts

CASES = [
    # (expression, url, expected)
    (r"matches(host, '(www\.)?site\.example\.com')", "http://www.site.example.com/a", True),
    (r"matches(host, '(www\.)?site\.example\.com')", "http://evil-site.example.com/a", False),
    # full-match semantics: un-anchored substring must NOT match (Java String.matches)
    (r"matches(path, '/articles/[0-9]+')", "http://s.com/articles/12", True),
    (r"matches(path, '/articles/[0-9]+')", "http://s.com/articles/12/comments", False),
    (r"matches(path, '.*\.(jpg|png)$')", "http://s.com/a/b.png", True),
    ("isResource(path)", "http://s.com/app.js", True),
    ("isResource(path)", "http://s.com/app", False),
    ("not isResource(path)", "http://s.com/app", True),
    # null handling: ftp → parts null → matches false, not(...) true (Java parity)
    (r"matches(host, '.*')", "ftp://x/y", False),
    (r"not matches(host, '.*')", "ftp://x/y", True),
    ("matches(protocol, 'https')", "https://s.com/", True),
    ("matches(protocol, 'https')", "http://s.com/", False),
    (r"matches(query, 'q=.*')", "http://s.com/search?q=spark", True),
    (r"matches(query, 'q=.*')", "http://s.com/search", False),
    ("port == 443", "https://s.com/", True),
    ("port == 443", "http://s.com/", False),
    ("port > 1000", "http://s.com:8080/", True),
    (r"matches(path, '/a/.*') and not isResource(path)", "http://s.com/a/x.css", False),
    (r"matches(path, '/a/.*') or matches(path, '/b/.*')", "http://s.com/b/1", True),
    (r"extract(path, '/articles/(?<value>[0-9]+)') == '77'", "http://s.com/articles/77", True),
    (r"extract(path, '/articles/(?<value>[0-9]+)') == '77'", "http://s.com/articles/78", False),
]


def test_column_backend(spark):
    rows = [(u,) for _, u, _ in CASES]
    df = spark.createDataFrame(rows, "url string").withColumn("p", url_parts(F.col("url")))
    cols = [compile_expression(expr, F.col("p")).alias(f"c{i}") for i, (expr, _, _) in enumerate(CASES)]
    got = df.select(*cols).collect()
    for i, (expr, url, expected) in enumerate(CASES):
        assert got[i][f"c{i}"] == expected, (expr, url)


def test_python_backend_parity():
    for expr, url, expected in CASES:
        v = O.url_parts(url)
        assert PythonEvaluator(expr).evaluate_bool(v) == expected, (expr, url)


def test_contains_element_rejected():
    with pytest.raises(ValueError, match="containsElement"):
        PythonEvaluator("containsElement(url, 'div.x')")


def test_unknown_variable_rejected():
    with pytest.raises(ValueError, match="unknown variable"):
        PythonEvaluator("matches(hostname, 'x')")


def test_regex_backslash_literal_preserved():
    # 'example\.com' must keep its backslash (dot stays escaped)
    ev = PythonEvaluator(r"matches(host, 'site\.example\.com')")
    assert ev.evaluate_bool(O.url_parts("http://site.example.com/"))
    assert not ev.evaluate_bool(O.url_parts("http://siteXexample.com/"))
