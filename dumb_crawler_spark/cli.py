"""CLI entry points mirroring the reference's auxiliary tools.

- ``expr-test``  — the expression tester REPL (reference `java -jar crawler.jar
  test`, ExpressionTesterCli.java:84-97): compiles an expression to a Column
  and evaluates it on a one-row DataFrame; doubles as a live check of the
  U7 translator.
- ``pages-view`` — the WARC viewer analog (S13, WarcViewer.java:20-122):
  ad-hoc queries over the `pages` table of a crawl warehouse; columnar
  storage makes the reference's 120-line extraction tool a one-line filter.
- ``crawl``      — run a crawl session from a config.json + docs parquet.

Usage: python -m dumb_crawler_spark.cli <expr-test|pages-view|crawl> [...]
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F


def expr_test(args: argparse.Namespace) -> None:
    from .expressions import PythonEvaluator, compile_expression
    from .oracle import url_parts as py_parts
    from .session import get_spark
    from .urlkit import url_parts

    spark = get_spark(app="dcs-expr-test", cores=2, shuffle_partitions=2)
    print("expression tester — empty line exits (grammar: README.md of the reference, §Expression Language)")
    while True:
        expr = input("expression> ").strip()
        if not expr:
            return
        url = input("url> ").strip()
        try:
            df = spark.createDataFrame([(url,)], "url string")
            col = compile_expression(expr, url_parts(F.col("url")))
            spark_val = df.select(col.alias("v")).collect()[0]["v"]
            py_val = PythonEvaluator(expr).evaluate_bool(py_parts(url))
            print(f"  column backend: {spark_val}   oracle backend: {py_val}")
        except ValueError as e:
            print(f"  error: {e}")


def pages_view(args: argparse.Namespace) -> None:
    from .session import get_spark
    from .storage import Warehouse

    spark = get_spark(app="dcs-pages-view", cores=4, shuffle_partitions=4)
    wh = Warehouse(spark, args.warehouse)
    pages = wh.read_deltas("pages")
    if pages is None:
        print("no pages stored")
        return
    if args.url:
        pages = pages.where(F.col("url") == args.url)
    if args.list_urls:
        for r in pages.select("url", "round").orderBy("url").collect():
            print(f"{r['round']:6d}  {r['url']}")
        return
    pages.show(args.n, truncate=80)


def crawl(args: argparse.Namespace) -> None:
    from .config import load_config
    from .crawler import Crawler
    from .session import get_spark

    spark = get_spark(app="dcs-crawl")
    cfg = load_config(args.config)
    docs = spark.read.parquet(args.docs)
    crawler = Crawler(spark, cfg, docs, args.warehouse, use_bloom=args.bloom)
    # verbose=True streams the C8 stats line per round (counters + uptime +
    # JVM heap, DumbCrawler.java:196-231) as the crawl progresses
    crawler.run(max_rounds=args.rounds, verbose=True)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="dumb_crawler_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("expr-test")
    pv = sub.add_parser("pages-view")
    pv.add_argument("warehouse")
    pv.add_argument("--url")
    pv.add_argument("--list-urls", action="store_true")
    pv.add_argument("-n", type=int, default=20)
    cr = sub.add_parser("crawl")
    cr.add_argument("--config", required=True)
    cr.add_argument("--docs", required=True)
    cr.add_argument("--warehouse", required=True)
    cr.add_argument("--rounds", type=int, default=None)
    cr.add_argument("--bloom", action="store_true")
    args = p.parse_args(argv)
    {"expr-test": expr_test, "pages-view": pages_view, "crawl": crawl}[args.cmd](args)


if __name__ == "__main__":
    main()
