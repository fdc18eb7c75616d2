"""Step-level timing of one crawl round at a given core count — finds the
serial bottleneck instead of guessing. Usage: CPUS=32 python scripts/profile_round.py"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("CPUS", "32"))
N = int(os.environ.get("N", "2000000"))
K = int(os.environ.get("K", "200000"))

from pyspark.sql import functions as F

from dumb_crawler_spark import frontier as FR
from dumb_crawler_spark.session import get_spark
from dumb_crawler_spark.storage import Warehouse
from bench import bench_crawl_rounds  # reuse cfg/docs construction? no — inline

t_all = time.time()
spark = get_spark(app="profile", cores=CPUS, shuffle_partitions=CPUS)

from dumb_crawler_spark.config import CrawlConfig, Politeness
from dumb_crawler_spark.corpus import frontier_urls_from_range
from dumb_crawler_spark.crawler import Crawler

cfg = CrawlConfig(
    tagger={"internal": r"matches(host, '.*\.corpus\.example\.com')", "doc": r"matches(path, '/doc/[0-9]+')"},
    priorities={"doc": 900, "other": 10},
    whitelist=("internal",),
    storage_included_tags=("doc",),
    thread_count=K // 2,
    politeness=Politeness(budget_per_host_per_round=K // 10),
    partitions=CPUS,
)

i = F.col("id")
n_hosts = max(N // 1000, 4)
host = F.when(i % 10 == 0, F.lit("hot.corpus.example.com")).otherwise(
    F.concat(F.lit("h"), (i % n_hosts).cast("string"), F.lit(".corpus.example.com"))
)
url = F.concat(F.lit("http://"), host, F.lit("/doc/"), i.cast("string"))
link = lambda e: F.concat(F.lit('<a href="http://'), host, F.lit("/doc/"), e.cast("string"), F.lit('">'))
filler = F.repeat(F.concat(F.lit("lorem ipsum content block "), i.cast("string"), F.lit(" ")), 64)
t1c = F.concat(F.lit("body article-body "), filler, link((i * 7 + 1) % N), F.lit(" "), link((i * 13 + 2) % N), F.lit(" "), link((i * 3 + 5) % N))
t2c = F.concat(filler, link((i * 11 + 4) % N), F.lit(" "), link((i * 17 + 6) % N), F.lit(" "), link((i * 5 + 8) % N))
span = lambda txt, off: F.struct(F.lit("text").alias("kind"), txt.alias("text"), F.lit(None).cast("string").alias("media_ref"), F.lit(off).alias("offset"))
docs = spark.range(N).where(i % 10 != 3).select(F.md5(url).alias("doc_id"), F.array(span(t1c, 0), span(t2c, 1)).alias("spans"))

tmpdir = tempfile.mkdtemp(prefix="profile-")
wh = Warehouse(spark, tmpdir)


def step(name, fn):
    t0 = time.time()
    out = fn()
    print(f"{name:40s} {time.time() - t0:7.2f}s", flush=True)
    return out


urls = frontier_urls_from_range(spark, N)
cands = FR.make_candidates(urls, cfg)
fr0 = FR.merge_new_links(FR.empty_frontier(spark), cands, cfg, 0, depth=0)
step("bootstrap: build+write frontier", lambda: wh.write_snapshot("frontier", 0, fr0.repartition(cfg.partitions, "part")))
wh.commit_round(0, {})

from dumb_crawler_spark.extract import extract_links, order_spans
from dumb_crawler_spark.fetch import fetch_simulate
from dumb_crawler_spark.filters import is_url_allowed, should_store

fr = wh.read_frontier(0)
k = cfg.thread_count * 2
dq = step("dequeue plan+cache", lambda: FR.dequeue(fr, cfg, k).cache())
retagged = FR.retag_dequeued(dq, cfg).cache()
verd = step("retag verdicts collect", lambda: retagged.groupBy("_allowed").count().collect())
allowed = retagged.where(F.col("_allowed")).drop("_allowed")
fetched = fetch_simulate(allowed, docs, cfg).withColumn("links", F.when(F.col("ok"), extract_links(F.col("spans"), F.col("url")))).cache()
fstats = step("fetch+extract agg (materializes cache)", lambda: fetched.groupBy("error").count().collect())
ok_rows = fetched.where(F.col("ok"))
exploded = ok_rows.select(F.explode_outer("links").alias("url")).where(F.col("url").isNotNull())
link_cands = FR.make_candidates(exploded, cfg).cache()
lc = step("link candidates agg", lambda: link_cands.withColumn("_ok", is_url_allowed(F.col("url"), F.col("tags"), cfg)).groupBy("_ok").count().collect())
allowed_cands = FR.filter_allowed(link_cands, cfg)
results = fetched.select("url_id", "tags", "ok", "error")
fr2 = FR.apply_round_updates(fr, dq, results, cfg, 1)
fr3 = FR.merge_new_links(fr2, allowed_cands, cfg, 1, depth=1)
step("frontier merge + snapshot write", lambda: wh.write_snapshot("frontier", 1, fr3.repartition(cfg.partitions, "part").sortWithinPartitions("status", F.desc("priority"))))
step("snapshot count", lambda: wh.read_snapshot("frontier", 1).count())
saved = ok_rows.withColumn("_store", should_store(F.col("tags"), cfg)).where(F.col("_store")).select("url_id", "url", F.lit(1).alias("round"), order_spans(F.col("spans")).alias("spans"))
step("pages write", lambda: wh.append_delta("pages", 1, saved))
print(f"{'TOTAL':40s} {time.time() - t_all:7.2f}s")
