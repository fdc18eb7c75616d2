"""dumb_crawler_spark — a from-scratch PySpark-native URL-frontier + fetch
scheduler with the query/data-processing capabilities of
thordickinson/dumb-crawler (reference at /root/reference, read-only).

NOT a port: the reference is a single-process Java crawler whose SQLite
``links`` table is simultaneously a priority queue, an exact URL-seen set and
a crawl-state record (reference URLStore.java:82-97). This package re-expresses
those dataflow semantics as declarative PySpark DataFrame plans over
snapshot-versioned tables (Parquet snapshots locally; the storage interface is
written for Iceberg ``MERGE INTO`` on a real cluster — see storage.py).

Modules
-------
config       S1 config load, U8 period parser, defaults (SURVEY.md §2.1/§2.3)
urlkit       U1 parse, U2 url_id, U5 isResource, U9 canonicalize  — pure Column exprs
expressions  U3/U4/U7 config-expression → pyspark Column compiler
tagging      T1 tagger, T2 prioritizer, T3 seed boost
filters      F1-F7 protocol/tag/storage/attempt filters
frontier     S2-S4, J1-J3, A1 dequeue window, A2, C2-C4 — the engine's heart
fetch        J4 fetch-simulate join, S5/S6 render routing, F5/F6 validation
extract      L2/L3 span link extraction (vectorized)
storage      snapshot-table catalog (Parquet now / Iceberg interface), S7-S12
robots       J6 robots + crawl-delay politeness [north-rule]
bloom        J3-NR partitioned bloom seen-prefilter [north-rule]
crawler      C1 round loop, C5/C6 termination, checkpoint/resume
oracle       single-threaded Python oracle generating goldens (SURVEY.md §5)
corpus       deterministic synthetic docs/seeds/robots generators (FIXTURES.md)
ops/         training-data pipeline operators (dedup, similarity, text, multimodal)
"""

__version__ = "0.1.0"
