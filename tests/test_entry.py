"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same parquet, compare
row multisets (order-insensitive, column-name-sorted) — the same shape as
CORRECTNESS_r{N}.json. Rows-only entries are smoke-checked for execution +
stable schema."""

from __future__ import annotations

import math
import os
import sys
from decimal import Decimal

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(_norm(r[c]) for c in cols) for r in df.collect()), cols


def _duck_rows(con, sql, cols):
    res = con.sql(sql)
    name_to_idx = {c: i for i, c in enumerate(res.columns)}
    assert sorted(res.columns) == cols, f"oracle columns {sorted(res.columns)} != spark {cols}"
    rows = res.fetchall()
    return sorted(tuple(_norm(r[name_to_idx[c]]) for c in cols) for r in rows)


ORACLE = E.oracle_sql()
ALL = E.queries()
SQL_BACKED = sorted(set(ALL) & set(ORACLE))
ROWS_ONLY = sorted(set(ALL) - set(ORACLE))


@pytest.mark.parametrize("name", SQL_BACKED)
def test_query_matches_oracle(spark, ddb, name):
    got, cols = _spark_rows(ALL[name](spark, SF_DIR))
    exp = _duck_rows(ddb, ORACLE[name], cols)
    assert len(got) == len(exp), f"{name}: row count {len(got)} != {len(exp)}"
    mism = [(g, e) for g, e in zip(got, exp) if g != e]
    assert not mism, f"{name}: first mismatches {mism[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = ALL[name](spark, SF_DIR)
    assert df.columns
    df.limit(5).collect()  # executes the plan


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
