"""T5: driver-contract simulation — run every queries() entry on Spark AND
its oracle_sql() in DuckDB at sf0.01, compare row count, column names, and
order-insensitive values (what the driver's CORRECTNESS gate does)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v  # BIT-EXACT: every query is engineered so doubles agree
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(rows):
    return sorted((tuple(_norm(v) for v in r) for r in rows), key=repr)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["individual", "product", "score", "rank"]


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = ddb.sql(ORACLES[name])
    duck_cols = [c.lower() for c in res.columns]
    duck_rows = res.fetchall()
    assert [c.lower() for c in sdf.columns] == duck_cols, (sdf.columns, duck_cols)
    assert len(spark_rows) == len(duck_rows), f"{name}: {len(spark_rows)} vs {len(duck_rows)}"
    s, d = _rowset(spark_rows), _rowset(duck_rows)
    if s != d:
        diff = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diff}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
