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


def test_one_mention_per_span_precondition(ddb):
    """_MENTIONS_SQL uses regexp_extract (first match only) and locates char
    offsets via strpos of the full match — both rely on the generator
    emitting AT MOST ONE mention per span per pattern. Assert it on the
    committed oracle corpus so a generator change that breaks the
    precondition fails loudly instead of silently under-counting."""
    full_patterns = [
        f"{entrymod._IND_RE} opened email act-\\d{{3}} of campaign cmp-\\d{{2}} at {entrymod._TS_RE}",
        f"campaign cmp-\\d{{2}} converted {entrymod._IND_RE} at {entrymod._TS_RE}",
        f"{entrymod._IND_RE} purchased prd-\\d{{4}} at {entrymod._TS_RE}",
        f"photo of {entrymod._IND_RE} at webinar act-\\d{{3}}",
    ]
    for pat in full_patterns:
        n = ddb.sql(
            f"SELECT max(len(regexp_extract_all(t.text, '{pat}'))) FROM ("
            f"SELECT unnest(spans).text AS text FROM read_parquet("
            f"'{entrymod.DOCS_PQ}/*.parquet')) t WHERE t.text IS NOT NULL"
        ).fetchone()[0]
        assert n is not None and n <= 1, (pat, n)


def test_profile_separator_precondition(ddb):
    """q_kg_events_similar_users joins on md5(concat_ws('\\x1f', profile)),
    which is injective only while no event_type contains the \\x1f separator
    (['a\\x1fb'] would collide with ['a','b']); the DuckDB oracle compares
    actual profile sets, so a separator-bearing fixture could emit a
    Spark-only false pair. Assert the precondition on the gate corpus so a
    generator change fails loudly (ADVICE r2)."""
    n = ddb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/events.parquet') "
        "WHERE event_type IS NOT NULL AND contains(event_type, chr(31))"
    ).fetchone()[0]
    assert n == 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["individual", "product", "score", "rank"]


def test_ascii_text_precondition(ddb):
    """Two oracles lean on ASCII text: Python re's \\w is Unicode while
    DuckDB RE2's is ASCII-only (simhash tokenization), and the strpos char
    offsets assume char == byte. Assert both corpora are pure ASCII so a
    generator change that breaks the precondition fails loudly."""
    n = ddb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet') "
        "WHERE text IS NOT NULL AND length(text) != strlen(text)"
    ).fetchone()[0]
    assert n == 0
    n = ddb.sql(
        f"SELECT count(*) FROM (SELECT unnest(spans).text AS t FROM "
        f"read_parquet('{entrymod.DOCS_PQ}/*.parquet')) "
        "WHERE t IS NOT NULL AND length(t) != strlen(t)"
    ).fetchone()[0]
    assert n == 0


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
