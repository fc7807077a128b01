"""Guards for the driver contract in __spark_entry__.py.

The driver imports queries() / oracle_sql() / entry() and runs them
side-by-side against DuckDB; a broken registry entry (missing callable,
oracle SQL for an unknown query, un-parseable SQL) fails the whole
round, so catch it at test time. Full value comparison lives in
scripts/selfcheck.py; these tests stay cheap.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def test_registry_consistency():
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert queries, "queries() must not be empty"
    for name, fn in queries.items():
        assert callable(fn), f"{name} is not callable"
    unknown = set(oracles) - set(queries)
    assert not unknown, f"oracle_sql() keys without a query: {sorted(unknown)}"


def test_oracles_parse_and_run_in_duckdb():
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not present")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    for name, sql in entry_mod.oracle_sql().items():
        try:
            con.execute(sql).fetchall()
        except Exception as exc:  # noqa: BLE001
            raise AssertionError(f"oracle for {name!r} failed in DuckDB: {exc}") from exc


def test_entry_returns_rows(spark):
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not present")
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns
