"""Differential tests: every registered query must match its DuckDB
oracle at sf0.001 (fast) — the driver runs the same check at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle_harness import assert_match, duckdb_connect

import __spark_entry__ as entrymod


def _cases():
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    return [(name, fn, sqls.get(name)) for name, fn in qs.items()]


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connect(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name,fn,sql", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, duck, name, fn, sql):
    df = fn(spark, SF_SMALL)
    if sql is None:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    assert_match(df, duck, sql, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
