"""Oracle-side scale pins (r11): every DuckDB oracle twin must
execute at sf0.1 — ten times the driver's correctness SF — without
hitting DuckDB's int64-decimal fast-path overflow.

Found by the first full sf0.1 oracle sweep (ORACLE_SF01_r11.txt):
DuckDB keeps DECIMAL(p<=18) x DECIMAL(p<=18) products on the int64
DECIMAL(18) fast path (it does NOT widen to p1+p2), so the
sum-of-squares idiom `SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS
DECIMAL(18,0)))` overflows once |x| passes ~1e9 — daily revenue cents
reach ~1.9e9 at sf0.1. The fix is widening an operand to DECIMAL(38)
before multiplying (int128 path, value-identical exact arithmetic).
These pins execute the four fixed oracles at sf0.1 so the overflow
returns as a pytest red, not a future sweep surprise."""

from __future__ import annotations

from pathlib import Path

import pytest

from airflow_baseball_spark import registry

SF01 = "/root/testdata/sf0.1"

FIXED = [
    "pacf_yule_walker",
    "gumbel_return_level",
    "grubbs_test",
    "bollinger_bands",
]


@pytest.fixture(scope="module")
def con01():
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from oracle_harness import duckdb_connect

    if not Path(SF01).is_dir():
        pytest.skip("testdata sf0.1 not present")
    con = duckdb_connect(SF01)
    con.execute("SET memory_limit='8GB'")
    yield con
    con.close()


@pytest.mark.parametrize("name", FIXED)
def test_oracle_executes_at_sf01(con01, name):
    sql = registry.oracle_sql()[name]
    assert "DECIMAL(38" in sql, f"{name}: the widened cast is gone"
    rows = con01.execute(sql).fetchall()
    assert rows


def test_duckdb_decimal18_multiply_still_narrow(con01):
    """The fix is only needed while DuckDB keeps the narrow product
    type. If this starts failing, DuckDB widened decimal multiplies
    and the DECIMAL(38) casts are merely redundant (safe either way
    — this test is the documentation of WHY they exist)."""
    import duckdb

    with pytest.raises(duckdb.OutOfRangeException):
        con01.execute(
            "SELECT CAST(1791153793 AS DECIMAL(18,0))"
            " * CAST(1415087768 AS DECIMAL(18,0))"
        ).fetchall()
