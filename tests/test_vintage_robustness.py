"""Vintage-robustness regression (r6 verdict item #3): the six r6
driver-red queries and the diagnostic probes must stay oracle-exact
when the testdata is regenerated in a hostile vintage — nanosecond
timestamps WITH sub-microsecond jitter AND tz=UTC tagging — and the
DuckDB side runs under a non-UTC session timezone. This is the local
reproduction of every environment difference the r6 verdict
hypothesized for the driver; probe_events_hour_raw is excluded
because it is DESIGNED to flip under tz-tagging (that is its job)."""

from __future__ import annotations

import pytest

from tests.make_testdata_variant import make_variant
from tests.oracle_harness import compare, duckdb_connect

from airflow_baseball_spark import registry

SRC = "/root/testdata/sf0.001"

HARDENED = [
    "probe_engine_echo",
    "probe_events_epoch",
    "probe_lineitem_days_epoch",
    "probe_documents_len",
    "probe_decimal_cast",
    "chi2_features",
    "psi_drift",
    "tpch_q12ish",
    "media_shard_plan",
    "interval_union_time",
    "sql_api_pricing",
    "calendar_dim",
    "mom_growth",
]


@pytest.fixture(scope="module")
def nstz_dir():
    return make_variant(SRC, "nstz")


@pytest.fixture(scope="module")
def hostile_con(nstz_dir):
    con = duckdb_connect(nstz_dir)
    con.execute("SET TimeZone='America/New_York'")
    return con


@pytest.mark.parametrize("name", HARDENED)
def test_hardened_query_survives_nstz_hostile_tz(
    spark, nstz_dir, hostile_con, name
):
    qs, sqls = registry.queries(), registry.oracle_sql()
    rep = compare(qs[name](spark, nstz_dir), hostile_con, sqls[name])
    assert rep["rowcount_match"], (name, rep)
    assert rep["columns_match"], (name, rep)
    assert rep["values_match"], (name, rep.get("first_diffs"))


def test_hour_probe_detects_tz_tagging(spark, nstz_dir, hostile_con):
    """The calendar-hour probe must FLIP under tz-tagged data + a
    non-UTC oracle session — that red is the signal the probe exists
    to produce. If this starts passing, the probe lost its
    discriminating power (e.g. someone 'fixed' it to epoch hours)."""
    qs, sqls = registry.queries(), registry.oracle_sql()
    rep = compare(
        qs["probe_events_hour_raw"](spark, nstz_dir),
        hostile_con,
        sqls["probe_events_hour_raw"],
    )
    assert not rep["values_match"]
