"""Vintage-robustness regression (r6 verdict item #3): the six r6
driver-red queries and the diagnostic probes must stay oracle-exact
when the testdata is regenerated in a hostile vintage — nanosecond
timestamps WITH sub-half-microsecond jitter AND tz=UTC tagging — and
the DuckDB side runs under a non-UTC session timezone. This is the
local reproduction of every environment difference the r6 verdict
hypothesized for the driver; probe_ship_day_cal is excluded because
it is DESIGNED to flip under tz-tagging + a non-UTC session (that is
its job — asserted below). The probe names track queries_probes.py
ladder v2 (r8)."""

from __future__ import annotations

import pytest

from tests.make_testdata_variant import make_variant
from tests.oracle_harness import compare, duckdb_connect

from airflow_baseball_spark import registry

SRC = "/root/testdata/sf0.001"

HARDENED = [
    "probe_ev_us_trunc",
    "probe_ev_us_round",
    "probe_ev_ms",
    "probe_ev_sec",
    "probe_ev_duck_subus",
    "probe_ship_day_round",
    "probe_ship_day_trunc",
    "probe_doc_bytes",
    "probe_doc_chars",
    "probe_doc_content",
    "probe_dec_floor",
    "probe_dec_cast",
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


def test_cal_probe_detects_tz_tagging(spark, nstz_dir, hostile_con):
    """The calendar-day probe must FLIP under tz-tagged data + a
    non-UTC oracle session — that red is the signal the probe exists
    to produce (CAST(ts AS DATE) follows the session timezone on
    tz-tagged values while the engine's read does not). If this starts
    passing, the probe lost its discriminating power (e.g. someone
    'fixed' it to epoch days)."""
    qs, sqls = registry.queries(), registry.oracle_sql()
    rep = compare(
        qs["probe_ship_day_cal"](spark, nstz_dir),
        hostile_con,
        sqls["probe_ship_day_cal"],
    )
    assert not rep["values_match"]
