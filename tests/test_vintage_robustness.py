"""Vintage-robustness regression (r6 verdict item #3): the six
onetime driver-red queries and the diagnostic probes must stay
oracle-exact when the testdata is regenerated in a hostile vintage —
nanosecond timestamps WITH sub-half-microsecond jitter AND tz=UTC
tagging — and the DuckDB side runs under a non-UTC session timezone.
This is the local reproduction of every environment difference the
r6 verdict hypothesized for the driver. The probe names track
queries_probes.py (v4 in-window panel + the parked v3 probes); the
retired designed-red bare-HUGEINT oracle is exercised separately
below because it is DESIGNED to split under a dtype-sensitive fetch,
which the fetchall-based `compare` here cannot see —
tests/test_driver_sim covers that split."""

from __future__ import annotations

import pytest

from tests.make_testdata_variant import make_variant
from tests.oracle_harness import compare, duckdb_connect

from airflow_baseball_spark import registry

SRC = "/root/testdata/sf0.001"

HARDENED = [
    "probe_const_control",
    "panel_const_twin",
    "probe_hugeint_cast",
    "probe_dup_keys",
    "probe_ev_us_round",
    "probe_doc_content",
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


def test_hugeint_bare_sql_keeps_hugeint(spark, nstz_dir, hostile_con):
    """The bare integer-SUM oracle (queries_probes.BARE_HUGEINT_SQL,
    unregistered since the probe's r10 retirement) still DESCRIBEs to
    HUGEINT, and its VALUES still match under fetchall — the
    fetch-layer split is invisible to exact Python-int fetches,
    exactly the r5-r8 local blind spot, pinned here so the mechanism
    record stays executable."""
    from airflow_baseball_spark import queries_probes

    desc = hostile_con.execute(
        "DESCRIBE " + queries_probes.BARE_HUGEINT_SQL
    ).fetchall()
    assert any(t == "HUGEINT" for _, t, *_ in desc)
    rep = compare(
        queries_probes._linenumber_sum(spark, nstz_dir),
        hostile_con,
        queries_probes.BARE_HUGEINT_SQL,
    )
    assert rep["values_match"], rep.get("first_diffs")
