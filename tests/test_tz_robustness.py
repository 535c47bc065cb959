"""Driver-environment robustness: queries must match their oracles
even when the CALLER's session timezone is not UTC (the driver calls
queries with its own SparkSession; timestamp calendar ops read the
session TZ at execution). schemas.load_table / streaming.read_events
pin UTC at load — these tests run the formerly TZ-sensitive shapes
under a hostile session TZ and require oracle equality."""

from __future__ import annotations

import pytest

from airflow_baseball_spark import registry
from tests.oracle_harness import compare, duckdb_connect

SF = "/root/testdata/sf0.01"

# one representative per formerly-sensitive family (the full 19-name
# sweep lives in the round audit; these guard the fix permanently)
NAMES = [
    "game_parse",  # domain parity: datetime build
    "time_bucket_rollup",  # window()/date_trunc rollup
    "sessionize_batch",  # gaps-and-islands on ts
    "asof_join",  # as-of backward join on ts
    "peak_concurrency",  # epoch bucketing
    "stream_windowed_counts",  # streaming window + watermark
]


@pytest.fixture(scope="module")
def duck():
    return duckdb_connect(SF)


@pytest.mark.parametrize("name", NAMES)
def test_oracle_match_under_hostile_session_tz(spark, duck, name):
    qs, sqls = registry.queries(), registry.oracle_sql()
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        rep = compare(qs[name](spark, SF), duck, sqls[name])
        assert rep["values_match"] and rep["columns_match"], rep
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
