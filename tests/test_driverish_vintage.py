"""The `driverish` vintage acceptance tests (r8, r7 verdict item #4).

The r7 driver window was hash-red on epoch-µs reads of events.ts, day
derivations of l_shipdate, and double→DECIMAL tie casts — all while
every local vintage stayed green. `driverish`
(tests/make_testdata_variant.py) reproduces that environment locally:
ns-typed timestamps with full sub-µs jitter and midnight-minus-epsilon
date values on the Spark side, a `_duck` subdir with the same tables
µs-ROUNDED (emulating a DuckDB build whose ns scan rounds — local
DuckDB 1.0 truncates at scan, so the emulation happens at generation
time), and 3-decimal tie values in every stored double.

Acceptance per the verdict, encoded as regression tests:

* the r7 TRUNCATION convention (``ts div 1000`` on the raw ns longs)
  DISAGREES with the rounding-scan oracle on this vintage — i.e. the
  pre-fix engine goes red here exactly as it did in the driver window;
* the r8 engine read (load_table's round-half-up) AGREES — post-fix
  green;
* same pair for l_shipdate day derivations (midnight-eps rows shift a
  day under truncation, none under rounding);
* CAST(double AS DECIMAL(18,2)) cents DISAGREE on the injected ties
  (the divergence the retired r8 probe_dec_cast measured) while the house
  floor(x*100+0.5) cents AGREE — validating the r8 repo-wide sweep.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest
from pyspark.sql import functions as F

from airflow_baseball_spark.schemas import load_table
from tests.make_testdata_variant import make_variant

_P = 1_000_003
_SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def driverish():
    sf = make_variant(_SRC, "driverish")
    con = duckdb.connect()
    for f in (Path(sf) / "_duck").glob("*.parquet"):
        con.execute(
            f"CREATE VIEW {f.stem} AS SELECT * FROM read_parquet('{f}')"
        )
    return sf, con


def _duck_one(con, sql):
    return con.execute(sql).fetchone()[0]


def test_events_trunc_read_reproduces_driver_red(spark, driverish):
    sf, con = driverish
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf}/events.parquet")
    assert dict(raw.dtypes)["ts"] in ("bigint", "long")
    trunc_modp = raw.select(
        F.sum(F.expr(f"(ts div 1000) % {_P}")).alias("m")
    ).collect()[0]["m"]
    oracle = _duck_one(con, f"SELECT SUM(epoch_us(ts) % {_P}) FROM events")
    assert trunc_modp != oracle, (
        "expected the r7 truncation convention to disagree on the "
        "driverish vintage (it was the driver-red pairing); if this "
        "starts agreeing the vintage lost its >=500ns jitter"
    )


def test_events_engine_read_is_green(spark, driverish):
    sf, con = driverish
    ev = load_table(spark, sf, "events")
    got = ev.select(
        F.sum(F.unix_micros("ts") % F.lit(_P)).alias("m")
    ).collect()[0]["m"]
    oracle = _duck_one(con, f"SELECT SUM(epoch_us(ts) % {_P}) FROM events")
    assert got == oracle


def test_shipdate_trunc_day_reproduces_driver_red(spark, driverish):
    sf, con = driverish
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf}/lineitem.parquet")
    trunc_days = raw.select(
        F.sum(F.expr(f"(l_shipdate div 86400000000000) % {_P}")).alias("m")
    ).collect()[0]["m"]
    oracle = _duck_one(
        con,
        f"SELECT SUM((epoch_us(l_shipdate) // 86400000000) % {_P}) "
        f"FROM lineitem",
    )
    assert trunc_days != oracle, (
        "midnight-minus-epsilon rows should shift a day under the r7 "
        "truncation convention"
    )


def test_shipdate_engine_read_is_green(spark, driverish):
    sf, con = driverish
    li = load_table(spark, sf, "lineitem")
    got = li.select(
        F.sum(
            F.datediff("l_shipdate", F.lit("1970-01-01").cast("date"))
            % F.lit(_P)
        ).alias("m")
    ).collect()[0]["m"]
    oracle = _duck_one(
        con,
        f"SELECT SUM((epoch_us(l_shipdate) // 86400000000) % {_P}) "
        f"FROM lineitem",
    )
    assert got == oracle


def test_decimal_cast_diverges_floor_agrees(spark, driverish):
    sf, con = driverish
    li = load_table(spark, sf, "lineitem")
    row = li.agg(
        F.sum(
            (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
        ).alias("cast_cents"),
        F.sum(F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")).alias(
            "floor_cents"
        ),
    ).collect()[0]
    cast_oracle = _duck_one(
        con,
        "SELECT SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))"
        " FROM lineitem",
    )
    floor_oracle = _duck_one(
        con,
        "SELECT SUM(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))"
        " FROM lineitem",
    )
    assert row["floor_cents"] == floor_oracle
    assert row["cast_cents"] != cast_oracle, (
        "the injected x.xx5 ties should make the bare DECIMAL cast "
        "diverge (Spark shortest-string vs DuckDB binary rounding); if "
        "this agrees the vintage lost its tie values"
    )
