"""Bucketed-join plan quality: both sides bucketed on the join key →
the sort-merge join runs with NO Exchange on either side (the physical
property every repeated big-big join at 100 TB should have)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from airflow_baseball_spark.operators.bucketing import (
    ensure_temp_database,
    write_bucketed,
)
from airflow_baseball_spark.schemas import load_table

SF = "/root/testdata/sf0.01"


from tests.oracle_harness import plan_str as _plan  # noqa: E402


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    loc = tempfile.mkdtemp(prefix="bkt_wh_")
    ensure_temp_database(spark, "bkt", loc)
    write_bucketed(
        load_table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        "bkt.orders_b",
        ["o_custkey"],
        n_buckets=8,
    )
    write_bucketed(
        load_table(spark, SF, "customer").select("c_custkey", "c_nationkey"),
        "bkt.customer_b",
        ["c_custkey"],
        n_buckets=8,
    )
    yield
    spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("bkt.orders_b")
        c = spark.table("bkt.customer_b")
        joined = o.join(c, o["o_custkey"] == c["c_custkey"])
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # bucket pruning metadata visible on the scan
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_skips_shuffle(spark, bucketed_tables):
    o = spark.table("bkt.orders_b")
    agg = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    o = spark.table("bkt.orders_b")
    c = spark.table("bkt.customer_b")
    got = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
    )
    plain = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))
