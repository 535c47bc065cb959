"""Invariant tests for the round-5 sampling/quarantine additions."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_class_balance_equal_counts(spark):
    from airflow_baseball_spark.queries_sampling import q_class_balance

    rows = q_class_balance(spark, SF).collect()
    assert rows
    kept = {r.n_kept for r in rows}
    assert len(kept) == 1  # every label keeps exactly min-class-count


def test_churn_flag_threshold(spark):
    from airflow_baseball_spark.queries_sampling import q_churn_flag

    rows = q_churn_flag(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.idle_hours >= 0.0
        assert r.churned == (r.idle_hours > 7 * 24)


def test_quarantine_partitions_rows(spark):
    from airflow_baseball_spark.queries_streaming import q_corrupt_quarantine

    rows = q_corrupt_quarantine(spark, SF).collect()
    assert rows
    total_quarantined = 0
    for r in rows:
        assert r.n_parsed + r.n_quarantined == r.n_total
        total_quarantined += r.n_quarantined
    assert total_quarantined > 0  # the mangle actually fires


def test_shard_plan_partitions_all_assets(spark):
    from airflow_baseball_spark.queries_multimodal import q_media_shard_plan

    rows = sorted(
        q_media_shard_plan(spark, SF).collect(), key=lambda r: r.shard_id
    )
    assert rows
    # shard ids are contiguous from 0 and every asset lands somewhere
    assert rows[0].shard_id == 0
    assert [r.shard_id for r in rows] == list(range(len(rows)))
    # every full shard crosses the target only via its LAST asset:
    # bytes-before < target ⇒ shard_bytes < target + max_asset
    assert all(r.n_assets > 0 for r in rows)


def test_aspect_buckets_sane(spark):
    from airflow_baseball_spark.queries_multimodal import q_aspect_bucket

    rows = q_aspect_bucket(spark, SF).collect()
    assert rows
    for r in rows:
        # width 16..1024, height 16..768 → 10w//h in [0, 640]
        assert 0 <= r.aspect_bucket <= 640
        assert r.total_pixels > 0


def test_sql_api_matches_dsl_plan(spark):
    from airflow_baseball_spark.queries_relational2 import q_sql_api_pricing

    rows = q_sql_api_pricing(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.count_order > 0
        # micro-unit BIGINT since r7 (0..200000 == 0.0..0.2)
        assert 0 <= r.avg_disc_micro <= 200000


def test_calendar_dim_dense_and_consistent(spark):
    from airflow_baseball_spark.queries_relational2 import q_calendar_dim

    rows = sorted(q_calendar_dim(spark, SF).collect(), key=lambda r: r.d)
    assert rows
    # dense daily spine
    assert (rows[-1].d - rows[0].d).days + 1 == len(rows)
    for r in rows[:50]:
        assert r.quarter0 == (r.mo - 1) // 3
        assert 0 <= r.dow_wed0 <= 6


def test_stream_quarantine_matches_batch(spark):
    from airflow_baseball_spark.queries_streaming import (
        q_corrupt_quarantine,
        q_stream_quarantine,
    )

    batch = {r.event_type: r for r in q_corrupt_quarantine(spark, SF).collect()}
    stream = {r.event_type: r for r in q_stream_quarantine(spark, SF).collect()}
    assert batch.keys() == stream.keys()
    for t in batch:
        assert batch[t].n_parsed == stream[t].n_parsed
        assert batch[t].n_quarantined == stream[t].n_quarantined
        assert batch[t].k_sum == stream[t].k_sum


def test_stream_windowed_users_exact(spark):
    from airflow_baseball_spark.queries_streaming import q_stream_windowed_users
    from airflow_baseball_spark.schemas import load_table
    from pyspark.sql import functions as F

    stream = {
        r.window_start: r.n_active_users
        for r in q_stream_windowed_users(spark, SF).collect()
    }
    batch = {
        r.d: r.n
        for r in load_table(spark, SF, "events")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert stream == batch
