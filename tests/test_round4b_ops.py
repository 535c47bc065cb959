"""Unit tests for the round-4b additions: segment-level dedup,
point-in-time SCD2 join, and the stream-stream interval join.

Each test drives the operator on a tiny hand-built frame where the
expected output is derivable by inspection — the driver's DuckDB
differential check covers the corpus-scale behavior; these pin the
edge semantics (empty docs, all-duplicate docs, half-open interval
boundaries, open SCD2 versions)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from airflow_baseball_spark.operators.scd import point_in_time_join, scd2
from airflow_baseball_spark.text.dedup import segment_dedup


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_segment_dedup_drops_repeats_keeps_first(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c d"),   # segs (W=2): "a b", "c d"
            (1, "a b x y"),   # "a b" repeats doc0 -> dropped
            (2, "c d"),       # fully duplicate -> kept_text ""
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in segment_dedup(docs, seg_words=2).collect()}
    assert out[0]["n_segs"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["kept_text"] == "a b c d"
    assert out[1]["n_segs"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["kept_text"] == "x y"
    assert out[2]["n_segs"] == 1 and out[2]["n_kept"] == 0
    assert out[2]["kept_text"] == ""


def test_segment_dedup_ragged_tail_is_its_own_segment(spark):
    # "c" alone (tail of doc 0) and "c d" (doc 1) hash differently —
    # the tail must not be padded or merged into a full-width segment
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "c d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in segment_dedup(docs, seg_words=2).collect()}
    assert out[0]["n_segs"] == 2 and out[0]["kept_text"] == "a b c"
    assert out[1]["n_segs"] == 1 and out[1]["kept_text"] == "c d"


def test_pit_join_half_open_intervals_and_open_version(spark):
    t = lambda s: dt.datetime(2024, 1, 1, int(s))  # noqa: E731
    ev = spark.createDataFrame(
        [
            (1, "A", t("1"), 10),
            (1, "A", t("2"), 11),
            (1, "B", t("3"), 12),  # version 2 starts at 03:00
        ],
        "user_id long, event_type string, ts timestamp, event_id long",
    )
    dim = scd2(ev, key="user_id", attr="event_type", ts="ts", tiebreak="event_id")
    facts = spark.createDataFrame(
        [
            (1, 100, t("2")),  # inside version 1
            (1, 101, t("3")),  # exactly at version-2 start -> version 2
            (1, 102, t("9")),  # open current version
        ],
        "user_id long, event_id long, ts timestamp",
    )
    out = point_in_time_join(facts, dim, key="user_id", fact_ts="ts")
    got = {r["event_id"]: (r["event_type"], r["version_n"]) for r in out.collect()}
    assert got == {100: ("A", 1), 101: ("B", 2), 102: ("B", 2)}


def test_pit_join_fact_before_first_version_drops(spark):
    t = lambda s: dt.datetime(2024, 1, 1, int(s))  # noqa: E731
    ev = spark.createDataFrame(
        [(1, "A", t("5"), 10)],
        "user_id long, event_type string, ts timestamp, event_id long",
    )
    dim = scd2(ev, key="user_id", attr="event_type", ts="ts", tiebreak="event_id")
    facts = spark.createDataFrame(
        [(1, 100, t("1"))], "user_id long, event_id long, ts timestamp"
    )
    out = point_in_time_join(facts, dim, key="user_id", fact_ts="ts")
    assert out.count() == 0  # no state existed yet: no leakage backfill


def test_stream_stream_pairs_matches_batch_interval_join(spark, tmp_path):
    """The drained stream-stream join must equal the plain batch
    interval join over the same events (the oracle relation)."""
    from airflow_baseball_spark.streaming.jobs import (
        read_events_stream,
        run_stream_stream_join_available_now,
    )

    sf = "/root/testdata/sf0.001"
    got = _rows(
        run_stream_stream_join_available_now(spark, sf),
        "user_id", "click_ts", "purchase_ts",
    )
    ev = read_events_stream(spark, sf)  # just for schema parity docs
    assert set(ev.columns) >= {"user_id", "ts", "event_type"}
    batch = spark.read.parquet(f"{sf}/events.parquet")
    ts = (
        F.expr("timestamp_micros(ts div 1000)")
        if dict(batch.dtypes)["ts"] == "bigint"
        else F.col("ts").cast("timestamp")
    )
    batch = batch.withColumn("ts", ts)
    c = batch.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    p = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("purchase_ts")
    )
    want = _rows(
        c.join(
            p,
            (F.col("user_id") == F.col("u2"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
        ),
        "user_id", "click_ts", "purchase_ts",
    )
    assert got == want and len(want) > 0


def test_pq_adc_topk_hand_derivable(spark):
    """PQ with 2 subspaces over hand-built 4-d vectors: codes, the ADC
    lookup sums, and both tie-break rules are derivable on paper.

    corpus: c0=[0,0,0,0] (id 0), c1=[1,1,1,1] (id 1), v2=[1,1,0,0]
    (id 2, codes (c1, c0) -> ADC 40000); query q=[.9,.9,.1,.1] ranks
    v2 first, then the c0/c1 tie (both 1640000) breaks to the lower id.
    """
    from airflow_baseball_spark.text.similarity import pq_adc_topk

    schema = "vec_id long, embedding array<double>"
    corpus = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, 1.0, 1.0, 1.0]), (2, [1.0, 1.0, 0.0, 0.0])],
        schema,
    )
    queries = spark.createDataFrame([(10, [0.9, 0.9, 0.1, 0.1])], schema)
    codewords = corpus.filter("vec_id < 2")
    out = pq_adc_topk(corpus, queries, codewords, n_subspaces=2, k=3).collect()
    got = [(r["rank"], r["neighbor_id"], r["adc_micro"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [(1, 2, 40000), (2, 0, 1640000), (3, 1, 1640000)]


def test_dq_report_counts_each_constraint_kind(spark):
    from airflow_baseball_spark.operators.quality import dq_report

    fact = spark.createDataFrame(
        [
            (1, 10, 5.0),    # clean
            (1, 10, 5.0),    # duplicate key 1
            (2, None, 5.0),  # null fk
            (3, 99, -1.0),   # orphan fk + range violation
        ],
        "k long, fk long, x double",
    )
    dim = spark.createDataFrame([(10,), (11,)], "id long")
    rep = dq_report(
        fact,
        key_cols=["k"],
        not_null=["fk"],
        ranges={"x": (0.0, 10.0)},
        refs=[("fk", dim, "id")],
    )
    got = {r["check_name"]: r["n_violations"] for r in rep.collect()}
    assert got == {"null_fk": 1, "range_x": 1, "dup_k": 1, "orphan_fk": 1}


def test_dq_report_clean_table_is_all_zero(spark):
    from airflow_baseball_spark.operators.quality import dq_report

    fact = spark.createDataFrame([(1, 10, 5.0)], "k long, fk long, x double")
    dim = spark.createDataFrame([(10,)], "id long")
    rep = dq_report(
        fact, key_cols=["k"], not_null=["fk"],
        ranges={"x": (0.0, 10.0)}, refs=[("fk", dim, "id")],
    )
    assert {r["n_violations"] for r in rep.collect()} == {0}
