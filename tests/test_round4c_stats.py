"""Plan + invariant tests for the round-4c additions (queries_tpch2,
queries_stats): the oracle diff proves values; these guard the
100 TB-relevant plan shapes and the mathematical invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_baseball_spark.queries_stats import (
    q_bm25_rank,
    q_corr_matrix,
    q_groupwise_zscore,
    q_robust_stats,
    q_sequence_match,
)
from airflow_baseball_spark.queries_tpch2 import (
    q_tpch_q2ish,
    q_tpch_q11ish,
    q_tpch_q16ish,
    q_tpch_q20ish,
)

SF = "/root/testdata/sf0.001"


from tests.oracle_harness import plan_str as _plan  # noqa: E402


def test_q2ish_agg_and_window_share_one_partkey_exchange(spark):
    plan = _plan(q_tpch_q2ish(spark, SF))
    # groupBy(p_partkey, l_suppkey) then Window.partitionBy(p_partkey):
    # the window must reuse the agg's hash partitioning, adding an
    # exchange only if the partitioning is incompatible. p_partkey-only
    # window over (p_partkey, l_suppkey)-partitioned data needs its own
    # exchange, but there must be no third one.
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # part + supplier dims broadcast


def test_q11ish_fact_scanned_once(spark):
    plan = _plan(q_tpch_q11ish(spark, SF))
    # the global total is a window over the per-part aggregate, so the
    # plan contains exactly ONE parquet scan node (the crossJoin form
    # this replaced recomputed the agg subtree and scanned twice).
    # Count detail-section headers — the tree section repeats the name.
    import re

    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE)
    assert len(scans) == 1, plan
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_q16ish_anti_join_broadcasts(spark):
    plan = _plan(q_tpch_q16ish(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_q20ish_semi_join_broadcasts(spark):
    plan = _plan(q_tpch_q20ish(spark, SF))
    assert "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_corr_matrix_single_pass_and_bounds(spark):
    df = q_corr_matrix(spark, SF)
    plan = _plan(df)
    # one 1-row aggregate feeds all 6 pairs: a single scan, a single
    # global agg exchange, zero joins
    assert "Join" not in plan
    rows = df.collect()
    assert len(rows) == 6
    assert all(-1.0 <= r["pearson_r"] <= 1.0 for r in rows)


def test_groupwise_zscore_single_fact_shuffle(spark):
    plan = _plan(q_groupwise_zscore(spark, SF))
    # the only hash shuffle is the 5-group stats agg; scoring joins the
    # broadcast stats back without repartitioning the fact
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan  # the design explicitly avoids a window


def test_robust_stats_mad_nonnegative_and_median_sane(spark):
    rows = q_robust_stats(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["mad"] >= 0.0
        assert r["n"] > 0


def test_bm25_no_shuffle_scoring(spark):
    df = q_bm25_rank(spark, SF)
    plan = _plan(df)
    # corpus stats are a 1-row global agg; scoring must not hash-shuffle
    # the documents table
    assert plan.count("Exchange hashpartitioning") == 0
    assert "SortMergeJoin" not in plan
    rows = df.collect()
    assert all(r["bm25"] >= 0.0 for r in rows)


def test_bm25_zero_iff_no_term_occurrences(spark):
    # score is exactly 0 for docs containing none of the query terms,
    # strictly positive otherwise (idf > 0 because df < N/2 here)
    scores = {r["doc_id"]: r["bm25"] for r in q_bm25_rank(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert len(scores) == len(docs)
    for d in docs:
        toks = d["text"].split(" ")
        has_term = any(t in toks for t in ["spark", "window", "hash"])
        if has_term:
            assert scores[d["doc_id"]] > 0.0, d["doc_id"]
        else:
            assert scores[d["doc_id"]] == 0.0, d["doc_id"]


def test_sequence_match_one_user_shuffle_and_agrees_with_funnel_bound(spark):
    df = q_sequence_match(spark, SF)
    plan = _plan(df)
    # exactly one exchange node, hash-partitioned on user_id (the
    # ObjectHashAggregate tree prints args only in the detail section)
    assert "hashpartitioning(user_id" in plan
    assert sum(ln.strip().startswith("+- Exchange") for ln in plan.splitlines()) == 1
    rows = df.collect()
    # direct adjacency is a subset of the subsequence relation: every
    # direct converter has >= 1 view and >= 1 purchase event
    ev = spark.read.parquet(f"{SF}/events.parquet")
    both = {
        r["user_id"]
        for r in ev.groupBy("user_id")
        .agg(
            F.sum((F.col("event_type") == "view").cast("int")).alias("v"),
            F.sum((F.col("event_type") == "purchase").cast("int")).alias("p"),
        )
        .filter((F.col("v") > 0) & (F.col("p") > 0))
        .collect()
    }
    for r in rows:
        if r["converted_direct"]:
            assert r["user_id"] in both
