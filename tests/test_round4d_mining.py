"""Plan + invariant tests for queries_mining and the hopping-window
streaming job."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_baseball_spark.queries_mining import (
    q_basket_pairs,
    q_psi_drift,
    q_rfm_segments,
)
from airflow_baseball_spark.streaming import jobs

SF = "/root/testdata/sf0.001"


from tests.oracle_harness import plan_str as _plan  # noqa: E402


def test_basket_pairs_no_fact_self_join(spark):
    plan = _plan(q_basket_pairs(spark, SF))
    # pair expansion is in-row (Generate/explode), never a fact⋈fact
    # self-join on orderkey
    assert "Generate" in plan and "explode(" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    rows = q_basket_pairs(spark, SF).collect()
    for r in rows:
        assert r["brand_a"] < r["brand_b"]  # canonical pair order
        assert r["support"] >= 5
        assert r["lift"] > 0.0


def test_psi_drift_terms_and_identity(spark):
    rows = q_psi_drift(spark, SF).collect()
    assert rows
    # every PSI term is non-negative: (p-q) and ln(p/q) share sign
    for r in rows:
        assert r["psi_term"] >= 0.0
        assert r["n_a"] > 0 and r["n_b"] > 0


def test_rfm_no_global_window(spark):
    df = q_rfm_segments(spark, SF)
    plan = _plan(df)
    # the scale-safe design: quartile boundaries broadcast back, no
    # single-partition NTILE window over all customers
    assert "Window" not in plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_score"] <= 4
        assert 1 <= r["f_score"] <= 4
        assert 1 <= r["m_score"] <= 4
        assert r["segment"] in {"champion", "dormant", "regular"}


def test_rfm_scores_partition_customers_roughly_evenly(spark):
    rows = q_rfm_segments(spark, SF).collect()
    n = len(rows)
    for key in ("r_score", "f_score", "m_score"):
        for tile in (1, 2, 3, 4):
            cnt = sum(1 for r in rows if r[key] == tile)
            # boundary ties can imbalance tiles, but no tile may be
            # empty or hold the majority on ~150 customers
            assert 0 < cnt < n * 0.6, (key, tile, cnt, n)


def test_hopping_counts_each_event_in_two_windows(spark):
    out = jobs.run_hopping_counts_available_now(spark, SF)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert total == 2 * n_events
    # and every (window, type) is unique — state rows, not duplicates
    n = out.count()
    assert out.select("window_start", "event_type").distinct().count() == n


def test_triangle_count_invariants(spark):
    from airflow_baseball_spark.queries_mining import q_triangle_count

    row = q_triangle_count(spark, SF).collect()[0]
    # triangles close wedges: 3T <= W; transitivity in [0, 1]
    assert 3 * row["n_triangles"] <= row["n_wedges"]
    assert 0.0 <= row["transitivity"] <= 1.0
    # handshake bound: wedges consistent with a simple graph
    assert row["n_edges"] <= row["n_vertices"] * (row["n_vertices"] - 1) // 2
