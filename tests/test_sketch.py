"""Invariant tests for queries_sketch (the oracle diff proves exact
values; these guard the estimator math and the funnel monotonicity)."""

from __future__ import annotations

from airflow_baseball_spark.queries_sketch import (
    q_hll_distinct,
    q_kmv_distinct,
    q_ordered_funnel,
    q_zone_map_prune,
)

SF = "/root/testdata/sf0.01"


def test_hll_registers_and_error(spark):
    rows = q_hll_distinct(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_regs <= 256
        assert r.n_regs + r.v_zero == 256
        # HLL with m=256: sigma ~= 1.04/sqrt(256) = 6.5% (raw branch),
        # linear counting much tighter; 5 sigma guard either way
        assert abs(r.hll_est - r.n_exact) <= max(0.35 * r.n_exact, 10)


def test_kmv_estimate(spark):
    rows = q_kmv_distinct(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.k_used <= 64
    if r.k_used == 64:
        # KMV k=64: sigma ~= 1/sqrt(62) ~= 12.7%; 5 sigma guard
        assert abs(r.kmv_est - r.n_exact) <= 0.65 * r.n_exact
    else:
        assert r.kmv_est == r.n_exact  # fewer than k: exact by design


def test_zone_map_layouts(spark):
    rows = {r.layout: r for r in q_zone_map_prune(spark, SF).collect()}
    assert set(rows) == {"date_clustered", "key_clustered"}
    dc, kc = rows["date_clustered"], rows["key_clustered"]
    # both layouts cover the identical fact table
    assert dc.n_rows_total == kc.n_rows_total
    assert dc.n_rows_match == kc.n_rows_match
    for r in (dc, kc):
        assert 0 <= r.n_pruned <= r.n_blocks
        assert r.n_rows_match <= r.n_rows_scanned <= r.n_rows_total
    # the punchline: date clustering must actually skip blocks, and
    # beat the uncorrelated key layout
    assert dc.prune_rate > kc.prune_rate
    assert dc.n_pruned > 0


def test_funnel_monotone(spark):
    rows = q_ordered_funnel(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    # each step is a strict refinement of the previous one
    assert r.n_view >= r.n_click >= r.n_purchase >= 0
    assert r.n_view > 0
    assert 0.0 <= r.view_to_click <= 1.0
    assert 0.0 <= r.click_to_purchase <= 1.0


def test_kmv_overlap_bounds(spark):
    from airflow_baseball_spark.queries_sketch import q_kmv_overlap

    r = q_kmv_overlap(spark, SF).collect()[0]
    assert r.n_both_exact <= min(r.n_a, r.n_b)
    assert 0.0 <= r.jaccard_exact <= 1.0
    assert 0.0 <= r.kmv_jaccard <= 1.0
    # sketch membership counts can't exceed k
    assert r.n_both_sketch <= 64
    # estimator sanity: within a wide guard of truth (k=64 is coarse)
    assert abs(r.kmv_jaccard - r.jaccard_exact) <= 0.35
    assert r.kmv_intersection <= (r.n_a + r.n_b) * 1.6


def test_embedding_outliers_partition(spark):
    from airflow_baseball_spark.queries_sketch import q_embedding_outliers

    rows = q_embedding_outliers(spark, SF).collect()
    # every vector assigned exactly once, to one of the 8 anchors
    assert len(rows) == len({r.vec_id for r in rows})
    assert {r.cid for r in rows} <= set(range(8))
    for r in rows:
        assert r.dm >= 0
        assert (r.is_outlier == 1) == (r.z_dist > 2.0)
    # anchors are distance 0 from themselves -> never outliers
    own = {r.vec_id: r for r in rows if r.vec_id < 8}
    for vid, r in own.items():
        if r.cid == vid:
            assert r.dm == 0


def test_minhash_calibration_bins(spark):
    from airflow_baseball_spark.queries_text import q_minhash_calibration

    rows = q_minhash_calibration(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.true_bin <= 10
        assert r.n_pairs >= 1
        assert 0.0 <= r.mean_true_jaccard <= 1.0
        assert 0.0 <= r.mean_est_jaccard <= 1.0
        # the bin's mean true jaccard must sit inside the bin
        assert r.true_bin / 10.0 <= r.mean_true_jaccard + 1e-9
        assert r.mean_true_jaccard <= (r.true_bin + 1) / 10.0 + 1e-9


def test_hll_daily_merge_identity(spark):
    from airflow_baseball_spark.queries_sketch import q_hll_daily_merge

    r = q_hll_daily_merge(spark, SF).collect()[0]
    # THE property: merged daily sketches == whole-range sketch
    assert r.est_equal == 1
    assert r.merged_regs == r.direct_regs
    assert r.merged_est == r.direct_est
    assert r.n_days >= 1


def test_stream_hll_matches_batch_sketch(spark):
    from airflow_baseball_spark.queries_sketch import (
        hll_finalize,
        hll_register_exprs,
    )
    from airflow_baseball_spark.queries_streaming import q_stream_hll_users
    from airflow_baseball_spark.schemas import load_table
    from pyspark.sql import functions as F

    stream_rows = {
        r.window_start: r for r in q_stream_hll_users(spark, SF).collect()
    }
    ev = load_table(spark, SF, "events")
    idx, rho = hll_register_exprs("user_id")
    regs = (
        ev.select(
            F.date_trunc("day", "ts").alias("window_start"),
            idx.alias("reg"),
            rho.alias("rho"),
        )
        .groupBy("window_start", "reg")
        .agg(F.max("rho").alias("mrho"))
    )
    batch_rows = {
        r.window_start: r
        for r in hll_finalize(regs, ["window_start"]).collect()
    }
    assert stream_rows.keys() == batch_rows.keys()
    for k, s in stream_rows.items():
        b = batch_rows[k]
        # the streaming sketch must land bit-for-bit on the batch one
        assert (s.n_regs, s.v_zero, s.hll_est) == (
            b.n_regs,
            b.v_zero,
            b.hll_est,
        )


def test_hll_num_constant_is_engine_portable(spark):
    """r11 regression pin for the LCG-literal rule on _HLL_NUM: the
    constant must parse to the SAME IEEE double on Spark, DuckDB,
    and Python. The old spelled-out arithmetic form parsed as
    DecimalType on Spark (Decimal('...627.007') vs double ...493e16,
    3.7e-9 relative) which flipped hll_est's 6th-decimal floor once
    the estimate reached ~1.4e3 -- first visible at sf0.1
    (hll_distinct / stream_hll_users, ORACLE_SF01_r11.txt), invisible
    at driver sf because the linear-counting branch bypasses the
    constant."""
    import duckdb

    from pyspark.sql import functions as F

    from airflow_baseball_spark.queries_sketch import _HLL_NUM

    py = (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 1099511627776.0
    sv = spark.range(1).select(F.expr(_HLL_NUM).alias("c")).collect()[0].c
    assert isinstance(sv, float), f"Spark parsed _HLL_NUM as {type(sv)}"
    assert sv == py
    dv = duckdb.connect().execute(f"SELECT {_HLL_NUM}").fetchall()[0][0]
    assert dv == py
