"""Property checks for the round-7 query additions (each also has a
DuckDB oracle twin; these pin the domain invariants the hash cannot
express)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_map_at_k_bounds(spark):
    from airflow_baseball_spark.queries_eval import q_map_at_k

    r = q_map_at_k(spark, SF).collect()[0]
    assert r.n_users > 0
    assert 0.0 <= r.map_at_10 <= 1.0


def test_ipw_ate_counts(spark):
    from airflow_baseball_spark.queries_eval import q_ipw_ate

    r = q_ipw_ate(spark, SF).collect()[0]
    assert 0 < r.n_treated < r.n_orders


def test_price_dispersion_invariants(spark):
    from airflow_baseball_spark.queries_relational2 import q_price_dispersion

    rows = q_price_dispersion(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.mean_price > 0 and r.sd_price >= 0 and r.cv >= 0


def test_acf_seven_lags_bounded(spark):
    from airflow_baseball_spark.queries_timeseries import q_acf_lags

    rows = q_acf_lags(spark, SF).collect()
    assert len(rows) == 7
    for r in rows:
        # sample ACF with the full-series denominator stays in ~[-1,1]
        assert abs(r.acf) <= 1.0


def test_ljung_box_nonnegative(spark):
    from airflow_baseball_spark.queries_timeseries import q_ljung_box

    r = q_ljung_box(spark, SF).collect()[0]
    assert r.ljung_box_q >= 0.0 and r.n_lags == 7


def test_permutation_test_pvalue(spark):
    from airflow_baseball_spark.queries_sampling import q_permutation_test

    r = q_permutation_test(spark, SF).collect()[0]
    assert 0.0 < r.p_value <= 1.0
    assert 0 <= r.n_replicates_ge <= 64


def test_weighted_median_global_in_range(spark):
    from pyspark.sql import functions as F

    from airflow_baseball_spark.queries_relational2 import q_weighted_median
    from airflow_baseball_spark.schemas import load_table

    r = q_weighted_median(spark, SF).collect()[0]
    mm = load_table(spark, SF, "lineitem").agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    ).collect()[0]
    assert mm.lo <= r.weighted_median_price <= mm.hi


def test_iqr_outlier_rate_bounds(spark):
    from airflow_baseball_spark.queries_relational2 import q_iqr_outlier_rate

    rows = q_iqr_outlier_rate(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_outliers <= r.n_orders
        assert 0.0 <= r.outlier_rate <= 1.0


def test_decile_transition_partition(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_decile_transition_matrix,
    )

    rows = q_decile_transition_matrix(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.decile_1997 <= 10 and 0 <= r.decile_1998 <= 10
    # nobody can be absent in both years
    assert not any(
        r.decile_1997 == 0 and r.decile_1998 == 0 for r in rows
    )


def test_not_in_null_trap_ansi(spark):
    from airflow_baseball_spark.queries_relational2 import q_not_in_null_trap

    r = q_not_in_null_trap(spark, SF).collect()[0]
    assert r.n_null_fk > 0  # the dirtying fires
    assert r.n_not_in == 0  # ANSI: NOT IN vs NULL matches nothing
    assert 0 <= r.n_not_exists <= r.n_customers


def test_semi_additive_months(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_semi_additive_month_end,
    )

    rows = q_semi_additive_month_end(spark, SF).collect()
    assert rows
    for r in rows:
        assert 190001 <= r.ym <= 210012
        assert r.n_accounts > 0


def test_dedup_levenshtein_canonical(spark):
    from airflow_baseball_spark.queries_text import q_dedup_levenshtein

    rows = q_dedup_levenshtein(spark, SF).collect()
    for r in rows:
        assert r.id_a < r.id_b
        assert 0 <= r.edit_dist <= 16


def test_brand_percent_rank_bounds(spark):
    from airflow_baseball_spark.queries_relational2 import q_brand_percent_rank

    rows = q_brand_percent_rank(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.pct_rank <= 1.0
        assert 0.0 < r.cume_dist <= 1.0
