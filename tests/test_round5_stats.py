"""Plan + invariant tests for the round-5 stats additions
(queries_stats): mode, ordered string_agg, Welch t-test, Benford
profile, percent-of-total."""

from __future__ import annotations

import re

from airflow_baseball_spark.queries_stats import (
    q_benford_digits,
    q_mode_per_group,
    q_percent_of_total,
    q_string_agg_topn,
    q_welch_ttest,
)

SF = "/root/testdata/sf0.001"

from tests.oracle_harness import plan_str as _plan  # noqa: E402


def test_mode_unique_per_group(spark):
    rows = q_mode_per_group(spark, SF).collect()
    segs = [r.c_mktsegment for r in rows]
    assert len(segs) == len(set(segs))  # exactly one mode row per segment
    assert all(r.n > 0 for r in rows)


def test_string_agg_order_and_arity(spark):
    rows = q_string_agg_topn(spark, SF).collect()
    assert rows
    for r in rows:
        names = r.top3_names.split(",")
        assert 1 <= len(names) <= 3
        assert all(n.startswith("Customer#") for n in names)


def test_welch_single_pass(spark):
    df = q_welch_ttest(spark, SF)
    plan = _plan(df)
    # conditional sufficient stats in ONE aggregate: one scan, no join
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE)
    assert len(scans) == 1, plan
    r = df.collect()[0]
    assert r.n1 > 1 and r.n2 > 1
    # df is bounded by min(n1,n2)-1 .. n1+n2-2
    assert min(r.n1, r.n2) - 1 <= r.welch_df <= r.n1 + r.n2 - 2


def test_benford_probabilities_sum_to_one(spark):
    rows = q_benford_digits(spark, SF).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed_p for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.chi_term >= 0.0


def test_percent_of_total_shares(spark):
    rows = q_percent_of_total(spark, SF).collect()
    assert abs(sum(r.share_of_total for r in rows) - 1.0) < 1e-4
    by_region: dict[str, float] = {}
    for r in rows:
        by_region[r.region] = by_region.get(r.region, 0.0) + r.share_of_region
    for tot in by_region.values():
        assert abs(tot - 1.0) < 1e-4


def test_groupwise_regression_per_type(spark):
    from airflow_baseball_spark.queries_stats import q_groupwise_regression

    rows = q_groupwise_regression(spark, SF).collect()
    assert rows
    types = [r.event_type for r in rows]
    assert len(types) == len(set(types))
    for r in rows:
        assert r.n > 2
        # fitted mean must equal observed mean: intercept + slope·x̄ ≈ ȳ,
        # loosely bounded here (exact check is the oracle's job)
        assert abs(r.slope) < 100


def test_ks_statistic_bounds(spark):
    from airflow_baseball_spark.queries_stats import q_ks_statistic

    r = q_ks_statistic(spark, SF).collect()[0]
    assert r.n_purchase > 0 and r.n_click > 0
    assert 0.0 <= r.ks_stat <= 1.0 + 1e-9


def test_hill_tail_index_positive(spark):
    from airflow_baseball_spark.queries_stats import q_hill_tail_index

    r = q_hill_tail_index(spark, SF).collect()[0]
    assert r.k == 200
    assert r.threshold > 0
    assert r.hill_alpha > 0


def test_burstiness_nonneg(spark):
    from airflow_baseball_spark.queries_stats import q_burstiness_index

    rows = q_burstiness_index(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.fano_factor >= 0
        assert r.n_events >= r.n_days  # at least one event per active day


def test_cross_correlation_full_lag_range(spark):
    from airflow_baseball_spark.queries_stats import q_cross_correlation

    rows = q_cross_correlation(spark, SF).collect()
    lags = sorted(r.lag_days for r in rows)
    assert lags == list(range(-3, 4))
    for r in rows:
        assert -1.0 - 1e-6 <= r.r <= 1.0 + 1e-6
        assert r.n_pairs > 2


def test_session_entropy_bounds(spark):
    import math

    from airflow_baseball_spark.queries_stats import q_session_entropy

    r = q_session_entropy(spark, SF).collect()[0]
    assert r.n_users > 0
    # entropy over 5 event types is bounded by ln 5
    assert 0 <= r.mean_entropy_nats <= math.log(5) + 1e-6
    assert 0 <= r.single_type_share <= 1


def test_anova_f_nonneg(spark):
    from airflow_baseball_spark.queries_stats import q_anova_f

    r = q_anova_f(spark, SF).collect()[0]
    assert r.n_groups == 7
    assert r.n_days >= r.n_groups
    assert r.f_stat >= 0


def test_anova_two_way_decomposition(spark):
    from airflow_baseball_spark.queries_stats import q_anova_two_way

    r = q_anova_two_way(spark, SF).collect()[0]
    assert r.n_weekdays == 7 and r.n_types == 5
    # all SS nonnegative except interaction may wobble near 0 in
    # the Type-I-style decomposition on unbalanced counts
    assert r.ss_weekday >= -1e-6
    assert r.ss_type >= -1e-6
    assert r.ss_within >= -1e-6


def test_peak_concurrency_bounds(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_peak_concurrency,
    )

    r = q_peak_concurrency(spark, SF).collect()[0]
    assert 1 <= r.peak_concurrency <= r.n_sessions
    assert r.peak_epoch_s > 0


def test_cvm_nonneg(spark):
    from airflow_baseball_spark.queries_stats import q_cvm_statistic

    r = q_cvm_statistic(spark, SF).collect()[0]
    assert r.cvm_t >= 0
    assert r.n_purchase > 0 and r.n_click > 0


def test_theil_sen_and_kendall_invariants(spark):
    from airflow_baseball_spark.queries_stats import (
        q_kendall_tau,
        q_theil_sen_slope,
    )

    sf = "/root/testdata/sf0.001"
    ts = q_theil_sen_slope(spark, sf).collect()[0]
    assert ts.n_pairs == ts.n_days * (ts.n_days - 1) // 2
    # median slope sits between the min and max possible slopes -> the
    # reported double mirrors the integer micro value
    assert abs(ts.ts_slope_cents - ts.median_slope_micro / 1e6) < 1e-6

    kt = q_kendall_tau(spark, sf).collect()[0]
    assert kt.n_pairs == kt.n_days * (kt.n_days - 1) // 2
    assert kt.n_concordant + kt.n_discordant <= kt.n_pairs
    assert -1.0 <= kt.tau_b <= 1.0
