"""Invariant tests for the evaluation-statistics operators
(queries_eval): rank-based ROC-AUC, mutual information, Kaplan-Meier
survival curve."""

from __future__ import annotations

from airflow_baseball_spark.queries_eval import (
    q_auc_roc,
    q_cramers_v,
    q_kaplan_meier,
    q_mutual_information,
    q_theil_index,
    q_winsorized_mean,
    q_zipf_slope,
)

SF = "/root/testdata/sf0.001"


def test_auc_roc_bounds_and_u_consistency(spark):
    r = q_auc_roc(spark, SF).collect()[0]
    assert 0.0 <= r.auc <= 1.0
    # AUC is U/(n1*n0) by construction — verify the identity to 1e-6
    assert abs(r.auc - r.u_stat / (r.n_pos * r.n_neg)) < 1e-6
    # U is a half-integer (pair wins + half-ties)
    assert (2 * r.u_stat) == int(2 * r.u_stat)


def test_mutual_information_nonneg_and_bounded(spark):
    r = q_mutual_information(spark, SF).collect()[0]
    # MI >= 0 (rounding can only move it by 1e-6)
    assert r.mi_nats >= -1e-6
    # MI <= min(H(X), H(Y)) <= ln(n_cells)
    import math

    assert r.mi_nats <= math.log(max(r.n_cells, 2))


def test_kaplan_meier_monotone_nonincreasing(spark):
    rows = q_kaplan_meier(spark, SF).orderBy("day").collect()
    assert rows, "cohort must be non-empty"
    surv = [r.survival for r in rows]
    # survival is a nonincreasing step function in [0, 1]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))
    # risk set shrinks as days advance
    risks = [r.n_risk for r in rows]
    assert all(a > b for a, b in zip(risks, risks[1:]))
    # first step: survival = 1 - d1/n1 exactly (to rounding)
    r0 = rows[0]
    assert abs(r0.survival - (1.0 - r0.n_event / r0.n_risk)) < 2e-6


def test_theil_index_nonneg(spark):
    r = q_theil_index(spark, SF).collect()[0]
    assert r.n_orders > 0 and r.mean_price > 0
    # Theil T >= 0 with equality iff all values equal
    assert r.theil_t >= -1e-6


def test_cramers_v_bounds(spark):
    r = q_cramers_v(spark, SF).collect()[0]
    assert r.chi2 >= 0
    assert -1e-6 <= r.cramers_v <= 1.0 + 1e-6
    assert r.n_segments > 1 and r.n_nations > 1


def test_winsorized_mean_clamps_toward_center(spark):
    rows = q_winsorized_mean(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.p05 <= r.p95
        # winsorized mean lies within the clamp bounds
        assert r.p05 - 1e-9 <= r.mean_winsor <= r.p95 + 1e-9


def test_zipf_slope_negative(spark):
    r = q_zipf_slope(spark, SF).collect()[0]
    # sf0.001's vocabulary can be smaller than the 100-term cap
    assert 2 <= r.n_terms <= 100
    # frequency decreases with rank => negative slope
    assert r.zipf_slope < 0


def test_k_anonymity_consistency(spark):
    from airflow_baseball_spark.queries_eval import q_k_anonymity

    rows = q_k_anonymity(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_violating <= r.n_classes
        # every violating class holds < 5 rows
        assert r.n_suppressed_rows <= 4 * r.n_violating
        assert r.min_class_size >= 1


def test_dp_noisy_counts_bounded_noise(spark):
    from airflow_baseball_spark.queries_eval import q_dp_noisy_counts

    rows = q_dp_noisy_counts(spark, SF).collect()
    assert rows
    for r in rows:
        # eps=1 Laplace from a 32-bit coin: |noise| <= ln(2^31) ~ 21.5
        assert abs(r.noisy_n - r.true_n) <= 22.0
        # determinism: noise depends only on the group name
    again = {r.event_type: r.noisy_n for r in q_dp_noisy_counts(spark, SF).collect()}
    assert all(abs(again[r.event_type] - r.noisy_n) < 1e-9 for r in rows)


def test_mrr_bounds(spark):
    from airflow_baseball_spark.queries_eval import q_mrr_metric

    r = q_mrr_metric(spark, SF).collect()[0]
    assert 0 < r.n_converting <= r.n_users
    # MRR in (0, 1]; at least n_converting/n_users * (1/max_pos)
    assert 0 < r.mrr <= 1.0
    assert r.mrr >= r.n_converting / r.n_users / 10000


def test_ndcg_bounds(spark):
    from airflow_baseball_spark.queries_eval import q_ndcg_at5

    r = q_ndcg_at5(spark, SF).collect()[0]
    assert r.n_users > 0
    # NDCG normalized into (0, 1]
    assert 0 < r.mean_ndcg_at5 <= 1.0 + 1e-6


def test_stratified_kfold_balance(spark):
    from airflow_baseball_spark.queries_sampling import q_stratified_kfold

    rows = q_stratified_kfold(spark, SF).collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, {})[r.fold] = r.n_docs
    for lang, folds in per_lang.items():
        # stratification: fold sizes within each language differ by <= 1
        sizes = list(folds.values())
        assert max(sizes) - min(sizes) <= 1, (lang, folds)


def test_policy_replay_counts(spark):
    from airflow_baseball_spark.queries_eval import q_policy_replay_eval

    r = q_policy_replay_eval(spark, SF).collect()[0]
    assert 0 < r.n_matched <= r.n_eval
    assert abs(r.match_rate - r.n_matched / r.n_eval) < 1e-6
    assert r.matched_mean_value > 0 and r.overall_mean_value > 0


def test_qq_table_monotone_quantiles(spark):
    from airflow_baseball_spark.queries_eval import q_qq_table

    rows = sorted(q_qq_table(spark, SF).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 10))
    qp = [r.q_purchase for r in rows]
    qc = [r.q_click for r in rows]
    # quantiles are nondecreasing in the level
    assert all(a <= b for a, b in zip(qp, qp[1:]))
    assert all(a <= b for a, b in zip(qc, qc[1:]))
    for r in rows:
        assert abs(r.qq_diff - (r.q_purchase - r.q_click)) < 1e-6


def test_simpson_paradox_counts(spark):
    from airflow_baseball_spark.queries_eval import q_simpson_paradox

    rows = q_simpson_paradox(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.seg_a != r.seg_b
    assert 0 <= r.n_reversed <= r.n_strata


def test_ratio_metric_delta_brackets(spark):
    from airflow_baseball_spark.queries_eval import q_ratio_metric_delta

    r = q_ratio_metric_delta(spark, SF).collect()[0]
    assert r.n_users > 0
    assert r.ci_lo <= r.revenue_per_event <= r.ci_hi
    assert r.revenue_per_event > 0


def test_logrank_aa_is_noise(spark):
    from airflow_baseball_spark.queries_eval import q_logrank_test

    r = q_logrank_test(spark, SF).collect()[0]
    assert r.n_event_days > 0
    assert r.observed_a >= 0 and r.expected_a > 0
    # an A/A split should not produce an extreme statistic
    assert abs(r.logrank_z) < 6.0


def test_mcc_cells_partition(spark):
    from airflow_baseball_spark.queries_eval import q_mcc_score

    r = q_mcc_score(spark, SF).collect()[0]
    assert -1.0 - 1e-6 <= r.mcc <= 1.0 + 1e-6
    # the four cells partition the two-class sample
    assert r.tp + r.fn > 0 and r.tn + r.fp > 0


def test_churn_baseline_cells(spark):
    from airflow_baseball_spark.queries_eval import q_churn_baseline_eval

    r = q_churn_baseline_eval(spark, SF).collect()[0]
    assert r.tp + r.fp + r.fn + r.tn > 0
    assert 0.0 <= r.precision <= 1.0
    assert 0.0 <= r.recall <= 1.0
    assert 0.0 <= r.f1 <= 1.0


def test_l_diversity_bounds(spark):
    from airflow_baseball_spark.queries_eval import q_l_diversity

    rows = q_l_diversity(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_homogeneous_classes <= r.n_classes
        assert r.min_l >= 1
        # exposed members live only in homogeneous classes
        if r.n_homogeneous_classes == 0:
            assert r.n_exposed_members == 0
        else:
            assert r.n_exposed_members >= r.n_homogeneous_classes
