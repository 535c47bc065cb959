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


def test_kruskal_wallis_invariants(spark):
    from airflow_baseball_spark.queries_stats import q_kruskal_wallis

    r = q_kruskal_wallis(spark, SF).collect()[0]
    assert r.k_groups == 5 and r.n > 0
    # H is nonnegative; tie correction can only GROW the statistic
    assert r.h_stat >= 0.0
    assert r.h_tie_corrected >= r.h_stat


def test_gumbel_return_level_ordering(spark):
    from airflow_baseball_spark.queries_stats import q_gumbel_return_level

    r = q_gumbel_return_level(spark, SF).collect()[0]
    assert r.n_weeks > 50
    assert r.sd_weekly_max > 0
    # the 52-week return level must sit above the fitted location
    assert r.return_level_52w > r.gumbel_mu
    assert r.gumbel_beta > 0


def test_t_closeness_bounds(spark):
    from airflow_baseball_spark.queries_stats import q_t_closeness

    rows = q_t_closeness(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.t_closeness <= 1.0
        assert r.n_class > 0


def test_rdd_estimate_consistency(spark):
    from airflow_baseball_spark.queries_eval import q_rdd_estimate

    r = q_rdd_estimate(spark, SF).collect()[0]
    assert r.n_left > 0 and r.n_right > 0
    assert abs(r.rdd_effect - (r.intercept_right - r.intercept_left)) < 2e-6


def test_ece_bounds(spark):
    from airflow_baseball_spark.queries_eval import q_ece_calibration

    r = q_ece_calibration(spark, SF).collect()[0]
    assert r.n_test > 0
    assert 0.0 <= r.ece <= r.max_gap <= 1.0
    assert 1 <= r.n_bins_nonempty <= 10


def test_macro_f1_shape(spark):
    from airflow_baseball_spark.queries_eval import q_macro_f1

    rows = {r.klass: r for r in q_macro_f1(spark, SF).collect()}
    assert len(rows) == 6 and "MACRO" in rows
    for k, r in rows.items():
        assert 0.0 <= r.precision <= 1.0
        assert 0.0 <= r.recall <= 1.0
        assert 0.0 <= r.f1 <= 1.0
    # macro n_true is the whole test split
    assert rows["MACRO"].n_true == sum(
        r.n_true for k, r in rows.items() if k != "MACRO"
    )


def test_rsi_bounds(spark):
    from airflow_baseball_spark.queries_timeseries import q_rsi_indicator

    rows = q_rsi_indicator(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mean_rsi <= 100.0
        assert r.days_overbought + r.days_oversold <= r.n_days


def test_bollinger_breach_rate(spark):
    from airflow_baseball_spark.queries_timeseries import q_bollinger_bands

    rows = q_bollinger_bands(spark, SF).collect()
    assert rows
    for r in rows:
        # 2-sigma breaches are rare by construction (<~25% even on
        # skewed series; Chebyshev guarantees <=25% per side)
        assert r.upper_breaches + r.lower_breaches <= r.n_days * 0.5
        assert r.mean_rel_bandwidth > 0


def test_vwap_deviation_identity(spark):
    from airflow_baseball_spark.queries_relational2 import q_vwap_deviation

    rows = q_vwap_deviation(spark, SF).collect()
    assert len(rows) >= 12
    g = rows[0].vwap_global
    for r in rows:
        assert r.vwap_global == g
        assert abs(r.rel_deviation) < 1.0


def test_eoq_positive(spark):
    from airflow_baseball_spark.queries_relational2 import q_eoq_stocking

    rows = q_eoq_stocking(spark, SF).collect()
    assert len(rows) == 25
    for r in rows:
        assert r.eoq_units > 0 and r.orders_per_year > 0


def test_jarque_bera_invariants(spark):
    from airflow_baseball_spark.queries_stats import q_jarque_bera

    r = q_jarque_bera(spark, SF).collect()[0]
    assert r.n > 0 and r.jb_stat >= 0.0


def test_grubbs_invariants(spark):
    from airflow_baseball_spark.queries_stats import q_grubbs_test

    r = q_grubbs_test(spark, SF).collect()[0]
    assert r.n_days > 100
    # Grubbs G is bounded by (n-1)/sqrt(n)
    assert 0.0 < r.g_stat < (r.n_days - 1) / (r.n_days ** 0.5)
    assert r.abs_deviation_dollars > 0


def test_cochran_q_invariants(spark):
    from airflow_baseball_spark.queries_stats import q_cochran_q

    r = q_cochran_q(spark, SF).collect()[0]
    assert r.df == 2 and r.q_stat >= 0.0
    for g in (r.active_1995, r.active_1996, r.active_1997):
        assert 0 < g <= r.n_subjects


def test_regression_diagnostics_bounds(spark):
    from airflow_baseball_spark.queries_timeseries import (
        q_regression_diagnostics,
    )

    r = q_regression_diagnostics(spark, SF).collect()[0]
    assert 0.0 <= r.durbin_watson <= 4.0
    assert -1.0 <= r.rho1_approx <= 1.0
    assert r.breusch_pagan_lm >= 0.0


def test_stickiness_bounds(spark):
    from airflow_baseball_spark.queries_timeseries import (
        q_stickiness_dau_mau,
    )

    rows = q_stickiness_dau_mau(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.stickiness <= 1.0
        assert r.avg_dau <= r.mau


def test_bitemporal_asof_dominance(spark):
    from airflow_baseball_spark.queries_relational2 import q_bitemporal_asof

    rows = q_bitemporal_asof(spark, SF).collect()
    assert rows
    import datetime

    for r in rows[:50]:
        assert r.valid_from <= datetime.date(1996, 1, 1)
        assert r.known_at <= datetime.date(1996, 7, 1)
        assert r.unit_price_cents > 0


def test_curriculum_phases_partition(spark):
    from airflow_baseball_spark.queries_llm import q_curriculum_phases

    rows = q_curriculum_phases(spark, SF).collect()
    assert [r.phase for r in rows] == [1, 2, 3, 4]
    # phases partition the corpus; cumulative budget telescopes
    for prev, cur in zip(rows, rows[1:]):
        assert cur.tokens_before == prev.tokens_before + prev.tokens
        assert prev.max_tok <= cur.min_tok
    assert rows[0].tokens_before == 0


def test_bloom_fpr_calibration(spark):
    from airflow_baseball_spark.queries_sketch import q_bloom_fpr_audit

    r = q_bloom_fpr_audit(spark, SF).collect()[0]
    assert r.n_probes == 10000
    assert 0 < r.bits_set <= 2 * r.n_keys
    # measured FPR should be the right order of magnitude vs theory
    assert r.measured_fpr <= 10 * r.theoretical_fpr + 0.01


def test_median_polish_shape(spark):
    from airflow_baseball_spark.queries_stats import q_median_polish

    rows = q_median_polish(spark, SF).collect()
    comps = {}
    for r in rows:
        comps.setdefault(r.component, []).append(r)
    assert set(comps) == {"row", "col", "resid_l1"}
    assert len(comps["col"]) == 12
    assert len(comps["resid_l1"]) == 1
    assert comps["resid_l1"][0].effect_cents >= 0
    # integer exactness: every effect is a whole number of cents
    for r in rows:
        assert isinstance(r.effect_cents, int)


def test_lcs_rouge_invariants(spark):
    from airflow_baseball_spark.queries_text import q_lcs_rouge

    rows = q_lcs_rouge(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        # LCS is bounded by the shorter sequence; F in [0,1]
        assert 0 <= r.lcs_len <= min(r.n_a, r.n_b)
        assert 0.0 <= r.rouge_f <= 1.0
    # a document shares a full-length LCS with itself: sanity that at
    # least some pair overlaps (same-source synthetic text)
    assert any(r.lcs_len > 0 for r in rows)


def test_wavelet_energy_shares(spark):
    from airflow_baseball_spark.queries_timeseries import q_wavelet_energy

    rows = q_wavelet_energy(spark, SF).collect()
    assert [r.level for r in rows] == [1, 2, 3, 4, 5]
    assert [r.scale_days for r in rows] == [2, 4, 8, 16, 32]
    assert abs(sum(r.energy_share for r in rows) - 1.0) < 1e-5
    for r in rows:
        assert r.energy_e18 >= 0 and 0.0 <= r.energy_share <= 1.0


def test_demand_classification_partition(spark):
    from airflow_baseball_spark.queries_timeseries import (
        q_demand_classification,
    )

    rows = q_demand_classification(spark, SF).collect()
    assert len(rows) == 25
    for r in rows:
        assert r.adi >= 1.0  # by definition n_weeks >= weeks_with_demand
        assert r.cv2 >= 0.0
        assert r.demand_class in {
            "smooth", "intermittent", "erratic", "lumpy"
        }


def test_mahalanobis_mean_identity(spark):
    from airflow_baseball_spark.queries_stats import q_mahalanobis_outliers

    r = q_mahalanobis_outliers(spark, SF).collect()[0]
    # population Mahalanobis d^2 averages to the dimension exactly
    assert abs(r.mean_d2_check - 2.0) < 1e-3
    assert 0 <= r.n_outliers_99 <= r.n
    assert r.max_d2 > 9.21034 or r.n_outliers_99 == 0


def test_hurst_bounds(spark):
    from airflow_baseball_spark.queries_timeseries import q_hurst_exponent

    r = q_hurst_exponent(spark, SF).collect()[0]
    assert r.n_blocks > 0
    # R/S grows with block size for any real series
    assert r.mean_lnrs_16 < r.mean_lnrs_128
    assert 0.0 < r.hurst < 1.5


def test_rmst_bounds(spark):
    from airflow_baseball_spark.queries_eval import q_rmst_survival

    r = q_rmst_survival(spark, SF).collect()[0]
    assert r.tau_days == 30
    # RMST is a mean of values clipped to [0, tau]
    assert 0.0 <= r.rmst_days <= 30.0


def test_tail_dependence_bounds(spark):
    from airflow_baseball_spark.queries_stats import q_tail_dependence

    r = q_tail_dependence(spark, SF).collect()[0]
    assert 0 < r.n_lat_hi < r.n_orders
    assert r.n_joint_hi <= r.n_lat_hi
    assert r.n_joint_lo <= r.n_lat_lo
    assert 0.0 <= r.lambda_upper <= 1.0
    assert 0.0 <= r.lambda_lower <= 1.0


def test_icc_bounds(spark):
    from airflow_baseball_spark.queries_stats import q_icc_intraclass

    r = q_icc_intraclass(spark, SF).collect()[0]
    assert r.n_customers > 0 and r.n_orders >= 2 * r.n_customers
    assert r.ms_between_m >= 0 and r.ms_within_m > 0
    # ICC(1) lies in (-1/(n0-1), 1]
    assert -1.0 / (r.n0_effective - 1) - 1e-6 <= r.icc1 <= 1.0


def test_circular_dow_bounds(spark):
    from airflow_baseball_spark.queries_stats import (
        q_circular_dow_concentration,
    )

    rows = q_circular_dow_concentration(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.resultant_length <= 1.0
        assert 0 <= r.peak_weekday <= 6


def test_term_burstiness_ordering(spark):
    from airflow_baseball_spark.queries_stats import q_term_burstiness

    rows = q_term_burstiness(spark, SF).collect()
    assert len(rows) == 20
    cfs = [r.cf for r in rows]
    assert cfs == sorted(cfs, reverse=True)
    for r in rows:
        assert r.df <= r.cf
        # Poisson expectation never exceeds D and never exceeds cf
        assert r.df_poisson_expected > 0
        assert r.burst_ratio > 0


def test_nb_fit_bounds(spark):
    from airflow_baseball_spark.queries_stats import q_nb_fit_moments

    r = q_nb_fit_moments(spark, SF).collect()[0]
    assert r.n_users > 0
    assert 0.0 <= r.zero_share_observed <= 1.0
    if r.var_purchases > r.mean_purchases:
        assert r.nb_r > 0
        # NB allows more zeros than Poisson at the same mean
        assert r.zero_share_nb >= r.zero_share_poisson - 1e-9
    else:
        # under-dispersed: NB undefined, both engines report NULL
        assert r.nb_r is None and r.zero_share_nb is None


def test_position_attribution_conservation(spark):
    from airflow_baseball_spark.queries_llm import q_position_attribution

    rows = q_position_attribution(spark, SF).collect()
    assert rows
    total = sum(r.credited_conversions for r in rows)
    # credit mass equals the number of attributed purchases (up to
    # micro-quantization of the middle splits)
    assert total > 0
    assert abs(total - round(total)) < 0.01


def test_hits_authorities_ranking(spark):
    from airflow_baseball_spark.queries_mining import q_hits_authorities

    rows = q_hits_authorities(spark, SF).collect()
    assert len(rows) == 10
    scores = [r.a2 for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.a2 >= r.n_buyers  # each buyer contributes h1 >= 1


def test_spatial_knn_halo(spark):
    from airflow_baseball_spark.queries_mining import q_spatial_knn_grid

    sf01 = "/root/testdata/sf0.01"
    rows = q_spatial_knn_grid(spark, sf01).collect()
    assert len(rows) == 50
    for r in rows:
        assert r.nn_key != r.probe_key and r.d2 >= 0
        # at sf0.01 density the true NN sits within one cell width,
        # so the halo-restricted answer is the exact NN
        assert r.d2 < 500 * 500


def test_fixed_effect_pooling_bounds(spark):
    from airflow_baseball_spark.queries_stats import q_fixed_effect_pooling

    r = q_fixed_effect_pooling(spark, SF).collect()[0]
    assert r.k_segments >= 2
    assert r.cochran_q >= 0.0
    assert 0.0 <= r.i_squared < 1.0
    # null A/B split: pooled effect should be near zero
    assert abs(r.pooled_d) < 0.5


def test_median_ci_ordering(spark):
    from airflow_baseball_spark.queries_stats import q_median_ci_orderstat

    r = q_median_ci_orderstat(spark, SF).collect()[0]
    assert r.ci_low <= r.median <= r.ci_high
    assert r.n > 0


def test_partial_correlation_bounds(spark):
    from airflow_baseball_spark.queries_stats import q_partial_correlation

    r = q_partial_correlation(spark, SF).collect()[0]
    for v in (r.r_qty_price, r.r_qty_disc, r.r_price_disc,
              r.r_partial_qty_price):
        assert -1.0 <= v <= 1.0


def test_cronbach_alpha_bounds(spark):
    from airflow_baseball_spark.queries_stats import q_cronbach_alpha

    r = q_cronbach_alpha(spark, SF).collect()[0]
    assert r.n_orders > 0
    # alpha <= 1 always; can be negative for inconsistent items
    assert r.cronbach_alpha <= 1.0
    assert r.var_qty_m > 0 and r.var_lines_m > 0


def test_atkinson_bounds(spark):
    from airflow_baseball_spark.queries_stats import q_atkinson_index

    r = q_atkinson_index(spark, SF).collect()[0]
    # Atkinson lies in [0, 1); 0 iff perfectly equal
    assert 0.0 <= r.atkinson_05 < 1.0
    assert r.mean_value > 0


def test_intrinsic_dimension_plausible(spark):
    from airflow_baseball_spark.queries_stats import q_intrinsic_dimension

    r = q_intrinsic_dimension(spark, SF).collect()[0]
    assert r.n_probes > 0
    assert r.mean_ln_mu > 0
    # id must be positive and cannot exceed the ambient dimension by
    # much (sampling noise allows small excursions)
    assert 0.0 < r.intrinsic_dim < 130.0


def test_finance_reconciliation_consistency(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_finance_reconciliation,
    )

    rows = q_finance_reconciliation(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_mismatched <= r.n_orders
        # the gap is bounded by the two ledgers' total magnitude
        assert r.abs_gap_cents <= r.header_cents + r.rolled_cents


def test_aging_buckets_partition(spark):
    from airflow_baseball_spark.queries_relational2 import q_aging_buckets

    rows = q_aging_buckets(spark, SF).collect()
    assert rows
    assert {r.bucket for r in rows} <= {"0-30", "31-60", "61-90", "90+"}
    for r in rows:
        assert r.n_orders > 0 and r.value_cents > 0


def test_forecast_combination_weights(spark):
    from airflow_baseball_spark.queries_timeseries import (
        q_forecast_combination,
    )

    r = q_forecast_combination(spark, SF).collect()[0]
    assert r.n_test == 28
    assert abs(r.w_naive + r.w_snaive + r.w_drift - 1.0) < 1e-5
    for w in (r.w_naive, r.w_snaive, r.w_drift):
        assert 0.0 < w < 1.0
    assert r.mae_combined > 0 and r.mae_naive > 0


def test_median_polish_reconstruction(spark):
    """Strong identity: row effects + col effects + residuals must
    reproduce every cell exactly (all-integer decomposition)."""
    import duckdb

    from airflow_baseball_spark.queries_stats import q_median_polish

    rows = q_median_polish(spark, SF).collect()
    row_eff = {r.k: r.effect_cents for r in rows if r.component == "row"}
    col_eff = {r.k: r.effect_cents for r in rows if r.component == "col"}
    resid_l1 = next(
        r.effect_cents for r in rows if r.component == "resid_l1"
    )
    cells = duckdb.sql(
        f"""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
               CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS e
        FROM '{SF}/orders.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    # replay the two sweeps in pure Python and check the residual sum
    from collections import defaultdict

    e = {(y, m): v for y, m, v in cells}

    def med(vals):
        s = sorted(vals)
        return s[(len(s) + 1) // 2 - 1]

    reff = defaultdict(int)
    ceff = defaultdict(int)
    for _ in range(2):
        for y in {k[0] for k in e}:
            m_v = med([v for k, v in e.items() if k[0] == y])
            reff[y] += m_v
            for k in [k for k in e if k[0] == y]:
                e[k] -= m_v
        for mo in {k[1] for k in e}:
            m_v = med([v for k, v in e.items() if k[1] == mo])
            ceff[mo] += m_v
            for k in [k for k in e if k[1] == mo]:
                e[k] -= m_v
    assert dict(reff) == row_eff
    assert dict(ceff) == col_eff
    assert sum(abs(v) for v in e.values()) == resid_l1


def test_adstock_bounds(spark):
    from airflow_baseball_spark.queries_timeseries import (
        q_adstock_correlation,
    )

    r = q_adstock_correlation(spark, SF).collect()[0]
    assert r.n_hours > 50
    assert -1.0 <= r.corr_raw <= 1.0
    assert -1.0 <= r.corr_adstock <= 1.0


def test_spatial_knn_python_replay(spark):
    """Replays the md5 coordinates and halo-restricted NN search in
    pure Python and asserts the distributed answer matches key for
    key (exactness beyond the SQL oracle: a third implementation)."""
    import duckdb
    import hashlib

    from airflow_baseball_spark.queries_mining import q_spatial_knn_grid

    keys = [
        r[0]
        for r in duckdb.sql(
            f"SELECT c_custkey FROM '{SF}/customer.parquet'"
        ).fetchall()
    ]

    def coord(pfx, k):
        h = hashlib.md5(f"{pfx}{k}".encode()).hexdigest()
        return int(h[:8], 16) % 10000

    pts = {k: (coord("sx:", k), coord("sy:", k)) for k in keys}
    cells = {}
    for k, (x, y) in pts.items():
        cells.setdefault((x // 500, y // 500), []).append(k)
    expected = {}
    for pk in [k for k in keys if k < 50]:
        px, py = pts[pk]
        cx, cy = px // 500, py // 500
        best = None
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for k in cells.get((cx + dx, cy + dy), []):
                    if k == pk:
                        continue
                    x, y = pts[k]
                    d2 = (x - px) ** 2 + (y - py) ** 2
                    if best is None or (d2, k) < best:
                        best = (d2, k)
        if best is not None:
            expected[pk] = (best[1], best[0])
    rows = {
        r.probe_key: (r.nn_key, r.d2)
        for r in q_spatial_knn_grid(spark, SF).collect()
    }
    assert rows == expected


def test_hits_python_replay(spark):
    """Replays the exact 2-iteration HITS path counting in Python."""
    import duckdb
    from collections import defaultdict

    from airflow_baseball_spark.queries_mining import q_hits_authorities

    edges = duckdb.sql(
        f"""
        SELECT DISTINCT o.o_custkey, l.l_partkey
        FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        """
    ).fetchall()
    a1 = defaultdict(int)
    for c, p in edges:
        a1[p] += 1
    h1 = defaultdict(int)
    for c, p in edges:
        h1[c] += a1[p]
    a2 = defaultdict(int)
    deg = defaultdict(int)
    for c, p in edges:
        a2[p] += h1[c]
        deg[p] += 1
    top = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expected = [(p, deg[p], s) for p, s in top]
    rows = [
        (r.p_partkey, r.n_buyers, r.a2)
        for r in q_hits_authorities(spark, SF).collect()
    ]
    assert rows == expected


def test_wavelet_energy_numpy_replay(spark):
    """Replays the Haar detail energies with plain integer Python."""
    import duckdb
    import math
    from collections import defaultdict

    from airflow_baseball_spark.queries_timeseries import q_wavelet_energy

    daily = duckdb.sql(
        f"""
        SELECT date_diff('day', DATE '1992-01-01',
                         CAST(o_orderdate AS DATE)) AS t,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS c
        FROM '{SF}/orders.parquet' GROUP BY 1
        """
    ).fetchall()
    expected = {}
    for lvl in range(1, 6):
        half = 1 << (lvl - 1)
        det = defaultdict(int)
        for t, c in daily:
            sign = 1 if (t // half) % 2 == 0 else -1
            det[t // (2 * half)] += sign * c
        energy = sum(v * v for v in det.values())
        expected[lvl] = (len(det), energy)
    rows = q_wavelet_energy(spark, SF).collect()
    for r in rows:
        n_blocks, energy = expected[r.level]
        assert r.n_blocks == n_blocks
        assert r.energy_e18 == math.floor(
            energy / 1.0e18 * 1000000.0 + 0.5
        ) / 1000000.0


def test_lcs_rouge_python_replay(spark):
    """Replays the token LCS DP in pure Python per pair."""
    import duckdb
    import math

    from airflow_baseball_spark.queries_text import q_lcs_rouge

    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
            " WHERE doc_id < 40"
        ).fetchall()
    )

    def lcs(a, b):
        prev = [0] * (len(b) + 1)
        for i in range(1, len(a) + 1):
            cur = [0] * (len(b) + 1)
            for j in range(1, len(b) + 1):
                if a[i - 1] == b[j - 1]:
                    cur[j] = prev[j - 1] + 1
                else:
                    cur[j] = max(cur[j - 1], prev[j])
            prev = cur
        return prev[len(b)]

    expected = {}
    for pid in range(20):
        a = docs[2 * pid].split(" ")[:30]
        b = docs[2 * pid + 1].split(" ")[:30]
        ln = lcs(a, b)
        rf = math.floor(2.0 * ln / (len(a) + len(b)) * 1e6 + 0.5) / 1e6
        expected[pid] = (len(a), len(b), ln, rf)
    rows = {
        r.pair_id: (r.n_a, r.n_b, r.lcs_len, r.rouge_f)
        for r in q_lcs_rouge(spark, SF).collect()
    }
    assert rows == expected


def test_bloom_fpr_python_replay(spark):
    """Replays the Bloom build + probe membership in pure Python."""
    import duckdb
    import hashlib

    from airflow_baseball_spark.queries_sketch import q_bloom_fpr_audit

    m = 262144
    keys = [
        r[0]
        for r in duckdb.sql(
            f"SELECT c_custkey FROM '{SF}/customer.parquet'"
        ).fetchall()
    ]

    def pos(s):
        h = hashlib.md5(s.encode()).hexdigest()
        return int(h[:5], 16) % m, int(h[5:10], 16) % m

    bits = set()
    for k in keys:
        p1, p2 = pos(f"c:{k}")
        bits.add(p1)
        bits.add(p2)
    fp = 0
    for i in range(10000):
        p1, p2 = pos(f"p:{i}")
        if p1 in bits and p2 in bits:
            fp += 1
    r = q_bloom_fpr_audit(spark, SF).collect()[0]
    assert r.n_keys == len(keys)
    assert r.bits_set == len(bits)
    assert r.false_positives == fp
