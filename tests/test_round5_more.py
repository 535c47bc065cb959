"""Invariant tests for the late round-5 additions: Adamic-Adar link
prediction, rolling median, seasonal-naive backtest, interval-overlap
join, bigram LM."""

from __future__ import annotations

from airflow_baseball_spark.queries_mining import q_adamic_adar
from airflow_baseball_spark.queries_relational2 import q_interval_overlap_join
from airflow_baseball_spark.queries_text import q_bigram_lm
from airflow_baseball_spark.queries_timeseries import (
    q_rolling_median,
    q_seasonal_naive_eval,
)

SF = "/root/testdata/sf0.001"


def test_adamic_adar_positive_and_flagged(spark):
    rows = q_adamic_adar(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_common >= 1
        assert r.adamic_adar > 0
        assert r.is_existing_edge in (0, 1)
        # AA of k common neighbors is at most k/ln(2)
        assert r.adamic_adar <= r.n_common / 0.693 + 1e-6
    # link prediction must produce at least one NON-edge candidate
    assert any(r.is_existing_edge == 0 for r in rows)


def test_rolling_median_within_window_range(spark):
    rows = q_rolling_median(spark, SF).collect()
    assert rows
    assert all(1 <= r.n_in_window <= 7 for r in rows)


def test_seasonal_naive_eval_metric_relations(spark):
    r = q_seasonal_naive_eval(spark, SF).collect()[0]
    assert r.n_days > 0
    assert r.mae >= 0
    assert 0.0 <= r.smape <= 2.0
    # |mean error| can never exceed mean absolute error
    assert abs(r.mean_err) <= r.mae + 1e-6


def test_interval_overlap_join_counts(spark):
    rows = q_interval_overlap_join(spark, SF).collect()
    assert rows, "some day must be above average"
    for r in rows:
        assert r.n_users <= r.n_sessions  # a user has >= 1 session/day
        assert r.n_sessions <= r.day_events  # sessions need >= 1 event


def test_bigram_lm_perplexity_bounds(spark):
    import math

    rows = q_bigram_lm(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_bigrams > 0
        assert r.mean_nll > 0
        # perplexity = exp(mean_nll), both reported
        assert abs(r.perplexity - math.exp(r.mean_nll)) < max(
            1e-4 * r.perplexity, 1e-4
        )


def test_dbscan_grid_roots_are_members(spark):
    from airflow_baseball_spark.queries_mining import q_dbscan_grid

    rows = q_dbscan_grid(spark, SF).collect()
    assert rows, "some cell must be dense"
    nids = {(r.cx + 100) * 1000 + (r.cy + 100) for r in rows}
    for r in rows:
        assert r.n_points >= 5
        # every cluster root is itself a dense cell's id
        assert r.cluster_root in nids


def test_sliding_distinct_users_dominates_daily(spark):
    from airflow_baseball_spark.queries_timeseries import (
        q_sliding_distinct_users,
    )
    from pyspark.sql import functions as F
    from airflow_baseball_spark.schemas import load_table

    out = {r.d: r.n_users_7d for r in q_sliding_distinct_users(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    daily = {
        r.d: r.n
        for r in ev.select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
        .groupBy("d")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert out
    for d, n1 in daily.items():
        # the 7-day window count dominates the single-day count
        assert out[d] >= n1


def test_wilson_ci_brackets_p_hat(spark):
    from airflow_baseball_spark.queries_eval import q_wilson_ci

    for r in q_wilson_ci(spark, SF).collect():
        assert 0.0 <= r.ci_lo <= r.p_hat <= r.ci_hi <= 1.0
        assert r.k <= r.n


def test_matryoshka_recall_bounds(spark):
    from airflow_baseball_spark.queries_text import q_matryoshka_recall

    r = q_matryoshka_recall(spark, SF).collect()[0]
    assert r.n_queries > 0
    assert 0 <= r.n_hits <= r.n_queries
    assert abs(r.recall_at5 - r.n_hits / r.n_queries) < 1e-6


def test_mixture_weights_quota_sums_to_budget(spark):
    from airflow_baseball_spark.queries_llm import q_mixture_weights

    rows = q_mixture_weights(spark, SF).collect()
    assert rows
    # largest-remainder apportionment: quotas sum EXACTLY to budget
    assert sum(r.token_quota for r in rows) == 1000000
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    # monotone: more tokens never gets a smaller weight
    by_tok = sorted(rows, key=lambda r: r.n_tokens)
    assert all(
        a.weight <= b.weight + 1e-9 for a, b in zip(by_tok, by_tok[1:])
    )


def test_text_roundtrip_precondition_no_tabs(spark):
    from airflow_baseball_spark.schemas import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents")
    n_bad = docs.filter(
        F.col("text").contains("\t") | F.col("text").contains("\n")
    ).count()
    assert n_bad == 0, "text-lines roundtrip requires escape-free text"


def test_markov_stationary_is_distribution(spark):
    from airflow_baseball_spark.queries_mining import q_markov_stationary

    rows = q_markov_stationary(spark, SF).collect()
    assert len(rows) >= 2
    tot = sum(r.stationary_p for r in rows)
    # quantized floor loss drains < 1e-6/round over 12 rounds
    assert 0.99 <= tot <= 1.0 + 1e-6
    assert all(r.stationary_p >= 0 for r in rows)


def test_bootstrap_ci_brackets_point_estimate(spark):
    from airflow_baseball_spark.queries_sampling import q_bootstrap_ci

    r = q_bootstrap_ci(spark, SF).collect()[0]
    assert r.n_replicates == 40
    assert r.ci_lo <= r.ci_hi
    # at n>=1000 the bootstrap CI straddles the sample mean
    assert r.ci_lo <= r.mean_price <= r.ci_hi


def test_incremental_mv_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    from airflow_baseball_spark.queries_llm import q_incremental_mv
    from airflow_baseball_spark.schemas import load_table

    mv = {
        r.o_orderstatus: (r.n_orders, round(r.total_price, 2))
        for r in q_incremental_mv(spark, SF).collect()
    }
    orders = load_table(spark, SF, "orders")
    new = orders.filter(F.col("o_orderkey") % 13 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.5
        ).otherwise(F.col("o_totalprice")),
    )
    full = {
        r.o_orderstatus: (r.n, round(r.t, 2))
        for r in new.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(
                    (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                        "long"
                    )
                )
                / 100.0
            ).alias("t"),
        )
        .collect()
    }
    assert mv == full


def test_stream_session_window_matches_batch(spark):
    from airflow_baseball_spark.queries_streaming import (
        q_sessionize_batch,
        q_stream_session_window,
    )

    a = {
        (r.user_id, r.session_start): (r.n_events, r.session_end)
        for r in q_sessionize_batch(spark, SF).collect()
    }
    b = {
        (r.user_id, r.session_start): (r.n_events, r.session_end)
        for r in q_stream_session_window(spark, SF).collect()
    }
    assert a == b  # native operator == batch islands, key for key


def test_rle_compress_invariants(spark):
    from airflow_baseball_spark.queries_relational2 import q_rle_compress

    r = q_rle_compress(spark, SF).collect()[0]
    assert 1 <= r.n_runs <= r.n_events
    assert 1 <= r.max_run_len <= r.n_events
    assert abs(r.rle_ratio - r.n_runs / r.n_events) < 1e-6


def test_weighted_reservoir_shape(spark):
    from airflow_baseball_spark.queries_sampling import q_weighted_reservoir

    rows = q_weighted_reservoir(spark, SF).collect()
    segs = {}
    for r in rows:
        segs.setdefault(r.c_mktsegment, []).append(r.rank)
    for ranks in segs.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5
    # without replacement: no duplicate orders within a segment draw
    keys = [(r.c_mktsegment, r.o_orderkey) for r in rows]
    assert len(keys) == len(set(keys))


def test_percentile_cont_brackets_disc(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_percentile_cont,
        q_percentile_disc,
    )

    cont = {r.o_orderpriority: r for r in q_percentile_cont(spark, SF).collect()}
    disc = {r.o_orderpriority: r for r in q_percentile_disc(spark, SF).collect()}
    assert cont.keys() == disc.keys()
    for k in cont:
        # percentiles are monotone in p, for both definitions
        assert cont[k].p50_cont <= cont[k].p90_cont + 1e-9
        assert disc[k].p50_disc <= disc[k].p90_disc
        # (exact-value agreement is the DuckDB oracle's job; neighbor
        # gaps are data-dependent, so no magnitude bound here)


def test_label_centroids_symmetric_nearest(spark):
    from airflow_baseball_spark.queries_text import q_label_centroids

    rows = q_label_centroids(spark, SF).collect()
    assert len(rows) >= 2
    labels = {r.label for r in rows}
    for r in rows:
        assert r.nearest_label in labels and r.nearest_label != r.label
        assert r.nearest_dist >= 0 and r.centroid_norm >= 0
        assert r.n_vecs > 0


def test_twap_between_min_and_max(spark):
    from airflow_baseball_spark.queries_timeseries import q_twap

    rows = q_twap(spark, SF).collect()
    assert rows
    for r in rows:
        # a weighted average of positive holds stays near the plain
        # mean's scale; both positive here
        assert r.twap > 0 and r.plain_mean > 0
        assert r.n_intervals > 0 and r.span_minutes > 0


def test_pad_waste_sorted_beats_hash(spark):
    from airflow_baseball_spark.queries_llm import q_pad_waste_eval

    rows = {r.ordering: r for r in q_pad_waste_eval(spark, SF).collect()}
    assert set(rows) == {"length_sorted", "hash_order"}
    s, h = rows["length_sorted"], rows["hash_order"]
    assert s.real_tokens == h.real_tokens  # same corpus either way
    assert s.n_batches == h.n_batches
    # length bucketing can only reduce padding
    assert s.pad_tokens <= h.pad_tokens


def test_shard_balance_partitions_corpus(spark):
    from airflow_baseball_spark.queries_llm import q_shard_balance
    from airflow_baseball_spark.schemas import load_table

    rows = q_shard_balance(spark, SF).collect()
    assert all(0 <= r.shard <= 7 for r in rows)
    total = sum(r.n_docs for r in rows)
    assert total == load_table(spark, SF, "documents").count()


def test_hard_negative_margin_consistency(spark):
    from airflow_baseball_spark.queries_text import q_hard_negative_mining

    rows = q_hard_negative_mining(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.pos_id != r.query_id and r.neg_id != r.query_id
        assert abs(r.margin - (r.pos_cos - r.neg_cos)) < 2e-6
        assert -1.0 <= r.pos_cos <= 1.0 and -1.0 <= r.neg_cos <= 1.0


def test_overlap_coefficient_bounds(spark):
    from airflow_baseball_spark.queries_eval import q_overlap_coefficient

    r = q_overlap_coefficient(spark, SF).collect()[0]
    assert 0.0 <= r.overlap <= 1.0 + 1e-6
    assert r.n_distinct_values > 0


def test_dedup_cluster_sizes_partitions_corpus(spark):
    from airflow_baseball_spark.queries_text import q_dedup_cluster_sizes
    from airflow_baseball_spark.schemas import load_table

    rows = q_dedup_cluster_sizes(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters
    total = sum(r.n_docs for r in rows)
    assert total == load_table(spark, SF, "documents").count()


def test_popularity_hitrate_bounds(spark):
    from airflow_baseball_spark.queries_mining import q_popularity_hitrate

    r = q_popularity_hitrate(spark, SF).collect()[0]
    assert 0 < r.n_test_orders
    assert 0 <= r.n_hit_orders <= r.n_test_orders
    assert abs(r.hit_rate_at3 - r.n_hit_orders / r.n_test_orders) < 1e-6


def test_capped_balance_matches_sequential_definition(spark):
    from airflow_baseball_spark.queries_timeseries import (
        q_capped_running_balance,
    )

    rows = q_capped_running_balance(spark, SF).orderBy(
        "l_partkey", "d"
    ).collect()
    assert rows
    # replay the sequential b_t = max(0, b_{t-1} + x_t) per part and
    # compare with the windowed closed form
    state = {}
    for r in rows:
        b_prev = state.get(r.l_partkey, 0.0)
        b = max(0.0, b_prev + r.net_qty)
        assert abs(r.balance - b) < 1e-6, (r.l_partkey, r.d)
        state[r.l_partkey] = b
        assert r.balance >= 0


def test_time_decay_attribution_conserves_less_than_total(spark):
    from pyspark.sql import functions as F

    from airflow_baseball_spark.queries_relational2 import (
        q_time_decay_attribution,
    )
    from airflow_baseball_spark.schemas import load_table

    rows = q_time_decay_attribution(spark, SF).collect()
    assert {r.channel for r in rows} <= {"view", "click"}
    credited = sum(r.credited_value for r in rows)
    total = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    # credit never exceeds purchase value (floor losses + purchases
    # with no preceding touch keep it below)
    assert 0 < credited <= total + 1e-6


def test_hysteresis_fewer_episodes_than_alert_days(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_hysteresis_episodes,
    )

    rows = q_hysteresis_episodes(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_episodes <= r.days_in_alert <= r.n_days


def test_revenue_waterfall_reconciles(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_revenue_waterfall,
    )

    rows = q_revenue_waterfall(spark, SF).collect()
    assert rows
    for r in rows:
        # gross - discount = net, net + tax = billed (to rounding)
        assert abs((r.gross - r.discount_given) - r.net) < 1e-3
        assert abs((r.net + r.tax_collected) - r.billed) < 1e-3
        assert r.discount_given >= 0 and r.tax_collected >= 0


def test_double_charge_share_bounds(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_double_charge_detect,
    )

    r = q_double_charge_detect(spark, SF).collect()[0]
    assert 0 <= r.n_suspect_dups < r.n_purchases
    assert abs(r.suspect_share - r.n_suspect_dups / r.n_purchases) < 1e-6


def test_foreachbatch_mv_equals_batch_agg(spark):
    from pyspark.sql import functions as F

    from airflow_baseball_spark.queries_streaming import (
        q_stream_foreachbatch_mv,
    )
    from airflow_baseball_spark.schemas import load_table

    mv = {
        r.event_type: (r.n_events, round(r.total_value, 2))
        for r in q_stream_foreachbatch_mv(spark, SF).collect()
    }
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    full = {
        r.event_type: (r.n, round(r.t, 2))
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents) / 100.0).alias("t"),
        )
        .collect()
    }
    assert mv == full


def test_banded_balance_sequential_replay(spark):
    from airflow_baseball_spark.queries_timeseries import (
        q_banded_running_balance,
    )

    rows = q_banded_running_balance(spark, SF).orderBy(
        "l_partkey", "d"
    ).collect()
    assert rows
    state = {}
    for r in rows:
        b = min(50.0, max(0.0, state.get(r.l_partkey, 0.0) + r.net_qty))
        assert abs(r.balance - b) < 1e-6
        state[r.l_partkey] = b
        assert 0.0 <= r.balance <= 50.0


def test_srm_check_partitions_users(spark):
    from pyspark.sql import functions as F

    from airflow_baseball_spark.queries_sampling import q_srm_check
    from airflow_baseball_spark.schemas import load_table

    r = q_srm_check(spark, SF).collect()[0]
    n_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert r.n_a + r.n_b == n_users
    assert r.srm_chi2 >= 0
    # the flag is exactly chi2 > 3.8415 (data-dependent either way)
    assert r.srm_detected == (r.srm_chi2 > 3.841458820694124)


def test_entry_exit_shares_sum_to_one(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_entry_exit_profile,
    )

    rows = q_entry_exit_profile(spark, SF).collect()
    assert rows
    assert abs(sum(r.entry_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.exit_share for r in rows) - 1.0) < 1e-4
    # every user contributes exactly one entry and one exit
    assert sum(r.n_entry for r in rows) == sum(r.n_exit for r in rows)


def test_daily_bands_ordered(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_daily_percentile_bands,
    )

    rows = q_daily_percentile_bands(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.p10 <= r.p50 <= r.p90
        assert r.n_events >= 1


def test_hierarchy_rollup_root_holds_everything(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_hierarchy_rollup,
    )
    from airflow_baseball_spark.schemas import load_table

    rows = {r.node: r for r in q_hierarchy_rollup(spark, SF).collect()}
    # root 0 is every line's ancestor
    total_lines = load_table(spark, SF, "lineitem").count()
    assert rows[0].n_lines == total_lines
    # a child's subtree is contained in its parent's
    for node, r in rows.items():
        parent = node // 10
        if node != 0 and parent in rows:
            assert r.n_lines <= rows[parent].n_lines
            assert r.subtree_rev <= rows[parent].subtree_rev + 1e-6


def test_freshness_one_freshest_stream(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_freshness_report,
    )

    rows = q_freshness_report(spark, SF).collect()
    assert sum(1 for r in rows if r.is_freshest) >= 1
    for r in rows:
        assert r.staleness_minutes >= 0
        assert (r.staleness_minutes == 0) or not r.is_freshest


def test_accumulating_snapshot_milestone_order(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_accumulating_snapshot,
    )

    rows = q_accumulating_snapshot(spark, SF).collect()
    assert rows
    for r in rows:
        if r.n_lines > 0:
            assert r.first_ship <= r.last_ship
            assert r.ship_window_days >= 0


def test_asof_metrics_monotone_in_checkpoint(spark):
    from airflow_baseball_spark.queries_relational2 import q_asof_metrics

    rows = q_asof_metrics(spark, SF).collect()
    assert rows
    by_status = {}
    for r in rows:
        by_status.setdefault(r.o_orderstatus, []).append(
            (r.checkpoint_day, r.n_orders, r.revenue)
        )
    for st, seq in by_status.items():
        seq.sort()
        # later checkpoints only ever see MORE data
        for (d1, n1, v1), (d2, n2, v2) in zip(seq, seq[1:]):
            assert n1 <= n2 and v1 <= v2 + 1e-6, st


def test_log_binned_lengths_bins_consistent(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_log_binned_lengths,
    )

    rows = q_log_binned_lengths(spark, SF).collect()
    assert rows
    for r in rows:
        # every member sits inside [2^bin, 2^(bin+1))
        assert 2**r.log2_bin <= r.min_tokens <= r.max_tokens
        assert r.max_tokens < 2 ** (r.log2_bin + 1)


def test_nucleus_bounds(spark):
    from airflow_baseball_spark.queries_text import q_nucleus_set_size

    rows = q_nucleus_set_size(spark, SF).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert 1 <= r.nucleus_size <= r.n_successors
        assert r.n_successors <= r.n_bigrams


def test_cv_variance_folds_balanced(spark):
    from airflow_baseball_spark.queries_sampling import (
        q_cv_metric_variance,
    )

    rows = q_cv_metric_variance(spark, SF).collect()
    assert len(rows) == 5
    sizes = [r.n_docs for r in rows]
    # stratified assignment keeps folds within |langs| docs
    assert max(sizes) - min(sizes) <= 25
    v = rows[0].var_of_fold_means
    assert all(abs(r.var_of_fold_means - v) < 1e-9 for r in rows)
    assert v >= 0


def test_ewma_crossover_consistency(spark):
    from airflow_baseball_spark.queries_timeseries import q_ewma_crossover

    rows = q_ewma_crossover(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.days_fast_above <= r.n_days_scored
        # a crossover needs at least one scored day on each side
        assert r.n_crossovers < r.n_days_scored


def test_rare_combos_counts(spark):
    from airflow_baseball_spark.queries_eval import q_rare_combos

    rows = q_rare_combos(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_singleton_combos <= r.n_combos <= r.n_docs


def test_sla_attainment_bounds(spark):
    from airflow_baseball_spark.queries_relational2 import q_sla_attainment

    rows = q_sla_attainment(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_within_sla <= r.n_lines
        assert abs(r.attainment - r.n_within_sla / r.n_lines) < 1e-6


def test_join_skew_audit_shares(spark):
    from airflow_baseball_spark.queries_relational2 import q_join_skew_audit

    rows = q_join_skew_audit(spark, SF).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        assert r.fanout == r.n_left * r.n_right
        assert 0 < r.share_of_join <= 1
    # returned in descending fanout order
    fans = [r.fanout for r in rows]
    assert fans == sorted(fans, reverse=True)


def test_fd_bin_width_sane(spark):
    from airflow_baseball_spark.queries_relational2 import q_fd_bin_width

    r = q_fd_bin_width(spark, SF).collect()[0]
    assert r.iqr > 0
    assert r.fd_bin_width > 0
    assert r.suggested_bins > 1


def test_price_volume_mix_reconciles(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_price_volume_mix,
    )

    rows = q_price_volume_mix(spark, SF).collect()
    assert rows
    for r in rows:
        # the two effects reconcile to the revenue delta exactly
        assert abs(
            (r.volume_effect + r.rate_effect) - r.delta_revenue
        ) < 1e-3, r


def test_gap_hazard_last_bucket_certain(spark):
    from airflow_baseball_spark.queries_timeseries import q_gap_hazard_table

    rows = sorted(
        q_gap_hazard_table(spark, SF).collect(), key=lambda r: r.gap_days
    )
    assert rows
    # the largest observed bucket has hazard exactly 1 (everyone
    # still at risk leaves through it)
    assert abs(rows[-1].hazard - 1.0) < 1e-6
    for r in rows:
        assert 0 < r.hazard <= 1.0
        assert r.n_gaps <= r.n_at_risk


def test_effective_sizes_within_brand_count(spark):
    from airflow_baseball_spark.queries_mining import (
        q_effective_catalog_size,
    )

    r = q_effective_catalog_size(spark, SF).collect()[0]
    # 1 <= simpson <= shannon <= k  (standard diversity ordering)
    assert 1.0 <= r.simpson_effective <= r.shannon_effective + 1e-6
    assert r.shannon_effective <= r.n_brands + 1e-6


def test_heaps_curve_monotone(spark):
    from airflow_baseball_spark.queries_text import q_heaps_law_curve

    rows = sorted(
        q_heaps_law_curve(spark, SF).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert a.vocab_cum <= b.vocab_cum
        assert a.tokens_cum < b.tokens_cum
    # sublinear growth: the first decile introduces the most new
    # vocabulary (ties allowed on a saturated tiny corpus)
    assert rows[0].new_terms == max(r.new_terms for r in rows)


def test_trend_test_consistency(spark):
    from airflow_baseball_spark.queries_timeseries import q_trend_test

    r = q_trend_test(spark, SF).collect()[0]
    assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
    assert abs(r.mk_s) <= r.n_pairs
    # S and the Sen slope must agree in sign (both robust trend reads)
    if r.mk_s > 0:
        assert r.sen_slope >= 0
    elif r.mk_s < 0:
        assert r.sen_slope <= 0


def test_template_groups_counts(spark):
    from airflow_baseball_spark.queries_text import (
        q_template_prefix_groups,
    )

    rows = q_template_prefix_groups(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.docs_in_templates <= r.n_docs
        assert r.max_template_size <= r.n_docs
        if r.n_templates == 0:
            assert r.docs_in_templates == 0


def test_abc_xyz_cells_partition_parts(spark):
    from airflow_baseball_spark.queries_mining import q_abc_xyz_matrix
    from airflow_baseball_spark.schemas import load_table
    from pyspark.sql import functions as F

    rows = q_abc_xyz_matrix(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.abc in "ABC" and r.xyz in "XYZ"
    total_parts = (
        load_table(spark, SF, "lineitem")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sum(r.n_parts for r in rows) == total_parts


def test_collocation_pmi_ranked(spark):
    from airflow_baseball_spark.queries_text import q_collocation_pmi

    rows = sorted(
        q_collocation_pmi(spark, SF).collect(), key=lambda r: r.rank
    )
    assert 0 < len(rows) <= 20
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    assert all(r.pair_count >= 20 for r in rows)


def test_two_pass_median_pass2_is_small(spark):
    from pyspark.sql import functions as F

    from airflow_baseball_spark.queries_relational2 import q_two_pass_median
    from airflow_baseball_spark.schemas import load_table

    r = q_two_pass_median(spark, SF).collect()[0]
    li = load_table(spark, SF, "lineitem")
    assert r.n_lines == li.count()
    # the refined bin really is ~n/1024: the target bin's population
    # must be far below the fact size (here: under 5%)
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "long"
    )
    vals = li.select(cents.alias("v"))
    lo, hi = vals.agg(F.min("v"), F.max("v")).collect()[0]
    med_cents = int(round(r.median_price * 100))
    b = (med_cents - lo) * 1024 // (hi - lo + 1)
    in_bin = vals.filter(
        F.expr(f"((v - {lo}) * 1024) div ({hi} - {lo} + 1) = {b}")
    ).count()
    assert in_bin <= max(64, r.n_lines // 20)


def test_graph_summary_identities(spark):
    from airflow_baseball_spark.queries_mining import q_graph_summary

    r = q_graph_summary(spark, SF).collect()[0]
    assert r.n_edges >= r.n_nodes - 1 or r.n_edges >= 0
    assert 0 <= r.transitivity <= 1.0 + 1e-6
    # each triangle closes 3 wedges
    assert 3 * r.triangles <= r.wedges


def test_cell_median_heatmap_grid(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_cell_median_heatmap,
    )

    rows = q_cell_median_heatmap(spark, SF).collect()
    cells = {(r.dow, r.h6_block) for r in rows}
    assert len(cells) == len(rows)  # one median per cell
    assert all(0 <= d <= 6 and 0 <= h <= 3 for d, h in cells)
    assert all(r.median_value > 0 for r in rows)


def test_order_line_inversions_bounds(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_order_line_inversions,
    )

    r = q_order_line_inversions(spark, SF).collect()[0]
    assert 0 <= r.n_inversions <= r.n_pairs
    assert -1.0 - 1e-6 <= r.tau_like <= 1.0 + 1e-6


def test_price_elasticity_rows(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_price_elasticity,
    )

    rows = q_price_elasticity(spark, SF).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        assert r.n_lines > 10


def test_copula_grid_marginals_uniform(spark):
    from airflow_baseball_spark.queries_stats import q_copula_grid

    rows = q_copula_grid(spark, SF).collect()
    total = sum(r.n_cell for r in rows)
    by_q = {}
    for r in rows:
        by_q[r.q_decile] = by_q.get(r.q_decile, 0) + r.n_cell
    # rank marginals are uniform by construction (each decile ~n/10)
    sizes = list(by_q.values())
    assert max(sizes) - min(sizes) <= max(2, total // 100)


def test_single_source_share_bounds(spark):
    from airflow_baseball_spark.queries_mining import q_single_source_risk

    rows = q_single_source_risk(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_single_sourced <= r.n_parts
        assert 0.0 <= r.single_source_share <= 1.0


def test_dedup_sweep_monotone_in_threshold(spark):
    from airflow_baseball_spark.queries_text import q_dedup_threshold_sweep

    rows = sorted(
        q_dedup_threshold_sweep(spark, SF).collect(),
        key=lambda r: r.threshold,
    )
    assert rows
    # higher cutoff can only keep fewer pairs
    kept = [r.n_pairs_over for r in rows]
    assert kept == sorted(kept, reverse=True)
    assert all(r.n_pairs_over <= r.n_candidate_pairs for r in rows)


def test_topk_stability_monotone_counts(spark):
    from airflow_baseball_spark.queries_mining import q_topk_stability

    rows = sorted(
        q_topk_stability(spark, SF).collect(), key=lambda r: r.k
    )
    assert [r.k for r in rows] == list(range(1, 11))
    ns = [r.n_overlap for r in rows]
    # overlap can only grow with k, by at most 1 per step... no — by
    # up to 2 per step (one new slot per side); assert nondecreasing
    assert all(a <= b for a, b in zip(ns, ns[1:]))
    assert all(r.n_overlap <= r.k for r in rows)


def test_tokenizer_fidelity_bounds(spark):
    from airflow_baseball_spark.queries_text import q_tokenizer_fidelity

    rows = q_tokenizer_fidelity(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_roundtrip_exact <= r.n_docs
        assert 0.0 <= r.fidelity <= 1.0


def test_price_endings_share_sums(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_price_ending_profile,
    )

    rows = q_price_ending_profile(spark, SF).collect()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    assert {r.ending for r in rows} <= {"00", "99", "50", "other"}


def test_embedding_aa_drift_small(spark):
    from airflow_baseball_spark.queries_text import (
        q_embedding_split_drift,
    )

    rows = q_embedding_split_drift(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_even > 0 and r.n_odd > 0
        # A/A split of the same label: centroid shift stays small
        # relative to unit-ish vectors
        assert 0 <= r.aa_centroid_dist < 1.0


def test_cvar_below_median_scale(spark):
    from airflow_baseball_spark.queries_timeseries import q_cvar_daily

    r = q_cvar_daily(spark, SF).collect()[0]
    assert r.n_tail_days == (r.n_days + 19) // 20
    assert r.cvar_5pct > 0


def test_littles_law_holds(spark):
    from airflow_baseball_spark.queries_timeseries import (
        q_littles_law_check,
    )

    r = q_littles_law_check(spark, SF).collect()[0]
    assert r.n_sessions > 0
    # on a closed window L = lambda.W exactly (same sweep integrals)
    assert abs(r.littles_ratio - 1.0) < 1e-3


def test_odds_ratio_ci_brackets(spark):
    from airflow_baseball_spark.queries_eval import q_odds_ratio

    rows = q_odds_ratio(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.ci_lo <= r.odds_ratio <= r.ci_hi
        assert r.odds_ratio > 0


def test_burrows_delta_pairs(spark):
    from airflow_baseball_spark.queries_text import q_burrows_delta

    rows = q_burrows_delta(spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert r.burrows_delta >= 0
        assert r.n_words <= 50


def test_rolling_correlation_bounds(spark):
    from airflow_baseball_spark.queries_timeseries import (
        q_rolling_correlation,
    )

    rows = q_rolling_correlation(spark, SF).collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-6 <= r.rolling_r <= 1.0 + 1e-6


def test_stream_window_topk_shape(spark):
    from airflow_baseball_spark.queries_streaming import (
        q_stream_window_topk,
    )

    rows = q_stream_window_topk(spark, SF).collect()
    per_w = {}
    for r in rows:
        per_w.setdefault(r.window_start, []).append((r.rank, r.revenue))
    for wstart, entries in per_w.items():
        entries.sort()
        ranks = [e[0] for e in entries]
        assert ranks == list(range(1, len(ranks) + 1))
        revs = [e[1] for e in entries]
        assert revs == sorted(revs, reverse=True)


def test_xmr_limits_bracket_center(spark):
    from airflow_baseball_spark.queries_timeseries import q_xmr_control

    r = q_xmr_control(spark, SF).collect()[0]
    assert r.lcl < r.center < r.ucl
    assert 0 <= r.n_breaches <= r.n_days
