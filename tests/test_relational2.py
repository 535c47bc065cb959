"""Plan + invariant tests for queries_relational2 (round 5)."""

from __future__ import annotations

import re

from airflow_baseball_spark.queries_relational2 import (
    q_event_cooccurrence,
    q_heatmap_bins,
    q_inter_event_gaps,
    q_rolling_slope,
    q_ship_latency,
)

SF = "/root/testdata/sf0.001"

from tests.oracle_harness import plan_str as _plan  # noqa: E402


def test_gaps_single_user_shuffle(spark):
    plan = _plan(q_inter_event_gaps(spark, SF))
    # lag window + groupBy share ONE user_id hash partitioning
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE)) == 1, plan


def test_gaps_invariants(spark):
    rows = q_inter_event_gaps(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_gaps >= 1
        assert 0 <= r.avg_gap_s <= r.max_gap_us / 1e6 + 1e-6


def test_ship_latency_groups(spark):
    rows = q_ship_latency(spark, SF).collect()
    assert len(rows) == 5  # TPC-H priority classes
    for r in rows:
        assert r.min_days <= r.avg_days <= r.max_days


def test_heatmap_grid_bounds(spark):
    rows = q_heatmap_bins(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.qty_bin <= 10  # quantity 1..50 → bins 0..10
        assert 0 <= r.disc_cents <= 10
        assert r.revenue > 0


def test_rolling_slope_full_windows_only(spark):
    df = q_rolling_slope(spark, SF)
    plan = _plan(df)
    # all five sufficient sums share one unpartitioned date sort over
    # the daily aggregate: single scan, single window node
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE)
    assert len(scans) == 1, plan
    assert len(re.findall(r"^\(\d+\) Window", plan, re.MULTILINE)) == 1, plan
    assert df.count() > 0


def test_cooccurrence_pairs_bounded(spark):
    rows = q_event_cooccurrence(spark, SF).collect()
    # 5 event types → at most C(5,2)=10 unordered pairs
    assert 1 <= len(rows) <= 10
    for r in rows:
        assert r.type_a < r.type_b
        assert 0.0 < r.user_jaccard <= 1.0 + 1e-9


def test_sparse_matmul_dims_and_positivity(spark):
    from airflow_baseball_spark.queries_relational2 import q_sparse_matmul

    rows = q_sparse_matmul(spark, SF).collect()
    assert rows
    nations = {r.nation for r in rows}
    flags = {r.returnflag for r in rows}
    # C is |nations| × |returnflags| dense here (every nation buys
    # every flag class at any SF)
    assert len(rows) == len(nations) * len(flags)
    assert all(r.c_ik > 0 for r in rows)


def test_sparse_matmul_broadcasts_contraction(spark):
    from airflow_baseball_spark.queries_relational2 import q_sparse_matmul

    plan = _plan(q_sparse_matmul(spark, SF))
    # B (brand × flag) must broadcast: the contraction join adds no
    # shuffle of A
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_top_event_paths_arity(spark):
    from airflow_baseball_spark.queries_relational2 import q_top_event_paths

    rows = q_top_event_paths(spark, SF).collect()
    assert rows
    # 5 event types → at most 125 trigram paths
    assert len(rows) <= 125
    for r in rows:
        assert len(r.path.split(">")) == 3
        assert r.n_occurrences >= 1


def test_share_shift_sums_to_zero(spark):
    from airflow_baseball_spark.queries_relational2 import q_share_shift

    rows = q_share_shift(spark, SF).collect()
    assert rows
    # shares each sum to ~1 so deltas sum to ~0 (over surviving brands)
    assert abs(sum(r.share_delta for r in rows)) < 1e-3


def test_new_vs_returning_first_month(spark):
    from airflow_baseball_spark.queries_relational2 import q_new_vs_returning

    rows = sorted(q_new_vs_returning(spark, SF).collect(), key=lambda r: r.ym)
    assert rows
    # the earliest month has no possible returning orders
    assert rows[0].returning_orders == 0
    assert rows[0].new_orders > 0


def test_abc_classes_ordered(spark):
    from airflow_baseball_spark.queries_relational2 import q_abc_classification

    rows = sorted(
        q_abc_classification(spark, SF).collect(), key=lambda r: r.cum_share
    )
    assert {r.abc_class for r in rows} <= {"A", "B", "C"}
    # classes are monotone along cumulative share
    joined = "".join(r.abc_class for r in rows)
    assert joined == "".join(sorted(joined))


def test_interval_union_bounds(spark):
    from airflow_baseball_spark.queries_relational2 import q_interval_union_time

    rows = q_interval_union_time(spark, SF).collect()
    assert rows
    win = 5 * 60 * 1000000
    for r in rows:
        # union length is at least one window and at most n_events windows
        assert win <= r.active_us <= r.n_events * win


def test_mom_growth_first_month_null(spark):
    from airflow_baseball_spark.queries_relational2 import q_mom_growth

    rows = q_mom_growth(spark, SF).collect()
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(r)
    for seg_rows in by_seg.values():
        seg_rows.sort(key=lambda r: r.ym)
        assert seg_rows[0].mom_growth is None  # no prior month
        assert all(r.mom_growth is not None for r in seg_rows[1:])


def test_time_to_conversion_sane(spark):
    from airflow_baseball_spark.queries_relational2 import q_time_to_conversion

    r = q_time_to_conversion(spark, SF).collect()[0]
    assert r.n_converted > 0
    assert 0 <= r.min_hours <= r.mean_hours <= r.max_hours


def test_decile_lift_monotone_cum_lift(spark):
    from airflow_baseball_spark.queries_relational2 import q_decile_lift

    rows = sorted(q_decile_lift(spark, SF).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, len(rows) + 1))
    # cumulative lift ends at exactly the base rate ratio = 1
    assert abs(rows[-1].cum_lift - 1.0) < 1e-6
    for r in rows:
        assert 0.0 <= r.conv_rate <= 1.0 + 1e-9


def test_null_safe_join_partitions(spark):
    from airflow_baseball_spark.queries_relational2 import q_null_safe_join

    r = q_null_safe_join(spark, SF).collect()[0]
    # NULLed FKs never match under equality; counts partition the fact
    assert r.n_matched_eq + r.n_null_fk + r.n_orphan_fk == r.n_orders
    assert r.n_null_fk > 0


def test_percentile_disc_observed_values(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_percentile_disc,
        q_ship_latency,
    )

    disc = {r.o_orderpriority: r for r in q_percentile_disc(spark, SF).collect()}
    rng = {r.o_orderpriority: r for r in q_ship_latency(spark, SF).collect()}
    assert set(disc) == set(rng)
    for pr, r in disc.items():
        # discrete percentiles are observed values inside the range
        assert rng[pr].min_days <= r.p50_disc <= r.p90_disc <= rng[pr].max_days


def test_range_frame_narrower_than_rows(spark):
    from airflow_baseball_spark.queries_relational2 import q_range_frame_agg

    rows = q_range_frame_agg(spark, SF).collect()
    assert rows
    for r in rows:
        # a 7-calendar-day RANGE window holds at most 7 present days
        assert 1 <= r.days_present_in_window <= 7
        assert r.rev_7cal_days >= r.revenue - 1e-6


def test_pivot_multi_agg_consistency(spark):
    from airflow_baseball_spark.queries_relational2 import q_pivot_multi_agg

    rows = q_pivot_multi_agg(spark, SF).collect()
    assert len(rows) == 10  # user_id % 10 buckets
    for r in rows:
        for t in ("click", "purchase", "view"):
            n, v = getattr(r, f"{t}_n"), getattr(r, f"{t}_v")
            assert (n == 0) == (v is None)  # sum NULL iff no rows


def test_gini_bounds(spark):
    from airflow_baseball_spark.queries_relational2 import q_gini_coefficient

    r = q_gini_coefficient(spark, SF).collect()[0]
    assert r.n_customers > 0
    assert 0.0 <= r.gini < 1.0


def test_hhi_bounds(spark):
    from airflow_baseball_spark.queries_relational2 import q_hhi_concentration

    r = q_hhi_concentration(spark, SF).collect()[0]
    # HHI of n near-equal shares ≈ 1/n; always in [1/n, 1]
    assert 1.0 / r.n_brands - 1e-9 <= r.hhi <= 1.0


def test_lorenz_curve_convex(spark):
    from airflow_baseball_spark.queries_relational2 import q_lorenz_curve

    rows = sorted(q_lorenz_curve(spark, SF).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    # ascending-sort deciles → shares nondecreasing, cum ends at 1
    shares = [r.spend_share for r in rows]
    assert shares == sorted(shares)
    assert abs(rows[-1].cum_spend_share - 1.0) < 1e-4


def test_local_peaks_are_maxima(spark):
    from airflow_baseball_spark.queries_relational2 import q_local_peaks

    rows = q_local_peaks(spark, SF).collect()
    assert rows  # multi-year daily series has interior spikes
    assert all(r.revenue > 0 for r in rows)


def test_order_lines_histogram_mass(spark):
    from airflow_baseball_spark.queries_relational2 import (
        q_order_lines_histogram,
    )
    from airflow_baseball_spark.schemas import load_table

    rows = q_order_lines_histogram(spark, SF).collect()
    total_lines = sum(r.n_lines * r.n_orders for r in rows)
    assert total_lines == load_table(spark, SF, "lineitem").count()


def test_spearman_in_range(spark):
    from airflow_baseball_spark.queries_relational2 import q_spearman_rank_corr

    r = q_spearman_rank_corr(spark, SF).collect()[0]
    assert r.n_brands > 2
    assert -1.0 - 1e-9 <= r.spearman_rho <= 1.0 + 1e-9


def test_price_index_fisher_between(spark):
    from airflow_baseball_spark.queries_relational2 import q_price_index

    r = q_price_index(spark, SF).collect()[0]
    assert r.n_parts > 0
    lo, hi = sorted((r.laspeyres, r.paasche))
    # Fisher is the geometric mean: always between the two
    assert lo - 1e-6 <= r.fisher <= hi + 1e-6
    assert 0.5 < r.fisher < 2.0  # sane index band for this data
