"""Plan + invariant tests for queries_timeseries: the oracle diff
proves values; these guard the plan shapes and the math invariants
that must survive a 100 TB scale-up."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from airflow_baseball_spark.queries_timeseries import (
    q_activity_streaks,
    q_autocorr,
    q_linear_interp,
    q_rolling_anomaly,
    q_seasonality_dow,
)

SF = "/root/testdata/sf0.001"

from tests.oracle_harness import plan_str as _plan  # noqa: E402


def test_streaks_single_user_shuffle(spark):
    # window + both group-bys must reuse ONE user_id hash partitioning;
    # allow the distinct's exchange plus the user_id exchange only.
    plan = _plan(q_activity_streaks(spark, SF))
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_streaks_invariants(spark):
    rows = q_activity_streaks(spark, SF).collect()
    assert rows
    for r in rows:
        # islands partition the active days: sum of run lengths is the
        # day count, and the longest run can't exceed it
        assert r.longest_streak <= r.active_days
        assert r.n_streaks >= 1
        assert r.active_days >= r.n_streaks  # every streak has >=1 day


def test_linear_interp_bounds_and_coverage(spark):
    df = q_linear_interp(spark, SF)
    rows = df.collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: r.di)
        # dense spine: every day in [min, max] exactly once
        dis = [r.di for r in user_rows]
        assert dis == list(range(dis[0], dis[-1] + 1))
        # spine edges are observed rows by construction
        assert not user_rows[0].is_interp and not user_rows[-1].is_interp
        # interpolated values lie within the neighbors' span
        obs = [(r.di, r.v_filled) for r in user_rows if not r.is_interp]
        for r in user_rows:
            if r.is_interp:
                prev = max(o for o in obs if o[0] < r.di)
                nxt = min(o for o in obs if o[0] > r.di)
                lo, hi = sorted((prev[1], nxt[1]))
                assert lo - 1e-6 <= r.v_filled <= hi + 1e-6


def test_autocorr_single_scan_and_range(spark):
    df = q_autocorr(spark, SF)
    plan = _plan(df)
    # all four lags share one window sort over the daily aggregate and
    # one final 1-row aggregate: exactly one parquet scan
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE)
    assert len(scans) == 1, plan
    rows = {r.lag_k: r for r in df.collect()}
    assert set(rows) == {1, 2, 3, 7}
    for r in rows.values():
        assert -1.0 - 1e-9 <= r.autocorr <= 1.0 + 1e-9
        # longer lag => fewer pairs
    assert rows[1].n_pairs >= rows[7].n_pairs


def test_seasonality_index_averages_to_one(spark):
    rows = q_seasonality_dow(spark, SF).collect()
    assert len(rows) == 7
    # weighted by day counts, the index must average to exactly 1
    n = sum(r.n_days for r in rows)
    weighted = sum(r.seasonality_index * r.n_days for r in rows)
    assert abs(weighted / n - 1.0) < 1e-4


def test_rolling_anomaly_interior_only_and_threshold(spark):
    df = q_rolling_anomaly(spark, SF)
    rows = df.collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for trs in by_type.values():
        # interior-day filter trims exactly 3 days from each end of a
        # contiguous daily series
        assert len(trs) >= 1
        resid = [abs(r.residual) for r in trs]
        thr = 3.0 * sum(resid) / len(resid)
        for r in trs:
            flagged = abs(r.residual) > thr
            # the exact-decimal flag agrees with the double recompute
            # away from the boundary
            if abs(abs(r.residual) - thr) > 1e-6:
                assert r.is_anomaly == flagged


def test_cusum_changepoint_is_argmax(spark):
    from airflow_baseball_spark.queries_timeseries import q_cusum_changepoint

    rows = q_cusum_changepoint(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.day_index >= 1
    assert r.max_abs_cusum >= 0.0


def test_retention_curve_shape(spark):
    from airflow_baseball_spark.queries_timeseries import q_retention_curve

    rows = sorted(q_retention_curve(spark, SF).collect(), key=lambda r: r.k)
    assert [r.k for r in rows] == list(range(1, 15))
    for r in rows:
        assert 0 <= r.n_retained <= r.n_eligible
        assert 0.0 <= r.retention <= 1.0 + 1e-9
    # eligibility shrinks as k grows (horizon cut)
    elig = [r.n_eligible for r in rows]
    assert elig == sorted(elig, reverse=True)
