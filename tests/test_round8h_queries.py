"""Pure-Python replay tests for the round-8h operators (house
third-implementation pattern — see test_round8_queries.py)."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import date

import pytest

from airflow_baseball_spark.schemas import load_table

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


def _cents(x: float) -> int:
    return int(math.floor(x * 100 + 0.5))


@pytest.fixture(scope="module")
def daily(spark):
    acc = defaultdict(int)
    for r in (
        load_table(spark, SF, "orders")
        .select("o_orderdate", "o_totalprice")
        .collect()
    ):
        d = (r["o_orderdate"].date() - date(1970, 1, 1)).days
        acc[d] += _cents(r["o_totalprice"])
    return sorted(acc.items())


def test_turning_point_replay(spark, daily):
    from airflow_baseball_spark.queries_round8h import q_turning_point_test

    v = [x for _, x in daily]
    t = sum(
        1
        for i in range(1, len(v) - 1)
        if (v[i] > v[i - 1] and v[i] > v[i + 1])
        or (v[i] < v[i - 1] and v[i] < v[i + 1])
    )
    n = len(v)
    z = (t - 2.0 * (n - 2) / 3.0) / math.sqrt((16.0 * n - 29) / 90.0)
    row = q_turning_point_test(spark, SF).collect()[0]
    assert (row["n_days"], row["n_turns"]) == (n, t)
    assert row["z_stat"] == pytest.approx(_r6(z), abs=2e-6)


def test_bartels_rank_replay(spark, daily):
    from airflow_baseball_spark.queries_round8h import q_bartels_rank_test

    order = sorted(range(len(daily)), key=lambda i: (daily[i][1], daily[i][0]))
    ranks = [0] * len(daily)
    for rk, i in enumerate(order, start=1):
        ranks[i] = rk
    nm = sum(
        (ranks[i] - ranks[i + 1]) ** 2 for i in range(len(ranks) - 1)
    )
    n = len(ranks)
    denom = n * (n * n - 1) / 12.0
    rvn = nm / denom
    var = (
        4.0 * (n - 2) * (5.0 * n * n - 2 * n - 9)
        / (5.0 * n * (n + 1) * (n - 1) * (n - 1))
    )
    z = (rvn - 2.0) / math.sqrt(var)
    row = q_bartels_rank_test(spark, SF).collect()[0]
    assert (row["n_days"], row["nm"]) == (n, nm)
    assert row["rvn"] == pytest.approx(_r6(rvn), abs=2e-6)
    assert row["z_stat"] == pytest.approx(_r6(z), abs=2e-6)


def test_sen_slope_ci_replay(spark, daily):
    from airflow_baseball_spark.queries_round8h import q_sen_slope_ci

    pts = daily
    slopes = sorted(
        ((vb - va) * 1000000) // (db - da)
        for i, (da, va) in enumerate(pts)
        for (db, vb) in pts[i + 1 :]
    )
    p = len(slopes)
    n = len(pts)
    c = 1.96 * math.sqrt(n * (n - 1) * (2 * n + 5) / 18.0)
    med = slopes[max((p + 1) // 2, 1) - 1]
    lo = slopes[max(math.ceil((p - c) / 2), 1) - 1]
    hi = slopes[min(math.ceil((p + c) / 2) + 1, p) - 1]
    row = q_sen_slope_ci(spark, SF).collect()[0]
    assert (row["n_days"], row["n_pairs"]) == (n, p)
    assert (
        row["sen_slope_micro"],
        row["lo_micro"],
        row["hi_micro"],
    ) == (med, lo, hi)
    assert row["slope_dollars"] == pytest.approx(
        _r6(med / 1e8), abs=2e-6
    )
    assert row["ci_lo_dollars"] == pytest.approx(_r6(lo / 1e8), abs=2e-6)
    assert row["ci_hi_dollars"] == pytest.approx(_r6(hi / 1e8), abs=2e-6)
    assert lo <= med <= hi


def test_dixon_q_replay(spark, daily):
    from airflow_baseball_spark.queries_round8h import q_dixon_q_test

    acc = defaultdict(lambda: [0, 0])
    for d, x in daily:
        a = acc[d % 7]
        a[0] += 1
        a[1] += x
    means = sorted(
        ((s / nd, dow) for dow, (nd, s) in acc.items()),
    )
    x = [m for m, _ in means]
    rng = x[6] - x[0]
    row = q_dixon_q_test(spark, SF).collect()[0]
    assert (row["low_dow"], row["high_dow"]) == (means[0][1], means[6][1])
    assert row["q_low"] == pytest.approx(_r6((x[1] - x[0]) / rng), abs=2e-6)
    assert row["q_high"] == pytest.approx(
        _r6((x[6] - x[5]) / rng), abs=2e-6
    )
    assert row["range_dollars"] == pytest.approx(_r6(rng / 100.0), abs=2e-6)
