"""Pure-Python replay tests for the round-8e operators (house
third-implementation pattern — see test_round8_queries.py)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import timezone

import pytest

from airflow_baseball_spark.schemas import load_table

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


def _cents(x: float) -> int:
    return int(math.floor(x * 100 + 0.5))


def test_sql_api_exists_anti_replay(spark):
    from airflow_baseball_spark.queries_round8e import q_sql_api_exists_anti

    supp = load_table(spark, SF, "supplier").collect()
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, SF, "nation").collect()
    }
    bulk = {
        r["l_suppkey"]
        for r in load_table(spark, SF, "lineitem")
        .select("l_suppkey", "l_quantity")
        .collect()
        if r["l_quantity"] > 45
    }
    agg = defaultdict(lambda: [0, 0])
    for s in supp:
        a = agg[nation[s["s_nationkey"]]]
        a[0] += 1
        if s["s_suppkey"] not in bulk:
            a[1] += 1
    got = {
        r["nation"]: (r["n_suppliers"], r["n_no_bulk"])
        for r in q_sql_api_exists_anti(spark, SF).collect()
    }
    assert got == {n: tuple(v) for n, v in agg.items()}


def test_sql_api_window_share_replay(spark):
    from airflow_baseball_spark.queries_round8e import q_sql_api_window_share

    orders = (
        load_table(spark, SF, "orders")
        .select("o_custkey", "o_totalprice")
        .collect()
    )
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, SF, "customer").collect()
    }
    nat = {
        r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
        for r in load_table(spark, SF, "nation").collect()
    }
    reg = {
        r["r_regionkey"]: r["r_name"]
        for r in load_table(spark, SF, "region").collect()
    }
    rev = Counter()
    for o in orders:
        nk = cust[o["o_custkey"]]
        nname, rk = nat[nk]
        rev[(reg[rk], nname)] += _cents(o["o_totalprice"])
    reg_tot = Counter()
    for (rg, _), c in rev.items():
        reg_tot[rg] += c
    got = {
        (r["region"], r["nation"]): (r["rev_cents"], r["region_share"])
        for r in q_sql_api_window_share(spark, SF).collect()
    }
    assert set(got) == set(rev)
    for k, c in rev.items():
        assert got[k][0] == c
        assert got[k][1] == pytest.approx(
            _r6(c / reg_tot[k[0]]), abs=2e-6
        )


def test_simhash_bit_balance_replay(spark):
    from airflow_baseball_spark.queries_round8e import q_simhash_bit_balance
    from airflow_baseball_spark.text import dedup

    sigs = [
        r["simhash"]
        for r in dedup.simhash(load_table(spark, SF, "documents")).collect()
    ]
    nbits = dedup.SIMHASH_BITS
    n = len(sigs)
    ones = [sum((s >> b) & 1 for s in sigs) for b in range(nbits)]
    max_dev = _r6(max(abs(o / n - 0.5) for o in ones))
    got = {
        r["bit"]: (
            r["n_docs"],
            r["n_ones"],
            r["share_ones"],
            r["deviation"],
            r["max_deviation"],
        )
        for r in q_simhash_bit_balance(spark, SF).collect()
    }
    assert set(got) == set(range(nbits))
    for b in range(nbits):
        nd, no, sh, dv, md = got[b]
        assert (nd, no) == (n, ones[b])
        assert sh == pytest.approx(_r6(ones[b] / n), abs=2e-6)
        assert dv == pytest.approx(_r6(abs(ones[b] / n - 0.5)), abs=2e-6)
        assert md == pytest.approx(max_dev, abs=2e-6)


def test_holiday_lift_replay(spark):
    from airflow_baseball_spark.queries_round8e import q_holiday_lift

    daily = defaultdict(int)
    for r in (
        load_table(spark, SF, "orders")
        .select("o_orderdate", "o_totalprice")
        .collect()
    ):
        daily[r["o_orderdate"].date()] += _cents(r["o_totalprice"])
    cells = defaultdict(lambda: [0, 0])
    for d, c in daily.items():
        qtr = (d.month - 1) // 3 + 1
        a = cells[(qtr, d.day >= 25)]
        a[0] += 1
        a[1] += c
    got = {
        r["qtr"]: (
            r["n_end_days"],
            r["n_other_days"],
            r["avg_end_dollars"],
            r["avg_other_dollars"],
            r["lift"],
        )
        for r in q_holiday_lift(spark, SF).collect()
    }
    for qtr in {q for q, _ in cells}:
        ne, se = cells[(qtr, True)]
        no, so = cells[(qtr, False)]
        if ne == 0 or no == 0:
            assert qtr not in got
            continue
        ge, go_, ae, ao, lf = got[qtr]
        assert (ge, go_) == (ne, no)
        assert ae == pytest.approx(_r6(se / ne / 100.0), abs=2e-6)
        assert ao == pytest.approx(_r6(so / no / 100.0), abs=2e-6)
        assert lf == pytest.approx(_r6((se / ne) / (so / no)), abs=2e-6)


def test_weibull_moments_fit_replay(spark):
    from airflow_baseball_spark.queries_round8e import q_weibull_moments_fit

    ev = (
        load_table(spark, SF, "events")
        .select("event_type", "user_id", "ts", "event_id")
        .collect()
    )
    by = defaultdict(list)
    for r in ev:
        us = int(
            round(
                r["ts"].replace(tzinfo=timezone.utc).timestamp() * 1e6
            )
        )
        by[(r["event_type"], r["user_id"])].append((us, r["event_id"]))
    lm = defaultdict(list)
    for (et, _), seq in by.items():
        seq.sort()
        for (a, _), (b, _) in zip(seq, seq[1:]):
            if b - a > 0:
                lm[et].append(
                    int(math.floor(math.log((b - a) / 1e6) * 1e6 + 0.5))
                )
    got = {
        r["event_type"]: r for r in q_weibull_moments_fit(spark, SF).collect()
    }
    assert set(got) == set(lm)
    for et, ls in lm.items():
        n = len(ls)
        sl, sll = sum(ls), sum(x * x for x in ls)
        mean_l = sl / n / 1e6
        var_l = (n * sll - sl * sl) / (n * (n - 1)) / 1e12
        k = 1.2825498301618641 / math.sqrt(var_l)
        lam = math.exp(mean_l + 0.5772156649015329 / k)
        r = got[et]
        assert r["n_gaps"] == n
        assert r["mean_log_gap"] == pytest.approx(_r6(mean_l), abs=2e-6)
        assert r["sd_log_gap"] == pytest.approx(
            _r6(math.sqrt(var_l)), abs=2e-6
        )
        assert r["k_shape"] == pytest.approx(_r6(k), abs=2e-6)
        assert r["lambda_scale_sec"] == pytest.approx(_r6(lam), rel=2e-5)


def test_cold_start_coverage_replay(spark):
    from airflow_baseball_spark.queries_round8e import q_cold_start_coverage

    li = (
        load_table(spark, SF, "lineitem")
        .select("l_partkey", "l_orderkey", "l_extendedprice")
        .collect()
    )
    orders_per_part = defaultdict(set)
    rev_per_part = defaultdict(int)
    for r in li:
        orders_per_part[r["l_partkey"]].add(r["l_orderkey"])
        rev_per_part[r["l_partkey"]] += _cents(r["l_extendedprice"])
    n_catalog = load_table(spark, SF, "part").count()
    n_active = len(orders_per_part)
    cold = [p for p, s in orders_per_part.items() if len(s) <= 1]
    total_rev = sum(rev_per_part.values())
    cold_rev = sum(rev_per_part[p] for p in cold)
    row = q_cold_start_coverage(spark, SF).collect()[0]
    assert (
        row["n_catalog"],
        row["n_active_parts"],
        row["n_cold"],
        row["cold_rev_cents"],
        row["total_rev_cents"],
    ) == (n_catalog, n_active, len(cold), cold_rev, total_rev)
    assert row["cold_part_share"] == pytest.approx(
        _r6(len(cold) / n_active), abs=2e-6
    )
    assert row["cold_rev_share"] == pytest.approx(
        _r6(cold_rev / total_rev), abs=2e-6
    )
    assert row["never_sold_share"] == pytest.approx(
        _r6((n_catalog - n_active) / n_catalog), abs=2e-6
    )
