"""Pure-Python replay tests for the round-8f operators (house
third-implementation pattern — see test_round8_queries.py)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from datetime import date, timezone

import pytest

from airflow_baseball_spark.schemas import load_table

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


def _cents(x: float) -> int:
    return int(math.floor(x * 100 + 0.5))


def _coin(key: str, mod: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % mod


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
    return dict(acc)


def test_gesd_outliers_replay(spark, daily):
    from airflow_baseball_spark.queries_round8f import q_gesd_outliers

    pts = dict(daily)
    expected = []
    for rnd in (1, 2, 3):
        n = len(pts)
        sx = sum(pts.values())
        sxx = sum(v * v for v in pts.values())
        d_star = max(pts, key=lambda d: (abs(pts[d] * n - sx), -d))
        x = pts[d_star]
        mean = sx / n
        var = (n * sxx - sx * sx) / (n * (n - 1))
        expected.append(
            (rnd, d_star, x, n, _r6(abs(x - mean) / math.sqrt(var)))
        )
        del pts[d_star]
    got = [
        (r["round"], r["day_removed"], r["x_cents"], r["n_before"], r["r_stat"])
        for r in sorted(
            q_gesd_outliers(spark, SF).collect(), key=lambda r: r["round"]
        )
    ]
    for e, g in zip(expected, got):
        assert g[:4] == e[:4]
        assert g[4] == pytest.approx(e[4], abs=2e-6)


def test_seasonal_mann_kendall_replay(spark, daily):
    from airflow_baseball_spark.queries_round8f import (
        q_seasonal_mann_kendall,
    )

    strata = defaultdict(list)
    for d, x in daily.items():
        strata[d % 7].append((d, x))
    s_j, n_j, n_pairs = {}, {}, {}
    for dow, pts in strata.items():
        pts.sort()
        s = 0
        np_ = 0
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                np_ += 1
                diff = pts[j][1] - pts[i][1]
                s += (diff > 0) - (diff < 0)
        s_j[dow], n_j[dow], n_pairs[dow] = s, len(pts), np_
    s_total = sum(s_j.values())
    var18 = sum(n * (n - 1) * (2 * n + 5) for n in n_j.values())
    var = var18 / 18.0
    if s_total > 0:
        z = _r6((s_total - 1.0) / math.sqrt(var))
    elif s_total < 0:
        z = _r6((s_total + 1.0) / math.sqrt(var))
    else:
        z = 0.0
    got = {
        r["dow"]: (
            r["n_j"],
            r["s_j"],
            r["n_pairs"],
            r["s_total"],
            r["var18"],
            r["z_stat"],
        )
        for r in q_seasonal_mann_kendall(spark, SF).collect()
    }
    assert set(got) == set(s_j)
    for dow in s_j:
        gj, gs, gp, gt, gv, gz = got[dow]
        assert (gj, gs, gp, gt, gv) == (
            n_j[dow],
            s_j[dow],
            n_pairs[dow],
            s_total,
            var18,
        )
        assert gz == pytest.approx(z, abs=2e-6)


def test_split_stability_replay(spark):
    from airflow_baseball_spark.queries_round8f import q_split_stability

    orders = (
        load_table(spark, SF, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    means = {}
    counts = {}
    for salt in range(5):
        sel = [
            _cents(r["o_totalprice"])
            for r in orders
            if _coin(f"{salt}:{r['o_orderkey']}", 5) == 0
        ]
        counts[salt] = len(sel)
        means[salt] = _r6(sum(sel) / len(sel) / 100.0)
    spread = _r6(max(means.values()) - min(means.values()))
    got = {
        r["salt"]: (r["n_test"], r["mean_test_dollars"], r["spread_dollars"])
        for r in q_split_stability(spark, SF).collect()
    }
    assert set(got) == set(range(5))
    for salt in range(5):
        assert got[salt][0] == counts[salt]
        assert got[salt][1] == pytest.approx(means[salt], abs=2e-6)
        assert got[salt][2] == pytest.approx(spread, abs=2e-6)


def test_funnel_aa_replay(spark):
    from airflow_baseball_spark.queries_round8f import q_funnel_aa_test

    ev = (
        load_table(spark, SF, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    firsts = defaultdict(dict)
    for r in ev:
        us = int(
            round(
                r["ts"].replace(tzinfo=timezone.utc).timestamp() * 1e6
            )
        )
        cur = firsts[r["user_id"]].get(r["event_type"])
        if cur is None or us < cur:
            firsts[r["user_id"]][r["event_type"]] = us
    arms = {0: [0, 0, 0], 1: [0, 0, 0]}
    for uid, f in firsts.items():
        if "view" not in f:
            continue
        arm = _coin(str(uid), 2)
        arms[arm][0] += 1
        clk = "click" in f and f["click"] > f["view"]
        if clk:
            arms[arm][1] += 1
            if "purchase" in f and f["purchase"] > f["click"]:
                arms[arm][2] += 1

    def z(x0, n0, x1, n1):
        p0, p1 = x0 / n0, x1 / n1
        pp = (x0 + x1) / (n0 + n1)
        return _r6(
            (p0 - p1)
            / math.sqrt(pp * (1 - pp) * (1 / n0 + 1 / n1))
        )

    v0, c0, p0 = arms[0]
    v1, c1, p1 = arms[1]
    expected = {
        "view_to_click": (v0, c0, v1, c1, z(c0, v0, c1, v1)),
        "click_to_purchase": (c0, p0, c1, p1, z(p0, c0, p1, c1)),
    }
    got = {
        r["step"]: (r["n0"], r["x0"], r["n1"], r["x1"], r["z_stat"])
        for r in q_funnel_aa_test(spark, SF).collect()
    }
    assert set(got) == set(expected)
    for k, e in expected.items():
        assert got[k][:4] == e[:4]
        assert got[k][4] == pytest.approx(e[4], abs=2e-6)


def test_geometric_gof_replay(spark):
    from airflow_baseball_spark.queries_round8f import q_geometric_gof

    per_cust = Counter()
    for r in load_table(spark, SF, "orders").select("o_custkey").collect():
        per_cust[r["o_custkey"]] += 1
    n = len(per_cust)
    sum_k = sum(per_cust.values())
    p = n / sum_k
    obs = Counter(min(k, 11) for k in per_cust.values())
    exp = {}
    for kb in range(1, 12):
        if kb < 11:
            exp[kb] = n * (1 - p) ** (kb - 1) * p
        else:
            exp[kb] = n * (1 - p) ** 10
    chi2 = _r6(
        sum((obs.get(k, 0) - e) ** 2 / e for k, e in exp.items())
    )
    got = {
        r["kb"]: (
            r["observed"],
            r["expected"],
            r["n_cust"],
            r["sum_k"],
            r["chi2"],
            r["df"],
        )
        for r in q_geometric_gof(spark, SF).collect()
    }
    assert set(got) == set(range(1, 12))
    for kb in range(1, 12):
        o, e, gn, gs, gc, df = got[kb]
        assert (o, gn, gs, df) == (obs.get(kb, 0), n, sum_k, 9)
        assert e == pytest.approx(_r6(exp[kb]), abs=2e-6)
        assert gc == pytest.approx(chi2, abs=2e-6)


def test_cross_price_elasticity_replay(spark):
    from airflow_baseball_spark.queries_round8f import (
        q_cross_price_elasticity,
    )

    li = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey", "l_extendedprice", "l_quantity")
        .collect()
    )
    part = {
        r["p_partkey"]: r["p_brand"]
        for r in load_table(spark, SF, "part").collect()
    }
    orders = {
        r["o_orderkey"]: (r["o_orderdate"].date() - date(1970, 1, 1)).days
        for r in load_table(spark, SF, "orders")
        .select("o_orderkey", "o_orderdate")
        .collect()
    }
    bw = defaultdict(lambda: [0, 0])
    for r in li:
        wk = orders[r["l_orderkey"]] // 7
        a = bw[(part[r["l_partkey"]], wk)]
        a[0] += _cents(r["l_extendedprice"])
        a[1] += _cents(r["l_quantity"])
    rev = Counter()
    for (b, _), (e, _q) in bw.items():
        rev[b] += e
    top5 = [
        b
        for b, _ in sorted(rev.items(), key=lambda t: (-t[1], t[0]))[:5]
    ]
    lp, lq = {}, {}
    for (b, wk), (e, q) in bw.items():
        if b not in top5:
            continue
        lp[(b, wk)] = int(math.floor(math.log(e / q) * 1e9))
        lq[(b, wk)] = int(math.floor(math.log(q / 100.0) * 1e9))
    expected = {}
    for ba in top5:
        for bb in top5:
            if ba == bb:
                continue
            wks = sorted(
                w
                for (b, w) in lp
                if b == ba and (bb, w) in lq
            )
            xs = [lp[(ba, w)] for w in wks]
            ys = [lq[(bb, w)] for w in wks]
            nn = len(xs)
            sx, sy = sum(xs), sum(ys)
            sxy = sum(a * b for a, b in zip(xs, ys))
            sxx = sum(a * a for a in xs)
            slope = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
            expected[(ba, bb)] = (nn, _r6(slope))
    got = {
        (r["brand_a"], r["brand_b"]): (r["n_weeks"], r["cross_elasticity"])
        for r in q_cross_price_elasticity(spark, SF).collect()
    }
    assert set(got) == set(expected)
    for k, (nn, sl) in expected.items():
        assert got[k][0] == nn
        assert got[k][1] == pytest.approx(sl, abs=2e-6)
