"""Pure-Python replay tests for the round-8c operators (house
third-implementation pattern — see test_round8_queries.py)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

from airflow_baseball_spark.schemas import load_table

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


def _cents(x: float) -> int:
    return int(math.floor(x * 100 + 0.5))


def _coin(key: int, mod: int) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16) % mod


def test_katz_3step_replay(spark):
    from airflow_baseball_spark.queries_round8c import q_katz_3step

    li = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    part = {
        r["p_partkey"]: r["p_brand"]
        for r in load_table(spark, SF, "part").collect()
    }
    ob = {(r["l_orderkey"], part[r["l_partkey"]]) for r in li}
    baskets = defaultdict(set)
    for ok, b in ob:
        baskets[ok].add(b)
    support = Counter()
    for brands in baskets.values():
        bs = sorted(brands)
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                support[(bs[i], bs[j])] += 1
    edges = [e for e, s in support.items() if s >= 5]
    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    w1 = {v: len(ns) for v, ns in adj.items()}
    w2 = {v: sum(w1[u] for u in adj[v]) for v in adj}
    w3 = {v: sum(w2[u] for u in adj[v]) for v in adj}
    got = {
        r["brand"]: (r["w1"], r["w2"], r["w3"], r["katz_milli"], r["katz"])
        for r in q_katz_3step(spark, SF).collect()
    }
    assert set(got) == set(adj)
    for v in adj:
        milli = w1[v] * 100 + w2[v] * 10 + w3[v]
        assert got[v] == (w1[v], w2[v], w3[v], milli, _r6(milli / 1000.0))


def test_stratified_ate_replay(spark):
    from airflow_baseball_spark.queries_round8c import q_stratified_ate

    orders = (
        load_table(spark, SF, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .collect()
    )
    seg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in load_table(spark, SF, "customer").collect()
    }
    acc = defaultdict(lambda: [0, 0, 0, 0])  # n, n1, y1, y0
    for r in orders:
        s = seg[r["o_custkey"]]
        t = _coin(r["o_orderkey"], 2)
        y = _cents(r["o_totalprice"])
        a = acc[s]
        a[0] += 1
        a[1] += t
        if t:
            a[2] += y
        else:
            a[3] += y
    n_all = sum(a[0] for a in acc.values())
    ate = _r6(
        sum(
            (a[0] / n_all)
            * (a[2] / a[1] / 100.0 - a[3] / (a[0] - a[1]) / 100.0)
            for a in acc.values()
        )
    )
    got = {
        r["c_mktsegment"]: (
            r["n_s"],
            r["n1"],
            r["mean_treated"],
            r["mean_control"],
            r["diff"],
            r["ate_dollars"],
        )
        for r in q_stratified_ate(spark, SF).collect()
    }
    assert set(got) == set(acc)
    for s, a in acc.items():
        m1 = a[2] / a[1] / 100.0
        m0 = a[3] / (a[0] - a[1]) / 100.0
        ns, n1, gm1, gm0, gd, gate = got[s]
        assert (ns, n1) == (a[0], a[1])
        assert gm1 == pytest.approx(_r6(m1), abs=2e-6)
        assert gm0 == pytest.approx(_r6(m0), abs=2e-6)
        assert gd == pytest.approx(_r6(m1 - m0), abs=2e-6)
        assert gate == pytest.approx(ate, abs=2e-6)


@pytest.fixture(scope="module")
def pc_values(spark):
    rows = (
        load_table(spark, SF, "events")
        .select("event_type", "value")
        .collect()
    )
    pos = [_cents(r["value"]) for r in rows if r["event_type"] == "purchase"]
    neg = [_cents(r["value"]) for r in rows if r["event_type"] == "click"]
    return pos, neg


def test_auc_ci_hanley_replay(spark, pc_values):
    from airflow_baseball_spark.queries_round8c import q_auc_ci_hanley

    pos, neg = pc_values
    n1, n0 = len(pos), len(neg)
    wins = sum(1 for x in pos for y in neg if x > y)
    ties = sum(1 for x in pos for y in neg if x == y)
    a = (2 * wins + ties) / (2.0 * n1 * n0)
    q1 = a / (2 - a)
    q2 = 2 * a * a / (1 + a)
    se = math.sqrt(
        (a * (1 - a) + (n1 - 1) * (q1 - a * a) + (n0 - 1) * (q2 - a * a))
        / (n1 * n0)
    )
    row = q_auc_ci_hanley(spark, SF).collect()[0]
    assert (row["n1"], row["n0"]) == (n1, n0)
    assert row["auc"] == pytest.approx(_r6(a), abs=2e-6)
    assert row["se_hanley"] == pytest.approx(_r6(se), abs=2e-6)
    assert row["ci_lo"] == pytest.approx(
        _r6(max(0.0, a - 1.96 * se)), abs=2e-6
    )
    assert row["ci_hi"] == pytest.approx(
        _r6(min(1.0, a + 1.96 * se)), abs=2e-6
    )


def test_cliff_delta_replay(spark, pc_values):
    from airflow_baseball_spark.queries_round8c import q_cliff_delta

    pos, neg = pc_values
    wins = sum(1 for x in pos for y in neg if x > y)
    losses = sum(1 for x in pos for y in neg if x < y)
    delta = (wins - losses) / (len(pos) * len(neg))
    row = q_cliff_delta(spark, SF).collect()[0]
    assert (row["n1"], row["n0"], row["wins"], row["losses"]) == (
        len(pos),
        len(neg),
        wins,
        losses,
    )
    assert row["cliff_delta"] == pytest.approx(_r6(delta), abs=2e-6)
    mag = (
        "negligible"
        if abs(delta) < 0.147
        else "small"
        if abs(delta) < 0.33
        else "medium"
        if abs(delta) < 0.474
        else "large"
    )
    assert row["magnitude"] == mag


def test_erasure_sweep_replay(spark):
    from airflow_baseball_spark.queries_round8c import q_erasure_sweep

    cust = [
        r["c_custkey"] for r in load_table(spark, SF, "customer").collect()
    ]
    dels = {k for k in cust if _coin(k, 20) == 0}
    orders = (
        load_table(spark, SF, "orders")
        .select("o_orderkey", "o_custkey")
        .collect()
    )
    del_orders = {r["o_orderkey"] for r in orders if r["o_custkey"] in dels}
    li = load_table(spark, SF, "lineitem").select("l_orderkey").collect()
    li_del = sum(1 for r in li if r["l_orderkey"] in del_orders)
    expected = {
        "customer": (len(cust), len(dels)),
        "orders": (len(orders), len(del_orders)),
        "lineitem": (len(li), li_del),
    }
    got = {
        r["table_name"]: (r["n_rows"], r["n_erase"], r["erase_frac"])
        for r in q_erasure_sweep(spark, SF).collect()
    }
    assert set(got) == set(expected)
    for t, (n, e) in expected.items():
        assert got[t][0:2] == (n, e)
        assert got[t][2] == pytest.approx(_r6(e / n), abs=2e-6)


def test_trigram_transitions_replay(spark):
    from airflow_baseball_spark.queries_round8c import q_trigram_transitions

    ev = (
        load_table(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    tri = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b), (_, _, c) in zip(seq, seq[1:], seq[2:]):
            tri[(a, b, c)] += 1
    bi = Counter()
    for (a, b, _), n in tri.items():
        bi[(a, b)] += n
    got = {
        (r["a"], r["b"], r["c"]): (r["n_abc"], r["n_ab"], r["p_cond"])
        for r in q_trigram_transitions(spark, SF).collect()
    }
    assert set(got) == set(tri)
    for k, n in tri.items():
        nb = bi[(k[0], k[1])]
        assert got[k][0:2] == (n, nb)
        assert got[k][2] == pytest.approx(_r6(n / nb), abs=2e-6)


def test_spearman_footrule_replay(spark):
    from airflow_baseball_spark.queries_round8c import q_spearman_footrule

    li = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey", "l_extendedprice")
        .collect()
    )
    part = {
        r["p_partkey"]: r["p_brand"]
        for r in load_table(spark, SF, "part").collect()
    }
    orders = {
        r["o_orderkey"]: r["o_orderdate"].date()
        for r in load_table(spark, SF, "orders")
        .select("o_orderkey", "o_orderdate")
        .collect()
    }
    dmin, dmax = min(orders.values()), max(orders.values())
    half = (dmax - dmin).days // 2
    h1, h2 = defaultdict(int), defaultdict(int)
    for r in li:
        b = part[r["l_partkey"]]
        d = (orders[r["l_orderkey"]] - dmin).days
        (h1 if d <= half else h2)[b] += _cents(r["l_extendedprice"])
    brands = sorted(set(h1) | set(h2))
    ra = {
        b: i + 1
        for i, b in enumerate(
            sorted(brands, key=lambda b: (-h1.get(b, 0), b))
        )
    }
    rb = {
        b: i + 1
        for i, b in enumerate(
            sorted(brands, key=lambda b: (-h2.get(b, 0), b))
        )
    }
    fr = sum(abs(ra[b] - rb[b]) for b in brands)
    n = len(brands)
    fmax = n * n // 2
    row = q_spearman_footrule(spark, SF).collect()[0]
    assert (row["n_items"], row["footrule"], row["f_max"]) == (n, fr, fmax)
    assert row["similarity"] == pytest.approx(_r6(1 - fr / fmax), abs=2e-6)


def test_mood_median_test_replay(spark):
    from airflow_baseball_spark.queries_round8c import q_mood_median_test

    ev = (
        load_table(spark, SF, "events")
        .select("event_type", "value")
        .collect()
    )
    vals = sorted(_cents(r["value"]) for r in ev)
    med = vals[(len(vals) + 1) // 2 - 1]
    above, below = Counter(), Counter()
    for r in ev:
        if _cents(r["value"]) > med:
            above[r["event_type"]] += 1
        else:
            below[r["event_type"]] += 1
    types = sorted(set(above) | set(below))
    ta = sum(above.values())
    tb = sum(below.values())
    n = ta + tb
    chi2 = 0.0
    for t in types:
        rt = above[t] + below[t]
        ea = rt * ta / n
        eb = rt * tb / n
        chi2 += (above[t] - ea) ** 2 / ea + (below[t] - eb) ** 2 / eb
    got = {
        r["event_type"]: (
            r["n_above"],
            r["n_below"],
            r["grand_median_cents"],
            r["chi2"],
            r["df"],
        )
        for r in q_mood_median_test(spark, SF).collect()
    }
    assert set(got) == set(types)
    for t in types:
        na, nb, gm, gchi, df = got[t]
        assert (na, nb, gm, df) == (above[t], below[t], med, len(types) - 1)
        assert gchi == pytest.approx(_r6(chi2), abs=2e-6)
