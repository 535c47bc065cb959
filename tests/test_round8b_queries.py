"""Pure-Python replay tests for the round-8b operators — the house
third-implementation pattern: the same algorithm written a third time
in plain Python over collected rows must reproduce the distributed
result value-for-value (the DuckDB oracle is the second
implementation; a replay catches a Spark/oracle correlated mistake)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
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
    """Exact daily revenue in integer cents, ordered by day."""
    rows = (
        load_table(spark, SF, "orders")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    acc: dict[date, int] = defaultdict(int)
    for r in rows:
        acc[r["o_orderdate"].date()] += _cents(r["o_totalprice"])
    return sorted(acc.items())


def test_permutation_entropy_replay(spark, daily):
    from airflow_baseball_spark.queries_round8b import q_permutation_entropy

    v = [c for _, c in daily]
    pats = Counter()
    for i in range(len(v) - 2):
        x0, x1, x2 = v[i], v[i + 1], v[i + 2]
        r0 = (x1 < x0) + (x2 < x0)
        r1 = (x0 <= x1) + (x2 < x1)
        r2 = (x0 <= x2) + (x1 <= x2)
        pats[r0 * 100 + r1 * 10 + r2] += 1
    n = sum(pats.values())
    ent = _r6(-sum((c / n) * math.log(c / n) for c in pats.values()))
    got = {
        r["pattern"]: (r["cnt"], r["share"], r["n_triples"], r["perm_entropy"])
        for r in q_permutation_entropy(spark, SF).collect()
    }
    expected = {p: (c, _r6(c / n), n, ent) for p, c in pats.items()}
    assert got == expected


def test_sample_entropy_replay(spark, daily):
    from airflow_baseball_spark.queries_round8b import q_sample_entropy

    v = [c for _, c in daily]
    t = [(v[i], v[i + 1], v[i + 2]) for i in range(len(v) - 2)]
    n = len(t)
    sx = sum(a for a, _, _ in t)
    sxx = sum(a * a for a, _, _ in t)
    sd = math.sqrt((n * sxx - sx * sx) / (n * (n - 1)))
    r = int(math.floor(sd * 0.2))
    b = a_cnt = 0
    for i in range(n):
        for j in range(i + 1, n):
            d01 = max(abs(t[i][0] - t[j][0]), abs(t[i][1] - t[j][1]))
            if d01 <= r:
                b += 1
            if max(d01, abs(t[i][2] - t[j][2])) <= r:
                a_cnt += 1
    row = q_sample_entropy(spark, SF).collect()[0]
    assert (row["n_templates"], row["r_tol"]) == (n, r)
    assert (row["b_matches"], row["a_matches"]) == (b, a_cnt)
    if a_cnt > 0 and b > 0:
        assert row["sampen"] == _r6(-math.log(a_cnt / b))


def test_pacf_replay(spark, daily):
    from airflow_baseball_spark.queries_round8b import q_pacf_yule_walker

    v = [c / 100.0 for _, c in daily]

    def pearson_lag(k: int) -> float:
        xs = v[:-k]
        ys = v[k:]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        return (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        )

    r1, r2, r3 = pearson_lag(1), pearson_lag(2), pearson_lag(3)
    p2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    phi21 = r1 - p2 * r1
    p3 = (r3 - phi21 * r2 - p2 * r1) / (1.0 - phi21 * r1 - p2 * r2)
    got = {
        r["lag_k"]: r["pacf"]
        for r in q_pacf_yule_walker(spark, SF).collect()
    }
    for lag, exp in ((1, r1), (2, p2), (3, p3)):
        assert got[lag] == pytest.approx(_r6(exp), abs=2e-6)


def test_page_trend_replay(spark, daily):
    from airflow_baseball_spark.queries_round8b import q_page_trend_test

    epoch = date(1990, 1, 1)
    weeks: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for d, c in daily:
        di = (d - epoch).days
        weeks[di // 7].append((di % 7, c))
    l_stat = 0
    k = 0
    for wk, items in weeks.items():
        if len(items) != 7:
            continue
        k += 1
        ranked = sorted(items, key=lambda t: (t[1], t[0]))
        for rnk, (dow, _) in enumerate(ranked, start=1):
            l_stat += (dow + 1) * rnk
    row = q_page_trend_test(spark, SF).collect()[0]
    assert (row["k_weeks"], row["l_stat"]) == (k, l_stat)
    if k == 0:
        assert row["z_stat"] is None
    else:
        z = (l_stat - k * 112.0) / math.sqrt(k * (18816.0 / 144.0))
        assert row["z_stat"] == pytest.approx(_r6(z), abs=2e-6)


@pytest.fixture(scope="module")
def brand_halves(spark):
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
    dmin = min(orders.values())
    dmax = max(orders.values())
    half = (dmax - dmin).days // 2
    h1: dict[str, int] = defaultdict(int)
    h2: dict[str, int] = defaultdict(int)
    for r in li:
        brand = part[r["l_partkey"]]
        tgt = (
            h1
            if (orders[r["l_orderkey"]] - dmin).days <= half
            else h2
        )
        tgt[brand] += _cents(r["l_extendedprice"])
    brands = sorted(set(h1) | set(h2))
    return {b: (h1.get(b, 0), h2.get(b, 0)) for b in brands}


def test_rank_biased_overlap_replay(spark, brand_halves):
    from airflow_baseball_spark.queries_round8b import q_rank_biased_overlap

    ra = {
        b: i + 1
        for i, (b, _) in enumerate(
            sorted(brand_halves.items(), key=lambda t: (-t[1][0], t[0]))
        )
    }
    rb = {
        b: i + 1
        for i, (b, _) in enumerate(
            sorted(brand_halves.items(), key=lambda t: (-t[1][1], t[0]))
        )
    }
    both = {
        b
        for b in brand_halves
        if ra[b] <= 20 and rb[b] <= 20
    }
    terms = {}
    raw = 0.0
    for d in range(1, 21):
        x = sum(1 for b in both if max(ra[b], rb[b]) <= d)
        t = (0.9 ** (d - 1)) * x / d
        terms[d] = (x, _r6(t))
        raw += t
    rbo = _r6(0.1 * raw)
    got = {
        r["depth"]: (r["x_d"], r["term"], r["rbo"])
        for r in q_rank_biased_overlap(spark, SF).collect()
    }
    for d, (x, t) in terms.items():
        assert got[d][0] == x
        assert got[d][1] == pytest.approx(t, abs=2e-6)
        assert got[d][2] == pytest.approx(rbo, abs=2e-6)


def test_sign_test_bh_replay(spark):
    from airflow_baseball_spark.queries_round8b import q_sign_test_bh

    ev = (
        load_table(spark, SF, "events")
        .select("event_type", "ts")
        .collect()
    )
    cnt = Counter((r["event_type"], r["ts"].date()) for r in ev)
    vals = sorted(cnt.values())
    med = vals[(len(vals) + 1) // 2 - 1]
    per_type: dict[str, tuple[int, int]] = {}
    for (et, _), c in cnt.items():
        n, k = per_type.get(et, (0, 0))
        per_type[et] = (n + 1, k + (1 if c > med else 0))
    m = len(per_type)
    scored = []
    for et, (n, k) in per_type.items():
        t0 = max(k, n - k)
        tail = sum(math.comb(n, j) for j in range(t0, n + 1))
        p = min(1.0, 2.0 * tail * (0.5**n))
        scored.append((p, et, n, k))
    scored.sort()
    i_star = 0
    for i, (p, *_rest) in enumerate(scored, start=1):
        if p * 20.0 * m <= i:
            i_star = i
    expected = {
        et: (n, k, p, i, 1 if i <= i_star else 0)
        for i, (p, et, n, k) in enumerate(scored, start=1)
    }
    got = {
        r["event_type"]: (
            r["n_days"],
            r["k_above"],
            r["p_exact"],
            r["bh_rank"],
            r["bh_reject"],
        )
        for r in q_sign_test_bh(spark, SF).collect()
    }
    assert got == expected


def test_markov_entropy_rate_replay(spark):
    from airflow_baseball_spark.queries_round8b import q_markov_entropy_rate

    ev = (
        load_table(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user: dict[int, list] = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    pairs = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            pairs[(a, b)] += 1
    n_tot = sum(pairs.values())
    marg = Counter()
    for (a, _), c in pairs.items():
        marg[a] += c
    h = _r6(
        sum(
            (c / n_tot) * -math.log(c / marg[a])
            for (a, _), c in pairs.items()
        )
    )
    got = {
        (r["a"], r["b"]): (r["n_ab"], r["p_cond"], r["h_term"], r["entropy_rate"])
        for r in q_markov_entropy_rate(spark, SF).collect()
    }
    assert set(got) == set(pairs)
    for (a, b), c in pairs.items():
        na, pc, ht, er = got[(a, b)]
        assert na == c
        assert pc == pytest.approx(_r6(c / marg[a]), abs=2e-6)
        assert ht == pytest.approx(
            _r6((c / n_tot) * -math.log(c / marg[a])), abs=2e-6
        )
        assert er == pytest.approx(h, abs=2e-6)


def test_err_at_k_bounds(spark):
    """ERR@5 is a probability-weighted reciprocal-rank sum: it lies in
    (0, 1] and every segment gets exactly one row (structural check;
    the oracle + replay on the ranked pipeline live in the registry
    sweeps)."""
    from airflow_baseball_spark.queries_round8b import q_err_at_k

    rows = q_err_at_k(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 < r["err_at_5"] <= 1.0
