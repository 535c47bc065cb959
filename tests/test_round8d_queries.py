"""Pure-Python replay tests for the round-8d operators (house
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


def _micro(x: float) -> int:
    return int(math.floor(x * 1e6 + 0.5))


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


@pytest.fixture(scope="module")
def doc_tokens(spark):
    rows = (
        load_table(spark, SF, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    return [
        (r["doc_id"], r["source"], [w for w in (r["text"] or "").split() if w])
        for r in rows
    ]


def test_js_divergence_replay(spark, doc_tokens):
    from airflow_baseball_spark.queries_round8d import q_js_divergence

    sw = Counter()
    for _, src, toks in doc_tokens:
        for w in toks:
            sw[(src, w)] += 1
    s_tot = Counter()
    cw = Counter()
    for (src, w), c in sw.items():
        s_tot[src] += c
        cw[w] += c
    n_c = sum(cw.values())
    expected = {}
    for src in s_tot:
        js_micro = 0
        for w, n_w in cw.items():
            n_sw = sw.get((src, w), 0)
            p = n_sw / s_tot[src]
            q = (n_w - n_sw) / (n_c - s_tot[src])
            m = (p + q) / 2.0
            term = 0.0
            if n_sw > 0:
                term += p * (math.log(p) - math.log(m))
            if n_w - n_sw > 0:
                term += q * (math.log(q) - math.log(m))
            js_micro += _micro(term / 2.0)
        expected[src] = (
            s_tot[src],
            js_micro,
            _r6(js_micro / 1e6),
            _r6(js_micro / 1e6 / 0.6931471805599453),
        )
    got = {
        r["source"]: (r["n_tokens"], r["js_micro"], r["js_nats"], r["js_bits"])
        for r in q_js_divergence(spark, SF).collect()
    }
    assert got == expected


def test_ngram_entropy_curve_replay(spark, doc_tokens):
    from airflow_baseball_spark.queries_round8d import q_ngram_entropy_curve

    def h_micro(n: int) -> dict[str, int]:
        cnts = defaultdict(Counter)
        for _, src, toks in doc_tokens:
            if len(toks) < n:
                continue
            for i in range(len(toks) - n + 1):
                cnts[src][_md5(" ".join(toks[i : i + n]))] += 1
        out = {}
        for src, c in cnts.items():
            tot = sum(c.values())
            out[src] = sum(
                _micro(-(v / tot) * math.log(v / tot)) for v in c.values()
            )
        return out

    h1, h2, h3 = h_micro(1), h_micro(2), h_micro(3)
    got = {
        r["source"]: (r["h1"], r["h2"], r["h3"], r["cond_h2"], r["cond_h3"])
        for r in q_ngram_entropy_curve(spark, SF).collect()
    }
    assert set(got) == set(h1) & set(h2) & set(h3)
    for src in got:
        assert got[src] == (
            _r6(h1[src] / 1e6),
            _r6(h2[src] / 1e6),
            _r6(h3[src] / 1e6),
            _r6((h2[src] - h1[src]) / 1e6),
            _r6((h3[src] - h2[src]) / 1e6),
        )


def test_bleu2_paired_replay(spark, doc_tokens):
    from airflow_baseball_spark.queries_round8d import q_bleu2_paired

    by_pid = defaultdict(dict)
    for doc_id, _, toks in doc_tokens:
        by_pid[doc_id // 2][doc_id % 2] = toks
    pairs = {p: d for p, d in by_pid.items() if len(d) == 2}

    def gram_counter(toks, n):
        return Counter(
            _md5(" ".join(toks[i : i + n]))
            for i in range(len(toks) - n + 1)
        )

    tot = {1: 0, 2: 0}
    clip = {1: 0, 2: 0}
    c_len = r_len = 0
    for d in pairs.values():
        ref, cand = d[0], d[1]
        c_len += len(cand)
        r_len += len(ref)
        for n in (1, 2):
            gc, gr = gram_counter(cand, n), gram_counter(ref, n)
            tot[n] += sum(gc.values())
            clip[n] += sum(min(c, gr.get(g, 0)) for g, c in gc.items())
    p1 = clip[1] / tot[1]
    p2 = clip[2] / tot[2]
    bp = 1.0 if c_len >= r_len else math.exp(1.0 - r_len / c_len)
    row = q_bleu2_paired(spark, SF).collect()[0]
    assert (
        row["n_pairs"],
        row["c_len"],
        row["r_len"],
        row["clip1"],
        row["tot1"],
        row["clip2"],
        row["tot2"],
    ) == (len(pairs), c_len, r_len, clip[1], tot[1], clip[2], tot[2])
    assert row["p1"] == pytest.approx(_r6(p1), abs=2e-6)
    assert row["p2"] == pytest.approx(_r6(p2), abs=2e-6)
    assert row["brevity_penalty"] == pytest.approx(_r6(bp), abs=2e-6)
    assert row["bleu2"] == pytest.approx(
        _r6(bp * math.sqrt(p1 * p2)), abs=2e-6
    )


@pytest.fixture(scope="module")
def daily_cents(spark):
    acc = defaultdict(int)
    for r in (
        load_table(spark, SF, "orders")
        .select("o_orderdate", "o_totalprice")
        .collect()
    ):
        d = (r["o_orderdate"].date() - __import__("datetime").date(1970, 1, 1)).days
        acc[d] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
    return sorted(acc.items())


def test_siegel_slope_replay(spark, daily_cents):
    from airflow_baseball_spark.queries_round8d import q_siegel_slope

    pts = daily_cents
    meds = []
    for i, (da, va) in enumerate(pts):
        slopes = sorted(
            ((vb - va) * 1000000) // (db - da)
            for j, (db, vb) in enumerate(pts)
            if j != i
        )
        meds.append((slopes[(len(slopes) + 1) // 2 - 1], da))
    meds.sort()
    n = len(meds)
    sm = meds[(n + 1) // 2 - 1][0]
    row = q_siegel_slope(spark, SF).collect()[0]
    assert (row["n_days"], row["siegel_slope_micro"]) == (n, sm)
    assert row["slope_dollars_per_day"] == pytest.approx(
        _r6(sm / (1e6 * 100.0)), abs=2e-6
    )


def test_kendall_w_replay(spark, daily_cents):
    from airflow_baseball_spark.queries_round8d import q_kendall_w

    epoch_shift = (
        __import__("datetime").date(1990, 1, 1)
        - __import__("datetime").date(1970, 1, 1)
    ).days
    weeks = defaultdict(list)
    for d, c in daily_cents:
        di = d - epoch_shift
        weeks[di // 7].append((di % 7, c))
    r_j = Counter()
    k = 0
    for items in weeks.values():
        if len(items) != 7:
            continue
        k += 1
        for rnk, (dow, _) in enumerate(
            sorted(items, key=lambda t: (t[1], t[0])), start=1
        ):
            r_j[dow] += rnk
    s4 = (
        sum((2 * r_j[j] - k * 8) ** 2 for j in range(7)) if k > 0 else 0
    )
    row = q_kendall_w(spark, SF).collect()[0]
    assert (row["k_weeks"], row["s4"]) == (k, s4)
    if k > 0:
        w = 3.0 * s4 / (k * k * 336.0)
        assert row["kendall_w"] == pytest.approx(_r6(w), abs=2e-6)
        assert row["friedman_chi2"] == pytest.approx(_r6(k * 6.0 * w), abs=2e-6)


def test_weighted_kappa_replay(spark):
    from airflow_baseball_spark.queries_round8d import q_weighted_kappa

    docs = (
        load_table(spark, SF, "documents")
        .select("n_chars", "text")
        .collect()
    )
    cells = Counter()
    for r in docs:
        nc = r["n_chars"]
        nt = len((r["text"] or "").split(" "))
        la = 0 if nc < 400 else 1 if nc < 900 else 2
        lb = 0 if nt < 80 else 1 if nt < 180 else 2
        cells[(la, lb)] += 1
    n = sum(cells.values())
    ra, cb = Counter(), Counter()
    for (i, j), c in cells.items():
        ra[i] += c
        cb[j] += c
    sum_vo = sum((i - j) ** 2 * c for (i, j), c in cells.items())
    sum_vrc = sum(
        (i - j) ** 2 * ra[i] * cb[j] for i in range(3) for j in range(3)
    )
    row = q_weighted_kappa(spark, SF).collect()[0]
    assert (row["n_docs"], row["sum_vo"], row["sum_vrc"]) == (
        n,
        sum_vo,
        sum_vrc,
    )
    assert row["kappa_weighted"] == pytest.approx(
        _r6(1.0 - n * sum_vo / sum_vrc), abs=2e-6
    )


def test_bounce_rate_replay(spark):
    from airflow_baseball_spark.queries_round8d import q_bounce_rate

    ev = (
        load_table(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        us = int(r["ts"].timestamp() * 1e6) if False else None
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    sessions = []
    gap = 30 * 60 * 1000000
    for seq in by_user.values():
        seq.sort()
        cur = []
        prev_us = None
        for ts, eid, et in seq:
            us = (
                ts.replace(tzinfo=__import__("datetime").timezone.utc).timestamp()
            )
            us = int(round(us * 1e6))
            if prev_us is not None and us - prev_us > gap:
                sessions.append(cur)
                cur = []
            cur.append(et)
            prev_us = us
        if cur:
            sessions.append(cur)
    agg = defaultdict(lambda: [0, 0])
    for s in sessions:
        a = agg[s[0]]
        a[0] += 1
        a[1] += 1 if len(s) == 1 else 0
    got = {
        r["entry_type"]: (r["n_sessions"], r["n_bounces"], r["bounce_rate"])
        for r in q_bounce_rate(spark, SF).collect()
    }
    assert set(got) == set(agg)
    for t, (ns, nb) in agg.items():
        assert got[t][0:2] == (ns, nb)
        assert got[t][2] == pytest.approx(_r6(nb / ns), abs=2e-6)
