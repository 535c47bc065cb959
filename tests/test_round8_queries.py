"""Pure-Python replay tests for the round-8 operators — the house
third-implementation pattern: the same algorithm written a third time
in plain Python over collected rows must reproduce the distributed
result value-for-value (the DuckDB oracle is the second
implementation; a replay catches the case where Spark and the oracle
share a correlated mistake)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

from airflow_baseball_spark.schemas import load_table

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _r6(x: float) -> float:
    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


@pytest.fixture(scope="module")
def docs(spark):
    return [
        (r["doc_id"], r["source"], (r["text"] or ""))
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "source", "text")
        .collect()
    ]


def _toks(text: str) -> list[str]:
    return [w for w in text.strip().split() if w]


def test_winnowing_replay(spark, docs):
    from airflow_baseball_spark.queries_round8 import (
        _WIN_K,
        _WIN_W,
        q_winnowing_fingerprint,
    )

    per_source = defaultdict(lambda: [set(), 0, set()])  # docs, sel, distinct
    sel_rows = defaultdict(set)  # (source) -> {(doc, wmin)}
    for doc_id, source, text in docs:
        toks = _toks(text)
        if len(toks) < _WIN_K + _WIN_W - 1:
            continue
        grams = [
            _md5(" ".join(toks[i : i + _WIN_K]))
            for i in range(len(toks) - _WIN_K + 1)
        ]
        mins = {
            min(grams[i : i + _WIN_W])
            for i in range(len(grams) - _WIN_W + 1)
        }
        for m in mins:
            sel_rows[source].add((doc_id, m))
    expected = {}
    for source, rows in sel_rows.items():
        n_docs = len({d for d, _ in rows})
        n_sel = len(rows)
        n_dist = len({m for _, m in rows})
        expected[source] = (
            n_docs,
            n_sel,
            n_dist,
            _r6(1 - n_dist / n_sel),
        )
    got = {
        r["source"]: (
            r["n_docs"],
            r["n_selected"],
            r["n_distinct"],
            r["dup_ratio"],
        )
        for r in q_winnowing_fingerprint(spark, SF).collect()
    }
    assert got == expected


def test_cdc_chunks_replay(spark, docs):
    from airflow_baseball_spark.queries_round8 import (
        _CDC_MOD,
        q_cdc_word_chunks,
    )

    chunks = defaultdict(list)  # source -> [(len, digest)]
    for doc_id, source, text in docs:
        toks = _toks(text)
        if not toks:
            continue
        cur: list[str] = []
        for w in toks:
            cur.append(w)
            h = _md5(w)
            if (ord(h[0]) * 256 + ord(h[1])) % _CDC_MOD == 0:
                chunks[source].append((len(cur), _md5(" ".join(cur))))
                cur = []
        if cur:
            chunks[source].append((len(cur), _md5(" ".join(cur))))
    expected = {}
    for source, cs in chunks.items():
        n = len(cs)
        tokens = sum(l for l, _ in cs)
        dist = len({d for _, d in cs})
        expected[source] = (
            n,
            tokens,
            dist,
            _r6(tokens / n),
            _r6(1 - dist / n),
        )
    got = {
        r["source"]: (
            r["n_chunks"],
            r["n_tokens"],
            r["n_distinct_chunks"],
            r["mean_chunk_len"],
            r["cdc_dup_ratio"],
        )
        for r in q_cdc_word_chunks(spark, SF).collect()
    }
    assert got == expected


def test_suffix_prefix_overlap_replay(spark, docs):
    from airflow_baseball_spark.queries_round8 import (
        _OVL_K,
        q_suffix_prefix_overlap,
    )

    heads = defaultdict(list)
    tails = defaultdict(list)
    for doc_id, _source, text in docs:
        toks = _toks(text)
        if len(toks) < 2 * _OVL_K:
            continue
        heads[_md5(" ".join(toks[:_OVL_K]))].append(doc_id)
        tails[_md5(" ".join(toks[-_OVL_K:]))].append(doc_id)
    pairs = [
        (a, b)
        for d, alist in tails.items()
        for a in alist
        for b in heads.get(d, [])
        if a != b
    ]
    row = q_suffix_prefix_overlap(spark, SF).collect()[0]
    assert row["n_pairs"] == len(pairs)
    assert row["n_tail_docs"] == len({a for a, _ in pairs})
    assert row["n_head_docs"] == len({b for _, b in pairs})
    assert row["pair_checksum"] == sum(
        (a * 31 + b) % 1_000_003 for a, b in pairs
    )


def test_distinct_ngrams_replay(spark, docs):
    from airflow_baseball_spark.queries_round8 import q_distinct_ngrams

    uni_tok = Counter()
    uni_types = defaultdict(set)
    bi_tok = Counter()
    bi_types = defaultdict(set)
    for _doc, source, text in docs:
        # mirror the query exactly: unigrams filter empties AFTER the
        # split; bigrams run over the raw trimmed-split token array
        raw = text.strip().split()
        for w in raw:
            if w:
                uni_tok[source] += 1
                uni_types[source].add(w)
        for i in range(len(raw) - 1):
            g = _md5(raw[i] + " " + raw[i + 1])
            bi_tok[source] += 1
            bi_types[source].add(g)
    got = {r["source"]: r for r in q_distinct_ngrams(spark, SF).collect()}
    for source in got:
        r = got[source]
        assert r["n_tokens"] == uni_tok[source]
        assert r["n_types"] == len(uni_types[source])
        assert r["n_bigrams"] == bi_tok[source]
        assert r["n_bigram_types"] == len(bi_types[source])
        assert r["distinct1"] == _r6(
            len(uni_types[source]) / uni_tok[source]
        )
        assert r["distinct2"] == _r6(len(bi_types[source]) / bi_tok[source])


def test_unigram_kl_nonnegative_and_replay(spark, docs):
    from airflow_baseball_spark.queries_round8 import q_unigram_kl

    sw = Counter()
    for _doc, source, text in docs:
        for w in _toks(text):
            sw[(source, w)] += 1
    s_tot = Counter()
    cw = Counter()
    for (source, w), n in sw.items():
        s_tot[source] += n
        cw[w] += n
    n_c = sum(cw.values())
    v = len(cw)
    kl_micro = Counter()
    n_terms = Counter()
    for (source, w), n in sw.items():
        p = n / s_tot[source]
        q = (cw[w] + 1.0) / (n_c + v)
        kl_micro[source] += math.floor(
            p * (math.log(p) - math.log(q)) * 1e6 + 0.5
        )
        n_terms[source] += 1
    got = {r["source"]: r for r in q_unigram_kl(spark, SF).collect()}
    assert set(got) == set(s_tot)
    for source, r in got.items():
        assert r["n_tokens"] == s_tot[source]
        assert r["n_terms"] == n_terms[source]
        assert r["kl_micro"] == kl_micro[source]
        # smoothing makes q sub-stochastic, so KL stays ≥ ~0 up to the
        # micro-nat quantization of each term
        assert r["kl_micro"] >= -r["n_terms"]


def test_shingle_containment_detects_planted_subset(spark, tmp_path):
    """Semantic check on a planted corpus: doc B contains doc A's full
    text (plus a long unique suffix) — containment(A→B) must be 1.0
    and the pair must be reported; two unrelated docs must not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    a_words = [f"alpha{i}" for i in range(40)]
    b_words = a_words + [f"beta{i}" for i in range(200)]
    c_words = [f"gamma{i}" for i in range(200)]
    rows = {
        "doc_id": [1, 2, 3],
        "text": [" ".join(a_words), " ".join(b_words), " ".join(c_words)],
        "lang": ["en"] * 3,
        "source": ["s"] * 3,
        "n_chars": [len(" ".join(w)) for w in (a_words, b_words, c_words)],
    }
    d = tmp_path / "sf_planted"
    d.mkdir()
    pq.write_table(pa.table(rows), d / "documents.parquet")

    from airflow_baseball_spark.queries_round8 import q_shingle_containment

    row = q_shingle_containment(spark, str(d)).collect()[0]
    # A→B fully contained (containment 1.0 ≥ 0.8); B→A is only
    # 36/235 ≈ 0.15 and C matches nothing — exactly one pair reported
    assert row["n_pairs"] == 1
    assert row["sum_containment_micro"] == 1_000_000


def test_krippendorff_alpha_replay(spark):
    from airflow_baseball_spark.queries_round8 import q_krippendorff_alpha

    orders = sorted(
        (
            (r["o_custkey"], r["o_orderdate"], r["o_orderkey"], r["o_orderpriority"])
            for r in load_table(spark, SF, "orders")
            .select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
            .collect()
        ),
        key=lambda t: (t[0], t[1], t[2]),
    )
    by_cust = defaultdict(list)
    for ck, _d, _k, prio in orders:
        by_cust[ck].append(prio)
    o = Counter()
    for prios in by_cust.values():
        if len(prios) < 2:
            continue
        c1, c2 = prios[0], prios[-1]
        o[(c1, c2)] += 1
        o[(c2, c1)] += 1
    n_v = Counter()
    for (v, _k2), n in o.items():
        n_v[v] += n
    n_tot = sum(n_v.values())
    sum_n2 = sum(n * n for n in n_v.values())
    d_obs = sum(n for (v, k), n in o.items() if v != k)
    alpha = _r6(1 - d_obs * (n_tot - 1) / (n_tot * n_tot - sum_n2))
    row = q_krippendorff_alpha(spark, SF).collect()[0]
    assert row["d_obs"] == d_obs
    assert row["n_tot"] == n_tot
    assert row["sum_n2"] == sum_n2
    assert row["alpha"] == alpha


def _order_ratings(spark):
    orders = sorted(
        (
            (r["o_custkey"], r["o_orderdate"], r["o_orderkey"], r["o_orderpriority"])
            for r in load_table(spark, SF, "orders")
            .select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
            .collect()
        ),
        key=lambda t: (t[0], t[1], t[2]),
    )
    by_cust = defaultdict(list)
    for ck, _d, _k, prio in orders:
        by_cust[ck].append(prio)
    return by_cust


def test_fleiss_kappa_replay(spark):
    from airflow_baseball_spark.queries_round8 import q_fleiss_kappa

    m = 3
    nij = Counter()
    units = set()
    for ck, prios in _order_ratings(spark).items():
        n = len(prios)
        if n < m:
            continue
        units.add(ck)
        mid = prios[(n + 1) // 2 - 1]  # 1-based ⌈n/2⌉-th, 0-based index
        for c in (prios[0], mid, prios[-1]):
            nij[(ck, c)] += 1
    n_units = len(units)
    s2 = sum(v * v for v in nij.values())
    tj = Counter()
    for (_ck, c), v in nij.items():
        tj[c] += v
    sum_t2 = sum(v * v for v in tj.values())
    t_tot = sum(tj.values())
    p_bar = (s2 - n_units * m) / (n_units * m * (m - 1))
    p_e = sum_t2 / ((n_units * m) * (n_units * m))
    kappa = _r6((p_bar - p_e) / (1 - p_e))
    row = q_fleiss_kappa(spark, SF).collect()[0]
    assert row["n_units"] == n_units
    assert row["s2"] == s2
    assert row["sum_t2"] == sum_t2
    assert row["t_tot"] == t_tot == n_units * m
    assert row["kappa"] == kappa


def test_gwet_ac1_replay(spark):
    from airflow_baseball_spark.queries_round8 import q_gwet_ac1

    n_units = n_agree = 0
    pooled = Counter()
    for _ck, prios in _order_ratings(spark).items():
        if len(prios) < 2:
            continue
        c1, c2 = prios[0], prios[-1]
        n_units += 1
        n_agree += c1 == c2
        pooled[c1] += 1
        pooled[c2] += 1
    k = len(pooled)
    sum_r2 = sum(v * v for v in pooled.values())
    p_a = n_agree / n_units
    p_e = (1 - sum_r2 / (4 * n_units * n_units)) / (k - 1)
    ac1 = _r6((p_a - p_e) / (1 - p_e))
    row = q_gwet_ac1(spark, SF).collect()[0]
    assert row["n_units"] == n_units
    assert row["n_agree"] == n_agree
    assert row["k_classes"] == k
    assert row["sum_r2"] == sum_r2
    assert row["ac1"] == ac1
