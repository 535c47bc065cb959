"""Pure-Python replay tests for the round-8g operators (house
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


def test_stupid_backoff_score_replay(spark, doc_tokens):
    from airflow_baseball_spark.queries_round8g import q_stupid_backoff_score

    uni = Counter()
    bi = Counter()
    for _, _, toks in doc_tokens:
        for w in toks:
            uni[_md5(w)] += 1
        for a, b in zip(toks, toks[1:]):
            bi[(_md5(a), _md5(b))] += 1
    n_tokens = sum(uni.values())
    agg = defaultdict(lambda: [0, 0, 0])  # n_trans, n_backoff, nll_micro
    for _, src, toks in doc_tokens:
        for a, b in zip(toks, toks[1:]):
            ka, kb = _md5(a), _md5(b)
            if (ka, kb) in bi:
                lp = math.log(bi[(ka, kb)] / uni[ka])
                backed = 0
            else:  # pragma: no cover — self-scoring never backs off
                lp = math.log(0.4 * uni[kb] / n_tokens)
                backed = 1
            rec = agg[src]
            rec[0] += 1
            rec[1] += backed
            rec[2] += _micro(-lp)
    got = {
        r["source"]: (
            r["n_transitions"],
            r["n_backoff"],
            r["nll_micro"],
            r["backoff_rate"],
            r["mean_nll"],
            r["perplexity"],
        )
        for r in q_stupid_backoff_score(spark, SF).collect()
    }
    assert set(got) == set(agg)
    for src, (nt, nb, nll) in agg.items():
        g = got[src]
        assert g[0:3] == (nt, nb, nll)
        assert g[3] == pytest.approx(_r6(nb / nt), abs=2e-6)
        mean_nll = nll / nt / 1e6
        assert g[4] == pytest.approx(_r6(mean_nll), abs=2e-6)
        assert g[5] == pytest.approx(_r6(math.exp(mean_nll)), rel=2e-5)


def test_stupid_backoff_heldout_branch():
    """The backoff branch (unattested bigram -> 0.4 * unigram / N)
    never fires when a corpus scores itself; exercise it on a held-out
    transition the way the scorer would: the formula must produce the
    documented score."""
    uni = {"a": 3, "b": 2, "c": 1}
    n = 6
    # bigram table from training text "a b a b a c": (a,b):2 (b,a):2 (a,c):1
    bi = {("a", "b"): 2, ("b", "a"): 2, ("a", "c"): 1}
    # held-out transition (c, b) is unattested -> backoff
    assert ("c", "b") not in bi
    lp = math.log(0.4 * uni["b"] / n)
    assert lp == pytest.approx(math.log(0.4 * 2 / 6))


def test_lsh_band_profile_replay(spark):
    from airflow_baseball_spark.queries_round8g import q_lsh_band_profile
    from airflow_baseball_spark.queries_text import _corpus_sigs
    from airflow_baseball_spark.text import dedup

    sigs = _corpus_sigs(spark, SF).collect()
    rows_per_band = len(dedup._PERMS) // dedup.N_BANDS
    buckets = defaultdict(Counter)
    for r in sigs:
        vals = [r[f"sig_{i}"] for i in range(len(dedup._PERMS))]
        for b in range(dedup.N_BANDS):
            key = tuple(vals[b * rows_per_band : (b + 1) * rows_per_band])
            buckets[b][key] += 1
    got = {
        r["band_id"]: (
            r["n_docs"],
            r["n_buckets"],
            r["max_bucket"],
            r["n_singletons"],
            r["collision_rate"],
        )
        for r in q_lsh_band_profile(spark, SF).collect()
    }
    assert set(got) == set(range(dedup.N_BANDS))
    for b in range(dedup.N_BANDS):
        c = buckets[b]
        nd = sum(c.values())
        nb = len(c)
        mx = max(c.values())
        sing = sum(1 for v in c.values() if v == 1)
        assert got[b][0:4] == (nd, nb, mx, sing)
        assert got[b][4] == pytest.approx(_r6(1 - nb / nd), abs=2e-6)


def test_hapax_doc_coverage_replay(spark, doc_tokens):
    from airflow_baseball_spark.queries_round8g import q_hapax_doc_coverage

    counts = Counter()
    for _, _, toks in doc_tokens:
        for w in toks:
            counts[_md5(w)] += 1
    hapax = {k for k, c in counts.items() if c == 1}
    n_docs = Counter()
    with_hapax = Counter()
    for _, src, toks in doc_tokens:
        n_docs[src] += 1
        if any(_md5(w) in hapax for w in toks):
            with_hapax[src] += 1
    got = {
        r["source"]: (
            r["n_docs"],
            r["n_docs_with_hapax"],
            r["n_hapax"],
            r["coverage"],
        )
        for r in q_hapax_doc_coverage(spark, SF).collect()
    }
    assert set(got) == set(n_docs)
    for src in n_docs:
        g = got[src]
        assert g[0:3] == (n_docs[src], with_hapax[src], len(hapax))
        assert g[3] == pytest.approx(
            _r6(with_hapax[src] / n_docs[src]), abs=2e-6
        )
