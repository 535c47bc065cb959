"""Invariant tests for the round-6 batch-9 operators. The oracle diff
proves value equality; these guard the math invariants (kappa in
[-1, 1], conformal coverage ≥ its nominal level up to finite-sample
slack, RRF list discipline, near-dup symmetry/cap)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_media_neardup_pairs_canonical_and_capped(spark):
    from airflow_baseball_spark.queries_multimodal import q_media_neardup

    rows = q_media_neardup(spark, SF).collect()
    for r in rows:
        assert r.id_a < r.id_b
        assert r.n_shared >= 2
        assert 0 < r.overlap_micro <= 1000000


def test_rrf_fusion_topk_and_score_bounds(spark):
    from airflow_baseball_spark.queries_stats import _RRF_K, q_rrf_fusion

    rows = q_rrf_fusion(spark, SF).collect()
    assert 0 < len(rows) <= 20
    max_single = 1000000 // (_RRF_K + 1)
    scores = [r.rrf_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # at least one list contains the doc; score bounded by 3 lists
        assert r.rank_bm25 + r.rank_tf + r.rank_rec > 0
        assert 0 < r.rrf_micro <= 3 * max_single


def test_cohens_kappa_bounds(spark):
    from airflow_baseball_spark.queries_eval import q_cohens_kappa

    r = q_cohens_kappa(spark, SF).collect()[0]
    assert r.n_agree <= r.n_items
    assert -1000000 <= r.kappa_micro <= 1000000
    # kappa never exceeds raw agreement
    assert r.kappa_micro <= r.po_micro


def test_conformal_coverage_near_nominal(spark):
    from airflow_baseball_spark.queries_eval import q_conformal_interval

    rows = q_conformal_interval(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_calib > 0 and r.n_test > 0
        assert r.qhat_cents >= 0
        assert 0 <= r.n_covered <= r.n_test
        # split-conformal guarantee is on the calibration draw; allow
        # finite-sample slack below the 0.9 nominal on tiny groups
        assert r.coverage_micro >= 700000
