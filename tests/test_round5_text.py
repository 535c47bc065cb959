"""Invariant tests for the round-5 text additions (queries_text):
repetition profile and n-gram novelty."""

from __future__ import annotations

import re

from airflow_baseball_spark.queries_text import (
    q_ngram_novelty,
    q_repetition_profile,
)

SF = "/root/testdata/sf0.001"

from tests.oracle_harness import plan_str as _plan  # noqa: E402


def test_repetition_in_row_no_shuffle(spark):
    plan = _plan(q_repetition_profile(spark, SF))
    # pure per-row array arithmetic: no exchange of any kind
    assert "Exchange" not in plan, plan


def test_repetition_bounds(spark):
    rows = q_repetition_profile(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_token_frac < 1.0 + 1e-9
        assert 0.0 <= r.dup_bigram_frac < 1.0 + 1e-9
        # a doc can't have more distinct bigram overlap than token overlap
        # (strict inequality does not hold in general; bounds only)
        assert r.n_tokens >= 2


def test_novelty_two_shuffles_and_bounds(spark):
    df = q_ngram_novelty(spark, SF)
    plan = _plan(df)
    # gram-df count + per-doc rollup: the gram explode shuffles on the
    # md5 key, the rollup on doc_id; the df table joins back on gram.
    # No cartesian, no broadcast of the corpus.
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_novel <= r.n_grams
        assert 0.0 <= r.novelty <= 1.0 + 1e-9


def test_novelty_unique_doc_ids(spark):
    rows = q_ngram_novelty(spark, SF).collect()
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))


def test_dup_rate_bounds(spark):
    from airflow_baseball_spark.queries_text import q_dup_rate_by_source

    rows = q_dup_rate_by_source(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_suspect <= r.n_docs
        assert 0.0 <= r.suspect_rate <= 1.0 + 1e-9
    # the 5-gram grain actually fires on this corpus (the exact-digest
    # version was vacuously zero everywhere)
    assert any(r.n_suspect > 0 for r in rows)


def test_source_overlap_nonvacuous_and_canonical(spark):
    from airflow_baseball_spark.queries_text import q_source_overlap

    rows = q_source_overlap(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.source_a < r.source_b
        assert r.shared_digests >= 1


def test_funnel_monotone(spark):
    from airflow_baseball_spark.queries_text import q_data_prep_funnel

    rows = {r.stage: r for r in q_data_prep_funnel(spark, SF).collect()}
    assert set(rows) == {"0_raw", "1_quality", "2_dedup", "3_decontam"}
    # each stage can only remove documents
    assert (
        rows["0_raw"].n_docs
        >= rows["1_quality"].n_docs
        >= rows["2_dedup"].n_docs
        >= rows["3_decontam"].n_docs
    )
    assert rows["0_raw"].retained_frac == 1.0
    assert rows["3_decontam"].n_docs > 0  # pipeline keeps something


def test_standard_scaler_population_stats(spark):
    from airflow_baseball_spark.queries_llm import q_standard_scaler

    rows = q_standard_scaler(spark, SF).collect()
    assert rows
    # z-scores of a 2-decimal bounded measure stay in a sane band
    for r in rows:
        assert abs(r.z_l_quantity) < 10
        assert abs(r.z_l_discount) < 10


def test_pca_power_unit_norm_and_dominance(spark):
    import math

    from airflow_baseball_spark.queries_text import q_pca_power

    rows = q_pca_power(spark, SF).collect()
    assert len(rows) == 64
    v = [r.loading for r in sorted(rows, key=lambda r: r.dim)]
    # quantized-normalized: ‖v‖ = 1 up to the 1e-6 grid
    assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-3


def test_bpe_rounds_monotone(spark):
    from airflow_baseball_spark.queries_text import q_bpe_merge_steps

    rows = sorted(q_bpe_merge_steps(spark, SF).collect(), key=lambda r: r.round)
    assert [r.round for r in rows] == [0, 1]
    for r in rows:
        assert len(r.merged_pair) == 2
        assert r.pair_count >= 1
    # merging the top pair can only reduce (or tie) the next round's max
    assert rows[1].pair_count <= rows[0].pair_count


def test_langid_confusion_rows_sum_to_one(spark):
    from airflow_baseball_spark.queries_text import q_langid_confusion

    rows = q_langid_confusion(spark, SF).collect()
    assert rows
    by_actual: dict[str, float] = {}
    for r in rows:
        by_actual[r.actual] = by_actual.get(r.actual, 0.0) + r.row_share
    for share in by_actual.values():
        assert abs(share - 1.0) < 1e-4


def test_embedding_norm_profile_order(spark):
    from airflow_baseball_spark.queries_text import q_embedding_norm_profile

    rows = q_embedding_norm_profile(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r.min_norm <= r.mean_norm <= r.max_norm


def test_ann_recall_eval_shape(spark):
    from airflow_baseball_spark.queries_text import q_ann_recall_eval

    rows = q_ann_recall_eval(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.qid % 125 == 0
        assert r.nn_id != r.qid
        assert -1.0 - 1e-6 <= r.nn_cos <= 1.0 + 1e-6
        assert r.n_candidates >= 0
        # found implies the NN is in a non-empty candidate set
        if r.nn_found:
            assert r.n_candidates >= 1


def test_dataset_card_consistency(spark):
    from airflow_baseball_spark.queries_text import q_dataset_card

    r = q_dataset_card(spark, SF).collect()[0]
    assert r.n_docs > 0 and r.n_sources > 0 and r.n_langs > 0
    assert r.total_tokens >= r.n_docs  # every doc has >= 1 token
    assert abs(r.mean_doc_tokens - r.total_tokens / r.n_docs) < 1e-3
