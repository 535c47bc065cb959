"""Regression tests for the round-2 advisor findings: salted_agg with
an agg input that is also a grouping key, stopword_count over derived
column expressions, n-gram size guards on short docs, the bounded
driver-collect contract, and the crash-safe upsert path swap."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from airflow_baseball_spark.operators.salt import salted_agg
from airflow_baseball_spark.operators.upsert import _swap_paths
from airflow_baseball_spark.text import analysis, dedup, similarity


def test_salted_agg_key_is_also_agg_input(spark):
    """Aggregating a column that is also a grouping key must not raise
    an ambiguous-reference error (the projection used to duplicate it)."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, v int"
    )
    out = salted_agg(
        df,
        ["k"],
        {"n_k": ("k", "count"), "sum_v": ("v", "sum")},
        salt_col="v",
        n_salts=4,
    ).orderBy("k")
    rows = [tuple(r) for r in out.collect()]
    assert rows == [("a", 2, 3), ("b", 1, 3)]


def test_stopword_count_accepts_derived_expression(spark):
    """stopword_count must work on ANY column expression, not only a
    bare named column (the old F.expr round-trip broke on derived
    columns)."""
    df = spark.createDataFrame([("THE Cat And THE Hat",)], "text string")
    n = df.select(
        analysis.stopword_count(F.lower(F.col("text"))).alias("n")
    ).collect()[0]["n"]
    assert n == 3  # the, and, the


def test_ngram_decontam_short_docs_share_nothing(spark):
    """Docs shorter than n tokens emit no (truncated) n-grams, so two
    identical 2-word docs cannot 'share an 8-gram'."""
    docs = spark.createDataFrame(
        [(1, "hello world"), (50, "hello world")], "doc_id long, text string"
    )
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    assert dedup.ngram_decontam(corpus, bench, n=8).count() == 0


def test_gopher_one_token_doc_has_no_bigram(spark):
    out = analysis.gopher_repetition(
        spark.createDataFrame([(1, "word")], "doc_id long, text string")
    ).collect()[0]
    assert out["top_bigram_share"] == 0.0
    assert bool(out["keep"]) is True


def test_ngram_jaccard_short_docs_make_no_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "a b", "s"), (2, "a b", "s")], "doc_id long, text string, source string"
    )
    assert dedup.ngram_jaccard_pairs(docs, block_col="source", n=3).count() == 0


def test_collect_matrix_refuses_unbounded(spark):
    """The driver-side matrix collect is capped: a corpus-derived query
    set that grows past the bound fails fast instead of OOMing the
    driver at scale."""
    big = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="refusing to collect"):
        similarity._collect_matrix(big, "vec_id", "embedding", max_rows=5)
    ids, mat = similarity._collect_matrix(big, "vec_id", "embedding", max_rows=10)
    assert len(ids) == 10 and mat.shape == (10, 2)


def test_swap_paths_preserves_target_on_missing_staging(spark):
    """If the staging rename fails, the original target must survive
    (backup-first swap; delete-then-rename would have destroyed it)."""
    base = tempfile.mkdtemp(prefix="swap_")
    dst = os.path.join(base, "target")
    spark.range(5).write.parquet(dst)
    with pytest.raises(OSError, match="could not rename staging"):
        _swap_paths(spark, os.path.join(base, "missing_staging"), dst)
    # target restored from backup and still readable
    assert spark.read.parquet(dst).count() == 5
    assert not os.path.exists(dst + "__backup")


def test_swap_paths_swaps(spark):
    base = tempfile.mkdtemp(prefix="swap_ok_")
    dst = os.path.join(base, "target")
    stg = os.path.join(base, "staging")
    spark.range(5).write.parquet(dst)
    spark.range(9).write.parquet(stg)
    _swap_paths(spark, stg, dst)
    assert spark.read.parquet(dst).count() == 9
    assert not os.path.exists(stg)
    assert not os.path.exists(dst + "__backup")
