"""Physical-plan assertions for the late round-5 operators: the
scale-critical shapes (no unbounded theta joins, map-side combine,
broadcast-only-small) must survive Catalyst, not just be intended."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle_harness import plan_str as _plan

SF = "/root/testdata/sf0.001"


def test_interval_overlap_join_is_equi_join(spark):
    """The overlap join's whole point: day-bucket explode turns the
    interval theta join into a shuffled/broadcast HASH join."""
    from airflow_baseball_spark.queries_relational2 import (
        q_interval_overlap_join,
    )

    plan = _plan(q_interval_overlap_join(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan or "BuildRight, Cross" not in plan
    assert "HashJoin" in plan  # the session-days x hot-days equi-join


def test_sliding_distinct_has_no_distinct_on_exploded(spark):
    """Distinctness comes from interval merging BEFORE the explode —
    the exploded table must go straight into a count aggregate, and
    the only distinct runs on the (user, day) pre-merge table."""
    from airflow_baseball_spark.queries_timeseries import (
        q_sliding_distinct_users,
    )

    plan = _plan(q_sliding_distinct_users(spark, SF))
    assert "Generate" in plan  # the sequence() explode
    # partial count aggregation after the explode (map-side combine)
    assert plan.count("HashAggregate") >= 2


def test_bigram_lm_no_unbounded_join(spark):
    """The pair-LM join must be a hash join on the pair key (at tiny
    SF Catalyst rightly broadcasts it — the stats-driven choice; at
    corpus scale the same plan shuffles). The only nested-loop join
    allowed is the 1-row vocab-scalar crossJoin."""
    from airflow_baseball_spark.queries_text import q_bigram_lm

    plan = _plan(q_bigram_lm(spark, SF))
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan  # pair-key join is a real equi-join


def test_auc_window_runs_on_aggregated_table(spark):
    """The value-ordered window must sit ABOVE the distinct-value
    aggregate, so the single-partition sort is price-granularity-
    bounded, not event-bounded."""
    from airflow_baseball_spark.queries_eval import q_auc_roc

    plan = _plan(q_auc_roc(spark, SF))
    win_pos = plan.find("Window")
    assert win_pos != -1
    # the tree prints parents before children: an aggregate BELOW the
    # window (its input) must appear after it in the text
    assert "HashAggregate" in plan[win_pos:]


def test_mixture_weights_single_fact_scan(spark):
    """Weights + quotas come from windows over the per-source
    aggregate: documents is scanned exactly once."""
    from airflow_baseball_spark.queries_llm import q_mixture_weights

    plan = _plan(q_mixture_weights(spark, SF))
    assert plan.count("documents.parquet") <= 1 or (
        plan.count("Scan parquet") <= 1
    )


def test_dbscan_fact_contributes_one_groupby(spark):
    """The embeddings fact feeds ONE cell-count aggregate; the CC
    iteration must run on checkpointed cell tables, not re-derive
    the fact scan per round."""
    from airflow_baseball_spark.queries_mining import q_dbscan_grid

    df = q_dbscan_grid(spark, SF)
    plan = _plan(df)
    # localCheckpoint truncates lineage: the embeddings scan appears
    # at most twice (dense build; CC inputs are checkpointed RDDs)
    assert plan.count("embeddings.parquet") <= 2


def test_dynamic_partition_pruning_fires(spark):
    """Joining a partition-column key against a filtered dim must
    plant a dynamicpruning expression in the fact scan's partition
    filters — the mechanism that keeps a 100 TB partitioned fact from
    being fully scanned for a one-partition dim filter."""
    import tempfile

    from airflow_baseball_spark.schemas import load_table

    out = tempfile.mkdtemp(prefix="dpp_")
    load_table(spark, SF, "orders").write.partitionBy(
        "o_orderstatus"
    ).mode("overwrite").parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("F", 1), ("O", 2), ("P", 3)], "status string, rank int"
    ).filter(F.col("rank") == 1)
    j = fact.join(dim, fact["o_orderstatus"] == dim["status"]).groupBy(
        "status"
    ).count()
    plan = _plan(j)
    assert "dynamicpruning" in plan.lower()
