"""Physical-plan assertions for the round-6 operators: the sketch
register build must combine map-side, anchors/dimensions must
broadcast, the salted wedge join and the degree-oriented triangle
join must be real equi-joins (no cartesian), and the funnel must not
materialize more than its two user-keyed shuffles."""

from __future__ import annotations

from tests.oracle_harness import plan_str as _plan

SF = "/root/testdata/sf0.001"


def test_hll_register_agg_is_partial(spark):
    """The scale claim: registers reduce map-side. The plan must show
    partial+final HashAggregate pairs (no single-pass object agg) and
    no Python stage at all."""
    from airflow_baseball_spark.queries_sketch import q_hll_distinct

    plan = _plan(q_hll_distinct(spark, SF))
    assert plan.count("HashAggregate") >= 4  # partial+final x (regs, exact)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_kmv_bottom_k_is_take_ordered(spark):
    """orderBy().limit(k) must compile to TakeOrderedAndProject —
    per-partition top-k then a k-row merge, never a global sort."""
    from airflow_baseball_spark.queries_sketch import q_kmv_distinct

    plan = _plan(q_kmv_distinct(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_embedding_outliers_broadcasts_anchors_and_stats(spark):
    """Both small sides (8 anchors, 8 cluster-stat rows) must
    broadcast; the vector table is scanned, never shuffled for a
    sort-merge join."""
    from airflow_baseball_spark.queries_sketch import q_embedding_outliers

    plan = _plan(q_embedding_outliers(spark, SF))
    assert plan.count("BroadcastExchange") >= 2
    assert "SortMergeJoin" not in plan


def test_triangle_enumeration_has_no_cartesian(spark):
    """The oriented wedge self-join and the closing probe are both
    equi-joins; orientation must not smuggle in a nested-loop join."""
    from airflow_baseball_spark.queries_mining import q_triangle_count

    plan = _plan(q_triangle_count(spark, SF))
    assert "CartesianProduct" not in plan
    # the wedge self-join and closing probe are equi-joins (hash or
    # sort-merge, whichever stats pick); the only nested-loop joins
    # are the intended 1-row scalar crossJoins
    assert ("HashJoin" in plan) or ("SortMergeJoin" in plan)


def test_node_jaccard_salted_join_is_equi(spark):
    """The salted wedge join must key on (c, salt) — a hash join —
    and the salt explode must appear as a Generate, not a join."""
    from airflow_baseball_spark.queries_mining import q_node_jaccard

    plan = _plan(q_node_jaccard(spark, SF))
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan
    assert "Generate" in plan  # the 8-way salt replication


def test_sssp_round_is_hash_partitioned(spark):
    """Each relax round is a join + min-regroup on the node id; the
    final plan must be hash-join + hash-aggregate over the
    checkpointed previous round (lineage truncated, so exactly one
    round's operators appear above the checkpoint scan)."""
    from airflow_baseball_spark.queries_mining import q_sssp_bounded

    plan = _plan(q_sssp_bounded(spark, SF))
    assert "CartesianProduct" not in plan
    # lineage truncation: the visible plan is one round deep, reading
    # the prior round's checkpoint, not a 6-round join tower
    assert plan.count("HashAggregate") <= 6


def test_ordered_funnel_no_python_and_no_cartesian(spark):
    from airflow_baseball_spark.queries_sketch import q_ordered_funnel

    plan = _plan(q_ordered_funnel(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_zone_map_prune_single_scan_per_layout(spark):
    """Each layout is groupBy(block) + one summary agg over the block
    table — pure aggregates, no join, no window over the fact."""
    from airflow_baseball_spark.queries_sketch import q_zone_map_prune

    plan = _plan(q_zone_map_prune(spark, SF))
    assert "Join" not in plan.replace("Adaptive", "")
    assert "Window" not in plan


def test_media_neardup_joins_are_equi_and_hot_cap_broadcasts(spark):
    """Candidate pairing must be a digest-equality join (never
    all-pairs) and the hot-digest exclusion a broadcast anti-join."""
    from airflow_baseball_spark.queries_multimodal import q_media_neardup

    plan = _plan(q_media_neardup(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_rrf_topk_lists_are_take_ordered(spark):
    """Each retrieval list is orderBy().limit(100) — must compile to
    TakeOrderedAndProject, never a global Sort over the corpus."""
    from airflow_baseball_spark.queries_stats import q_rrf_fusion

    plan = _plan(q_rrf_fusion(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_ivf_sweep_centroids_broadcast_no_python(spark):
    """The 8-centroid dim and the probe join must broadcast; the
    whole sweep is JVM-side column expressions (no Arrow stage)."""
    from airflow_baseball_spark.queries_text import q_ivf_nprobe_sweep

    plan = _plan(q_ivf_nprobe_sweep(spark, SF))
    assert plan.count("BroadcastExchange") >= 2
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


def test_periodogram_trig_table_broadcasts(spark):
    """The 128-row trig dim joins broadcast; the daily rollup is the
    only aggregation shuffle."""
    from airflow_baseball_spark.queries_timeseries import (
        q_periodogram_probe,
    )

    plan = _plan(q_periodogram_probe(spark, SF))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_holt_shuffle_is_single_key_exchange(spark):
    """applyInPandas must be fed by one nation-keyed exchange over the
    combinable daily rollup — FlatMapGroupsInPandas appears exactly
    once and no extra wide shuffle follows it."""
    from airflow_baseball_spark.queries_timeseries import q_holt_linear

    plan = _plan(q_holt_linear(spark, SF))
    # formatted plans list each node twice (tree + details): one
    # logical FlatMapGroupsInPandas, no second Python stage
    assert 1 <= plan.count("FlatMapGroupsInPandas") <= 2


def test_markov_walk_is_jvm_only(spark):
    """The 8-step x 5-variant chain walk must be pure JVM column
    arithmetic — no Arrow/Python stage anywhere in the plan."""
    from airflow_baseball_spark.queries_llm import q_markov_attribution

    plan = _plan(q_markov_attribution(spark, SF))
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_rare_term_join_is_equi_on_token(spark):
    """The posting-list self-join must be a token-equality join; the
    df-cap keeps it bounded but must not degrade to nested-loop."""
    from airflow_baseball_spark.queries_text import (
        q_rare_term_cosine_pairs,
    )

    plan = _plan(q_rare_term_cosine_pairs(spark, SF))
    assert "CartesianProduct" not in plan


def test_decision_stump_single_fact_scan(spark):
    """The split search reads the customer table once and the orders
    table once (the EXISTS probe) — no per-threshold rescan: at most
    2 parquet scans in the plan."""
    from airflow_baseball_spark.queries_eval import q_decision_stump

    plan = _plan(q_decision_stump(spark, SF))
    assert plan.count("Scan parquet") <= 4  # tree+details => 2 scans


def test_page_hinkley_is_jvm_window_only(spark):
    """The PH recurrence is unrolled into window algebra — the plan
    must contain NO Python stage and share one nation-keyed exchange
    across the window passes."""
    from airflow_baseball_spark.queries_timeseries import q_page_hinkley

    plan = _plan(q_page_hinkley(spark, SF))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_seq_gap_patterns_single_user_shuffle_no_self_join(spark):
    """The window form must serve all three lead offsets from ONE
    user-keyed sort — no fact-table self-join (the oracle's rn-band
    join), no Python."""
    from airflow_baseball_spark.queries_mining import q_seq_gap_patterns

    plan = _plan(q_seq_gap_patterns(spark, SF))
    assert "EvalPython" not in plan
    assert "SortMergeJoin" not in plan
    # one Window node (appears twice: plan tree + detail section)
    assert plan.count("Window") == 2


def test_jackknife_totals_broadcast_back(spark):
    """total-minus-self: the one-row summary must broadcast to the
    per-group rows, never a sort-merge join on a scalar."""
    from airflow_baseball_spark.queries_stats import q_jackknife_ratio_se

    plan = _plan(q_jackknife_ratio_se(spark, SF))
    assert "BroadcastExchange" in plan
    assert "EvalPython" not in plan


def test_isotonic_fact_table_scanned_once(spark):
    """The B³ interval algebra must run on the 20-row bin table; the
    events fact table contributes exactly one scan."""
    from airflow_baseball_spark.queries_eval import q_isotonic_calibration

    plan = _plan(q_isotonic_calibration(spark, SF))
    # the fact-table rollup ran once at checkpoint time; every pref
    # reference reads the materialized 20-row frame, so the final plan
    # contains no parquet scan of the fact table at all
    assert "events.parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "EvalPython" not in plan


def test_ransac_sample_and_eps_broadcast(spark):
    """Both dimension frames (33 trial samples, 1-row ε) must
    broadcast into the inlier count; the day table is never
    sort-merge joined."""
    from airflow_baseball_spark.queries_timeseries import q_ransac_trend

    plan = _plan(q_ransac_trend(spark, SF))
    assert plan.count("BroadcastExchange") >= 2
    assert "SortMergeJoin" not in plan


def test_jl_projection_materialized_once(spark):
    """The projected table is referenced by BOTH pair sides; it must
    be materialized once (localCheckpoint), so the final plan contains
    NO duplicated MapInPandas stage and the pair join is an equi-join."""
    from airflow_baseball_spark.queries_text import q_jl_distortion

    plan = _plan(q_jl_distortion(spark, SF))
    assert "MapInPandas" not in plan  # ran once, upstream of the plan
    assert "CartesianProduct" not in plan
