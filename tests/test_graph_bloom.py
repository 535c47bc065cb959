"""Unit tests for the round-4c operators: PageRank power method and
the Bloom-filter pre-pruned semi-join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_baseball_spark.operators.bloom import bloom_positions, bloom_semi_join
from airflow_baseball_spark.operators.pagerank import pagerank


def test_pagerank_two_node_cycle_stays_uniform(spark):
    # a↔b is symmetric: the uniform vector is the fixed point, every
    # iteration must return exactly 0.5/0.5 (teleport + damped half).
    edges = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=4).collect()}
    assert got == pytest.approx({1: 0.5, 2: 0.5})


def test_pagerank_sink_absorbs_rank(spark):
    # star into node 9: after one round the sink holds teleport + the
    # damped mass of all three sources; sources hold teleport only.
    edges = spark.createDataFrame([(1, 9), (2, 9), (3, 9)], ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=1).collect()}
    teleport = 0.15 / 4
    assert got[1] == pytest.approx(teleport)
    assert got[9] == pytest.approx(teleport + 0.85 * 0.75)


def test_pagerank_leaky_mass_bounded(spark):
    # leaky variant: total mass never exceeds 1 and never drops below
    # the pure-teleport floor.
    edges = spark.createDataFrame(
        [(i, (i * 7) % 10) for i in range(10) if i != (i * 7) % 10], ["src", "dst"]
    )
    total = (
        pagerank(edges, iterations=5).agg(F.sum("rank").alias("s")).collect()[0]["s"]
    )
    assert 0.15 <= total <= 1.0 + 1e-9


def test_bloom_semi_join_equals_plain_semi(spark):
    big = spark.range(0, 2000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    small = spark.range(0, 2000, 13).select(F.col("id").alias("sk"))
    got = bloom_semi_join(big, small, "k", "sk").orderBy("k").collect()
    want = (
        big.join(small, big["k"] == small["sk"], "left_semi").orderBy("k").collect()
    )
    assert got == want


def test_bloom_false_positives_removed_under_forced_collisions(spark):
    # 8 bits for 50 keys: nearly every probe position is set, so the
    # sketch passes almost everything — the exact verify must still
    # reduce the result to the true matches.
    big = spark.range(0, 500).select(F.col("id").alias("k"))
    small = spark.range(0, 500, 10).select(F.col("id").alias("sk"))
    got = sorted(
        r["k"] for r in bloom_semi_join(big, small, "k", "sk", num_bits=8).collect()
    )
    assert got == list(range(0, 500, 10))


def test_bloom_positions_bounded_by_num_bits(spark):
    small = spark.range(0, 100000).select(F.col("id").alias("k"))
    n = bloom_positions(small, "k", num_bits=1024, num_hashes=3).count()
    assert n <= 1024


def test_bfs_chain_distances_and_early_stop(spark):
    from airflow_baseball_spark.operators.bfs import bfs_distances

    # 0→1→2→3 chain: distances are the chain positions; max_hops=6
    # stops early after the frontier empties at hop 4.
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["src", "dst"])
    srcs = spark.createDataFrame([(0,)], ["node"])
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, srcs).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_diamond_takes_min_distance(spark):
    from airflow_baseball_spark.operators.bfs import bfs_distances

    # 0→3 directly and 0→1→2→3: node 3 must report dist 1, not 3.
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (0, 3)], ["src", "dst"])
    srcs = spark.createDataFrame([(0,)], ["node"])
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, srcs).collect()}
    assert got[3] == 1


def test_bfs_respects_max_hops(spark):
    from airflow_baseball_spark.operators.bfs import bfs_distances

    edges = spark.createDataFrame([(i, i + 1) for i in range(10)], ["src", "dst"])
    srcs = spark.createDataFrame([(0,)], ["node"])
    got = bfs_distances(edges, srcs, max_hops=3)
    assert got.agg(F.max("dist")).collect()[0][0] == 3
    assert got.count() == 4


def test_fuzzy_join_finds_all_edit_types(spark):
    from airflow_baseball_spark.operators.fuzzy import fuzzy_self_join

    # substitution (abc/abd), deletion (abc/ab), insertion (abc/xabc),
    # and a far pair (abc/xyz) that must NOT match
    df = spark.createDataFrame(
        [(1, "abc"), (2, "abd"), (3, "ab"), (4, "xabc"), (5, "xyz")],
        ["id", "name"],
    )
    got = sorted(
        (r["id_a"], r["id_b"]) for r in fuzzy_self_join(df, "id", "name").collect()
    )
    assert (1, 2) in got and (1, 3) in got and (1, 4) in got
    assert all(5 not in pair for pair in got)


def test_fuzzy_join_no_duplicate_pairs(spark):
    from airflow_baseball_spark.operators.fuzzy import fuzzy_self_join

    # identical strings share every deletion key — the pair must still
    # appear exactly once
    df = spark.createDataFrame([(1, "same"), (2, "same")], ["id", "name"])
    rows = fuzzy_self_join(df, "id", "name").collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]


def test_table_checksum_pinpoints_a_changed_bucket(spark):
    from airflow_baseball_spark.operators.checksum import table_checksum

    base = spark.range(0, 1000).select(F.col("id"), (F.col("id") * 3).alias("v"))
    cols = [F.col("id").cast("string"), F.col("v").cast("string")]
    a = {r["bucket"]: (r["n_rows"], r["hash_sum"], r["hash_xor"])
         for r in table_checksum(base, cols).collect()}
    # mutate ONE row's value
    mutated = base.withColumn(
        "v", F.when(F.col("id") == 500, F.lit(-1)).otherwise(F.col("v"))
    )
    b = {r["bucket"]: (r["n_rows"], r["hash_sum"], r["hash_xor"])
         for r in table_checksum(mutated, cols).collect()}
    diff = {k for k in set(a) | set(b) if a.get(k) != b.get(k)}
    # exactly the bucket(s) holding the old/new row hash differ (1 or 2)
    assert 1 <= len(diff) <= 2
    same = set(a) - diff
    assert all(a[k] == b[k] for k in same)


def test_table_checksum_is_order_insensitive(spark):
    from airflow_baseball_spark.operators.checksum import table_checksum

    base = spark.range(0, 500).select(F.col("id").cast("string").alias("s"))
    shuffled = base.orderBy(F.md5("s")).repartition(7)
    a = sorted(table_checksum(base, [F.col("s")]).collect())
    b = sorted(table_checksum(shuffled, [F.col("s")]).collect())
    assert a == b
