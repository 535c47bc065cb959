"""Relational-breadth tests: approx-distinct accuracy bound and as-of
join golden edge cases (equal timestamps, missing right partner, NULL
fields inside the matched right row)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from airflow_baseball_spark.operators.asof import asof_join
from airflow_baseball_spark.schemas import load_table

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_rsd(spark):
    li = load_table(spark, SF, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    approx = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", rsd=0.02).alias("n"))
        .collect()
    }
    for k, n_exact in exact.items():
        assert abs(approx[k] - n_exact) <= 0.1 * n_exact, (k, approx[k], n_exact)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_golden(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),  # matches r2 (equal ts)
            (1, _ts("2024-01-01T09:00:00"), "b"),  # matches r1
            (1, _ts("2024-01-01T07:00:00"), "c"),  # before all right rows
            (2, _ts("2024-01-01T12:00:00"), "d"),  # key with no right rows
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T08:00:00"), 100, None),  # r1: NULL field
            (1, _ts("2024-01-01T10:00:00"), 200, "ok"),  # r2
        ],
        "user_id long, ts timestamp, code long, note string",
    )
    out = {
        r["tag"]: (r["code_asof"], r["note_asof"])
        for r in asof_join(left, right, on=["user_id"]).collect()
    }
    assert out["a"] == (200, "ok")  # equal ts matches
    # NULL note must come from r1 itself, not be back-filled from r2
    assert out["b"] == (100, None)
    assert out["c"] == (None, None)
    assert out["d"] == (None, None)


def test_asof_join_row_count_preserved(spark):
    ev = load_table(spark, SF, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    e = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "value")
    assert asof_join(p, e, on=["user_id"]).count() == p.count()


def test_connected_components_golden(spark):
    """Two chains and a singleton: {1-2-3-4}, {10-11}, node 20 isolated
    (only in df, no edges). Roots are component minima."""
    from airflow_baseball_spark.operators.connected_components import (
        connected_components,
        dedup_clusters,
    )

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["root"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 20]], ["doc_id"])
    clustered = {
        r["doc_id"]: r["cluster_root"] for r in dedup_clusters(docs, edges).collect()
    }
    assert clustered == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_fs_linkage_score_patterns(spark):
    from airflow_baseball_spark.queries_relational import (
        _FS_W,
        q_fs_linkage_score,
    )

    rows = q_fs_linkage_score(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        # score is pattern-determined: recompute from the weights
        expect = sum(
            _FS_W[f][0] if getattr(r, f) == 1 else _FS_W[f][1]
            for f in ("name_exact", "nation_agree", "segment_agree")
        )
        assert r.score_micronats == expect
        if r.score_micronats >= 2_000_000:
            assert r.decision == "match"
        elif r.score_micronats >= 0:
            assert r.decision == "possible"
        else:
            assert r.decision == "non_match"
        assert r.n_pairs >= 1
    # agreement weights must be positive, disagreement negative
    for wa, wd in _FS_W.values():
        assert wa > 0 > wd
