"""Partition-pruned upsert + compaction — table-maintenance
operators for incremental pipelines."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from airflow_baseball_spark.operators.compact import compact
from airflow_baseball_spark.operators.upsert import merge_upsert_partitioned


def test_partitioned_upsert_touches_only_affected_partitions(spark, tmp_path):
    tgt = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "d1", 10), (2, "d1", 20), (3, "d2", 30), (4, "d3", 40)],
        "k INT, d STRING, v INT",
    )
    base.write.partitionBy("d").parquet(tgt)
    untouched_files = sorted(glob.glob(f"{tgt}/d=d3/*.parquet"))
    mtimes = [os.path.getmtime(f) for f in untouched_files]

    updates = spark.createDataFrame(
        [(2, "d1", 99), (5, "d2", 50)], "k INT, d STRING, v INT"
    )
    parts = merge_upsert_partitioned(spark, updates, tgt, keys=["k"], partition_col="d")
    assert sorted(parts) == ["d1", "d2"]

    got = {r.k: (r.d, r.v) for r in spark.read.parquet(tgt).collect()}
    assert got == {
        1: ("d1", 10),
        2: ("d1", 99),  # updated
        3: ("d2", 30),
        4: ("d3", 40),  # untouched partition intact
        5: ("d2", 50),  # inserted
    }
    # d3's files were not rewritten (dynamic overwrite pruned it)
    assert untouched_files == sorted(glob.glob(f"{tgt}/d=d3/*.parquet"))
    assert mtimes == [os.path.getmtime(f) for f in untouched_files]


def test_partitioned_upsert_creates_missing_target(spark, tmp_path):
    tgt = str(tmp_path / "fresh")
    updates = spark.createDataFrame([(1, "d1", 5)], "k INT, d STRING, v INT")
    merge_upsert_partitioned(spark, updates, tgt, keys=["k"], partition_col="d")
    assert spark.read.parquet(tgt).count() == 1


def test_compact_reduces_file_count_preserves_data(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(path)
    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 40

    n = compact(spark, path)  # tiny table -> single 128 MiB bucket
    assert n == 1
    after = glob.glob(f"{path}/*.parquet")
    assert len(after) == 1
    out = spark.read.parquet(path)
    assert out.count() == 10_000
    assert out.agg(F.sum("v")).first()[0] == 2 * sum(range(10_000))
