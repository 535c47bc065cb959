"""Small-files compaction — rewrite a parquet table into
evenly-sized files.

Incremental pipelines (per-day upserts, streaming sinks, partitioned
fan-out) accrete small files until listing and task-scheduling
overhead dominates scans; periodic compaction is table maintenance
every production lake runs (Delta OPTIMIZE / Iceberg rewrite_data_
files do the same thing). Here: size the target file count from the
actual on-disk bytes, rewrite through a staging path, and swap
atomically (crash-safe — reuses the upsert swap, which keeps a
backup until the rename lands).
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

from airflow_baseball_spark.operators.upsert import _swap_paths


def _tree_bytes(spark: SparkSession, path: str) -> int:
    jvm = spark._jvm  # noqa: SLF001
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    return fs.getContentSummary(p).getLength()


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite the parquet table at ``path`` into
    ``ceil(bytes / target_file_bytes)`` files (at least 1); returns
    the file count written. 128 MiB default matches the usual HDFS/
    object-store sweet spot (one scan task per file, big enough to
    amortize footers). Round-robin repartition gives even sizes
    regardless of key skew; use a key-ordered rewrite instead when
    scan locality on a column matters more than balance."""
    n_files = max(1, math.ceil(_tree_bytes(spark, path) / target_file_bytes))
    df = spark.read.parquet(path).repartition(n_files)
    staging = path.rstrip("/") + "__compacting"
    df.write.mode("overwrite").parquet(staging)
    _swap_paths(spark, staging, path)
    return n_files
