"""Bucketed tables — co-located joins without a per-query shuffle.

The 100 TB story: a fact table bucketed by its join key is written
once with a hash-partitioned layout (`bucketBy`); every later join or
aggregation on that key reads the buckets directly and skips the
exchange entirely — the single biggest win available for repeated
big-big joins (reference analog: `hitter_games` & friends keyed by
player id, SURVEY.md §4 "bucket facts by player id").

Both sides must agree on bucket count and key for the exchange-free
plan; `sortBy` additionally pre-sorts within buckets so the sort-merge
join skips its per-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a parquet table hash-bucketed on ``keys``."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    w = w.sortBy(*(sort_cols or keys))
    w.saveAsTable(table)


def ensure_temp_database(spark: SparkSession, name: str, location: str) -> None:
    """Catalog database rooted at ``location`` (keeps test/bench runs
    out of the default spark-warehouse in cwd)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name} LOCATION '{location}'")
