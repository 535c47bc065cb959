"""Partitioning helpers.

``spread`` exists because a *small* parquet file scans as ONE split, so
a compute-bound map stage (shingling, hashing, per-payload feature
extraction) would run on one core of 32. At 100 TB the scan itself
yields thousands of splits and ``spread`` is a no-op by construction
(``df.rdd.getNumPartitions() >= parallelism`` short-circuits) — it is
the local-scale affordance, not a crutch the plan depends on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition up to the cluster's default parallelism —
    only when the current partition count is lower (never shrinks, never
    shuffles data that is already spread)."""
    target = parallelism or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
