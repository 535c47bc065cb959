"""Batch sessionization — gap-and-islands via window functions.

The batch twin of ``streaming.jobs.sessionize_stream``: identical
session semantics (gap > N minutes opens a new session), expressed as
two windows (lag → break flag → running sum) so Catalyst keeps it to a
single shuffle on ``user_col``. At 100 TB the facts would be
pre-bucketed by user so even that shuffle disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 30,
) -> DataFrame:
    """One row per (user, session): start/end, event count, value sum."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(ts_col).over(w)
    brk = F.when(
        prev.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev) > gap_us),
        1,
    ).otherwise(0)
    sess = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.select(user_col, ts_col, value_col)
        .withColumn("sess", sess)
        .groupBy(user_col, "sess")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            # quantize-before-sum (house exactness rule): integer-cent
            # accumulation is order- and engine-proof, where a float
            # SUM rounds differently under DuckDB's segment-tree
            # windowed aggregation vs Spark's sequential add
            (
                F.sum(
                    F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
                ).cast("double")
                / 100.0
            ).alias("total_value"),
        )
        .drop("sess")
    )
