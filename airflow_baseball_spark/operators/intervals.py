"""Interval-union (sweep line) as a relational operator.

The classic measure "how much total time do these possibly-overlapping
intervals cover, per key" without a self-join or an iterative merge:
sort intervals by start within the key, clamp each interval's start to
the running max end of every PRIOR interval, and sum the positive
remainders. Overlaps can never double-count because each point of the
timeline is claimed by exactly the first interval that reaches it.

One keyed window sort; everything else is exact integer arithmetic on
the interval endpoints, so results are independent of partitioning and
engine (driver-checked by queries_relational2.q_interval_union_time and
property-tested against a brute-force oracle in
tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_union(
    df: DataFrame,
    key: str,
    start: str,
    end: str,
    order_tiebreak: str,
) -> DataFrame:
    """Per-``key`` total covered length of [start, end) intervals.

    ``start``/``end`` must be integer-typed (epoch-µs by convention);
    ``order_tiebreak`` totals the sort order for rows with equal
    starts so the clamp is deterministic. Returns (key, covered,
    n_intervals)."""
    w = (
        Window.partitionBy(key)
        .orderBy(start, order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior_max_e: Column = F.max(end).over(w)
    # window exprs must materialize before the aggregate (Spark forbids
    # a window inside an aggregate function)
    contrib = df.withColumn(
        "__contrib",
        F.greatest(
            F.lit(0).cast("long"),
            F.col(end)
            - F.greatest(F.col(start), F.coalesce(prior_max_e, F.col(start))),
        ),
    )
    return contrib.groupBy(key).agg(
        F.sum("__contrib").alias("covered"),
        F.count("*").alias("n_intervals"),
    )
