"""Slowly-changing-dimension (type 2) build from an event/snapshot
log — change detection + validity intervals, pure window functions.

The reference keeps only latest-state tables (every upsert overwrites:
``dags/utils/queries.py`` ON DUPLICATE KEY UPDATE); an analytics
engine at scale also needs the *history* those upserts destroy. SCD2
reconstructs it from the raw log: one row per (key, attribute-run)
with half-open ``valid_from``/``valid_to`` intervals.

Scale: two window passes partitioned by the natural key — the single
shuffle is on ``key``, and each partition is one entity's (small)
history, so 100 TB of events with millions of keys parallelizes
evenly; no driver state, no iteration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2(
    df: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Collapse consecutive equal values of ``attr`` per ``key``
    (ordered by ``ts, tiebreak``) into versioned validity rows:

    ``(key, attr, valid_from, valid_to, version_n)``

    ``valid_to`` is NULL for the current (open) version. Ordering must
    be total — pass a unique ``tiebreak`` column (e.g. the event id)
    so runs are deterministic under equal timestamps."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changed: Column = (
        F.lag(attr).over(w).isNull() | (F.lag(attr).over(w) != F.col(attr))
    )
    starts = (
        df.select(key, attr, ts, tiebreak)
        .withColumn("__chg", changed)
        .filter("__chg")
        .select(
            key,
            attr,
            F.col(ts).alias("valid_from"),
            F.row_number()
            .over(Window.partitionBy(key).orderBy(ts, tiebreak))
            .alias("version_n"),
        )
    )
    w2 = Window.partitionBy(key).orderBy("version_n")
    return starts.select(
        key,
        attr,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "version_n",
    )
