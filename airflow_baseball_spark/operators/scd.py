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


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Feature-store-style point-in-time (as-of) join against an SCD2
    dimension: each fact row picks the version whose half-open
    ``[valid_from, valid_to)`` interval contains ``fact_ts`` (open
    current version = NULL ``valid_to``). The leakage-free way to
    attach entity state to training labels — a plain latest-state join
    would leak future attribute values into past examples.

    Scale: one co-partitioned equi-join on ``key`` with the interval
    bound as a residual predicate — version counts per key are small
    (runs, not events), so the residual scan per matched key is cheap
    and the shuffle is the same one any keyed enrich pays. Intervals
    are disjoint per key, so each fact matches at most one version (no
    row multiplication)."""
    vcols = [c for c in dim.columns if c != key]
    d = dim.select(
        F.col(key).alias("__pit_key"),
        *[F.col(c).alias(f"__pit_{c}") for c in vcols],
    )
    vf, vt = f"__pit_{valid_from}", f"__pit_{valid_to}"
    joined = facts.join(
        d,
        (facts[key] == F.col("__pit_key"))
        & (F.col(vf) <= facts[fact_ts])
        & (F.col(vt).isNull() | (facts[fact_ts] < F.col(vt))),
    )
    out = [F.col(f"__pit_{c}").alias(c) for c in vcols if c not in (valid_from, valid_to)]
    return joined.select(*facts.columns, *out)
