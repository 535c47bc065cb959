"""Snapshot diff — change-data extraction between two versions of a
keyed table.

Incremental pipelines that only receive full snapshots (the
reference's daily scrapes re-land season-to-date totals every run)
need the *delta* to feed downstream incrementally: which keys
appeared, vanished, or changed. One full outer join on the key plus
column comparison classifies every row; the output feeds an upsert
(inserted/updated) and a retention policy (deleted).

Scale: single co-partitioned shuffle on the key (both sides hash the
same), comparison is in-row. 100 TB snapshots diff at the cost of one
sort-merge join; if snapshots land bucketed by the key
(operators/bucketing.py) the exchange disappears entirely.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Classify every key across two snapshots:

    ``inserted`` (only in ``new``), ``deleted`` (only in ``old``),
    ``updated`` (both, any compare column differs — null-safe),
    ``unchanged``. Returns keys + ``change_type`` + the new-side
    compare columns (old-side for deletes)."""
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    compare_cols = list(compare_cols)

    # per-side column renames, not DataFrame aliases: the two snapshots
    # often share lineage (same table filtered two ways), where aliased
    # self-join attribute resolution is ambiguous
    cols = keys + compare_cols
    # presence comes from per-side literal markers, NOT key null-ness:
    # the join is null-safe on the keys, so a row whose keys are all
    # NULL can legitimately exist on either side — key-null presence
    # tests would misclassify it as inserted/deleted
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") for c in cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") for c in cols],
        F.lit(True).alias("__in_new"),
    )
    ocol = lambda c: F.col(f"__o_{c}")  # noqa: E731
    ncol = lambda c: F.col(f"__n_{c}")  # noqa: E731
    cond = reduce(
        lambda a, b: a & b, (ocol(k).eqNullSafe(ncol(k)) for k in keys)
    )
    joined = o.join(n, cond, "full_outer")

    in_old = F.col("__in_old").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    differs = reduce(
        lambda a, b: a | b,
        (~ocol(c).eqNullSafe(ncol(c)) for c in compare_cols),
    )
    change = (
        F.when(~in_old, F.lit("inserted"))
        .when(~in_new, F.lit("deleted"))
        .when(differs, F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        *[F.coalesce(ncol(k), ocol(k)).alias(k) for k in keys],
        change.alias("change_type"),
        *[F.coalesce(ncol(c), ocol(c)).alias(c) for c in compare_cols],
    )
