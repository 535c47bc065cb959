"""Data-quality audit (Deequ/dbt-tests style): declarative constraint
checks over a table, one long-format violation report.

The reference pipeline trusts its scrape + upsert to keep tables
consistent (`dags/utils/queries.py` enforces only PRIMARY KEY); an
engine feeding a 100 TB training pipeline needs the audit as an
operator: null keys, duplicate keys, out-of-range measures, and
orphaned foreign keys, each as a count the orchestration layer can
gate on.

Scale design: all null/range constraints fold into ONE aggregate scan
(no per-check passes); duplicate counting is a key groupBy whose
map-side combine ships one row per distinct key; referential checks
left-anti join the fact against the broadcast distinct dim keys. The
report itself is O(#checks) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dq_report(
    df: DataFrame,
    key_cols: list[str] | None = None,
    not_null: list[str] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    refs: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Violation counts per declared constraint, long format
    ``(check_name string, n_violations long)``.

    * ``not_null``: columns that must not be NULL → ``null_<col>``;
    * ``ranges``: inclusive [lo, hi] bounds per column →
      ``range_<col>`` (NULLs don't double-count as range violations);
    * ``key_cols``: composite key that must be unique →
      ``dup_<cols>`` counts rows beyond the first per key;
    * ``refs``: (fk_col, dim_df, dim_key) triples → ``orphan_<col>``
      counts non-NULL fact keys absent from the dim.
    """
    parts: list[DataFrame] = []

    aggs, names = [], []
    for c in not_null or []:
        names.append(f"null_{c}")
        aggs.append(
            F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0)).alias(names[-1])
        )
    for c, (lo, hi) in (ranges or {}).items():
        names.append(f"range_{c}")
        aggs.append(
            F.coalesce(
                F.sum(((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))).cast("long")),
                F.lit(0),
            ).alias(names[-1])
        )
    if aggs:
        stacked = ", ".join(f"'{nm}', {nm}" for nm in names)
        parts.append(
            df.agg(*aggs).selectExpr(
                f"stack({len(names)}, {stacked}) AS (check_name, n_violations)"
            )
        )

    if key_cols:
        parts.append(
            df.groupBy(*key_cols)
            .agg((F.count("*") - F.lit(1)).alias("__extra"))
            .agg(
                F.coalesce(F.sum("__extra"), F.lit(0)).cast("long").alias("n_violations")
            )
            .select(
                F.lit(f"dup_{'_'.join(key_cols)}").alias("check_name"), "n_violations"
            )
        )

    for fk, dim, dim_key in refs or []:
        dim_keys = dim.select(F.col(dim_key).alias(fk)).distinct()
        parts.append(
            df.filter(F.col(fk).isNotNull())
            .join(F.broadcast(dim_keys), fk, "left_anti")
            .agg(F.count("*").cast("long").alias("n_violations"))
            .select(F.lit(f"orphan_{fk}").alias("check_name"), "n_violations")
        )

    if not parts:
        raise ValueError("no constraints declared")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
