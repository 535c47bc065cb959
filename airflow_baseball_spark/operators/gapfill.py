"""Calendar gap-fill + forward fill ("carry last observation
forward") — the time-series densification every per-day feature
pipeline needs (the reference's recent-5-games extracts assume dense
game logs; real logs have off days).

Shape: one groupBy to find each key's date bounds, an in-row
``sequence``/``explode`` to build the spine (no driver loop, no
cross join with a global calendar — each key only materializes ITS
OWN range), a left join back, and one ordered window for the fill.
Both shuffles hash on the key; the window reuses the join's
partitioning. At 100 TB the spine adds |keys| x |days| rows — linear
in the output, which is the floor for densification.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    df: DataFrame,
    key: str,
    date_col: str,
    value_cols: Sequence[str],
    flag_col: str = "was_present",
) -> DataFrame:
    """Densify ``df`` to one row per (key, day) between each key's
    min and max date; forward-fill ``value_cols`` across the gaps.
    ``flag_col`` marks rows that existed in the input — detected via
    ``value_cols[0]``, which therefore must be non-null on every input
    row (true for any aggregate-derived frame; pass a literal marker
    column first if your values can be legitimately null)."""
    spine = (
        df.groupBy(key)
        .agg(F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1"))
        .select(
            key,
            F.explode(F.sequence("__d0", "__d1")).alias(date_col),
        )
    )
    joined = spine.join(df, [key, date_col], "left")
    w = (
        Window.partitionBy(key)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = joined.withColumn(
        flag_col, F.col(value_cols[0]).isNotNull()
    )
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
