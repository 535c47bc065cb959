"""As-of join — an operator Spark lacks natively, composed from a
union + ignore-nulls window (strategy (a) per the engine's custom-
operator policy: existing DataFrame ops before Pandas UDFs).

For each left row, attach the most recent right row with
``right.ts <= left.ts`` for the same key (``direction='backward'``,
the classic point-in-time lookup).

Scale design: ONE shuffle on the join key (the union sorts within key
partitions); no range-explosion, no per-row probes. Contrast with the
naive correlated subquery (the reference's N+1 pattern,
`dags/050_insert_hitter_intergration_data.py:91-121`) and with a range
join that would multiply rows before re-aggregating. Skewed keys
behave like any window: AQE cannot split a single key, so a mega-key
would be handled by bucketing the timeline (date prefix in the key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of left join. Right payload columns come back as
    ``<name><suffix>`` (NULL when no right row precedes the left row).

    Equal timestamps match (``right.ts <= left.ts``), reproducing SQL
    ``ASOF JOIN ... ON l.ts >= r.ts`` semantics. The right payload is
    carried as ONE struct so all returned columns come from the same
    right row even when some of its fields are NULL.
    """
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    right_cols = list(right_cols)
    l_payload = [c for c in left.columns if c not in on]

    r_rows = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_payload],
    )
    l_rows = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r_rows.schema["__r"].dataType).alias("__r"),
        *l_payload,
    )
    unioned = l_rows.unionByName(r_rows)

    # right rows sort before left rows at equal ts so `<=` matches
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn("__r", F.last("__r", ignorenulls=True).over(w))
    return filled.filter(F.col("__is_left") == 1).select(
        *on,
        *l_payload,
        *[F.col(f"__r.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
