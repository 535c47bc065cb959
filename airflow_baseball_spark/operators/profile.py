"""Table profiling — per-column statistics in ONE scan (the engine's
``ANALYZE TABLE`` / data-quality probe).

Every serious engine collects column stats (null counts, NDV,
min/max) to drive join ordering and to monitor landed data; pipelines
run the same probe as a data-quality gate after ingest. All columns'
aggregates are computed in a single pass over the table (one
HashAggregate, no per-column jobs), then pivoted long with an in-row
``stack`` — profiling a 100 TB table costs exactly one scan.

Values are stringified into a uniform schema; keep to types with
stable cross-engine string forms (ints, strings, dates) when
differential-testing the output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Long-format stats, one row per column:

    ``(column_name, n_nonnull, n_distinct, min_val, max_val)``

    ``n_distinct`` is exact (COUNT DISTINCT); swap for
    ``approx_count_distinct`` at trillion-row scale where 2% error is
    an easy trade for the partial-aggregation shuffle."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"__n_{c}"),
            F.countDistinct(c).alias(f"__d_{c}"),
            # min/max on the NATIVE type (string-casting first would
            # make '10' sort before '9'), stringified only at the end
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n_{c}, __d_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nonnull, n_distinct, min_val, max_val)"
        )
    )
