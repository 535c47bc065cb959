"""Total-minus-self aggregation ("all other groups" totals).

The reference computes, for each stadium, the league totals over *all
other* stadiums by re-running a filtered aggregation per stadium —
O(n²) with an embedded pandasql/SQLite engine
(``dags/001_park_factor_calculation.py:48-72``). Set-based, this is one
grouped aggregation plus a global total, with each group's "others"
value being ``total - own`` — O(n), one shuffle.

Scale note: the global total is computed with an empty-partition window
over the *already grouped* frame (|groups| rows, e.g. 9 stadiums or a
few thousand priorities — tiny), never over the raw fact table, so the
single-partition window is not a bottleneck at 100 TB: the heavy
reduction happened in the partial-aggregated groupBy before it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def total_minus_self(
    grouped: DataFrame, value_cols: list[str], suffix: str = "_others"
) -> DataFrame:
    """Append, for each ``c`` in ``value_cols``, a column ``c + suffix``
    holding ``sum(c) over () - c`` — the total across all *other* rows.

    ``grouped`` must already be aggregated to one row per group.
    """
    everything = Window.partitionBy()  # whole (already tiny) frame
    out = grouped
    for c in value_cols:
        total: Column = F.sum(c).over(everything)
        out = out.withColumn(c + suffix, total - F.col(c))
    return out
