"""Per-key top-k — single-pass window replacement for the reference's
per-player ``ORDER BY game_date DESC LIMIT 5`` loop
(``dags/050_insert_hitter_intergration_data.py:49-55``).

One shuffle on the partition key; no driver-side iteration. At 100 TB,
this is the canonical pattern: the shuffle is on the same key later
joins use, so pre-bucketing the fact table by ``key_cols`` makes it
shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top ``k`` rows per key as ranked by ``order_by``.

    Uses ``row_number`` (deterministic given a total order — pass
    tie-breaker columns in ``order_by`` for stable results).
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    out = ranked.filter(F.col("__rn") <= k)
    if rank_col is None:
        return out.drop("__rn")
    return out.withColumnRenamed("__rn", rank_col)
