"""Park-factor pipeline — the flagship query.

Reference: ``dags/001_park_factor_calculation.py:36-81`` reads all of
``game_records`` into pandas, hash-aggregates per stadium, then loops
stadiums issuing an O(n²) pandasql query per stadium for "all other
stadiums" totals, computing::

    park_factor = ((scored + allowed) / games)
                / ((others_scored + others_allowed) / others_games)

Here it is one declarative job: scan → groupBy(stadium) → global-total
window over the 9-row grouped frame → arithmetic → done. Two shuffles
max (groupBy + the trivially small window), scan reads only the three
columns needed (Catalyst pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_baseball_spark.functions.scalar import dec_portable
from airflow_baseball_spark.operators.total_minus_self import total_minus_self
from airflow_baseball_spark.schemas import load_table


def park_factor(game_records: DataFrame) -> DataFrame:
    """stadium → park_factor from a game_records-shaped DataFrame."""
    per_stadium = game_records.groupBy("stadium").agg(
        F.sum("home_score").alias("scored"),
        F.sum("away_score").alias("allowed"),
        F.count("*").alias("games"),
    )
    with_others = total_minus_self(per_stadium, ["scored", "allowed", "games"])
    own_rate = (F.col("scored") + F.col("allowed")) / F.col("games")
    others_rate = (F.col("scored_others") + F.col("allowed_others")) / F.col(
        "games_others"
    )
    return with_others.select(
        "stadium", (own_rate / others_rate).alias("park_factor")
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Testdata phrasing (FIXTURES.md §2): o_orderpriority plays the
    stadium, o_totalprice the score. Sums are taken over DECIMAL(18,2)
    so Spark and the DuckDB oracle agree bit-for-bit; the final ratio is
    rounded to 6 places."""
    orders = load_table(spark, sf_dir, "orders")
    per_prio = orders.groupBy("o_orderpriority").agg(
        F.sum(dec_portable("o_totalprice", 18, 2)).alias("total"),
        F.count("*").alias("cnt"),
    )
    with_others = total_minus_self(per_prio, ["total", "cnt"])
    own_rate = F.col("total").cast("double") / F.col("cnt")
    others_rate = F.col("total_others").cast("double") / F.col("cnt_others")
    return (
        with_others.select(
            "o_orderpriority",
            F.round(own_rate / others_rate, 6).alias("priority_factor"),
        )
        .orderBy("o_orderpriority")
    )


FLAGSHIP_ORACLE_SQL = """
WITH per_prio AS (
  SELECT o_orderpriority,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS total,
         COUNT(*) AS cnt
  FROM orders
  GROUP BY o_orderpriority
), with_tot AS (
  SELECT *,
         SUM(total) OVER () AS g_total,
         SUM(cnt) OVER () AS g_cnt
  FROM per_prio
)
SELECT o_orderpriority,
       ROUND((CAST(total AS DOUBLE) / cnt)
             / (CAST(g_total - total AS DOUBLE) / (g_cnt - cnt)), 6)
         AS priority_factor
FROM with_tot
ORDER BY o_orderpriority
"""
