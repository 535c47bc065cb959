"""Core SURVEY.md §2 operators phrased over the driver testdata
(FIXTURES.md §2 mapping), each registered with its DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_baseball_spark import registry
from airflow_baseball_spark.pipelines.park_factor import FLAGSHIP_ORACLE_SQL, flagship
from airflow_baseball_spark.schemas import load_table


# --- D4 + F13: flagship total-minus-self ratio (park factor) ---------------

registry.register("park_factor_flagship", flagship, FLAGSHIP_ORACLE_SQL)


# --- D1: hash group-by aggregation ----------------------------------------


def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stadium score totals analog: lineitem by returnflag/linestatus
    (reference D1: dags/001_park_factor_calculation.py:42-46)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


registry.register(
    "groupby_agg",
    q_groupby_agg,
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
