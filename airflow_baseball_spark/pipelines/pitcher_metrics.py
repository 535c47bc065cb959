"""Pitcher metric stage — reference DAG 021
(``dags/021_calculate_pitcher_metrics.py``) as one declarative job.

The reference loops all pitchers accumulating league totals in Python
variables (hr/bb/so/ip with a custom fraction parser; mean ERA skipping
unparseable values via an error counter, 021:43-64), then loops again
computing FIP/K9/BB9/HR9 per pitcher with one UPSERT per row
(021:68-104). Here:

* ``ip`` fraction strings parse via a pure column expression (F6);
* league totals are one aggregation; the skip-unparseable ERA mean is
  ``avg(try_cast(era as double))`` — AVG ignores NULLs, exactly the
  reference's error_count exclusion (D3/D5);
* per-pitcher formulas are arithmetic with the league row broadcast
  back in-plan; ``ip = 0`` rows get NULL metrics (B4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_baseball_spark.functions.scalar import ip_to_float
from airflow_baseball_spark.metrics import pitching


def pitcher_metrics(pitchers: DataFrame) -> DataFrame:
    """pitchers (schemas.PITCHERS-shaped) → pitcher_id, fip, k_9, bb_9, hr_9."""
    parsed = pitchers.select(
        "pitcher_id",
        "hr",
        "bb",
        "so",
        ip_to_float(F.col("ip")).alias("ip_f"),
        F.expr("try_cast(era AS double)").alias("era_f"),
    )
    league = parsed.agg(
        F.sum("hr").alias("lg_hr"),
        F.sum("bb").alias("lg_bb"),
        F.sum("so").alias("lg_so"),
        F.sum("ip_f").alias("lg_ip"),
        F.avg("era_f").alias("lg_era"),  # unparseable ERA rows excluded (D3)
    ).withColumn(
        "fip_const",
        pitching.fip_constant(
            F.col("lg_era"),
            F.col("lg_hr"),
            F.col("lg_bb"),
            F.col("lg_so"),
            F.col("lg_ip"),
        ),
    )
    joined = parsed.crossJoin(F.broadcast(league))
    return joined.select(
        "pitcher_id",
        pitching.fip(
            F.col("hr"), F.col("bb"), F.col("so"), F.col("ip_f"), F.col("fip_const")
        ).alias("fip"),
        pitching.k9(F.col("so"), F.col("ip_f")).alias("k_9"),
        pitching.bb9(F.col("bb"), F.col("ip_f")).alias("bb_9"),
        pitching.hr9(F.col("hr"), F.col("ip_f")).alias("hr_9"),
    )
