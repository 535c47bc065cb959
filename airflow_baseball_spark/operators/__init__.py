"""Reusable distributed operators (SURVEY.md §2 A8, D4, E1)."""

from airflow_baseball_spark.operators.topk import top_k_per_key
from airflow_baseball_spark.operators.total_minus_self import total_minus_self
from airflow_baseball_spark.operators.upsert import merge_upsert

__all__ = ["top_k_per_key", "total_minus_self", "merge_upsert"]
