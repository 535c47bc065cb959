"""Sampling / splitting driver queries. Oracles recompute the md5 unit
hash independently in DuckDB — assignments must match row-for-row, which
is the whole point of hash-based (vs rand-based) splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_baseball_spark import registry
from airflow_baseball_spark.operators.sampling import (
    hash_sample,
    hash_unit_sql,
    stratified_sample,
    train_test_split,
)
from airflow_baseball_spark.schemas import load_table

_U_DOC = hash_unit_sql("doc_id", "42")
_U_EV = hash_unit_sql("event_id", "7")


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return train_test_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed="42"
    ).select("doc_id", "split")


registry.register(
    "train_test_split",
    q_train_test_split,
    f"""
    SELECT doc_id,
           CASE WHEN {_U_DOC} < 0.8 THEN 'train'
                WHEN {_U_DOC} < 0.9 THEN 'val'
                WHEN {_U_DOC} < 1.0 THEN 'test'
                ELSE 'held' END AS split
    FROM documents
    """,
)


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return hash_sample(ev, "event_id", 0.1, seed="7").select(
        "event_id", "event_type"
    )


registry.register(
    "hash_sample",
    q_hash_sample,
    f"""
    SELECT event_id, event_type FROM events WHERE {_U_EV} < 0.1
    """,
)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the noisy event types, keep purchases whole."""
    ev = load_table(spark, sf_dir, "events")
    out = stratified_sample(
        ev,
        "event_type",
        {"purchase": 1.0, "view": 0.2, "click": 0.2},
        id_col="event_id",
        default_fraction=0.05,
        seed="7",
    )
    return out.select("event_id", "event_type")


registry.register(
    "stratified_sample",
    q_stratified_sample,
    f"""
    SELECT event_id, event_type
    FROM events
    WHERE {_U_EV} < CASE event_type
                      WHEN 'purchase' THEN 1.0
                      WHEN 'view' THEN 0.2
                      WHEN 'click' THEN 0.2
                      ELSE 0.05 END
    """,
)


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (CCNet/C4-style): at most 15 docs per source,
    survivors chosen by identity hash so the cap is a uniform stable
    sample of each domain, not arrival order."""
    from airflow_baseball_spark.operators.sampling import domain_cap

    docs = load_table(spark, sf_dir, "documents")
    return domain_cap(docs, "source", 15, id_col="doc_id", seed="11").select(
        "doc_id", "source", "domain_rank"
    )


registry.register(
    "domain_cap",
    q_domain_cap,
    f"""
    SELECT doc_id, source, domain_rank FROM (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {hash_unit_sql("doc_id", "11")}, doc_id
             ) AS BIGINT) AS domain_rank
      FROM documents
    ) WHERE domain_rank <= 15
    """,
)
