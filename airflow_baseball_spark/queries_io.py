"""I/O driver queries: round-trips through the engine's sinks/readers,
verified against oracles that never leave the source parquet — if the
round-trip corrupts anything (types, partition values, row loss), the
hash breaks.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airflow_baseball_spark import registry
from airflow_baseball_spark.functions.scalar import dec_portable
from airflow_baseball_spark.io import readers, writers
from airflow_baseball_spark.schemas import load_table

_CSV_BACK_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderstatus", T.StringType()),  # partition col
    ]
)


def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → CSV partitioned by o_orderstatus → read back with an
    explicit schema → aggregate. The oracle aggregates the original
    parquet directly, so every row must survive the round-trip with
    types intact."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    out = tempfile.mkdtemp(prefix="csv_rt_")
    writers.export_csv_partitioned(orders, out, ["o_orderstatus"])
    back = readers.read_csv(spark, out, _CSV_BACK_SCHEMA)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(dec_portable("o_totalprice", 18, 2)).cast("double").alias("total_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


registry.register(
    "csv_roundtrip",
    q_csv_roundtrip,
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderstatus
    """,
)


def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → JSON lines → read back (FAILFAST, explicit schema) →
    per-nation count."""
    cust = load_table(spark, sf_dir, "customer")
    keep = [c for c in ("c_custkey", "c_nationkey", "c_acctbal") if c in cust.columns]
    out = tempfile.mkdtemp(prefix="json_rt_")
    cust.select(*keep).write.mode("overwrite").json(out)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_nationkey", T.LongType()),
            T.StructField("c_acctbal", T.DoubleType()),
        ]
    )
    back = readers.read_json(spark, out, schema)
    return back.groupBy("c_nationkey").agg(
        F.count("*").alias("n_cust"),
        F.sum(dec_portable("c_acctbal", 18, 2)).cast("double").alias("acctbal_sum"),
    )


registry.register(
    "json_roundtrip",
    q_json_roundtrip,
    """
    SELECT c_nationkey,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
    FROM customer GROUP BY c_nationkey
    """,
)


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → ORC → read back → per-nation aggregate. ORC is the
    second columnar format large estates standardize on; the oracle
    aggregates the source parquet, so types and rows must survive."""
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    out = tempfile.mkdtemp(prefix="orc_rt_")
    sup.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(dec_portable("s_acctbal", 18, 2)).cast("double").alias("acctbal_sum"),
        F.min("s_suppkey").alias("min_key"),
        F.max("s_suppkey").alias("max_key"),
    )


registry.register(
    "orc_roundtrip",
    q_orc_roundtrip,
    """
    SELECT s_nationkey,
           COUNT(*) AS n_supp,
           CAST(SUM(CAST(FLOOR(s_acctbal * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum,
           MIN(s_suppkey) AS min_key,
           MAX(s_suppkey) AS max_key
    FROM supplier GROUP BY s_nationkey
    """,
)


def q_upsert_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned MERGE (operators/upsert.py
    ``merge_upsert_partitioned``): orders landed partitioned by order
    year; a batch touching only 1995 keys is merged with dynamic
    partition overwrite, so every other year's files are never
    rewritten. The read-back aggregate must equal the oracle's
    whole-table merge — pruning may change WHAT is rewritten, never
    the result."""
    from airflow_baseball_spark.operators.upsert import (
        merge_upsert_partitioned,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderstatus",
        F.year("o_orderdate").alias("yr"),
    )
    tgt = tempfile.mkdtemp(prefix="abs_upsert_part_") + "/tbl"
    base.write.partitionBy("yr").parquet(tgt)
    updates = base.filter(
        (F.col("o_orderkey") % 7 == 0) & (F.col("yr") == 1995)
    ).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + 500.0).alias("o_totalprice"),
        F.lit("U").alias("o_orderstatus"),
        "yr",
    )
    merge_upsert_partitioned(
        spark, updates, tgt, keys=["o_orderkey"], partition_col="yr"
    )
    back = spark.read.parquet(tgt)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(dec_portable("o_totalprice", 18, 2))
        .cast("double")
        .alias("total"),
    )


registry.register(
    "upsert_partitioned",
    q_upsert_partitioned,
    """
    WITH merged AS (
      SELECT CASE WHEN o_orderkey % 7 = 0 AND year(o_orderdate) = 1995
                  THEN o_totalprice + 500.0 ELSE o_totalprice
             END AS o_totalprice,
             CASE WHEN o_orderkey % 7 = 0 AND year(o_orderdate) = 1995
                  THEN 'U' ELSE o_orderstatus
             END AS o_orderstatus
      FROM orders
    )
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM merged GROUP BY o_orderstatus
    """,
)


def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: generation 1 of the orders extract lacks
    the o_orderpriority column, generation 2 carries it; a mergeSchema
    scan unifies both under the widest schema, NULL-filling the column
    for gen-1 rows. The aggregate proves per-generation row survival
    AND the NULL semantics of the evolved column.

    Scale note: mergeSchema footer reconciliation costs one extra
    footer read per file at planning time — on a 100 TB table you pin
    the merged schema in a metastore instead; the read path exercised
    here (widest-schema scan over mixed files) is the same either
    way."""
    orders = load_table(spark, sf_dir, "orders")
    gen1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    gen2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    out = tempfile.mkdtemp(prefix="schema_evo_")
    gen1.write.mode("overwrite").parquet(f"{out}/gen=1")
    gen2.write.mode("overwrite").parquet(f"{out}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{out}/gen=1", f"{out}/gen=2"
    )
    return merged.groupBy(
        F.coalesce(F.col("o_orderpriority"), F.lit("<pre-evolution>")).alias(
            "priority"
        )
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(dec_portable("o_totalprice", 18, 2))
        .cast("double")
        .alias("total_price"),
    )


registry.register(
    "schema_evolution",
    q_schema_evolution,
    """
    SELECT CASE WHEN o_orderkey % 2 = 0 THEN '<pre-evolution>'
                ELSE o_orderpriority END AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders GROUP BY 1
    """,
)


def q_text_lines_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → one tab-separated line per doc through the TEXT
    format (`spark.read/write.text`, the line-oriented source raw
    corpora usually arrive in) → parse back → per-source fidelity
    profile. The oracle computes the same profile on the original
    parquet, so row loss, truncation, or separator corruption breaks
    the hash. Precondition (asserted in tests, true of the corpus):
    text contains no tabs/newlines — a real ingest escapes them first.
    """
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    out = tempfile.mkdtemp(prefix="text_rt_")
    docs.select(
        F.concat_ws("\t", F.col("source"), F.col("text")).alias("value")
    ).write.mode("overwrite").text(out)
    back = spark.read.text(out).select(
        F.split(F.col("value"), "\t", 2).alias("parts")
    )
    parsed = back.select(
        F.col("parts").getItem(0).alias("source"),
        F.col("parts").getItem(1).alias("text"),
    )
    return parsed.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("text").cast("long").alias("n_distinct_texts"),
        F.sum(F.length("text")).cast("long").alias("sum_chars"),
        F.min(F.length("text")).cast("long").alias("min_len"),
        F.max(F.length("text")).cast("long").alias("max_len"),
    )


registry.register(
    "text_lines_roundtrip",
    q_text_lines_roundtrip,
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_texts,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars,
           CAST(MIN(LENGTH(text)) AS BIGINT) AS min_len,
           CAST(MAX(LENGTH(text)) AS BIGINT) AS max_len
    FROM documents GROUP BY 1
    """,
)
