"""DDL runner — the reference's drop/re-create table lifecycle
(`dags/0_init_baseball_table.py:19-36` drops, `:38-479` creates; the
per-run re-create of park_factor at
`dags/001_park_factor_calculation.py:20-34`) re-expressed against the
Spark catalog.

``schemas.DOMAIN_SCHEMAS`` stays the single source of truth: DDL
strings are *derived* from the StructTypes, never hand-written twice
— the reference's equivalent risk (``table_columns.py`` lists drifting
from the CREATE TABLE statements) can't happen here.

Tables are created ``USING parquet`` (columnar at rest; a Delta/
Iceberg deployment swaps the provider string and gains MERGE — see
operators/upsert.py for that gate). At 100 TB, add ``PARTITIONED BY``
on the natural date column per table; the runner takes that as a
mapping so partitioning stays a deployment choice, not a schema fact.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from airflow_baseball_spark.schemas import DOMAIN_SCHEMAS


def column_ddl(schema: T.StructType) -> str:
    """``name type, ...`` column list from a StructType (Spark's
    ``simpleString`` forms round-trip through the parser)."""
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )


def drop_all(spark: SparkSession, database: str) -> None:
    """`0_init_baseball_table.py:19-36` — drop every managed table."""
    for name in DOMAIN_SCHEMAS:
        spark.sql(f"DROP TABLE IF EXISTS `{database}`.`{name}`")


def create_all(
    spark: SparkSession,
    database: str,
    drop_first: bool = True,
    partitioned_by: dict[str, str] | None = None,
) -> list[str]:
    """`0_init_baseball_table.py:38-479` — (re)create the full table
    inventory in ``database``; returns the created table names.
    ``partitioned_by`` maps table → partition column for deployments
    that lay tables out by date/player."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{database}`")
    if drop_first:
        drop_all(spark, database)
    created = []
    for name, schema in DOMAIN_SCHEMAS.items():
        part = ""
        pcol = (partitioned_by or {}).get(name)
        if pcol:
            if pcol not in schema.fieldNames():
                raise ValueError(f"{name}: partition column {pcol!r} not in schema")
            part = f" PARTITIONED BY (`{pcol}`)"
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS `{database}`.`{name}` "
            f"({column_ddl(schema)}) USING parquet{part}"
        )
        created.append(name)
    return created


def recreate_table(spark: SparkSession, database: str, name: str) -> None:
    """The reference's per-run drop/create of one table
    (`001_park_factor_calculation.py:20-34`)."""
    spark.sql(f"DROP TABLE IF EXISTS `{database}`.`{name}`")
    spark.sql(
        f"CREATE TABLE `{database}`.`{name}` "
        f"({column_ddl(DOMAIN_SCHEMAS[name])}) USING parquet"
    )
