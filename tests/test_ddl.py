"""A11 — DDL lifecycle runner against the Spark catalog."""

from __future__ import annotations

from airflow_baseball_spark import ddl
from airflow_baseball_spark.schemas import DOMAIN_SCHEMAS


def test_create_drop_lifecycle(spark):
    db = "ddl_test_db"
    created = ddl.create_all(spark, db)
    assert set(created) == set(DOMAIN_SCHEMAS)
    tables = {t.name for t in spark.catalog.listTables(db)}
    assert set(DOMAIN_SCHEMAS) <= tables
    # schema round-trips through the catalog
    got = spark.table(f"{db}.hitters").schema
    assert got == DOMAIN_SCHEMAS["hitters"]
    # per-run re-create (001 park_factor pattern) keeps the table usable
    spark.sql(f"INSERT INTO {db}.park_factor VALUES ('x', 1.0)")
    assert spark.table(f"{db}.park_factor").count() == 1
    ddl.recreate_table(spark, db, "park_factor")
    assert spark.table(f"{db}.park_factor").count() == 0
    ddl.drop_all(spark, db)
    assert not {t.name for t in spark.catalog.listTables(db)} & set(DOMAIN_SCHEMAS)


def test_partitioned_create(spark):
    db = "ddl_test_db2"
    ddl.create_all(spark, db, partitioned_by={"hitter_games": "game_date"})
    cols = [c.name for c in spark.catalog.listColumns("hitter_games", db)]
    # partition column survives (Spark moves it last in the physical order)
    assert "game_date" in cols
    ddl.drop_all(spark, db)
