"""Query registry — maps every implemented SURVEY.md §2 operator to a
(PySpark callable, DuckDB oracle SQL) pair over the driver testdata.

Conventions (driver compares row count + schema + order-insensitive
value hash, sorting columns by name):

* every computed column is aliased identically on both sides;
* floating-point aggregates are computed over ``DECIMAL(18,2)`` casts
  (exact, engine-independent) wherever possible, and final
  double-valued expressions are ``round(x, 6)`` on both sides so
  summation-order ulp noise cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], str | None]

_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, fn: Callable[[SparkSession, str], DataFrame], sql: str | None) -> None:
    _REGISTRY[name] = (fn, sql)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load()
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


_LOADED = False


def _load() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from airflow_baseball_spark import (  # noqa: F401
        queries_core,
        queries_domain,
        queries_io,
        queries_multimodal,
        queries_relational,
        queries_sampling,
        queries_streaming,
        queries_text,
        queries_tpch,
    )

    _LOADED = True
