"""Deterministic sampling and dataset splitting — the train/val/test
machinery a training-data pipeline needs.

Everything here is HASH-based, never ``rand()``:

* reproducible across runs, retries, and engines (the DuckDB oracles
  replicate the assignment bit-for-bit);
* stable under repartition — a row's split follows its *identity*, not
  its physical placement (``df.sample`` re-draws per run; this doesn't);
* new data lands in consistent splits (no leakage when a corpus grows).

The unit-interval hash is the first 8 hex digits of
``md5(id || ':' || seed)`` over 2^32 — md5 so any engine can mirror it.
At 100 TB scale you would swap in ``xxhash64`` (cheaper, JVM-side,
still deterministic) once cross-engine verification is no longer
needed; the call shape stays identical.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_unit(id_col: Column | str, seed: str = "0") -> Column:
    """Uniform [0, 1) value from a row identity: md5-derived, portable."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h8 = F.substring(F.md5(F.concat(c.cast("string"), F.lit(":" + seed))), 1, 8)
    return F.conv(h8, 16, 10).cast("long") / F.lit(float(2**32))


def hash_unit_sql(id_expr: str, seed: str = "0") -> str:
    """The DuckDB mirror of :func:`hash_unit` (hex→int unrolled; every
    term is an exact integer so summation order cannot matter)."""
    h = f"md5(CAST({id_expr} AS VARCHAR) || ':{seed}')"
    terms = f"""list_sum(list_transform(generate_series(1, 8),
        i -> (strpos('0123456789abcdef', substring({h}, i, 1)) - 1)
             * 16 ** (8 - i)))"""
    return f"({terms} / 4294967296.0)"


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, seed: str = "0"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by row identity."""
    return df.filter(hash_unit(id_col, seed) < fraction)


def train_test_split(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, float] | None = None,
    seed: str = "0",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by cumulative hash thresholds.
    Weights need not sum to 1 — the remainder is unassigned ('held')."""
    weights = dict(weights or {"train": 0.8, "val": 0.1, "test": 0.1})
    u = hash_unit(id_col, seed)
    expr: Column | None = None
    acc = 0.0
    for name, w in weights.items():
        acc += w
        cond = u < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(split_col, expr.otherwise("held"))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    id_col: str,
    default_fraction: float = 0.0,
    seed: str = "0",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate
    sources hard, keep rare languages whole)."""
    u = hash_unit(id_col, seed)
    thr: Column = F.lit(default_fraction)
    for k, f in fractions.items():
        thr = F.when(F.col(strata_col) == k, F.lit(f)).otherwise(thr)
    return df.filter(u < thr)


def domain_cap(
    df: DataFrame,
    domain_col: str,
    cap: int,
    id_col: str,
    seed: str = "0",
) -> DataFrame:
    """Keep at most ``cap`` rows per domain (source / host / shard) —
    the CCNet/C4-style guard against a handful of boilerplate-heavy
    domains dominating a crawl-scale corpus.

    Rows within a domain are ranked by their identity hash (so the
    survivors are a uniform, run- and engine-stable sample of the
    domain, not "whatever arrived first"), ties broken by id. Adds
    ``domain_rank`` (1-based) to the kept rows.

    Scale: one shuffle on ``domain_col`` for the ranking window. A
    mega-domain is exactly the skew case the identity hash defuses at
    the *output* (cap bounds what survives); the transient window over
    the raw domain would be salted with a two-phase per-(domain, salt)
    pre-rank at 100 TB — same move as operators/salt.py."""
    from pyspark.sql import Window

    w = Window.partitionBy(domain_col).orderBy(
        hash_unit(id_col, seed), F.col(id_col)
    )
    return (
        df.withColumn("domain_rank", F.row_number().over(w))
        .filter(F.col("domain_rank") <= cap)
        .withColumn("domain_rank", F.col("domain_rank").cast("long"))
    )
