"""Skew handling — salted two-phase aggregation and salted joins.

At 100 TB a handful of hot keys (a mega-stadium, one dominant
event_type) can pin a whole shuffle on one reducer. AQE's skew-join
splitting handles joins; *aggregations* on low-cardinality keys need
salting: shard each key across ``n_salts`` sub-keys, partially
aggregate, then combine. Both phases are map-side-combinable, so the
first shuffle carries only ``|keys| × n_salts`` rows per partition.

The salt is DETERMINISTIC (hash of a high-cardinality column, not
``rand()``): plans stay reproducible, retried tasks produce identical
output, and the oracle can verify the result equals the unsalted
aggregation exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial aggregate, combiner) per supported decomposable aggregate
_COMBINERS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: Column | str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over skewed ``keys``.

    ``aggs`` maps output alias → (input column, fn) with fn one of
    sum/count/min/max (the decomposable set; avg = sum/count at the
    caller). ``salt_col`` is any reasonably uniform column (an id);
    its hash mod ``n_salts`` shards each hot key.
    """
    keys = list(keys)
    # pmod, not %: xxhash64 is signed and Spark's % keeps the sign —
    # a negative salt would never match the replicated small side
    salt = F.pmod(
        F.xxhash64(F.col(salt_col) if isinstance(salt_col, str) else salt_col),
        F.lit(n_salts),
    ).alias("__salt")
    partials = []
    finals = []
    for alias, (col, fn) in aggs.items():
        part_fn, comb_fn = _COMBINERS[fn]
        partials.append(part_fn(col).alias(f"__p_{alias}"))
        finals.append(comb_fn(f"__p_{alias}").alias(alias))
    # agg inputs already projected as keys must not repeat (duplicate
    # column names make the groupBy reference ambiguous)
    agg_inputs = sorted({c for c, _ in aggs.values()} - set(keys))
    phase1 = df.select(*keys, salt, *agg_inputs).groupBy(
        *keys, "__salt"
    ).agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)


def replicate_broadcast_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_col: Column | str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof join: salt the big side deterministically, replicate
    the small side once per salt value (explode — it is small by
    contract), join on (keys + salt). Where the small side fits in
    memory, plain ``broadcast()`` is simpler and Catalyst already does
    it; this shape is for the middle ground — too big to broadcast,
    joined against a skewed fact."""
    on = list(on)
    # pmod, not %: xxhash64 is signed and Spark's % keeps the sign —
    # a negative salt would never match the replicated small side
    salt = F.pmod(
        F.xxhash64(F.col(salt_col) if isinstance(salt_col, str) else salt_col),
        F.lit(n_salts),
    ).alias("__salt")
    big = skewed.select("*", salt)
    rep = small.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    )
    return big.join(rep, [*on, "__salt"], how).drop("__salt")
