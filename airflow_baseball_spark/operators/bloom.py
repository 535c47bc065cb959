"""Bloom-filter pre-pruned semi-join — the explicit form of the
runtime-filter pushdown big engines inject automatically (Spark's
`spark.sql.optimizer.runtime.bloomFilter.enabled`, Trino/Snowflake
dynamic filtering): build a compact membership sketch from the SMALL
side's join keys, prune the BIG side against it before the real join,
then exact-verify so false positives never reach the result.

Representation: the filter is the distinct set of set-bit positions
(``pmod(xxhash64(key, seed_i), num_bits)`` for k seeds) held as a
one-column DataFrame — bounded by ``min(num_bits, k * |small keys|)``
rows regardless of data scale, so the broadcast is always safe where
a broadcast of the small side's raw keys might not be (positions
dedupe; keys don't). Probing is k broadcast ``left_semi`` joins (one
per seed, all against the same broadcast position table) — pure
JVM-side hash lookups inside whole-stage codegen, no Python.

Correctness does not depend on the sketch: the final exact semi-join
removes every false positive, so the result equals the plain
semi-join (the oracle states exactly that). The sketch only decides
how much of the big side survives to the real shuffle — at 100 TB
that is the difference between shuffling the whole fact and shuffling
the matching fraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_positions(
    small: DataFrame,
    key: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 3,
) -> DataFrame:
    """One-column (``pos``) DataFrame of set bit positions for the
    small side's keys — the Bloom filter in relational form."""
    per_seed = [
        small.select(
            F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(num_bits)).alias("pos")
        )
        for i in range(num_hashes)
    ]
    out = per_seed[0]
    for p in per_seed[1:]:
        out = out.unionByName(p)
    return out.distinct()


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 3,
) -> DataFrame:
    """Rows of ``big`` whose ``big_key`` appears in ``small``'s
    ``small_key`` — semantically a plain left-semi join; physically the
    big side is pre-pruned by the Bloom sketch before the exact join."""
    pos = F.broadcast(bloom_positions(small, small_key, num_bits, num_hashes))
    # probe-column name must not clobber caller data (public API)
    h = "_bloom_h"
    while h in big.columns:
        h += "_"
    pruned = big
    for i in range(num_hashes):
        pruned = pruned.withColumn(
            h, F.pmod(F.xxhash64(F.col(big_key), F.lit(i)), F.lit(num_bits))
        ).join(pos, F.col(h) == pos["pos"], "left_semi")
    pruned = pruned.drop(h)
    # exact verify: false positives die here; the small side's keys
    # join by value (dedup not required — semi-join emits each big row
    # at most once)
    return pruned.join(
        small.select(F.col(small_key).alias("_bloom_k")).distinct(),
        F.col(big_key) == F.col("_bloom_k"),
        "left_semi",
    )
