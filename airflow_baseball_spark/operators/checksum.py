"""Order-insensitive bucketed table checksums — the data-diff /
replication-reconciliation primitive: two copies of a table (two
clusters, engine vs oracle, pre/post-migration) agree iff their
bucket fingerprints agree, and a disagreement pinpoints WHICH bucket
to re-sync without comparing rows.

Each row canonicalizes to a delimited string (caller fixes the
rendering of every column — decimals keep scale, timestamps print a
fixed format — so both engines render identical bytes), hashes to a
60-bit integer via md5 (portable: Spark ``conv(substr(md5))`` ==
DuckDB ``'0x…'::BIGINT``), and lands in one of ``num_buckets``
buckets by hash mod. Per bucket: row count, the mod-2^32-folded hash
sum (BIGINT on both engines — see table_checksum), and the XOR fold —
three independent order-insensitive accumulators, all map-side
combinable, so the whole fingerprint is ONE aggregation pass with a
``num_buckets``-row result regardless of table size.

Collision posture: forging equal (count, sum, xor) per bucket across
different row multisets requires md5 collisions in 60 bits — fine for
reconciliation (not an adversarial MAC).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def portable_hash60(col: Column) -> Column:
    """60-bit integer from the md5 of a string column — numerically
    identical in DuckDB as ``CAST('0x' || SUBSTRING(MD5(x),1,15) AS
    BIGINT)``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def table_checksum(
    df: DataFrame,
    canonical_cols: list[Column],
    num_buckets: int = 64,
) -> DataFrame:
    """(bucket, n_rows, hash_sum, hash_xor) — ``num_buckets`` rows.

    ``canonical_cols`` must be string-rendered columns whose textual
    form is engine-identical (cast decimals/dates explicitly; never
    rely on default double formatting).

    ``hash_sum`` is the sum of each 60-bit hash folded mod 2^32 —
    BIGINT on both engines (r9): the previous exact DECIMAL(38,0) sum
    exceeds 2^63 and every dtype-preserving fetch (pandas/arrow)
    degrades int128-class values to float64, which is exactly the
    driver-red mechanism PERF_NOTES.md r9 documents. The fold keeps
    the sum exact in int64 up to ~2·10^9 rows per bucket (~10^11 rows
    per table at 64 buckets — beyond 100 TB scale for row tables);
    collision posture is unchanged in practice because (count, folded
    sum, full-width XOR) must all collide simultaneously per bucket.
    """
    h = portable_hash60(F.concat_ws("|", *canonical_cols))
    fold = 1 << 32
    return (
        df.select(h.alias("h"))
        .groupBy(F.pmod(F.col("h"), F.lit(num_buckets)).alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("h") % F.lit(fold)).cast("long").alias("hash_sum"),
            F.expr("bit_xor(h)").alias("hash_xor"),
        )
    )
