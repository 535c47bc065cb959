"""Z-order (Morton) layout — multi-dimensional data-skipping for
parquet at scale.

A table range-partitioned and sorted on the bit-interleaved z-value of
two columns gives BOTH columns tight min/max ranges per file, so
footer-level skipping prunes on either predicate — the layout Delta's
``OPTIMIZE ZORDER BY`` and Iceberg's sort orders produce. At 100 TB
this is the difference between scanning a whole date range to find one
customer and touching a handful of files.

The z-value is a pure column expression (bit shifts + masks, fully
inside whole-stage codegen), so the "optimize" pass is one
``repartitionByRange`` + sorted write — a single range-exchange over
the data, no driver involvement beyond range-boundary sampling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def zorder_value(a: Column, b: Column, bits: int = DEFAULT_BITS) -> Column:
    """Morton interleave of the low ``bits`` of two non-negative
    integral columns: result bit ``2i`` is ``a``'s bit ``i``, bit
    ``2i+1`` is ``b``'s bit ``i``. Engine-portable (plain shifts and
    masks — the DuckDB oracle mirrors it term for term)."""
    a = a.cast("long")
    b = b.cast("long")
    terms: list[Column] = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_sql(a: str, b: str, bits: int = DEFAULT_BITS) -> str:
    """DuckDB expression computing exactly :func:`zorder_value`."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({a} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({b} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits: int = DEFAULT_BITS,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files laid out in z-order
    on two columns: one range-exchange on the z-value (boundaries from
    Spark's reservoir sample), files sorted internally so parquet
    page/rowgroup stats are tight too. The z column itself is dropped
    from the output — it is layout, not data."""
    if len(cols) != 2:
        raise ValueError("z-order layout interleaves exactly two columns")
    z = zorder_value(F.col(cols[0]), F.col(cols[1]), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
