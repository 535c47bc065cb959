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


def hilbert_stages(bits: int = DEFAULT_BITS) -> list[int]:
    """The level sizes of the order-``bits`` Hilbert walk, high to
    low: [2^(bits-1), ..., 2, 1]."""
    return [1 << i for i in range(bits - 1, -1, -1)]


def with_hilbert(
    df: DataFrame,
    x: Column,
    y: Column,
    out: str = "hval",
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """Append the order-``bits`` Hilbert curve index of (x, y) (both
    assumed in [0, 2^bits)) as column ``out``.

    The xy2d walk (one rotate-and-accumulate step per bit level) is
    expressed as ONE chained projection per level — each stage reads
    the previous stage's (x, y, d) columns, so the expression tree
    grows linearly with bits (inlining the recurrence into a single
    Column would double the tree per level). Pure shifts/masks/CASE —
    whole-stage codegen, engine-portable, mirrored term-for-term by
    :func:`hilbert_sql`."""
    df = df.withColumn("_hx", x.cast("long")).withColumn(
        "_hy", y.cast("long")
    ).withColumn("_hd", F.lit(0).cast("long"))
    for s in hilbert_stages(bits):
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        df = (
            df.withColumn("_rx", rx)
            .withColumn("_ry", ry)
            .withColumn(
                "_hd",
                F.col("_hd")
                + F.lit(s * s)
                * (F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry")),
            )
            .withColumn(
                "_hx2",
                F.when(F.col("_ry") == 1, F.col("_hx")).otherwise(
                    F.when(
                        F.col("_rx") == 1, F.lit(s - 1) - F.col("_hy")
                    ).otherwise(F.col("_hy"))
                ),
            )
            .withColumn(
                "_hy2",
                F.when(F.col("_ry") == 1, F.col("_hy")).otherwise(
                    F.when(
                        F.col("_rx") == 1, F.lit(s - 1) - F.col("_hx")
                    ).otherwise(F.col("_hx"))
                ),
            )
            .drop("_hx", "_hy", "_rx", "_ry")
            .withColumnRenamed("_hx2", "_hx")
            .withColumnRenamed("_hy2", "_hy")
        )
    return df.withColumnRenamed("_hd", out).drop("_hx", "_hy")


def hilbert_sql(
    src: str, x: str, y: str, keep: str, bits: int = DEFAULT_BITS
) -> str:
    """DuckDB CTE chain computing exactly :func:`with_hilbert` over
    ``src`` (one CTE per bit level). ``keep`` is a comma-joined list
    of pass-through columns; the result relation is named ``hfinal``
    with columns (``keep``..., hval)."""
    ctes = [
        f"h0 AS (SELECT {keep}, CAST({x} AS BIGINT) AS hx,"
        f" CAST({y} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM {src})"
    ]
    lvl = 0
    for s in hilbert_stages(bits):
        prev, lvl = f"h{lvl}", lvl + 1
        ctes.append(f"""h{lvl} AS (
      SELECT {keep},
             CASE WHEN ((hy & {s}) > 0) THEN hx
                  WHEN ((hx & {s}) > 0) THEN {s - 1} - hy
                  ELSE hy END AS hx,
             CASE WHEN ((hy & {s}) > 0) THEN hy
                  WHEN ((hx & {s}) > 0) THEN {s - 1} - hx
                  ELSE hx END AS hy,
             hd + {s * s} * xor(3 * (CASE WHEN (hx & {s}) > 0
                                          THEN 1 ELSE 0 END),
                                (CASE WHEN (hy & {s}) > 0
                                      THEN 1 ELSE 0 END)) AS hd
      FROM {prev})""")
    ctes.append(f"hfinal AS (SELECT {keep}, hd AS hval FROM h{lvl})")
    return ",\n    ".join(ctes)
