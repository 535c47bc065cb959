"""Driver-environment diagnostic probes (r7 verdict item #1).

Six queries in CORRECTNESS_r06 were hash-red while rows+schema green,
and all six are bit-exact against the DuckDB oracle on this machine
under every perturbation the r6 judge applied (non-UTC caller session,
exact-repr comparator). One of them emits only integer counts, so the
divergence cannot be arithmetic on identical inputs: it is
environmental — the driver's testdata generation or its engine builds
read the SAME logical inputs differently than this machine does. These
probes turn the driver's opaque per-query hash bit into a measurement.

Each probe isolates ONE divergence mechanism, so the red/green pattern
across the probe block identifies the cause:

==========================  =============================================
probe                        red means (driver env vs this machine)
==========================  =============================================
probe_engine_echo            libm / float formatting differs between the
                             driver's engine builds (constants only — no
                             data is read, so data vintage is excluded)
probe_events_epoch           events.ts epoch-MICROSECOND values read
                             differently (ns->us rounding-vs-truncation,
                             sub-us jitter in a ns-vintage file): epoch
                             extraction is timezone- and tagging-proof
                             (measured: epoch_us(ts) is invariant across
                             us/ns x naive/tz parquet and any session TZ)
probe_events_hour_raw        calendar HOUR(ts) shifts while epoch stays
                             put => events.ts is tz-tagged in the driver
                             vintage AND the driver's DuckDB session runs
                             non-UTC (measured locally: tagged parquet +
                             SET TimeZone shifts hour 0->19; naive never)
probe_lineitem_days_cal      calendar date_diff('day') on l_shipdate
                             diverges (tz-tagged dates / calendar rules)
probe_lineitem_days_epoch    epoch-day integers on l_shipdate diverge =>
                             the raw stored values differ at read time
probe_documents_len          documents.text char/byte lengths differ
                             (non-ASCII vintage + length semantics;
                             DuckDB length()==codepoints==Spark length(),
                             strlen()==bytes==Spark octet_length())
probe_decimal_cast           double->DECIMAL(18,2) tie rounding: Spark
                             casts via the shortest decimal string
                             (0.615d -> 0.62) while DuckDB rounds the
                             binary value (0.615d -> 0.61) — fires only
                             when data carries 3+-decimal tie values,
                             which this machine's testdata lacks; the
                             floor(x*100+0.5) column pair is the
                             engine-identical quantization for contrast
==========================  =============================================

Every probe's output is pure BIGINT (no doubles except the echo canaries,
which are floor()-quantized to integers), so a red can never be blamed on
summation order or hash normalization of floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_baseball_spark import registry
from airflow_baseball_spark.schemas import load_table

_US_PER_HOUR = 3_600_000_000
_US_PER_DAY = 86_400_000_000
_P = 1_000_003  # prime modulus for order-invariant value checksums


def q_probe_engine_echo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One constant row of floor-quantized libm outputs. Reads no
    table, so any driver mismatch isolates the ENGINE pair (Spark JVM
    StrictMath/Math vs the DuckDB build's libm), not the data."""
    return spark.range(1).select(
        F.floor(F.log(F.lit(3.0)) * 1e15).cast("long").alias("ln3_q"),
        F.floor(F.exp(F.lit(1.0)) * 1e15).cast("long").alias("e_q"),
        F.floor(F.sqrt(F.lit(2.0)) * 1e15).cast("long").alias("sqrt2_q"),
        F.floor(F.pow(F.lit(10.0), F.lit(0.3)) * 1e15).cast("long").alias("pow_q"),
        F.floor(F.sin(F.lit(1.0)) * 1e15).cast("long").alias("sin_q"),
        F.floor((F.lit(0.1) + F.lit(0.2)) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("sum01_q"),
    )


registry.register(
    "probe_engine_echo",
    q_probe_engine_echo,
    """
    SELECT CAST(FLOOR(LN(3.0) * 1e15) AS BIGINT) AS ln3_q,
           CAST(FLOOR(EXP(1.0) * 1e15) AS BIGINT) AS e_q,
           CAST(FLOOR(SQRT(2.0) * 1e15) AS BIGINT) AS sqrt2_q,
           CAST(FLOOR(POWER(10.0, 0.3) * 1e15) AS BIGINT) AS pow_q,
           CAST(FLOOR(SIN(1.0) * 1e15) AS BIGINT) AS sin_q,
           CAST(FLOOR((0.1 + 0.2) * 1e6 + 0.5) AS BIGINT) AS sum01_q
    """,
)


def q_probe_events_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type fingerprint of events.ts as raw epoch
    microseconds: count, min, max, an order-invariant mod-prime value
    checksum, and the sum of the sub-millisecond remainders (the
    column a ns->us rounding difference moves first). epoch extraction
    bypasses every calendar/timezone rule on both engines."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min(us).alias("min_us"),
        F.max(us).alias("max_us"),
        F.sum(us % F.lit(_P)).alias("sum_us_modp"),
        F.sum(us % F.lit(1000)).alias("sum_sub_ms"),
    )


registry.register(
    "probe_events_epoch",
    q_probe_events_epoch,
    f"""
    SELECT event_type, COUNT(*) AS n,
           MIN(epoch_us(ts)) AS min_us,
           MAX(epoch_us(ts)) AS max_us,
           SUM(epoch_us(ts) % {_P}) AS sum_us_modp,
           SUM(epoch_us(ts) % 1000) AS sum_sub_ms
    FROM events GROUP BY event_type
    """,
)


def q_probe_events_hour_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw calendar HOUR(ts) histogram — DELIBERATELY not the house
    epoch-integer form. Red here + green probe_events_epoch pins the
    divergence to calendar hour extraction (tz-tagged vintage + a
    non-UTC driver DuckDB session), the exact input chi2_features
    consumed when it went r5/r6 driver-red."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.hour("ts").alias("hr")).agg(F.count("*").alias("n"))


registry.register(
    "probe_events_hour_raw",
    q_probe_events_hour_raw,
    """
    SELECT HOUR(ts) AS hr, COUNT(*) AS n FROM events GROUP BY 1
    """,
)


def q_probe_lineitem_days_cal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l_shipdate through CALENDAR day arithmetic (date_diff from the
    epoch — the pre-r7 tpch_q12ish read): per return flag, count, day
    extrema, mod-prime day checksum, and the count inside the 1997
    window. Compare with probe_lineitem_days_epoch to separate
    calendar-rule drift from raw-value drift."""
    li = load_table(spark, sf_dir, "lineitem")
    d = F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date"))
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.min(d).alias("min_day"),
        F.max(d).alias("max_day"),
        F.sum(d % F.lit(_P)).alias("sum_day_modp"),
        F.sum(((d >= 9862) & (d < 10227)).cast("long")).alias("n_1997"),
    )


registry.register(
    "probe_lineitem_days_cal",
    q_probe_lineitem_days_cal,
    """
    SELECT l_returnflag, COUNT(*) AS n,
           MIN(date_diff('day', DATE '1970-01-01', l_shipdate)) AS min_day,
           MAX(date_diff('day', DATE '1970-01-01', l_shipdate)) AS max_day,
           SUM(date_diff('day', DATE '1970-01-01', l_shipdate) % 1000003)
             AS sum_day_modp,
           SUM(CASE WHEN date_diff('day', DATE '1970-01-01', l_shipdate) >= 9862
                     AND date_diff('day', DATE '1970-01-01', l_shipdate) < 10227
                    THEN 1 ELSE 0 END) AS n_1997
    FROM lineitem GROUP BY 1
    """,
)


def q_probe_lineitem_days_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same fingerprint as probe_lineitem_days_cal but the ORACLE reads
    epoch-day integers (epoch_us // us-per-day), which is invariant to
    parquet tz tagging and the DuckDB session timezone (measured). The
    Spark side is identical to the _cal probe because datediff under
    the UTC session pin IS the epoch day."""
    li = load_table(spark, sf_dir, "lineitem")
    d = F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date"))
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.min(d).alias("min_day"),
        F.max(d).alias("max_day"),
        F.sum(d % F.lit(_P)).alias("sum_day_modp"),
    )


registry.register(
    "probe_lineitem_days_epoch",
    q_probe_lineitem_days_epoch,
    f"""
    SELECT l_returnflag, COUNT(*) AS n,
           MIN(epoch_us(l_shipdate) // {_US_PER_DAY}) AS min_day,
           MAX(epoch_us(l_shipdate) // {_US_PER_DAY}) AS max_day,
           SUM((epoch_us(l_shipdate) // {_US_PER_DAY}) % {_P}) AS sum_day_modp
    FROM lineitem GROUP BY 1
    """,
)


def q_probe_documents_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source text-length fingerprint: codepoint length (Spark
    length == DuckDB length) and byte length (Spark octet_length ==
    DuckDB strlen), plus a mod-prime checksum of the per-doc lengths.
    This is the NON-amplifying companion to media_shard_plan: a length
    disagreement shows up here as a per-source delta instead of
    reshuffling every downstream shard boundary."""
    docs = load_table(spark, sf_dir, "documents")
    clen = F.length("text")
    blen = F.octet_length("text")
    return docs.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum(clen).alias("sum_chars"),
        F.sum(blen).alias("sum_bytes"),
        F.sum(clen % F.lit(97)).alias("sum_chars_mod97"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


registry.register(
    "probe_documents_len",
    q_probe_documents_len,
    """
    SELECT source, COUNT(*) AS n,
           SUM(length(text)) AS sum_chars,
           SUM(strlen(text)) AS sum_bytes,
           SUM(length(text) % 97) AS sum_chars_mod97,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM documents GROUP BY source
    """,
)


def q_probe_decimal_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row over lineitem contrasting the two double->cents
    quantizations: CAST(x AS DECIMAL(18,2)) (engine-DIVERGENT at
    3-decimal ties: Spark rounds the shortest decimal string, DuckDB
    rounds the binary value — 0.615d casts to 0.62 vs 0.61) against
    floor(x*100+0.5) (identical IEEE ops on both engines, always
    agrees). Green locally because the local vintage carries no tie
    values; red in the driver window means its generation does — and
    then every DECIMAL-cast query inherits that risk."""
    li = load_table(spark, sf_dir, "lineitem")

    def cents_cast(c: str):
        return (F.col(c).cast("decimal(18,2)") * 100).cast("long")

    def cents_floor(c: str):
        return F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")

    return li.agg(
        F.count("*").alias("n"),
        F.sum(cents_cast("l_discount")).alias("disc_cents_cast"),
        F.sum(cents_floor("l_discount")).alias("disc_cents_floor"),
        F.sum(cents_cast("l_quantity")).alias("qty_cents_cast"),
        F.sum(cents_floor("l_quantity")).alias("qty_cents_floor"),
        F.sum(cents_cast("l_extendedprice")).alias("price_cents_cast"),
        F.sum(cents_floor("l_extendedprice")).alias("price_cents_floor"),
    )


registry.register(
    "probe_decimal_cast",
    q_probe_decimal_cast,
    """
    SELECT COUNT(*) AS n,
           SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS disc_cents_cast,
           SUM(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))
             AS disc_cents_floor,
           SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS qty_cents_cast,
           SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT))
             AS qty_cents_floor,
           SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS price_cents_cast,
           SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
             AS price_cents_floor
    FROM lineitem
    """,
)
