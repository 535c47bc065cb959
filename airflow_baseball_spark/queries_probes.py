"""Driver-environment diagnostic probes, ladder v2 (r8 verdict item #1).

The r7 probe panel (v1) DETECTED where the driver divergence lives:
``probe_engine_echo`` green (engine arithmetic exonerated) and
``probe_events_hour_raw`` green (calendar HOUR agrees) — both RETIRED —
while epoch-µs reads of ``events.ts``, day derivations of
``l_shipdate``, char/byte lengths of ``documents.text``, and
double→DECIMAL(18,2) tie casts all came back red. v2 upgrades the
panel from detector to DECIDER: each probe is one read primitive on
one column, so the r8 window's red/green pattern names the
engine-agreeing primitive per column instead of another round of
guessing.

Local engine matrix measured for r8 (the evidence behind the ladder):
Spark 4.1.2 reads ns-annotated parquet only as raw BIGINT ns (the
nanosAsLong flag; the conversion to µs is load_table's choice) and
truncates INT96 to µs natively; DuckDB 1.0 TRUNCATES ns/INT96 parquet
to µs at scan (sub-µs destroyed before SQL). Since the local pairing
trunc/trunc is green while the r7 driver window was red even with a
truncation-forcing oracle (``interval_union_time``), every
truncating-DuckDB scenario is eliminated for the driver environment —
the driver's DuckDB either ROUNDS ns→µs at scan or reads exact ns.
load_table + the registry's ``_TS_NORM_CTES`` therefore moved to
round-half-up ``(ns+500)//1000`` in r8; the ladder below verifies that
choice from the driver's own window.

Decision table (Spark side is always the engine's actual read —
load_table, round-half-up on the ns branch):

====================  ===============================================
pattern                meaning
====================  ===============================================
us_trunc G, us_round G driver DuckDB's scan converts ns→µs itself (or
                       the vintage is µs-native): both oracles are
                       identities; the r8 round convention agrees —
                       the r7 reds were the trunc/round split, fixed
us_trunc R, us_round G driver DuckDB reads EXACT ns: the round oracle
                       matches load_table's convention, the trunc one
                       doesn't — round is proven, keep it
us_trunc R, us_round R neither convention matches; walk the grain
                       ladder (ms, then sec): the coarsest green
                       grain is the only safe events.ts hash surface
ms/sec R               divergence is above µs grain (value-level, not
                       precision-level): treat events.ts as unreadable
                       for hash purposes and swap it out of surfaces
duck_subus RED         driver DuckDB sees nonzero sub-µs remainders —
                       direct proof of an exact-ns read (this probe's
                       Spark side is the constant 0)
ship_day_round G       l_shipdate days agree under the round-half-up
                       derivation (the engine's read) — rebased reds
                       (tpch_q12ish, psi_drift, sql_api_pricing) hold
ship_day_trunc R only  the midnight-minus-epsilon generation shape:
                       values just below midnight round up but
                       truncate down (reproduced locally by the
                       `driverish` vintage)
ship_day_cal vs epoch  cal G / epoch R isolates calendar-rule or
                       session-TZ drift from raw-value drift
doc_bytes / doc_chars  byte lengths are pure data; codepoint lengths
                       add semantics. bytes G + chars R → count in
                       BYTES everywhere; bytes R → engines read
                       different STRING CONTENT — see doc_content
doc_content R          md5-of-text checksums differ: the engines
                       disagree on the bytes themselves (encoding or
                       scan-level replacement) — text-derived columns
                       are unreliable in hash surfaces; use stored
                       columns (n_chars) instead
dec_floor G            floor(x*100+0.5) cents agree on stored doubles
                       (IEEE-identical on both engines) — validates
                       the repo-wide r8 sweep away from
                       CAST(double AS DECIMAL(18,2))
dec_floor R            the stored double BITS read differently —
                       escalate: no numeric surface is safe
dec_cast R             reconfirms the decimal-tie divergence measured
                       in r7 (Spark shortest-string vs DuckDB binary
                       rounding); no registered query depends on the
                       pattern after the r8 sweep
====================  ===============================================

Every probe's output is pure BIGINT, so a red can never be blamed on
summation order or float hash normalization. Probes read the RAW
DuckDB views (registry.register skips oracle normalization for
``probe_``-prefixed names) — measuring the un-normalized environment
is their job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_baseball_spark import registry
from airflow_baseball_spark.schemas import load_table

_US_PER_DAY = 86_400_000_000
_P = 1_000_003  # prime modulus for order-invariant value checksums


# ---------------------------------------------------------------------------
# events.ts — ns→µs convention + grain ladder
# ---------------------------------------------------------------------------


def _ev_us_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared Spark side for the µs-convention pair: the engine's
    actual read (load_table, round-half-up ns branch) fingerprinted as
    count + order-invariant mod-prime checksum of epoch-µs."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    return ev.agg(
        F.count("*").alias("n"),
        F.sum(us % F.lit(_P)).alias("sum_us_modp"),
    )


def q_probe_ev_us_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts at µs grain, oracle = TRUNCATION (epoch_ns//1000)."""
    return _ev_us_fingerprint(spark, sf_dir)


registry.register(
    "probe_ev_us_trunc",
    q_probe_ev_us_trunc,
    f"""
    SELECT COUNT(*) AS n,
           SUM((epoch_ns(ts) // 1000) % {_P}) AS sum_us_modp
    FROM events
    """,
)


def q_probe_ev_us_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts at µs grain, oracle = ROUND-HALF-UP
    ((epoch_ns+500)//1000) — the engine's r8 convention."""
    return _ev_us_fingerprint(spark, sf_dir)


registry.register(
    "probe_ev_us_round",
    q_probe_ev_us_round,
    f"""
    SELECT COUNT(*) AS n,
           SUM(((epoch_ns(ts) + 500) // 1000) % {_P}) AS sum_us_modp
    FROM events
    """,
)


def q_probe_ev_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts at MILLISECOND grain (grain ladder step 1): if both
    µs probes are red, a green here bounds the divergence below 1 ms
    and any events.ts hash surface can quantize to ms."""
    ev = load_table(spark, sf_dir, "events")
    ms = F.expr("unix_micros(ts) div 1000")
    return ev.agg(
        F.count("*").alias("n"),
        F.sum(ms % F.lit(_P)).alias("sum_ms_modp"),
    )


registry.register(
    "probe_ev_ms",
    q_probe_ev_ms,
    f"""
    SELECT COUNT(*) AS n,
           SUM((epoch_ns(ts) // 1000000) % {_P}) AS sum_ms_modp
    FROM events
    """,
)


def q_probe_ev_sec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts at SECOND grain (grain ladder step 2, the backstop
    below the already-proven-green calendar HOUR)."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.expr("unix_micros(ts) div 1000000")
    return ev.agg(
        F.count("*").alias("n"),
        F.sum(sec % F.lit(_P)).alias("sum_sec_modp"),
    )


registry.register(
    "probe_ev_sec",
    q_probe_ev_sec,
    f"""
    SELECT COUNT(*) AS n,
           SUM((epoch_ns(ts) // 1000000000) % {_P}) AS sum_sec_modp
    FROM events
    """,
)


def q_probe_ev_duck_subus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the DRIVER's DuckDB see sub-µs remainders on events.ts?
    The Spark side is the constant 0 (one row); the oracle counts rows
    whose epoch_ns is not µs-aligned. Green under any DuckDB whose
    scan converts ns→µs (local 1.0 truncates — remainders destroyed)
    and under µs-native vintages; RED is direct proof of an exact-ns
    read in the driver environment."""
    return spark.range(1).select(F.lit(0).cast("long").alias("n_subus"))


registry.register(
    "probe_ev_duck_subus",
    q_probe_ev_duck_subus,
    """
    SELECT SUM(CASE WHEN epoch_ns(ts) % 1000 <> 0 THEN 1 ELSE 0 END)
           AS n_subus
    FROM events
    """,
)


# ---------------------------------------------------------------------------
# lineitem.l_shipdate — day-derivation ladder
# ---------------------------------------------------------------------------


def _ship_day_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared Spark side for the day-derivation probes: the engine's
    actual read (datediff on the load_table-normalized value), as
    count + min + max + mod-prime checksum — all four columns derive
    from the same per-row day integer, so the probe stays one
    mechanism while separating whole-range shifts (min/max move) from
    scattered rows (only the checksum moves)."""
    li = load_table(spark, sf_dir, "lineitem")
    d = F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date"))
    return li.agg(
        F.count("*").alias("n"),
        F.min(d).alias("min_day"),
        F.max(d).alias("max_day"),
        F.sum(d % F.lit(_P)).alias("sum_day_modp"),
    )


def q_probe_ship_day_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l_shipdate days, oracle = round-half-up ns→µs then floor to
    days — the engine's r8 convention."""
    return _ship_day_fingerprint(spark, sf_dir)


registry.register(
    "probe_ship_day_round",
    q_probe_ship_day_round,
    f"""
    SELECT COUNT(*) AS n,
           MIN(((epoch_ns(l_shipdate) + 500) // 1000) // {_US_PER_DAY})
             AS min_day,
           MAX(((epoch_ns(l_shipdate) + 500) // 1000) // {_US_PER_DAY})
             AS max_day,
           SUM((((epoch_ns(l_shipdate) + 500) // 1000) // {_US_PER_DAY})
               % {_P}) AS sum_day_modp
    FROM lineitem
    """,
)


def q_probe_ship_day_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l_shipdate days, oracle = pure truncation (the r7 convention,
    red in the r7 driver window). Round-G + trunc-R is the signature
    of midnight-minus-epsilon values (see the driverish vintage)."""
    return _ship_day_fingerprint(spark, sf_dir)


registry.register(
    "probe_ship_day_trunc",
    q_probe_ship_day_trunc,
    f"""
    SELECT COUNT(*) AS n,
           MIN(epoch_ns(l_shipdate) // {_US_PER_DAY * 1000}) AS min_day,
           MAX(epoch_ns(l_shipdate) // {_US_PER_DAY * 1000}) AS max_day,
           SUM((epoch_ns(l_shipdate) // {_US_PER_DAY * 1000}) % {_P})
             AS sum_day_modp
    FROM lineitem
    """,
)


def q_probe_ship_day_cal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l_shipdate days, oracle = CALENDAR path (CAST AS DATE +
    date_diff on the raw view): separates calendar-rule / session-TZ
    drift from the raw-value drift the epoch probes measure."""
    return _ship_day_fingerprint(spark, sf_dir)


registry.register(
    "probe_ship_day_cal",
    q_probe_ship_day_cal,
    f"""
    SELECT COUNT(*) AS n,
           MIN(date_diff('day', DATE '1970-01-01',
                         CAST(l_shipdate AS DATE))) AS min_day,
           MAX(date_diff('day', DATE '1970-01-01',
                         CAST(l_shipdate AS DATE))) AS max_day,
           SUM(date_diff('day', DATE '1970-01-01',
                         CAST(l_shipdate AS DATE)) % {_P}) AS sum_day_modp
    FROM lineitem
    """,
)


# ---------------------------------------------------------------------------
# documents.text — bytes vs codepoints vs content
# ---------------------------------------------------------------------------


def q_probe_doc_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text BYTE lengths only (Spark octet_length == DuckDB
    strlen). Bytes are pure data — a red here means the engines read
    different string content, not different length semantics."""
    docs = load_table(spark, sf_dir, "documents")
    blen = F.octet_length("text")
    return docs.agg(
        F.count("*").alias("n"),
        F.sum(blen).alias("sum_bytes"),
        F.sum(blen % F.lit(997)).alias("sum_bytes_mod"),
    )


registry.register(
    "probe_doc_bytes",
    q_probe_doc_bytes,
    """
    SELECT COUNT(*) AS n,
           SUM(strlen(text)) AS sum_bytes,
           SUM(strlen(text) % 997) AS sum_bytes_mod
    FROM documents
    """,
)


def q_probe_doc_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text CODEPOINT lengths only (Spark length == DuckDB
    length). bytes-G + chars-R isolates a length-semantics split
    (grapheme/UTF-16 counting) — then every text surface should count
    bytes."""
    docs = load_table(spark, sf_dir, "documents")
    clen = F.length("text")
    return docs.agg(
        F.count("*").alias("n"),
        F.sum(clen).alias("sum_chars"),
        F.sum(clen % F.lit(997)).alias("sum_chars_mod"),
    )


registry.register(
    "probe_doc_chars",
    q_probe_doc_chars,
    """
    SELECT COUNT(*) AS n,
           SUM(length(text)) AS sum_chars,
           SUM(length(text) % 997) AS sum_chars_mod
    FROM documents
    """,
)


def q_probe_doc_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text CONTENT checksum: md5 is byte-defined and
    engine-portable, so an order-invariant sum of the ascii codes of
    the first 8 hex chars (weighted by 31^j — max term ≈ 3.4e12, sum
    at sf0.01 ≈ 2e17, inside BIGINT) moves if and only if any
    document's bytes differ between the engines' reads."""
    docs = load_table(spark, sf_dir, "documents")
    m = F.md5("text")
    chk = sum(
        (
            F.ascii(F.substring(m, j + 1, 1)).cast("long")
            * F.lit(31 ** j).cast("long")
            for j in range(8)
        ),
        F.lit(0).cast("long"),
    )
    return docs.agg(
        F.count("*").alias("n"),
        F.sum(chk).alias("sum_md5chk"),
    )


registry.register(
    "probe_doc_content",
    q_probe_doc_content,
    """
    SELECT COUNT(*) AS n,
           SUM(
             CAST(ascii(substr(md5(text), 1, 1)) AS BIGINT) * 1
           + CAST(ascii(substr(md5(text), 2, 1)) AS BIGINT) * 31
           + CAST(ascii(substr(md5(text), 3, 1)) AS BIGINT) * 961
           + CAST(ascii(substr(md5(text), 4, 1)) AS BIGINT) * 29791
           + CAST(ascii(substr(md5(text), 5, 1)) AS BIGINT) * 923521
           + CAST(ascii(substr(md5(text), 6, 1)) AS BIGINT) * 28629151
           + CAST(ascii(substr(md5(text), 7, 1)) AS BIGINT) * 887503681
           + CAST(ascii(substr(md5(text), 8, 1)) AS BIGINT) * 27512614111
           ) AS sum_md5chk
    FROM documents
    """,
)


# ---------------------------------------------------------------------------
# stored doubles — quantization primitives
# ---------------------------------------------------------------------------


def q_probe_dec_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """floor(x*100+0.5) cents over every widely-consumed stored double
    (lineitem ×3, orders.o_totalprice, events.value) — identical IEEE
    ops on both engines, so green validates the r8 repo-wide sweep
    from CAST(double AS DECIMAL(18,2)) to floor-cents; RED means the
    stored double bits themselves read differently (escalate)."""

    def cents(c: str):
        return F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")

    li = (
        load_table(spark, sf_dir, "lineitem")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                cents("l_discount") % F.lit(_P)
                + cents("l_quantity") % F.lit(_P)
                + cents("l_extendedprice") % F.lit(_P)
            ).alias("cents_modp"),
        )
        .select(F.lit("lineitem").alias("src"), "n", "cents_modp")
    )
    od = (
        load_table(spark, sf_dir, "orders")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents("o_totalprice") % F.lit(_P)).alias("cents_modp"),
        )
        .select(F.lit("orders").alias("src"), "n", "cents_modp")
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents("value") % F.lit(_P)).alias("cents_modp"),
        )
        .select(F.lit("events").alias("src"), "n", "cents_modp")
    )
    return li.unionByName(od).unionByName(ev)


registry.register(
    "probe_dec_floor",
    q_probe_dec_floor,
    f"""
    SELECT 'lineitem' AS src, COUNT(*) AS n,
           SUM(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) % {_P}
             + CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) % {_P}
             + CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) % {_P})
             AS cents_modp
    FROM lineitem
    UNION ALL
    SELECT 'orders', COUNT(*),
           SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) % {_P})
    FROM orders
    UNION ALL
    SELECT 'events', COUNT(*),
           SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) % {_P})
    FROM events
    """,
)


def q_probe_dec_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST(double AS DECIMAL(18,2)) cents only (the engine-DIVERGENT
    primitive: Spark rounds the shortest decimal string, DuckDB the
    binary value — 0.615d → 0.62 vs 0.61). Expected red whenever the
    generation carries 3+-decimal ties (r7 measured that it does);
    kept as the panel's positive control. No registered query uses
    this primitive after the r8 sweep."""
    li = load_table(spark, sf_dir, "lineitem")

    def cents_cast(c: str):
        return (F.col(c).cast("decimal(18,2)") * 100).cast("long")

    return li.agg(
        F.count("*").alias("n"),
        F.sum(cents_cast("l_discount") % F.lit(_P)).alias("disc_cast_modp"),
        F.sum(cents_cast("l_extendedprice") % F.lit(_P)).alias(
            "price_cast_modp"
        ),
    )


registry.register(
    "probe_dec_cast",
    q_probe_dec_cast,
    f"""
    SELECT COUNT(*) AS n,
           SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
               % {_P}) AS disc_cast_modp,
           SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               % {_P}) AS price_cast_modp
    FROM lineitem
    """,
)
