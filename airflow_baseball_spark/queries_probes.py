"""Driver-environment diagnostic probes, panel v3 (r9).

History: the v1 (r7) and v2 (r8) panels were built on the theory that
the driver's red/green split lived at the data-READ layer (ns→µs
conventions, text encodings, decimal-tie casts). The r8 window
falsified that theory by contradiction — every v2 probe came back red
while same-column, same-primitive real queries stayed green — and the
r9 audit found the actual mechanism one layer up, at the oracle FETCH:
every driver-red ever recorded (19 in r8, 21 samples r5–r8) has a
DuckDB HUGEINT output column, and no green ever did. DuckDB promotes
integer SUMs to HUGEINT (int128); the driver's dtype-preserving fetch
has no int128 container, degrades it to float64, and the value hash
splits on "6.0" vs "6". The v2 probes — all pure-BIGINT SUM surfaces,
chosen deliberately so "a red can never be blamed on float hash
normalization" — were therefore the one shape guaranteed to go red,
measuring their own fetch path instead of the read layer. Full
evidence and the fix (registry._debigint_all, the automatic
CAST-to-BIGINT oracle rewrite) in PERF_NOTES.md r9; local replica in
tests/driver_sim.py, which reproduces the r8 window 50/50 with raw
oracles and 0/50 red with wrapped ones.

The v3 panel validates that finding from the driver's own window and
audits the one data property the r8 reds could not exclude
(duplicate keys making window orders non-total):

====================  ===============================================
probe                  expected / meaning
====================  ===============================================
probe_const_control    GREEN. Constant row, no table reads, under a
panel_const_twin       probe_ name and a normal name. A split between
                       them would prove name-dependent driver
                       handling; both red would mean the comparison
                       itself is broken. (r8 verdict directive #1a.)
probe_hugeint_bare     RED by design (the panel's positive control):
                       oracle keeps a bare SUM(int) — HUGEINT —
                       exempted from the registry rewrite
                       (registry._DEBIGINT_EXEMPT).
probe_hugeint_cast     GREEN: the same aggregation with the oracle
                       SUM cast to BIGINT. bare-RED + cast-GREEN in
                       one window is the HUGEINT mechanism confirmed
                       from the driver's own readings; bare-GREEN
                       would falsify it (and demand a new theory).
probe_dup_keys         count-only duplicate audit on documents,
                       events, orders, lineitem keys (r8 verdict
                       directive #2): COUNT(*) − COUNT(DISTINCT key)
                       per table, value-drift-immune. GREEN means
                       driver data has the same (zero) duplicate-key
                       profile as local generation; RED names which
                       table's keys are non-unique driver-side (the
                       only remaining non-fetch explanation for the
                       old media_shard_plan/interval_union_time reds).
probe_ev_us_round      GREEN (carried from v2, now fetch-fixed):
                       events.ts epoch-µs fingerprint under the
                       round-half-up ns→µs convention. With the fetch
                       layer fixed this finally measures what v2
                       thought it measured: value-level agreement of
                       the timestamp read.
probe_doc_content      GREEN (carried from v2, now fetch-fixed):
                       md5-of-text checksum — byte-level agreement of
                       the documents.text read.
====================  ===============================================

All other v2 probes are retired: their questions (trunc-vs-round,
byte-vs-char lengths, grain ladders, decimal-tie casts) were either
answered by the r9 root cause or are re-askable on demand; keeping 13
always-red rows in the 50-slot window was costing the never-sampled
backlog its attestation bandwidth (r8 verdict directive #5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_baseball_spark import registry
from airflow_baseball_spark.schemas import load_table

_P = 1_000_003  # prime modulus for order-invariant value checksums


# ---------------------------------------------------------------------------
# control pair: constant query under probe_ and normal names
# ---------------------------------------------------------------------------


def _const_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(1).select(
        F.lit(42).cast("long").alias("answer"),
        F.lit(0.5).cast("double").alias("frac"),
        F.lit("control").alias("tag"),
    )


_CONST_SQL = """
    SELECT CAST(42 AS BIGINT) AS answer,
           CAST(0.5 AS DOUBLE) AS frac,
           'control' AS tag
    """

registry.register("probe_const_control", _const_control, _CONST_SQL)
registry.register("panel_const_twin", _const_control, _CONST_SQL)


# ---------------------------------------------------------------------------
# HUGEINT mechanism pair: bare SUM(int) vs CAST AS BIGINT
# ---------------------------------------------------------------------------


def _linenumber_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n"),
        F.sum("l_linenumber").cast("long").alias("s"),
    )


registry.register(
    "probe_hugeint_bare",
    _linenumber_sum,
    # bare SUM(INTEGER) -> HUGEINT; name is in registry._DEBIGINT_EXEMPT
    # so the rewrite leaves it. EXPECTED RED in the driver window.
    """
    SELECT COUNT(*) AS n, SUM(l_linenumber) AS s
    FROM lineitem
    """,
)

registry.register(
    "probe_hugeint_cast",
    _linenumber_sum,
    """
    SELECT COUNT(*) AS n, CAST(SUM(l_linenumber) AS BIGINT) AS s
    FROM lineitem
    """,
)


# ---------------------------------------------------------------------------
# duplicate-key audit (drift-immune counts)
# ---------------------------------------------------------------------------


def q_probe_dup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) − COUNT(DISTINCT key) per table — pure counts, immune
    to any value-level drift: green means both engines read the same
    key multiset; a red means they disagree on the data itself. The
    VALUES also audit the generation: doc_id / event_id / o_orderkey
    are unique (0), while the lineitem composite (l_orderkey,
    l_linenumber) is KNOWN non-unique in the standard generation
    (14,168 duplicate rows at sf0.01 — an r9 discovery by this probe;
    tests/test_driver_sim.py pins the profile and records the
    tie-order-insensitivity audit of its two window consumers)."""
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    d1 = docs.agg((F.count("*") - F.countDistinct("doc_id")).alias("dup_doc_id"))
    d2 = ev.agg((F.count("*") - F.countDistinct("event_id")).alias("dup_event_id"))
    d3 = orders.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_orderkey")
    )
    d4 = li.agg(
        (
            F.count("*") - F.countDistinct("l_orderkey", "l_linenumber")
        ).alias("dup_lineitem_key")
    )
    return d1.crossJoin(d2).crossJoin(d3).crossJoin(d4)


registry.register(
    "probe_dup_keys",
    q_probe_dup_keys,
    """
    SELECT
      (SELECT COUNT(*) - COUNT(DISTINCT doc_id) FROM documents)
        AS dup_doc_id,
      (SELECT COUNT(*) - COUNT(DISTINCT event_id) FROM events)
        AS dup_event_id,
      (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
        AS dup_orderkey,
      (SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
         FROM lineitem) AS dup_lineitem_key
    """,
)


# ---------------------------------------------------------------------------
# carried v2 probes (fetch-fixed): timestamp + text content reads
# ---------------------------------------------------------------------------


def q_probe_ev_us_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts fingerprint at µs grain — the engine's actual read
    (load_table, round-half-up on the ns branch) as count +
    order-invariant mod-prime checksum. Green attests value-level
    agreement of the timestamp read under the r8 round-half-up
    convention; red now genuinely means the engines read different
    µs values (the fetch layer is fixed)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    return ev.agg(
        F.count("*").alias("n"),
        F.sum(us % F.lit(_P)).alias("sum_us_modp"),
    )


registry.register(
    "probe_ev_us_round",
    q_probe_ev_us_round,
    f"""
    SELECT COUNT(*) AS n,
           SUM(((epoch_ns(ts) + 500) // 1000) % {_P}) AS sum_us_modp
    FROM events
    """,
)


def q_probe_doc_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text CONTENT checksum: md5 is byte-defined and
    engine-portable, so an order-invariant sum of the ascii codes of
    the first 8 hex chars (weighted by 31^j — max term ≈ 3.4e12, sum
    at sf0.01 ≈ 2e17, inside BIGINT) moves iff any document's bytes
    differ between the engines' reads."""
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
