"""Streaming + event-time queries over ``events``, each drained via
Trigger.AvailableNow so the driver receives a static DataFrame it can
hash against the DuckDB oracle (the streaming result must equal the
batch SQL over the same input — the strongest check a streaming op can
get).

Event-time surface parity: the reference schedules work by event time
(game_time − 15 min, `dags/031_schedule_dag_for_get_today_line_up.py:36-57`)
and keys facts by game_date; here that becomes watermarked windows and
stateful sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from airflow_baseball_spark import registry
from airflow_baseball_spark.operators.sessionize import sessionize
from airflow_baseball_spark.schemas import load_table
from airflow_baseball_spark.streaming import jobs

_SESSION_SQL = """
    WITH o AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sess
      FROM o
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100 AS total_value
    FROM s GROUP BY user_id, sess
"""

_WINDOWED_SQL = """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
"""


def q_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jobs.run_windowed_counts_available_now(spark, sf_dir)


registry.register("stream_windowed_counts", q_stream_windowed_counts, _WINDOWED_SQL)


# Hopping 2h windows sliding by 1h: every event lands in exactly two
# windows, which the batch oracle reproduces by unnesting a [0,1] hop
# offset — streaming overlap semantics checked against plain SQL.
_HOPPING_SQL = """
    SELECT date_trunc('hour', ts) - h.k * INTERVAL 1 HOUR AS window_start,
           event_type,
           COUNT(*) AS n_events
    FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k) h
    GROUP BY 1, 2
"""


def q_stream_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jobs.run_hopping_counts_available_now(spark, sf_dir)


registry.register("stream_hopping_counts", q_stream_hopping_counts, _HOPPING_SQL)


def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jobs.run_sessionize_available_now(spark, sf_dir)


registry.register("stream_sessionize", q_stream_sessionize, _SESSION_SQL)


def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_table(spark, sf_dir, "events"))


registry.register("sessionize_batch", q_sessionize_batch, _SESSION_SQL)


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jobs.run_stream_dedup_available_now(spark, sf_dir)


registry.register(
    "stream_dedup",
    q_stream_dedup,
    "SELECT DISTINCT user_id, event_type FROM events",
)


def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jobs.run_stream_static_join_available_now(spark, sf_dir)


registry.register(
    "stream_static_join",
    q_stream_static_join,
    """
    SELECT n_name, COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events JOIN nation ON user_id % 25 = n_nationkey
    GROUP BY n_name
    """,
)


def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured projection: pull a typed field out of the JSON
    ``props`` column. ``from_json`` with an explicit schema parses each
    document once into a typed struct (JVM-side, no Python UDF) — 2.5×
    faster than per-path ``get_json_object``, and the win multiplies
    when more than one field is extracted."""
    ev = load_table(spark, sf_dir, "events")
    props = F.from_json("props", StructType([StructField("k", LongType())]))
    return ev.select(
        "event_id",
        "event_type",
        props["k"].alias("k"),
    )


registry.register(
    "events_json_extract",
    q_events_json_extract,
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)


def q_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jobs.run_stream_upsert_available_now(spark, sf_dir)


# oracle = batch "latest event per user"; ORDER BY mirrors
# upsert_dataframe's deterministic total order exactly (version col
# first, then the remaining non-key columns in frame order, all
# DESC NULLS LAST)
registry.register(
    "stream_upsert",
    q_stream_upsert,
    """
    SELECT event_id, ts, user_id, event_type, value, props FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id
        ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST,
                 event_type DESC NULLS LAST, value DESC NULLS LAST,
                 props DESC NULLS LAST
      ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (click→purchase within
    30 min, per user), drained via AvailableNow; oracle is the plain
    batch interval join over the same events."""
    return jobs.run_stream_stream_join_available_now(spark, sf_dir)


registry.register(
    "stream_stream_join",
    q_stream_stream_join,
    """
    SELECT c.user_id, c.ts AS click_ts, p.ts AS purchase_ts
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      USING (user_id)
    WHERE p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)


def q_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record quarantine: the events feed is
    deterministically corrupted (every event_id % 37 == 0 loses its
    JSON suffix — the same mangle on both engines, so the defect set
    is identical), parsed PERMISSIVE-ly, and rolled up per event_type
    into parsed/quarantined counts plus the sum of the extracted
    field over GOOD rows only. This is the ingest-boundary pattern:
    never drop rows silently — route unparseable ones to a counted
    quarantine while typed extraction proceeds on the rest.
    ``from_json`` yields NULL for invalid documents (JVM-side parse,
    no Python UDF); the oracle's json_valid() reproduces the split."""
    ev = load_table(spark, sf_dir, "events")
    mangled = F.when(
        F.col("event_id") % 37 == 0,
        F.expr("substring(props, 1, length(props) - 2)"),
    ).otherwise(F.col("props"))
    parsed = F.from_json(
        mangled, StructType([StructField("k", LongType())])
    )
    return (
        ev.select("event_type", parsed["k"].alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_total"),
            F.count("k").alias("n_parsed"),
            F.count(F.when(F.col("k").isNull(), 1)).alias("n_quarantined"),
            F.sum("k").cast("long").alias("k_sum"),
        )
    )


registry.register(
    "corrupt_quarantine",
    q_corrupt_quarantine,
    """
    WITH m AS (
      SELECT event_type,
             CASE WHEN event_id % 37 = 0
                  THEN SUBSTRING(props, 1, LENGTH(props) - 2)
                  ELSE props END AS mp
      FROM events
    ),
    p AS (
      SELECT event_type,
             CASE WHEN json_valid(mp)
                  THEN CAST(json_extract_string(mp, '$.k') AS BIGINT)
             END AS k
      FROM m
    )
    SELECT event_type,
           COUNT(*) AS n_total,
           COUNT(k) AS n_parsed,
           COUNT(CASE WHEN k IS NULL THEN 1 END) AS n_quarantined,
           CAST(SUM(k) AS BIGINT) AS k_sum
    FROM p
    GROUP BY event_type
    """,
)


def q_stream_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of corrupt_quarantine: the same deterministic
    mangle + PERMISSIVE parse running as a Structured Streaming job
    (complete-mode drain), proving the quarantine pattern holds
    across micro-batches with |types|-bounded state. Oracle = the
    batch SQL — streaming and batch MUST agree on a bounded input."""
    return jobs.run_stream_quarantine_available_now(spark, sf_dir)


registry.register(
    "stream_quarantine",
    q_stream_quarantine,
    """
    WITH m AS (
      SELECT event_type,
             CASE WHEN event_id % 37 = 0
                  THEN SUBSTRING(props, 1, LENGTH(props) - 2)
                  ELSE props END AS mp
      FROM events
    ),
    p AS (
      SELECT event_type,
             CASE WHEN json_valid(mp)
                  THEN CAST(json_extract_string(mp, '$.k') AS BIGINT)
             END AS k
      FROM m
    )
    SELECT event_type,
           COUNT(*) AS n_total,
           COUNT(k) AS n_parsed,
           COUNT(CASE WHEN k IS NULL THEN 1 END) AS n_quarantined,
           CAST(SUM(k) AS BIGINT) AS k_sum
    FROM p
    GROUP BY event_type
    """,
)


def q_stream_windowed_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct active users per day window as a streaming job:
    watermarked dropDuplicates on (window, user) + ordinary count —
    the bounded-state streaming distinct (COUNT(DISTINCT) is
    unsupported in streaming aggs and HLL is approximate). Oracle =
    plain batch COUNT(DISTINCT) per day."""
    return jobs.run_windowed_users_available_now(spark, sf_dir)


registry.register(
    "stream_windowed_users",
    q_stream_windowed_users,
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           COUNT(DISTINCT user_id) AS n_active_users
    FROM events
    GROUP BY 1
    """,
)


def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions via the NATIVE ``session_window`` streaming aggregate
    — the declarative counterpart of stream_sessionize's custom
    applyInPandasWithState job. Three implementations (batch islands,
    custom state, native operator) now check against the ONE session
    oracle, pinning the gap semantics from three directions."""
    return jobs.run_session_window_available_now(spark, sf_dir)


registry.register(
    "stream_session_window", q_stream_session_window, _SESSION_SQL
)


def q_stream_foreachbatch_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MV through foreachBatch partials + compaction —
    the object-store sink path (see streaming/jobs.py); oracle is the
    plain batch aggregate, so every micro-batch's partial must land
    exactly once."""
    return jobs.run_foreachbatch_mv(spark, sf_dir)


registry.register(
    "stream_foreachbatch_mv",
    q_stream_foreachbatch_mv,
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS DOUBLE) / 100.0 AS total_value
    FROM events GROUP BY 1
    """,
)


def q_stream_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed aggregate + static top-k post-pass (rank
    functions can't run inside streaming aggs — the drain boundary is
    where they belong); oracle is the equivalent batch rank."""
    return jobs.run_window_topk_available_now(spark, sf_dir)


registry.register(
    "stream_window_topk",
    q_stream_window_topk,
    """
    WITH agg AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
             event_type,
             SUM(CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type,
           CAST(v AS DOUBLE) / 100.0 AS revenue,
           CAST(rk AS BIGINT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                                   ORDER BY v DESC, event_type) AS rk
      FROM agg
    ) WHERE rk <= 3
    """,
)


def q_stream_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per day window as a streaming job
    whose state is an HLL register sketch — ≤256 state rows per open
    window vs one-per-user for the exact form (stream_windowed_users
    pins the exact semantics; this pins the constant-state scale
    path). Oracle: batch SQL rebuilding the identical registers per
    day and applying the same estimate formula — the stream must land
    bit-for-bit on the batch sketch."""
    return jobs.run_hll_windowed_available_now(spark, sf_dir)


def _stream_hll_sql() -> str:
    from airflow_baseball_spark.queries_sketch import (
        _hex_int_sql,
        _hll_est_sql,
        _HLL_H,
        _HLL_POW_SQL,
    )

    return f"""
    WITH base AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
             {_hex_int_sql(_HLL_H, 1, 2)} AS reg,
             CASE WHEN {_hex_int_sql(_HLL_H, 3, 8)} = 0 THEN 33
                  ELSE 33 - length(bin({_hex_int_sql(_HLL_H, 3, 8)})) END
               AS rho
      FROM events
    ),
    regs AS (
      SELECT window_start, reg, MAX(rho) AS mrho FROM base GROUP BY 1, 2
    ),
    per_day AS (
      SELECT window_start, COUNT(*) AS n_regs,
             SUM(({_HLL_POW_SQL})[mrho]) AS z FROM regs GROUP BY 1
    )
    SELECT window_start,
           CAST(n_regs AS BIGINT) AS n_regs,
           CAST(256 - n_regs AS BIGINT) AS v_zero,
           {_hll_est_sql("n_regs", "z")} AS hll_est
    FROM per_day
    """


registry.register("stream_hll_users", q_stream_hll_users, _stream_hll_sql())


# ---------------------------------------------------------------------------
# Late-arrival audit: what would a watermark policy drop?
# ---------------------------------------------------------------------------

_LATE_BLOCK = 1024


def q_late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-policy planning for the streaming jobs above: replay
    the event log in ARRIVAL order (event_id) and measure, per event
    type, how many events arrive with event-time more than 1 hour
    behind the running event-time high-water mark — exactly the rows
    `withWatermark("ts", "1 hour")` would decline to update state
    for. Run this before picking a lateness bound, not after losing
    data to one.

    Scale shape: the arrival-order running max is the classic
    sequential trap; it parallelizes with the two-level prefix scan
    every packing op here uses — per-block (1024 ids) maxima, a
    tiny block-table prefix max, then an in-block EXCLUSIVE window
    max combined with the prior-blocks offset. Everything is integer
    epoch-micros (unix_micros — session-TZ-proof)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("tm"),
        F.expr(f"event_id DIV {_LATE_BLOCK}").alias("blk"),
    )
    blocks = ev.groupBy("blk").agg(F.max("tm").alias("blk_max"))
    wb = Window.orderBy("blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prior = blocks.select(
        "blk", F.max("blk_max").over(wb).alias("prior_max")
    )
    wi = Window.partitionBy("blk").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    staged = (
        ev.join(F.broadcast(prior), "blk")
        .withColumn("in_blk_max", F.max("tm").over(wi))
        .withColumn(
            "hwm", F.greatest(
                F.coalesce(F.col("prior_max"), F.lit(-1)),
                F.coalesce(F.col("in_blk_max"), F.lit(-1)),
            )
        )
        .withColumn(
            "late_us",
            F.when(
                F.col("hwm") >= 0, F.greatest(F.col("hwm") - F.col("tm"), F.lit(0))
            ).otherwise(F.lit(0)),
        )
    )
    hour_us = 3_600_000_000
    return staged.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("late_us") > 0).cast("long")).alias("n_out_of_order"),
        F.sum((F.col("late_us") > hour_us).cast("long")).alias(
            "n_dropped_1h"
        ),
        F.expr("MAX(late_us) DIV 1000000").alias("max_late_seconds"),
    )


registry.register(
    "late_arrival_audit",
    q_late_arrival_audit,
    f"""
    WITH ev AS (
      SELECT event_id, event_type, epoch_us(ts) AS tm,
             event_id // {_LATE_BLOCK} AS blk
      FROM events
    ),
    blocks AS (SELECT blk, MAX(tm) AS blk_max FROM ev GROUP BY 1),
    prior AS (
      SELECT blk,
             MAX(blk_max) OVER (ORDER BY blk ROWS BETWEEN UNBOUNDED
                                PRECEDING AND 1 PRECEDING) AS prior_max
      FROM blocks
    ),
    staged AS (
      SELECT e.event_type, e.tm,
             GREATEST(
               COALESCE(p.prior_max, -1),
               COALESCE(MAX(e.tm) OVER (PARTITION BY e.blk
                        ORDER BY e.event_id ROWS BETWEEN UNBOUNDED
                        PRECEDING AND 1 PRECEDING), -1)
             ) AS hwm
      FROM ev e JOIN prior p ON e.blk = p.blk
    ),
    late AS (
      SELECT event_type,
             CASE WHEN hwm >= 0 THEN GREATEST(hwm - tm, 0)
                  ELSE 0 END AS late_us
      FROM staged
    )
    SELECT event_type, COUNT(*) AS n_events,
           SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)
             AS n_out_of_order,
           SUM(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END)
             AS n_dropped_1h,
           MAX(late_us) // 1000000 AS max_late_seconds
    FROM late GROUP BY 1
    """,
)
