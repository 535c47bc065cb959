"""LLM-pipeline + lifecycle queries: PII redaction, SCD2 history
build, GPT-style sequence packing, int8 embedding quantization, the
G3 event-time trigger analog, calendar gap-fill, snapshot-diff CDC,
funnel analysis, and retention cohorts — each with a DuckDB oracle
twin over the driver testdata.

Type alignment notes (driver hashes values with columns sorted by
name): Spark ``size``/``length`` return INT while DuckDB ``len``/
``length`` return BIGINT, and DuckDB ``SUM(BIGINT)`` widens to
HUGEINT — every such column is cast explicitly on the oracle side so
schemas agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_baseball_spark import registry
from airflow_baseball_spark.functions.scalar import dec_portable
from airflow_baseball_spark.functions.scalar import round6_portable as _r6
from airflow_baseball_spark.operators.cdc import snapshot_diff
from airflow_baseball_spark.operators.gapfill import gap_fill
from airflow_baseball_spark.operators.scd import scd2
from airflow_baseball_spark.pipelines.orchestration import event_time_triggers
from airflow_baseball_spark.schemas import load_table
from airflow_baseball_spark.text import analysis
from airflow_baseball_spark.text import pii
from airflow_baseball_spark.text.packing import pack_blocks
from airflow_baseball_spark.text.quantize import quantize_summary

# ---------------------------------------------------------------------------
# PII redaction (training-data scrub pass)
# ---------------------------------------------------------------------------

# Deterministic PII injection: the synthetic documents contain no real
# PII, so both engines append identical synthetic markers from doc_id
# arithmetic before detecting/redacting them — the differential test
# then exercises real patterns on non-trivial positions.
_SPARK_INJECT = (
    "concat(text,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' contact u', CAST(doc_id AS STRING), '@example.com') ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN ' call 010-1234-5678' ELSE '' END,"
    " CASE WHEN doc_id % 7 = 0 THEN concat(' see https://ex.org/d/', CAST(doc_id AS STRING)) ELSE '' END)"
)
_DUCK_INJECT = (
    "text ||"
    " CASE WHEN doc_id % 3 = 0 THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||"
    " CASE WHEN doc_id % 5 = 0 THEN ' call 010-1234-5678' ELSE '' END ||"
    " CASE WHEN doc_id % 7 = 0 THEN ' see https://ex.org/d/' || CAST(doc_id AS VARCHAR) ELSE '' END"
)


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub pass over documents: per-class match counts + fingerprint
    of the redacted text. In-row regex only — the 100 TB cost is the
    scan (see text/pii.py)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_SPARK_INJECT).alias("t")
    )
    return docs.select(
        "doc_id",
        pii.pii_count(F.col("t"), "url").alias("n_url"),
        pii.pii_count(F.col("t"), "email").alias("n_email"),
        pii.pii_count(F.col("t"), "phone").alias("n_phone"),
        F.md5(pii.redact(F.col("t"))).alias("redacted_md5"),
        F.length(pii.redact(F.col("t"))).alias("redacted_len"),
    )


registry.register(
    "pii_redact",
    q_pii_redact,
    f"""
    WITH d AS (SELECT doc_id, {_DUCK_INJECT} AS t FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{pii.PII_PATTERNS["url"]}')) AS INT) AS n_url,
           CAST(len(regexp_extract_all(t, '{pii.PII_PATTERNS["email"]}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(t, '{pii.PII_PATTERNS["phone"]}')) AS INT) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '{pii.PII_PATTERNS["url"]}', '[PII]', 'g'),
               '{pii.PII_PATTERNS["email"]}', '[PII]', 'g'),
               '{pii.PII_PATTERNS["phone"]}', '[PII]', 'g')) AS redacted_md5,
           CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
               '{pii.PII_PATTERNS["url"]}', '[PII]', 'g'),
               '{pii.PII_PATTERNS["email"]}', '[PII]', 'g'),
               '{pii.PII_PATTERNS["phone"]}', '[PII]', 'g')) AS INT) AS redacted_len
    FROM d
    """,
)


# ---------------------------------------------------------------------------
# SCD2 history build (the history the reference's upserts destroy)
# ---------------------------------------------------------------------------


def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension from the event log: per user, runs of equal
    event_type become versioned validity intervals (operators/scd.py).
    Bounded to user_id < 50 to keep the driver collect small; the
    operator itself is key-partitioned and unbounded."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return scd2(ev, key="user_id", attr="event_type", ts="ts", tiebreak="event_id")


registry.register(
    "scd2_build",
    q_scd2_build,
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events WHERE user_id < 50
    ),
    starts AS (
      SELECT user_id, event_type, ts AS valid_from,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version_n
      FROM ordered WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY version_n) AS valid_to,
           version_n
    FROM starts
    """,
)


# ---------------------------------------------------------------------------
# GPT-style sequence packing (concat-then-chunk block assignment)
# ---------------------------------------------------------------------------


def q_token_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return pack_blocks(docs, block_tokens=256, shards=8)


registry.register(
    "token_pack",
    q_token_pack,
    """
    WITH t AS (
      SELECT doc_id, doc_id % 8 AS shard,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
      FROM documents
    ),
    o AS (
      SELECT *,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS start_offset
      FROM t
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens, start_offset,
           CAST(floor(start_offset / 256.0) AS BIGINT) AS first_block,
           CAST(floor((start_offset + n_tokens - 1) / 256.0) AS BIGINT) AS last_block,
           CAST(floor((start_offset + n_tokens - 1) / 256.0)
                - floor(start_offset / 256.0) + 1 AS BIGINT) AS blocks_spanned
    FROM o
    """,
)


# ---------------------------------------------------------------------------
# int8 embedding quantization
# ---------------------------------------------------------------------------


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return quantize_summary(emb)


registry.register(
    "embedding_quantize",
    q_embedding_quantize,
    """
    WITH b AS (
      SELECT vec_id,
             embedding,
             list_max(list_transform(embedding, x -> abs(x))) AS amax
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, embedding,
             CASE WHEN amax > 0
                  THEN CAST(127.0 AS DOUBLE) / CAST(amax AS DOUBLE)
                  ELSE CAST(0.0 AS DOUBLE) END AS scale
      FROM b
    ),
    q AS (
      SELECT vec_id, scale,
             list_transform(embedding,
                            x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS qv
      FROM s
    )
    SELECT vec_id,
           ROUND(scale, 6) AS scale_r,
           CAST(list_sum(qv) AS BIGINT) AS sum_q,
           CAST(len(list_filter(qv, x -> x <> 0)) AS INT) AS nnz
    FROM q
    """,
)


# ---------------------------------------------------------------------------
# Calendar gap-fill + forward fill (time-series densification)
# ---------------------------------------------------------------------------


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-user value totals densified to every day in each
    user's active range, gaps forward-filled
    (operators/gapfill.py)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id", F.to_date(F.col("ts")).alias("d"), F.col("value")
        )
        .groupBy("user_id", "d")
        .agg(
            F.sum(dec_portable("value", 18, 2))
            .cast("double")
            .alias("v")
        )
    )
    return gap_fill(daily, key="user_id", date_col="d", value_cols=["v"])


registry.register(
    "gap_fill",
    q_gap_fill,
    """
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1
    ),
    spine AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ),
    j AS (
      SELECT s.user_id, s.d, daily.v
      FROM spine s LEFT JOIN daily ON s.user_id = daily.user_id AND s.d = daily.d
    )
    SELECT user_id, d,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
           v IS NOT NULL AS was_present
    FROM j
    """,
)


# ---------------------------------------------------------------------------
# G3 — dynamic event-time trigger (031_schedule_dag analog)
# ---------------------------------------------------------------------------

_RUN_TS = "2024-01-15 12:00:00"


def q_event_triggers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """today_games derived from events (per-day, per-team first event
    = game time); triggers fire 15 min earlier; times already
    scheduled before Jan 5 are anti-joined away (the DagRun.find
    idempotency guard). See pipelines/orchestration.py
    ``event_time_triggers``."""
    ev = load_table(spark, sf_dir, "events")
    today = (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("d"),
            (F.col("user_id") % 10).alias("away_team"),
            "ts",
        )
        .groupBy("d", "away_team")
        .agg(F.min("ts").alias("game_time"))
    )
    already = today.filter(
        F.col("game_time") < F.lit("2024-01-05").cast("timestamp")
    ).select(
        (F.col("game_time") - F.expr("INTERVAL 15 MINUTES")).alias("trigger_time")
    )
    return event_time_triggers(
        today, run_ts=_RUN_TS, lead_minutes=15, already_scheduled=already
    )


registry.register(
    "event_triggers",
    q_event_triggers,
    f"""
    WITH games AS (
      SELECT date_trunc('day', ts) AS d, user_id % 10 AS away_team,
             min(ts) AS game_time
      FROM events GROUP BY 1, 2
    ),
    trig AS (
      SELECT DISTINCT game_time - INTERVAL 15 MINUTE AS trigger_time FROM games
    ),
    already AS (
      SELECT DISTINCT game_time - INTERVAL 15 MINUTE AS trigger_time
      FROM games WHERE game_time < TIMESTAMP '2024-01-05'
    )
    SELECT t.trigger_time,
           t.trigger_time <= TIMESTAMP '{_RUN_TS}' AS due
    FROM trig t
    WHERE NOT EXISTS (SELECT 1 FROM already a WHERE a.trigger_time = t.trigger_time)
    """,
)


# ---------------------------------------------------------------------------
# Snapshot diff (CDC extract between two table versions)
# ---------------------------------------------------------------------------


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic snapshots of orders (keys %11==0 exist only
    in the new version, %13==0 only in the old, %7==0 changed price)
    diffed by operators/cdc.py; output is per-class counts + value
    checksum, which pins the classification of every key."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = orders.filter(F.col("o_orderkey") % 11 != 0)
    new = orders.filter(F.col("o_orderkey") % 13 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.5
        ).otherwise(F.col("o_totalprice")),
    )
    diff = snapshot_diff(old, new, keys=["o_orderkey"])
    return diff.groupBy("change_type").agg(
        F.count("*").alias("n"),
        F.sum(dec_portable("o_totalprice", 18, 2))
        .cast("double")
        .alias("total"),
    )


registry.register(
    "snapshot_diff",
    q_snapshot_diff,
    """
    WITH old AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 11 <> 0
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.5
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 13 <> 0
    ),
    diff AS (
      SELECT COALESCE(new.o_orderkey, old.o_orderkey) AS o_orderkey,
             CASE WHEN old.o_orderkey IS NULL THEN 'inserted'
                  WHEN new.o_orderkey IS NULL THEN 'deleted'
                  WHEN old.o_totalprice IS DISTINCT FROM new.o_totalprice
                    OR old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
                  THEN 'updated'
                  ELSE 'unchanged' END AS change_type,
             COALESCE(new.o_totalprice, old.o_totalprice) AS o_totalprice
      FROM old FULL OUTER JOIN new USING (o_orderkey)
    )
    SELECT change_type, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM diff GROUP BY change_type
    """,
)


# ---------------------------------------------------------------------------
# Funnel analysis (ordered event-sequence progression)
# ---------------------------------------------------------------------------


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase progression: per user, the first
    qualifying event of each stage must come strictly after the
    previous stage's. Three key-partitioned aggregations, each joined
    forward — no windows over the full log, no per-user state."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_click")))
    )


registry.register(
    "funnel",
    q_funnel,
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_click
    """,
)


# ---------------------------------------------------------------------------
# Retention cohorts (weekly cohort x week-offset active users)
# ---------------------------------------------------------------------------


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-active week,
    counted distinct per week offset. Two key-partitioned aggs and a
    broadcast-sized cohort join — at 100 TB the per-user first-week
    table is |users| rows, the only state that persists."""
    ev = load_table(spark, sf_dir, "events")
    wk = F.to_date(F.date_trunc("week", F.col("ts")))
    active = ev.select("user_id", wk.alias("wk")).distinct()
    first = active.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        active.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


registry.register(
    "retention_cohorts",
    q_retention_cohorts,
    """
    WITH active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ),
    f AS (
      SELECT user_id, min(wk) AS cohort_week FROM active GROUP BY user_id
    )
    SELECT cohort_week,
           CAST((wk - cohort_week) // 7 AS INT) AS week_offset,
           COUNT(DISTINCT active.user_id) AS n_active
    FROM active JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# Table profiling (ANALYZE-style column stats, one scan)
# ---------------------------------------------------------------------------


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column stats for orders in a single pass
    (operators/profile.py); columns chosen for cross-engine-stable
    string forms (int, string, date)."""
    from airflow_baseball_spark.operators.profile import profile_table

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.to_date("o_orderdate")
    )
    return profile_table(
        orders, ["o_custkey", "o_orderstatus", "o_orderdate"]
    )


registry.register(
    "table_profile",
    q_table_profile,
    """
    SELECT 'o_custkey' AS column_name,
           COUNT(o_custkey) AS n_nonnull,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_val,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           CAST(MIN(o_orderstatus) AS VARCHAR),
           CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(o_orderdate),
           COUNT(DISTINCT o_orderdate),
           CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR),
           CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR)
    FROM orders
    """,
)


# ---------------------------------------------------------------------------
# Point-in-time (feature-store) join against the SCD2 dimension
# ---------------------------------------------------------------------------


def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free label enrichment: every purchase event picks the
    user's event_type-run version valid AT its timestamp from the SCD2
    history — the feature-store as-of pattern (operators/scd.py).
    Same user_id < 50 bound as scd2_build."""
    from airflow_baseball_spark.operators.scd import point_in_time_join

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    dim = scd2(ev, key="user_id", attr="event_type", ts="ts", tiebreak="event_id")
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    out = point_in_time_join(facts, dim, key="user_id", fact_ts="ts")
    return out.select(
        "user_id",
        "event_id",
        "ts",
        F.col("event_type").alias("state_at_ts"),
        F.col("version_n").cast("long").alias("version_n"),
    )


registry.register(
    "pit_join",
    q_pit_join,
    """
    WITH ev AS (SELECT * FROM events WHERE user_id < 50),
    ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM ev
    ),
    starts AS (
      SELECT user_id, event_type, ts AS valid_from,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version_n
      FROM ordered WHERE prev IS NULL OR prev <> event_type
    ),
    dim AS (
      SELECT user_id, event_type, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY version_n) AS valid_to,
             version_n
      FROM starts
    )
    SELECT f.user_id, f.event_id, f.ts,
           d.event_type AS state_at_ts,
           CAST(d.version_n AS BIGINT) AS version_n
    FROM (SELECT user_id, event_id, ts FROM ev WHERE event_type = 'purchase') f
    JOIN dim d ON f.user_id = d.user_id
              AND d.valid_from <= f.ts
              AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
)


def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel with EXISTS-chain semantics: a user reaches
    stage 2 if ANY click falls within 24h after ANY of their views,
    and stage 3 if ANY purchase falls within 24h after ANY qualifying
    click. A greedy first-event anchor (min view, min in-window click)
    looks simpler but UNDERCOUNTS: a user whose first view converts
    nothing but whose later view→click→purchase chain qualifies would
    be dropped. For the unbounded funnel min-anchoring is lossless;
    with a bound it is not — hence the different construction here.

    Scale shape: two per-user band joins (clicks×views, then
    purchases×qualifying clicks), each keyed on user_id so the fanout
    is bounded by one user's activity, never the log; distinct
    collapses multi-witness chains before counting. At 100 TB the
    band join buckets by (user, day) first so a bot user can't go
    quadratic — the asof/range-join playbook."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    day = F.expr("INTERVAL 24 HOURS")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vt")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ct")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pt")
    )
    qual_clicks = (
        clicks.join(views, "user_id")
        .filter((F.col("ct") > F.col("vt")) & (F.col("ct") <= F.col("vt") + day))
        .select("user_id", "ct")
        .distinct()
    )
    qual_purch = (
        purchases.join(qual_clicks, "user_id")
        .filter((F.col("pt") > F.col("ct")) & (F.col("pt") <= F.col("ct") + day))
        .select("user_id")
        .distinct()
    )
    # countDistinct (not distinct().count()) so a NULL user_id is
    # ignored exactly like the oracle's COUNT(DISTINCT user_id) —
    # distinct() keeps a NULL row that count(*) would then count
    return (
        views.agg(F.countDistinct("user_id").alias("n_view"))
        .crossJoin(
            qual_clicks.agg(F.countDistinct("user_id").alias("n_click_24h"))
        )
        .crossJoin(
            qual_purch.agg(F.countDistinct("user_id").alias("n_purchase_24h"))
        )
    )


registry.register(
    "funnel_windowed",
    q_funnel_windowed,
    """
    WITH qc AS (
      SELECT DISTINCT c.user_id, c.ts AS ct
      FROM events c JOIN events v
        ON c.user_id = v.user_id
       AND c.event_type = 'click' AND v.event_type = 'view'
       AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR
    ),
    qp AS (
      SELECT DISTINCT p.user_id
      FROM events p JOIN qc
        ON p.user_id = qc.user_id
       AND p.event_type = 'purchase'
       AND p.ts > qc.ct AND p.ts <= qc.ct + INTERVAL 24 HOUR
    )
    SELECT (SELECT COUNT(DISTINCT user_id) FROM events
            WHERE event_type = 'view') AS n_view,
           (SELECT COUNT(DISTINCT user_id) FROM qc) AS n_click_24h,
           (SELECT COUNT(*) FROM qp) AS n_purchase_24h
    """,
)


def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent NON-purchase event within the preceding hour. One user-key
    window with an ignore-nulls running last — the non-purchase
    carrier rides the same (ts, event_id)-ordered sort every other
    per-user window op uses, so no self-join of the log against
    itself and no second shuffle. Purchases with no touch inside the
    hour report a NULL channel (unattributed), which the aggregation
    surfaces as its own row."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type") != "purchase",
            F.struct("ts", "event_type"),
        ),
        ignorenulls=True,
    ).over(w)
    hour = F.expr("INTERVAL 1 HOUR")
    return (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .withColumn(
            "channel",
            F.when(
                F.col("touch").isNotNull()
                & (F.col("touch.ts") >= F.col("ts") - hour),
                F.col("touch.event_type"),
            ),
        )
        .groupBy("channel")
        .agg(F.count("*").alias("n_purchases"))
    )


registry.register(
    "last_touch_attribution",
    q_last_touch_attribution,
    """
    WITH touched AS (
      SELECT user_id, event_id, event_type, ts,
             LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN ts END
                        IGNORE NULLS) OVER w AS touch_ts,
             LAST_VALUE(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER w AS touch_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT CASE WHEN touch_ts IS NOT NULL
                 AND touch_ts >= ts - INTERVAL 1 HOUR
                THEN touch_type END AS channel,
           COUNT(*) AS n_purchases
    FROM touched
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# Feature hashing (the hashing trick) + out-of-fold target encoding
# ---------------------------------------------------------------------------

_FEATHASH_DIM = 64


def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization: tokens hash into a fixed
    64-bucket space; the per-doc sparse vector is emitted LONG-format
    (doc_id, bucket, n) — the representation that shuffles and joins
    well, and the only one the driver hash can canonicalize (array
    cells are unhashable, the kmeans_fit lesson).

    Scale: explode + one (doc, bucket) shuffle with map-side combine;
    dimensionality is fixed at D buckets regardless of vocabulary, the
    whole point of the trick. The md5-derived bucket is engine-exact:
    h/2^32*D with h < 2^32 is exact double arithmetic, so Spark and
    DuckDB floor identical values."""
    from airflow_baseball_spark.operators.sampling import hash_unit

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = F.explode(F.split(F.col("text"), " ")).alias("tok")
    toks = docs.select("doc_id", tok)
    bucket = F.floor(
        hash_unit(F.col("tok"), seed="fh") * _FEATHASH_DIM
    ).cast("int")
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("n"))
    )


def _feature_hashing_sql() -> str:
    from airflow_baseball_spark.operators.sampling import hash_unit_sql

    unit = hash_unit_sql("tok", "fh")
    return f"""
    SELECT doc_id,
           CAST(FLOOR({unit} * {_FEATHASH_DIM}) AS INT) AS bucket,
           COUNT(*) AS n
    FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
          FROM documents)
    GROUP BY 1, 2
    """


registry.register("feature_hashing", q_feature_hashing, _feature_hashing_sql())


def q_target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding: each (event_type, fold) cell gets
    the mean target computed from every OTHER fold — the leakage-safe
    encoding for categorical features. Total-minus-self across folds:
    one combinable pass builds (category × fold) exact-decimal sums,
    category totals re-aggregate that cell table (never the fact), and
    the OOF mean is (S_cat − S_cell)/(N_cat − N_cell) — all-exact
    inputs, identical IEEE division on both engines. Folds are plain
    ``user_id % 5``: deterministic and parallelism-independent, but
    striped by id — if ids correlate with assignment order or tenant
    prefixes, switch to the md5 ``hash_unit`` fold (same shape, one
    extra in-row expr) to decorrelate."""
    ev = load_table(spark, sf_dir, "events")
    fold = (F.col("user_id") % 5).cast("int")
    y = dec_portable("value", 12, 4)
    cells = ev.groupBy(F.col("event_type"), fold.alias("fold")).agg(
        F.sum(y).alias("s_cell"), F.count("*").alias("n_cell")
    )
    cats = cells.groupBy("event_type").agg(
        F.sum("s_cell").alias("s_cat"), F.sum("n_cell").alias("n_cat")
    )
    oof = (
        (F.col("s_cat") - F.col("s_cell")).cast("double")
        / (F.col("n_cat") - F.col("n_cell")).cast("double")
    )
    from airflow_baseball_spark.functions.scalar import round6_portable

    return cells.join(F.broadcast(cats), "event_type").select(
        "event_type",
        "fold",
        "n_cell",
        round6_portable(oof).alias("oof_mean"),
    )


registry.register(
    "target_encode_oof",
    q_target_encode_oof,
    """
    WITH cells AS (
      SELECT event_type, CAST(user_id % 5 AS INT) AS fold,
             SUM(CAST(FLOOR(value * 10000 + 0.5) / 10000 AS DECIMAL(12,4))) AS s_cell,
             COUNT(*) AS n_cell
      FROM events GROUP BY 1, 2
    ),
    cats AS (
      SELECT event_type, SUM(s_cell) AS s_cat, SUM(n_cell) AS n_cat
      FROM cells GROUP BY 1
    )
    SELECT c.event_type, c.fold, c.n_cell,
           FLOOR(CAST(t.s_cat - c.s_cell AS DOUBLE)
                 / CAST(t.n_cat - c.n_cell AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS oof_mean
    FROM cells c JOIN cats t ON c.event_type = t.event_type
    """,
)


def q_standard_scaler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score feature scaling of three lineitem measures on a
    deterministic 1-in-97 key sample — the train-time featurization
    kernel. μ and σ come from ONE map-combinable pass of exact
    decimal sufficient statistics over the FULL fact (never the
    sample: scaling params must describe the population) and return
    as a broadcast 1-row frame; the scaled projection is in-row.
    Sample membership is key arithmetic (hash_sample's convention),
    so the output is stable at any parallelism."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    d = {c: dec_portable(c) for c in cols}
    aggs = [F.count("*").alias("n")]
    for c in cols:
        aggs.append(F.sum(d[c]).alias(f"s_{c}"))
        aggs.append(
            F.sum((d[c] * d[c]).cast("decimal(38,4)")).alias(f"ss_{c}")
        )
    stats = li.agg(*aggs)
    sample = li.filter((F.col("l_orderkey") * 31 + F.col("l_linenumber")) % 97 == 0)
    out = [
        F.col("l_orderkey"),
        F.col("l_linenumber"),
    ]
    proj = sample.crossJoin(F.broadcast(stats))
    for c in cols:
        n = F.col("n").cast("double")
        s = F.col(f"s_{c}").cast("double")
        ss = F.col(f"ss_{c}").cast("double")
        mean = s / n
        # population σ: sqrt(E[x²] − E[x]²) with the exact-sum form
        sd = F.sqrt((ss - s * s / n) / n)
        out.append(
            _r6((dec_portable(c).cast("double") - mean) / sd).alias(
                f"z_{c}"
            )
        )
    return proj.select(*out)


def _standard_scaler_sql() -> str:
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    stat_cols = ["COUNT(*) AS n"]
    for c in cols:
        stat_cols.append(
            f"SUM(CAST(FLOOR({c} * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS s_{c}"
        )
        stat_cols.append(
            f"SUM(CAST(CAST(FLOOR({c} * 100 + 0.5) / 100 AS DECIMAL(18,2)) "
            f"* CAST(FLOOR({c} * 100 + 0.5) / 100 AS DECIMAL(18,2))"
            f" AS DECIMAL(38,4))) AS ss_{c}"
        )
    z = []
    for c in cols:
        z.append(
            f"FLOOR(((CAST(FLOOR(l.{c} * 100 + 0.5) / 100 AS DOUBLE)"
            f" - CAST(s_{c} AS DOUBLE) / CAST(n AS DOUBLE)) /"
            f" SQRT((CAST(ss_{c} AS DOUBLE) - CAST(s_{c} AS DOUBLE)"
            f" * CAST(s_{c} AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))"
            f" * 1000000.0 + 0.5) / 1000000.0 AS z_{c}"
        )
    return f"""
    WITH stats AS (SELECT {', '.join(stat_cols)} FROM lineitem)
    SELECT l.l_orderkey, l.l_linenumber, {', '.join(z)}
    FROM lineitem l CROSS JOIN stats
    WHERE (l.l_orderkey * 31 + l.l_linenumber) % 97 = 0
    """


registry.register("standard_scaler", q_standard_scaler, _standard_scaler_sql())


# ---------------------------------------------------------------------------
# Dataset mixture weights (temperature sampling) + token quotas
# ---------------------------------------------------------------------------


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights w ∝ n_tokens^0.7 (temperature
    sampling, the standard multilingual/multi-source rebalancing) and
    an INTEGER token quota per source for a 1M-token budget via
    largest-remainder apportionment — quotas sum to the budget
    EXACTLY, which floor-only allocation cannot guarantee.

    n_tokens is an exact integer count; n^0.7 is written EXP(0.7·LN n)
    on both engines (never POW, whose libm paths differ more); the
    20-term weight normalizer is the one unordered float sum
    (`_r6`-bounded, entropy precedent). Apportionment is pure integer
    + rank arithmetic: floor quotas, then +1 to the top (budget − Σ
    floors) fractional remainders, source tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias(
            "n_tokens"
        ),
    )
    pw = F.exp(F.lit(0.7) * F.log(F.col("n_tokens").cast("double")))
    wn = Window.partitionBy()
    staged = per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        (pw / F.sum(pw).over(wn)).alias("weight"),
    )
    budget = 1000000
    raw = F.col("weight") * F.lit(float(budget))
    based = staged.select(
        "source",
        "n_docs",
        "n_tokens",
        "weight",
        F.floor(raw).cast("long").alias("base"),
        (raw - F.floor(raw)).alias("frac"),
    )
    w_rem = Window.orderBy(F.col("frac").desc(), "source")
    ranked = based.select(
        "source",
        "n_docs",
        "n_tokens",
        "weight",
        "base",
        F.row_number().over(w_rem).alias("rn"),
        (F.lit(budget) - F.sum("base").over(wn)).alias("rem"),
    )
    return ranked.select(
        "source",
        "n_docs",
        "n_tokens",
        _r6(F.col("weight")).alias("weight"),
        (
            F.col("base")
            + F.when(F.col("rn") <= F.col("rem"), 1).otherwise(0)
        )
        .cast("long")
        .alias("token_quota"),
    )


registry.register(
    "mixture_weights",
    q_mixture_weights,
    """
    WITH per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ),
    staged AS (
      SELECT source, n_docs, n_tokens,
             EXP(0.7 * LN(CAST(n_tokens AS DOUBLE)))
               / SUM(EXP(0.7 * LN(CAST(n_tokens AS DOUBLE)))) OVER ()
               AS weight
      FROM per_src
    ),
    based AS (
      SELECT source, n_docs, n_tokens, weight,
             CAST(FLOOR(weight * 1000000.0) AS BIGINT) AS base,
             weight * 1000000.0 - FLOOR(weight * 1000000.0) AS frac
      FROM staged
    ),
    ranked AS (
      SELECT source, n_docs, n_tokens, weight, base,
             ROW_NUMBER() OVER (ORDER BY frac DESC, source) AS rn,
             1000000 - SUM(base) OVER () AS rem
      FROM based
    )
    SELECT source, n_docs, n_tokens,
           FLOOR(weight * 1000000.0 + 0.5) / 1000000.0 AS weight,
           CAST(base + CASE WHEN rn <= rem THEN 1 ELSE 0 END AS BIGINT)
             AS token_quota
    FROM ranked
    """,
)


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance
# ---------------------------------------------------------------------------


def q_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the per-status (count, revenue)
    materialized view across snapshot_diff's two order snapshots:
    apply −old/+new contributions for CHANGED keys only, on top of
    the old MV — the warehouse pattern that turns an O(table) refresh
    into O(changes). The oracle recomputes the view FROM SCRATCH on
    the new snapshot, so the incremental path must equal a full
    recompute to the cent (updates are handled as delete+insert, so
    group-switching updates move mass between MV rows correctly).

    Scale: the delta join touches the keys only (cents carried as
    exact integers); the MV combine is |groups|-sized. At 100 TB the
    changed-key join is the only fact-sized work — exactly what CDC
    feeds (snapshot_diff / stream_upsert are the producers)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    cents = (dec_portable("o_totalprice", 18, 2) * 100).cast("long")
    old = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey", F.col("o_orderstatus").alias("os"), cents.alias("ov")
    )
    new = (
        orders.filter(F.col("o_orderkey") % 13 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.5
            ).otherwise(F.col("o_totalprice")),
        )
        .select(
            "o_orderkey",
            F.col("o_orderstatus").alias("ns"),
            cents.alias("nv"),
        )
    )
    mv_old = old.groupBy(F.col("os").alias("o_orderstatus")).agg(
        F.count("*").alias("n0"), F.sum("ov").alias("v0")
    )
    j = old.join(new, "o_orderkey", "full_outer")
    changed = j.filter(
        ~(
            F.col("ov").eqNullSafe(F.col("nv"))
            & F.col("os").eqNullSafe(F.col("ns"))
        )
    )
    delta = (
        changed.filter(F.col("ov").isNotNull())
        .select(
            F.col("os").alias("o_orderstatus"),
            F.lit(-1).alias("dc"),
            (-F.col("ov")).alias("dv"),
        )
        .unionAll(
            changed.filter(F.col("nv").isNotNull()).select(
                F.col("ns").alias("o_orderstatus"),
                F.lit(1).alias("dc"),
                F.col("nv").alias("dv"),
            )
        )
        .groupBy("o_orderstatus")
        .agg(F.sum("dc").alias("dc"), F.sum("dv").alias("dv"))
    )
    n_changed = changed.agg(F.count("*").alias("n_changed_keys"))
    mv_new = (
        mv_old.join(delta, "o_orderstatus", "full_outer")
        .select(
            "o_orderstatus",
            (
                F.coalesce(F.col("n0"), F.lit(0))
                + F.coalesce(F.col("dc"), F.lit(0))
            ).alias("n_orders"),
            (
                F.coalesce(F.col("v0"), F.lit(0))
                + F.coalesce(F.col("dv"), F.lit(0))
            ).alias("v"),
        )
        .filter(F.col("n_orders") > 0)
    )
    return mv_new.crossJoin(F.broadcast(n_changed)).select(
        "o_orderstatus",
        F.col("n_orders").cast("long").alias("n_orders"),
        _r6(F.col("v").cast("double") / F.lit(100.0)).alias("total_price"),
        F.col("n_changed_keys").cast("long").alias("n_changed_keys"),
    )


registry.register(
    "incremental_mv",
    q_incremental_mv,
    """
    WITH old AS (
      SELECT o_orderkey, o_orderstatus AS os,
             CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT) AS ov
      FROM orders WHERE o_orderkey % 11 <> 0
    ),
    new AS (
      SELECT o_orderkey, o_orderstatus AS ns,
             CAST(FLOOR((CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.5
                              ELSE o_totalprice END) * 100 + 0.5)
                  AS BIGINT) AS nv
      FROM orders WHERE o_orderkey % 13 <> 0
    ),
    changed AS (
      SELECT * FROM old FULL OUTER JOIN new USING (o_orderkey)
      WHERE NOT (ov IS NOT DISTINCT FROM nv AND os IS NOT DISTINCT FROM ns)
    )
    SELECT ns AS o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           FLOOR((CAST(SUM(nv) AS DOUBLE) / 100.0) * 1000000.0 + 0.5)
             / 1000000.0 AS total_price,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM changed) AS n_changed_keys
    FROM new GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# Length-bucketing padding-waste evaluation
# ---------------------------------------------------------------------------


def q_pad_waste_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many pad tokens does length-sorted batching save vs
    hash-order batching at batch size 32 — the measurement behind
    every sequence-bucketing dataloader (token_pack is the concat
    packer; this evaluates the padded-batch alternative).

    Both orderings assign batch = (row_number−1) div 32 from a
    window (sorted: token count; baseline: the md5 identity coin);
    waste per batch = Σ(batch_max − len) — all integer arithmetic,
    one ratio at the end. The global windows run on the docs-sized
    token-count table, and a production run would batch per
    partition; the global row_number here makes the oracle exact."""
    from airflow_baseball_spark.operators.sampling import hash_unit

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    w_sorted = Window.orderBy("n_tok", "doc_id")
    w_hash = Window.orderBy(hash_unit(F.col("doc_id"), seed="pad"), "doc_id")

    def waste(w: Window, label: str) -> DataFrame:
        batched = toks.select(
            "n_tok",
            ((F.row_number().over(w) - 1) / 32).cast("long").alias("b"),
        )
        per_b = batched.groupBy("b").agg(
            F.count("*").alias("c"),
            F.max("n_tok").alias("mx"),
            F.sum("n_tok").alias("s"),
        )
        return per_b.agg(
            F.lit(label).alias("ordering"),
            F.count("*").cast("long").alias("n_batches"),
            F.sum(F.col("c") * F.col("mx") - F.col("s"))
            .cast("long")
            .alias("pad_tokens"),
            F.sum("s").cast("long").alias("real_tokens"),
        )

    return waste(w_sorted, "length_sorted").unionAll(
        waste(w_hash, "hash_order")
    )


def _pad_waste_sql() -> str:
    from airflow_baseball_spark.operators.sampling import hash_unit_sql

    u = hash_unit_sql("doc_id", "pad")
    one = """
      SELECT '{label}' AS ordering,
             CAST(COUNT(*) AS BIGINT) AS n_batches,
             CAST(SUM(c * mx - s) AS BIGINT) AS pad_tokens,
             CAST(SUM(s) AS BIGINT) AS real_tokens
      FROM (
        SELECT b, COUNT(*) AS c, MAX(n_tok) AS mx, SUM(n_tok) AS s
        FROM (
          SELECT n_tok,
                 (ROW_NUMBER() OVER (ORDER BY {order}) - 1) // 32 AS b
          FROM toks
        ) GROUP BY b
      )"""
    return (
        """
    WITH toks AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    )
    """
        + one.format(label="length_sorted", order="n_tok, doc_id")
        + "\n    UNION ALL\n"
        + one.format(label="hash_order", order=f"{u}, doc_id")
    )


registry.register("pad_waste_eval", q_pad_waste_eval, _pad_waste_sql())


# ---------------------------------------------------------------------------
# Dataloader shard balance
# ---------------------------------------------------------------------------


def q_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token load per dataloader shard when docs route by identity
    hash to 8 shards — the skew check before a distributed training
    read (media_shard_plan is the bin-packing planner; this audits
    the cheap stateless alternative). floor(u·8) is exact: u = k/2³²,
    so u·8 = k/2²⁹ has no representation error. All counts."""
    from airflow_baseball_spark.operators.sampling import hash_unit

    docs = load_table(spark, sf_dir, "documents")
    shard = F.floor(hash_unit(F.col("doc_id"), seed="shard") * 8).cast(
        "long"
    )
    return (
        docs.select(
            shard.alias("shard"),
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


def _shard_balance_sql() -> str:
    from airflow_baseball_spark.operators.sampling import hash_unit_sql

    u = hash_unit_sql("doc_id", "shard")
    return f"""
    SELECT CAST(FLOOR({u} * 8) AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY 1
    """


registry.register("shard_balance", q_shard_balance, _shard_balance_sql())


# ---------------------------------------------------------------------------
# Markov removal-effect attribution
# ---------------------------------------------------------------------------

_MARKOV_CHANNELS = ("click", "error", "signup", "view")
_MARKOV_STEPS = 8


def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain (removal-effect) attribution — the data-driven
    successor of `last_touch_attribution`/`time_decay_attribution`'s
    heuristics: build the first-order journey chain (START → channel
    states → CONV on first purchase, DROP for non-converters), then
    credit each channel by how much the 8-step conversion mass falls
    when transitions INTO that channel are removed (lost, not
    renormalized — the standard removal-effect semantics).

    Exactness end-to-end in integers: transition probabilities are
    (count·1e6) div row-total; the walk carries nano-mass BIGINTs and
    each step is Σ mass·p_micro div 1e6 — order-free integer
    arithmetic, so an 8-step × 5-variant chain walk hashes
    identically on both engines. Shapes: journeys use the one
    (user)-keyed window sort every sequence op shares; the chain
    tables are |states|²-bounded forever; all five removal variants
    ride ONE plan via a variant dimension column (the walk is 8 tiny
    keyed joins, localCheckpoint'ed per step like every bounded
    iteration here)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # r11 (optimization): pidx used to come from a groupBy over a
    # SECOND evaluation of the windowed seq plus a user-keyed join
    # back. The whole-partition min window rides the SAME exchange and
    # sort as the row_number (one extra Window node, zero extra
    # passes/joins); the filter below is row-for-row the old
    # left-join + filter (non-converters keep pidx NULL).
    wp = Window.partitionBy("user_id")
    seq = ev.withColumn("idx", F.row_number().over(w)).withColumn(
        "pidx",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("idx"))
        ).over(wp),
    )
    trunc = seq.filter(
        F.col("pidx").isNull() | (F.col("idx") <= F.col("pidx"))
    ).select(
        "user_id",
        "idx",
        "pidx",
        F.when(F.col("event_type") == "purchase", F.lit("CONV"))
        .otherwise(F.col("event_type"))
        .alias("state"),
    )
    wi = Window.partitionBy("user_id").orderBy("idx")
    steps = trunc.select(
        F.coalesce(F.lag("state").over(wi), F.lit("START")).alias("src"),
        F.col("state").alias("dst"),
    )
    last_state = trunc.filter(F.col("pidx").isNull()).groupBy("user_id").agg(
        F.max(F.struct("idx", "state"))["state"].alias("src")
    )
    drops = last_state.select("src", F.lit("DROP").alias("dst"))
    counts = steps.unionByName(drops).groupBy("src", "dst").agg(
        F.count("*").alias("n")
    )
    tot = counts.groupBy("src").agg(F.sum("n").alias("row_n"))
    pm = (
        counts.join(tot, "src")
        .select("src", "dst", F.expr("(n * 1000000) DIV row_n").alias("p_micro"))
        .localCheckpoint()
    )
    variants = spark.createDataFrame(
        [("none",)] + [(c,) for c in _MARKOV_CHANNELS], "variant string"
    )
    tv = (
        pm.crossJoin(F.broadcast(variants))
        .filter(
            (F.col("variant") == "none")
            | (
                (F.col("dst") != F.col("variant"))
                & (F.col("src") != F.col("variant"))
            )
        )
        .localCheckpoint()
    )
    v = variants.select(
        "variant",
        F.lit("START").alias("state"),
        F.lit(1_000_000_000).alias("mass"),
    )
    conv_parts = []
    for _ in range(_MARKOV_STEPS):
        nxt = (
            v.join(tv, (v["variant"] == tv["variant"]) & (v["state"] == tv["src"]))
            .select(
                v["variant"].alias("variant"),
                F.col("dst").alias("state"),
                (F.col("mass") * F.col("p_micro")).alias("flow"),
            )
            .groupBy("variant", "state")
            .agg(F.expr("SUM(flow) DIV 1000000").alias("mass"))
            .localCheckpoint()
        )
        conv_parts.append(
            nxt.filter(F.col("state") == "CONV").select("variant", "mass")
        )
        v = nxt.filter(~F.col("state").isin("CONV", "DROP"))
    conv_all = conv_parts[0]
    for c in conv_parts[1:]:
        conv_all = conv_all.unionByName(c)
    conv = conv_all.groupBy("variant").agg(
        F.expr("SUM(mass) DIV 1000 AS p_conv_micro")
    )
    base = conv.filter(F.col("variant") == "none").select(
        F.col("p_conv_micro").alias("p_base_micro")
    )
    removed = conv.filter(F.col("variant") != "none").select(
        F.col("variant").alias("channel"),
        F.col("p_conv_micro").alias("p_removed_micro"),
    )
    staged = removed.crossJoin(F.broadcast(base)).select(
        "channel",
        "p_base_micro",
        "p_removed_micro",
        (F.col("p_base_micro") - F.col("p_removed_micro")).alias(
            "removal_micro"
        ),
    )
    tot_re = staged.agg(F.sum("removal_micro").alias("sum_re"))
    return staged.crossJoin(F.broadcast(tot_re)).select(
        "channel",
        "p_base_micro",
        "p_removed_micro",
        "removal_micro",
        F.expr("(removal_micro * 1000000) DIV sum_re").alias(
            "attribution_micro"
        ),
    )


def _markov_sql(steps: int = _MARKOV_STEPS) -> str:
    walk = []
    prev = "v0"
    for i in range(1, steps + 1):
        walk.append(f"""
    s{i} AS (
      SELECT w.variant, t.dst AS state,
             SUM(w.mass * t.p_micro) // 1000000 AS mass
      FROM {prev} w JOIN tv t
        ON t.variant = w.variant AND t.src = w.state
      GROUP BY 1, 2
    ),
    c{i} AS (SELECT variant, mass FROM s{i} WHERE state = 'CONV'),
    v{i} AS (SELECT * FROM s{i} WHERE state NOT IN ('CONV', 'DROP'))""")
        prev = f"v{i}"
    conv_union = "\n        UNION ALL ".join(
        f"SELECT * FROM c{i}" for i in range(1, steps + 1)
    )
    return f"""
    WITH seq AS (
      SELECT user_id, event_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS idx
      FROM events
    ),
    first_p AS (
      SELECT user_id, MIN(idx) AS pidx FROM seq
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    trunc AS (
      SELECT s.user_id, s.idx, f.pidx,
             CASE WHEN s.event_type = 'purchase' THEN 'CONV'
                  ELSE s.event_type END AS state
      FROM seq s LEFT JOIN first_p f ON s.user_id = f.user_id
      WHERE f.pidx IS NULL OR s.idx <= f.pidx
    ),
    steps AS (
      SELECT COALESCE(LAG(state) OVER (PARTITION BY user_id
                                       ORDER BY idx), 'START') AS src,
             state AS dst
      FROM trunc
    ),
    drops AS (
      SELECT ARG_MAX(state, idx) AS src, 'DROP' AS dst
      FROM trunc WHERE pidx IS NULL GROUP BY user_id
    ),
    counts AS (
      SELECT src, dst, COUNT(*) AS n FROM (
        SELECT src, dst FROM steps
        UNION ALL SELECT src, dst FROM drops
      ) GROUP BY 1, 2
    ),
    pm AS (
      SELECT c.src, c.dst, (c.n * 1000000) // t.row_n AS p_micro
      FROM counts c
      JOIN (SELECT src, SUM(n) AS row_n FROM counts GROUP BY 1) t
        ON c.src = t.src
    ),
    variants(variant) AS (
      VALUES ('none'), ('click'), ('error'), ('signup'), ('view')
    ),
    tv AS (
      SELECT v.variant, p.src, p.dst, p.p_micro
      FROM pm p CROSS JOIN variants v
      WHERE v.variant = 'none'
         OR (p.dst <> v.variant AND p.src <> v.variant)
    ),
    v0 AS (
      SELECT variant, 'START' AS state,
             CAST(1000000000 AS BIGINT) AS mass
      FROM variants
    ),
    {",".join(walk)},
    conv AS (
      SELECT variant, SUM(mass) // 1000 AS p_conv_micro
      FROM ({conv_union}) GROUP BY 1
    ),
    base AS (
      SELECT p_conv_micro AS p_base_micro FROM conv
      WHERE variant = 'none'
    ),
    staged AS (
      SELECT c.variant AS channel, b.p_base_micro,
             c.p_conv_micro AS p_removed_micro,
             b.p_base_micro - c.p_conv_micro AS removal_micro
      FROM conv c CROSS JOIN base b
      WHERE c.variant <> 'none'
    )
    SELECT channel, p_base_micro, p_removed_micro, removal_micro,
           (removal_micro * 1000000)
             // (SELECT SUM(removal_micro) FROM staged)
             AS attribution_micro
    FROM staged
    """


registry.register("markov_attribution", q_markov_attribution, _markov_sql())


# ---------------------------------------------------------------------------
# Exact Shapley-value attribution over the 3 touch channels
# ---------------------------------------------------------------------------


def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value attribution — the game-theoretic close of the
    attribution family (`last_touch` heuristic → `time_decay` decay →
    `markov_attribution` removal effect → Shapley marginal credit):
    each converter's pre-purchase journey is reduced to its SET of
    touched channels {view, click, signup}; the coalition value
    v(S) = #converters whose touch-set ⊆ S; channel i's credit is
    the Shapley average of marginal gains v(S∪i) − v(S) over the
    3! orderings. With k=3 the permutation weights are |S|=0→2/6,
    |S|=1→1/6, |S|=2→2/6, so 6·φ_i is a pure INTEGER combination of
    the 8 coalition values — exact, no sampling, and Σφ_i = v(all)
    (the efficiency axiom) is a built-in audit.

    Exactness: touch-sets are 3-bit masks (bit_or of per-type bits);
    coalition/credit algebra is integer arithmetic over an 8-row
    table; phi_micro = phi_sixths·1e6 DIV 6. Shapes: one user-keyed
    window (the shared sequence-op sort), a user-grain mask rollup,
    then constant-size (8- and 24-row) joins — nothing scales with
    the fact after the rollup."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # r11 (optimization): same one-pass pidx as markov_attribution —
    # the whole-partition min window replaces a second evaluation of
    # the windowed seq plus the user-keyed join back (the idx < pidx
    # filter drops non-converters exactly as the old inner join did:
    # NULL pidx never satisfies <).
    wp = Window.partitionBy("user_id")
    seq = ev.withColumn("idx", F.row_number().over(w)).withColumn(
        "pidx",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("idx"))
        ).over(wp),
    )
    bit = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "signup", 4)
        .otherwise(0)
    )
    masks = (
        seq.filter(F.col("idx") < F.col("pidx"))
        .groupBy("user_id")
        .agg(F.bit_or(bit).alias("t"))
    )
    n_t = masks.groupBy("t").agg(F.count("*").alias("n"))
    coalitions = spark.range(8).select(F.col("id").cast("int").alias("s"))
    v = (
        coalitions.join(
            F.broadcast(n_t),
            F.col("t").bitwiseAND(F.col("s")) == F.col("t"),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("v"))
    )
    chans = spark.createDataFrame(
        [("view", 1), ("click", 2), ("signup", 4)], ["channel", "cbit"]
    )
    # pairs (channel, S) with channel not in S: weight w(|S|)·6 ∈ {2,1,2}
    pairs = chans.crossJoin(F.broadcast(v.withColumnRenamed("v", "v_s"))).filter(
        F.col("s").bitwiseAND(F.col("cbit")) == 0
    )
    with_union = pairs.join(
        F.broadcast(
            v.select(F.col("s").alias("su"), F.col("v").alias("v_su"))
        ),
        F.col("su") == F.col("s") + F.col("cbit"),
    )
    weight = F.when(F.bit_count("s") == 1, 1).otherwise(2)
    phi = with_union.groupBy("channel").agg(
        F.sum(weight * (F.col("v_su") - F.col("v_s"))).alias("phi_sixths")
    )
    total = masks.agg(F.count("*").alias("n_conv"))
    return phi.crossJoin(F.broadcast(total)).select(
        "channel",
        F.col("phi_sixths").cast("long").alias("phi_sixths"),
        F.expr("phi_sixths * 1000000 DIV 6").alias("phi_micro"),
        "n_conv",
    )


def _shapley_sql() -> str:
    return """
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS idx
      FROM events
    ),
    first_p AS (
      SELECT user_id, MIN(idx) AS pidx FROM seq
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    masks AS (
      SELECT s.user_id,
             BIT_OR(CASE s.event_type WHEN 'view' THEN 1
                    WHEN 'click' THEN 2 WHEN 'signup' THEN 4
                    ELSE 0 END) AS t
      FROM seq s JOIN first_p p ON s.user_id = p.user_id
      WHERE s.idx < p.pidx
      GROUP BY 1
    ),
    n_t AS (SELECT t, COUNT(*) AS n FROM masks GROUP BY 1),
    coalitions AS (SELECT CAST(r.range AS INT) AS s FROM RANGE(8) r),
    v AS (
      SELECT c.s, COALESCE(SUM(n.n), 0) AS v
      FROM coalitions c LEFT JOIN n_t n ON (n.t & c.s) = n.t
      GROUP BY 1
    ),
    chans AS (
      SELECT * FROM (VALUES ('view', 1), ('click', 2), ('signup', 4))
        AS x(channel, cbit)
    ),
    pairs AS (
      SELECT ch.channel, ch.cbit, vs.s, vs.v AS v_s, vu.v AS v_su
      FROM chans ch
      JOIN v vs ON (vs.s & ch.cbit) = 0
      JOIN v vu ON vu.s = vs.s + ch.cbit
    ),
    phi AS (
      SELECT channel,
             SUM((CASE WHEN BIT_COUNT(s) = 1 THEN 1 ELSE 2 END)
                 * (v_su - v_s)) AS phi_sixths
      FROM pairs GROUP BY 1
    ),
    total AS (SELECT COUNT(*) AS n_conv FROM masks)
    SELECT channel, CAST(phi_sixths AS BIGINT) AS phi_sixths,
           CAST(phi_sixths * 1000000 // 6 AS BIGINT) AS phi_micro,
           n_conv
    FROM phi CROSS JOIN total
    """


registry.register("shapley_attribution", q_shapley_attribution, _shapley_sql())


# ---------------------------------------------------------------------------
# word2vec-style negative-sampling table (unigram^0.75, exact quotas)
# ---------------------------------------------------------------------------


def q_negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The word2vec negative-sampling table: allocate 1,000,000
    sampling slots across the top-64 corpus tokens proportionally to
    f^0.75 (the smoothed unigram distribution that up-weights rare
    words) with exact largest-remainder quotas, so the slot counts
    sum EXACTLY to the table size — the companion to
    `skipgram_pairs`/`triplet_mining` that every embedding trainer
    materializes before sampling negatives.

    Exactness: f^0.75 = sqrt(f)·sqrt(sqrt(f)) — two correctly-rounded
    IEEE sqrts and one multiply, no libm pow — then quantized to
    micro-units BEFORE any cross-row sum (the repo's
    quantize-before-sum rule), so quotas are pure integer arithmetic.
    Shapes: one token groupBy with map-side combine; top-64 via
    TakeOrderedAndProject; the quota window runs over 64 rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(analysis.tokens(F.col("text"))).alias("term")
    )
    counts = toks.groupBy("term").agg(F.count("*").alias("f"))
    top = counts.orderBy(F.col("f").desc(), "term").limit(64)
    x = F.col("f").cast("double")
    w_micro = F.floor(
        F.sqrt(x) * F.sqrt(F.sqrt(x)) * F.lit(1000000.0)
    ).cast("long")
    staged = top.select("term", "f", w_micro.alias("w_micro"))
    tot = staged.agg(F.sum("w_micro").alias("w_tot"))
    quota = (
        staged.crossJoin(F.broadcast(tot))
        .select(
            "term",
            "f",
            "w_micro",
            # DECIMAL headroom: w_micro reaches ~1e15 at extreme
            # corpus sizes, so the slot product needs >64 bits
            F.expr(
                "CAST(CAST(w_micro AS DECIMAL(18,0)) * 1000000"
                " DIV w_tot AS BIGINT)"
            ).alias("q_floor"),
            F.expr(
                "CAST(CAST(w_micro AS DECIMAL(18,0)) * 1000000"
                " % w_tot AS BIGINT)"
            ).alias("rem"),
        )
    )
    wr = Window.orderBy(F.col("rem").desc(), F.col("term").asc())
    short = quota.agg(
        (F.lit(1000000) - F.sum("q_floor")).alias("shortfall")
    )
    return (
        quota.withColumn("rk", F.row_number().over(wr))
        .crossJoin(F.broadcast(short))
        .select(
            "term",
            "f",
            "w_micro",
            (
                F.col("q_floor")
                + F.when(F.col("rk") <= F.col("shortfall"), 1).otherwise(0)
            ).alias("slots"),
        )
    )


registry.register(
    "negative_sampling_table",
    q_negative_sampling_table,
    """
    WITH counts AS (
      SELECT term, COUNT(*) AS f
      FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
            FROM documents)
      GROUP BY 1
    ),
    top AS (SELECT * FROM counts ORDER BY f DESC, term LIMIT 64),
    staged AS (
      SELECT term, f,
             CAST(FLOOR(sqrt(CAST(f AS DOUBLE))
                        * sqrt(sqrt(CAST(f AS DOUBLE)))
                        * 1000000.0) AS BIGINT) AS w_micro
      FROM top
    ),
    tot AS (SELECT SUM(w_micro) AS w_tot FROM staged),
    quota AS (
      SELECT term, f, w_micro,
             CAST(CAST(w_micro AS HUGEINT) * 1000000
                  // t.w_tot AS BIGINT) AS q_floor,
             CAST(CAST(w_micro AS HUGEINT) * 1000000
                  % t.w_tot AS BIGINT) AS rem
      FROM staged CROSS JOIN tot t
    ),
    short AS (SELECT 1000000 - SUM(q_floor) AS shortfall FROM quota)
    SELECT q.term, q.f, q.w_micro,
           CAST(q.q_floor
                + CASE WHEN ROW_NUMBER() OVER (ORDER BY q.rem DESC,
                                               q.term ASC) <= s.shortfall
                       THEN 1 ELSE 0 END AS BIGINT) AS slots
    FROM quota q CROSS JOIN short s
    """,
)


# ---------------------------------------------------------------------------
# Length-curriculum phases over the documents corpus
# ---------------------------------------------------------------------------


def q_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-curriculum plan for LLM training: band the corpus into
    four phases by rank-rule token-count quartiles (short documents
    first -- the standard length curriculum) and report each phase's
    doc count, token budget, token-count range, and the CUMULATIVE
    token budget a trainer would have consumed entering each phase.
    Complements `mixture_weights` (which balances sources) and
    `token_pack` (which packs sequences); this orders the corpus.

    Exactness: token counts are exact integers (whitespace split,
    the house tokenization); quartile boundaries are rank-rule k-th
    smallest from the two-pass histogram; every output is a BIGINT
    or an exact cumulative over the 4-row phase table. Scale: one
    corpus scan for boundaries, one for banding."""
    from airflow_baseball_spark.operators.rank_select import rank_pick

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("tok")
    )
    bounds = rank_pick(
        docs.select(F.col("tok").cast("long").alias("v")),
        "v",
        [
            (f"q{i}", lambda n, i=i: F.expr(f"({i} * n + 3) div 4"))
            for i in range(1, 4)
        ],
    )
    qs = bounds.groupBy().pivot(
        "rank_label", [f"q{i}" for i in range(1, 4)]
    ).agg(F.min("v"))
    phase = (
        F.lit(1)
        + (F.col("tok") > F.col("q1")).cast("int")
        + (F.col("tok") > F.col("q2")).cast("int")
        + (F.col("tok") > F.col("q3")).cast("int")
    )
    banded = docs.crossJoin(F.broadcast(qs)).select(
        phase.alias("phase"), "tok"
    )
    per = banded.groupBy("phase").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok").cast("long").alias("tokens"),
        F.min("tok").cast("long").alias("min_tok"),
        F.max("tok").cast("long").alias("max_tok"),
    )
    w = Window.orderBy("phase").rowsBetween(Window.unboundedPreceding, -1)
    return per.select(
        "phase",
        "n_docs",
        "tokens",
        "min_tok",
        "max_tok",
        F.coalesce(F.sum("tokens").over(w), F.lit(0))
        .cast("long")
        .alias("tokens_before"),
    ).orderBy("phase")


registry.register(
    "curriculum_phases",
    q_curriculum_phases,
    """
    WITH docs AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      FROM documents
    ),
    ranked AS (
      SELECT tok, ROW_NUMBER() OVER (ORDER BY tok) AS rn,
             COUNT(*) OVER () AS n
      FROM docs
    ),
    qs AS (
      SELECT MAX(CASE WHEN rn = (1 * n + 3) // 4 THEN tok END) AS q1,
             MAX(CASE WHEN rn = (2 * n + 3) // 4 THEN tok END) AS q2,
             MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN tok END) AS q3
      FROM ranked
    ),
    banded AS (
      SELECT 1 + CAST(tok > q1 AS INT) + CAST(tok > q2 AS INT)
               + CAST(tok > q3 AS INT) AS phase,
             tok
      FROM docs CROSS JOIN qs
    ),
    per AS (
      SELECT phase, COUNT(*) AS n_docs,
             CAST(SUM(tok) AS BIGINT) AS tokens,
             CAST(MIN(tok) AS BIGINT) AS min_tok,
             CAST(MAX(tok) AS BIGINT) AS max_tok
      FROM banded GROUP BY phase
    )
    SELECT phase, n_docs, tokens, min_tok, max_tok,
           CAST(COALESCE(SUM(tokens) OVER (
             ORDER BY phase ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
    FROM per ORDER BY phase
    """,
)


# ---------------------------------------------------------------------------
# Position-based (U-shaped) attribution
# ---------------------------------------------------------------------------


def q_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped 40/20/40) attribution: each purchase
    splits credit over its preceding-hour touches as 40% first, 40%
    last, 20% across middles (solo touch 100%, two touches 50/50) --
    completing the attribution family next to last-touch,
    time-decay, Markov and Shapley, and the allocation most retail
    stacks actually run.

    Exactness: journeys come from a user-keyed time-range join
    (purchases x preceding-hour touches, partitioned on user -- no
    global shuffle beyond the user key); position ranks are exact
    (ts, event_id) windows WITHIN a journey (bounded by an hour of
    one user's activity); each touch's fractional credit is
    floor-quantized to micro-units per journey BEFORE the per-channel
    sum. Scale: one self-join of the events log keyed by user."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("t_ts"),
    )
    joined = purchases.join(touches, "user_id").filter(
        (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
    )
    w = Window.partitionBy("user_id", "p_id").orderBy("t_ts", "t_id")
    wn = Window.partitionBy("user_id", "p_id")
    ranked = joined.select(
        "user_id",
        "p_id",
        "channel",
        F.row_number().over(w).alias("pos"),
        F.count("*").over(wn).alias("n_t"),
    )
    credit = (
        F.when(F.col("n_t") == 1, F.lit(1.0))
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("n_t")),
            F.when(F.col("n_t") == 2, F.lit(0.5)).otherwise(F.lit(0.4)),
        )
        .otherwise(F.lit(0.2) / (F.col("n_t").cast("double") - 2))
    )
    cm = F.floor(credit * 1000000.0 + F.lit(0.5)).cast("long")
    return (
        ranked.select("channel", cm.alias("cm"))
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            _r6(F.sum("cm").cast("double") / 1000000.0).alias(
                "credited_conversions"
            ),
        )
        .orderBy("channel")
    )


registry.register(
    "position_attribution",
    q_position_attribution,
    """
    WITH p AS (
      SELECT user_id, event_id AS p_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, event_id AS t_id, event_type AS channel, ts AS t_ts
      FROM events WHERE event_type <> 'purchase'
    ),
    j AS (
      SELECT p.user_id, p.p_id, t.channel, t.t_ts, t.t_id
      FROM p JOIN t ON p.user_id = t.user_id
      WHERE t.t_ts < p.p_ts
        AND t.t_ts >= p.p_ts - INTERVAL 1 HOUR
    ),
    ranked AS (
      SELECT user_id, p_id, channel,
             ROW_NUMBER() OVER (PARTITION BY user_id, p_id
                                ORDER BY t_ts, t_id) AS pos,
             COUNT(*) OVER (PARTITION BY user_id, p_id) AS n_t
      FROM j
    ),
    credited AS (
      SELECT channel,
             CAST(FLOOR((CASE
               WHEN n_t = 1 THEN 1.0
               WHEN pos = 1 OR pos = n_t THEN
                 CASE WHEN n_t = 2 THEN 0.5 ELSE 0.4 END
               ELSE 0.2 / (CAST(n_t AS DOUBLE) - 2)
             END) * 1000000.0 + 0.5) AS BIGINT) AS cm
      FROM ranked
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           FLOOR(CAST(SUM(cm) AS DOUBLE) / 1000000.0 * 1000000.0 + 0.5)
             / 1000000.0 AS credited_conversions
    FROM credited GROUP BY channel ORDER BY channel
    """,
)
