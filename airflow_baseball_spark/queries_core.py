"""Core SURVEY.md §2 operators phrased over the driver testdata
(FIXTURES.md §2 mapping), each registered with its DuckDB oracle twin.

Determinism rules (driver hashes values order-insensitively with
columns sorted by name):

* never sum raw doubles — cast to DECIMAL(18,2) first (exact, identical
  in Spark and DuckDB), cast back to double after;
* per-row double arithmetic is written with the *same operation order*
  in Spark and the oracle SQL (IEEE ops are deterministic given order);
* any double produced by division is ``round(x, 6)`` on both sides;
* ties in window orderings are broken on a unique column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_baseball_spark import registry
from airflow_baseball_spark.functions.scalar import (
    dec_portable,
    ip_to_float,
    sentinel_to_double,
)
from airflow_baseball_spark.metrics import hitting, pitching
from airflow_baseball_spark.operators.topk import top_k_per_key
from airflow_baseball_spark.operators.upsert import upsert_dataframe
from airflow_baseball_spark.pipelines.park_factor import FLAGSHIP_ORACLE_SQL, flagship
from airflow_baseball_spark.schemas import load_table


def _dsum(col: str | Column) -> Column:
    """Exact engine-independent sum: DECIMAL(18,2) accumulate → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec_portable(c)).cast("double")


# --- D4 + F13: flagship total-minus-self ratio (park factor) ---------------

registry.register("park_factor_flagship", flagship, FLAGSHIP_ORACLE_SQL)


# --- D1: hash group-by aggregation (001_park_factor:42-46) ------------------


def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum("l_quantity").alias("sum_qty"),
        _dsum("l_extendedprice").alias("sum_price"),
        F.count("*").alias("n_rows"),
    )


registry.register(
    "groupby_agg",
    q_groupby_agg,
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)


# --- B1/B2/B4: projection + predicates (pushed to the parquet scan) ---------


def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference pattern: narrow SELECT list + key predicate + zero-denom
    guard (011:36-38). Filter and projection reach the scan
    (PushedFilters in .explain)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.to_date("l_shipdate") < F.lit("1996-01-01").cast("date"))
        & (F.col("l_quantity") != 0)
        & (F.col("l_linestatus") == "F")
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        F.to_date("l_shipdate").alias("ship_date"),
    )


registry.register(
    "filter_project",
    q_filter_project,
    """
    SELECT l_orderkey, l_linenumber, l_quantity AS qty,
           CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) < DATE '1996-01-01'
      AND l_quantity <> 0 AND l_linestatus = 'F'
    """,
)


# --- C1: inner equi-join chain (lineup → masters analog) --------------------


def q_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table broadcast-join chain: revenue per region/nation.
    Reference does this as N+1 point SELECTs (050:91-121); set-based it
    is one job — dims broadcast, fact shuffles once for the agg."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            # decimal × decimal: exact — a double product cast to decimal
            # rounds differently (half-even vs half-up) across engines
            F.sum(
                dec_portable("l_extendedprice", 18, 2)
                * dec_portable(F.lit(1) - F.col("l_discount"), 5, 2)
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


registry.register(
    "join_chain",
    q_join_chain,
    """
    SELECT r_name, n_name,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))
                    * CAST(FLOOR((1 - l_discount) * 100 + 0.5) / 100 AS DECIMAL(5,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)


# --- C2-C4: left outer join, missing partner → NULL/default fill ------------


def q_left_join_nullfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """player → metrics left join analog (050:31-35): customers keep a
    row even with no orders; counts coalesce to 0, sums stay NULL."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("cnt"), _dsum("o_totalprice").alias("spent")
    )
    return cust.join(
        per_cust, cust.c_custkey == per_cust.o_custkey, "left"
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce("cnt", F.lit(0)).alias("n_orders"),
        F.round("spent", 6).alias("total_spent"),  # NULL when no orders
    )


registry.register(
    "left_join_nullfill",
    q_left_join_nullfill,
    """
    SELECT c_custkey, c_mktsegment,
           COALESCE(cnt, 0) AS n_orders,
           ROUND(spent, 6) AS total_spent
    FROM customer
    LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS cnt,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS spent
      FROM orders GROUP BY o_custkey
    ) ON c_custkey = o_custkey
    """,
)


# --- C5: broadcast dim with default-on-missing (park_factor dict, 041:19-31)


def q_broadcast_dim_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stadium → park_factor defaultdict(float) analog: join customers to
    a deliberately incomplete dim; missing keys take 0.0 (C5)."""
    cust = load_table(spark, sf_dir, "customer")
    reg = load_table(spark, sf_dir, "region")
    dim = reg.filter(F.col("r_regionkey") < 3).select(
        "r_regionkey", (F.col("r_regionkey") * 0.5 + 1.0).alias("factor")
    )
    return (
        cust.join(F.broadcast(dim), cust.c_nationkey % 5 == dim.r_regionkey, "left")
        .groupBy(F.coalesce("factor", F.lit(0.0)).alias("factor"))
        .agg(F.count("*").alias("n_customers"))
    )


registry.register(
    "broadcast_dim_default",
    q_broadcast_dim_default,
    """
    SELECT COALESCE(factor, CAST(0.0 AS DOUBLE)) AS factor, COUNT(*) AS n_customers
    FROM customer
    LEFT JOIN (
      SELECT r_regionkey, CAST(r_regionkey * 0.5 + 1.0 AS DOUBLE) AS factor
      FROM region WHERE r_regionkey < 3
    ) ON c_nationkey % 5 = r_regionkey
    GROUP BY 1
    """,
)


# --- C6 + D2: league scalars cross-joined back (012:63-82) ------------------


def q_league_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregates computed once and broadcast back per group —
    the reference closes over Python floats; here a 1-row crossJoin
    keeps everything in-plan."""
    cust = load_table(spark, sf_dir, "customer")
    league = cust.agg(
        _dsum("c_acctbal").alias("lg_bal"), F.count("*").alias("lg_cnt")
    )
    per_seg = cust.groupBy("c_mktsegment").agg(
        _dsum("c_acctbal").alias("seg_bal"), F.count("*").alias("seg_cnt")
    )
    return per_seg.crossJoin(F.broadcast(league)).select(
        "c_mktsegment",
        F.round(
            (F.col("seg_bal") / F.col("seg_cnt"))
            / (F.col("lg_bal") / F.col("lg_cnt")),
            6,
        ).alias("bal_index"),
        "seg_cnt",
    )


registry.register(
    "league_scalars",
    q_league_scalars,
    """
    WITH league AS (
      SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS lg_bal,
             COUNT(*) AS lg_cnt
      FROM customer
    ), per_seg AS (
      SELECT c_mktsegment,
             CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS seg_bal,
             COUNT(*) AS seg_cnt
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment,
           ROUND((seg_bal / seg_cnt) / (lg_bal / lg_cnt), 6) AS bal_index,
           seg_cnt
    FROM per_seg CROSS JOIN league
    """,
)


# --- D3/D5 + F5: try_cast mean over dirty data (021:43-64) ------------------


def q_try_cast_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """League mean ERA excluding unparseable rows: a constructed dirty
    string column ('-' sentinel every 7th row) averaged with
    sentinel→NULL semantics; AVG and COUNT ignore NULLs on both
    engines (D3/D5)."""
    ev = load_table(spark, sf_dir, "events")
    dirty = F.when(F.col("event_id") % 7 == 0, F.lit("-")).otherwise(
        (F.col("event_id") % 100).cast("string")
    )
    parsed = sentinel_to_double(dirty)
    return ev.select("event_type", parsed.alias("v")).groupBy("event_type").agg(
        F.round(F.avg("v"), 6).alias("mean_v"),
        F.count("v").alias("n_valid"),
        F.count("*").alias("n_total"),
    )


registry.register(
    "try_cast_avg",
    q_try_cast_avg,
    """
    SELECT event_type,
           ROUND(AVG(v), 6) AS mean_v,
           COUNT(v) AS n_valid,
           COUNT(*) AS n_total
    FROM (
      SELECT event_type,
             TRY_CAST(CASE WHEN event_id % 7 = 0 THEN '-'
                           ELSE CAST(event_id % 100 AS VARCHAR) END
                      AS DOUBLE) AS v
      FROM events
    )
    GROUP BY event_type
    """,
)


# --- E1: per-key top-k (recent-5-games, 050:49-55) ---------------------------


def q_topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return top_k_per_key(
        orders,
        ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
        k=5,
        rank_col="rn",
    ).select("o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("od"), "rn")


registry.register(
    "topk_per_key",
    q_topk_per_key,
    """
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    WHERE rn <= 5
    """,
)


# --- E: global sort + limit with deterministic tie-break ---------------------


def q_global_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )


registry.register(
    "global_topn",
    q_global_topn,
    """
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)


# --- F1/F2: regex extraction (000:24-29, 030:22-27) --------------------------


def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderpriority").rlike(r"^(\d+)-(\w+)"))
        .select(
            F.regexp_extract("o_orderpriority", r"^(\d+)-(\w+)", 1)
            .cast("int")
            .alias("prio_num"),
            F.regexp_extract("o_orderpriority", r"^(\d+)-(\w+)", 2).alias(
                "prio_word"
            ),
        )
        .groupBy("prio_num", "prio_word")
        .agg(F.count("*").alias("n"))
    )


registry.register(
    "regex_extract",
    q_regex_extract,
    r"""
    SELECT CAST(regexp_extract(o_orderpriority, '^(\d+)-(\w+)', 1) AS INT) AS prio_num,
           regexp_extract(o_orderpriority, '^(\d+)-(\w+)', 2) AS prio_word,
           COUNT(*) AS n
    FROM orders
    WHERE regexp_matches(o_orderpriority, '^(\d+)-(\w+)')
    GROUP BY 1, 2
    """,
)


# --- F3/F4/F7: date build / compare / rebuild (000:31-42, 010:134-136) -------


def q_date_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = F.to_date("l_shipdate")
    return (
        li.filter(
            (d >= F.lit("1995-01-01").cast("date"))
            & (d < F.lit("1997-01-01").cast("date"))
        )
        .select(
            F.year(d).alias("y"),
            F.month(d).alias("m"),
            F.make_date(F.year(d), F.month(d), F.lit(1)).alias("month_start"),
        )
        .groupBy("y", "m", "month_start")
        .agg(F.count("*").alias("n"))
    )


registry.register(
    "date_ops",
    q_date_ops,
    """
    SELECT year(CAST(l_shipdate AS DATE)) AS y,
           month(CAST(l_shipdate AS DATE)) AS m,
           make_date(year(CAST(l_shipdate AS DATE)),
                     month(CAST(l_shipdate AS DATE)), 1) AS month_start,
           COUNT(*) AS n
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
    GROUP BY 1, 2, 3
    """,
)


# --- F6: baseball-fraction innings parse (021:15-30) -------------------------


def q_ip_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction strings built deterministically from lineitem, parsed
    per-row by the pure column expression (no UDF). Per-row IEEE
    arithmetic is bit-identical across engines, so no rounding needed."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_int = F.col("l_quantity").cast("int").cast("string")
    ip_str = (
        F.when(F.col("l_orderkey") % 3 == 0, F.concat(qty_int, F.lit(" 2/3")))
        .when(F.col("l_orderkey") % 3 == 1, F.lit("1/3"))
        .otherwise(qty_int)
    )
    return li.filter(F.col("l_orderkey") % 41 == 0).select(
        "l_orderkey",
        "l_linenumber",
        ip_str.alias("ip_str"),
        ip_to_float(ip_str).alias("ip"),
    )


registry.register(
    "ip_fraction",
    q_ip_fraction,
    r"""
    WITH src AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_orderkey % 3 = 0
                    THEN CAST(CAST(l_quantity AS INT) AS VARCHAR) || ' 2/3'
                  WHEN l_orderkey % 3 = 1 THEN '1/3'
                  ELSE CAST(CAST(l_quantity AS INT) AS VARCHAR) END AS ip_str
      FROM lineitem WHERE l_orderkey % 41 = 0
    )
    SELECT l_orderkey, l_linenumber, ip_str,
           (CASE WHEN regexp_extract(ip_str, '^(\d+)(\s|$)', 1) = '' THEN 0.0
                 ELSE CAST(regexp_extract(ip_str, '^(\d+)(\s|$)', 1) AS DOUBLE) END
            + CASE WHEN regexp_extract(ip_str, '(\d+)/(\d+)', 2) = '' THEN 0.0
                   ELSE CAST(regexp_extract(ip_str, '(\d+)/(\d+)', 1) AS DOUBLE)
                        / CAST(regexp_extract(ip_str, '(\d+)/(\d+)', 2) AS DOUBLE) END
           ) AS ip
    FROM src
    """,
)


# --- F9: conditional sign (070:114-119) --------------------------------------


def q_signum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    diff = F.col("l_extendedprice") - F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.signum(diff).cast("int").alias("sign_bucket"))
        .groupBy("sign_bucket")
        .agg(F.count("*").alias("n"))
    )


registry.register(
    "signum",
    q_signum,
    """
    SELECT CAST(sign(l_extendedprice - p_retailprice * l_quantity) AS INT) AS sign_bucket,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
)


# --- F10-F12: wOBA / K% / BB% / BABIP formulas (011:41-42, 013:44-46) --------


def q_hitting_formulas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hitter metric formulas evaluated per-row over pseudo-stats
    derived from lineitem integers (FIXTURES.md §2: formula inputs
    aliased from testdata columns). Zero denominators exercise the B4
    guard → NULL on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.filter(F.col("l_orderkey") % 37 == 0).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_linenumber") % 5).cast("double").alias("bb"),
        (F.col("l_orderkey") % 2).cast("double").alias("ibb"),
        (F.col("l_suppkey") % 3).cast("double").alias("hbp"),
        F.col("l_quantity").cast("int").cast("double").alias("hits"),
        (F.col("l_partkey") % 4).cast("double").alias("doubles"),
        (F.col("l_partkey") % 3).cast("double").alias("triples"),
        (F.col("l_orderkey") % 5).cast("double").alias("hr"),
        (F.col("l_suppkey") % 5).cast("double").alias("sb"),
        (F.col("l_partkey") % 2).cast("double").alias("cs"),
        ((F.col("l_quantity").cast("int") + F.col("l_linenumber")) % 29)
        .cast("double")
        .alias("pa"),
        (F.col("l_orderkey") % 3).cast("double").alias("sac"),
        (F.col("l_suppkey") % 7).cast("double").alias("so"),
        (F.col("l_linenumber") % 2).cast("double").alias("sf"),
        (F.col("l_quantity").cast("int") % 23).cast("double").alias("ab"),
    )
    return stats.select(
        "l_orderkey",
        "l_linenumber",
        hitting.woba().alias("woba"),
        hitting.k_rate().alias("k_rate"),
        hitting.bb_rate().alias("bb_rate"),
        hitting.babip().alias("babip"),
    )


registry.register(
    "hitting_formulas",
    q_hitting_formulas,
    """
    WITH stats AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_linenumber % 5 AS DOUBLE) AS bb,
             CAST(l_orderkey % 2 AS DOUBLE) AS ibb,
             CAST(l_suppkey % 3 AS DOUBLE) AS hbp,
             CAST(CAST(l_quantity AS INT) AS DOUBLE) AS hits,
             CAST(l_partkey % 4 AS DOUBLE) AS doubles,
             CAST(l_partkey % 3 AS DOUBLE) AS triples,
             CAST(l_orderkey % 5 AS DOUBLE) AS hr,
             CAST(l_suppkey % 5 AS DOUBLE) AS sb,
             CAST(l_partkey % 2 AS DOUBLE) AS cs,
             CAST((CAST(l_quantity AS INT) + l_linenumber) % 29 AS DOUBLE) AS pa,
             CAST(l_orderkey % 3 AS DOUBLE) AS sac,
             CAST(l_suppkey % 7 AS DOUBLE) AS so,
             CAST(l_linenumber % 2 AS DOUBLE) AS sf,
             CAST(CAST(l_quantity AS INT) % 23 AS DOUBLE) AS ab
      FROM lineitem WHERE l_orderkey % 37 = 0
    )
    SELECT l_orderkey, l_linenumber,
           CASE WHEN pa - ibb - sac <> 0 THEN
             (0.7 * (bb - ibb + hbp) + 0.9 * hits + 1.25 * doubles
              + 1.6 * triples + 2.0 * hr + 0.25 * sb - 0.5 * cs)
             / (pa - ibb - sac) END AS woba,
           CASE WHEN pa <> 0 THEN so / pa END AS k_rate,
           CASE WHEN pa <> 0 THEN bb / pa END AS bb_rate,
           CASE WHEN ab - so - hr + sf <> 0 THEN
             (hits - hr) / (ab - so - hr + sf) END AS babip
    FROM stats
    """,
)


# --- F14 + C6: FIP family with league constants (021:43-86) ------------------


def q_pitching_formulas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIP / K9 / BB9 / HR9 per 'pitcher' (supplier analog) with the FIP
    constant derived from league totals computed in-plan and
    cross-joined back (no .collect())."""
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_orderkey") % 2).alias("hr"),
        F.sum("l_linenumber").alias("bb"),
        F.sum(F.col("l_partkey") % 7).alias("so"),
        F.sum(F.col("l_quantity").cast("int")).alias("ip"),
    )
    league = per_supp.agg(
        F.sum("hr").alias("lg_hr"),
        F.sum("bb").alias("lg_bb"),
        F.sum("so").alias("lg_so"),
        F.sum("ip").alias("lg_ip"),
    )
    const = pitching.fip_constant(
        F.lit(4.2), F.col("lg_hr"), F.col("lg_bb"), F.col("lg_so"), F.col("lg_ip")
    )
    joined = per_supp.crossJoin(F.broadcast(league))
    return joined.select(
        "l_suppkey",
        F.round(
            pitching.fip(F.col("hr"), F.col("bb"), F.col("so"), F.col("ip"), const),
            6,
        ).alias("fip"),
        F.round(pitching.k9(F.col("so"), F.col("ip")), 6).alias("k_9"),
        F.round(pitching.bb9(F.col("bb"), F.col("ip")), 6).alias("bb_9"),
        F.round(pitching.hr9(F.col("hr"), F.col("ip")), 6).alias("hr_9"),
    )


registry.register(
    "pitching_formulas",
    q_pitching_formulas,
    """
    WITH per_supp AS (
      SELECT l_suppkey,
             SUM(l_orderkey % 2) AS hr,
             SUM(l_linenumber) AS bb,
             SUM(l_partkey % 7) AS so,
             SUM(CAST(l_quantity AS INT)) AS ip
      FROM lineitem GROUP BY l_suppkey
    ), league AS (
      SELECT SUM(hr) AS lg_hr, SUM(bb) AS lg_bb, SUM(so) AS lg_so,
             SUM(ip) AS lg_ip
      FROM per_supp
    )
    SELECT l_suppkey,
           CASE WHEN ip <> 0 THEN ROUND(
             (13.0 * hr + 3.0 * bb - 2.0 * so) / ip
             + (4.2 - (13.0 * lg_hr + 3.0 * lg_bb - 2.0 * lg_so) / lg_ip), 6)
           END AS fip,
           CASE WHEN ip <> 0 THEN ROUND(9.0 * so / ip, 6) END AS k_9,
           CASE WHEN ip <> 0 THEN ROUND(9.0 * bb / ip, 6) END AS bb_9,
           CASE WHEN ip <> 0 THEN ROUND(9.0 * hr / ip, 6) END AS hr_9
    FROM per_supp CROSS JOIN league
    """,
)


# --- F11/F15: wRC / wRC+ with park factor chained in (012:93, 041:143) -------


def q_wrc_plus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wRC+-shaped query chaining the flagship's priority_factor as the
    park factor: formula over group aggregates × two broadcast scalars.
    Mirrors the reference's 041 stage where the metric depends on two
    upstream stages."""
    orders = load_table(spark, sf_dir, "orders")
    pf = flagship(spark, sf_dir)  # o_orderpriority, priority_factor
    per_prio = orders.groupBy("o_orderpriority").agg(
        _dsum("o_totalprice").alias("wrc"), F.count("*").alias("pa")
    )
    league = per_prio.agg(
        F.sum(dec_portable("wrc")).cast("double").alias("lg_wrc"),
        F.sum("pa").alias("lg_pa"),
    )
    joined = per_prio.join(pf, "o_orderpriority").crossJoin(F.broadcast(league))
    return joined.select(
        "o_orderpriority",
        F.round(
            hitting.wrc_plus(
                F.col("wrc"),
                F.col("pa"),
                F.col("lg_wrc"),
                F.col("lg_pa"),
                F.col("priority_factor"),
            ),
            6,
        ).alias("wrc_plus"),
    )


registry.register(
    "wrc_plus",
    q_wrc_plus,
    """
    WITH per_prio AS (
      SELECT o_orderpriority,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS total,
             COUNT(*) AS cnt
      FROM orders GROUP BY o_orderpriority
    ), with_tot AS (
      SELECT *, SUM(total) OVER () AS g_total, SUM(cnt) OVER () AS g_cnt
      FROM per_prio
    ), pf AS (
      SELECT o_orderpriority,
             ROUND((CAST(total AS DOUBLE) / cnt)
                   / (CAST(g_total - total AS DOUBLE) / (g_cnt - cnt)), 6)
               AS priority_factor
      FROM with_tot
    ), league AS (
      SELECT CAST(SUM(total) AS DOUBLE) AS lg_wrc, SUM(cnt) AS lg_pa
      FROM per_prio
    )
    SELECT p.o_orderpriority,
           CASE WHEN p.cnt <> 0 AND f.priority_factor <> 0 THEN ROUND(
             (CAST(p.total AS DOUBLE) / p.cnt)
             / ((league.lg_wrc / league.lg_pa) / f.priority_factor) * 100.0, 6)
           END AS wrc_plus
    FROM per_prio p
    JOIN pf f USING (o_orderpriority)
    CROSS JOIN league
    """,
)


# --- F16: OPS+ with park-factor default-0.0 → NULL deviation -----------------


def q_ops_plus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPS+ (dags/041_calculate_hitter_metrics_with_park_factor.py:149-151)
    over hitters shaped from ``customer``: a park-factor dim that covers
    only SOME teams exercises C5's default-0.0-on-miss, and the 0.0
    factor flows into the documented NULL deviation (the reference keeps
    the previous loop iteration's value on ZeroDivisionError; we emit
    NULL instead — SURVEY.md §7)."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    h = c.select(
        k.alias("hitter_id"),
        F.col("c_mktsegment").alias("team"),
        F.when(k % 13 == 0, None).otherwise((k % 40) / 100.0).alias("obp"),
        F.when(k % 17 == 0, None).otherwise((k % 60) / 100.0).alias("slg"),
    )
    # dim covers only teams sorting below 'H' — the rest hit the C5
    # default (0.0) and OPS+ goes NULL for them
    pf = (
        c.select(F.col("c_mktsegment").alias("team"))
        .distinct()
        .filter(F.col("team") < "H")
        .select(
            "team",
            (0.8 + (F.length("team") % 5) * 0.1).alias("park_factor"),
        )
    )
    league = h.agg(
        (
            F.sum(dec_portable("obp", 18, 6)).cast("double")
            / F.count("obp")
        ).alias("lg_obp"),
        (
            F.sum(dec_portable("slg", 18, 6)).cast("double")
            / F.count("slg")
        ).alias("lg_slg"),
    )
    joined = (
        h.join(F.broadcast(pf), "team", "left")
        .withColumn("park_factor", F.coalesce("park_factor", F.lit(0.0)))
        .crossJoin(F.broadcast(league))
    )
    return joined.select(
        "hitter_id",
        "team",
        F.round(
            hitting.ops_plus(
                F.col("obp"),
                F.col("slg"),
                F.col("lg_obp"),
                F.col("lg_slg"),
                F.col("park_factor"),
            ),
            6,
        ).alias("ops_plus"),
    )


registry.register(
    "ops_plus",
    q_ops_plus,
    """
    WITH h AS (
      SELECT c_custkey AS hitter_id, c_mktsegment AS team,
             CASE WHEN c_custkey % 13 = 0 THEN NULL
                  ELSE (c_custkey % 40) / 100.0 END AS obp,
             CASE WHEN c_custkey % 17 = 0 THEN NULL
                  ELSE (c_custkey % 60) / 100.0 END AS slg
      FROM customer
    ),
    pf AS (
      SELECT DISTINCT c_mktsegment AS team,
             0.8e0 + (length(c_mktsegment) % 5) * 0.1e0 AS park_factor
      FROM customer WHERE c_mktsegment < 'H'
    ),
    league AS (
      SELECT CAST(SUM(CAST(FLOOR(obp * 1000000 + 0.5) / 1000000 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(obp)
               AS lg_obp,
             CAST(SUM(CAST(FLOOR(slg * 1000000 + 0.5) / 1000000 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(slg)
               AS lg_slg
      FROM h
    )
    SELECT hitter_id, h.team,
           ROUND(CASE WHEN COALESCE(pf.park_factor, 0.0e0) <> 0 THEN
             (100.0e0 / pf.park_factor)
             * (obp / lg_obp + slg / lg_slg - 1.0e0) END, 6) AS ops_plus
    FROM h LEFT JOIN pf USING (team) CROSS JOIN league
    """,
)


# --- A8: idempotent keyed upsert (queries.py:5-261) ---------------------------


def q_upsert_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics: apply the same update batch twice — the second
    application must be a no-op (ON DUPLICATE KEY UPDATE contract).
    Result is the post-merge state aggregated by status."""
    orders = load_table(spark, sf_dir, "orders")
    updates = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        F.lit("U").alias("o_orderstatus"),
    )
    merged = upsert_dataframe(
        orders, updates, keys=["o_orderkey"], update_cols=["o_totalprice", "o_orderstatus"]
    )
    merged2 = upsert_dataframe(
        merged, updates, keys=["o_orderkey"], update_cols=["o_totalprice", "o_orderstatus"]
    )
    return merged2.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), _dsum("o_totalprice").alias("total")
    )


registry.register(
    "upsert_idempotent",
    q_upsert_idempotent,
    """
    WITH merged AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000.0
                  ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 10 = 0 THEN 'U'
                  ELSE o_orderstatus END AS o_orderstatus
      FROM orders
    )
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM merged GROUP BY o_orderstatus
    """,
)


# --- A10: partitioned file sink (050:124-127) — value-verified round trip ----


def q_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recent-5-games CSV export analog: one partitioned write replaces
    the reference's per-player CSV loop; the check reads the files back
    and aggregates VALUES (not just counts) against an oracle over the
    source parquet — any row loss, type corruption, or partition-value
    mangling in the round trip breaks the hash. Partition column count
    is bounded (mod 16) — at 100 TB you partition by a bounded derived
    key, never by raw player id (small-files)."""
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    top5 = top_k_per_key(
        orders,
        ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
        k=5,
    ).select(
        "o_custkey",
        "o_orderkey",
        F.col("o_totalprice"),
        (F.col("o_custkey") % 16).alias("bucket"),
    )
    out = tempfile.mkdtemp(prefix="abs_csv_sink_")
    top5.write.mode("overwrite").partitionBy("bucket").csv(out, header=True)
    back = spark.read.csv(out, header=True, inferSchema=True)
    return back.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.sum(dec_portable("o_totalprice", 18, 2)).cast("double").alias(
            "total_price"
        ),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
        F.countDistinct("o_custkey").alias("n_cust"),
    )


registry.register(
    "partitioned_sink",
    q_partitioned_sink,
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    SELECT o_custkey % 16 AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key,
           COUNT(DISTINCT o_custkey) AS n_cust
    FROM ranked WHERE rn <= 5
    GROUP BY 1
    """,
)
