"""Relational breadth beyond the reference's surface: as-of / range
joins, multi-dimensional aggregation (rollup / cube), distinct and
approximate aggregates, exact percentiles, frame-spec windows, and
semi / anti joins. Everything the reference *could* need next, phrased
Spark-first with DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_baseball_spark import registry
from airflow_baseball_spark.operators.asof import asof_join
from airflow_baseball_spark.functions.scalar import dec_portable, round6_portable
from airflow_baseball_spark.schemas import load_table


# ---------------------------------------------------------------------------
# As-of join: for each purchase, the user's most recent prior error
# ---------------------------------------------------------------------------


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("err_id"), F.col("value").alias("err_value")
    )
    out = asof_join(purchases, errors, on=["user_id"])
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("err_id_asof").alias("err_id"),
        # portable round-2: ROUND(x,2) ties diverge cross-engine on
        # 3-decimal values (Spark shortest-string vs DuckDB binary) —
        # same IEEE floor form as round6_portable, scale 2
        (F.floor(F.col("err_value_asof") * 100 + F.lit(0.5)) / 100.0).alias(
            "err_value"
        ),
    )


registry.register(
    "asof_join",
    q_asof_join,
    """
    SELECT l.event_id, l.user_id, l.ts,
           r.event_id AS err_id,
           FLOOR(r.value * 100 + 0.5) / 100 AS err_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)


# ---------------------------------------------------------------------------
# Range join: views within the hour before each purchase
# ---------------------------------------------------------------------------


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key + time-range join: Catalyst plans a sort-merge join on
    user_id with the range predicate as a post-join filter — the range
    never explodes beyond the user's own events."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    joined = p.join(
        v,
        (p["user_id"] == v["user_id"])
        & (v["v_ts"] < p["p_ts"])
        & (v["v_ts"] >= p["p_ts"] - F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy("purchase_id").agg(
        F.count("v_ts").alias("n_views_before")
    )


registry.register(
    "range_join",
    q_range_join,
    """
    SELECT p.event_id AS purchase_id, COUNT(v.ts) AS n_views_before
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts < p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
    GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# Rollup / cube
# ---------------------------------------------------------------------------


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id("l_returnflag", "l_linestatus").alias("gid"),
        F.sum(dec_portable("l_quantity", 18, 2)).cast("double").alias("sum_qty"),
        F.count("*").alias("n_rows"),
    )


registry.register(
    "rollup_agg",
    q_rollup,
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id("o_orderstatus", "o_orderpriority").alias("gid"),
        F.count("*").alias("n_orders"),
        F.sum(dec_portable("o_totalprice", 18, 2)).cast("double").alias("total_price"),
    )


registry.register(
    "cube_agg",
    q_cube,
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube sugar over):
    detail, per-flag, and grand-total levels in one pass — Spark expands
    to a single Expand + hash-agg, one scan instead of three."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


registry.register(
    "grouping_sets",
    q_grouping_sets,
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)


# ---------------------------------------------------------------------------
# Pivot / unpivot
# ---------------------------------------------------------------------------


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide pivot: one column per l_linestatus value. Pivot values are
    declared explicitly — without them Spark runs an extra distinct job
    to discover them (a full scan + shuffle, and a nondeterministic
    column order)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(dec_portable("l_quantity", 18, 2)))
        .select(
            "l_returnflag",
            F.col("F").cast("double").alias("qty_f"),
            F.col("O").cast("double").alias("qty_o"),
        )
    )


registry.register(
    "pivot_agg",
    q_pivot,
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) / 100 AS DECIMAL(18,2)))
             FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f,
           CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) / 100 AS DECIMAL(18,2)))
             FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_o
    FROM lineitem GROUP BY l_returnflag
    """,
)


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) wide measures back to long (measure, value) rows —
    in-row Expand, no shuffle beyond the feeding aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(dec_portable("l_quantity", 18, 2)).cast("double").alias("qty"),
        F.sum(dec_portable("l_extendedprice", 18, 2)).cast("double").alias("price"),
        F.sum(dec_portable("l_discount", 18, 2)).cast("double").alias("disc"),
    )
    return wide.unpivot("l_returnflag", ["qty", "price", "disc"], "measure", "value")


registry.register(
    "unpivot_melt",
    q_unpivot,
    """
    WITH wide AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS qty,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS price,
             CAST(SUM(CAST(FLOOR(l_discount * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'qty' AS measure, qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'price', price FROM wide
    UNION ALL
    SELECT l_returnflag, 'disc', disc FROM wide
    """,
)


# ---------------------------------------------------------------------------
# Distinct + approximate aggregates
# ---------------------------------------------------------------------------


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


registry.register(
    "count_distinct",
    q_count_distinct,
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY 1
    """,
)


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts, surfaced as an oracle-checkable
    bound: the estimate itself is engine-specific, so the query returns
    the exact count plus a ``within_bounds`` flag (|approx − exact| ≤
    3·rsd·exact). The oracle asserts the flag is TRUE for every group —
    an HLL regression that drifts past 3σ breaks the hash.

    The exact arm runs as a TWO-STAGE distinct (groupBy(flag, partkey)
    then count per flag) instead of ``countDistinct`` inside the same
    agg as the HLL: countDistinct next to another aggregate compiles to
    an expand (row duplication) and carries every distinct key through
    one shuffle, while the two-stage form partial-aggregates map-side —
    the shape that survives 100 TB. (Round-2 bench: the expand form
    regressed 0.71s → 1.97s; this recovers it.)"""
    li = load_table(spark, sf_dir, "lineitem")
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    )
    exact = (
        li.groupBy("l_returnflag", "l_partkey")
        .agg(F.lit(1))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_parts_exact"))
    )
    agg = exact.join(F.broadcast(approx), "l_returnflag")
    return agg.select(
        "l_returnflag",
        "n_parts_exact",
        (
            F.abs(F.col("approx_parts") - F.col("n_parts_exact"))
            <= F.col("n_parts_exact") * (3 * 0.02)
        ).alias("within_bounds"),
    )


registry.register(
    "approx_distinct",
    q_approx_distinct,
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts_exact,
           TRUE AS within_bounds
    FROM lineitem GROUP BY 1
    """,
)


def q_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches): build one sketch
    per group, then union the *sketches* — not the rows — and estimate
    the global distinct. This is the re-aggregation pattern 100 TB
    pipelines rely on (store per-partition/day sketches, merge at
    query time instead of rescanning); the bounded check follows
    ``approx_distinct``: |estimate − exact| ≤ 5% breaks the hash if
    violated."""
    li = load_table(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey", F.lit(12)).alias("sk")
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_all")
    )
    exact = li.agg(F.countDistinct("l_partkey").alias("n_exact"))
    return merged.crossJoin(exact).select(
        "n_exact",
        (
            F.abs(F.col("approx_all") - F.col("n_exact"))
            <= F.col("n_exact") * 0.05
        ).alias("within_bounds"),
    )


registry.register(
    "hll_sketch_union",
    q_hll_sketch_union,
    """
    SELECT COUNT(DISTINCT l_partkey) AS n_exact, TRUE AS within_bounds
    FROM lineitem
    """,
)


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile (KLL-style sketch) checked by *rank
    error*, the sketch's actual contract: the estimated p50's true CDF
    position must sit in [0.5 − ε, 0.5 + ε]. Value-space deltas are
    distribution-dependent, rank position is not — so the bound is
    engine-portable and the oracle just asserts TRUE.

    Tie-safe form: with heavy ties at the median, P(value ≤ p50) alone
    can legitimately exceed 0.5 + ε even for an exact median (the
    empirical CDF jumps across the tied value). The correct assertion
    is that the CDF *interval spanning the returned value* intersects
    [0.5 − ε, 0.5 + ε]: P(value < p50) ≤ 0.5 + ε AND
    P(value ≤ p50) ≥ 0.5 − ε."""
    ev = load_table(spark, sf_dir, "events")
    approx = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 10000)").alias("p50_a")
    )
    return (
        ev.join(F.broadcast(approx), "event_type")
        .groupBy("event_type")
        .agg(
            F.avg((F.col("value") < F.col("p50_a")).cast("double")).alias(
                "frac_lt"
            ),
            F.avg((F.col("value") <= F.col("p50_a")).cast("double")).alias(
                "frac_le"
            ),
        )
        .select(
            "event_type",
            ((F.col("frac_lt") <= 0.51) & (F.col("frac_le") >= 0.49)).alias(
                "rank_ok"
            ),
        )
    )


registry.register(
    "approx_quantiles",
    q_approx_quantiles,
    """
    SELECT DISTINCT event_type, TRUE AS rank_ok FROM events
    """,
)


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``, both NIST R-7)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


registry.register(
    "percentiles",
    q_percentiles,
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.9), 6) AS p90,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# Frame-spec windows: lag/lead, moving average, cumulative sum
# ---------------------------------------------------------------------------


def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")

    def _cents(c: str):
        return F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")

    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        # quantize-before-sum (house exactness rule): the windowed
        # aggregates accumulate integer CENTS — float window sums are
        # not engine-portable even at identical frames, because DuckDB
        # evaluates windowed SUM/AVG through a segment tree whose
        # combine order differs from Spark's sequential running add
        # (caught by the driverish tie vintage)
        (
            F.floor(
                F.avg(_cents("value")).over(w.rowsBetween(-3, -1)) / 100.0
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("mavg3"),
        (
            F.sum(_cents("value"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            / 100.0
        ).alias("cum_value"),
        F.row_number().over(w).alias("rn"),
    )


registry.register(
    "window_frames",
    q_window_frames,
    """
    SELECT event_id, user_id,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           FLOOR(AVG(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                   OVER (w ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
                 / 100.0 * 1000000.0 + 0.5) / 1000000.0 AS mavg3,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                  OVER (w ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / 100 AS cum_value,
           ROW_NUMBER() OVER w AS rn
    FROM events WHERE user_id < 100
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)


# ---------------------------------------------------------------------------
# Semi / anti joins
# ---------------------------------------------------------------------------


def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    with_orders = cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_semi")
    without = cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
    return (
        with_orders.select("c_nationkey").groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
        .withColumn("kind", F.lit("with_orders"))
        .unionByName(
            without.select("c_nationkey").groupBy("c_nationkey")
            .agg(F.count("*").alias("n"))
            .withColumn("kind", F.lit("without_orders"))
        )
    )


registry.register(
    "semi_anti_join",
    q_semi_anti,
    """
    SELECT c_nationkey, COUNT(*) AS n, 'with_orders' AS kind
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    UNION ALL
    SELECT c_nationkey, COUNT(*) AS n, 'without_orders' AS kind
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# Set operators
# ---------------------------------------------------------------------------


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT as physical aggregates, not sorts: customers
    ordering in both 1994 and 1995, and in 1994 but never after. Each
    branch reduces to custkey sets before the set op, so only distinct
    keys shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    year = F.year(F.to_date("o_orderdate"))
    y94 = orders.filter(year == 1994).select("o_custkey")
    y95 = orders.filter(year == 1995).select("o_custkey")
    both = y94.intersect(y95).withColumn("kind", F.lit("both_years"))
    only94 = y94.exceptAll(y95.distinct()).distinct().withColumn(
        "kind", F.lit("only_1994")
    )
    return both.unionByName(only94)


registry.register(
    "set_ops",
    q_set_ops,
    """
    SELECT o_custkey, 'both_years' AS kind FROM (
      SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1994
      INTERSECT
      SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995
    )
    UNION ALL
    SELECT o_custkey, 'only_1994' FROM (
      SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1994
      EXCEPT
      SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995
    )
    """,
)


# ---------------------------------------------------------------------------
# Ranking-function suite
# ---------------------------------------------------------------------------


def q_ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank / cume_dist in one
    window pass per partition key (all share one sort — one shuffle,
    one per-partition sort at any scale)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


registry.register(
    "ranking_suite",
    q_ranking_suite,
    """
    SELECT c_nationkey, c_custkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM customer
    WHERE c_custkey % 10 = 0
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)


# ---------------------------------------------------------------------------
# Array functions over the embedding column
# ---------------------------------------------------------------------------


def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-column algebra entirely in-row with higher-order
    functions (zero shuffle, zero Python): dims, L2 norm, max element,
    and the normalized first component."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    sq_sum = F.aggregate(
        v,
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return emb.select(
        "vec_id",
        F.size(v).alias("dims"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.round(F.array_max(v).cast("double"), 6).alias("max_elem"),
        F.round(v[0].cast("double") / F.sqrt(sq_sum), 6).alias("first_unit"),
    )


registry.register(
    "array_ops",
    q_array_ops,
    """
    SELECT vec_id,
           len(embedding) AS dims,
           ROUND(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_elem,
           ROUND(CAST(embedding[1] AS DOUBLE)
                 / sqrt(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS first_unit
    FROM embeddings
    """,
)


# ---------------------------------------------------------------------------
# Bucketed co-located join
# ---------------------------------------------------------------------------


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write both join sides bucketed on the key, then join + aggregate
    reading the buckets — the join itself runs with no Exchange (see
    tests/test_bucketing.py for the plan assertion). At 100 TB the
    bucketed write is paid once and every downstream key-join rides
    free."""
    import tempfile  # noqa: PLC0415 — stdlib, query-local

    from airflow_baseball_spark.operators.bucketing import (  # noqa: PLC0415
        ensure_temp_database,
        write_bucketed,
    )

    ensure_temp_database(spark, "bkt_q", tempfile.mkdtemp(prefix="bkt_q_"))
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    write_bucketed(orders, "bkt_q.orders_b", ["o_custkey"], n_buckets=8)
    write_bucketed(cust, "bkt_q.customer_b", ["c_custkey"], n_buckets=8)
    o = spark.table("bkt_q.orders_b")
    c = spark.table("bkt_q.customer_b")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(dec_portable("o_totalprice", 18, 2)).cast("double").alias("total_price"),
        )
    )


registry.register(
    "bucketed_join",
    q_bucketed_join,
    """
    SELECT c_nationkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)


# ---------------------------------------------------------------------------
# Z-order (Morton) value — the multi-dimensional data-skipping layout
# ---------------------------------------------------------------------------


def q_zorder_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-value over (o_custkey, order epoch-day): the sort key
    operators/zorder.write_zordered lays files out by, so min/max
    footer stats prune on EITHER column. The interleave is plain
    shifts/masks — whole-stage codegen, engine-portable, checked here
    term-for-term against the DuckDB mirror."""
    from airflow_baseball_spark.operators.zorder import zorder_value

    orders = load_table(spark, sf_dir, "orders")
    epoch_day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    return orders.select(
        "o_orderkey",
        zorder_value(F.col("o_custkey"), epoch_day).alias("zval"),
    )


def _zorder_sql() -> str:
    from airflow_baseball_spark.operators.zorder import zorder_sql

    z = zorder_sql(
        "o_custkey", "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))"
    )
    return f"SELECT o_orderkey, {z} AS zval FROM orders"


registry.register("zorder_value", q_zorder_value, _zorder_sql())


# ---------------------------------------------------------------------------
# IQR outlier filter — per-group robust data cleaning
# ---------------------------------------------------------------------------


def q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outliers per event_type: rows outside
    [q1 - 1.5*IQR, q3 + 1.5*IQR] of their group. The per-group
    quantile table is tiny (|groups| rows) and broadcasts back onto
    the fact — one agg shuffle plus a map-side probe; the fact is
    never sorted. Exact interpolated percentiles keep the fences
    engine-identical (rounded via the _r6 floor trick before
    comparison)."""
    ev = load_table(spark, sf_dir, "events")
    fences = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    j = ev.join(F.broadcast(fences), "event_type")
    iqr = F.col("q3") - F.col("q1")
    r6 = round6_portable
    # membership is decided on the ROUNDED fences: Spark percentile and
    # DuckDB quantile_cont interpolate with different FP op order, so a
    # raw-fence comparison could flip a boundary row between engines
    lo = r6(F.col("q1") - 1.5 * iqr)
    hi = r6(F.col("q3") + 1.5 * iqr)
    return (
        j.withColumn("lo_fence", lo)
        .withColumn("hi_fence", hi)
        .filter(
            (F.col("value") < F.col("lo_fence"))
            | (F.col("value") > F.col("hi_fence"))
        )
        .select("event_id", "event_type", "value", "lo_fence", "hi_fence")
    )


registry.register(
    "iqr_outliers",
    q_iqr_outliers,
    """
    WITH fences AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY 1
    )
    SELECT event_id, event_type, value, lo_fence, hi_fence FROM (
      SELECT e.event_id, e.event_type, e.value,
             FLOOR((q1 - 1.5 * (q3 - q1)) * 1000000.0 + 0.5) / 1000000.0
               AS lo_fence,
             FLOOR((q3 + 1.5 * (q3 - q1)) * 1000000.0 + 0.5) / 1000000.0
               AS hi_fence
      FROM events e JOIN fences f USING (event_type)
    )
    WHERE value < lo_fence OR value > hi_fence
    """,
)


# ---------------------------------------------------------------------------
# Data-quality audit (Deequ/dbt-tests style)
# ---------------------------------------------------------------------------


def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit over a deterministically-dirtied orders table
    (the clean testdata has zero violations, so both engines inject
    the same synthetic defects from o_orderkey arithmetic): null FKs,
    orphan FKs, duplicate keys, negative prices
    (operators/quality.dq_report)."""
    from airflow_baseball_spark.operators.quality import dq_report

    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    dirty = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit(None).cast("long"))
        .when(F.col("o_orderkey") % 73 == 0, F.lit(9999999).cast("long"))
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        F.when(F.col("o_orderkey") % 89 == 0, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    dirty = dirty.unionByName(dirty.filter(F.col("o_orderkey") % 101 == 0))
    return dq_report(
        dirty,
        key_cols=["o_orderkey"],
        not_null=["o_custkey"],
        ranges={"o_totalprice": (0.0, 1000000.0)},
        refs=[("o_custkey", cust, "c_custkey")],
    )


registry.register(
    "dq_report",
    q_dq_report,
    """
    WITH dirty0 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN NULL
                  WHEN o_orderkey % 73 = 0 THEN 9999999
                  ELSE o_custkey END AS o_custkey,
             CASE WHEN o_orderkey % 89 = 0 THEN -o_totalprice
                  ELSE o_totalprice END AS o_totalprice
      FROM orders
    ),
    dirty AS (
      SELECT * FROM dirty0
      UNION ALL
      SELECT * FROM dirty0 WHERE o_orderkey % 101 = 0
    )
    SELECT 'null_o_custkey' AS check_name,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations
    FROM dirty
    UNION ALL
    SELECT 'range_o_totalprice',
           CAST(SUM(CASE WHEN o_totalprice < 0.0 OR o_totalprice > 1000000.0
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM dirty
    UNION ALL
    SELECT 'dup_o_orderkey',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM dirty
    UNION ALL
    SELECT 'orphan_o_custkey', CAST(COUNT(*) AS BIGINT)
    FROM dirty d
    WHERE d.o_custkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = d.o_custkey)
    """,
)


# ---------------------------------------------------------------------------
# PageRank over the supplier→part bipartite graph
# ---------------------------------------------------------------------------


def _supplier_part_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier→part edges off lineitem (part ids offset into
    their own namespace) — the one fact-scale derivation `pagerank`
    and `bfs_reachability` both walk. r11 (optimization): materialized
    once per (session, sf_dir) via operators/graph.materialize_edge_list
    (the established shared-subtree seam — same as _above_avg_edges /
    _cluster_labels), so the second consumer reads the checkpointed
    edge list instead of re-running the lineitem DISTINCT."""
    from airflow_baseball_spark.operators.graph import materialize_edge_list

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        return li.select(
            F.col("l_suppkey").alias("src"),
            (F.col("l_partkey") + F.lit(10000000)).alias("dst"),
        ).distinct()

    return materialize_edge_list(spark, sf_dir, "supplier_part_edges", build)


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round damped PageRank on distinct supplier→part edges from
    the lineitem fact (part ids offset into their own namespace). The
    oracle unrolls the identical power-method rounds as CTEs — same
    leaky-dangling variant, same IEEE arithmetic — so ranks match to
    the floor-trick rounding of the mean-normalized value (raw ranks
    are O(1/N); normalizing by N keeps six decimals meaningful at any
    graph size)."""
    from airflow_baseball_spark.operators.pagerank import pagerank

    ranks = pagerank(
        _supplier_part_edges(spark, sf_dir), iterations=3, damping=0.85
    )
    # normalize by the node count via a 1-row broadcast frame — no
    # second driver count job; the operator already paid the only one
    nn = ranks.agg(F.count("*").alias("_n"))
    return ranks.join(F.broadcast(nn)).select(
        "node",
        round6_portable(F.col("rank") * F.col("_n")).alias("rank_norm"),
    )


registry.register(
    "pagerank",
    q_pagerank,
    """
    WITH edges AS (
      SELECT DISTINCT l_suppkey AS src, l_partkey + 10000000 AS dst
      FROM lineitem
    ),
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    nn AS (SELECT COUNT(*) AS cnt FROM nodes),
    deg AS (SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY 1),
    r0 AS (SELECT node, 1.0 / (SELECT cnt FROM nn) AS r FROM nodes),
    r1 AS (
      SELECT nd.node,
             (1 - 0.85) / (SELECT cnt FROM nn)
               + 0.85 * COALESCE(SUM(r0.r / deg.out_deg), 0.0) AS r
      FROM nodes nd
      LEFT JOIN edges e ON e.dst = nd.node
      LEFT JOIN deg ON deg.src = e.src
      LEFT JOIN r0 ON r0.node = e.src
      GROUP BY 1
    ),
    r2 AS (
      SELECT nd.node,
             (1 - 0.85) / (SELECT cnt FROM nn)
               + 0.85 * COALESCE(SUM(r1.r / deg.out_deg), 0.0) AS r
      FROM nodes nd
      LEFT JOIN edges e ON e.dst = nd.node
      LEFT JOIN deg ON deg.src = e.src
      LEFT JOIN r1 ON r1.node = e.src
      GROUP BY 1
    ),
    r3 AS (
      SELECT nd.node,
             (1 - 0.85) / (SELECT cnt FROM nn)
               + 0.85 * COALESCE(SUM(r2.r / deg.out_deg), 0.0) AS r
      FROM nodes nd
      LEFT JOIN edges e ON e.dst = nd.node
      LEFT JOIN deg ON deg.src = e.src
      LEFT JOIN r2 ON r2.node = e.src
      GROUP BY 1
    )
    SELECT node,
           FLOOR(r * (SELECT cnt FROM nn) * 1000000.0 + 0.5) / 1000000.0
             AS rank_norm
    FROM r3
    """,
)


# ---------------------------------------------------------------------------
# Hypertable-style two-level time-bucket rollup
# ---------------------------------------------------------------------------


def q_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate pattern: events roll up to 5-minute
    buckets (the materialized fine level), then the HOURLY report is
    re-aggregated FROM THE BUCKETS — never re-scanning raw events.
    The oracle aggregates the raw table straight to hours, so a green
    hash proves the partial-aggregate reaggregation is lossless
    (counts and exact DECIMAL sums are associative; this is the
    invariant hypertable/materialized-rollup systems rely on).

    Scale shape: level 1 is one map-combinable shuffle keyed on
    (bucket, type) — at 100 TB this is the only pass over raw data;
    level 2 shuffles bucket-level rows only (4 orders of magnitude
    smaller). Buckets are epoch-second BIGINTs: integer flooring is
    engine-exact, and floor(epoch/300) on Spark's second-truncated
    unix_timestamp equals DuckDB's fractional epoch() floor for any
    sub-second offset."""
    ev = load_table(spark, sf_dir, "events")
    b5 = (F.floor(F.unix_timestamp("ts") / 300) * 300).alias("bucket5")
    lvl1 = ev.groupBy(b5, "event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec_portable("value", 18, 2)).alias("sum_v"),
    )
    return (
        lvl1.groupBy(
            (F.floor(F.col("bucket5") / 3600) * 3600).alias("bucket_hr"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("sum_v").cast("double").alias("total_value"),
        )
    )


registry.register(
    "time_bucket_rollup",
    q_time_bucket_rollup,
    """
    SELECT CAST(FLOOR(EPOCH(ts) / 3600) * 3600 AS BIGINT) AS bucket_hr,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# Bloom-filter pre-pruned semi-join (explicit runtime filter)
# ---------------------------------------------------------------------------


def q_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems of high-value urgent orders via the Bloom-pruned
    semi-join: the urgent-order keys build a bit-position sketch, the
    fact pre-filters through it JVM-side, and the exact semi-join
    removes false positives — so the oracle is the plain IN-subquery.
    Aggregated per returnflag to keep the checked surface compact."""
    from airflow_baseball_spark.operators.bloom import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    hot = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 200000.0)
    )
    kept = bloom_semi_join(li, hot, "l_orderkey", "o_orderkey")
    return kept.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.sum(dec_portable("l_extendedprice", 18, 2))
        .cast("double")
        .alias("total_price"),
    )


registry.register(
    "bloom_prune_join",
    q_bloom_prune_join,
    """
    SELECT l_returnflag, COUNT(*) AS n_items,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                         WHERE o_orderpriority = '1-URGENT'
                           AND o_totalprice > 200000.0)
    GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# Equi-width histogram (single-pass binning)
# ---------------------------------------------------------------------------


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin value histogram per event type: 20 bins of width 50,
    clamped at both ends. Binning is integer flooring — engine-exact —
    and the whole histogram is one map-combinable shuffle keyed on
    (type, bin); at 100 TB the exchange carries |types|x20 partials per
    task, nothing else."""
    ev = load_table(spark, sf_dir, "events")
    # clamp on the long BEFORE the int cast: a huge value must land in
    # bin 19, not overflow the cast (engines disagree on overflow)
    bin_ = (
        F.least(F.lit(19).cast("bigint"), F.greatest(F.lit(0).cast("bigint"),
                F.floor(F.col("value") / 50.0)))
        .cast("int")
        .alias("bin")
    )
    return ev.groupBy("event_type", bin_).agg(F.count("*").alias("n"))


registry.register(
    "value_histogram",
    q_value_histogram,
    """
    SELECT event_type,
           CAST(LEAST(19, GREATEST(0, FLOOR(value / 50.0))) AS INT) AS bin,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# Streaming-friendly regression suite from sufficient statistics
# ---------------------------------------------------------------------------


def q_regression_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of value over time — slope and Pearson r
    computed from the five sufficient statistics (n, Sx, Sy, Sxy, Sxx,
    Syy) accumulated as EXACT decimal sums in one map-combinable pass.

    Why not `F.corr`/`regr_slope`: those accumulate doubles in
    partition order, so two engines (or two runs at different
    parallelism) disagree in the last ulps. Exact integer/decimal
    sufficient statistics make the final IEEE formula evaluation
    bit-identical on both engines AND partition-count-invariant — the
    property that matters when the same job runs on 32 and 10,000
    cores. x is epoch seconds rebased to the dataset era so x*x stays
    well inside DECIMAL(38) at 100 TB row counts."""
    ev = load_table(spark, sf_dir, "events")
    x = (F.unix_timestamp("ts") - F.lit(1500000000)).cast("decimal(18,0)")
    y = dec_portable("value", 18, 2)
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * y).cast("decimal(38,2)")).alias("sxy"),
        F.sum((x * x).cast("decimal(38,0)")).alias("sxx"),
        F.sum((y * y).cast("decimal(38,4)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    r6 = round6_portable
    return stats.select(
        "event_type",
        "n",
        r6(cov_n / var_x * 86400.0).alias("slope_per_day"),
        r6(cov_n / (F.sqrt(var_x) * F.sqrt(var_y))).alias("pearson_r"),
    )


registry.register(
    "regression_suite",
    q_regression_suite,
    """
    WITH stats AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(CAST(CAST(FLOOR(EPOCH(ts)) AS BIGINT) - 1500000000
                 AS DECIMAL(18,0))) AS sx,
             SUM(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS sy,
             SUM(CAST(CAST(CAST(FLOOR(EPOCH(ts)) AS BIGINT) - 1500000000
                    AS DECIMAL(18,0)) * CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2))
                 AS DECIMAL(38,2))) AS sxy,
             SUM(CAST(CAST(CAST(FLOOR(EPOCH(ts)) AS BIGINT) - 1500000000
                    AS DECIMAL(18,0)) * CAST(CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                    - 1500000000 AS DECIMAL(18,0)) AS DECIMAL(38,0))) AS sxx,
             SUM(CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2))
                 AS DECIMAL(38,4))) AS syy
      FROM events GROUP BY 1
    )
    SELECT event_type, n,
           FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * 86400.0 * 1000000.0 + 0.5) / 1000000.0 AS slope_per_day,
           FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0 AS pearson_r
    FROM stats
    """,
)


# ---------------------------------------------------------------------------
# BFS reachability (bounded-hop closure)
# ---------------------------------------------------------------------------


def q_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collaboration distance: starting from nation-1 suppliers, walk
    the supplier↔part supply graph (both directions) up to 4 hops —
    dist 1 = parts they supply, dist 2 = suppliers sharing a part, and
    so on. The oracle is a recursive CTE carrying (node, dist) pairs
    with a MIN(dist) collapse — hop counts are integers, so the match
    is exact. Part ids are offset into their own namespace."""
    from airflow_baseball_spark.operators.bfs import bfs_distances

    sp = _supplier_part_edges(spark, sf_dir)
    edges = sp.unionByName(sp.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sources = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 1)
        .select(F.col("s_suppkey").alias("node"))
    )
    return bfs_distances(edges, sources, max_hops=4)


registry.register(
    "bfs_reachability",
    q_bfs_reachability,
    """
    WITH RECURSIVE sp AS (
      SELECT DISTINCT l_suppkey AS src, l_partkey + 10000000 AS dst
      FROM lineitem
    ),
    edges AS (
      SELECT src, dst FROM sp UNION ALL SELECT dst, src FROM sp
    ),
    walk(node, dist) AS (
      SELECT s_suppkey AS node, 0 AS dist FROM supplier WHERE s_nationkey = 1
      UNION
      SELECT e.dst, w.dist + 1
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.dist < 4
    )
    SELECT node, MIN(dist) AS dist FROM walk GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# EWMA smoothing (finite-window exponential weights)
# ---------------------------------------------------------------------------


def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of purchase
    values (alpha=0.5, 8-lag window, weights renormalized over the
    lags that exist near series starts).

    Determinism: alpha=0.5 makes every weight an exact power of two,
    the lag expansion fixes the summation order textually (left-assoc
    identical IEEE adds on both engines), and the (ts, event_id) sort
    key totals the order — so the floor-trick rounding is belt and
    braces, not a crutch. Scale shape: one shuffle on user_id; all 8
    lags share the single window sort (one Window node, plan-tested
    elsewhere for the same pattern)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "ts", "value")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    terms_n = []
    terms_d = []
    for j in range(8):
        x = F.lag("value", j).over(w) if j else F.col("value")
        wt = F.lit(0.5 ** j)
        terms_n.append(F.when(x.isNotNull(), x * wt).otherwise(F.lit(0.0)))
        terms_d.append(F.when(x.isNotNull(), wt).otherwise(F.lit(0.0)))
    num = terms_n[0]
    den = terms_d[0]
    for tn, td in zip(terms_n[1:], terms_d[1:]):
        num = num + tn
        den = den + td
    return ev.select(
        "user_id", "event_id", round6_portable(num / den).alias("ewma")
    )


def _ewma_oracle() -> str:
    # build the same fixed-order lag expansion textually
    terms_n = ["CASE WHEN value IS NOT NULL THEN value * 1.0 ELSE 0.0 END"]
    terms_d = ["CASE WHEN value IS NOT NULL THEN 1.0 ELSE 0.0 END"]
    for j in range(1, 8):
        lag = (
            f"LAG(value, {j}) OVER (PARTITION BY user_id "
            f"ORDER BY ts, event_id)"
        )
        wt = repr(0.5 ** j)
        terms_n.append(f"COALESCE({lag} * {wt}, 0.0)")
        terms_d.append(f"CASE WHEN {lag} IS NOT NULL THEN {wt} ELSE 0.0 END")
    num = " + ".join(terms_n)
    den = " + ".join(terms_d)
    return f"""
    SELECT user_id, event_id,
           FLOOR(({num}) / ({den}) * 1000000.0 + 0.5) / 1000000.0 AS ewma
    FROM events
    WHERE event_type = 'purchase'
    """


registry.register("ewma_smooth", q_ewma_smooth, _ewma_oracle())


# ---------------------------------------------------------------------------
# Skew profiler (heavy-hitter diagnosis)
# ---------------------------------------------------------------------------


def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution diagnosis for a prospective shuffle key: the
    top-5 heaviest event types with each key's share of rows and the
    skew factor (key count over mean key count) — the number that
    decides whether `operators/salt.py` is needed BEFORE the job runs
    at scale. One combinable count per key plus a 1-row global frame
    broadcast back; the top-5 is TakeOrdered, never a full sort."""
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    totals = per_key.agg(
        F.sum("n").alias("total_n"), F.count("*").alias("n_keys")
    )
    r6 = round6_portable
    return (
        per_key.join(F.broadcast(totals))
        .select(
            "event_type",
            "n",
            r6(F.col("n") / F.col("total_n")).alias("row_share"),
            r6(F.col("n") * F.col("n_keys") / F.col("total_n")).alias(
                "skew_factor"
            ),
        )
        .orderBy(F.col("n").desc(), "event_type")
        .limit(5)
    )


registry.register(
    "skew_profile",
    q_skew_profile,
    """
    WITH per_key AS (
      SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1
    ),
    totals AS (
      SELECT SUM(n) AS total_n, COUNT(*) AS n_keys FROM per_key
    )
    SELECT event_type, n,
           FLOOR(CAST(n AS DOUBLE) / total_n * 1000000.0 + 0.5)
             / 1000000.0 AS row_share,
           FLOOR(CAST(n AS DOUBLE) * n_keys / total_n * 1000000.0 + 0.5)
             / 1000000.0 AS skew_factor
    FROM per_key, totals
    ORDER BY n DESC, event_type
    LIMIT 5
    """,
)


# ---------------------------------------------------------------------------
# Fuzzy self-join (deletion-neighborhood blocking) and equi-depth bins
# ---------------------------------------------------------------------------


def _fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b) customer pairs within one name edit, via SymDelete
    blocking — session-memoized (operators/graph.materialize_edge_list)
    because fuzzy_name_join and fs_linkage_score both consume it and
    the blocking+verify pass is the expensive part (~4.6 s at sf0.1)."""
    from airflow_baseball_spark.operators.graph import materialize_edge_list

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        from airflow_baseball_spark.operators.fuzzy import fuzzy_self_join

        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_name"
        )
        return fuzzy_self_join(cust, "c_custkey", "c_name")

    return materialize_edge_list(spark, sf_dir, "fuzzy_name_pairs", build)


def q_fuzzy_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer names within one edit of each other, found via
    SymDelete blocking (operators/fuzzy.py) instead of the all-pairs
    scan the oracle runs — the candidate set is linear in the corpus,
    the exact Levenshtein verify touches candidates only."""
    return _fuzzy_name_pairs(spark, sf_dir)


registry.register(
    "fuzzy_name_join",
    q_fuzzy_name_join,
    """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
    FROM customer a, customer b
    WHERE a.c_custkey < b.c_custkey
      AND levenshtein(a.c_name, b.c_name) <= 1
    """,
)


def q_equi_depth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) equi-depth binning of purchase values per event type,
    reduced to per-bin (count, exact-decimal sum). The (value,
    event_id) sort key totals the order, so tile boundaries are
    deterministic on both engines.

    r7: the rank comes from the GROUPED two-level prefix sum
    (rank_select.with_global_rank(group_cols=[event_type])) and the
    tile from NTILE's exact integer split rule — the previous
    per-type NTILE window serialized each of the ~5 types' full
    volume through one partition, the same low-cardinality-window
    scale flag the r6 verdict raised for qq_table."""
    from airflow_baseball_spark.operators.rank_select import with_global_rank

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "value",
        (dec_portable("value", 18, 2) * 100).cast("long").alias("vc"),
    )
    ranked = with_global_rank(
        ev,
        "vc",
        tiebreak_cols=["event_id"],
        rank_col="i",
        group_cols=["event_type"],
    )
    counts = ev.groupBy("event_type").agg(F.count("*").alias("nn"))
    tiled = ranked.join(F.broadcast(counts), "event_type").withColumn(
        "quartile",
        F.expr(
            "CASE WHEN i <= (nn % 4) * (nn div 4 + 1)"
            "     THEN (i - 1) div (nn div 4 + 1) + 1"
            "     ELSE (nn % 4) + (i - (nn % 4) * (nn div 4 + 1) - 1)"
            "          div (nn div 4) + 1 END"
        ).cast("int"),
    )
    return tiled.groupBy("event_type", "quartile").agg(
        F.count("*").alias("n"),
        F.sum(dec_portable("value", 18, 2))
        .cast("double")
        .alias("bin_sum"),
    )


registry.register(
    "equi_depth_bins",
    q_equi_depth_bins,
    """
    WITH tiled AS (
      SELECT event_type, value,
             NTILE(4) OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS quartile
      FROM events
    )
    SELECT event_type, quartile, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS bin_sum
    FROM tiled
    GROUP BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# Bucketed table checksum (data-diff / replication reconciliation)
# ---------------------------------------------------------------------------


def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bucket fingerprint of the orders table: count + mod-folded
    BIGINT hash sum + XOR fold per bucket, one combinable aggregation
    pass.
    The oracle recomputes the identical md5-derived 60-bit hashes in
    DuckDB — a green hash here literally IS the cross-engine
    reconciliation this operator exists for. Every column is rendered
    to an engine-pinned textual form (explicit decimal scale, fixed
    timestamp format) before hashing."""
    from airflow_baseball_spark.operators.checksum import table_checksum

    orders = load_table(spark, sf_dir, "orders")
    return table_checksum(
        orders,
        [
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
            dec_portable("o_totalprice", 18, 2).cast("string"),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        ],
    )


registry.register(
    "table_checksum",
    q_table_checksum,
    """
    WITH hashed AS (
      SELECT CAST(CONCAT('0x', SUBSTRING(MD5(CONCAT_WS('|',
               CAST(o_orderkey AS VARCHAR),
               CAST(o_custkey AS VARCHAR),
               o_orderstatus,
               o_orderpriority,
               CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2)) AS VARCHAR),
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'))), 1, 15))
             AS BIGINT) AS h
      FROM orders
    )
    SELECT h % 64 AS bucket, COUNT(*) AS n_rows,
           CAST(SUM(h % 4294967296) AS BIGINT) AS hash_sum,
           BIT_XOR(h) AS hash_xor
    FROM hashed GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# Count-min sketch heavy-hitter estimation
# ---------------------------------------------------------------------------


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=3 rows x w=256 counters) over event user
    traffic, evaluated against exact counts for a deterministic probe
    set (user_id % 97 == 0): the sketch is 768 mergeable cells
    regardless of user cardinality — the shape that answers "how many
    events did user X generate" over 100 TB without a per-user table.
    `overcount = est - exact` is the CMS guarantee surface (always
    >= 0, bounded by colliding mass). Hashes are md5-derived and
    engine-portable, so the oracle replicates the sketch exactly."""
    from airflow_baseball_spark.operators.checksum import portable_hash60

    ev = load_table(spark, sf_dir, "events")
    # exact per-key counts first: combinable, and the sketch builds
    # from |keys| rows instead of |events|
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("n"))

    def cell(i: int) -> F.Column:
        return F.pmod(
            portable_hash60(
                F.concat(F.lit(str(i)), F.lit("#"), F.col("user_id").cast("string"))
            ),
            F.lit(256),
        )

    # build the three cell tables (each <=256 rows) and broadcast
    # them onto the probe set
    probes = per_key.filter(F.col("user_id") % 97 == 0)
    est_cols = []
    out = probes
    for i in range(3):
        tbl = (
            per_key.groupBy(cell(i).alias(f"cell{i}"))
            .agg(F.sum("n").alias(f"m{i}"))
        )
        out = out.withColumn(f"c{i}", cell(i)).join(
            F.broadcast(tbl), F.col(f"c{i}") == F.col(f"cell{i}")
        )
        est_cols.append(F.col(f"m{i}"))
    est = F.least(*est_cols)
    return out.select(
        "user_id",
        F.col("n").alias("exact_n"),
        est.alias("cms_est"),
        (est - F.col("n")).alias("overcount"),
    )


def _cms_oracle() -> str:
    hash_expr = (
        "CAST(CONCAT('0x', SUBSTRING(MD5(CONCAT('{i}', '#', "
        "CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 256"
    )
    cells = "\n".join(
        f"""    cells{i} AS (
      SELECT {hash_expr.format(i=i)} AS cell{i}, SUM(n) AS m{i}
      FROM per_key GROUP BY 1
    ),"""
        for i in range(3)
    )
    joins = "\n".join(
        f"    JOIN cells{i} ON {hash_expr.format(i=i)} = cells{i}.cell{i}"
        for i in range(3)
    )
    return f"""
    WITH per_key AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1
    ),
{cells}
    probes AS (
      SELECT user_id, n FROM per_key WHERE user_id % 97 = 0
    )
    SELECT user_id, n AS exact_n,
           LEAST(m0, m1, m2) AS cms_est,
           LEAST(m0, m1, m2) - n AS overcount
    FROM probes
{joins}
    """


registry.register("cms_heavy_hitters", q_cms_heavy_hitters, _cms_oracle())


# ---------------------------------------------------------------------------
# Chi-square dependence scoring (feature selection / drift detection)
# ---------------------------------------------------------------------------


def q_chi2_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type chi-square contribution of the type x hour-of-day
    contingency table — the counts-only dependence score used for
    feature selection and distribution-drift alarms.

    Exactness (r8 rebase — driver-red r5/r6/r7 while bit-exact
    locally): (1) the hour bin is calendar HOUR(ts) on BOTH sides —
    the one hour mechanism actually attested GREEN in the r7 driver
    window (probe_events_hour_raw), where the r7 epoch-hour bin
    (unix_micros div us/hour) sat on the probe-RED epoch-µs read; the
    oracle's HOUR runs on the registry-normalized naive-UTC view, so
    it cannot shift with the DuckDB session timezone either; (2) each
    per-cell (observed-expected)^2/expected term is pure rational
    arithmetic on exact integer counts — an identical IEEE expression
    tree on both engines — quantized to BIGINT micro-units BEFORE the
    cross-row reduction; and (3) the reported chi2_contrib_micro IS
    that BIGINT (the final /1e6-to-double is dropped on both sides
    per the r6 verdict, so the hash surface is pure integer)."""
    ev = load_table(spark, sf_dir, "events")
    hr = F.hour("ts")
    cellc = ev.groupBy(
        "event_type", hr.alias("hr")
    ).agg(F.count("*").alias("o"))
    row_tot = cellc.groupBy("event_type").agg(F.sum("o").alias("rt"))
    col_tot = cellc.groupBy("hr").agg(F.sum("o").alias("ct"))
    n_tot = cellc.agg(F.sum("o").alias("nt"))
    e = F.col("rt").cast("double") * F.col("ct") / F.col("nt")
    term = (F.col("o") - e) * (F.col("o") - e) / e
    term_q = F.floor(term * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return (
        cellc.join(F.broadcast(row_tot), "event_type")
        .join(F.broadcast(col_tot), "hr")
        .join(F.broadcast(n_tot))
        .groupBy("event_type")
        .agg(
            F.sum("o").alias("n"),
            F.sum(term_q).alias("chi2_contrib_micro"),
        )
    )


registry.register(
    "chi2_features",
    q_chi2_features,
    """
    WITH cellc AS (
      SELECT event_type, HOUR(ts) AS hr, COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    row_tot AS (SELECT event_type, SUM(o) AS rt FROM cellc GROUP BY 1),
    col_tot AS (SELECT hr, SUM(o) AS ct FROM cellc GROUP BY 1),
    n_tot AS (SELECT SUM(o) AS nt FROM cellc)
    SELECT c.event_type, SUM(o) AS n,
           SUM(CAST(FLOOR((o - CAST(rt AS DOUBLE) * ct / nt)
                          * (o - CAST(rt AS DOUBLE) * ct / nt)
                          / (CAST(rt AS DOUBLE) * ct / nt)
                          * 1000000.0 + 0.5) AS BIGINT)) AS chi2_contrib_micro
    FROM cellc c
    JOIN row_tot r ON c.event_type = r.event_type
    JOIN col_tot t ON c.hr = t.hr
    CROSS JOIN n_tot
    GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# Event-transition matrix (first-order Markov counts)
# ---------------------------------------------------------------------------


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event sequencing reduced to the first-order transition
    matrix: counts and row-normalized probabilities of event_type →
    next event_type — the journey-analysis / next-action primitive.
    One shuffle on user_id for the lead window; the matrix agg and
    row totals are |types|^2-sized. The (ts, event_id) key totals the
    order, so successor assignment is engine-deterministic."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    row_tot = trans.groupBy(F.col("event_type").alias("rt_type")).agg(
        F.sum("n").alias("row_n")
    )
    return (
        trans.join(F.broadcast(row_tot), trans["event_type"] == F.col("rt_type"))
        .select(
            "event_type",
            "next_type",
            "n",
            round6_portable(F.col("n") / F.col("row_n")).alias("p"),
        )
    )


registry.register(
    "event_transitions",
    q_event_transitions,
    """
    WITH seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type, next_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    row_tot AS (
      SELECT event_type, SUM(n) AS row_n FROM trans GROUP BY 1
    )
    SELECT t.event_type, t.next_type, t.n,
           FLOOR(CAST(t.n AS DOUBLE) / r.row_n * 1000000.0 + 0.5)
             / 1000000.0 AS p
    FROM trans t JOIN row_tot r ON t.event_type = r.event_type
    """,
)


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lineitem⋈orders output cardinality computed WITHOUT
    executing the join: |A ⋈_k B| = Σ_k cnt_A(k)·cnt_B(k). Two
    combiner-friendly key-count aggs meet in a key-cardinality-sized
    join — the planning primitive behind join reordering and skew
    pre-detection (per-key products also expose the hottest keys; the
    skew_profile operator reports those directly).

    At 100 TB this is the cheap pre-flight you run before committing
    to a shuffle join strategy: the count tables are |keys| rows, not
    fact rows, and broadcast when one side's key set is small."""
    li = load_table(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.count("*").alias("cnt_a")
    )
    orders = load_table(spark, sf_dir, "orders").groupBy("o_orderkey").agg(
        F.count("*").alias("cnt_b")
    )
    return li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).agg(
        F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("est_join_rows"),
        F.count("*").alias("n_matching_keys"),
        F.max(F.col("cnt_a") * F.col("cnt_b")).alias("max_key_contribution"),
    )


registry.register(
    "join_size_estimate",
    q_join_size_estimate,
    """
    WITH a AS (SELECT l_orderkey AS k, COUNT(*) AS cnt_a
               FROM lineitem GROUP BY 1),
         b AS (SELECT o_orderkey AS k, COUNT(*) AS cnt_b
               FROM orders GROUP BY 1)
    SELECT SUM(a.cnt_a * b.cnt_b) AS est_join_rows,
           COUNT(*) AS n_matching_keys,
           MAX(a.cnt_a * b.cnt_b) AS max_key_contribution
    FROM a JOIN b ON a.k = b.k
    """,
)


def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users seen TO DATE, per day — the classic operator a
    window cannot express (COUNT(DISTINCT) OVER a running frame is
    unsupported and would be quadratic anyway). The scalable identity:
    cumulative-distinct(day) = running sum of FIRST-SEEN counts. One
    user-key agg finds each user's first day, one day-key count, and
    a running sum over the day-cardinality table.

    The running-sum window orders a days-sized table, not the log; at
    century scale that's still thousands of rows on one partition —
    nothing. The fact is shuffled once, on user_id."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("d").alias("first_day"))
    per_day = first_seen.groupBy("first_day").agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.col("first_day").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_distinct_users"),
    )


registry.register(
    "cumulative_distinct_users",
    q_cumulative_distinct_users,
    """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY 1
    ),
    per_day AS (
      SELECT first_day, COUNT(*) AS new_users FROM first_seen GROUP BY 1
    )
    SELECT first_day AS day, new_users,
           SUM(new_users) OVER (
             ORDER BY first_day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cumulative_distinct_users
    FROM per_day
    """,
)


def q_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-3 customers by balance KEEPING ties: RANK (not
    row_number) so equal balances at the boundary all survive — the
    semantic difference that silently loses rows when top-k is built
    with row_number and the measure has duplicates.

    r7 (low-cardinality-window sweep): customer is fact-scale at
    100 TB TPC-H geometry, so the old 25-partition window sorted
    n/25 raw rows per nation. Now the per-nation rank-3 VALUE (the
    (n−2)-th smallest balance-in-cents, duplicates counted) comes
    from the grouped two-pass histogram (rank_select.rank_pick);
    only rows ≥ that broadcast threshold — exactly the rank≤3 set,
    since rank depends only on the count of strictly-greater rows,
    all of which survive the filter — reach the window, which then
    sorts ≤(3+ties) rows per nation. Nations with <3 customers have
    no locatable rank (k≤0) and keep every row via the null-threshold
    branch. Balances are DECIMAL(12,2) so the cents cast is exact and
    the threshold comparison engine-exact."""
    from airflow_baseball_spark.operators.rank_select import rank_pick

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey", "c_acctbal"
    )
    thr = (
        rank_pick(
            cust.select(
                "c_nationkey",
                (F.col("c_acctbal") * 100).cast("long").alias("cents"),
            ),
            "cents",
            [("t3", lambda n: n - 2)],
            group_cols=["c_nationkey"],
        )
        .filter(F.col("rank_label") == "t3")
        .select("c_nationkey", F.col("v").alias("thr_cents"))
    )
    survivors = cust.join(F.broadcast(thr), "c_nationkey", "left").filter(
        F.col("thr_cents").isNull()
        | ((F.col("c_acctbal") * 100).cast("long") >= F.col("thr_cents"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return (
        survivors.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rnk")
    )


registry.register(
    "topk_with_ties",
    q_topk_with_ties,
    """
    SELECT c_nationkey, c_custkey, c_acctbal, rnk FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             CAST(RANK() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC) AS INT) AS rnk
      FROM customer
    ) WHERE rnk <= 3
    """,
)


def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the DAILY-revenue series per order year:
    largest drop from any prior day's peak to a later day's value.
    (The cumulative-revenue curve would be the textbook drawdown
    input, but with nonnegative daily revenue it is monotone and the
    drawdown is vacuously zero — the daily series actually falls.)
    Running-peak window and final agg share ONE (year, date)-ordered
    sort over the days-per-year-sized aggregate, not the fact;
    revenue stays exact decimal until the final subtraction so the
    peak/trough comparison is engine-exact."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.year("o_orderdate").alias("yr"), F.to_date("o_orderdate").alias("d")
    ).agg(F.sum(dec_portable("o_totalprice", 18, 2)).alias("rev"))
    w_run = Window.partitionBy("yr").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    curved = daily.select(
        "yr", "rev", F.max("rev").over(w_run).alias("peak")
    )
    return curved.groupBy("yr").agg(
        F.max(F.col("peak") - F.col("rev")).cast("double").alias("max_drawdown"),
        F.max("peak").cast("double").alias("peak_daily_revenue"),
        F.count("*").alias("n_days"),
    )


registry.register(
    "max_drawdown",
    q_max_drawdown,
    """
    WITH daily AS (
      SELECT YEAR(o_orderdate) AS yr, CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2
    ),
    curved AS (
      SELECT yr, rev,
             MAX(rev) OVER (PARTITION BY yr ORDER BY d
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS peak
      FROM daily
    )
    SELECT yr,
           CAST(MAX(peak - rev) AS DOUBLE) AS max_drawdown,
           CAST(MAX(peak) AS DOUBLE) AS peak_daily_revenue,
           COUNT(*) AS n_days
    FROM curved GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# Fellegi-Sunter record-linkage scoring over the fuzzy candidates
# ---------------------------------------------------------------------------

# ln(m/u) agreement and ln((1-m)/(1-u)) disagreement weights in exact
# integer micro-nats, precomputed HERE (plain Python floats at import)
# so neither engine runs ln at query time and the per-pattern score is
# a literal integer sum. (m, u) per field are the standard FS
# conditional-agreement probabilities: P(agree | match) and
# P(agree | non-match).
import math as _math

_FS_FIELDS = {
    # field: (m, u)
    "name_exact": (0.95, 0.001),
    "nation_agree": (0.90, 0.04),
    "segment_agree": (0.85, 0.20),
}
_FS_W = {
    f: (
        round(_math.log(m / u) * 1_000_000),
        round(_math.log((1 - m) / (1 - u)) * 1_000_000),
    )
    for f, (m, u) in _FS_FIELDS.items()
}
_FS_MATCH = 2_000_000  # >= 2 nats of evidence -> match
_FS_POSSIBLE = 0  # >= 0 nats -> possible / clerical review


def q_fs_linkage_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic linkage over the fuzzy name
    candidates: each candidate pair's agreement PATTERN across
    (exact-name, nation, market-segment) maps to a log-odds score —
    Σ ln(m/u) for agreeing fields, Σ ln((1-m)/(1-u)) for disagreeing —
    and a match / possible / non_match decision. Reported per pattern
    (the score is pattern-determined), with pair counts.

    The classic ER scorer on top of blocking: blocking (SymDelete,
    shared+memoized with fuzzy_name_join) bounds WHO gets compared;
    FS decides WHAT a comparison means. Exactness: weights are
    integer micro-nat literals baked at import — the per-pattern
    score is exact integer arithmetic on both engines."""
    pairs = _fuzzy_name_pairs(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    a = cust.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nat_a"),
        F.col("c_mktsegment").alias("seg_a"),
    )
    b = cust.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nat_b"),
        F.col("c_mktsegment").alias("seg_b"),
    )
    j = pairs.join(a, "id_a").join(b, "id_b")
    agrees = {
        "name_exact": F.col("name_a") == F.col("name_b"),
        "nation_agree": F.col("nat_a") == F.col("nat_b"),
        "segment_agree": F.col("seg_a") == F.col("seg_b"),
    }
    score = F.lit(0).cast("long")
    flags = []
    for f, cond in agrees.items():
        wa, wd = _FS_W[f]
        score = score + F.when(cond, F.lit(wa)).otherwise(F.lit(wd))
        flags.append(F.when(cond, 1).otherwise(0).cast("int").alias(f))
    scored = j.select(*flags, score.alias("score_micronats"))
    cls = (
        F.when(F.col("score_micronats") >= _FS_MATCH, "match")
        .when(F.col("score_micronats") >= _FS_POSSIBLE, "possible")
        .otherwise("non_match")
    )
    return (
        scored.groupBy(
            "name_exact", "nation_agree", "segment_agree", "score_micronats"
        )
        .agg(F.count("*").alias("n_pairs"))
        .select(
            "name_exact",
            "nation_agree",
            "segment_agree",
            "score_micronats",
            cls.alias("decision"),
            "n_pairs",
        )
    )


def _fs_sql() -> str:
    terms, flags = [], []
    for f, cond in [
        ("name_exact", "a.c_name = b.c_name"),
        ("nation_agree", "a.c_nationkey = b.c_nationkey"),
        ("segment_agree", "a.c_mktsegment = b.c_mktsegment"),
    ]:
        wa, wd = _FS_W[f]
        terms.append(f"CASE WHEN {cond} THEN {wa} ELSE {wd} END")
        flags.append(
            f"CAST(CASE WHEN {cond} THEN 1 ELSE 0 END AS INTEGER) AS {f}"
        )
    return f"""
    WITH pairs AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a, customer b
      WHERE a.c_custkey < b.c_custkey
        AND levenshtein(a.c_name, b.c_name) <= 1
    ),
    scored AS (
      SELECT {", ".join(flags)},
             CAST({" + ".join(terms)} AS BIGINT) AS score_micronats
      FROM pairs p
      JOIN customer a ON p.id_a = a.c_custkey
      JOIN customer b ON p.id_b = b.c_custkey
    )
    SELECT name_exact, nation_agree, segment_agree, score_micronats,
           CASE WHEN score_micronats >= {_FS_MATCH} THEN 'match'
                WHEN score_micronats >= {_FS_POSSIBLE} THEN 'possible'
                ELSE 'non_match' END AS decision,
           COUNT(*) AS n_pairs
    FROM scored
    GROUP BY 1, 2, 3, 4
    """


registry.register("fs_linkage_score", q_fs_linkage_score, _fs_sql())


# ---------------------------------------------------------------------------
# Hilbert vs Morton locality audit
# ---------------------------------------------------------------------------


def q_hilbert_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout bakeoff: sort the orders fact by a Morton z-value
    vs an order-8 Hilbert index over (custkey, order-day) and measure
    each curve's locality as the mean L1 jump between
    curve-consecutive rows — the number that decides which clustered
    layout `zorder_value`/`zone_map_prune` should write: a curve with
    smaller adjacent jumps packs 2-D-close rows into the same row
    groups, so min/max footer pruning discards more of the file for
    2-D range predicates (Hilbert's worst-case adjacent jump is 1;
    Morton takes power-of-two cliffs at quadrant seams).

    Exactness: both indices are pure integer shift/mask/CASE
    pipelines (operators/zorder, mirrored term-for-term in the
    oracle); jumps are exact integer L1 distances; the two means are
    the only divisions, `_r6`-bounded. Curve ties order by orderkey,
    so the walk is engine-deterministic.

    Scale: two sorts of (key, coords) pairs — exactly the shuffle a
    real re-layout job pays — then one lag window each; at 100 TB
    you would range-partition on the curve value, which is the same
    exchange."""
    from airflow_baseball_spark.operators.zorder import (
        with_hilbert,
        zorder_value,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("cx"),
        (
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
            % 256
        ).alias("cy"),
    )
    cells = with_hilbert(
        base, F.col("cx"), F.col("cy"), out="hval", bits=8
    ).withColumn("zval", zorder_value(F.col("cx"), F.col("cy"), bits=8))

    def mean_jump(order_col: str, tag: str):
        w = Window.orderBy(order_col, "o_orderkey")
        jump = (
            F.abs(F.col("cx") - F.lag("cx").over(w))
            + F.abs(F.col("cy") - F.lag("cy").over(w))
        )
        return (
            cells.select(jump.alias("j"))
            .filter(F.col("j").isNotNull())
            .agg(
                F.count("*").alias(f"n_{tag}"),
                F.sum("j").alias(f"sum_l1_{tag}"),
            )
        )

    _r6 = round6_portable
    m = mean_jump("zval", "morton")
    h = mean_jump("hval", "hilbert")
    mm = F.col("sum_l1_morton").cast("double") / F.col("n_morton").cast(
        "double"
    )
    hm = F.col("sum_l1_hilbert").cast("double") / F.col(
        "n_hilbert"
    ).cast("double")
    return m.crossJoin(F.broadcast(h)).select(
        F.col("n_morton").cast("long").alias("n_jumps"),
        F.col("sum_l1_morton").cast("long").alias("morton_sum_l1"),
        F.col("sum_l1_hilbert").cast("long").alias("hilbert_sum_l1"),
        _r6(mm).alias("morton_mean_l1"),
        _r6(hm).alias("hilbert_mean_l1"),
        _r6(mm / hm).alias("locality_gain"),
    )


def _hilbert_locality_sql() -> str:
    from airflow_baseball_spark.operators.zorder import (
        hilbert_sql,
        zorder_sql,
    )

    h = hilbert_sql("base", "cx", "cy", "o_orderkey, cx, cy", bits=8)
    z = zorder_sql("cx", "cy", bits=8)
    return f"""
    WITH base AS (
      SELECT o_orderkey,
             o_custkey % 256 AS cx,
             date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) % 256 AS cy
      FROM orders
    ),
    {h},
    cells AS (
      SELECT f.o_orderkey, f.cx, f.cy, f.hval, {z} AS zval
      FROM hfinal f
    ),
    mj AS (
      SELECT COUNT(*) AS n_morton, SUM(j) AS sum_l1_morton FROM (
        SELECT ABS(cx - LAG(cx) OVER w) + ABS(cy - LAG(cy) OVER w) AS j
        FROM cells WINDOW w AS (ORDER BY zval, o_orderkey)
      ) WHERE j IS NOT NULL
    ),
    hj AS (
      SELECT COUNT(*) AS n_hilbert, SUM(j) AS sum_l1_hilbert FROM (
        SELECT ABS(cx - LAG(cx) OVER w) + ABS(cy - LAG(cy) OVER w) AS j
        FROM cells WINDOW w AS (ORDER BY hval, o_orderkey)
      ) WHERE j IS NOT NULL
    )
    SELECT CAST(n_morton AS BIGINT) AS n_jumps,
           CAST(sum_l1_morton AS BIGINT) AS morton_sum_l1,
           CAST(sum_l1_hilbert AS BIGINT) AS hilbert_sum_l1,
           FLOOR(CAST(sum_l1_morton AS DOUBLE) / CAST(n_morton AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS morton_mean_l1,
           FLOOR(CAST(sum_l1_hilbert AS DOUBLE) / CAST(n_hilbert AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS hilbert_mean_l1,
           FLOOR((CAST(sum_l1_morton AS DOUBLE) / CAST(n_morton AS DOUBLE))
                 / (CAST(sum_l1_hilbert AS DOUBLE)
                    / CAST(n_hilbert AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS locality_gain
    FROM mj CROSS JOIN hj
    """


registry.register(
    "hilbert_locality", q_hilbert_locality, _hilbert_locality_sql()
)
