"""TPC-H-style macro queries over the driver testdata — the classic
scan-heavy / join-heavy / selective shapes, used as the engine's
headline perf probes (BENCH) with exact oracles. Plus the salted-agg
skew demonstration whose oracle is the *unsalted* SQL — salting must
change the plan, never the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_baseball_spark import registry
from airflow_baseball_spark.functions.scalar import dec_portable
from airflow_baseball_spark.operators.salt import replicate_broadcast_join, salted_agg
from airflow_baseball_spark.schemas import load_table


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary: one scan, map-side-combinable aggregates,
    selective date filter pushed to parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    d = lambda c: dec_portable(c, 18, 2)  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(d("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (d("l_extendedprice") * (F.lit(1) - d("l_discount"))).cast(
                    "decimal(22,6)"
                )
            ).cast("double").alias("sum_disc_price"),
            # floor(x*1e6+0.5)/1e6, not ROUND(): identical IEEE ops on
            # both engines, so .xxxxxx5-boundary averages can't diverge
            # (same fix as queries_domain._r6, commit 507dc20)
            (F.floor(F.avg(d("l_quantity")) * 1000000.0 + 0.5) / 1000000.0).alias(
                "avg_qty"
            ),
            F.count("*").alias("count_order"),
        )
    )


registry.register(
    "tpch_q1",
    q_tpch_q1,
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(SUM(CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))
               * (1 - CAST(FLOOR(l_discount * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DECIMAL(22,6)))
             AS DOUBLE) AS sum_disc_price,
           FLOOR(AVG(CAST(FLOOR(l_quantity * 100 + 0.5) / 100 AS DECIMAL(18,2))) * 1000000.0 + 0.5)
             / 1000000.0 AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast-revenue: the maximally selective scan — every
    predicate pushes to parquet (date range, discount band, quantity
    cap), one global agg, no shuffle beyond the 1-row final."""
    li = load_table(spark, sf_dir, "lineitem")
    d = lambda c: dec_portable(c, 18, 2)  # noqa: E731
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (dec_portable("l_discount", 18, 2).between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (d("l_extendedprice") * d("l_discount")).cast("decimal(22,6)")
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


registry.register(
    "tpch_q6",
    q_tpch_q6,
    """
    SELECT CAST(SUM(CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))
               * CAST(FLOOR(l_discount * 100 + 0.5) / 100 AS DECIMAL(18,2)) AS DECIMAL(22,6)))
             AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate < TIMESTAMP '1995-01-01'
      AND CAST(FLOOR(l_discount * 100 + 0.5) / 100 AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)


def q_tpch_q3ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shaped shipping priority: selective dim filter, fact join,
    top-10 revenue. customer/orders broadcast-join into lineitem."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.join(
            F.broadcast(
                orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
                .select("o_orderkey", "o_orderdate", "o_orderpriority")
            ),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                (
                    dec_portable("l_extendedprice", 18, 2)
                    * (F.lit(1) - dec_portable("l_discount", 18, 2))
                ).cast("decimal(22,6)")
            ).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )
    return rev


registry.register(
    "tpch_q3ish",
    q_tpch_q3ish,
    """
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           CAST(SUM(CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))
               * (1 - CAST(FLOOR(l_discount * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DECIMAL(22,6)))
             AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)


def q_tpch_q5ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped local-supplier revenue: 4-way broadcast-join chain up
    the region→nation→supplier dim hierarchy into the fact."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        supp.join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("s_suppkey", "n_name", "r_name")
    )
    return (
        li.join(F.broadcast(dims), li["l_suppkey"] == dims["s_suppkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                (
                    dec_portable("l_extendedprice", 18, 2)
                    * (F.lit(1) - dec_portable("l_discount", 18, 2))
                ).cast("decimal(22,6)")
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


registry.register(
    "tpch_q5ish",
    q_tpch_q5ish,
    """
    SELECT r.r_name, n.n_name,
           CAST(SUM(CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))
               * (1 - CAST(FLOOR(l_discount * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DECIMAL(22,6)))
             AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed-key aggregation through the salted two-phase path; the
    oracle is the plain GROUP BY — identical result, skew-proof plan."""
    ev = load_table(spark, sf_dir, "events")
    return salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("event_id", "count"),
            "max_value": ("value", "max"),
            "min_ts": ("ts", "min"),
        },
        salt_col="event_id",
    )


registry.register(
    "salted_agg",
    q_salted_agg,
    """
    SELECT event_type, COUNT(event_id) AS n_events,
           MAX(value) AS max_value, MIN(ts) AS min_ts
    FROM events GROUP BY 1
    """,
)


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof replicated join of the events fact against a derived
    per-type dim; oracle is the plain join."""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("type_avg")
    )
    joined = replicate_broadcast_join(
        ev.select("event_id", "event_type", "value"),
        dim,
        on=["event_type"],
        salt_col="event_id",
    )
    return joined.select(
        "event_id",
        "event_type",
        (F.col("value") > F.col("type_avg")).cast("int").alias("above_avg"),
    )


registry.register(
    "salted_join",
    q_salted_join,
    """
    WITH dim AS (
      SELECT event_type, ROUND(AVG(value), 6) AS type_avg
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type,
           CAST(e.value > d.type_avg AS INT) AS above_avg
    FROM events e JOIN dim d USING (event_type)
    """,
)


def q_tpch_q14ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shaped promo-revenue ratio: fact scan with a pushed date
    band, broadcast join to part (dim), one conditional-sum global agg
    — the classic 'percentage of revenue from one product class'
    probe. At scale part is a few GB and still broadcastable after
    pruning to (p_partkey, p_type)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    d = lambda c: dec_portable(c, 18, 2)  # noqa: E731
    rev = (d("l_extendedprice") * (F.lit(1) - d("l_discount"))).cast("decimal(22,6)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            # the otherwise() zero must be DECIMAL: a double zero would
            # silently widen the whole branch to double and make the
            # numerator an order-dependent FP sum. The final ratio is
            # floor-trick rounded on both sides (registry convention).
            (
                F.floor(
                    F.lit(100.0)
                    * F.sum(
                        F.when(F.col("p_type") == "PROMO", rev).otherwise(
                            F.lit(0).cast("decimal(22,6)")
                        )
                    ).cast("double")
                    / F.sum(rev).cast("double")
                    * 1000000.0
                    + 0.5
                )
                / 1000000.0
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_rows"),
        )
    )


registry.register(
    "tpch_q14ish",
    q_tpch_q14ish,
    """
    SELECT FLOOR(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))
                      * (1 - CAST(FLOOR(l_discount * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DECIMAL(22,6))
                 ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))
                      * (1 - CAST(FLOOR(l_discount * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DECIMAL(22,6)))
             AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS promo_revenue_pct,
           COUNT(*) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)


def q_tpch_q18ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped large-volume orders: aggregate the fact by order,
    HAVING over the aggregate, then join the qualifying keys back to
    orders+customer dims. The having-filter runs BEFORE the dim joins
    (qualifying set is tiny), so the expensive side is one map-side
    combinable agg — never a join of the raw fact to customer."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec_portable("l_quantity", 18, 2)).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


registry.register(
    "tpch_q18ish",
    q_tpch_q18ish,
    """
    WITH big AS (
      SELECT l_orderkey,
             SUM(CAST(FLOOR(l_quantity * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS total_qty
      FROM lineitem GROUP BY 1
      HAVING SUM(CAST(FLOOR(l_quantity * 100 + 0.5) / 100 AS DECIMAL(18,2))) > 150
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(b.total_qty AS DOUBLE) AS total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)


def q_tpch_q10ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped returned-item revenue: selective flag filter on the
    fact, revenue agg per customer, broadcast customer+nation name
    lookup, top 20 — the 'who returned the most' report."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    d = lambda c: dec_portable(c, 18, 2)  # noqa: E731
    rev_per_cust = (
        li.filter(F.col("l_returnflag") == "R")
        # orders is a FACT, not a dim: no broadcast hint — a shuffle
        # join (or AQE's choice) is the only shape that survives scale
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.sum(
                (d("l_extendedprice") * (F.lit(1) - d("l_discount"))).cast(
                    "decimal(22,6)"
                )
            ).cast("double").alias("revenue"),
        )
    )
    dims = cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
    return (
        rev_per_cust.join(
            F.broadcast(dims.select("c_custkey", "c_name", "n_name")),
            rev_per_cust["o_custkey"] == F.col("c_custkey"),
        )
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


registry.register(
    "tpch_q10ish",
    q_tpch_q10ish,
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))
               * (1 - CAST(FLOOR(l_discount * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DECIMAL(22,6)))
             AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)


def q_tpch_q4ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped order-priority check: EXISTS semi-join of two FACTS
    (orders against its late lineitems), then a tiny agg by priority.

    Shape notes for scale: the date band prunes orders at the scan; the
    semi-join shuffles both facts on orderkey but emits each order at
    most once (left_semi — no row multiplication, no dedup needed,
    roughly half the output of the equivalent inner-join+distinct).
    The correlated ``l_shipdate > o_orderdate + 90 days`` predicate
    rides the join as a residual condition — identical timestamp
    arithmetic on both engines, so the oracle is exact."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


registry.register(
    "tpch_q4ish",
    q_tpch_q4ish,
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY 1
    """,
)


def q_tpch_q7ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped cross-nation volume: the fact joins BOTH dim chains
    (supplier→nation and orders→customer→nation), keeps only the two
    ordered nation pairs, and aggregates by (supp_nation, cust_nation,
    ship year).

    Scale shape: supplier/customer/nation are broadcast after pruning
    to key+name; orders is a fact, so lineitem⋈orders is the one real
    shuffle (AQE may still pick broadcast at small SF). The disjunctive
    nation-pair filter runs after both lookups resolve — it cannot push
    below either join, but it prunes before the agg so the grouped set
    is pair-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    d = lambda c: dec_portable(c, 18, 2)  # noqa: E731
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(
                (d("l_extendedprice") * (F.lit(1) - d("l_discount"))).cast(
                    "decimal(22,6)"
                )
            ).cast("double").alias("volume"),
            F.count("*").alias("n_items"),
        )
    )


registry.register(
    "tpch_q7ish",
    q_tpch_q7ish,
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           YEAR(l.l_shipdate) AS l_year,
           CAST(SUM(CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))
               * (1 - CAST(FLOOR(l_discount * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DECIMAL(22,6)))
             AS DOUBLE) AS volume,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)


def q_tpch_q19ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shaped discounted revenue: OR-of-ANDs predicate spanning the
    fact AND the dim — the classic disjunctive-pushdown probe.

    Scale shape: each disjunct's dim-only half (brand+size) prunes the
    broadcast part table and its fact-only half (quantity band) pushes
    to the lineitem scan as the OR-union of the bands; Catalyst derives
    both from the CNF of the filter, so the scan reads only rows that
    can satisfy SOME disjunct. One broadcast join, one 1-row agg."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    d = lambda c: dec_portable(c, 18, 2)  # noqa: E731
    q = F.col("l_quantity")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & q.between(20, 30))
    )
    return joined.filter(cond).agg(
        F.sum(
            (d("l_extendedprice") * (F.lit(1) - d("l_discount"))).cast("decimal(22,6)")
        ).cast("double").alias("revenue"),
        F.count("*").alias("n_rows"),
    )


registry.register(
    "tpch_q19ish",
    q_tpch_q19ish,
    """
    SELECT CAST(SUM(CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))
               * (1 - CAST(FLOOR(l_discount * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DECIMAL(22,6)))
             AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)


def q_tpch_q13ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shaped customer order-count distribution: how many customers
    placed exactly N (non-urgent) orders, INCLUDING the zero bucket.

    Scale shape: canonical Q13 outer-joins raw orders to customer and
    counts — that ships every order row through the join. Here orders
    pre-aggregates to one row per customer FIRST (map-side combinable),
    then a broadcast-sized per-customer count left-joins back and
    null-fills to zero; the second agg (histogram of counts) is tiny.
    Result is identical to the outer-join form the oracle states."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        orders.filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        cust.join(per_cust, cust["c_custkey"] == per_cust["o_custkey"], "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count("*").alias("n_custs"))
    )


registry.register(
    "tpch_q13ish",
    q_tpch_q13ish,
    """
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY 1
    )
    SELECT n_orders, COUNT(*) AS n_custs
    FROM per_cust GROUP BY 1
    """,
)


def q_tpch_q15ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shaped top supplier: quarterly revenue per supplier, keep the
    supplier(s) whose revenue equals the global max (scalar subquery on
    an aggregate), then resolve the name from the dim.

    Scale shape: revenue is one map-combinable agg over the pruned
    fact scan; the max rides an UNPARTITIONED window over the per-
    supplier aggregate (|suppliers| rows — dim-bounded, the documented
    single-partition exception, same as total-minus-self), so the fact
    is scanned ONCE — the agg+self-join form would scan and aggregate
    it twice since Spark does not dedupe common subplans. Supplier dim
    joins broadcast. Equality on the aggregate is safe because revenue
    is an exact DECIMAL sum — no FP tie ambiguity on either engine."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    d = lambda c: dec_portable(c, 18, 2)  # noqa: E731
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (d("l_extendedprice") * (F.lit(1) - d("l_discount"))).cast(
                    "decimal(22,6)"
                )
            ).alias("total_rev")
        )
    )
    mx = F.max("total_rev").over(Window.partitionBy())
    return (
        rev.withColumn("max_rev", mx)
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), rev["l_suppkey"] == supp["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_rev"),
        )
    )


registry.register(
    "tpch_q15ish",
    q_tpch_q15ish,
    """
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))
                 * (1 - CAST(FLOOR(l_discount * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DECIMAL(22,6)))
               AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
    FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)


def q_tpch_q17ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shaped small-quantity revenue: average yearly revenue lost if
    small orders (quantity under 20% of the part's average) stopped —
    the correlated-subquery-against-own-aggregate probe.

    Scale shape: the brand/size dim filter broadcasts into the fact
    FIRST, so the per-part average is computed only over lineitems of
    qualifying parts (identical values — the correlation key is
    l_partkey and the filter is on part attributes, so every lineitem
    of a qualifying part survives). The canonical self-join against
    the own-aggregate would scan and shuffle the fact TWICE (Spark
    does not dedupe the common subplan); phrasing the per-part average
    as a window over l_partkey does it in one scan, one exchange, one
    Window node (plan-tested). The 0.2x threshold is derived from an
    exact DECIMAL sum with identical IEEE division/multiplication on
    both engines — the `<` comparison cannot diverge."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 15)
    ).select("p_partkey")
    d = lambda c: dec_portable(c, 18, 2)  # noqa: E731
    li_q = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    qty_thresh = (
        F.sum(d("l_quantity")).over(w).cast("double")
        / F.count("*").over(w)
        * F.lit(0.2)
    )
    return (
        li_q.withColumn("qty_thresh", qty_thresh)
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (
                F.floor(
                    F.sum(d("l_extendedprice")).cast("double") / F.lit(7.0) * 1000000.0
                    + 0.5
                )
                / 1000000.0
            ).alias("avg_yearly"),
            F.count("*").alias("n_rows"),
        )
    )


registry.register(
    "tpch_q17ish",
    q_tpch_q17ish,
    """
    WITH pa AS (
      SELECT l_partkey,
             CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) * 0.2 AS qty_thresh
      FROM lineitem l
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_brand = 'Brand#23' AND p_size < 15)
      GROUP BY 1
    )
    SELECT FLOOR(CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 * 1000000.0 + 0.5) / 1000000.0 AS avg_yearly,
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
               AND p.p_brand = 'Brand#23' AND p.p_size < 15
    JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < pa.qty_thresh
    """,
)


def q_tpch_q21ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped waiting-orders: per supplier, how many finished
    multi-supplier orders it closed (shipped on the order's last ship
    date) — the reference shape's 'suppliers who kept orders waiting',
    adapted to this schema (no l_commitdate; last-shipper stands in
    for 'the late one').

    Scale shape: the per-order profile (distinct-supplier count + max
    shipdate) rides ONE window over l_orderkey — collect_set is
    bounded by suppliers-per-order (single digits), and the window
    shares the one hash exchange; the agg-and-join-back form would
    scan and shuffle the fact twice. Orders prunes to status F before
    its join; supplier resolves via broadcast. COUNT(DISTINCT
    l_orderkey) guards against a supplier shipping several lineitems
    of the same order on the closing date."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    w = Window.partitionBy("l_orderkey")
    closers = (
        li.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn("last_ship", F.max("l_shipdate").over(w))
        .filter((F.col("n_supp") > 1) & (F.col("l_shipdate") == F.col("last_ship")))
    )
    return (
        closers.join(orders, closers["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


registry.register(
    "tpch_q21ish",
    q_tpch_q21ish,
    """
    WITH po AS (
      SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
             MAX(l_shipdate) AS last_ship
      FROM lineitem GROUP BY 1
    )
    SELECT s.s_name, COUNT(DISTINCT l.l_orderkey) AS numwait
    FROM lineitem l
    JOIN po ON l.l_orderkey = po.l_orderkey
           AND po.n_supp > 1 AND l.l_shipdate = po.last_ship
    JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)


def q_tpch_q22ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped global sales opportunity: rich customers (balance
    above the positive-balance average) who never ordered, bucketed by
    nation — scalar aggregate subquery + anti-join.

    Scale shape: the threshold is ONE broadcast row (exact DECIMAL sum
    divided by a count — identical IEEE division on both engines, so
    the `>` filter cannot diverge at the boundary); the anti-join
    shuffles customer against orders' distinct custkeys — at scale AQE
    sees the post-filter customer side shrink and can flip to
    broadcast; no correlated re-scan of orders per customer."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    d = dec_portable("c_acctbal", 18, 2)
    thresh = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .filter(F.col("c_nationkey") <= 10)
        .agg((F.sum(d).cast("double") / F.count("*")).alias("avg_bal"))
    )
    return (
        cust.filter(F.col("c_nationkey") <= 10)
        .join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(d).cast("double").alias("total_bal"),
        )
    )


registry.register(
    "tpch_q22ish",
    q_tpch_q22ish,
    """
    WITH thresh AS (
      SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0 AND c_nationkey <= 10
    )
    SELECT c.c_nationkey, COUNT(*) AS n_cust,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer c, thresh t
    WHERE c.c_nationkey <= 10
      AND c.c_acctbal > t.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
)
