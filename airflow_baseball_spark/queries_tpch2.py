"""Second batch of TPC-H-style macro shapes (q2/q8/q9/q11/q12/q16/q20
analogues, adapted to the driver star schema which carries no partsupp
table — lineitem serves as the part↔supplier association where those
queries need one).

Same engine-independence conventions as queries_tpch.py: money math on
DECIMAL casts (exact, partition-order-invariant), double-valued ratios
derived from exact decimal sums so the final IEEE ops are bit-identical
on Spark and DuckDB, `_r6` floor-rounding at .xxxxxx5 hazards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_baseball_spark import registry
from airflow_baseball_spark.functions.scalar import dec_portable, round6_portable
from airflow_baseball_spark.schemas import load_table


def _d(c: str) -> Column:
    return dec_portable(c, 18, 2)


# ---------------------------------------------------------------------------
# Q2-ish: min-cost supplier per part
# ---------------------------------------------------------------------------


def q_tpch_q2ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped "cheapest supplier per part": the correlated
    min-subquery becomes one partial agg + a per-part window min —
    a single shuffle on l_partkey serves both the agg and the window
    (same partitioning, no second exchange).

    Scale shape: the (part, supplier) offer table is fact-sized before
    the agg and |parts|×|supps-per-part| after; the window runs on the
    already-aggregated (small) side. part and supplier are pruned to
    the join keys + output attrs and broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#12") & (F.col("p_size") <= 25)
    ).select("p_partkey", "p_brand", "p_size")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    offers = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.min(_d("l_extendedprice")).alias("offer"))
    )
    w = Window.partitionBy("p_partkey")
    best = offers.withColumn("part_min", F.min("offer").over(w)).filter(
        F.col("offer") == F.col("part_min")
    )
    return best.join(F.broadcast(supp), best["l_suppkey"] == supp["s_suppkey"]).select(
        "p_partkey",
        F.col("s_suppkey"),
        "s_name",
        F.col("offer").cast("double").alias("best_price"),
    )


registry.register(
    "tpch_q2ish",
    q_tpch_q2ish,
    """
    WITH offers AS (
      SELECT p.p_partkey, l.l_suppkey,
             MIN(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS offer
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand = 'Brand#12' AND p.p_size <= 25
      GROUP BY 1, 2
    ),
    best AS (
      SELECT p_partkey, l_suppkey, offer,
             MIN(offer) OVER (PARTITION BY p_partkey) AS part_min
      FROM offers
    )
    SELECT b.p_partkey, s.s_suppkey, s.s_name,
           CAST(b.offer AS DOUBLE) AS best_price
    FROM best b JOIN supplier s ON b.l_suppkey = s.s_suppkey
    WHERE b.offer = b.part_min
    """,
)


# ---------------------------------------------------------------------------
# Q8-ish: national market share per order year
# ---------------------------------------------------------------------------


def q_tpch_q8ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shaped market share: NATION_3's revenue fraction per order
    year. One fact⋈fact shuffle (lineitem⋈orders); supplier→nation is
    a broadcast chain; the share is a conditional-sum / sum ratio
    computed inside one aggregation — no second pass over the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    vol = (_d("l_extendedprice") * (F.lit(1) - _d("l_discount"))).cast("decimal(22,6)")
    agg = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("n_name") == "NATION_3", vol)).alias("nat_vol"),
            F.sum(vol).alias("tot_vol"),
        )
    )
    return agg.select(
        "o_year",
        round6_portable(
            F.coalesce(F.col("nat_vol"), F.lit(0)).cast("double")
            / F.col("tot_vol").cast("double")
        ).alias("mkt_share"),
        F.col("tot_vol").cast("double").alias("total_volume"),
    )


registry.register(
    "tpch_q8ish",
    q_tpch_q8ish,
    """
    WITH agg AS (
      SELECT YEAR(o.o_orderdate) AS o_year,
             SUM(CASE WHEN n.n_name = 'NATION_3'
                 THEN CAST(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))
                      * (1 - CAST(FLOOR(l.l_discount * 100 + 0.5) / 100 AS DECIMAL(18,2)))
                      AS DECIMAL(22,6)) END) AS nat_vol,
             SUM(CAST(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))
                 * (1 - CAST(FLOOR(l.l_discount * 100 + 0.5) / 100 AS DECIMAL(18,2)))
                 AS DECIMAL(22,6))) AS tot_vol
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1
    )
    SELECT o_year,
           FLOOR(CAST(COALESCE(nat_vol, 0) AS DOUBLE)
                 / CAST(tot_vol AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS mkt_share,
           CAST(tot_vol AS DOUBLE) AS total_volume
    FROM agg
    """,
)


# ---------------------------------------------------------------------------
# Q9-ish: product-line profit by supplier nation and year
# ---------------------------------------------------------------------------


def q_tpch_q9ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shaped profit rollup. With no partsupp.ps_supplycost in the
    star schema, unit cost is proxied as 8% of p_retailprice — the
    shape (fact joins two dim chains, revenue-minus-cost amount,
    (nation, year) rollup) is what's exercised, not the constant.

    Decimal staging keeps every product inside DECIMAL(38): the
    (retail×qty) product is materialized at scale 4 before the ×0.08
    step (scale 6), so Spark never hits precision-loss truncation and
    both engines sum bit-identical decimals."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (_d("l_extendedprice") * (F.lit(1) - _d("l_discount"))).cast("decimal(22,6)")
    cost = (
        (_d("p_retailprice") * _d("l_quantity")).cast("decimal(22,4)")
        * F.lit("0.08").cast("decimal(4,2)")
    ).cast("decimal(22,6)")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(
            F.sum(rev - cost).cast("double").alias("profit"),
            F.count("*").alias("n_rows"),
        )
    )


registry.register(
    "tpch_q9ish",
    q_tpch_q9ish,
    """
    SELECT n.n_name AS nation, YEAR(l.l_shipdate) AS o_year,
           CAST(SUM(
             CAST(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))
                  * (1 - CAST(FLOOR(l.l_discount * 100 + 0.5) / 100 AS DECIMAL(18,2)))
                  AS DECIMAL(22,6))
             - CAST(CAST(CAST(FLOOR(p.p_retailprice * 100 + 0.5) / 100 AS DECIMAL(18,2))
                         * CAST(FLOOR(l.l_quantity * 100 + 0.5) / 100 AS DECIMAL(18,2))
                         AS DECIMAL(22,4))
                    * CAST(0.08 AS DECIMAL(4,2)) AS DECIMAL(22,6))
           ) AS DOUBLE) AS profit,
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type = 'PROMO'
    GROUP BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# Q11-ish: important parts (value above a fraction of the global total)
# ---------------------------------------------------------------------------


def q_tpch_q11ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shaped HAVING-against-global-scalar: per-part value vs a
    threshold derived from the whole table. One shuffle produces the
    per-part aggregate; the global total is an empty-partition window
    SUM over THAT aggregate, so the fact is scanned exactly once (a
    crossJoin(total) form would recompute the per-part subtree — and
    re-scan the fact — for the broadcast branch). The single-partition
    window moves only the part-count-sized aggregate, the same
    total-minus-self trade as pipelines/park_factor.py; at larger part
    cardinality a two-level partial-total tree replaces it."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_d("l_extendedprice")).alias("part_value_dec")
    )
    w = Window.partitionBy()
    return (
        per_part.withColumn("total_dec", F.sum("part_value_dec").over(w))
        .filter(
            F.col("part_value_dec").cast("double")
            > F.col("total_dec").cast("double") * 0.001
        )
        .select(
            "l_partkey", F.col("part_value_dec").cast("double").alias("part_value")
        )
    )


registry.register(
    "tpch_q11ish",
    q_tpch_q11ish,
    """
    WITH per_part AS (
      SELECT l_partkey,
             SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS part_value_dec,
             SUM(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2)))) OVER ()
               AS total_dec
      FROM lineitem GROUP BY 1
    )
    SELECT l_partkey, CAST(part_value_dec AS DOUBLE) AS part_value
    FROM per_part
    WHERE CAST(part_value_dec AS DOUBLE) > CAST(total_dec AS DOUBLE) * 0.001
    """,
)


# ---------------------------------------------------------------------------
# Q12-ish: late-shipment priority counts
# ---------------------------------------------------------------------------


def q_tpch_q12ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped late-shipment audit: lines shipped >60 days after
    order placement during 1997, bucketed by return flag, counting
    critical- vs normal-priority orders. The date-window filter pushes
    to the lineitem scan; the >60-day lag filter runs right on the
    joined row before the agg.

    TZ-proofing (driver-red in r5 AND r6): all date comparisons run
    on exact integer EPOCH DAYS. r7 hardening: the ORACLE now derives
    them as epoch_us // us-per-day instead of date_diff('day', DATE,
    ts) — calendar date_diff on a tz-TAGGED timestamp column counts
    day boundaries in the DuckDB session timezone (measured locally:
    tagged parquet + SET TimeZone shifts 10027→10028), while epoch_us
    returns the raw stored int64 under every tagging/session-TZ
    combination. Spark's datediff under the load_table UTC pin is the
    same epoch day for both naive and tagged vintages."""
    d_97 = 9862  # days from 1970-01-01 to 1997-01-01
    d_98 = 10227  # days from 1970-01-01 to 1998-01-01
    epoch = F.lit("1970-01-01").cast("date")
    ship_d = F.datediff(F.col("l_shipdate"), epoch)
    order_d = F.datediff(F.col("o_orderdate"), epoch)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (ship_d >= F.lit(d_97)) & (ship_d < F.lit(d_98))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    # when/otherwise, NOT crit.cast(long): a NULL priority makes `crit`
    # NULL, which sum() would silently drop from BOTH counts while the
    # oracle's CASE...ELSE buckets it into low_line_count — the
    # when-form sends NULL conditions to otherwise(), matching SQL
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(ship_d > order_d + F.lit(60))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
    )


registry.register(
    "tpch_q12ish",
    q_tpch_q12ish,
    """
    SELECT l.l_returnflag,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 0 ELSE 1 END) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE epoch_us(l.l_shipdate) // 86400000000 >= 9862
      AND epoch_us(l.l_shipdate) // 86400000000 < 10227
      AND epoch_us(l.l_shipdate) // 86400000000
          > epoch_us(o.o_orderdate) // 86400000000 + 60
    GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# Q16-ish: supplier diversity per (brand, size), with supplier exclusion
# ---------------------------------------------------------------------------


def q_tpch_q16ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped supplier-count: distinct suppliers per (brand, size)
    for non-PROMO parts, excluding deadbeat suppliers (negative
    balance) via a broadcast anti-join. countDistinct shuffles
    (brand, size, suppkey) triples once, then collapses — no
    expand-based multi-distinct."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") != "PROMO"
    ).select("p_partkey", "p_brand", "p_size")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


registry.register(
    "tpch_q16ish",
    q_tpch_q16ish,
    """
    SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type <> 'PROMO'
      AND NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0.0)
    GROUP BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# Q20-ish: suppliers with heavy PROMO shipments in a year
# ---------------------------------------------------------------------------


def q_tpch_q20ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-shaped threshold semi-join chain: suppliers who shipped
    >400 total units of PROMO parts during 1997. part prunes to keys
    and semi-joins into the fact (broadcast), the per-supplier agg is
    HAVING-filtered, and only then does the small survivor set join
    supplier for names."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    promo = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    heavy = (
        li.join(F.broadcast(promo), li["l_partkey"] == promo["p_partkey"], "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(_d("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > F.lit("400").cast("decimal(18,2)"))
    )
    return heavy.join(F.broadcast(supp), heavy["l_suppkey"] == supp["s_suppkey"]).select(
        "s_suppkey", "s_name", F.col("qty_dec").cast("double").alias("promo_qty")
    )


registry.register(
    "tpch_q20ish",
    q_tpch_q20ish,
    """
    WITH heavy AS (
      SELECT l.l_suppkey, SUM(CAST(FLOOR(l.l_quantity * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS qty_dec
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
        AND EXISTS (SELECT 1 FROM part p
                    WHERE p.p_partkey = l.l_partkey AND p.p_type = 'PROMO')
      GROUP BY 1
      HAVING SUM(CAST(FLOOR(l.l_quantity * 100 + 0.5) / 100 AS DECIMAL(18,2)))
             > CAST(400 AS DECIMAL(18,2))
    )
    SELECT s.s_suppkey, s.s_name, CAST(h.qty_dec AS DOUBLE) AS promo_qty
    FROM heavy h JOIN supplier s ON h.l_suppkey = s.s_suppkey
    """,
)
