"""Cardinality sketches + data-layout pruning + funnel analysis.

The sketch operators (HyperLogLog-shaped register estimate, KMV
k-minimum-values) are the scale path for distinct counting: an exact
COUNT(DISTINCT key) shuffles every distinct key; a register sketch
shuffles a CONSTANT number of (group, register) rows per group with a
map-side combinable max, and sketches from different partitions /
days / shards merge losslessly by taking register-wise max. That
mergeability — not the estimate itself — is why every production
engine (BigQuery, Presto/Trino APPROX_DISTINCT, Druid, ClickHouse)
ships one of these.

Engine-exactness: all hashing is md5 (identical hex on both engines);
hex→int unrolls through exact integer arithmetic; register sums run
over exact BIGINTs (powers of two via a literal lookup table, NOT
libm pow); the only libm op is ln of an exact integer ratio (the
linear-counting branch), per the repo-wide recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_baseball_spark import registry
from airflow_baseball_spark.functions.scalar import round6_portable as _r6
from airflow_baseball_spark.schemas import load_table

# ---------------------------------------------------------------------------
# HyperLogLog-shaped distinct estimate (m = 256 registers)
# ---------------------------------------------------------------------------

_HLL_P = 8
_HLL_M = 1 << _HLL_P  # 256 registers
# 2^(40 - rho) for rho = 1..33 — exact BIGINT lookup so no pow()/libm
_HLL_POW = [1 << (40 - r) for r in range(1, 34)]
_HLL_ZERO_TERM = 1 << 40  # absent register: rho = 0
# alpha_256 * m^2 * 2^40, written as the same literal expression tree
# on both engines (all constants are exact doubles)
# alpha_256 * m^2 * 2^40, evaluated ONCE in Python and inlined as the
# same literal into BOTH engines' expression texts (the LCG-literal
# house rule, cf. _GUMBEL_LNLN_52). The spelled-out arithmetic form
# "(0.7213 / (1.0 + 1.079 / 256.0)) * ..." is NOT engine-portable:
# Spark parses the plain decimal literals as DecimalType and evaluates
# the division in decimal arithmetic (Decimal('51756995126219627.007'))
# while DuckDB/Python produce the IEEE double 5.175699493294551e16 —
# a 3.7e-9 relative gap that flips the 6th-decimal floor once the
# estimate magnitude reaches ~1.4e3 (first seen at sf0.1:
# hll_distinct read 1397.598050 vs 1397.598045, ORACLE_SF01_r11.txt;
# invisible at driver sf because the small-range linear-counting
# branch bypasses this constant). An exponent literal parses as
# DOUBLE on both engines, so the trees are IEEE-identical again.
_HLL_NUM = repr((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 1099511627776.0)


def hll_register_exprs(key_col: str = "user_id"):
    """(register-index, rho) column pair for one hashed key — the
    per-row map stage of the HLL sketch. rho = leading zeros of the
    32-bit pattern + 1 = 33 - bit_length, via string length of bin()
    (exact integer arithmetic, no libm)."""
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":hll")))
    idx = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    w = F.conv(F.substring(h, 3, 8), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.bin(w))
    )
    return idx, rho


def hll_finalize(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Registers (group_cols..., reg, mrho) → per-group estimate
    columns (n_regs, v_zero, hll_est). The harmonic sum runs as
    Σ 2^(40-mrho) in exact BIGINT via a literal lookup (absent
    registers contribute 2^40 each), and the small-range linear-
    counting branch uses ln of an exact integer ratio — the full
    engine-exactness recipe of the module docstring."""
    pow_lut = F.array(*[F.lit(v) for v in _HLL_POW])
    per_group = regs.groupBy(*group_cols).agg(
        F.count("*").alias("n_regs"),
        F.sum(F.element_at(pow_lut, F.col("mrho"))).alias("z_present"),
    )
    z = (
        F.col("z_present")
        + (F.lit(_HLL_M) - F.col("n_regs")) * F.lit(_HLL_ZERO_TERM)
    ).cast("double")
    est_raw = F.expr(_HLL_NUM) / z
    v_zero = (F.lit(_HLL_M) - F.col("n_regs")).cast("long")
    est = F.when(
        (est_raw <= F.lit(2.5 * _HLL_M)) & (v_zero > 0),
        F.lit(float(_HLL_M))
        * F.log(F.lit(float(_HLL_M)) / v_zero.cast("double")),
    ).otherwise(est_raw)
    return per_group.select(
        *group_cols,
        F.col("n_regs").cast("long").alias("n_regs"),
        v_zero.alias("v_zero"),
        _r6(est).alias("hll_est"),
    )


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via a 256-register HLL sketch,
    reported next to the exact count so the estimate error is visible.

    Register build is ONE map-side-combinable aggregate: groupBy
    (event_type, register) → max(rho) never moves more than
    |groups|·256 rows through the shuffle regardless of fact size —
    at 100 TB that is the whole point vs COUNT(DISTINCT)."""
    ev = load_table(spark, sf_dir, "events")
    idx, rho = hll_register_exprs("user_id")
    regs = ev.select(
        "event_type", idx.alias("reg"), rho.alias("rho")
    ).groupBy("event_type", "reg").agg(F.max("rho").alias("mrho"))
    per_type = hll_finalize(regs, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return per_type.join(exact, "event_type").select(
        "event_type", "n_exact", "n_regs", "v_zero", "hll_est"
    )


def _hex_int_sql(hexpr: str, off: int, n: int) -> str:
    """DuckDB hex→BIGINT over ``n`` chars of ``hexpr`` starting at
    1-based ``off``. The positional sum runs in DOUBLE (list_sum of
    digit · 16^k terms), which is exact only up to 13 hex chars
    (52 bits); wider values must go through :func:`_hex_int_wide_sql`."""
    assert n <= 13, "double-precision positional sum is exact to 13 hex chars"
    return f"""CAST(list_sum(list_transform(generate_series(1, {n}),
        i -> (strpos('0123456789abcdef', substring({hexpr}, i + {off - 1}, 1)) - 1)
             * 16 ** ({n} - i))) AS BIGINT)"""


def _hex_int_wide_sql(hexpr: str, off: int, n: int) -> str:
    """Hex→BIGINT for 14-16 chars: split into a high and a low half,
    convert each exactly (≤ 2^32 per half — exact in double), and
    recombine in BIGINT arithmetic, where 64-bit products/sums are
    exact."""
    lo_n = 8
    hi_n = n - lo_n
    hi = _hex_int_sql(hexpr, off, hi_n)
    lo = _hex_int_sql(hexpr, off + hi_n, lo_n)
    return f"({hi} * 4294967296 + {lo})"


_HLL_H = "md5(CAST(user_id AS VARCHAR) || ':hll')"
_HLL_POW_SQL = "[" + ", ".join(str(v) for v in _HLL_POW) + "]"

registry.register(
    "hll_distinct",
    q_hll_distinct,
    f"""
    WITH hashed AS (
      SELECT event_type,
             {_hex_int_sql(_HLL_H, 1, 2)} AS reg,
             {_hex_int_sql(_HLL_H, 3, 8)} AS w,
             user_id
      FROM events
    ),
    regs AS (
      SELECT event_type, reg,
             MAX(CASE WHEN w = 0 THEN 33
                 ELSE 33 - length(bin(w)) END) AS mrho
      FROM hashed GROUP BY 1, 2
    ),
    per_type AS (
      SELECT event_type, COUNT(*) AS n_regs,
             SUM(({_HLL_POW_SQL})[mrho]) AS z_present
      FROM regs GROUP BY 1
    ),
    exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
      FROM events GROUP BY 1
    )
    SELECT p.event_type, e.n_exact,
           CAST(p.n_regs AS BIGINT) AS n_regs,
           CAST(256 - p.n_regs AS BIGINT) AS v_zero,
           FLOOR(
             CASE WHEN ({_HLL_NUM}) / CAST(p.z_present
                        + (256 - p.n_regs) * {_HLL_ZERO_TERM} AS DOUBLE)
                       <= 640.0
                   AND 256 - p.n_regs > 0
                  THEN 256.0 * LN(256.0 / CAST(256 - p.n_regs AS DOUBLE))
                  ELSE ({_HLL_NUM}) / CAST(p.z_present
                        + (256 - p.n_regs) * {_HLL_ZERO_TERM} AS DOUBLE)
             END * 1000000.0 + 0.5) / 1000000.0 AS hll_est
    FROM per_type p JOIN exact e ON p.event_type = e.event_type
    """,
)


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct estimate
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_RANGE = float(1 << 60)  # 15 hex chars


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global distinct-user estimate from the k=64 smallest md5 hash
    values: est = (k−1) · 2^60 / h_(k) — the KMV/bottom-k sketch.

    Scale shape: distinct hashes reduce per-partition, then
    orderBy().limit(k) compiles to TakeOrderedAndProject — every
    partition keeps its own k smallest and only k·partitions rows
    reach the driver-side merge, never the distinct set. Bottom-k
    sketches of disjoint shards union losslessly (re-take the k
    smallest of the union), which is what makes this the
    cross-dataset overlap primitive (distinct-union / Jaccard)."""
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":kmv"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    hashes = ev.select(h.alias("h")).distinct()
    bottom = hashes.orderBy("h").limit(_KMV_K)
    stats = bottom.agg(
        F.count("*").alias("k_used"), F.max("h").alias("h_k")
    )
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    est = F.when(F.col("k_used") < _KMV_K, F.col("k_used").cast("double")).otherwise(
        F.lit(float(_KMV_K - 1))
        * F.lit(_KMV_RANGE)
        / F.col("h_k").cast("double")
    )
    return stats.crossJoin(F.broadcast(exact)).select(
        "n_exact",
        F.col("k_used").cast("long").alias("k_used"),
        "h_k",
        _r6(est).alias("kmv_est"),
    )


_KMV_H = "md5(CAST(user_id AS VARCHAR) || ':kmv')"

registry.register(
    "kmv_distinct",
    q_kmv_distinct,
    f"""
    WITH hashes AS (
      SELECT DISTINCT {_hex_int_wide_sql(_KMV_H, 1, 15)} AS h FROM events
    ),
    bottom AS (SELECT h FROM hashes ORDER BY h LIMIT {_KMV_K}),
    stats AS (SELECT COUNT(*) AS k_used, MAX(h) AS h_k FROM bottom),
    exact AS (SELECT COUNT(DISTINCT user_id) AS n_exact FROM events)
    SELECT e.n_exact, CAST(s.k_used AS BIGINT) AS k_used, s.h_k,
           FLOOR(CASE WHEN s.k_used < {_KMV_K}
                      THEN CAST(s.k_used AS DOUBLE)
                      ELSE {float(_KMV_K - 1)} * {_KMV_RANGE}
                           / CAST(s.h_k AS DOUBLE) END
                 * 1000000.0 + 0.5) / 1000000.0 AS kmv_est
    FROM stats s CROSS JOIN exact e
    """,
)


# ---------------------------------------------------------------------------
# Zone-map pruning audit: clustered vs unclustered layout
# ---------------------------------------------------------------------------

_ZM_LO = 9862  # epoch days 1997-01-01
_ZM_HI = 9951  # epoch days 1997-03-31


def q_zone_map_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many storage blocks a shipdate-range predicate could skip
    under two physical layouts: date-clustered (blocks = calendar
    months — what a date-partitioned or date-sorted writer produces)
    vs key-clustered (blocks = orderkey ranges — insert order).

    This is the parquet row-group min/max zone-map model: a block is
    skippable iff [min, max] misses the predicate range. Per layout:
    block assignment is a pure column expression (NO global sort —
    the layouts are modeled, not physically rewritten), the min/max
    per block is one combinable agg, and the verdict per block is
    integer comparison. The punchline row pair shows date-clustering
    turning a ~0% prune rate into skipping every out-of-range month —
    the quantitative argument for sort-on-write (cf. zorder_value).
    Dates are exact epoch-day integers (TZ-proof)."""
    li = load_table(spark, sf_dir, "lineitem")
    d = F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date"))
    base = li.select(
        d.alias("d"),
        F.floor(d / F.lit(30)).cast("long").alias("date_block"),
        F.floor(F.col("l_orderkey") / F.lit(512)).cast("long").alias(
            "key_block"
        ),
    )
    is_match = (F.col("d") >= _ZM_LO) & (F.col("d") <= _ZM_HI)

    def layout(block_col: str, name: str) -> DataFrame:
        blocks = base.groupBy(block_col).agg(
            F.min("d").alias("min_d"),
            F.max("d").alias("max_d"),
            F.count("*").alias("n_rows"),
            F.sum(is_match.cast("long")).alias("n_match"),
        )
        pruned = (F.col("max_d") < _ZM_LO) | (F.col("min_d") > _ZM_HI)
        return blocks.agg(
            F.lit(name).alias("layout"),
            F.count("*").alias("n_blocks"),
            F.sum(pruned.cast("long")).alias("n_pruned"),
            F.sum("n_rows").alias("n_rows_total"),
            F.sum(F.when(pruned, 0).otherwise(F.col("n_rows"))).alias(
                "n_rows_scanned"
            ),
            F.sum("n_match").alias("n_rows_match"),
        )

    out = layout("date_block", "date_clustered").unionAll(
        layout("key_block", "key_clustered")
    )
    return out.select(
        "layout",
        "n_blocks",
        "n_pruned",
        "n_rows_total",
        "n_rows_scanned",
        "n_rows_match",
        _r6(
            F.col("n_pruned").cast("double")
            / F.col("n_blocks").cast("double")
        ).alias("prune_rate"),
        _r6(
            F.col("n_rows_scanned").cast("double")
            / F.greatest(F.col("n_rows_match"), F.lit(1)).cast("double")
        ).alias("scan_amplification"),
    )


_ZM_SQL_TMPL = """
    SELECT '{name}' AS layout,
           COUNT(*) AS n_blocks,
           SUM(CASE WHEN max_d < {lo} OR min_d > {hi}
               THEN 1 ELSE 0 END) AS n_pruned,
           SUM(n_rows) AS n_rows_total,
           SUM(CASE WHEN max_d < {lo} OR min_d > {hi}
               THEN 0 ELSE n_rows END) AS n_rows_scanned,
           SUM(n_match) AS n_rows_match,
           FLOOR(CAST(SUM(CASE WHEN max_d < {lo} OR min_d > {hi}
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS prune_rate,
           FLOOR(CAST(SUM(CASE WHEN max_d < {lo} OR min_d > {hi}
                          THEN 0 ELSE n_rows END) AS DOUBLE)
                 / CAST(GREATEST(SUM(n_match), 1) AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS scan_amplification
    FROM (
      SELECT {block} AS blk,
             MIN(d) AS min_d, MAX(d) AS max_d, COUNT(*) AS n_rows,
             SUM(CASE WHEN d >= {lo} AND d <= {hi}
                 THEN 1 ELSE 0 END) AS n_match
      FROM (
        SELECT date_diff('day', DATE '1970-01-01', l_shipdate) AS d,
               l_orderkey
        FROM lineitem
      ) GROUP BY 1
    )
"""

registry.register(
    "zone_map_prune",
    q_zone_map_prune,
    _ZM_SQL_TMPL.format(
        name="date_clustered",
        block="CAST(FLOOR(d / 30.0) AS BIGINT)",
        lo=_ZM_LO,
        hi=_ZM_HI,
    )
    + " UNION ALL "
    + _ZM_SQL_TMPL.format(
        name="key_clustered",
        block="CAST(FLOOR(l_orderkey / 512.0) AS BIGINT)",
        lo=_ZM_LO,
        hi=_ZM_HI,
    ),
)


# ---------------------------------------------------------------------------
# Ordered funnel: view -> click -> purchase within 14 days
# ---------------------------------------------------------------------------

_FUNNEL_WINDOW_US = 14 * 86400 * 1000000


def q_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic ordered conversion funnel: of the users who viewed, how
    many then clicked AFTER their first view, then purchased AFTER
    that click, all within 14 days of the first view.

    Order-aware (a purchase before the first view does not count),
    which is what separates a funnel from three independent distinct
    counts. Shape: first-view per user is one combinable agg; each
    later step is a conditional min over the user's events joined
    against the previous step's timestamp — two shuffles on user_id
    total (the join and the re-agg share partitioning). Timestamps
    are exact epoch micros, so step comparisons are integer."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
    )
    t1 = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("us").alias("t1")
    )
    t2 = (
        ev.join(t1, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("us") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"), F.min("t1").alias("t1"))
    )
    t3 = (
        ev.join(t2.select("user_id", "t1", "t2"), "user_id")
        .filter(
            (F.col("event_type") == "purchase") & (F.col("us") > F.col("t2"))
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"), F.min("t1").alias("t1"))
    )
    win = F.lit(_FUNNEL_WINDOW_US)
    n1 = t1.agg(F.count("*").alias("n_view"))
    n2 = t2.filter(F.col("t2") - F.col("t1") <= win).agg(
        F.count("*").alias("n_click")
    )
    n3 = t3.filter(F.col("t3") - F.col("t1") <= win).agg(
        F.count("*").alias("n_purchase")
    )
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(n3))
        .select(
            "n_view",
            "n_click",
            "n_purchase",
            _r6(
                F.col("n_click").cast("double")
                / F.col("n_view").cast("double")
            ).alias("view_to_click"),
            _r6(
                F.col("n_purchase").cast("double")
                / F.greatest(F.col("n_click"), F.lit(1)).cast("double")
            ).alias("click_to_purchase"),
        )
    )


registry.register(
    "ordered_funnel",
    q_ordered_funnel,
    f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ),
    t1 AS (
      SELECT user_id, MIN(us) AS t1 FROM ev
      WHERE event_type = 'view' GROUP BY 1
    ),
    t2 AS (
      SELECT e.user_id, MIN(e.us) AS t2, MIN(t1.t1) AS t1
      FROM ev e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND e.us > t1.t1
      GROUP BY 1
    ),
    t3 AS (
      SELECT e.user_id, MIN(e.us) AS t3, MIN(t2.t1) AS t1
      FROM ev e JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND e.us > t2.t2
      GROUP BY 1
    ),
    n1 AS (SELECT COUNT(*) AS n_view FROM t1),
    n2 AS (SELECT COUNT(*) AS n_click FROM t2
           WHERE t2 - t1 <= {_FUNNEL_WINDOW_US}),
    n3 AS (SELECT COUNT(*) AS n_purchase FROM t3
           WHERE t3 - t1 <= {_FUNNEL_WINDOW_US})
    SELECT n_view, n_click, n_purchase,
           FLOOR(CAST(n_click AS DOUBLE) / CAST(n_view AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS view_to_click,
           FLOOR(CAST(n_purchase AS DOUBLE)
                 / CAST(GREATEST(n_click, 1) AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS click_to_purchase
    FROM n1 CROSS JOIN n2 CROSS JOIN n3
    """,
)


# ---------------------------------------------------------------------------
# KMV set-overlap estimate: viewers vs purchasers
# ---------------------------------------------------------------------------


def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard / intersection-size estimate between two user sets
    (viewers vs purchasers) from their bottom-64 hash sketches,
    reported next to the exact numbers.

    The union sketch is the k smallest of A∪B; any of its elements
    that belongs to A is necessarily inside A's own bottom-k (it
    beats A's k-th smallest), so membership tests against the two
    small sketches are EXACT for union-sketch elements — the standard
    KMV identity. ĵ = |sketch∩A∩B| / k, intersection ≈ ĵ · |A∪B|-est.
    Scale shape: per-set distinct hashes reduce map-side; each
    bottom-k is a TakeOrderedAndProject (k rows per partition to the
    merge); the estimator itself touches 3·k = 192 rows. This is the
    cross-dataset overlap primitive: sketches of two 100 TB corpora
    compare in constant memory."""
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":kmv"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    users = ev.filter(
        F.col("event_type").isin("view", "purchase")
    ).select("event_type", h.alias("h")).distinct()
    bot_a = users.filter(F.col("event_type") == "view").select("h").orderBy("h").limit(_KMV_K)
    bot_b = users.filter(F.col("event_type") == "purchase").select("h").orderBy("h").limit(_KMV_K)
    bot_u = (
        bot_a.unionAll(bot_b).distinct().orderBy("h").limit(_KMV_K)
    )
    flagged = (
        bot_u.join(bot_a.withColumn("in_a", F.lit(1)), "h", "left")
        .join(bot_b.withColumn("in_b", F.lit(1)), "h", "left")
        .agg(
            F.count("*").alias("k_used"),
            F.max("h").alias("h_k"),
            F.sum(
                F.when(
                    F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1
                ).otherwise(0)
            ).alias("n_both_sketch"),
        )
    )
    ex = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "event_type", "user_id"
    ).distinct()
    a_set = ex.filter(F.col("event_type") == "view").select("user_id")
    b_set = ex.filter(F.col("event_type") == "purchase").select("user_id")
    exact = (
        a_set.withColumn("fa", F.lit(1))
        .join(b_set.withColumn("fb", F.lit(1)), "user_id", "full")
        .agg(
            F.sum(F.coalesce("fa", F.lit(0))).alias("n_a"),
            F.sum(F.coalesce("fb", F.lit(0))).alias("n_b"),
            F.sum(
                F.when(
                    F.col("fa").isNotNull() & F.col("fb").isNotNull(), 1
                ).otherwise(0)
            ).alias("n_both_exact"),
        )
    )
    union_est = F.when(
        F.col("k_used") < _KMV_K, F.col("k_used").cast("double")
    ).otherwise(
        F.lit(float(_KMV_K - 1)) * F.lit(_KMV_RANGE) / F.col("h_k").cast("double")
    )
    j_est = F.col("n_both_sketch").cast("double") / F.col("k_used").cast("double")
    return flagged.crossJoin(F.broadcast(exact)).select(
        "n_a",
        "n_b",
        "n_both_exact",
        _r6(
            F.col("n_both_exact").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_both_exact")).cast(
                "double"
            )
        ).alias("jaccard_exact"),
        F.col("n_both_sketch").cast("long").alias("n_both_sketch"),
        _r6(j_est).alias("kmv_jaccard"),
        _r6(j_est * union_est).alias("kmv_intersection"),
    )


registry.register(
    "kmv_overlap",
    q_kmv_overlap,
    f"""
    WITH users AS (
      SELECT DISTINCT event_type,
             {_hex_int_wide_sql(_KMV_H, 1, 15)} AS h
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    bot_a AS (SELECT h FROM users WHERE event_type = 'view'
              ORDER BY h LIMIT {_KMV_K}),
    bot_b AS (SELECT h FROM users WHERE event_type = 'purchase'
              ORDER BY h LIMIT {_KMV_K}),
    bot_u AS (SELECT DISTINCT h FROM (
                SELECT h FROM bot_a UNION ALL SELECT h FROM bot_b)
              ORDER BY h LIMIT {_KMV_K}),
    flagged AS (
      SELECT COUNT(*) AS k_used, MAX(u.h) AS h_k,
             SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                 THEN 1 ELSE 0 END) AS n_both_sketch
      FROM bot_u u
      LEFT JOIN bot_a a ON u.h = a.h
      LEFT JOIN bot_b b ON u.h = b.h
    ),
    ex AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE event_type IN ('view', 'purchase')
    ),
    exact AS (
      SELECT
        SUM(CASE WHEN a.user_id IS NOT NULL THEN 1 ELSE 0 END) AS n_a,
        SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS n_b,
        SUM(CASE WHEN a.user_id IS NOT NULL AND b.user_id IS NOT NULL
            THEN 1 ELSE 0 END) AS n_both_exact
      FROM (SELECT user_id FROM ex WHERE event_type = 'view') a
      FULL JOIN (SELECT user_id FROM ex WHERE event_type = 'purchase') b
        ON a.user_id = b.user_id
    )
    SELECT e.n_a, e.n_b, e.n_both_exact,
           FLOOR(CAST(e.n_both_exact AS DOUBLE)
                 / CAST(e.n_a + e.n_b - e.n_both_exact AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS jaccard_exact,
           CAST(f.n_both_sketch AS BIGINT) AS n_both_sketch,
           FLOOR(CAST(f.n_both_sketch AS DOUBLE)
                 / CAST(f.k_used AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS kmv_jaccard,
           FLOOR(CAST(f.n_both_sketch AS DOUBLE) / CAST(f.k_used AS DOUBLE)
                 * (CASE WHEN f.k_used < {_KMV_K}
                         THEN CAST(f.k_used AS DOUBLE)
                         ELSE {float(_KMV_K - 1)} * {_KMV_RANGE}
                              / CAST(f.h_k AS DOUBLE) END)
                 * 1000000.0 + 0.5) / 1000000.0 AS kmv_intersection
    FROM flagged f CROSS JOIN exact e
    """,
)


# ---------------------------------------------------------------------------
# Embedding outliers: distance-to-assigned-centroid z-score
# ---------------------------------------------------------------------------


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector outlier flag for training-data curation: assign each
    embedding to its nearest anchor (the first 8 vectors, as in
    pq_adc_topk), then z-score each vector's distance within its
    cluster — vectors far from every anchor are mislabeled/corrupt
    candidates that near-dup filters can't see.

    Exactness: distances are exact BIGINT micro-unit sums (the
    pq_adc idiom — per-component floor-quantize THEN integer sum, so
    in-row order is irrelevant); cluster moments Σd and Σd² accumulate
    in DECIMAL(38,0)/HUGEINT exact integers (Σd² overflows BIGINT at
    ~5k vectors); μ, σ, z are then identical IEEE expressions on both
    engines. Scale shape: anchors broadcast; one shuffle groups
    distances by cluster for moments, one broadcast joins them back —
    the vector table is scanned once."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    term = lambda x, y: F.floor(  # noqa: E731
        (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    dm = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("cv"), term),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    dmat = emb.crossJoin(F.broadcast(anchors)).select(
        "vec_id", "cid", dm.alias("dm")
    )
    w = Window.partitionBy("vec_id").orderBy("dm", "cid")
    assigned = (
        dmat.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", "dm")
    )
    stats = assigned.groupBy("cid").agg(
        F.count("*").alias("n"),
        F.sum(F.col("dm").cast("decimal(38,0)")).alias("sd"),
        F.sum(
            (
                F.col("dm").cast("decimal(19,0)")
                * F.col("dm").cast("decimal(19,0)")
            ).cast("decimal(38,0)")
        ).alias("sdd"),
    )
    mu = F.col("sd").cast("double") / F.col("n").cast("double")
    var = F.greatest(
        F.col("sdd").cast("double") / F.col("n").cast("double") - mu * mu,
        F.lit(0.0),
    )
    z = F.when(var == 0.0, F.lit(0.0)).otherwise(
        (F.col("dm").cast("double") - mu) / F.sqrt(var)
    )
    return (
        assigned.join(F.broadcast(stats), "cid")
        .select(
            "vec_id",
            "cid",
            "dm",
            _r6(z).alias("z_dist"),
            F.when(z > 2.0, 1).otherwise(0).cast("int").alias("is_outlier"),
        )
    )


_EMB_MICRO = (
    "(SELECT SUM(CAST(FLOOR((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
    " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT))"
    " FROM (SELECT unnest(e.embedding) x, unnest(c.cv) y))"
)

registry.register(
    "embedding_outliers",
    q_embedding_outliers,
    f"""
    WITH anchors AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings
      WHERE vec_id < 8
    ),
    dmat AS (
      SELECT e.vec_id, c.cid, {_EMB_MICRO} AS dm
      FROM embeddings e CROSS JOIN anchors c
    ),
    assigned AS (
      SELECT vec_id, cid, dm FROM (
        SELECT vec_id, cid, dm,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dm, cid) AS rn
        FROM dmat
      ) WHERE rn = 1
    ),
    stats AS (
      SELECT cid, COUNT(*) AS n, SUM(dm) AS sd,
             SUM(CAST(dm AS HUGEINT) * dm) AS sdd
      FROM assigned GROUP BY 1
    ),
    scored AS (
      SELECT a.vec_id, a.cid, a.dm,
             CAST(s.sd AS DOUBLE) / CAST(s.n AS DOUBLE) AS mu,
             GREATEST(CAST(s.sdd AS DOUBLE) / CAST(s.n AS DOUBLE)
                      - (CAST(s.sd AS DOUBLE) / CAST(s.n AS DOUBLE))
                        * (CAST(s.sd AS DOUBLE) / CAST(s.n AS DOUBLE)),
                      0.0) AS var
      FROM assigned a JOIN stats s ON a.cid = s.cid
    )
    SELECT vec_id, cid, dm,
           FLOOR(CASE WHEN var = 0.0 THEN 0.0
                      ELSE (CAST(dm AS DOUBLE) - mu) / SQRT(var) END
                 * 1000000.0 + 0.5) / 1000000.0 AS z_dist,
           CAST(CASE WHEN var > 0.0
                      AND (CAST(dm AS DOUBLE) - mu) / SQRT(var) > 2.0
                     THEN 1 ELSE 0 END AS INTEGER) AS is_outlier
    FROM scored
    """,
)


# ---------------------------------------------------------------------------
# HLL mergeability: daily sketches merged == whole-range sketch
# ---------------------------------------------------------------------------


def _hll_est_sql(n_regs: str, z_present: str) -> str:
    """The estimate formula over aggregated registers, as one DuckDB
    expression (same literal tree as hll_finalize)."""
    z = f"CAST({z_present} + (256 - {n_regs}) * {_HLL_ZERO_TERM} AS DOUBLE)"
    return f"""FLOOR(
        CASE WHEN ({_HLL_NUM}) / {z} <= 640.0 AND 256 - {n_regs} > 0
             THEN 256.0 * LN(256.0 / CAST(256 - {n_regs} AS DOUBLE))
             ELSE ({_HLL_NUM}) / {z} END
        * 1000000.0 + 0.5) / 1000000.0"""


def q_hll_daily_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The property that makes register sketches the scale path:
    per-day sketches MERGE LOSSLESSLY (register-wise max), so the
    merged whole-range estimate is bit-identical to the sketch built
    directly over the whole range. This is how a 100 TB corpus gets
    incremental distinct counts — build tiny per-partition/per-day
    register tables at ingest, merge on demand — and this query
    PROVES the identity on real data instead of asserting it in a
    comment: est_equal must be 1.

    Shapes: the daily register table is |days|·256 rows; the merge is
    a 256-row max-regroup. The direct sketch shares the same map
    stage. One fact scan feeds both."""
    ev = load_table(spark, sf_dir, "events")
    idx, rho = hll_register_exprs("user_id")
    day = F.date_trunc("day", F.col("ts"))
    base = ev.select(
        day.alias("day"), idx.alias("reg"), rho.alias("rho")
    )
    daily = base.groupBy("day", "reg").agg(F.max("rho").alias("mrho"))
    merged = hll_finalize(
        daily.groupBy("reg").agg(F.max("mrho").alias("mrho")).select(
            F.lit(1).alias("g"), "reg", "mrho"
        ),
        ["g"],
    )
    direct = hll_finalize(
        base.groupBy("reg").agg(F.max("rho").alias("mrho")).select(
            F.lit(1).alias("g"), "reg", "mrho"
        ),
        ["g"],
    )
    n_days = daily.select("day").distinct().agg(
        F.count("*").alias("n_days")
    )
    m = merged.select(
        F.col("hll_est").alias("merged_est"),
        F.col("n_regs").alias("merged_regs"),
    )
    d = direct.select(
        F.col("hll_est").alias("direct_est"),
        F.col("n_regs").alias("direct_regs"),
    )
    return (
        m.crossJoin(F.broadcast(d))
        .crossJoin(F.broadcast(n_days))
        .select(
            "n_days",
            "merged_regs",
            "direct_regs",
            "merged_est",
            "direct_est",
            F.when(F.col("merged_est") == F.col("direct_est"), 1)
            .otherwise(0)
            .cast("int")
            .alias("est_equal"),
        )
    )


registry.register(
    "hll_daily_merge",
    q_hll_daily_merge,
    f"""
    WITH base AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             {_hex_int_sql(_HLL_H, 1, 2)} AS reg,
             CASE WHEN {_hex_int_sql(_HLL_H, 3, 8)} = 0 THEN 33
                  ELSE 33 - length(bin({_hex_int_sql(_HLL_H, 3, 8)})) END
               AS rho
      FROM events
    ),
    daily AS (
      SELECT day, reg, MAX(rho) AS mrho FROM base GROUP BY 1, 2
    ),
    merged_regs AS (
      SELECT reg, MAX(mrho) AS mrho FROM daily GROUP BY 1
    ),
    direct_regs AS (
      SELECT reg, MAX(rho) AS mrho FROM base GROUP BY 1
    ),
    m AS (
      SELECT COUNT(*) AS n_regs,
             SUM(({_HLL_POW_SQL})[mrho]) AS z FROM merged_regs
    ),
    d AS (
      SELECT COUNT(*) AS n_regs,
             SUM(({_HLL_POW_SQL})[mrho]) AS z FROM direct_regs
    ),
    nd AS (SELECT COUNT(DISTINCT day) AS n_days FROM daily)
    SELECT nd.n_days,
           CAST(m.n_regs AS BIGINT) AS merged_regs,
           CAST(d.n_regs AS BIGINT) AS direct_regs,
           {_hll_est_sql("m.n_regs", "m.z")} AS merged_est,
           {_hll_est_sql("d.n_regs", "d.z")} AS direct_est,
           CAST(CASE WHEN {_hll_est_sql("m.n_regs", "m.z")}
                        = {_hll_est_sql("d.n_regs", "d.z")}
                THEN 1 ELSE 0 END AS INTEGER) AS est_equal
    FROM m CROSS JOIN d CROSS JOIN nd
    """,
)


# ---------------------------------------------------------------------------
# Bitmap day-presence index with popcount audit
# ---------------------------------------------------------------------------


def q_bitmap_day_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap presence index: for each order status, pack "was this
    status active on day d" into 63-day BIGINT blocks (bit i of block
    b covers epoch-day 63·b+i; bits 0..62 keep the sign bit clear,
    which DuckDB's checked left-shift requires) and answer day-count and day-overlap
    questions with pure popcount arithmetic — the roaring-bitmap idea
    every OLAP engine uses for low-cardinality secondary indexes.
    Audits itself: the popcount day count must equal the exact
    COUNT(DISTINCT day), and the AND-mask overlap with status 'F'
    must equal the exact intersection count.

    Exactness: masks are bit_or of (1 << bit) over exact integer day
    offsets; popcounts are integers — nothing floating anywhere.
    Shapes: the fact reduces to (status, block) rows — 64 days per
    row — with a map-side combinable bit_or; the overlap is a
    block-keyed equi-join of two bounded mask tables; output is one
    row per status."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).alias("di"),
    )
    blocks = o.groupBy(
        "status", F.expr("di DIV 63").alias("blk")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(di % 63 AS INT))")
        ).alias("mask")
    )
    per_status = blocks.groupBy("status").agg(
        F.count("*").alias("n_blocks"),
        F.sum(F.bit_count("mask")).alias("days_bitmap"),
    )
    exact = o.groupBy("status").agg(
        F.countDistinct("di").alias("days_exact")
    )
    fmask = blocks.filter(F.col("status") == "F").select(
        "blk", F.col("mask").alias("fmask")
    )
    overlap = (
        blocks.join(F.broadcast(fmask), "blk")
        .groupBy("status")
        .agg(
            F.sum(
                F.bit_count(F.col("mask").bitwiseAND(F.col("fmask")))
            ).alias("days_shared_with_f")
        )
    )
    return (
        per_status.join(exact, "status")
        .join(overlap, "status")
        .select(
            "status",
            "n_blocks",
            F.col("days_bitmap").cast("long").alias("days_bitmap"),
            "days_exact",
            (F.col("days_bitmap") == F.col("days_exact"))
            .cast("int")
            .alias("audit_ok"),
            F.col("days_shared_with_f").cast("long").alias("days_shared_with_f"),
        )
    )


registry.register(
    "bitmap_day_index",
    q_bitmap_day_index,
    """
    WITH o AS (
      SELECT o_orderstatus AS status,
             DATEDIFF('day', DATE '1970-01-01',
                      CAST(o_orderdate AS DATE)) AS di
      FROM orders
    ),
    blocks AS (
      SELECT status, di // 63 AS blk,
             BIT_OR(1::BIGINT << CAST(di % 63 AS INT)) AS mask
      FROM o GROUP BY 1, 2
    ),
    per_status AS (
      SELECT status, COUNT(*) AS n_blocks,
             SUM(BIT_COUNT(mask)) AS days_bitmap
      FROM blocks GROUP BY 1
    ),
    exact AS (
      SELECT status, COUNT(DISTINCT di) AS days_exact
      FROM o GROUP BY 1
    ),
    fmask AS (
      SELECT blk, mask AS fm FROM blocks WHERE status = 'F'
    ),
    overlap AS (
      SELECT b.status, SUM(BIT_COUNT(b.mask & f.fm))
               AS days_shared_with_f
      FROM blocks b JOIN fmask f ON b.blk = f.blk
      GROUP BY 1
    )
    SELECT p.status, p.n_blocks,
           CAST(p.days_bitmap AS BIGINT) AS days_bitmap,
           e.days_exact,
           CAST(p.days_bitmap = e.days_exact AS INT) AS audit_ok,
           CAST(o.days_shared_with_f AS BIGINT) AS days_shared_with_f
    FROM per_status p
    JOIN exact e ON p.status = e.status
    JOIN overlap o ON p.status = o.status
    """,
)


# ---------------------------------------------------------------------------
# Bloom filter false-positive-rate audit (measured vs theoretical)
# ---------------------------------------------------------------------------

# ln(1 - 1/m) for m = 2^18 bits, inlined as the SAME decimal literal
# into both engines (the LCG-literal rule): runtime LN could differ by
# an ulp between Java and libm; a parsed literal cannot.
_BLOOM_M = 262144
_BLOOM_LN1M = __import__("math").log(1.0 - 1.0 / _BLOOM_M)


def q_bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a k=2, m=2^18-bit Bloom filter over the customer keys
    and MEASURE its false-positive rate with 10,000 disjoint-keyspace
    probes, next to the textbook prediction
    (1 - (1-1/m)^(kn))^k -- the calibration check that belongs next
    to any Bloom deployment (`bloom_prune_join` uses one to skip
    shuffle partitions; this audits whether its advertised FPR can
    be trusted at the observed fill factor).

    Determinism: bit positions are md5 hex fields mod m (the house
    identity-coin idiom -- no RNG); the bit SET is an exact distinct
    set; a probe is a false positive iff BOTH its positions hit,
    decided by two broadcast joins against the distinct bit table
    (<= 2n rows, bounded by m). The only transcendental is one
    EXP(kn * ln(1-1/m)) with the ln factor a shared literal;
    `_r6` bounds the final doubles. Scale: one fact scan to hash,
    bit table bounded by m = 262,144."""
    m = _BLOOM_M
    keys = load_table(spark, sf_dir, "customer").select(
        F.md5(F.concat(F.lit("c:"), F.col("c_custkey").cast("string")))
        .alias("h")
    )
    pos = keys.select(
        (F.conv(F.substring("h", 1, 5), 16, 10).cast("long") % m)
        .alias("p1"),
        (F.conv(F.substring("h", 6, 5), 16, 10).cast("long") % m)
        .alias("p2"),
    )
    bits = (
        pos.select(F.col("p1").alias("b"))
        .unionByName(pos.select(F.col("p2").alias("b")))
        .distinct()
    )
    probes = spark.range(0, 10000).select(
        F.md5(F.concat(F.lit("p:"), F.col("id").cast("string")))
        .alias("h")
    ).select(
        (F.conv(F.substring("h", 1, 5), 16, 10).cast("long") % m)
        .alias("p1"),
        (F.conv(F.substring("h", 6, 5), 16, 10).cast("long") % m)
        .alias("p2"),
    )
    b1 = bits.select(F.col("b").alias("b1"))
    b2 = bits.select(F.col("b").alias("b2"))
    hit = (
        probes.join(F.broadcast(b1), probes["p1"] == F.col("b1"), "left")
        .join(F.broadcast(b2), probes["p2"] == F.col("b2"), "left")
        .agg(
            F.count("*").alias("n_probes"),
            F.sum(
                (F.col("b1").isNotNull() & F.col("b2").isNotNull())
                .cast("long")
            ).cast("long").alias("fp"),
        )
    )
    nbits = bits.agg(F.count("*").cast("long").alias("bits_set"))
    nk = pos.agg(F.count("*").cast("long").alias("n_keys"))
    joined = hit.crossJoin(F.broadcast(nbits)).crossJoin(F.broadcast(nk))
    fill = F.lit(1.0) - F.exp(
        F.lit(2.0) * F.col("n_keys").cast("double") * F.lit(_BLOOM_LN1M)
    )
    return joined.select(
        F.col("n_keys"),
        F.col("bits_set"),
        F.col("n_probes").cast("long").alias("n_probes"),
        F.col("fp").alias("false_positives"),
        _r6(
            F.col("fp").cast("double") / F.col("n_probes").cast("double")
        ).alias("measured_fpr"),
        _r6(fill * fill).alias("theoretical_fpr"),
    )


registry.register(
    "bloom_fpr_audit",
    q_bloom_fpr_audit,
    f"""
    WITH keypos AS (
      SELECT {_hex_int_sql("md5('c:' || CAST(c_custkey AS VARCHAR))", 1, 5)}
               % {_BLOOM_M} AS p1,
             {_hex_int_sql("md5('c:' || CAST(c_custkey AS VARCHAR))", 6, 5)}
               % {_BLOOM_M} AS p2
      FROM customer
    ),
    nk AS (SELECT COUNT(*) AS n_keys FROM keypos),
    bits AS (
      SELECT DISTINCT b FROM (
        SELECT p1 AS b FROM keypos UNION ALL SELECT p2 AS b FROM keypos
      )
    ),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS bits_set FROM bits),
    probes AS (
      SELECT {_hex_int_sql("md5('p:' || CAST(pid AS VARCHAR))", 1, 5)}
               % {_BLOOM_M} AS p1,
             {_hex_int_sql("md5('p:' || CAST(pid AS VARCHAR))", 6, 5)}
               % {_BLOOM_M} AS p2
      FROM generate_series(0, 9999) t(pid)
    ),
    hit AS (
      SELECT COUNT(*) AS n_probes,
             CAST(SUM(CAST(b1.b IS NOT NULL AND b2.b IS NOT NULL
                           AS BIGINT)) AS BIGINT) AS fp
      FROM probes p
      LEFT JOIN bits b1 ON p.p1 = b1.b
      LEFT JOIN bits b2 ON p.p2 = b2.b
    )
    SELECT CAST(nk.n_keys AS BIGINT) AS n_keys,
           nb.bits_set,
           CAST(hit.n_probes AS BIGINT) AS n_probes,
           hit.fp AS false_positives,
           FLOOR(CAST(hit.fp AS DOUBLE) / CAST(hit.n_probes AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS measured_fpr,
           FLOOR((1.0 - EXP(2.0 * CAST(nk.n_keys AS DOUBLE)
                            * {_BLOOM_LN1M!r}))
                 * (1.0 - EXP(2.0 * CAST(nk.n_keys AS DOUBLE)
                              * {_BLOOM_LN1M!r}))
                 * 1000000.0 + 0.5) / 1000000.0 AS theoretical_fpr
    FROM hit CROSS JOIN nk CROSS JOIN nb
    """,
)
