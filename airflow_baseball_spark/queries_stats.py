"""Statistical profiling + ranking operators: correlation matrix,
column entropy, group-wise z-score outliers, robust (median/MAD)
stats, BM25 document ranking, and regex sequence matching.

Engine-independence: every double in a checked projection is derived
from EXACT integer/decimal aggregates (counts, decimal sums) through
an identical IEEE expression tree on both engines, then `_r6`
floor-rounded — the same convention as queries_relational's
sufficient-statistics regression. No double is ever *summed* in
partition order on the checked path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_baseball_spark import registry
from airflow_baseball_spark.functions.scalar import dec_portable, round6_portable
from airflow_baseball_spark.schemas import load_table

_r6 = round6_portable


# ---------------------------------------------------------------------------
# Pairwise Pearson correlation matrix from sufficient statistics
# ---------------------------------------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs Pearson correlation across the lineitem measures in
    ONE map-combinable pass: per-column decimal sums + sums of squares
    + the 6 cross-product sums land in a single 1-row aggregate, and
    the 6 (col_a, col_b, r) rows are exploded from that row — the fact
    is scanned once regardless of how many pairs are requested.

    Why not `F.corr`: it accumulates doubles in partition order, so
    results drift in the last ulps between engines / parallelism
    levels. Exact decimal sufficient statistics make the final IEEE
    division bit-identical on Spark and DuckDB and invariant to
    partition count — what you want when the same profile job runs on
    32 and 10,000 cores."""
    li = load_table(spark, sf_dir, "lineitem")
    d = {c: dec_portable(c) for c in _CORR_COLS}
    aggs = [F.count("*").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(d[c]).alias(f"s_{c}"))
        aggs.append(F.sum((d[c] * d[c]).cast("decimal(38,4)")).alias(f"ss_{c}"))
    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
    ]
    for a, b in pairs:
        aggs.append(F.sum((d[a] * d[b]).cast("decimal(38,4)")).alias(f"sp_{a}_{b}"))
    stats = li.agg(*aggs)

    def corr_expr(a: str, b: str) -> Column:
        n = F.col("n").cast("double")
        sa = F.col(f"s_{a}").cast("double")
        sb = F.col(f"s_{b}").cast("double")
        ssa = F.col(f"ss_{a}").cast("double")
        ssb = F.col(f"ss_{b}").cast("double")
        sp = F.col(f"sp_{a}_{b}").cast("double")
        return (n * sp - sa * sb) / (
            F.sqrt(n * ssa - sa * sa) * F.sqrt(n * ssb - sb * sb)
        )

    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                _r6(corr_expr(a, b)).alias("pearson_r"),
            )
            for a, b in pairs
        ]
    )
    return stats.select(F.inline(rows))


def _corr_oracle() -> str:
    cols = _CORR_COLS
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    sums = ",\n             ".join(
        f"SUM(CAST(FLOOR({c} * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS s_{c},\n             "
        f"SUM(CAST(CAST(FLOOR({c} * 100 + 0.5) / 100 AS DECIMAL(18,2)) "
        f"* CAST(FLOOR({c} * 100 + 0.5) / 100 AS DECIMAL(18,2)) "
        f"AS DECIMAL(38,4))) AS ss_{c}"
        for c in cols
    )
    sps = ",\n             ".join(
        f"SUM(CAST(CAST(FLOOR({a} * 100 + 0.5) / 100 AS DECIMAL(18,2)) "
        f"* CAST(FLOOR({b} * 100 + 0.5) / 100 AS DECIMAL(18,2)) "
        f"AS DECIMAL(38,4))) AS sp_{a}_{b}"
        for a, b in pairs
    )
    selects = "\n    UNION ALL\n".join(
        f"""    SELECT '{a}' AS col_a, '{b}' AS col_b,
           FLOOR((CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE)
                  - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))
                 / (SQRT(CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)
                         - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))
                    * SQRT(CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)
                           - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0 AS pearson_r
    FROM stats"""
        for a, b in pairs
    )
    return f"""
    WITH stats AS (
      SELECT COUNT(*) AS n,
             {sums},
             {sps}
      FROM lineitem
    )
{selects}
    """


registry.register("corr_matrix", q_corr_matrix, _corr_oracle())


# ---------------------------------------------------------------------------
# Shannon entropy profile of categorical columns
# ---------------------------------------------------------------------------


def q_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of categorical columns across two
    tables, from exact counts via H = ln(N) - (Σ n_i·ln n_i)/N — one
    count-agg per column, each already tiny after its groupBy, unioned
    into a 3-row profile. The Σ over ≤25 group terms is the only
    float sum and is `_r6`-bounded."""

    def col_entropy(df: DataFrame, col: str, label: str) -> DataFrame:
        counts = df.groupBy(col).agg(F.count("*").alias("cnt"))
        return counts.agg(
            F.lit(label).alias("column_name"),
            F.count("*").alias("n_distinct"),
            _r6(
                F.log(F.sum("cnt").cast("double"))
                - F.sum(F.col("cnt").cast("double") * F.log(F.col("cnt").cast("double")))
                / F.sum("cnt").cast("double")
            ).alias("entropy_nats"),
        )

    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    return (
        col_entropy(ev, "event_type", "events.event_type")
        .unionAll(col_entropy(docs, "lang", "documents.lang"))
        .unionAll(col_entropy(docs, "source", "documents.source"))
    )


_ENTROPY_ONE = """
      SELECT '{label}' AS column_name, COUNT(*) AS n_distinct,
             FLOOR((LN(CAST(SUM(cnt) AS DOUBLE))
                    - SUM(CAST(cnt AS DOUBLE) * LN(CAST(cnt AS DOUBLE)))
                      / CAST(SUM(cnt) AS DOUBLE)) * 1000000.0 + 0.5)
               / 1000000.0 AS entropy_nats
      FROM (SELECT {col}, COUNT(*) AS cnt FROM {table} GROUP BY 1)
"""

registry.register(
    "entropy_profile",
    q_entropy_profile,
    "\n    UNION ALL\n".join(
        _ENTROPY_ONE.format(label=lbl, col=c, table=t)
        for lbl, c, t in [
            ("events.event_type", "event_type", "events"),
            ("documents.lang", "lang", "documents"),
            ("documents.source", "source", "documents"),
        ]
    ),
)


# ---------------------------------------------------------------------------
# Group-wise z-score outliers
# ---------------------------------------------------------------------------


def q_groupwise_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type standardization, reporting |z| > 2.5 outliers.
    Group mean/std come from exact decimal sufficient statistics
    (n, Σx, Σx²) — one combiner-friendly shuffle to a group-count-sized
    table that broadcasts back onto the fact, so the events table is
    scanned twice but shuffled ZERO times for the scoring pass.

    Why not a window: Window.partitionBy(event_type) shuffles the
    whole fact AND serializes each group through one task; with 5
    event types on a 100 TB log that's 5 tasks doing all the work.
    The agg+broadcast-join form keeps scoring embarrassingly
    parallel."""
    ev = load_table(spark, sf_dir, "events")
    x = dec_portable("value", 12, 4)
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum((x * x).cast("decimal(38,8)")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    stats = stats.select(
        F.col("event_type").alias("g_type"),
        (sx / n).alias("g_mean"),
        F.sqrt((sxx - sx * sx / n) / (n - F.lit(1.0))).alias("g_std"),
    )
    z = (dec_portable("value", 12, 4).cast("double") - F.col("g_mean")) / F.col(
        "g_std"
    )
    return (
        ev.join(F.broadcast(stats), ev["event_type"] == F.col("g_type"))
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 2.5)
        .select("event_id", "event_type", _r6(F.col("z")).alias("zscore"))
    )


registry.register(
    "groupwise_zscore",
    q_groupwise_zscore,
    """
    WITH stats AS (
      SELECT event_type AS g_type, COUNT(*) AS n,
             SUM(CAST(FLOOR(value * 10000 + 0.5) / 10000 AS DECIMAL(12,4))) AS sx,
             SUM(CAST(CAST(FLOOR(value * 10000 + 0.5) / 10000 AS DECIMAL(12,4)) * CAST(FLOOR(value * 10000 + 0.5) / 10000 AS DECIMAL(12,4))
                 AS DECIMAL(38,8))) AS sxx
      FROM events GROUP BY 1
    ),
    g AS (
      SELECT g_type,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS g_mean,
             SQRT((CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1.0)) AS g_std
      FROM stats
    )
    SELECT e.event_id, e.event_type,
           FLOOR((CAST(CAST(FLOOR(e.value * 10000 + 0.5) / 10000 AS DECIMAL(12,4)) AS DOUBLE) - g.g_mean)
                 / g.g_std * 1000000.0 + 0.5) / 1000000.0 AS zscore
    FROM events e JOIN g ON e.event_type = g.g_type
    WHERE ABS((CAST(CAST(FLOOR(e.value * 10000 + 0.5) / 10000 AS DECIMAL(12,4)) AS DOUBLE) - g.g_mean)
              / g.g_std) > 2.5
    """,
)


# ---------------------------------------------------------------------------
# Robust stats: per-group median + MAD
# ---------------------------------------------------------------------------


def q_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type median and median-absolute-deviation. Two
    percentile passes (medians can't come from sufficient statistics):
    pass 1 computes group medians, pass 2 re-scans with the 5-row
    median table broadcast back and takes the median of |x - med|.
    Exact `percentile` (not approx) — both engines interpolate even
    counts as the midpoint average of two identical doubles, so the
    result is bit-identical without any decimal staging."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    ).select(F.col("event_type").alias("g_type"), "med")
    dev = ev.join(F.broadcast(med), ev["event_type"] == F.col("g_type")).select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("adev"), "med"
    )
    return dev.groupBy("event_type").agg(
        _r6(F.first("med")).alias("median_value"),
        _r6(F.expr("percentile(adev, 0.5)")).alias("mad"),
        F.count("*").alias("n"),
    )


registry.register(
    "robust_stats",
    q_robust_stats,
    """
    WITH med AS (
      SELECT event_type AS g_type,
             QUANTILE_CONT(value, 0.5) AS med
      FROM events GROUP BY 1
    ),
    dev AS (
      SELECT e.event_type, ABS(e.value - m.med) AS adev, m.med
      FROM events e JOIN med m ON e.event_type = m.g_type
    )
    SELECT event_type,
           FLOOR(ANY_VALUE(med) * 1000000.0 + 0.5) / 1000000.0 AS median_value,
           FLOOR(QUANTILE_CONT(adev, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS mad,
           COUNT(*) AS n
    FROM dev GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# BM25 ranking over the documents table
# ---------------------------------------------------------------------------

_BM25_TERMS = ["spark", "window", "hash"]
_BM25_K1 = 1.2
_BM25_B = 0.75


def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document to a fixed term set. Per-doc
    term frequencies and doc length are in-row array ops (no shuffle);
    the corpus stats (N, avgdl, per-term document frequency) all come
    from ONE 1-row aggregate that broadcasts back. Scoring is then a
    second in-row pass — a 100 TB corpus is scanned twice, shuffled
    never. Every score input (tf, dl, N, df) is an exact integer, so
    the idf·tf-saturation arithmetic is bit-identical across engines.

    Returns all docs with their score (no top-k cutoff: a float-ranked
    LIMIT would make the kept set ulp-sensitive; callers rank on the
    returned column)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")

    def tf_of(term: str) -> Column:
        # NB: the lambda must be unary — pyspark treats a 2-arg lambda
        # as (element, index), so a `t=t` default-arg capture would
        # silently bind the array INDEX to t.
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    tf_cols = [tf_of(t).alias(f"tf_{t}") for t in _BM25_TERMS]
    with_tf = docs.select("doc_id", F.size(toks).alias("dl"), *tf_cols)
    corpus = with_tf.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    scored = with_tf.crossJoin(F.broadcast(corpus))
    nd = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl").cast("double") / nd
    parts = []
    for t in _BM25_TERMS:
        tf = F.col(f"tf_{t}").cast("double")
        df = F.col(f"df_{t}").cast("double")
        idf = F.log((nd - df + 0.5) / (df + 0.5) + 1.0)
        denom = tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl").cast("double") / avgdl)
        parts.append(idf * (tf * (_BM25_K1 + 1.0)) / denom)
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    return scored.select("doc_id", "dl", _r6(score).alias("bm25"))


def _bm25_oracle() -> str:
    tf_exprs = ",\n             ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}')) AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_exprs = ",\n             ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in _BM25_TERMS
    )
    score_terms = "\n             + ".join(
        f"""LN((CAST(n_docs AS DOUBLE) - CAST(df_{t} AS DOUBLE) + 0.5)
                  / (CAST(df_{t} AS DOUBLE) + 0.5) + 1.0)
               * (CAST(tf_{t} AS DOUBLE) * ({_BM25_K1} + 1.0))
               / (CAST(tf_{t} AS DOUBLE)
                  + {_BM25_K1} * (1.0 - {_BM25_B}
                     + {_BM25_B} * CAST(dl AS DOUBLE)
                       / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))"""
        for t in _BM25_TERMS
    )
    return f"""
    WITH tf AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl,
             {tf_exprs}
      FROM documents
    ),
    corpus AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
             {df_exprs}
      FROM tf
    )
    SELECT doc_id, dl,
           FLOOR(({score_terms}) * 1000000.0 + 0.5) / 1000000.0 AS bm25
    FROM tf, corpus
    """


registry.register("bm25_rank", q_bm25_rank, _bm25_oracle())


# ---------------------------------------------------------------------------
# Regex sequence matching (MATCH_RECOGNIZE-style) over user event streams
# ---------------------------------------------------------------------------


def q_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered event-type sequence, regex-matched for a
    direct view→purchase adjacency (the MATCH_RECOGNIZE pattern
    `A B` with no gap — the funnel query's subsequence semantics can't
    see adjacency). One shuffle on user_id builds the sequence string
    via sort_array(collect_list(struct)); matching is in-row regex.

    Scale: per-user state is that user's event count — same bound as
    any sessionization. At 100 TB you'd window the sequence by day
    first (the time_bucket_rollup pattern) to cap string length; ties
    are broken by event_id so the sequence is deterministic at any
    parallelism."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                    lambda s: s["event_type"],
                ),
                ",",
            ).alias("seq"),
            F.count("*").alias("n_events"),
        )
    )
    direct = F.size(F.expr("regexp_extract_all(seq, 'view,purchase', 0)"))
    return seq.select(
        "user_id",
        "n_events",
        (direct > 0).alias("converted_direct"),
        direct.alias("n_direct_conversions"),
    )


registry.register(
    "sequence_match",
    q_sequence_match,
    """
    WITH seq AS (
      SELECT user_id,
             STRING_AGG(event_type, ',' ORDER BY ts, event_id) AS seq,
             COUNT(*) AS n_events
      FROM events GROUP BY 1
    )
    SELECT user_id, n_events,
           LEN(regexp_extract_all(seq, 'view,purchase')) > 0
             AS converted_direct,
           CAST(LEN(regexp_extract_all(seq, 'view,purchase')) AS INT)
             AS n_direct_conversions
    FROM seq
    """,
)


# ---------------------------------------------------------------------------
# Round-5 additions: mode per group, ordered string_agg, Welch t-test,
# Benford digit profile, multi-level percent-of-total
# ---------------------------------------------------------------------------


def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent order priority per customer market segment, ties
    broken by the lexicographically smallest priority — the
    deterministic tie rule is what makes a mode checkable at all.
    One (segment, priority) count then a segments-sized window; the
    heavy shuffle is the count, the window sorts ≤ |priorities| rows
    per segment."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    counts = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), F.col("o_orderpriority").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
        )
    )


registry.register(
    "mode_per_group",
    q_mode_per_group,
    """
    WITH counts AS (
      SELECT c.c_mktsegment, o.o_orderpriority, COUNT(*) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY c_mktsegment
        ORDER BY n DESC, o_orderpriority ASC) AS rn
      FROM counts
    )
    SELECT c_mktsegment, o_orderpriority AS mode_priority, n
    FROM ranked WHERE rn = 1
    """,
)


def q_string_agg_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation comma-joined names of the top-3 customers by account
    balance (desc, custkey asc tie-break) — ordered LISTAGG, the
    report-building op warehouses use constantly.

    Determinism: collect_list order is partition-arbitrary, so the
    names are collected as (rank, name) STRUCTS, array_sort'ed in-row
    by the rank, then projected — never relying on arrival order. The
    nation-keyed window ranks; only 3 rows per nation reach the
    collect, so the agg state is bounded."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_name", "c_acctbal", "c_custkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    top = c.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)
    agg = top.groupBy("c_nationkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rk"), F.col("c_name")))
                ),
                lambda s: s["c_name"],
            ),
            ",",
        ).alias("top3_names")
    )
    return (
        agg.join(F.broadcast(n), agg["c_nationkey"] == n["n_nationkey"])
        .select(F.col("n_name").alias("nation"), "top3_names")
    )


registry.register(
    "string_agg_topn",
    q_string_agg_topn,
    """
    WITH ranked AS (
      SELECT c_nationkey, c_name,
             ROW_NUMBER() OVER (
               PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
      FROM customer
    ),
    agg AS (
      SELECT c_nationkey,
             STRING_AGG(c_name, ',' ORDER BY rk) AS top3_names
      FROM ranked WHERE rk <= 3 GROUP BY c_nationkey
    )
    SELECT n.n_name AS nation, a.top3_names
    FROM agg a JOIN nation n ON a.c_nationkey = n.n_nationkey
    """,
)


def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between purchase and click
    event values: t statistic and Welch–Satterthwaite degrees of
    freedom, from ONE map-combinable pass of exact decimal sufficient
    statistics (conditional sums per group in a single 1-row
    aggregate — the A/B-test evaluator at any scale, no per-group
    collect)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    d = dec_portable("value", 18, 2)
    is_a = F.col("event_type") == "purchase"
    stats = ev.agg(
        F.count(F.when(is_a, 1)).alias("n1"),
        F.sum(F.when(is_a, d)).alias("s1"),
        F.sum(F.when(is_a, (d * d).cast("decimal(38,4)"))).alias("ss1"),
        F.count(F.when(~is_a, 1)).alias("n2"),
        F.sum(F.when(~is_a, d)).alias("s2"),
        F.sum(F.when(~is_a, (d * d).cast("decimal(38,4)"))).alias("ss2"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    ss1 = F.col("ss1").cast("double")
    ss2 = F.col("ss2").cast("double")
    v1 = (ss1 - s1 * s1 / n1) / (n1 - 1.0)
    v2 = (ss2 - s2 * s2 / n2) / (n2 - 1.0)
    se1 = v1 / n1
    se2 = v2 / n2
    t = (s1 / n1 - s2 / n2) / F.sqrt(se1 + se2)
    df = (se1 + se2) * (se1 + se2) / (
        se1 * se1 / (n1 - 1.0) + se2 * se2 / (n2 - 1.0)
    )
    return stats.select(
        F.col("n1"),
        F.col("n2"),
        _r6(t).alias("t_stat"),
        _r6(df).alias("welch_df"),
    )


registry.register(
    "welch_ttest",
    q_welch_ttest,
    """
    WITH stats AS (
      SELECT
        COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n1,
        SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) END) AS s1,
        SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) *
                           CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) AS DECIMAL(38,4))
            END) AS ss1,
        COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n2,
        SUM(CASE WHEN event_type = 'click'
                 THEN CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) END) AS s2,
        SUM(CASE WHEN event_type = 'click'
                 THEN CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) *
                           CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) AS DECIMAL(38,4))
            END) AS ss2
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    dd AS (
      SELECT n1, n2,
             CAST(n1 AS DOUBLE) AS dn1, CAST(n2 AS DOUBLE) AS dn2,
             CAST(s1 AS DOUBLE) AS ds1, CAST(s2 AS DOUBLE) AS ds2,
             CAST(ss1 AS DOUBLE) AS dss1, CAST(ss2 AS DOUBLE) AS dss2
      FROM stats
    ),
    vv AS (
      SELECT n1, n2, dn1, dn2, ds1, ds2,
             ((dss1 - ds1 * ds1 / dn1) / (dn1 - 1.0)) / dn1 AS se1,
             ((dss2 - ds2 * ds2 / dn2) / (dn2 - 1.0)) / dn2 AS se2
      FROM dd
    )
    SELECT n1, n2,
           FLOOR(((ds1 / dn1 - ds2 / dn2) / SQRT(se1 + se2))
                 * 1000000.0 + 0.5) / 1000000.0 AS t_stat,
           FLOOR(((se1 + se2) * (se1 + se2) /
                  (se1 * se1 / (dn1 - 1.0) + se2 * se2 / (dn2 - 1.0)))
                 * 1000000.0 + 0.5) / 1000000.0 AS welch_df
    FROM vv
    """,
)


_BENFORD = {
    1: 0.30103, 2: 0.176091, 3: 0.124939, 4: 0.09691, 5: 0.079181,
    6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit profile of order totals vs the Benford
    expectation — the data-quality fraud screen.

    The digit is NEVER taken from float formatting or log10 (both
    engine-divergent at powers of ten): the 2-decimal price becomes
    exact integer cents, and the leading digit of the cents integer's
    decimal string — an exact int-to-string in both engines — is the
    leading significant digit of any amount ≥ $0.01. Expected Benford
    mass is a fixed literal table (log10(1+1/d) pre-rounded), so both
    engines compare the same constants; one digit-keyed 9-row
    aggregate does the rest."""
    o = load_table(spark, sf_dir, "orders")
    cents = (dec_portable("o_totalprice", 18, 2) * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    counts = (
        o.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("total"))
    expected = F.create_map(
        *[F.lit(x) for kv in _BENFORD.items() for x in kv]
    )[F.col("digit")]
    chi_term = (
        (F.col("n").cast("double") / F.col("total").cast("double") - expected)
        * (F.col("n").cast("double") / F.col("total").cast("double") - expected)
        / expected
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            _r6(F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "observed_p"
            ),
            expected.alias("benford_p"),
            _r6(chi_term).alias("chi_term"),
        )
    )


def _benford_sql() -> str:
    case = " ".join(
        f"WHEN {d} THEN {p!r}" for d, p in _BENFORD.items()
    )
    return f"""
    WITH counts AS (
      SELECT CAST(SUBSTRING(CAST(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))
                                  * 100 AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS digit,
             COUNT(*) AS n
      FROM orders GROUP BY 1
    ),
    total AS (SELECT SUM(n) AS total FROM counts)
    SELECT digit, n,
           FLOOR((CAST(n AS DOUBLE) / CAST(total AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS observed_p,
           CASE digit {case} END AS benford_p,
           FLOOR(((CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
                   - CASE digit {case} END) *
                  (CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
                   - CASE digit {case} END) /
                  (CASE digit {case} END))
                 * 1000000.0 + 0.5) / 1000000.0 AS chi_term
    FROM counts CROSS JOIN total
    """


registry.register("benford_digits", q_benford_digits, _benford_sql())


def q_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation revenue with its share of the region subtotal AND of the
    grand total — the two-level ratio-to-report. Both denominators are
    windows over the 25-row nation aggregate (zero extra scans, zero
    joins beyond the broadcast dims); revenue stays exact decimal into
    each division."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(dec_portable("o_totalprice", 18, 2))
            .cast("decimal(28,2)")
            .alias("rev")
        )
    )
    w_region = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    return rev.select(
        F.col("r_name").alias("region"),
        F.col("n_name").alias("nation"),
        F.col("rev").cast("double").alias("revenue"),
        _r6(
            F.col("rev").cast("double")
            / F.sum("rev").over(w_region).cast("double")
        ).alias("share_of_region"),
        _r6(
            F.col("rev").cast("double")
            / F.sum("rev").over(w_all).cast("double")
        ).alias("share_of_total"),
    )


registry.register(
    "percent_of_total",
    q_percent_of_total,
    """
    WITH rev AS (
      SELECT r.r_name, n.n_name,
             CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2)))
                  AS DECIMAL(28,2)) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT r_name AS region, n_name AS nation,
           CAST(rev AS DOUBLE) AS revenue,
           FLOOR((CAST(rev AS DOUBLE) /
                  CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS share_of_region,
           FLOOR((CAST(rev AS DOUBLE) /
                  CAST(SUM(rev) OVER () AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS share_of_total
    FROM rev
    """,
)


def q_groupwise_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS: slope and intercept of event value over the day
    index, one model PER event_type from a single pass of exact
    decimal/integer sufficient statistics (regression_suite's global
    form made per-key — the segmented-trend detector). One shuffle on
    the group key; the five sums are map-combinable; the only IEEE
    math is the final two divisions."""
    ev = load_table(spark, sf_dir, "events")
    x = F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
    y = dec_portable("value", 18, 2)
    stats = ev.select(
        "event_type", x.alias("x"), y.alias("y")
    ).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("y") * F.col("x")).cast("decimal(38,4)")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return stats.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        _r6(slope).alias("slope"),
        _r6((sy - slope * sx) / n).alias("intercept"),
    )


registry.register(
    "groupwise_regression",
    q_groupwise_regression,
    """
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(date_diff('day', DATE '2024-01-01',
                           CAST(date_trunc('day', ts) AS DATE))) AS sx,
             SUM(date_diff('day', DATE '2024-01-01',
                           CAST(date_trunc('day', ts) AS DATE)) *
                 date_diff('day', DATE '2024-01-01',
                           CAST(date_trunc('day', ts) AS DATE))) AS sxx,
             SUM(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS sy,
             SUM(CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) *
                      date_diff('day', DATE '2024-01-01',
                                CAST(date_trunc('day', ts) AS DATE))
                      AS DECIMAL(38,4))) AS sxy
      FROM events GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                  (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0 AS slope,
           FLOOR(((CAST(sy AS DOUBLE)
                   - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                      (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                     * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS intercept
    FROM s
    """,
)


def q_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the purchase
    and click value distributions — the distribution-shift test
    behind drift monitors (psi_drift's nonparametric sibling).

    Exactness: values become exact cents; per distinct value the two
    groups' counts aggregate once, ONE value-ordered window builds
    both empirical CDFs as integer running counts, and the sup
    statistic maximizes the INTEGER |ca·nb − cb·na| (equivalent to
    |ca/na − cb/nb| without ever dividing), tie-broken by the
    smallest value — a bit-deterministic argmax. The one division
    happens on the single winning row."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    cents = (dec_portable("value", 18, 2) * 100).cast("long")
    per_v = ev.select(
        cents.alias("v"), (F.col("event_type") == "purchase").alias("is_a")
    ).groupBy("v").agg(
        F.count(F.when(F.col("is_a"), 1)).alias("na_v"),
        F.count(F.when(~F.col("is_a"), 1)).alias("nb_v"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy()
    cum = per_v.select(
        "v",
        F.sum("na_v").over(w).alias("ca"),
        F.sum("nb_v").over(w).alias("cb"),
        F.sum("na_v").over(wa).alias("na"),
        F.sum("nb_v").over(wa).alias("nb"),
    )
    scored = cum.select(
        "v",
        "na",
        "nb",
        F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")).alias(
            "d_scaled"
        ),
    )
    wmax = Window.orderBy(F.col("d_scaled").desc(), F.col("v").asc())
    return (
        scored.withColumn("rk", F.row_number().over(wmax))
        .filter(F.col("rk") == 1)
        .select(
            (F.col("v").cast("double") / 100.0).alias("at_value"),
            F.col("na").cast("long").alias("n_purchase"),
            F.col("nb").cast("long").alias("n_click"),
            _r6(
                F.col("d_scaled").cast("double")
                / (F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("ks_stat"),
        )
    )


registry.register(
    "ks_statistic",
    q_ks_statistic,
    """
    WITH per_v AS (
      SELECT CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS na_v,
             COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS nb_v
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY 1
    ),
    cum AS (
      SELECT v,
             SUM(na_v) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             SUM(nb_v) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
             SUM(na_v) OVER () AS na,
             SUM(nb_v) OVER () AS nb
      FROM per_v
    ),
    scored AS (
      SELECT v, na, nb, ABS(ca * nb - cb * na) AS d_scaled FROM cum
    )
    SELECT CAST(v AS DOUBLE) / 100.0 AS at_value,
           CAST(na AS BIGINT) AS n_purchase,
           CAST(nb AS BIGINT) AS n_click,
           FLOOR((CAST(d_scaled AS DOUBLE) /
                  (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0 AS ks_stat
    FROM scored
    ORDER BY d_scaled DESC, v ASC
    LIMIT 1
    """,
)


# ---------------------------------------------------------------------------
# Hill tail-index estimator
# ---------------------------------------------------------------------------


def q_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the order-value tail exponent over the top
    k=200 order statistics: α̂ = 1 / (mean of ln(x_(i)/x_(k))) — the
    heavy-tail diagnostic behind capacity planning and the
    zipf_slope/pareto_frontier family (α ≈ 1/|zipf slope| for a true
    power law).

    The top-(k+1) values arrive via TakeOrdered (per-partition
    top-k + driver merge, never a global sort); each ln ratio has an
    exact integer-cent argument and QUANTIZES to BIGINT before the
    k-term sum — order-invariant."""
    k = 200
    orders = load_table(spark, sf_dir, "orders")
    cents = (dec_portable("o_totalprice", 18, 2) * 100).cast("long")
    top = orders.select(cents.alias("v")).orderBy(F.col("v").desc()).limit(
        k + 1
    )
    w = Window.orderBy(F.col("v").desc())
    ranked = top.select("v", F.row_number().over(w).alias("rn"))
    vk = ranked.filter(F.col("rn") == k + 1).select(
        F.col("v").alias("vk")
    )
    lq = ranked.filter(F.col("rn") <= k).crossJoin(F.broadcast(vk)).select(
        F.floor(
            F.log(F.col("v").cast("double") / F.col("vk").cast("double"))
            * 1e9
        )
        .cast("long")
        .alias("l9"),
        "vk",
    )
    return lq.agg(
        F.lit(k).cast("long").alias("k"),
        (F.max("vk").cast("double") / 100.0).alias("threshold"),
        _r6(
            F.lit(float(k))
            * F.lit(1e9)
            / F.sum("l9").cast("double")
        ).alias("hill_alpha"),
    )


registry.register(
    "hill_tail_index",
    q_hill_tail_index,
    """
    WITH top AS (
      SELECT CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM orders ORDER BY v DESC LIMIT 201
    ),
    ranked AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY v DESC) AS rn FROM top
    ),
    vk AS (SELECT v AS vk FROM ranked WHERE rn = 201),
    lq AS (
      SELECT CAST(FLOOR(LN(CAST(r.v AS DOUBLE) / CAST(k.vk AS DOUBLE))
                        * 1e9) AS BIGINT) AS l9,
             k.vk
      FROM ranked r CROSS JOIN vk k WHERE r.rn <= 200
    )
    SELECT CAST(200 AS BIGINT) AS k,
           CAST(MAX(vk) AS DOUBLE) / 100.0 AS threshold,
           FLOOR((200.0 * 1e9 / CAST(SUM(l9) AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS hill_alpha
    FROM lq
    """,
)


# ---------------------------------------------------------------------------
# Burstiness (index of dispersion / Fano factor)
# ---------------------------------------------------------------------------


def q_burstiness_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance/mean) of the daily event count per type —
    the burstiness diagnostic (Poisson arrivals ⇒ ≈1; >1 means
    clumping that capacity plans and rate limiters must absorb).

    Variance from exact integer sufficient statistics per type
    (n days, Σc, Σc²): F = (n·Σc² − (Σc)²) / (n·Σc) computed as one
    shared integer-ratio expression — no float accumulations at all.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("c"))
    suff = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    return suff.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("s1").cast("long").alias("n_events"),
        _r6(
            (
                F.col("n").cast("double") * F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double")
            )
            / (F.col("n").cast("double") * F.col("s1").cast("double"))
        ).alias("fano_factor"),
    )


registry.register(
    "burstiness_index",
    q_burstiness_index,
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    suff AS (
      SELECT event_type, COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2
      FROM daily GROUP BY 1
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           CAST(s1 AS BIGINT) AS n_events,
           FLOOR(((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0 AS fano_factor
    FROM suff
    """,
)


# ---------------------------------------------------------------------------
# Lagged cross-correlation between two daily series
# ---------------------------------------------------------------------------


def q_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson cross-correlation of the click and purchase daily
    REVENUE series at lags −3..+3 days (does click volume lead
    purchases?) — autocorr's two-series sibling, the lead-lag
    screen before any causal claim.

    Per lag, the paired days join on d = d' + lag (a keyed equi-join
    of two days-sized tables after the in-row lag explode), and r
    comes from exact integer-cent sufficient sums through one shared
    expression — the corr_matrix convention, per lag."""
    ev = load_table(spark, sf_dir, "events")
    cents = (dec_portable("value", 18, 2) * 100).cast("long")
    daily = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.to_date("ts").alias("d"), "event_type")
        .agg(F.sum(cents).alias("v"))
    )
    clicks = daily.filter(F.col("event_type") == "click").select(
        F.col("d").alias("dc"), F.col("v").alias("x")
    )
    buys = daily.filter(F.col("event_type") == "purchase").select(
        F.col("d").alias("db"), F.col("v").alias("y")
    )
    lagged = clicks.select(
        "dc", "x", F.explode(F.sequence(F.lit(-3), F.lit(3))).alias("lag")
    )
    pairs = lagged.join(
        buys, F.expr("date_add(dc, lag) = db")
    )
    suff = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxy, sxx, syy = (
        F.col(c).cast("double") for c in ("sxy", "sxx", "syy")
    )
    r = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return suff.select(
        F.col("lag").cast("long").alias("lag_days"),
        F.col("n").cast("long").alias("n_pairs"),
        _r6(r).alias("r"),
    )


registry.register(
    "cross_correlation",
    q_cross_correlation,
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, event_type,
             CAST(SUM(CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS v
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1, 2
    ),
    clicks AS (SELECT d AS dc, v AS x FROM daily
               WHERE event_type = 'click'),
    buys AS (SELECT d AS db, v AS y FROM daily
             WHERE event_type = 'purchase'),
    pairs AS (
      SELECT g.lag, c.x, b.y
      FROM clicks c,
           LATERAL unnest(generate_series(-3, 3)) AS g(lag)
      JOIN buys b ON c.dc + CAST(g.lag AS INTEGER) * INTERVAL 1 DAY = b.db
    ),
    suff AS (
      SELECT lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM pairs GROUP BY 1
    )
    SELECT CAST(lag AS BIGINT) AS lag_days,
           CAST(n AS BIGINT) AS n_pairs,
           FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
                 * 1000000.0 + 0.5) / 1000000.0 AS r
    FROM suff
    """,
)


# ---------------------------------------------------------------------------
# Mean per-user behavioral entropy
# ---------------------------------------------------------------------------


def q_session_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Shannon entropy of each user's event-type mix — the
    behavioral-diversity score (bots and single-purpose accounts sit
    near 0; engaged users near ln 5). entropy_profile is the
    corpus-level sibling; this distributes one entropy per user.

    Per user, H = ln n − (Σ c·ln c)/n from that user's exact integer
    counts (≤5 terms, shared expression tree), then QUANTIZES to
    BIGINT before the population mean — the order-invariant
    integer-sum rule. Two combinable aggregates: (user, type) counts,
    then per-user rollup."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    per_user = ut.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.sum(
            F.col("c").cast("double") * F.log(F.col("c").cast("double"))
        ).alias("sclnc"),
    )
    h9 = F.floor(
        (
            F.log(F.col("n").cast("double"))
            - F.col("sclnc") / F.col("n").cast("double")
        )
        * 1e9
    ).cast("long")
    scored = per_user.select(h9.alias("h9"))
    return scored.agg(
        F.count("*").cast("long").alias("n_users"),
        _r6(
            F.sum("h9").cast("double")
            / (F.count("*").cast("double") * F.lit(1e9))
        ).alias("mean_entropy_nats"),
        _r6(
            F.count(F.when(F.col("h9") <= 0, 1)).cast("double")
            / F.count("*").cast("double")
        ).alias("single_type_share"),
    )


registry.register(
    "session_entropy",
    q_session_entropy,
    """
    WITH ut AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    per_user AS (
      SELECT user_id, SUM(c) AS n,
             SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))) AS sclnc
      FROM ut GROUP BY 1
    ),
    scored AS (
      SELECT CAST(FLOOR((LN(CAST(n AS DOUBLE))
                         - sclnc / CAST(n AS DOUBLE)) * 1e9) AS BIGINT)
               AS h9
      FROM per_user
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           FLOOR((CAST(SUM(h9) AS DOUBLE)
                  / (CAST(COUNT(*) AS DOUBLE) * 1e9))
                 * 1000000.0 + 0.5) / 1000000.0 AS mean_entropy_nats,
           FLOOR((CAST(COUNT(CASE WHEN h9 <= 0 THEN 1 END) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS single_type_share
    FROM scored
    """,
)


# ---------------------------------------------------------------------------
# One-way ANOVA F statistic
# ---------------------------------------------------------------------------


def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of daily revenue across the 7 weekday groups:
    F = (SSB/(k−1)) / (SSW/(n−k)) — welch_ttest's k-group
    generalization, the "is there ANY weekday effect" screen before
    per-day drilldowns (seasonality_dow reports the effects
    themselves).

    Weekday = epoch-day mod 7 (integer calendar rule); every sum of
    squares derives from per-group exact integer-cent sufficient
    statistics (n_g, Σ, Σ²) through one shared expression — the
    k-term combination sums are group-count-sized."""
    ev = load_table(spark, sf_dir, "events")
    epoch_day = F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
    cents = (dec_portable("value", 18, 2) * 100).cast("long")
    daily = ev.groupBy(epoch_day.alias("d")).agg(
        F.sum(cents).alias("v")
    )
    groups = daily.groupBy((F.col("d") % 7).alias("dow")).agg(
        F.count("*").alias("ng"),
        F.sum("v").alias("sg"),
        F.sum(F.col("v") * F.col("v")).alias("qg"),
    )
    wn = Window.partitionBy()
    tot = groups.select(
        "dow",
        "ng",
        "sg",
        "qg",
        F.sum("ng").over(wn).alias("n"),
        F.sum("sg").over(wn).alias("s"),
        F.sum("qg").over(wn).alias("q"),
        F.count("*").over(wn).alias("k"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    qd = F.col("q").cast("double")
    ssb_term = (
        F.col("sg").cast("double")
        * F.col("sg").cast("double")
        / F.col("ng").cast("double")
    )
    agg = tot.groupBy("n", "s", "q", "k").agg(
        F.sum(ssb_term).alias("sum_sg2ng")
    )
    ssb = F.col("sum_sg2ng") - sd * sd / nd
    ssw = qd - F.col("sum_sg2ng")
    f_stat = (ssb / (F.col("k").cast("double") - 1)) / (
        ssw / (nd - F.col("k").cast("double"))
    )
    return agg.select(
        F.col("k").cast("long").alias("n_groups"),
        F.col("n").cast("long").alias("n_days"),
        _r6(f_stat).alias("f_stat"),
    )


registry.register(
    "anova_f",
    q_anova_f,
    """
    WITH daily AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             SUM(CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
      FROM events GROUP BY 1
    ),
    groups AS (
      SELECT d % 7 AS dow, COUNT(*) AS ng, SUM(v) AS sg,
             SUM(v * v) AS qg
      FROM daily GROUP BY 1
    ),
    tot AS (
      SELECT dow, ng, sg, qg,
             SUM(ng) OVER () AS n, SUM(sg) OVER () AS s,
             SUM(qg) OVER () AS q, COUNT(*) OVER () AS k
      FROM groups
    ),
    agg AS (
      SELECT n, s, q, k,
             SUM(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                 / CAST(ng AS DOUBLE)) AS sum_sg2ng
      FROM tot GROUP BY 1, 2, 3, 4
    )
    SELECT CAST(k AS BIGINT) AS n_groups,
           CAST(n AS BIGINT) AS n_days,
           FLOOR((((sum_sg2ng - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                / CAST(n AS DOUBLE))
                   / (CAST(k AS DOUBLE) - 1))
                  / ((CAST(q AS DOUBLE) - sum_sg2ng)
                     / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))))
                 * 1000000.0 + 0.5) / 1000000.0 AS f_stat
    FROM agg
    """,
)


# ---------------------------------------------------------------------------
# Two-way ANOVA with interaction
# ---------------------------------------------------------------------------


def q_anova_two_way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way factorial decomposition of event values over weekday ×
    event type: sums of squares for factor A (weekday), factor B
    (type), the A×B interaction, and the within-cell residual —
    anova_f's factorial big sibling, the screen for "does the weekday
    effect DEPEND on the event type". (Type-I-style decomposition on
    the observed cell counts, documented — the standard caveat for
    unbalanced designs applies.)

    Every SS derives from per-cell exact integer sufficient stats
    (n, Σ, Σ²) through marginal windows and one shared expression;
    the only sums of doubles are over ≤35 cells (`_r6`)."""
    ev = load_table(spark, sf_dir, "events")
    epoch_day = F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
    cents = (dec_portable("value", 18, 2) * 100).cast("long")
    cells = ev.groupBy(
        (epoch_day % 7).alias("a"), F.col("event_type").alias("b")
    ).agg(
        F.count("*").alias("ng"),
        F.sum(cents).alias("sg"),
        # DECIMAL(38) accumulator: Σcents² stays exact past the
        # ~1e10-row point where a BIGINT sum of squares would overflow
        F.sum(
            cents.cast("decimal(18,0)") * cents.cast("decimal(18,0)")
        ).alias("qg"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cell_term = d("sg") * d("sg") / d("ng")
    agg = cells.agg(
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
        F.sum(cell_term).alias("ss_cells_raw"),
    )
    marg_a = cells.groupBy("a").agg(
        F.sum("ng").alias("na"), F.sum("sg").alias("sa")
    )
    ssa = marg_a.agg(
        F.sum(d("sa") * d("sa") / d("na")).alias("ssa_raw"),
        F.count("*").alias("ka"),
    )
    marg_b = cells.groupBy("b").agg(
        F.sum("ng").alias("nb"), F.sum("sg").alias("sb")
    )
    ssb = marg_b.agg(
        F.sum(d("sb") * d("sb") / d("nb")).alias("ssb_raw"),
        F.count("*").alias("kb"),
    )
    j = agg.crossJoin(F.broadcast(ssa)).crossJoin(F.broadcast(ssb))
    grand = d("s") * d("s") / d("n")
    cf = F.lit(1.0) / F.lit(10000.0)  # cents² -> dollars²
    ss_a = (F.col("ssa_raw") - grand) * cf
    ss_b = (F.col("ssb_raw") - grand) * cf
    ss_cells = (F.col("ss_cells_raw") - grand) * cf
    ss_within = (d("q") - F.col("ss_cells_raw")) * cf
    return j.select(
        F.col("ka").cast("long").alias("n_weekdays"),
        F.col("kb").cast("long").alias("n_types"),
        F.col("n").cast("long").alias("n_events"),
        _r6(ss_a).alias("ss_weekday"),
        _r6(ss_b).alias("ss_type"),
        _r6(ss_cells - ss_a - ss_b).alias("ss_interaction"),
        _r6(ss_within).alias("ss_within"),
    )


registry.register(
    "anova_two_way",
    q_anova_two_way,
    """
    WITH cells AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS a,
             event_type AS b,
             COUNT(*) AS ng,
             SUM(CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sg,
             SUM(CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT)
                 * CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS qg
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT SUM(ng) AS n, SUM(sg) AS s, SUM(qg) AS q,
             SUM(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                 / CAST(ng AS DOUBLE)) AS ss_cells_raw
      FROM cells
    ),
    ma AS (
      SELECT SUM(CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                 / CAST(na AS DOUBLE)) AS ssa_raw,
             COUNT(*) AS ka
      FROM (SELECT a, SUM(ng) AS na, SUM(sg) AS sa FROM cells GROUP BY 1)
    ),
    mb AS (
      SELECT SUM(CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                 / CAST(nb AS DOUBLE)) AS ssb_raw,
             COUNT(*) AS kb
      FROM (SELECT b, SUM(ng) AS nb, SUM(sg) AS sb FROM cells GROUP BY 1)
    )
    SELECT CAST(ka AS BIGINT) AS n_weekdays,
           CAST(kb AS BIGINT) AS n_types,
           CAST(n AS BIGINT) AS n_events,
           FLOOR(((ssa_raw - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                             / CAST(n AS DOUBLE)) / 10000.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS ss_weekday,
           FLOOR(((ssb_raw - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                             / CAST(n AS DOUBLE)) / 10000.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS ss_type,
           FLOOR((((ss_cells_raw - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                   / CAST(n AS DOUBLE))
                   - (ssa_raw - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                / CAST(n AS DOUBLE))
                   - (ssb_raw - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                / CAST(n AS DOUBLE))) / 10000.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS ss_interaction,
           FLOOR(((CAST(q AS DOUBLE) - ss_cells_raw) / 10000.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS ss_within
    FROM tot CROSS JOIN ma CROSS JOIN mb
    """,
)


# ---------------------------------------------------------------------------
# Two-sample Cramér-von Mises statistic
# ---------------------------------------------------------------------------


def q_cvm_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises statistic between purchase and
    click values — KS integrates the WORST CDF gap; CvM integrates
    ALL of them (T = n₁n₂/(n₁+n₂)² · Σ over pooled points of
    (F₁−F₂)²), catching spread-out distributional drift a single sup
    misses.

    Full integer exactness one step beyond ks_statistic: each gap
    (c₁/n₁ − c₂/n₂) has common denominator n₁n₂, so the summand is
    the INTEGER (c₁n₂ − c₂n₁)², weighted by the point's multiplicity.
    The sum runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — exact
    beyond the 2⁶³ ceiling the squared products break at sf0.1 —
    and ONE shared float expression scales it at the end."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    cents = (dec_portable("value", 18, 2) * 100).cast("long")
    per_v = (
        ev.select(
            cents.alias("v"),
            (F.col("event_type") == "purchase").alias("is_a"),
        )
        .groupBy("v")
        .agg(
            F.count(F.when(F.col("is_a"), 1)).alias("na_v"),
            F.count(F.when(~F.col("is_a"), 1)).alias("nb_v"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy()
    cum = per_v.select(
        (F.col("na_v") + F.col("nb_v")).alias("m"),
        F.sum("na_v").over(w).alias("ca"),
        F.sum("nb_v").over(w).alias("cb"),
        F.sum("na_v").over(wn).alias("na"),
        F.sum("nb_v").over(wn).alias("nb"),
    )
    gap = F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")
    summand = (F.col("m") * gap * gap).cast("decimal(38,0)")
    agg = cum.groupBy("na", "nb").agg(F.sum(summand).alias("s"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n = d("na") + d("nb")
    # T = Σ m·(ca·nb − cb·na)² / (na·nb·(na+nb)²)
    t = F.col("s").cast("double") / (d("na") * d("nb") * n * n)
    return agg.select(
        F.col("na").cast("long").alias("n_purchase"),
        F.col("nb").cast("long").alias("n_click"),
        _r6(t).alias("cvm_t"),
    )


registry.register(
    "cvm_statistic",
    q_cvm_statistic,
    """
    WITH per_v AS (
      SELECT CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS na_v,
             COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS nb_v
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY 1
    ),
    cum AS (
      SELECT na_v + nb_v AS m,
             SUM(na_v) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             SUM(nb_v) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
             SUM(na_v) OVER () AS na, SUM(nb_v) OVER () AS nb
      FROM per_v
    ),
    agg AS (
      SELECT na, nb,
             SUM(m * (ca * nb - cb * na) * (ca * nb - cb * na)) AS s
      FROM cum GROUP BY 1, 2
    )
    SELECT CAST(na AS BIGINT) AS n_purchase,
           CAST(nb AS BIGINT) AS n_click,
           FLOOR((CAST(s AS DOUBLE)
                  / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                     * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                     * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))))
                 * 1000000.0 + 0.5) / 1000000.0 AS cvm_t
    FROM agg
    """,
)


# ---------------------------------------------------------------------------
# Empirical copula grid (rank-rank dependence)
# ---------------------------------------------------------------------------


def q_copula_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical copula of (quantity, unit price) as a decile×decile
    rank grid — spearman_rank_corr compresses dependence to one
    number; the copula grid shows WHERE it lives (corner mass = tail
    dependence, the thing correlation misses).

    Ranks are integer row_numbers on (value, tie-break) total orders;
    decile cells by the integer (rank·10−1) div n rule; output is the
    100-cell count grid plus the uniform-expected count for
    reference. One fact pass, two rank sorts."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = dec_portable("l_quantity", 18, 2)
    price = dec_portable("l_extendedprice", 18, 2)
    base = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("ln"),
        qty.alias("q"),
        (price / qty).cast("double").alias("u"),
    )
    # r11 (optimization): the two global row_numbers and the
    # count-over-() each funneled the whole fact through ONE partition
    # (three single-task passes over lineitem). The ranks now come
    # from two chained rank_select.with_global_rank passes (two-level
    # prefix-sum, parallel; row-for-row identical because (key, k, ln)
    # is a total order — q ranks via its exact cents image, u via the
    # operator's double-key bucketing) and the count from a 1-row
    # broadcast aggregate. plans/r11/copula_grid_{before,after}.txt.
    from airflow_baseball_spark.operators.rank_select import with_global_rank

    # each repartition puts one exchange above the rank input so the
    # operator's three consumers ReusedExchange it instead of
    # re-evaluating (for r1 that would re-run the whole FIRST rank
    # pass three times)
    r1 = with_global_rank(
        base.withColumn("qc", (F.col("q") * 100).cast("long")).repartition(
            "qc"
        ),
        "qc",
        tiebreak_cols=["k", "ln"],
        rank_col="rq",
    )
    r2 = with_global_rank(
        r1.repartition("u"), "u", tiebreak_cols=["k", "ln"], rank_col="ru"
    )
    ntab = base.agg(F.count("*").alias("n"))
    cells = r2.crossJoin(F.broadcast(ntab)).select(
        F.expr("(rq * 10 - 1) div n").alias("q_dec"),
        F.expr("(ru * 10 - 1) div n").alias("u_dec"),
        "n",
    )
    return cells.groupBy("q_dec", "u_dec").agg(
        F.count("*").cast("long").alias("n_cell"),
        _r6(F.max("n").cast("double") / 100.0).alias("expected_uniform"),
    ).select(
        F.col("q_dec").cast("long").alias("q_decile"),
        F.col("u_dec").cast("long").alias("price_decile"),
        "n_cell",
        "expected_uniform",
    )


registry.register(
    "copula_grid",
    q_copula_grid,
    """
    WITH base AS (
      SELECT l_orderkey AS k, l_linenumber AS ln,
             CAST(FLOOR(l_quantity * 100 + 0.5) / 100 AS DECIMAL(18,2)) AS q,
             CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2))
                  / CAST(FLOOR(l_quantity * 100 + 0.5) / 100 AS DECIMAL(18,2)) AS DOUBLE) AS u
      FROM lineitem
    ),
    ranked AS (
      SELECT ROW_NUMBER() OVER (ORDER BY q, k, ln) AS rq,
             ROW_NUMBER() OVER (ORDER BY u, k, ln) AS ru,
             COUNT(*) OVER () AS n
      FROM base
    )
    SELECT CAST((rq * 10 - 1) // n AS BIGINT) AS q_decile,
           CAST((ru * 10 - 1) // n AS BIGINT) AS price_decile,
           CAST(COUNT(*) AS BIGINT) AS n_cell,
           FLOOR((CAST(MAX(n) AS DOUBLE) / 100.0) * 1000000.0 + 0.5)
             / 1000000.0 AS expected_uniform
    FROM ranked GROUP BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# Theil-Sen robust trend + Kendall tau over the daily revenue series
# ---------------------------------------------------------------------------


def _daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(d, v, c): epoch day, exact revenue cents, order count — the
    shared base for the pairwise trend/concordance statistics. Days-
    sized (≤ a few thousand rows at ANY fact scale — the time
    dimension doesn't grow with data volume, so the day×day pair
    tables below are scale-INVARIANT even at 100 TB).

    r11: materialized once per (session, sf_dir) — every trend query
    references this aggregate 2-3× in one plan (both pair-join sides
    plus the day count), and each reference re-ran the orders scan +
    groupBy; the checkpointed table is days-sized."""
    from airflow_baseball_spark.operators.graph import materialize_edge_list

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        o = load_table(spark, sf_dir, "orders")
        d = F.datediff(
            F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
        )
        return o.groupBy(d.alias("d")).agg(
            (F.sum(dec_portable("o_totalprice", 18, 2)) * F.lit(100))
            .cast("bigint")
            .alias("v"),
            F.count("*").alias("c"),
        )

    return materialize_edge_list(spark, sf_dir, "daily_series", build)


def _floor_div(a, b):
    """Exact floor(a/b) for BIGINT a and POSITIVE BIGINT b as pure
    integer arithmetic: both engines' % keeps the dividend's sign, so
    ((a % b) + b) % b is the canonical non-negative remainder and the
    quotient is exact (Spark `div` truncates toward zero while DuckDB
    `//` floors, so neither builtin is portable on negatives — but
    after subtracting the canonical remainder the division has no
    fraction, making truncation and floor identical). r9 (r8 ADVICE):
    the final step is Spark's integer ``div``, not ``/`` — the double
    ratio was exact only for |a-r| < 2^53 and silently degraded past
    it (large-SF daily-cent magnitudes); div keeps the whole path in
    BIGINT to 2^63."""
    r = ((a % b) + b) % b
    return F.call_function("div", a - r, b)


def q_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue: the MEDIAN of all
    pairwise slopes (v_j - v_i)/(d_j - d_i), next to the OLS slope it
    robustifies (up to ~29% outlier days cannot move it). Slopes are
    quantized to exact integer micro-cents/day by the portable
    floor-division above; the median is the ⌈n/2⌉-th smallest value
    (percentile_disc semantics — row_number over the value order,
    deterministic). The day×day pair table is scale-invariant (see
    _daily_series)."""
    daily = _daily_series(spark, sf_dir)
    a = daily.select(
        F.col("d").alias("da"), F.col("v").alias("va")
    )
    b = daily.select(
        F.col("d").alias("db"), F.col("v").alias("vb")
    )
    pairs = a.join(b, F.col("da") < F.col("db")).select(
        _floor_div(
            (F.col("vb") - F.col("va")) * F.lit(1000000),
            F.col("db") - F.col("da"),
        )
        .cast("long")
        .alias("slope_micro")
    )
    # r9: the pair count is exactly C(n_days, 2), so the median rank
    # comes from the broadcast day count as pure integer arithmetic —
    # the count-over-() second WindowExec buffer pass over the days²
    # frame disappears; only the row_number sort remains (allowlisted:
    # the pair table is calendar-bounded — days² is CONSTANT in fact
    # volume, so the single-partition window is scale-invariant, not a
    # 100 TB funnel). r11 (optimization) measured the
    # rank_select.with_global_rank alternative and REJECTED it here:
    # pairwise slopes are heavy-tailed, so range bucketing collapses
    # ~all rows into one bucket and the two-level rank degenerates to
    # the same single-task sort plus its own machinery (7.8-9.0 s vs
    # 3.7 s isolated at sf0.1; profile: rank pass alone 8.0 s vs 2.9 s
    # for this window).
    w = Window.orderBy("slope_micro")
    npairs_tbl = daily.agg(
        F.call_function(
            "div", F.count("*") * (F.count("*") - 1), F.lit(2)
        ).alias("n_pairs")
    )
    med = (
        pairs.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(npairs_tbl))
        .filter(
            F.col("rn")
            == F.call_function("div", F.col("n_pairs") + 1, F.lit(2))
        )
        .select(
            F.col("slope_micro").alias("median_slope_micro"),
            "n_pairs",
        )
    )
    stats = daily.agg(
        F.count("*").alias("n_days"),
        F.sum("d").alias("sd"),
        F.sum("v").alias("sv"),
        F.sum(F.col("d") * F.col("v")).alias("sdv"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
    )
    ols = (
        F.col("n_days").cast("double") * F.col("sdv").cast("double")
        - F.col("sd").cast("double") * F.col("sv").cast("double")
    ) / (
        F.col("n_days").cast("double") * F.col("sdd").cast("double")
        - F.col("sd").cast("double") * F.col("sd").cast("double")
    )
    return (
        stats.crossJoin(F.broadcast(med))
        .select(
            "n_days",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            "median_slope_micro",
            _r6(
                F.col("median_slope_micro").cast("double") / 1000000.0
            ).alias("ts_slope_cents"),
            _r6(ols).alias("ols_slope_cents"),
        )
    )


def _theil_sen_sql() -> str:
    fd = (
        "(((vb - va) * 1000000)"
        " - ((((vb - va) * 1000000) % (db - da)) + (db - da)) % (db - da))"
        " // (db - da)"
    )
    return f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS d,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS v,
             COUNT(*) AS c
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT CAST({fd} AS BIGINT) AS slope_micro
      FROM daily a(da, va, ca) JOIN daily b(db, vb, cb) ON a.da < b.db
    ),
    med AS (
      SELECT slope_micro AS median_slope_micro FROM (
        SELECT slope_micro,
               ROW_NUMBER() OVER (ORDER BY slope_micro) AS rn,
               COUNT(*) OVER () AS n
        FROM pairs
      ) WHERE rn = (n + 1) // 2
    ),
    stats AS (
      SELECT COUNT(*) AS n_days, SUM(d) AS sd, SUM(v) AS sv,
             SUM(d * v) AS sdv, SUM(d * d) AS sdd
      FROM daily
    ),
    np AS (SELECT COUNT(*) AS n_pairs FROM pairs)
    SELECT s.n_days, CAST(np.n_pairs AS BIGINT) AS n_pairs,
           m.median_slope_micro,
           FLOOR(CAST(m.median_slope_micro AS DOUBLE) / 1000000.0
                 * 1000000.0 + 0.5) / 1000000.0 AS ts_slope_cents,
           FLOOR((CAST(s.n_days AS DOUBLE) * CAST(s.sdv AS DOUBLE)
                  - CAST(s.sd AS DOUBLE) * CAST(s.sv AS DOUBLE))
                 / (CAST(s.n_days AS DOUBLE) * CAST(s.sdd AS DOUBLE)
                    - CAST(s.sd AS DOUBLE) * CAST(s.sd AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS ols_slope_cents
    FROM stats s CROSS JOIN med m CROSS JOIN np
    """


registry.register("theil_sen_slope", q_theil_sen_slope, _theil_sen_sql())


def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b concordance between daily revenue and daily order
    count — the pure-integer rank correlation (spearman_rank_corr's
    complement: tau counts concordant/discordant PAIRS, so every
    sufficient statistic is an exact integer and ties are handled by
    the tau-b denominator, not by fractional average ranks). The
    day×day pair table is scale-invariant (see _daily_series)."""
    daily = _daily_series(spark, sf_dir)
    a = daily.select(
        F.col("d").alias("da"), F.col("v").alias("va"), F.col("c").alias("ca")
    )
    b = daily.select(
        F.col("d").alias("db"), F.col("v").alias("vb"), F.col("c").alias("cb")
    )
    sv = F.signum((F.col("vb") - F.col("va")).cast("double")).cast("int")
    sc = F.signum((F.col("cb") - F.col("ca")).cast("double")).cast("int")
    pairs = a.join(b, F.col("da") < F.col("db")).select(
        sv.alias("sv"), sc.alias("sc")
    )
    agg = pairs.agg(
        F.count("*").alias("n0"),
        F.sum(F.when((F.col("sv") * F.col("sc")) == 1, 1).otherwise(0)).alias(
            "n_concordant"
        ),
        F.sum(
            F.when((F.col("sv") * F.col("sc")) == -1, 1).otherwise(0)
        ).alias("n_discordant"),
        F.sum(F.when(F.col("sv") == 0, 1).otherwise(0)).alias("n_tied_v"),
        F.sum(F.when(F.col("sc") == 0, 1).otherwise(0)).alias("n_tied_c"),
    )
    n_days = daily.agg(F.count("*").alias("n_days"))
    tau = (
        (F.col("n_concordant") - F.col("n_discordant")).cast("double")
        / F.sqrt(
            (F.col("n0") - F.col("n_tied_v")).cast("double")
            * (F.col("n0") - F.col("n_tied_c")).cast("double")
        )
    )
    return agg.crossJoin(F.broadcast(n_days)).select(
        "n_days",
        F.col("n0").alias("n_pairs"),
        "n_concordant",
        "n_discordant",
        "n_tied_v",
        "n_tied_c",
        _r6(tau).alias("tau_b"),
    )


registry.register(
    "kendall_tau",
    q_kendall_tau,
    """
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS d,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS v,
             COUNT(*) AS c
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT CAST(SIGN(b.vb - a.va) AS INTEGER) AS sv,
             CAST(SIGN(b.cb - a.ca) AS INTEGER) AS sc
      FROM daily a(da, va, ca) JOIN daily b(db, vb, cb) ON a.da < b.db
    ),
    agg AS (
      SELECT COUNT(*) AS n0,
             SUM(CASE WHEN sv * sc = 1 THEN 1 ELSE 0 END) AS n_concordant,
             SUM(CASE WHEN sv * sc = -1 THEN 1 ELSE 0 END) AS n_discordant,
             SUM(CASE WHEN sv = 0 THEN 1 ELSE 0 END) AS n_tied_v,
             SUM(CASE WHEN sc = 0 THEN 1 ELSE 0 END) AS n_tied_c
      FROM pairs
    ),
    nd AS (SELECT COUNT(*) AS n_days FROM daily)
    SELECT nd.n_days, agg.n0 AS n_pairs,
           agg.n_concordant, agg.n_discordant, agg.n_tied_v, agg.n_tied_c,
           FLOOR(CAST(agg.n_concordant - agg.n_discordant AS DOUBLE)
                 / SQRT(CAST(agg.n0 - agg.n_tied_v AS DOUBLE)
                        * CAST(agg.n0 - agg.n_tied_c AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS tau_b
    FROM agg CROSS JOIN nd
    """,
)


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of three retrieval rankings
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_TOPN = 100


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.) of three top-100
    retrieval lists over `documents`: lexical BM25 (the `bm25_rank`
    scorer), raw term-frequency, and recency (doc_id as ingest
    order). RRF score = Σ 1e6 div (60 + rank) over the lists a doc
    appears in — the standard hybrid-search merge step (BM25 ⊕ vector
    ⊕ prior) of a retrieval pipeline.

    Shapes for 100 TB: each list is orderBy().limit(100) — Spark's
    TakeOrdered (per-partition top-k + driver merge of 100-row
    heads), never a global sort; the fusion then joins three 100-row
    frames. Exactness: ranks order by the _r6-rounded bm25 (driver-
    attested bit-stable) with doc_id tiebreak, integer tf, integer
    doc_id; RRF contributions are integer-divided micro-units, so the
    fused ordering is exact integer arithmetic."""
    bm25 = q_bm25_rank(spark, sf_dir)

    def topn(df: DataFrame, order, name: str) -> DataFrame:
        top = df.orderBy(*order).limit(_RRF_TOPN)
        w = Window.partitionBy(F.lit(1)).orderBy(*order)
        return top.select(
            "doc_id", F.row_number().over(w).alias(f"rank_{name}")
        )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    def tf_of(term: str):
        # unary lambda on purpose: a 2-arg lambda would be treated by
        # pyspark as (element, index) — see q_bm25_rank's note
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    tf_total = sum(tf_of(t) for t in _BM25_TERMS)
    tf = docs.select("doc_id", tf_total.alias("tf_total"))

    r_bm = topn(bm25, [F.col("bm25").desc(), F.col("doc_id").asc()], "bm25")
    r_tf = topn(
        tf, [F.col("tf_total").desc(), F.col("doc_id").asc()], "tf"
    )
    r_rec = topn(docs.select("doc_id"), [F.col("doc_id").desc()], "rec")

    fused = (
        r_bm.join(r_tf, "doc_id", "full_outer")
        .join(r_rec, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("rank_bm25", F.lit(0)).alias("rank_bm25"),
            F.coalesce("rank_tf", F.lit(0)).alias("rank_tf"),
            F.coalesce("rank_rec", F.lit(0)).alias("rank_rec"),
        )
    )
    contrib = sum(
        F.when(
            F.col(c) > 0,
            F.expr(f"1000000 DIV ({_RRF_K} + {c})"),
        ).otherwise(F.lit(0))
        for c in ("rank_bm25", "rank_tf", "rank_rec")
    )
    return (
        fused.withColumn("rrf_micro", contrib.cast("long"))
        .orderBy(F.col("rrf_micro").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def _rrf_oracle() -> str:
    return f"""
    WITH bm AS (
      SELECT doc_id, bm25,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rnk
      FROM ({_bm25_oracle()})
    ),
    tf AS (
      SELECT doc_id,
             {" + ".join(f"len(list_filter(string_split(text, ' '), x -> x = '{t}'))" for t in _BM25_TERMS)}
               AS tf_total
      FROM documents
    ),
    tfr AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY tf_total DESC, doc_id ASC) AS rnk
      FROM tf
    ),
    rec AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY doc_id DESC) AS rnk
      FROM documents
    ),
    fused AS (
      SELECT COALESCE(b.doc_id, t.doc_id, r.doc_id) AS doc_id,
             COALESCE(b.rnk, 0) AS rank_bm25,
             COALESCE(t.rnk, 0) AS rank_tf,
             COALESCE(r.rnk, 0) AS rank_rec
      FROM (SELECT * FROM bm WHERE rnk <= {_RRF_TOPN}) b
      FULL OUTER JOIN (SELECT * FROM tfr WHERE rnk <= {_RRF_TOPN}) t
        ON b.doc_id = t.doc_id
      FULL OUTER JOIN (SELECT * FROM rec WHERE rnk <= {_RRF_TOPN}) r
        ON COALESCE(b.doc_id, t.doc_id) = r.doc_id
    )
    SELECT doc_id,
           CAST(rank_bm25 AS INT) AS rank_bm25,
           CAST(rank_tf AS INT) AS rank_tf,
           CAST(rank_rec AS INT) AS rank_rec,
           CAST(CASE WHEN rank_bm25 > 0
                     THEN 1000000 // ({_RRF_K} + rank_bm25) ELSE 0 END
              + CASE WHEN rank_tf > 0
                     THEN 1000000 // ({_RRF_K} + rank_tf) ELSE 0 END
              + CASE WHEN rank_rec > 0
                     THEN 1000000 // ({_RRF_K} + rank_rec) ELSE 0 END
             AS BIGINT) AS rrf_micro
    FROM fused
    ORDER BY rrf_micro DESC, doc_id ASC
    LIMIT 20
    """


registry.register("rrf_fusion", q_rrf_fusion, _rrf_oracle())


# ---------------------------------------------------------------------------
# Exact 1-D earth mover's distance between two event-value histograms
# ---------------------------------------------------------------------------


def q_emd_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earth mover's (Wasserstein-1) distance between the value
    distributions of click vs view events — the drift metric that,
    unlike KS (`ks_statistic`) or PSI (`psi_drift`), weighs HOW FAR
    mass moved, not just whether it moved; in 1-D it collapses to the
    area between CDFs, which is exactly computable on binned integer
    counts: Σ_gaps |cumA·nB − cumB·nA| · gap / (nA·nB).

    Exactness: values quantize to cents then $5 bins; cumulative
    counts, cross-products and gap widths are all BIGINTs; ONE
    division at the end (milli-bins integer + a single-op double for
    dollars). Shapes: two histogram aggs, a full-outer bin-axis
    merge, windows over the bin table — everything after the first
    agg is bins-bounded forever."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT) DIV 500"
        ).alias("bin"),
    )
    ha = ev.filter(F.col("event_type") == "click").groupBy("bin").agg(
        F.count("*").alias("na_bin")
    )
    hb = ev.filter(F.col("event_type") == "view").groupBy("bin").agg(
        F.count("*").alias("nb_bin")
    )
    axis = ha.join(hb, "bin", "full_outer").select(
        "bin",
        F.coalesce("na_bin", F.lit(0)).alias("na_bin"),
        F.coalesce("nb_bin", F.lit(0)).alias("nb_bin"),
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wl = Window.orderBy("bin")
    staged = axis.select(
        "bin",
        F.sum("na_bin").over(wc).alias("cum_a"),
        F.sum("nb_bin").over(wc).alias("cum_b"),
        (F.lead("bin").over(wl) - F.col("bin")).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    totals = axis.agg(
        F.sum("na_bin").alias("n_a"), F.sum("nb_bin").alias("n_b")
    )
    # numerator needs nA/nB inside: broadcast totals onto the bin table
    scored = staged.crossJoin(F.broadcast(totals)).select(
        "n_a",
        "n_b",
        (
            F.abs(
                F.col("cum_a") * F.col("n_b")
                - F.col("cum_b") * F.col("n_a")
            )
            * F.col("gap")
        ).alias("term"),
    )
    return scored.groupBy("n_a", "n_b").agg(
        F.expr("(SUM(term) * 1000) DIV (n_a * n_b)").alias(
            "emd_bins_milli"
        ),
        _r6(
            F.sum("term").cast("double")
            * 5.0
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).alias("emd_dollars"),
    )


registry.register(
    "emd_1d",
    q_emd_1d,
    """
    WITH ev AS (
      SELECT event_type,
             CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT) // 500
               AS bin
      FROM events
    ),
    ha AS (SELECT bin, COUNT(*) AS na_bin FROM ev
           WHERE event_type = 'click' GROUP BY 1),
    hb AS (SELECT bin, COUNT(*) AS nb_bin FROM ev
           WHERE event_type = 'view' GROUP BY 1),
    axis AS (
      SELECT COALESCE(ha.bin, hb.bin) AS bin,
             COALESCE(na_bin, 0) AS na_bin,
             COALESCE(nb_bin, 0) AS nb_bin
      FROM ha FULL OUTER JOIN hb ON ha.bin = hb.bin
    ),
    staged AS (
      SELECT bin,
             SUM(na_bin) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS cum_a,
             SUM(nb_bin) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS cum_b,
             LEAD(bin) OVER (ORDER BY bin) - bin AS gap
      FROM axis
    ),
    totals AS (SELECT SUM(na_bin) AS n_a, SUM(nb_bin) AS n_b FROM axis)
    SELECT t.n_a, t.n_b,
           (SUM(ABS(s.cum_a * t.n_b - s.cum_b * t.n_a) * s.gap) * 1000)
             // (t.n_a * t.n_b) AS emd_bins_milli,
           FLOOR(CAST(SUM(ABS(s.cum_a * t.n_b - s.cum_b * t.n_a)
                          * s.gap) AS DOUBLE) * 5.0
                 / (CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS emd_dollars
    FROM staged s CROSS JOIN totals t
    WHERE s.gap IS NOT NULL
    GROUP BY t.n_a, t.n_b
    """,
)


# ---------------------------------------------------------------------------
# Empirical-Bayes shrinkage of per-nation conversion rates
# ---------------------------------------------------------------------------

_EB_STRENGTH = 100


def q_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes (additive) smoothing of per-nation customer
    order rates toward the data-driven global mean with prior
    strength 100 — the CTR-smoothing estimator every ranking/ads
    pipeline applies before trusting small-sample rates (a 3-customer
    nation's 100% rate should not outrank a 3000-customer nation's
    60%).

    With global totals X/N, the shrunk rate (x + m·s)/(n + s) is the
    exact rational (x·N + X·s)/((n+s)·N) — all BIGINTs, one integer
    micro division per group. Shapes: one customer-grain existence
    join, one nation rollup, one 1-row broadcast of the totals."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    has_order = cust.join(
        orders.distinct(),
        cust["c_custkey"] == orders["o_custkey"],
        "left",
    ).select(
        "c_nationkey",
        F.col("o_custkey").isNotNull().cast("long").alias("converted"),
    )
    per_nation = has_order.groupBy("c_nationkey").agg(
        F.count("*").alias("n"), F.sum("converted").alias("x")
    )
    totals = per_nation.agg(
        F.sum("n").alias("nn"), F.sum("x").alias("xx")
    )
    s = _EB_STRENGTH
    return per_nation.crossJoin(F.broadcast(totals)).select(
        "c_nationkey",
        "n",
        "x",
        F.expr("(x * 1000000) DIV n").alias("raw_micro"),
        F.expr(
            f"((x * nn + xx * {s}) * 1000000) DIV ((n + {s}) * nn)"
        ).alias("shrunk_micro"),
        F.expr(f"({s} * 1000000) DIV (n + {s})").alias(
            "shrink_weight_micro"
        ),
    )


registry.register(
    "eb_shrinkage",
    q_eb_shrinkage,
    f"""
    WITH has_order AS (
      SELECT c.c_nationkey,
             CASE WHEN EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = c.c_custkey)
                  THEN 1 ELSE 0 END AS converted
      FROM customer c
    ),
    per_nation AS (
      SELECT c_nationkey, COUNT(*) AS n, SUM(converted) AS x
      FROM has_order GROUP BY 1
    ),
    totals AS (SELECT SUM(n) AS nn, SUM(x) AS xx FROM per_nation)
    SELECT p.c_nationkey,
           CAST(p.n AS BIGINT) AS n,
           CAST(p.x AS BIGINT) AS x,
           (p.x * 1000000) // p.n AS raw_micro,
           ((p.x * t.nn + t.xx * {_EB_STRENGTH}) * 1000000)
             // ((p.n + {_EB_STRENGTH}) * t.nn) AS shrunk_micro,
           ({_EB_STRENGTH} * 1000000) // (p.n + {_EB_STRENGTH})
             AS shrink_weight_micro
    FROM per_nation p CROSS JOIN totals t
    """,
)


# ---------------------------------------------------------------------------
# Quantile treatment effects at P50 / P90
# ---------------------------------------------------------------------------


def q_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects of the deterministic A/B split on
    per-user purchase value: QTE(q) = Q_treated(q) − Q_control(q) at
    the median and the P90 — the distributional complement of a mean
    effect (`welch_ttest`): a treatment that only moves the tail is
    invisible to the mean and obvious here.

    Exactness: per-arm quantiles are exact ⌈q·n⌉-th order statistics
    (row_number with value+user tiebreaks, integer cents); QTE is an
    integer difference. Shapes: one user-grain rollup, two arm-
    partitioned rank windows, a 2-row output."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.expr(
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN"
            " CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) ELSE CAST(0 AS"
            " DECIMAL(18,2)) END) * 100 AS BIGINT)"
        ).alias("v_cents")
    ).select(
        "user_id",
        "v_cents",
        (F.col("user_id") % 2 == 0).cast("int").alias("treated"),
    )
    w = Window.partitionBy("treated").orderBy(
        F.col("v_cents").asc(), F.col("user_id").asc()
    )
    ranked = users.withColumn("rn", F.row_number().over(w))
    arms = users.groupBy("treated").agg(F.count("*").alias("n_arm"))
    parts = []
    for q_milli in (500, 900):
        k = F.expr(f"-((-{q_milli} * n_arm) DIV 1000)")
        qv = (
            ranked.join(F.broadcast(arms), "treated")
            .filter(F.col("rn") == k)
            .select("treated", "n_arm", F.col("v_cents").alias("qv"))
        )
        t = qv.filter(F.col("treated") == 1).select(
            F.col("n_arm").alias("n_treated"),
            F.col("qv").alias("q_treated_cents"),
        )
        c = qv.filter(F.col("treated") == 0).select(
            F.col("n_arm").alias("n_control"),
            F.col("qv").alias("q_control_cents"),
        )
        parts.append(
            t.crossJoin(F.broadcast(c)).select(
                F.lit(q_milli).alias("q_milli"),
                "n_treated",
                "n_control",
                "q_treated_cents",
                "q_control_cents",
                (
                    F.col("q_treated_cents") - F.col("q_control_cents")
                ).alias("qte_cents"),
            )
        )
    return parts[0].unionAll(parts[1])


registry.register(
    "quantile_treatment_effect",
    q_quantile_treatment_effect,
    """
    WITH users AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN
                  CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) ELSE CAST(0 AS
                  DECIMAL(18,2)) END) * 100 AS BIGINT) AS v_cents,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY treated
                ORDER BY v_cents ASC, user_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY treated) AS n_arm
      FROM users
    ),
    q AS (
      SELECT g.q_milli, r.treated, r.n_arm, r.v_cents AS qv
      FROM ranked r
      JOIN (VALUES (500), (900)) AS g(q_milli)
        ON r.rn = -((-g.q_milli * r.n_arm) // 1000)
    )
    SELECT t.q_milli,
           t.n_arm AS n_treated, c.n_arm AS n_control,
           t.qv AS q_treated_cents, c.qv AS q_control_cents,
           t.qv - c.qv AS qte_cents
    FROM (SELECT * FROM q WHERE treated = 1) t
    JOIN (SELECT * FROM q WHERE treated = 0) c
      ON t.q_milli = c.q_milli
    """,
)


# ---------------------------------------------------------------------------
# CUPED variance reduction for A/B metrics
# ---------------------------------------------------------------------------


def q_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled-experiment using pre-experiment data): how
    much variance does regressing each user's POST-period purchase
    value on their PRE-period value remove? θ = Cov(pre, post)/
    Var(pre) and the variance-reduction ratio R² = Sxy²/(Sxx·Syy) —
    the adjustment every experimentation platform applies before the
    t-test, because a 30% variance cut is a 30% smaller sample
    requirement.

    Exactness: the period boundary is the integer midpoint of the
    epoch-micros range (TZ-proof); per-user pre/post sums are integer
    cents; the centered second moments n·Σx²−(Σx)² are computed in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so no 64-bit overflow at
    any SF — both exact; θ and R² are single double expressions on
    those exact inputs. Shapes: one user-grain rollup, one 1-row
    output."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts)").alias("tm"),
        F.expr(
            "CASE WHEN event_type = 'purchase' THEN"
            " CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " ELSE 0 END"
        ).alias("cents"),
    )
    bounds = ev.agg(
        F.expr("(MIN(tm) + MAX(tm)) DIV 2").alias("mid")
    )
    users = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("tm") < F.col("mid"), F.col("cents")).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("tm") >= F.col("mid"), F.col("cents")).otherwise(0)
            ).alias("y"),
        )
    )
    d38 = "decimal(38,0)"
    agg = users.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d38)).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).alias("sxy"),
    )
    cxx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    cyy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    cxy = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    return agg.select(
        F.col("n").cast("long").alias("n_users"),
        _r6(cxy / cxx).alias("theta"),
        _r6(cxy * cxy / (cxx * cyy)).alias("var_reduction_r2"),
    )


registry.register(
    "cuped_adjustment",
    q_cuped_adjustment,
    """
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS tm,
             CASE WHEN event_type = 'purchase' THEN
               CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END AS cents
      FROM events
    ),
    bounds AS (SELECT (MIN(tm) + MAX(tm)) // 2 AS mid FROM ev),
    users AS (
      SELECT user_id,
             SUM(CASE WHEN tm < (SELECT mid FROM bounds)
                      THEN cents ELSE 0 END) AS x,
             SUM(CASE WHEN tm >= (SELECT mid FROM bounds)
                      THEN cents ELSE 0 END) AS y
      FROM ev GROUP BY 1
    ),
    agg AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy,
             SUM(x * y) AS sxy
      FROM users
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS theta,
           FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS var_reduction_r2
    FROM agg
    """,
)


# ---------------------------------------------------------------------------
# Mann-Whitney U (rank-sum) test with exact tie handling
# ---------------------------------------------------------------------------


def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U on per-user purchase value between the parity
    A/B arms — the nonparametric slot between `welch_ttest` (assumes
    moments) and `ks_statistic` (location-insensitive): U asks
    simply "does a random treated user outrank a random control
    user?", robust to the heavy zero-inflation this metric has.

    Exactness: tie-averaged ranks are kept DOUBLED so they stay
    integers (a tie group after c smaller values with size g has
    doubled rank 2c + g + 1 for every member); rank sums, U, and the
    tie-correction Σ(t³−t) are exact BIGINTs; the normal z is one
    final double expression (_r6). Shapes: a value-grouped count
    table replaces any global per-row ranking — ranks come from
    cumulative counts over DISTINCT values, so the windows run on
    the value-histogram, never the user table."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.expr(
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN"
            " CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) ELSE CAST(0 AS"
            " DECIMAL(18,2)) END) * 100 AS BIGINT)"
        ).alias("v")
    ).select(
        "v", (F.col("user_id") % 2 == 0).cast("long").alias("treated")
    )
    hist = users.groupBy("v").agg(
        F.count("*").alias("g"), F.sum("treated").alias("g1")
    )
    wc = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = hist.select(
        "v",
        "g",
        "g1",
        F.coalesce(F.sum("g").over(wc), F.lit(0)).alias("c_lt"),
    )
    agg = ranked.agg(
        F.sum("g1").alias("n1"),
        F.sum(F.col("g") - F.col("g1")).alias("n2"),
        F.sum(
            F.col("g1") * (2 * F.col("c_lt") + F.col("g") + 1)
        ).alias("r1_doubled"),
        F.sum(
            F.col("g") * F.col("g") * F.col("g") - F.col("g")
        ).alias("tie_term"),
    )
    u_doubled = F.col("r1_doubled") - F.col("n1") * (F.col("n1") + 1)
    n = F.col("n1") + F.col("n2")
    mean_u2 = F.col("n1") * F.col("n2")  # doubled mean = n1*n2
    var = (
        F.col("n1").cast("double")
        * F.col("n2").cast("double")
        / 12.0
        * (
            (n + 1).cast("double")
            - F.col("tie_term").cast("double")
            / (n.cast("double") * (n - 1).cast("double"))
        )
    )
    z = (u_doubled - mean_u2).cast("double") / (2.0 * F.sqrt(var))
    return agg.select(
        F.col("n1").alias("n_treated"),
        F.col("n2").alias("n_control"),
        u_doubled.alias("u_doubled"),
        F.col("tie_term").alias("tie_term"),
        _r6(z).alias("z"),
    )


registry.register(
    "mann_whitney_u",
    q_mann_whitney_u,
    """
    WITH users AS (
      SELECT CAST(SUM(CASE WHEN event_type = 'purchase' THEN
                  CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) ELSE CAST(0 AS
                  DECIMAL(18,2)) END) * 100 AS BIGINT) AS v,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated
      FROM events GROUP BY user_id
    ),
    hist AS (
      SELECT v, COUNT(*) AS g, SUM(treated) AS g1
      FROM users GROUP BY 1
    ),
    ranked AS (
      SELECT v, g, g1,
             COALESCE(SUM(g) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                      PRECEDING AND 1 PRECEDING), 0) AS c_lt
      FROM hist
    ),
    agg AS (
      SELECT SUM(g1) AS n1, SUM(g - g1) AS n2,
             SUM(g1 * (2 * c_lt + g + 1)) AS r1_doubled,
             SUM(g * g * g - g) AS tie_term
      FROM ranked
    )
    SELECT CAST(n1 AS BIGINT) AS n_treated,
           CAST(n2 AS BIGINT) AS n_control,
           CAST(r1_doubled - n1 * (n1 + 1) AS BIGINT) AS u_doubled,
           CAST(tie_term AS BIGINT) AS tie_term,
           FLOOR(CAST(r1_doubled - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
                 / (2.0 * SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                    / 12.0
                    * (CAST(n1 + n2 + 1 AS DOUBLE)
                       - CAST(tie_term AS DOUBLE)
                         / (CAST(n1 + n2 AS DOUBLE)
                            * CAST(n1 + n2 - 1 AS DOUBLE)))))
                 * 1000000.0 + 0.5) / 1000000.0 AS z
    FROM agg
    """,
)


# ---------------------------------------------------------------------------
# Difference-in-differences estimator
# ---------------------------------------------------------------------------


def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the 2x2 (group x period) panel
    estimator DiD = (T_post − T_pre) − (C_post − C_pre) on mean
    purchase value — the workhorse causal design when treatment rolls
    out to one cohort at a known time and `cuped_adjustment`-style
    randomization isn't available. Treated cohort = odd user_id;
    the period boundary is the integer midpoint of the epoch-micros
    range (the CUPED idiom, TZ-proof).

    Exactness: each cell is (count, Σcents) in exact integers; cell
    means are single correctly-rounded IEEE divisions of those ints,
    and DiD is three IEEE subtractions on them — the same expression
    tree on both engines, `_r6`-bounded. Shapes: one pass over the
    fact into a 4-row cell table (map-side combinable), 1-row output."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        (F.col("user_id") % 2 == 1).cast("int").alias("treated"),
        F.expr("unix_micros(ts)").alias("tm"),
        F.expr(
            "CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    bounds = ev.agg(F.expr("(MIN(tm) + MAX(tm)) DIV 2").alias("mid"))
    cells = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(
            "treated",
            (F.col("tm") >= F.col("mid")).cast("int").alias("post"),
        )
        .agg(F.count("*").alias("n"), F.sum("cents").alias("s"))
    )
    m = lambda t, p: F.max(  # noqa: E731
        F.when(
            (F.col("treated") == t) & (F.col("post") == p),
            F.col("s").cast("double") / F.col("n").cast("double"),
        )
    )
    cnt = lambda t, p: F.max(  # noqa: E731
        F.when((F.col("treated") == t) & (F.col("post") == p), F.col("n"))
    )
    wide = cells.agg(
        cnt(0, 0).alias("n_c_pre"),
        cnt(0, 1).alias("n_c_post"),
        cnt(1, 0).alias("n_t_pre"),
        cnt(1, 1).alias("n_t_post"),
        m(0, 0).alias("m_c_pre"),
        m(0, 1).alias("m_c_post"),
        m(1, 0).alias("m_t_pre"),
        m(1, 1).alias("m_t_post"),
    )
    return wide.select(
        "n_c_pre",
        "n_c_post",
        "n_t_pre",
        "n_t_post",
        _r6(F.col("m_c_pre")).alias("mean_c_pre"),
        _r6(F.col("m_c_post")).alias("mean_c_post"),
        _r6(F.col("m_t_pre")).alias("mean_t_pre"),
        _r6(F.col("m_t_post")).alias("mean_t_post"),
        _r6(
            (F.col("m_t_post") - F.col("m_t_pre"))
            - (F.col("m_c_post") - F.col("m_c_pre"))
        ).alias("did_cents"),
    )


registry.register(
    "diff_in_diff",
    q_diff_in_diff,
    """
    WITH ev AS (
      SELECT CAST(user_id % 2 = 1 AS INT) AS treated,
             epoch_us(ts) AS tm,
             CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    bounds AS (SELECT (MIN(tm) + MAX(tm)) // 2 AS mid FROM ev),
    cells AS (
      SELECT treated, CAST(tm >= mid AS INT) AS post,
             COUNT(*) AS n, SUM(cents) AS s
      FROM ev CROSS JOIN bounds GROUP BY 1, 2
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n_c_pre,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n_c_post,
        MAX(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n_t_pre,
        MAX(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n_t_post,
        MAX(CASE WHEN treated = 0 AND post = 0
                 THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS m_c_pre,
        MAX(CASE WHEN treated = 0 AND post = 1
                 THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS m_c_post,
        MAX(CASE WHEN treated = 1 AND post = 0
                 THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS m_t_pre,
        MAX(CASE WHEN treated = 1 AND post = 1
                 THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS m_t_post
      FROM cells
    )
    SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
           FLOOR(m_c_pre * 1000000.0 + 0.5) / 1000000.0 AS mean_c_pre,
           FLOOR(m_c_post * 1000000.0 + 0.5) / 1000000.0 AS mean_c_post,
           FLOOR(m_t_pre * 1000000.0 + 0.5) / 1000000.0 AS mean_t_pre,
           FLOOR(m_t_post * 1000000.0 + 0.5) / 1000000.0 AS mean_t_post,
           FLOOR(((m_t_post - m_t_pre) - (m_c_post - m_c_pre))
                 * 1000000.0 + 0.5) / 1000000.0 AS did_cents
    FROM wide
    """,
)


# ---------------------------------------------------------------------------
# A/B test power analysis: minimum detectable effect per audience
# ---------------------------------------------------------------------------

# z_{0.975} + z_{0.80}, precomputed once in Python and embedded as ONE
# literal double on both engines (no libm inverse-normal anywhere)
_MDE_Z = 2.8015852181129683


def q_mde_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-experiment power analysis: for each candidate audience
    (users who fired a given non-purchase event type), the minimum
    detectable absolute lift in purchase conversion an equal-split
    A/B test on that audience could resolve at α=0.05 / power 0.8 —
    MDE = (z₀.₉₇₅+z₀.₈)·√(2·p·(1−p)/(n/2)) — the go/no-go sizing
    check run before `diff_in_diff`/`cuped_adjustment` ever see data.
    Small audiences → large MDE → "don't bother testing".

    Exactness: n and conversions are exact counts; p is one
    correctly-rounded division; the z-sum is a single Python-side
    literal (no libm inverse-normal); √ is IEEE-exact — the whole MDE
    is a deterministic expression tree, `_r6`-bounded. Shapes: two
    user-grain rollups joined on user, then a |event types|-row
    output."""
    ev = load_table(spark, sf_dir, "events")
    audience = (
        ev.filter(F.col("event_type") != "purchase")
        .select("event_type", "user_id")
        .distinct()
    )
    buyers = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    cells = (
        audience.join(buyers, "user_id", "left")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.coalesce(F.col("converted"), F.lit(0))).alias("n_conv"),
        )
    )
    p = F.col("n_conv").cast("double") / F.col("n_users").cast("double")
    arm = F.expr("n_users DIV 2").cast("double")
    mde = F.lit(_MDE_Z) * F.sqrt(
        F.lit(2.0) * p * (F.lit(1.0) - p) / arm
    )
    return cells.select(
        "event_type",
        "n_users",
        F.col("n_conv").cast("long").alias("n_conv"),
        _r6(p).alias("conv_rate"),
        _r6(mde).alias("mde_abs"),
    )


registry.register(
    "mde_power",
    q_mde_power,
    f"""
    WITH audience AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE event_type <> 'purchase'
    ),
    buyers AS (
      SELECT DISTINCT user_id, 1 AS converted FROM events
      WHERE event_type = 'purchase'
    ),
    cells AS (
      SELECT a.event_type, COUNT(*) AS n_users,
             SUM(COALESCE(b.converted, 0)) AS n_conv
      FROM audience a LEFT JOIN buyers b ON a.user_id = b.user_id
      GROUP BY 1
    )
    SELECT event_type, n_users, CAST(n_conv AS BIGINT) AS n_conv,
           FLOOR(CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS conv_rate,
           FLOOR({_MDE_Z!r} * sqrt(2.0
                   * (CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
                   * (1.0 - CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
                   / CAST(n_users // 2 AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS mde_abs
    FROM cells
    """,
)


# ---------------------------------------------------------------------------
# Brown-Forsythe (median-centered Levene) equality-of-variance test
# ---------------------------------------------------------------------------


def q_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (median-centered Levene) of variance
    homogeneity of order value across the 5 order priorities — the
    robustness companion to `anova_f`: ANOVA assumes equal group
    variances, and this is the standard pre-check (median centering
    makes it robust to the heavy right tail that invalidates the
    classic mean-centered Levene on revenue data).

    F = ((N−k)/(k−1)) · Σ_j n_j(z̄_j−z̄)² / Σ_j Σ_i (z_ij−z̄_j)²
    with z_ij = |x_ij − median_j|.

    Exactness: x is exact integer cents; the group median is the
    lower median (the ⌈n/2⌉-th smallest — a rank rule, no float
    interpolation), so every z is an exact integer. Per-group
    sufficient statistics (n, Σz, Σz² as DECIMAL(38,0)) are exact;
    the two k-term double reductions run as ORDERED cumulative
    windows over the group key (deterministic summation order on
    both engines — the entropy_profile precedent), and the F ratio
    is the only remaining float division chain, `_r6`-bounded.

    Scale: one shuffle to rank within groups (median), one combinable
    groupBy for the sufficient stats, then a k-row (=5) window — the
    fact table is touched twice, never re-shuffled on a skewed key.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = (dec_portable("o_totalprice", 18, 2) * 100).cast("long")
    vals = orders.select(
        F.col("o_orderpriority").alias("grp"), cents.alias("x")
    )
    wg = Window.partitionBy("grp").orderBy("x")
    ranked = vals.withColumn("rn", F.row_number().over(wg)).withColumn(
        "ng", F.count("*").over(Window.partitionBy("grp"))
    )
    med = ranked.filter(
        F.col("rn") == F.expr("(ng + 1) DIV 2")
    ).select("grp", F.col("x").alias("med"))
    z = vals.join(F.broadcast(med), "grp").select(
        "grp", "med", F.abs(F.col("x") - F.col("med")).alias("z")
    )
    g = z.groupBy("grp").agg(
        F.max("med").alias("med"),
        F.count("*").alias("ng"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z").cast("decimal(38,0)") * F.col("z")).alias("qz"),
    )
    wall = Window.partitionBy()
    wcum = Window.orderBy("grp").rowsBetween(Window.unboundedPreceding, 0)
    ngd = F.col("ng").cast("double")
    szd = F.col("sz").cast("double")
    ssw_term = F.col("qz").cast("double") - szd * szd / ngd
    ssb_term = ngd * (
        (szd / ngd)
        - (F.col("s").cast("double") / F.col("n").cast("double"))
    ) * (
        (szd / ngd)
        - (F.col("s").cast("double") / F.col("n").cast("double"))
    )
    t = (
        g.withColumn("n", F.sum("ng").over(wall))
        .withColumn("s", F.sum("sz").over(wall))
        .withColumn("k", F.count("*").over(wall))
        .withColumn("ssw_cum", F.sum(ssw_term).over(wcum))
        .withColumn("ssb_cum", F.sum(ssb_term).over(wcum))
        .withColumn("pos", F.row_number().over(Window.orderBy("grp")))
    )
    fin = t.filter(F.col("pos") == F.col("k")).select(
        F.col("k").cast("long").alias("n_groups"),
        F.col("n").cast("long").alias("n_orders"),
        (
            (F.col("ssb_cum") / (F.col("k").cast("double") - 1))
            / (
                F.col("ssw_cum")
                / (F.col("n").cast("double") - F.col("k").cast("double"))
            )
        ).alias("f_raw"),
    )
    per_grp = g.select(
        "grp",
        F.col("ng").cast("long").alias("n_g"),
        F.col("med").cast("long").alias("median_cents"),
        _r6(F.col("sz").cast("double") / F.col("ng").cast("double")).alias(
            "mean_abs_dev"
        ),
    )
    return per_grp.join(F.broadcast(fin)).select(
        "grp",
        "n_g",
        "median_cents",
        "mean_abs_dev",
        "n_groups",
        "n_orders",
        _r6(F.col("f_raw")).alias("bf_f_stat"),
    )


registry.register(
    "levene_bf",
    q_levene_bf,
    """
    WITH vals AS (
      SELECT o_orderpriority AS grp,
             CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
      FROM orders
    ),
    ranked AS (
      SELECT grp, x,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS ng
      FROM vals
    ),
    med AS (SELECT grp, x AS med FROM ranked WHERE rn = (ng + 1) // 2),
    z AS (
      SELECT v.grp, m.med, ABS(v.x - m.med) AS z
      FROM vals v JOIN med m ON v.grp = m.grp
    ),
    g AS (
      SELECT grp, MAX(med) AS med, COUNT(*) AS ng, SUM(z) AS sz,
             SUM(CAST(z AS DECIMAL(38,0)) * z) AS qz
      FROM z GROUP BY 1
    ),
    t0 AS (
      SELECT grp, med, ng, sz, qz,
             SUM(ng) OVER () AS n, SUM(sz) OVER () AS s,
             COUNT(*) OVER () AS k
      FROM g
    ),
    t AS (
      SELECT grp, ng, sz, qz, n, s, k,
             SUM(CAST(qz AS DOUBLE)
                 - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                   / CAST(ng AS DOUBLE))
               OVER (ORDER BY grp ROWS UNBOUNDED PRECEDING) AS ssw_cum,
             SUM(CAST(ng AS DOUBLE)
                 * (CAST(sz AS DOUBLE) / CAST(ng AS DOUBLE)
                    - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sz AS DOUBLE) / CAST(ng AS DOUBLE)
                    - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
               OVER (ORDER BY grp ROWS UNBOUNDED PRECEDING) AS ssb_cum,
             ROW_NUMBER() OVER (ORDER BY grp) AS pos
      FROM t0
    ),
    fin AS (
      SELECT CAST(k AS BIGINT) AS n_groups, CAST(n AS BIGINT) AS n_orders,
             (ssb_cum / (CAST(k AS DOUBLE) - 1))
             / (ssw_cum / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) AS f_raw
      FROM t WHERE pos = k
    )
    SELECT g.grp, CAST(g.ng AS BIGINT) AS n_g,
           CAST(g.med AS BIGINT) AS median_cents,
           FLOOR(CAST(g.sz AS DOUBLE) / CAST(g.ng AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS mean_abs_dev,
           f.n_groups, f.n_orders,
           FLOOR(f.f_raw * 1000000.0 + 0.5) / 1000000.0 AS bf_f_stat
    FROM g CROSS JOIN fin f
    """,
)


# ---------------------------------------------------------------------------
# Delete-one-group jackknife SE of a ratio metric
# ---------------------------------------------------------------------------


def q_jackknife_ratio_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-nation jackknife standard error of revenue-per-order
    — the cluster-robust uncertainty estimate for a RATIO metric,
    where the naive per-row variance is wrong because both numerator
    and denominator are random (`ratio_metric_delta` gives the
    delta-method answer; the jackknife is its assumption-free check,
    and the two bracketing each other is the standard sanity gate).

    Exactness: every leave-one-out ratio is computed as an exact
    integer floor division in micro-cents (numerator widened to
    DECIMAL(38,0) before the ×10⁶ so no scale overflows), so the g
    pseudo-ratios are exact BIGINTs; the variance uses the exact
    integer identity g·Σθ² − (Σθ)² in DECIMAL(38,0), and the only
    float ops are the final casts/divisions/√ — one shared expression
    tree, `_r6`-bounded.

    Scale: the total-minus-self pattern — ONE pass builds per-group
    sufficient statistics, the totals broadcast back, and each
    leave-one-out replicate is O(1) arithmetic instead of a re-scan
    (the naive jackknife re-aggregates the fact table g times)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    cents = (dec_portable("o_totalprice", 18, 2) * 100).cast("long")
    g = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("cnt"), F.sum(cents).alias("rev"))
    )
    wall = Window.partitionBy()
    t = (
        g.withColumn("s_cnt", F.sum("cnt").over(wall))
        .withColumn("s_rev", F.sum("rev").over(wall))
        .withColumn("gk", F.count("*").over(wall))
        .withColumn(
            "theta_loo_q",
            F.expr(
                "CAST(CAST((s_rev - rev) AS DECIMAL(38,0)) * 1000000"
                " DIV (s_cnt - cnt) AS BIGINT)"
            ),
        )
    )
    agg = t.groupBy("s_cnt", "s_rev", "gk").agg(
        F.sum("theta_loo_q").alias("sum_t"),
        F.sum(
            F.col("theta_loo_q").cast("decimal(38,0)")
            * F.col("theta_loo_q")
        ).alias("sum_t2"),
    )
    gd = F.col("gk").cast("double")
    ss = (
        F.col("gk").cast("decimal(38,0)") * F.col("sum_t2")
        - F.col("sum_t").cast("decimal(38,0)") * F.col("sum_t")
    ).cast("double")
    se_cents = F.sqrt(
        (gd - F.lit(1.0)) / gd * (ss / gd / gd) / F.lit(1.0e12)
    )
    theta_all = F.expr(
        "CAST(CAST(s_rev AS DECIMAL(38,0)) * 1000000"
        " DIV s_cnt AS BIGINT)"
    )
    summary = agg.select(
        F.col("gk").cast("long").alias("n_groups"),
        F.col("s_cnt").cast("long").alias("n_orders"),
        _r6(theta_all.cast("double") / F.lit(1.0e6)).alias(
            "rev_per_order_cents"
        ),
        _r6(se_cents).alias("jackknife_se_cents"),
    )
    per_grp = t.select(
        "nationkey",
        F.col("cnt").cast("long").alias("n_g"),
        _r6(F.col("theta_loo_q").cast("double") / F.lit(1.0e6)).alias(
            "theta_loo_cents"
        ),
    )
    return per_grp.join(F.broadcast(summary)).select(
        "nationkey",
        "n_g",
        "theta_loo_cents",
        "n_groups",
        "n_orders",
        "rev_per_order_cents",
        "jackknife_se_cents",
    )


registry.register(
    "jackknife_ratio_se",
    q_jackknife_ratio_se,
    """
    WITH g AS (
      SELECT c.c_nationkey AS nationkey, COUNT(*) AS cnt,
             SUM(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    ),
    t AS (
      SELECT nationkey, cnt, rev,
             SUM(cnt) OVER () AS s_cnt, SUM(rev) OVER () AS s_rev,
             COUNT(*) OVER () AS gk
      FROM g
    ),
    t2 AS (
      SELECT *,
             CAST(CAST((s_rev - rev) AS HUGEINT) * 1000000
                  // (s_cnt - cnt) AS BIGINT) AS theta_loo_q
      FROM t
    ),
    agg AS (
      SELECT s_cnt, s_rev, gk, SUM(theta_loo_q) AS sum_t,
             SUM(CAST(theta_loo_q AS HUGEINT) * theta_loo_q) AS sum_t2
      FROM t2 GROUP BY 1, 2, 3
    ),
    summary AS (
      SELECT CAST(gk AS BIGINT) AS n_groups,
             CAST(s_cnt AS BIGINT) AS n_orders,
             FLOOR(CAST(CAST(CAST(s_rev AS HUGEINT) * 1000000 // s_cnt
                             AS BIGINT) AS DOUBLE) / 1.0e6
                   * 1000000.0 + 0.5) / 1000000.0 AS rev_per_order_cents,
             FLOOR(sqrt((CAST(gk AS DOUBLE) - 1.0) / CAST(gk AS DOUBLE)
                        * (CAST(CAST(gk AS HUGEINT) * sum_t2
                                - CAST(sum_t AS HUGEINT) * sum_t
                                AS DOUBLE)
                           / CAST(gk AS DOUBLE) / CAST(gk AS DOUBLE))
                        / 1.0e12)
                   * 1000000.0 + 0.5) / 1000000.0 AS jackknife_se_cents
      FROM agg
    )
    SELECT t2.nationkey, CAST(t2.cnt AS BIGINT) AS n_g,
           FLOOR(CAST(t2.theta_loo_q AS DOUBLE) / 1.0e6
                 * 1000000.0 + 0.5) / 1000000.0 AS theta_loo_cents,
           s.n_groups, s.n_orders, s.rev_per_order_cents,
           s.jackknife_se_cents
    FROM t2 CROSS JOIN summary s
    """,
)


# ---------------------------------------------------------------------------
# Group-sequential A/B monitoring (O'Brien-Fleming boundaries)
# ---------------------------------------------------------------------------

# O'Brien-Fleming z boundaries for K=5 equally-spaced looks at overall
# alpha=0.05 (two-sided) — literature constants embedded as literals on
# both engines (no inverse-normal at runtime), the _MDE_Z discipline.
_OBF_BOUNDS = [4.8769, 3.3569, 2.6803, 2.2898, 2.0310]


def q_group_sequential_obf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential monitoring of a hash-assigned A/B conversion
    experiment: 5 equally-spaced calendar looks, each computing the
    pooled two-proportion z on users ENROLLED BY THAT DATE, compared
    against the O'Brien-Fleming spending boundary — the legal way to
    peek at a running test (`welch_ttest` at every peek inflates
    false positives ~3× at 5 looks; OBF is why experiment platforms
    ship sequential boundaries as a first-class primitive).

    Exactness: look cut-days are exact integer arithmetic on the
    observed day span; enrollment/conversion cells are exact counts
    of md5-coin-assigned users (the srm_check coin); z is one shared
    expression tree from 4 integers, guarded to 0 when the pooled
    rate is degenerate; boundaries are literals. `_r6`-bounded.

    Scale: one user-grain rollup (combinable), a 5-row look dimension
    broadcast against it, K-row output — re-running all looks costs
    one pass, not K passes."""
    from airflow_baseball_spark.operators.sampling import hash_unit

    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    per_user = ev.groupBy("user_id").agg(
        F.min(day).alias("d_first"),
        F.min(
            F.when(F.col("event_type") == "purchase", day)
        ).alias("d_conv"),
    )
    arm = F.when(
        hash_unit(F.col("user_id"), seed="ab") < 0.5, "A"
    ).otherwise("B")
    pu = per_user.select(
        arm.alias("arm"), "d_first", "d_conv"
    )
    span = ev.agg(
        F.min(day).alias("dmin"), F.max(day).alias("dmax")
    )
    looks = (
        spark.range(1, 6)
        .select(F.col("id").alias("k"))
        .crossJoin(F.broadcast(span))
        .select(
            "k",
            F.expr("dmin + k * (dmax - dmin) DIV 5").alias("cut_day"),
        )
    )
    cells = (
        pu.crossJoin(F.broadcast(looks))
        .filter(F.col("d_first") <= F.col("cut_day"))
        .groupBy("k", "cut_day")
        .agg(
            F.count(F.when(F.col("arm") == "A", 1)).alias("n_a"),
            F.count(F.when(F.col("arm") == "B", 1)).alias("n_b"),
            F.count(
                F.when(
                    (F.col("arm") == "A")
                    & (F.col("d_conv") <= F.col("cut_day")),
                    1,
                )
            ).alias("c_a"),
            F.count(
                F.when(
                    (F.col("arm") == "B")
                    & (F.col("d_conv") <= F.col("cut_day")),
                    1,
                )
            ).alias("c_b"),
        )
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("c_a").cast("double"), F.col("c_b").cast("double")
    pool = (ca + cb) / (na + nb)
    z_raw = (ca / na - cb / nb) / F.sqrt(
        pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    z = F.when(
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("c_a") + F.col("c_b") > 0)
        & (F.col("c_a") + F.col("c_b") < F.col("n_a") + F.col("n_b")),
        z_raw,
    ).otherwise(F.lit(0.0))
    bound = F.element_at(
        F.array(*[F.lit(b) for b in _OBF_BOUNDS]), F.col("k").cast("int")
    )
    return cells.select(
        F.col("k").cast("long").alias("k"),
        "cut_day",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("c_a").cast("long").alias("c_a"),
        F.col("c_b").cast("long").alias("c_b"),
        _r6(z).alias("z_stat"),
        bound.alias("obf_bound"),
        (F.abs(z) > bound).alias("crossed"),
    )


def _gso_sql() -> str:
    from airflow_baseball_spark.operators.sampling import hash_unit_sql

    u = hash_unit_sql("user_id", "ab")
    bounds = ", ".join(str(b) for b in _OBF_BOUNDS)
    return f"""
    WITH per_user AS (
      SELECT user_id,
             MIN(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)))
               AS d_first,
             MIN(CASE WHEN event_type = 'purchase'
                 THEN datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                 END) AS d_conv
      FROM events GROUP BY 1
    ),
    pu AS (
      SELECT CASE WHEN {u} < 0.5 THEN 'A' ELSE 'B' END AS arm,
             d_first, d_conv
      FROM per_user
    ),
    span AS (
      SELECT MIN(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)))
               AS dmin,
             MAX(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)))
               AS dmax
      FROM events
    ),
    looks AS (
      SELECT k, dmin + k * (dmax - dmin) // 5 AS cut_day
      FROM (SELECT UNNEST(range(1, 6)) AS k) CROSS JOIN span
    ),
    cells AS (
      SELECT l.k, l.cut_day,
             COUNT(CASE WHEN arm = 'A' THEN 1 END) AS n_a,
             COUNT(CASE WHEN arm = 'B' THEN 1 END) AS n_b,
             COUNT(CASE WHEN arm = 'A' AND d_conv <= l.cut_day
                   THEN 1 END) AS c_a,
             COUNT(CASE WHEN arm = 'B' AND d_conv <= l.cut_day
                   THEN 1 END) AS c_b
      FROM pu CROSS JOIN looks l
      WHERE d_first <= l.cut_day
      GROUP BY 1, 2
    ),
    zc AS (
      SELECT *,
             CASE WHEN n_a > 0 AND n_b > 0 AND c_a + c_b > 0
                    AND c_a + c_b < n_a + n_b THEN
               (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
               / sqrt((CAST(c_a + c_b AS DOUBLE)
                       / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 - CAST(c_a + c_b AS DOUBLE)
                               / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 / CAST(n_a AS DOUBLE)
                         + 1.0 / CAST(n_b AS DOUBLE)))
             ELSE 0.0 END AS z,
             CAST(([{bounds}])[k] AS DOUBLE) AS obf_bound
      FROM cells
    )
    SELECT CAST(k AS BIGINT) AS k, cut_day,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
           FLOOR(z * 1000000.0 + 0.5) / 1000000.0 AS z_stat,
           obf_bound, ABS(z) > obf_bound AS crossed
    FROM zc
    """


registry.register(
    "group_sequential_obf", q_group_sequential_obf, _gso_sql()
)


# ---------------------------------------------------------------------------
# Two-sample energy distance (exact prefix-sum pair algebra)
# ---------------------------------------------------------------------------


def q_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy distance between the purchase and click value
    distributions: D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'| — the two-sample
    test that is consistent against ALL alternatives (`ks_statistic`
    keys on the single largest CDF gap and goes blind to spread-only
    changes; `emd_1d` measures cost, not significance; energy
    distance is the drift metric that catches everything at the
    price of pairwise distances).

    The naive form is O(n·m) pairs. Over the value-ordered distinct-
    cent table it collapses to prefix algebra: Σᵢ|xᵢ−v| = v·n₍<v₎ −
    s₍<v₎ + s₍>v₎ − v·n₍>v₎ from ONE cumulative window over per-value
    counts and sums, so all three pair-sum terms are exact
    DECIMAL(38,0) integers from one sorted pass. The only floats are
    the three final divisions, `_r6`-bounded.

    Scale: the window runs on the distinct-cent table (bounded by
    price granularity, not event volume — the auc_roc disposition);
    the fact table contributes one combinable groupBy."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    cents = (dec_portable("value", 18, 2) * 100).cast("long")
    per_v = ev.groupBy(cents.alias("v")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("cx"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("cy"),
    )
    w_lt = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.partitionBy()
    t = per_v.select(
        "v",
        "cx",
        "cy",
        F.coalesce(F.sum("cx").over(w_lt), F.lit(0)).alias("nx_lt"),
        F.coalesce(F.sum(F.col("cx") * F.col("v")).over(w_lt), F.lit(0))
        .cast("decimal(38,0)")
        .alias("sx_lt"),
        F.sum("cx").over(w_tot).alias("nx"),
        F.sum(F.col("cx") * F.col("v"))
        .over(w_tot)
        .cast("decimal(38,0)")
        .alias("sx"),
        F.coalesce(F.sum("cy").over(w_lt), F.lit(0)).alias("ny_lt"),
        F.coalesce(F.sum(F.col("cy") * F.col("v")).over(w_lt), F.lit(0))
        .cast("decimal(38,0)")
        .alias("sy_lt"),
        F.sum("cy").over(w_tot).alias("ny"),
        F.sum(F.col("cy") * F.col("v"))
        .over(w_tot)
        .cast("decimal(38,0)")
        .alias("sy"),
    )
    vd = F.col("v").cast("decimal(38,0)")

    def absdist(n_lt, s_lt, n_tot, s_tot, c_eq):
        n_gt = F.col(n_tot) - F.col(n_lt) - c_eq
        s_gt = F.col(s_tot) - F.col(s_lt) - vd * c_eq
        return (
            vd * F.col(n_lt) - F.col(s_lt) + s_gt - vd * n_gt
        )

    x_term = absdist("nx_lt", "sx_lt", "nx", "sx", F.col("cx"))
    y_term = absdist("ny_lt", "sy_lt", "ny", "sy", F.col("cy"))
    agg = t.groupBy("nx", "ny").agg(
        F.sum(F.col("cy") * x_term).alias("s_xy"),
        F.sum(F.col("cx") * x_term).alias("s_xx"),
        F.sum(F.col("cy") * y_term).alias("s_yy"),
    )
    nxd, nyd = F.col("nx").cast("double"), F.col("ny").cast("double")
    e_xy = F.col("s_xy").cast("double") / (nxd * nyd)
    e_xx = F.col("s_xx").cast("double") / (nxd * nxd)
    e_yy = F.col("s_yy").cast("double") / (nyd * nyd)
    return agg.select(
        F.col("nx").cast("long").alias("n_x"),
        F.col("ny").cast("long").alias("n_y"),
        _r6(e_xy).alias("e_xy"),
        _r6(e_xx).alias("e_xx"),
        _r6(e_yy).alias("e_yy"),
        _r6(F.lit(2.0) * e_xy - e_xx - e_yy).alias("energy_dist_sq"),
    )


registry.register(
    "energy_distance",
    q_energy_distance,
    """
    WITH per_v AS (
      SELECT CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS cx,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS cy
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY 1
    ),
    t AS (
      SELECT v, cx, cy,
             COALESCE(SUM(cx) OVER wlt, 0) AS nx_lt,
             CAST(COALESCE(SUM(cx * v) OVER wlt, 0) AS HUGEINT) AS sx_lt,
             SUM(cx) OVER () AS nx,
             CAST(SUM(cx * v) OVER () AS HUGEINT) AS sx,
             COALESCE(SUM(cy) OVER wlt, 0) AS ny_lt,
             CAST(COALESCE(SUM(cy * v) OVER wlt, 0) AS HUGEINT) AS sy_lt,
             SUM(cy) OVER () AS ny,
             CAST(SUM(cy * v) OVER () AS HUGEINT) AS sy
      FROM per_v
      WINDOW wlt AS (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    terms AS (
      SELECT nx, ny, cx, cy,
             CAST(v AS HUGEINT) * nx_lt - sx_lt
             + (sx - sx_lt - CAST(v AS HUGEINT) * cx)
             - CAST(v AS HUGEINT) * (nx - nx_lt - cx) AS x_term,
             CAST(v AS HUGEINT) * ny_lt - sy_lt
             + (sy - sy_lt - CAST(v AS HUGEINT) * cy)
             - CAST(v AS HUGEINT) * (ny - ny_lt - cy) AS y_term
      FROM t
    ),
    agg AS (
      SELECT nx, ny,
             SUM(cy * x_term) AS s_xy,
             SUM(cx * x_term) AS s_xx,
             SUM(cy * y_term) AS s_yy
      FROM terms GROUP BY 1, 2
    )
    SELECT CAST(nx AS BIGINT) AS n_x, CAST(ny AS BIGINT) AS n_y,
           FLOOR(CAST(s_xy AS DOUBLE)
                 / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS e_xy,
           FLOOR(CAST(s_xx AS DOUBLE)
                 / (CAST(nx AS DOUBLE) * CAST(nx AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS e_xx,
           FLOOR(CAST(s_yy AS DOUBLE)
                 / (CAST(ny AS DOUBLE) * CAST(ny AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS e_yy,
           FLOOR((2.0 * CAST(s_xy AS DOUBLE)
                    / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))
                  - CAST(s_xx AS DOUBLE)
                    / (CAST(nx AS DOUBLE) * CAST(nx AS DOUBLE))
                  - CAST(s_yy AS DOUBLE)
                    / (CAST(ny AS DOUBLE) * CAST(ny AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0 AS energy_dist_sq
    FROM agg
    """,
)


# ---------------------------------------------------------------------------
# Two-factor OLS via exact normal equations (Cramer's rule)
# ---------------------------------------------------------------------------


def _det3(m: list[list[str]]) -> str:
    """Cofactor expansion of a 3×3 determinant over expression strings
    — ONE generator feeds both engines, so the arithmetic trees are
    identical by construction."""
    (a, b, c), (d, e, f), (g, h, i) = m
    return (
        f"({a}) * (({e}) * ({i}) - ({f}) * ({h}))"
        f" - ({b}) * (({d}) * ({i}) - ({f}) * ({g}))"
        f" + ({c}) * (({d}) * ({h}) - ({e}) * ({g}))"
    )


def _ols2_exprs() -> dict[str, str]:
    """Shared Cramer-rule expressions over the sufficient-statistic
    column names (all exact integers widened to DECIMAL/HUGEINT)."""
    rows = [["nn", "s1", "s2"], ["s1", "s11", "s12"], ["s2", "s12", "s22"]]
    rhs = ["sy", "s1y", "s2y"]
    out = {"det": _det3(rows)}
    for i in range(3):
        m = [row[:] for row in rows]
        for r in range(3):
            m[r][i] = rhs[r]
        out[f"det{i}"] = _det3(m)
    return out


def q_ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-regressor OLS of daily order revenue on (day index, weekend
    flag) — `regression_suite`'s multivariate upgrade: a univariate
    trend on revenue with a weekly cycle CONFOUNDS slope with weekday
    mix; the second regressor absorbs the weekend effect so the trend
    coefficient is clean (the textbook omitted-variable fix, done as
    pure SQL algebra instead of a solver).

    β = (X'X)⁻¹X'y solved by Cramer's rule: all ten sufficient
    statistics are EXACT integer/decimal sums (one map-combinable
    pass), every 3×3 determinant is exact DECIMAL(38,0) arithmetic
    generated from ONE shared expression builder, and the only floats
    are the three coefficient divisions and the R² — identical IEEE
    trees on both engines, `_r6`-bounded.

    Scale: one fact-table pass, ten combinable aggregates, one-row
    output — the distributed-OLS shape (sufficient stats shrink to a
    vector; the solve is O(1) regardless of row count)."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    )
    daily = orders.groupBy(day.alias("d")).agg(
        F.expr(
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) * 100"
            " AS BIGINT)"
        ).alias("y")
    )
    dmin = daily.agg(F.min("d").alias("dmin"))
    base = daily.crossJoin(F.broadcast(dmin)).select(
        (F.col("d") - F.col("dmin")).alias("x1"),
        F.when(F.col("d") % 7 == 2, 1)
        .when(F.col("d") % 7 == 3, 1)
        .otherwise(0)
        .alias("x2"),
        "y",
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    stats = base.agg(
        dec(F.count("*")).alias("nn"),
        dec(F.sum("x1")).alias("s1"),
        dec(F.sum("x2")).alias("s2"),
        dec(F.sum("y")).alias("sy"),
        dec(F.sum(F.col("x1") * F.col("x1"))).alias("s11"),
        dec(F.sum(F.col("x1") * F.col("x2"))).alias("s12"),
        dec(F.sum(F.col("x2") * F.col("x2"))).alias("s22"),
        dec(F.sum(F.col("x1") * F.col("y"))).alias("s1y"),
        dec(F.sum(F.col("x2") * F.col("y"))).alias("s2y"),
        dec(
            F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        ).alias("syy"),
    )
    e = _ols2_exprs()
    solved = stats.select(
        "*",
        F.expr(f"CAST({e['det']} AS DOUBLE)").alias("det"),
        F.expr(f"CAST({e['det0']} AS DOUBLE)").alias("det0"),
        F.expr(f"CAST({e['det1']} AS DOUBLE)").alias("det1"),
        F.expr(f"CAST({e['det2']} AS DOUBLE)").alias("det2"),
    )
    b0 = F.col("det0") / F.col("det")
    b1 = F.col("det1") / F.col("det")
    b2 = F.col("det2") / F.col("det")
    nd = F.col("nn").cast("double")
    syd, s1yd, s2yd = (
        F.col("sy").cast("double"),
        F.col("s1y").cast("double"),
        F.col("s2y").cast("double"),
    )
    sse = F.col("syy").cast("double") - b0 * syd - b1 * s1yd - b2 * s2yd
    sst = F.col("syy").cast("double") - syd * syd / nd
    return solved.select(
        F.col("nn").cast("long").alias("n_days"),
        _r6(b0).alias("intercept_cents"),
        _r6(b1).alias("trend_cents_per_day"),
        _r6(b2).alias("weekend_effect_cents"),
        _r6(F.lit(1.0) - sse / sst).alias("r_squared"),
    )


def _ols2_sql() -> str:
    e = _ols2_exprs()
    return f"""
    WITH daily AS (
      SELECT datediff('day', DATE '1970-01-01',
                      CAST(o_orderdate AS DATE)) AS d,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    base AS (
      SELECT d - (SELECT MIN(d) FROM daily) AS x1,
             CASE WHEN d % 7 IN (2, 3) THEN 1 ELSE 0 END AS x2, y
      FROM daily
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS nn,
             CAST(SUM(x1) AS HUGEINT) AS s1,
             CAST(SUM(x2) AS HUGEINT) AS s2,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x1 * x1) AS HUGEINT) AS s11,
             CAST(SUM(x1 * x2) AS HUGEINT) AS s12,
             CAST(SUM(x2 * x2) AS HUGEINT) AS s22,
             CAST(SUM(x1 * y) AS HUGEINT) AS s1y,
             CAST(SUM(x2 * y) AS HUGEINT) AS s2y,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM base
    ),
    solved AS (
      SELECT *,
             CAST({e["det"]} AS DOUBLE) AS det,
             CAST({e["det0"]} AS DOUBLE) AS det0,
             CAST({e["det1"]} AS DOUBLE) AS det1,
             CAST({e["det2"]} AS DOUBLE) AS det2
      FROM stats
    )
    SELECT CAST(nn AS BIGINT) AS n_days,
           FLOOR(det0 / det * 1000000.0 + 0.5) / 1000000.0
             AS intercept_cents,
           FLOOR(det1 / det * 1000000.0 + 0.5) / 1000000.0
             AS trend_cents_per_day,
           FLOOR(det2 / det * 1000000.0 + 0.5) / 1000000.0
             AS weekend_effect_cents,
           FLOOR((1.0 - (CAST(syy AS DOUBLE) - (det0 / det)
                           * CAST(sy AS DOUBLE)
                         - (det1 / det) * CAST(s1y AS DOUBLE)
                         - (det2 / det) * CAST(s2y AS DOUBLE))
                        / (CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                             / CAST(nn AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0 AS r_squared
    FROM solved
    """


registry.register("ols_two_factor", q_ols_two_factor, _ols2_sql())


# ---------------------------------------------------------------------------
# Post-stratification adjustment of an A/B conversion delta
# ---------------------------------------------------------------------------


def q_post_stratification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified A/B effect estimate: the raw conversion delta
    between the md5-coin arms, re-estimated as Σ_s w_s·(p_As − p_Bs)
    with population weights over the user's signup weekday stratum —
    the free variance cut when randomization left covariate imbalance
    (`cuped_adjustment` needs a pre-period metric; post-stratification
    needs only a categorical covariate, so it applies on day one).

    Exactness: all cells are exact counts; each stratum term
    w_s·(p_As − p_Bs) is a fixed expression on exact integers,
    quantized to 1e-12 BEFORE the cross-stratum sum (7 strata) — the
    adjusted delta is then exact integer arithmetic. `_r6`-bounded.

    Scale: one user-grain rollup, a 7-row stratum table — the fact
    table never re-shuffles."""
    from airflow_baseball_spark.operators.sampling import hash_unit

    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    per_user = ev.groupBy("user_id").agg(
        F.min(day).alias("d_first"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    arm = F.when(
        hash_unit(F.col("user_id"), seed="ab") < 0.5, "A"
    ).otherwise("B")
    cells = per_user.select(
        (F.col("d_first") % 7).alias("stratum"), arm.alias("arm"),
        "converted",
    ).groupBy("stratum").agg(
        F.count(F.when(F.col("arm") == "A", 1)).alias("n_a"),
        F.count(F.when(F.col("arm") == "B", 1)).alias("n_b"),
        F.sum(
            F.when(F.col("arm") == "A", F.col("converted")).otherwise(0)
        ).alias("c_a"),
        F.sum(
            F.when(F.col("arm") == "B", F.col("converted")).otherwise(0)
        ).alias("c_b"),
    )
    wn = Window.partitionBy()
    t = cells.withColumn(
        "n_tot", F.sum(F.col("n_a") + F.col("n_b")).over(wn)
    )
    # a stratum missing either arm has no within-stratum contrast;
    # it contributes 0 (observed at sf0.1: the first-event weekday
    # strata are heavily skewed and one tiny stratum had no B users —
    # under ANSI mode the unguarded division aborts the whole job)
    term = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        (
            (F.col("n_a") + F.col("n_b")).cast("double")
            / F.col("n_tot").cast("double")
        )
        * (
            F.col("c_a").cast("double") / F.col("n_a").cast("double")
            - F.col("c_b").cast("double") / F.col("n_b").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    quant = t.withColumn(
        "term_pico",
        F.floor(term * F.lit(1.0e12) + F.lit(0.5)).cast("long"),
    )
    agg = quant.groupBy().agg(
        F.sum("n_a").alias("n_a"),
        F.sum("n_b").alias("n_b"),
        F.sum("c_a").alias("c_a"),
        F.sum("c_b").alias("c_b"),
        F.sum("term_pico").alias("s_pico"),
    )
    raw = F.col("c_a").cast("double") / F.col("n_a").cast(
        "double"
    ) - F.col("c_b").cast("double") / F.col("n_b").cast("double")
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("c_a").cast("long").alias("c_a"),
        F.col("c_b").cast("long").alias("c_b"),
        _r6(raw).alias("raw_delta"),
        _r6(F.col("s_pico").cast("double") / F.lit(1.0e12)).alias(
            "post_strat_delta"
        ),
    )


def _post_strat_sql() -> str:
    from airflow_baseball_spark.operators.sampling import hash_unit_sql

    u = hash_unit_sql("user_id", "ab")
    return f"""
    WITH per_user AS (
      SELECT user_id,
             MIN(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)))
               AS d_first,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY 1
    ),
    cells AS (
      SELECT d_first % 7 AS stratum,
             COUNT(CASE WHEN {u} < 0.5 THEN 1 END) AS n_a,
             COUNT(CASE WHEN {u} >= 0.5 THEN 1 END) AS n_b,
             SUM(CASE WHEN {u} < 0.5 THEN converted ELSE 0 END) AS c_a,
             SUM(CASE WHEN {u} >= 0.5 THEN converted ELSE 0 END) AS c_b
      FROM per_user GROUP BY 1
    ),
    t AS (
      SELECT *, SUM(n_a + n_b) OVER () AS n_tot FROM cells
    ),
    quant AS (
      SELECT *,
             CAST(FLOOR(CASE WHEN n_a > 0 AND n_b > 0 THEN
                          (CAST(n_a + n_b AS DOUBLE)
                           / CAST(n_tot AS DOUBLE))
                          * (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                             - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                        ELSE 0.0 END
                        * 1.0e12 + 0.5) AS BIGINT) AS term_pico
      FROM t
    ),
    agg AS (
      SELECT SUM(n_a) AS n_a, SUM(n_b) AS n_b, SUM(c_a) AS c_a,
             SUM(c_b) AS c_b, SUM(term_pico) AS s_pico
      FROM quant
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
           FLOOR((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                  - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS raw_delta,
           FLOOR(CAST(s_pico AS DOUBLE) / 1.0e12 * 1000000.0 + 0.5)
             / 1000000.0 AS post_strat_delta
    FROM agg
    """


registry.register(
    "post_stratification", q_post_stratification, _post_strat_sql()
)


# ---------------------------------------------------------------------------
# Sample-size calculator for a continuous metric
# ---------------------------------------------------------------------------


def q_sample_size_continuous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type sample-size calculator for a CONTINUOUS metric
    (event value): users per arm needed to detect a 2 % lift in mean
    value at α=0.05 / power 0.8 — `mde_power` inverted and extended
    to continuous metrics, where the variance comes from the data
    instead of p(1−p): n = 2·(z·σ/δ)², the pre-experiment sizing
    every A/B platform runs before committing traffic.

    Exactness: σ² comes from exact integer sufficient statistics
    (n, Σ, Σ² in DECIMAL); δ = 2 % of the exact mean; the z-sum is
    the `_MDE_Z` literal; n rounds UP via exact ceil on the one final
    double. Scale: one combinable pass, |types|-row output."""
    ev = load_table(spark, sf_dir, "events")
    cents = (dec_portable("value", 18, 2) * 100).cast("long")
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("s"),
        F.sum(cents.cast("decimal(38,0)") * cents).alias("q"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    var = (
        F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / nd
    ) / (nd - F.lit(1.0))
    delta = F.lit(0.02) * mean
    n_req = F.ceil(
        F.lit(2.0) * (F.lit(_MDE_Z) * F.lit(_MDE_Z)) * var
        / (delta * delta)
    )
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        _r6(mean).alias("mean_cents"),
        _r6(F.sqrt(var)).alias("sd_cents"),
        n_req.cast("long").alias("n_per_arm"),
    )


registry.register(
    "sample_size_continuous",
    q_sample_size_continuous,
    f"""
    WITH g AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s,
             SUM(CAST(CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT)
                      AS HUGEINT)
                 * CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS q
      FROM events GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_events,
           FLOOR(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS mean_cents,
           FLOOR(sqrt((CAST(q AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                         / CAST(n AS DOUBLE))
                      / (CAST(n AS DOUBLE) - 1.0))
                 * 1000000.0 + 0.5) / 1000000.0 AS sd_cents,
           CAST(CEIL(2.0 * ({_MDE_Z!r} * {_MDE_Z!r})
                     * ((CAST(q AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                           / CAST(n AS DOUBLE))
                        / (CAST(n AS DOUBLE) - 1.0))
                     / ((0.02 * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                        * (0.02 * (CAST(s AS DOUBLE)
                                   / CAST(n AS DOUBLE)))))
                AS BIGINT) AS n_per_arm
    FROM g
    """,
)


# ---------------------------------------------------------------------------
# Quantile normalization (rank-to-reference mapping)
# ---------------------------------------------------------------------------


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize click values onto the purchase value
    distribution: for each of 20 rank ventiles, the click ventile
    value and the purchase value at the SAME rank depth — the
    rank-preserving re-mapping feature pipelines use to make two
    sources comparable when their marginals drift but their orderings
    mean the same thing (`qq_table`'s plot, made actionable as a
    lookup table).

    Exactness: both ventile values are rank-rule picks (the value at
    row ⌈q·n/20⌉ in sorted order — no interpolation, no floats except
    the final shift ratio), so every output is an exact integer cent
    or one division.

    r7: the 20 rank picks per class come from the grouped two-pass
    histogram (rank_select.rank_pick) — the previous per-class rank
    window sorted each class's raw events through ONE partition, the
    exact qq_table flag from the r6 verdict."""
    from airflow_baseball_spark.operators.rank_select import rank_pick

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    cents = (dec_portable("value", 18, 2) * 100).cast("long")
    vals = ev.select(F.col("event_type").alias("cls"), cents.alias("x"))
    picked = rank_pick(
        vals.select("cls", F.col("x").alias("v")),
        "v",
        [
            (str(q), lambda n, q=q: F.expr(f"CAST(({q} * n + 19) DIV 20 AS BIGINT)"))
            for q in range(1, 21)
        ],
        group_cols=["cls"],
    )
    picks = (
        picked.withColumn("q", F.col("rank_label").cast("int"))
        .groupBy("q")
        .agg(
            F.max(F.when(F.col("cls") == "click", F.col("v"))).alias(
                "click_cents"
            ),
            F.max(
                F.when(F.col("cls") == "purchase", F.col("v"))
            ).alias("purchase_cents"),
        )
    )
    return picks.select(
        F.col("q").cast("long").alias("ventile"),
        "click_cents",
        "purchase_cents",
        _r6(
            F.when(
                F.col("click_cents") > 0,
                F.col("purchase_cents").cast("double")
                / F.col("click_cents").cast("double"),
            ).otherwise(F.lit(0.0))
        ).alias("map_ratio"),
    )


registry.register(
    "quantile_normalize",
    q_quantile_normalize,
    """
    WITH vals AS (
      SELECT event_type AS cls,
             CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    ranked AS (
      SELECT cls, x,
             ROW_NUMBER() OVER (PARTITION BY cls ORDER BY x) AS rn,
             COUNT(*) OVER (PARTITION BY cls) AS n
      FROM vals
    ),
    ventiles AS (SELECT UNNEST(range(1, 21)) AS q),
    picks AS (
      SELECT q,
             MAX(CASE WHEN cls = 'click' THEN x END) AS click_cents,
             MAX(CASE WHEN cls = 'purchase' THEN x END) AS purchase_cents
      FROM ventiles v JOIN ranked r
        ON r.rn = CAST((v.q * r.n + 19) // 20 AS BIGINT)
      GROUP BY 1
    )
    SELECT CAST(q AS BIGINT) AS ventile, click_cents, purchase_cents,
           FLOOR(CASE WHEN click_cents > 0 THEN
                   CAST(purchase_cents AS DOUBLE)
                   / CAST(click_cents AS DOUBLE)
                 ELSE 0.0 END * 1000000.0 + 0.5)
             / 1000000.0 AS map_ratio
    FROM picks
    """,
)


# ---------------------------------------------------------------------------
# Lincoln-Petersen capture-recapture population estimate
# ---------------------------------------------------------------------------


def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lincoln-Petersen (Chapman-corrected) capture-recapture estimate
    of the total user population from two independent "sightings" —
    users who ever clicked vs users who ever viewed: N̂ = (n₁+1)(n₂+1)
    /(m+1) − 1 with m = users in both — the ecology estimator data
    teams reuse to size a population only partially observed by each
    channel (`chao1_richness` asks the same question of one sample's
    frequency tail; capture-recapture asks it of two overlapping
    samples).

    Exactness: all three set sizes are exact distinct counts from one
    pass (conditional aggregation, no joins); the Chapman estimate
    and its variance are single integer-derived expressions,
    `_r6`-bounded.

    Scale: one user-grain rollup, one-row output."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            (F.col("event_type") == "click").cast("int")
        ).alias("s1"),
        F.max(
            (F.col("event_type") == "view").cast("int")
        ).alias("s2"),
    )
    agg = per_user.agg(
        F.sum("s1").alias("n1"),
        F.sum("s2").alias("n2"),
        F.sum(F.col("s1") * F.col("s2")).alias("m"),
        F.count("*").alias("n_observed"),
    )
    n1 = (F.col("n1") + 1).cast("double")
    n2 = (F.col("n2") + 1).cast("double")
    m1 = (F.col("m") + 1).cast("double")
    chapman = n1 * n2 / m1 - F.lit(1.0)
    var = (
        n1
        * n2
        * (n1 - F.col("m").cast("double") - 1)
        * (n2 - F.col("m").cast("double") - 1)
        / (m1 * m1 * (m1 + 1))
    )
    return agg.select(
        F.col("n1").cast("long").alias("n_click_users"),
        F.col("n2").cast("long").alias("n_view_users"),
        F.col("m").cast("long").alias("n_both"),
        F.col("n_observed").cast("long").alias("n_observed"),
        _r6(chapman).alias("chapman_estimate"),
        _r6(F.sqrt(var)).alias("chapman_se"),
    )


registry.register(
    "capture_recapture",
    q_capture_recapture,
    """
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS s1,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s2
      FROM events GROUP BY 1
    ),
    agg AS (
      SELECT SUM(s1) AS n1, SUM(s2) AS n2, SUM(s1 * s2) AS m,
             COUNT(*) AS n_observed
      FROM per_user
    )
    SELECT CAST(n1 AS BIGINT) AS n_click_users,
           CAST(n2 AS BIGINT) AS n_view_users,
           CAST(m AS BIGINT) AS n_both,
           CAST(n_observed AS BIGINT) AS n_observed,
           FLOOR((CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
                  / CAST(m + 1 AS DOUBLE) - 1.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS chapman_estimate,
           FLOOR(sqrt(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
                      * (CAST(n1 + 1 AS DOUBLE) - CAST(m AS DOUBLE) - 1)
                      * (CAST(n2 + 1 AS DOUBLE) - CAST(m AS DOUBLE) - 1)
                      / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE)
                         * (CAST(m + 1 AS DOUBLE) + 1)))
                 * 1000000.0 + 0.5) / 1000000.0 AS chapman_se
    FROM agg
    """,
)


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on the daily up/down sequence
# ---------------------------------------------------------------------------


def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on daily revenue's up/down sequence:
    is the day-over-day direction random, or does it streak
    (momentum) / alternate (mean-reversion)? Complements `trend_test`
    (monotone drift) and `autocorr` (linear memory) with the
    distribution-free randomness check — too FEW runs = streaky, too
    MANY = oscillating.

    Exactness: signs are exact integer comparisons; the run count is
    one window pass counting sign changes; E[R] = 2n₊n₋/n + 1 and
    Var[R] are single expressions on three exact integers; z is the
    final division. Ties (flat days) are dropped (documented rule).

    Scale: one day-grain rollup, one ordered window, one-row output."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) * 100"
            " AS BIGINT)"
        ).alias("y")
    )
    w = Window.orderBy("d")
    signed = (
        daily.withColumn("prev_y", F.lag("y").over(w))
        .filter(F.col("prev_y").isNotNull() & (F.col("y") != F.col("prev_y")))
        .select(
            "d", (F.col("y") > F.col("prev_y")).cast("int").alias("s")
        )
    )
    w2 = Window.orderBy("d")
    runs = signed.select(
        "s",
        F.when(
            F.lag("s").over(w2).isNull()
            | (F.lag("s").over(w2) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("s").alias("n_up"),
        F.sum(F.lit(1) - F.col("s")).alias("n_down"),
        F.sum("new_run").alias("n_runs"),
    )
    nu = F.col("n_up").cast("double")
    nd = F.col("n_down").cast("double")
    nn = nu + nd
    e_r = F.lit(2.0) * nu * nd / nn + F.lit(1.0)
    var_r = (
        F.lit(2.0)
        * nu
        * nd
        * (F.lit(2.0) * nu * nd - nn)
        / (nn * nn * (nn - F.lit(1.0)))
    )
    return agg.select(
        F.col("n_up").cast("long").alias("n_up"),
        F.col("n_down").cast("long").alias("n_down"),
        F.col("n_runs").cast("long").alias("n_runs"),
        _r6(e_r).alias("expected_runs"),
        _r6(
            (F.col("n_runs").cast("double") - e_r) / F.sqrt(var_r)
        ).alias("z_stat"),
    )


registry.register(
    "runs_test",
    q_runs_test,
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    signed AS (
      SELECT d, CASE WHEN y > prev_y THEN 1 ELSE 0 END AS s
      FROM (
        SELECT d, y, LAG(y) OVER (ORDER BY d) AS prev_y FROM daily
      ) WHERE prev_y IS NOT NULL AND y <> prev_y
    ),
    runs AS (
      SELECT s,
             CASE WHEN LAG(s) OVER (ORDER BY d) IS NULL
                    OR LAG(s) OVER (ORDER BY d) <> s
                  THEN 1 ELSE 0 END AS new_run
      FROM signed
    ),
    agg AS (
      SELECT SUM(s) AS n_up, SUM(1 - s) AS n_down,
             SUM(new_run) AS n_runs
      FROM runs
    )
    SELECT CAST(n_up AS BIGINT) AS n_up,
           CAST(n_down AS BIGINT) AS n_down,
           CAST(n_runs AS BIGINT) AS n_runs,
           FLOOR((2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                  / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                  + 1.0) * 1000000.0 + 0.5) / 1000000.0
             AS expected_runs,
           FLOOR((CAST(n_runs AS DOUBLE)
                  - (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                     / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                     + 1.0))
                 / sqrt(2.0 * CAST(n_up AS DOUBLE)
                        * CAST(n_down AS DOUBLE)
                        * (2.0 * CAST(n_up AS DOUBLE)
                           * CAST(n_down AS DOUBLE)
                           - (CAST(n_up AS DOUBLE)
                              + CAST(n_down AS DOUBLE)))
                        / ((CAST(n_up AS DOUBLE)
                            + CAST(n_down AS DOUBLE))
                           * (CAST(n_up AS DOUBLE)
                              + CAST(n_down AS DOUBLE))
                           * (CAST(n_up AS DOUBLE)
                              + CAST(n_down AS DOUBLE) - 1.0)))
                 * 1000000.0 + 0.5) / 1000000.0 AS z_stat
    FROM agg
    """,
)


# ---------------------------------------------------------------------------
# Tukey HSD post-hoc pairwise comparison (after anova_f)
# ---------------------------------------------------------------------------

# studentized-range critical value q(0.05; k=7, df=inf) — literature
# constant embedded once (the _MDE_Z discipline)
_TUKEY_Q_7_INF = 4.17


def q_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD post-hoc on the weekday revenue design: after
    `anova_f` says "SOME weekday differs", every weekday PAIR is
    tested against the single honest-simultaneous threshold
    HSD = q·√(MSW/n̄) — the multiple-comparisons discipline that stops
    the 21 pairwise t-tests from manufacturing false positives.

    Exactness: group means come from exact integer-cent sums; MSW is
    assembled from exact sufficient statistics with the k-term double
    reduction as an ORDERED cumulative window (the levene_bf recipe);
    the pair grid is k² rows of pure expression arithmetic against a
    literal critical value. `_r6`-bounded.

    Scale: one fact pass to 7 group rows; the pair grid is k²."""
    ev = load_table(spark, sf_dir, "events")
    epoch_day = F.datediff(
        F.to_date("ts"), F.to_date(F.lit("1970-01-01"))
    )
    cents = (dec_portable("value", 18, 2) * 100).cast("long")
    daily = ev.groupBy(epoch_day.alias("d")).agg(
        F.sum(cents).alias("v")
    )
    g = daily.groupBy((F.col("d") % 7).alias("dow")).agg(
        F.count("*").alias("ng"),
        F.sum("v").alias("sg"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("qg"),
    )
    wall = Window.partitionBy()
    wcum = Window.orderBy("dow").rowsBetween(Window.unboundedPreceding, 0)
    ssw_term = F.col("qg").cast("double") - F.col("sg").cast(
        "double"
    ) * F.col("sg").cast("double") / F.col("ng").cast("double")
    t = (
        g.withColumn("n", F.sum("ng").over(wall))
        .withColumn("k", F.count("*").over(wall))
        .withColumn("ssw_cum", F.sum(ssw_term).over(wcum))
        .withColumn("pos", F.row_number().over(Window.orderBy("dow")))
    )
    msw_row = t.filter(F.col("pos") == F.col("k")).select(
        (
            F.col("ssw_cum")
            / (F.col("n").cast("double") - F.col("k").cast("double"))
        ).alias("msw"),
        (F.col("n").cast("double") / F.col("k").cast("double")).alias(
            "nbar"
        ),
    )
    means = g.select(
        "dow",
        "ng",
        (F.col("sg").cast("double") / F.col("ng").cast("double")).alias(
            "mean_v"
        ),
    )
    a = means.select(
        F.col("dow").alias("dow_a"),
        F.col("mean_v").alias("mean_a"),
    )
    b = means.select(
        F.col("dow").alias("dow_b"),
        F.col("mean_v").alias("mean_b"),
    )
    pairs = a.join(b, F.col("dow_a") < F.col("dow_b")).crossJoin(
        F.broadcast(msw_row)
    )
    hsd = F.lit(_TUKEY_Q_7_INF) * F.sqrt(F.col("msw") / F.col("nbar"))
    diff = F.abs(F.col("mean_a") - F.col("mean_b"))
    return pairs.select(
        "dow_a",
        "dow_b",
        _r6(F.col("mean_a")).alias("mean_a"),
        _r6(F.col("mean_b")).alias("mean_b"),
        _r6(diff).alias("abs_diff"),
        _r6(hsd).alias("hsd_threshold"),
        (diff > hsd).alias("significant"),
    )


registry.register(
    "tukey_hsd",
    q_tukey_hsd,
    f"""
    WITH daily AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             SUM(CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
      FROM events GROUP BY 1
    ),
    g AS (
      SELECT d % 7 AS dow, COUNT(*) AS ng, SUM(v) AS sg,
             SUM(CAST(v AS HUGEINT) * v) AS qg
      FROM daily GROUP BY 1
    ),
    t AS (
      SELECT dow, ng, sg, qg,
             SUM(ng) OVER () AS n, COUNT(*) OVER () AS k,
             SUM(CAST(qg AS DOUBLE)
                 - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                   / CAST(ng AS DOUBLE))
               OVER (ORDER BY dow ROWS UNBOUNDED PRECEDING) AS ssw_cum,
             ROW_NUMBER() OVER (ORDER BY dow) AS pos
      FROM g
    ),
    msw_row AS (
      SELECT ssw_cum / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS msw,
             CAST(n AS DOUBLE) / CAST(k AS DOUBLE) AS nbar
      FROM t WHERE pos = k
    ),
    means AS (
      SELECT dow, CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) AS mean_v
      FROM g
    )
    SELECT a.dow AS dow_a, b.dow AS dow_b,
           FLOOR(a.mean_v * 1000000.0 + 0.5) / 1000000.0 AS mean_a,
           FLOOR(b.mean_v * 1000000.0 + 0.5) / 1000000.0 AS mean_b,
           FLOOR(ABS(a.mean_v - b.mean_v) * 1000000.0 + 0.5)
             / 1000000.0 AS abs_diff,
           FLOOR({_TUKEY_Q_7_INF!r} * sqrt(m.msw / m.nbar)
                 * 1000000.0 + 0.5) / 1000000.0 AS hsd_threshold,
           ABS(a.mean_v - b.mean_v)
             > {_TUKEY_Q_7_INF!r} * sqrt(m.msw / m.nbar) AS significant
    FROM means a
    JOIN means b ON a.dow < b.dow
    CROSS JOIN msw_row m
    """,
)


# ---------------------------------------------------------------------------
# Friedman rank test (blocked nonparametric k-sample)
# ---------------------------------------------------------------------------


def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test of the weekday effect with WEEKS as blocks:
    within each complete week, rank the 7 daily revenues, then test
    whether the per-weekday rank sums could be uniform —
    `anova_f`'s nonparametric sibling for when revenue's heavy tail
    makes the normal-theory F suspect, with the week-blocking
    removing the level drift `mann_whitney_u` would confound.

    χ²_F = 12/(n·k(k+1)) · Σ_j R_j² − 3n(k+1), over complete blocks
    only (documented rule). Mid-rank ties are exact .5 rationals, so
    2·rank is an exact integer — rank sums are carried DOUBLED in
    BIGINTs and the statistic is assembled from exact integers, one
    shared expression, `_r6`-bounded.

    Scale: rank window per week (calendar-bounded blocks), one
    combinable rollup to 7 rank-sum rows."""
    ev = load_table(spark, sf_dir, "events")
    epoch_day = F.datediff(
        F.to_date("ts"), F.to_date(F.lit("1970-01-01"))
    )
    cents = (dec_portable("value", 18, 2) * 100).cast("long")
    daily = ev.groupBy(epoch_day.alias("d")).agg(
        F.sum(cents).alias("v")
    )
    blocked = daily.select(
        F.expr("(d - 4) DIV 7").alias("wk"),
        (F.col("d") % 7).alias("dow"),
        "v",
    )
    wfull = Window.partitionBy("wk")
    complete = blocked.withColumn(
        "n_days", F.count("*").over(wfull)
    ).filter(F.col("n_days") == 7)
    # doubled mid-rank: 2r = rank() + (rank of last tie) =
    # 2*rank + (ties-1); use rank() and count of equal values
    wr = Window.partitionBy("wk").orderBy("v")
    weq = Window.partitionBy("wk", "v")
    ranked = complete.select(
        "wk",
        "dow",
        (
            F.lit(2) * F.rank().over(wr)
            + F.count("*").over(weq)
            - F.lit(1)
        ).alias("r2"),
    )
    sums = ranked.groupBy("dow").agg(
        F.sum("r2").alias("r2_sum"), F.count("*").alias("n_blocks")
    )
    wall = Window.partitionBy()
    t = sums.withColumn("nb", F.max("n_blocks").over(wall))
    # chi2_F = 12/(n k (k+1)) * sum(Rj^2) - 3 n (k+1), with Rj = r2_sum/2
    k = 7
    rj = F.col("r2_sum").cast("double") / F.lit(2.0)
    agg = t.groupBy("nb").agg(
        F.sum(
            F.floor(rj * rj + F.lit(0.5)).cast("long")
        ).alias("sum_rj2_q")
    )
    nbd = F.col("nb").cast("double")
    chi2 = (
        F.lit(12.0)
        / (nbd * F.lit(float(k)) * F.lit(float(k + 1)))
        * F.col("sum_rj2_q").cast("double")
        - F.lit(3.0) * nbd * F.lit(float(k + 1))
    )
    return agg.select(
        F.col("nb").cast("long").alias("n_blocks"),
        F.lit(k).cast("long").alias("k_treatments"),
        _r6(chi2).alias("friedman_chi2"),
        (chi2 > F.lit(12.591587243743977)).alias("significant"),
    )


registry.register(
    "friedman_test",
    q_friedman_test,
    """
    WITH daily AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             SUM(CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
      FROM events GROUP BY 1
    ),
    blocked AS (
      SELECT (d - 4) // 7 AS wk, d % 7 AS dow, v FROM daily
    ),
    complete AS (
      SELECT * FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY wk) AS n_days
        FROM blocked
      ) WHERE n_days = 7
    ),
    ranked AS (
      SELECT wk, dow,
             2 * RANK() OVER (PARTITION BY wk ORDER BY v)
             + COUNT(*) OVER (PARTITION BY wk, v) - 1 AS r2
      FROM complete
    ),
    sums AS (
      SELECT dow, SUM(r2) AS r2_sum, COUNT(*) AS n_blocks
      FROM ranked GROUP BY 1
    ),
    t AS (SELECT *, MAX(n_blocks) OVER () AS nb FROM sums),
    agg AS (
      SELECT nb,
             SUM(CAST(FLOOR((CAST(r2_sum AS DOUBLE) / 2.0)
                            * (CAST(r2_sum AS DOUBLE) / 2.0) + 0.5)
                      AS BIGINT)) AS sum_rj2_q
      FROM t GROUP BY 1
    )
    SELECT CAST(nb AS BIGINT) AS n_blocks,
           CAST(7 AS BIGINT) AS k_treatments,
           FLOOR((12.0 / (CAST(nb AS DOUBLE) * 7.0 * 8.0)
                  * CAST(sum_rj2_q AS DOUBLE)
                  - 3.0 * CAST(nb AS DOUBLE) * 8.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS friedman_chi2,
           (12.0 / (CAST(nb AS DOUBLE) * 7.0 * 8.0)
            * CAST(sum_rj2_q AS DOUBLE)
            - 3.0 * CAST(nb AS DOUBLE) * 8.0)
             > 12.591587243743977 AS significant
    FROM agg
    """,
)


# ---------------------------------------------------------------------------
# Cohen's d effect size per segment
# ---------------------------------------------------------------------------


def q_cohens_d_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d of the md5-coin A/B split on event value, per
    event-type segment — the standardized effect size that makes
    segments with different value scales COMPARABLE (`welch_ttest`
    answers "is it real", d answers "is it big"; reporting both is
    the house style of every experiment readout).

    d = (x̄_A − x̄_B)/s_pooled with the pooled SD from exact integer
    sufficient statistics per (segment, arm); the whole statistic is
    one shared expression over six exact integers per segment,
    `_r6`-bounded, with degenerate cells (either arm < 2 rows)
    reported as NULL rather than divided through.

    Scale: one combinable pass to |segments|×2 cells."""
    from airflow_baseball_spark.operators.sampling import hash_unit

    ev = load_table(spark, sf_dir, "events")
    cents = (dec_portable("value", 18, 2) * 100).cast("long")
    arm_a = hash_unit(F.col("user_id"), seed="ab") < 0.5
    g = ev.groupBy("event_type").agg(
        F.count(F.when(arm_a, 1)).alias("na"),
        F.sum(F.when(arm_a, cents).otherwise(0)).alias("sa"),
        F.sum(
            F.when(arm_a, cents.cast("decimal(38,0)") * cents).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("qa"),
        F.count(F.when(~arm_a, 1)).alias("nb"),
        F.sum(F.when(~arm_a, cents).otherwise(0)).alias("sb"),
        F.sum(
            F.when(
                ~arm_a, cents.cast("decimal(38,0)") * cents
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("qb"),
    )
    nad, nbd = F.col("na").cast("double"), F.col("nb").cast("double")
    sad, sbd = F.col("sa").cast("double"), F.col("sb").cast("double")
    ssa = F.col("qa").cast("double") - sad * sad / nad
    ssb = F.col("qb").cast("double") - sbd * sbd / nbd
    s_pool = F.sqrt((ssa + ssb) / (nad + nbd - F.lit(2.0)))
    d = F.when(
        (F.col("na") >= 2) & (F.col("nb") >= 2),
        (sad / nad - sbd / nbd) / s_pool,
    )
    return g.select(
        "event_type",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        _r6(sad / nad).alias("mean_a_cents"),
        _r6(sbd / nbd).alias("mean_b_cents"),
        _r6(d).alias("cohens_d"),
    )


def _cohens_d_sql() -> str:
    from airflow_baseball_spark.operators.sampling import hash_unit_sql

    u = hash_unit_sql("user_id", "ab")
    return f"""
    WITH g AS (
      SELECT event_type,
             COUNT(CASE WHEN {u} < 0.5 THEN 1 END) AS na,
             SUM(CASE WHEN {u} < 0.5
                 THEN CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT)
                 ELSE 0 END) AS sa,
             SUM(CASE WHEN {u} < 0.5
                 THEN CAST(CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100
                                AS BIGINT) AS HUGEINT)
                      * CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100
                             AS BIGINT)
                 ELSE 0 END) AS qa,
             COUNT(CASE WHEN {u} >= 0.5 THEN 1 END) AS nb,
             SUM(CASE WHEN {u} >= 0.5
                 THEN CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT)
                 ELSE 0 END) AS sb,
             SUM(CASE WHEN {u} >= 0.5
                 THEN CAST(CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100
                                AS BIGINT) AS HUGEINT)
                      * CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100
                             AS BIGINT)
                 ELSE 0 END) AS qb
      FROM events GROUP BY 1
    )
    SELECT event_type,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           FLOOR(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS mean_a_cents,
           FLOOR(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS mean_b_cents,
           FLOOR(CASE WHEN na >= 2 AND nb >= 2 THEN
                   (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                    - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
                   / sqrt(((CAST(qa AS DOUBLE)
                            - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                              / CAST(na AS DOUBLE))
                           + (CAST(qb AS DOUBLE)
                              - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                                / CAST(nb AS DOUBLE)))
                          / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)
                             - 2.0))
                 END * 1000000.0 + 0.5) / 1000000.0 AS cohens_d
    FROM g
    """


registry.register("cohens_d_segments", q_cohens_d_segments, _cohens_d_sql())


# ---------------------------------------------------------------------------
# Poisson overdispersion check on daily event counts
# ---------------------------------------------------------------------------


def q_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion check per event type: is the daily count series
    Poisson (variance ≈ mean) or clumped (variance ≫ mean)? The
    dispersion index D = s²/x̄ and its χ² form (n−1)·D — the modeling
    gate before anyone fits a Poisson rate or sizes an anomaly
    threshold on count data (`burstiness_index` scores inter-arrival
    gaps; this scores the counting measure itself).

    Exactness: daily counts are exact integers; s² and x̄ come from
    exact sufficient statistics through one shared expression,
    `_r6`-bounded. Scale: one rollup to (type, day), one to type."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("c"))
    g = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    var = (
        F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / nd
    ) / (nd - F.lit(1.0))
    disp = var / mean
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        _r6(mean).alias("mean_daily"),
        _r6(var).alias("var_daily"),
        _r6(disp).alias("dispersion_index"),
        ((nd - F.lit(1.0)) * disp > nd + F.lit(3.0) * F.sqrt(
            F.lit(2.0) * nd
        )).alias("overdispersed"),
    )


registry.register(
    "poisson_dispersion",
    q_poisson_dispersion,
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    g AS (
      SELECT event_type, COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS q
      FROM daily GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           FLOOR(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS mean_daily,
           FLOOR((CAST(q AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                    / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS var_daily,
           FLOOR(((CAST(q AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
                 / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS dispersion_index,
           (CAST(n AS DOUBLE) - 1.0)
           * (((CAST(q AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
              / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
           > CAST(n AS DOUBLE) + 3.0 * sqrt(2.0 * CAST(n AS DOUBLE))
             AS overdispersed
    FROM g
    """,
)


# ---------------------------------------------------------------------------
# Kruskal-Wallis H test (rank-based k-sample location test)
# ---------------------------------------------------------------------------


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test: does ship latency differ in location
    across the five order priorities? The k-sample extension of
    `mann_whitney_u` -- rank everything jointly, compare per-group
    rank sums. H = 12/(N(N+1)) * sum(R_g^2/n_g) - 3(N+1),
    tie-corrected by C = 1 - sum(t^3 - t)/(N^3 - N).

    Scale + exactness: latency is an integer day count with BOUNDED
    cardinality (~hundreds of distinct values), so average ranks come
    from the value-histogram -- per-(priority,value) counts, then a
    cumulative over the distinct-VALUE table (never a fact-sized
    window; same bounded-domain shape as the two-pass rank family).
    Ties share avg rank (2*below + ties + 1)/2, carried x2 as the
    exact BIGINT r2 so rank sums sum(c_gv * r2(v)) are integers. The
    five R^2/(4n) terms become doubles only at the end and are added
    in ONE FIXED literal priority order (never an engine-ordered
    float sum); tie cubes stay BIGINT (t <= count of one latency
    value). Reference scope: zjacom/airflow-baseball has no stats
    layer; this extends the engine's k-sample toolkit alongside
    anova_f (which assumes normality; KW does not)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_orderpriority").alias("prio"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("v"),
    )
    cell = lat.groupBy("prio", "v").agg(F.count("*").alias("c_gv"))
    vtab = cell.groupBy("v").agg(F.sum("c_gv").alias("c_v"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    vtab = vtab.withColumn(
        "below", F.coalesce(F.sum("c_v").over(w), F.lit(0))
    ).withColumn("r2", 2 * F.col("below") + F.col("c_v") + 1)
    per_g = (
        cell.join(vtab.select("v", "r2"), "v")
        .groupBy("prio")
        .agg(
            F.sum(F.col("c_gv") * F.col("r2")).cast("long").alias("r2g"),
            F.sum("c_gv").cast("long").alias("n_g"),
        )
    )
    ties = vtab.agg(
        F.sum(F.col("c_v") * F.col("c_v") * F.col("c_v") - F.col("c_v"))
        .cast("long")
        .alias("t3")
    )
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    pg = per_g.groupBy().agg(
        F.sum("n_g").cast("long").alias("n"),
        *[
            F.max(F.when(F.col("prio") == p, F.col("r2g"))).alias(f"r2_{i}")
            for i, p in enumerate(prios)
        ],
        *[
            F.max(F.when(F.col("prio") == p, F.col("n_g"))).alias(f"ng_{i}")
            for i, p in enumerate(prios)
        ],
    )
    term = lambda i: (  # noqa: E731
        F.col(f"r2_{i}").cast("double") * F.col(f"r2_{i}").cast("double")
    ) / (F.lit(4.0) * F.col(f"ng_{i}").cast("double"))
    ssum = term(0) + term(1) + term(2) + term(3) + term(4)
    nd = F.col("n").cast("double")
    h = F.lit(12.0) / (nd * (nd + 1)) * ssum - 3.0 * (nd + 1)
    joined = pg.crossJoin(F.broadcast(ties))
    c_tie = F.lit(1.0) - F.col("t3").cast("double") / (nd * nd * nd - nd)
    return joined.select(
        F.col("n"),
        F.lit(5).alias("k_groups"),
        _r6(h).alias("h_stat"),
        _r6(h / c_tie).alias("h_tie_corrected"),
    )


registry.register(
    "kruskal_wallis",
    q_kruskal_wallis,
    """
    WITH lat AS (
      SELECT o.o_orderpriority AS prio,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS v
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    cell AS (
      SELECT prio, v, COUNT(*) AS c_gv FROM lat GROUP BY 1, 2
    ),
    vtab AS (
      SELECT v, SUM(c_gv) AS c_v,
             COALESCE(SUM(SUM(c_gv)) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS below
      FROM cell GROUP BY v
    ),
    r2tab AS (
      SELECT v, 2 * below + c_v + 1 AS r2 FROM vtab
    ),
    per_g AS (
      SELECT prio,
             CAST(SUM(c.c_gv * r.r2) AS BIGINT) AS r2g,
             CAST(SUM(c.c_gv) AS BIGINT) AS n_g
      FROM cell c JOIN r2tab r USING (v) GROUP BY prio
    ),
    pg AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             MAX(CASE WHEN prio = '1-URGENT' THEN r2g END) AS r2_0,
             MAX(CASE WHEN prio = '2-HIGH' THEN r2g END) AS r2_1,
             MAX(CASE WHEN prio = '3-MEDIUM' THEN r2g END) AS r2_2,
             MAX(CASE WHEN prio = '4-NOT SPECIFIED' THEN r2g END) AS r2_3,
             MAX(CASE WHEN prio = '5-LOW' THEN r2g END) AS r2_4,
             MAX(CASE WHEN prio = '1-URGENT' THEN n_g END) AS ng_0,
             MAX(CASE WHEN prio = '2-HIGH' THEN n_g END) AS ng_1,
             MAX(CASE WHEN prio = '3-MEDIUM' THEN n_g END) AS ng_2,
             MAX(CASE WHEN prio = '4-NOT SPECIFIED' THEN n_g END) AS ng_3,
             MAX(CASE WHEN prio = '5-LOW' THEN n_g END) AS ng_4
      FROM per_g
    ),
    ties AS (
      SELECT CAST(SUM(c_v * c_v * c_v - c_v) AS BIGINT) AS t3 FROM vtab
    ),
    calc AS (
      SELECT n,
             (CAST(r2_0 AS DOUBLE) * CAST(r2_0 AS DOUBLE))
               / (4.0 * CAST(ng_0 AS DOUBLE))
             + (CAST(r2_1 AS DOUBLE) * CAST(r2_1 AS DOUBLE))
               / (4.0 * CAST(ng_1 AS DOUBLE))
             + (CAST(r2_2 AS DOUBLE) * CAST(r2_2 AS DOUBLE))
               / (4.0 * CAST(ng_2 AS DOUBLE))
             + (CAST(r2_3 AS DOUBLE) * CAST(r2_3 AS DOUBLE))
               / (4.0 * CAST(ng_3 AS DOUBLE))
             + (CAST(r2_4 AS DOUBLE) * CAST(r2_4 AS DOUBLE))
               / (4.0 * CAST(ng_4 AS DOUBLE)) AS ssum,
             t3
      FROM pg CROSS JOIN ties
    ),
    hc AS (
      SELECT n,
             12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)) * ssum
               - 3.0 * (CAST(n AS DOUBLE) + 1) AS h,
             1.0 - CAST(t3 AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                  - CAST(n AS DOUBLE)) AS c_tie
      FROM calc
    )
    SELECT n, 5 AS k_groups,
           FLOOR(h * 1000000.0 + 0.5) / 1000000.0 AS h_stat,
           FLOOR(h / c_tie * 1000000.0 + 0.5) / 1000000.0 AS h_tie_corrected
    FROM hc
    """,
)


# ---------------------------------------------------------------------------
# Gumbel block-maxima fit (extreme value theory) + return level
# ---------------------------------------------------------------------------

# ln(-ln(1 - 1/52)) evaluated ONCE in Python and inlined as the same
# decimal literal into BOTH engines' expression texts: a runtime LN()
# could differ by 1 ulp between Java's Math.log and DuckDB's libm,
# but a parsed literal is the identical IEEE double on both sides
# (the LCG-literal house rule).
_GUMBEL_LNLN_52 = __import__("math").log(
    -__import__("math").log(1.0 - 1.0 / 52.0)
)
_EULER_GAMMA = 0.5772156649015329
_PI = 3.141592653589793
_SQRT6 = 2.449489742783178


def q_gumbel_return_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value analysis of daily revenue: fit a Gumbel
    distribution to WEEKLY block maxima of the daily order-revenue
    series by method of moments (beta = sd*sqrt(6)/pi, mu = mean -
    gamma*beta) and report the 52-week return level mu -
    beta*ln(-ln(1-1/52)) -- 'the daily revenue spike you expect to
    see once a year', the capacity-planning number a mean+3sd rule
    understates because revenue maxima are right-skewed.

    Scale: two map-combinable aggs (fact -> ~2400 daily rows -> ~350
    weekly maxima); moments are single-row. Exactness: prices are
    DOUBLE in this generation, so revenue is quantized to floor-cents
    PER ROW before the daily sum (quantize-before-sum -- a float SUM
    is partition-order-dependent); week index is
    epoch-day integer division from the data's min date (no calendar
    week function -- engines disagree on week-of-year conventions);
    sd comes from the deterministic IEEE expression over the exact
    cent sums; the ln(-ln(.)) constant is a shared literal (header
    comment). Reference scope: beyond zjacom/airflow-baseball -- EVT
    layer for the analytics engine."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = o.groupBy("o_orderdate").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).cast("long").alias("cents")
    )
    wk = F.floor(
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")) / 7
    )
    weekly = daily.select(wk.alias("wk"), "cents").groupBy("wk").agg(
        F.max("cents").alias("m")
    )
    sums = weekly.agg(
        F.count("*").alias("n"),
        F.sum("m").cast("long").alias("sm"),
        F.sum(
            F.col("m").cast("decimal(18,0)") * F.col("m").cast("decimal(18,0)")
        ).alias("sm2"),
    )
    nd = F.col("n").cast("double")
    smd = F.col("sm").cast("double")
    sm2d = F.col("sm2").cast("double")
    mean_c = smd / nd
    sd_c = F.sqrt((sm2d - smd * smd / nd) / (nd - 1))
    beta_c = sd_c * F.lit(_SQRT6) / F.lit(_PI)
    mu_c = mean_c - F.lit(_EULER_GAMMA) * beta_c
    rl_c = mu_c - beta_c * F.lit(_GUMBEL_LNLN_52)
    return sums.select(
        F.col("n").alias("n_weeks"),
        _r6(mean_c / 100.0).alias("mean_weekly_max"),
        _r6(sd_c / 100.0).alias("sd_weekly_max"),
        _r6(mu_c / 100.0).alias("gumbel_mu"),
        _r6(beta_c / 100.0).alias("gumbel_beta"),
        _r6(rl_c / 100.0).alias("return_level_52w"),
    )


registry.register(
    "gumbel_return_level",
    q_gumbel_return_level,
    f"""
    WITH daily AS (
      SELECT o_orderdate,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    weekly AS (
      SELECT CAST(FLOOR(date_diff('day', DATE '1992-01-01', o_orderdate)
                        / 7.0) AS BIGINT) AS wk,
             MAX(cents) AS m
      FROM daily GROUP BY 1
    ),
    sums AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(m) AS BIGINT) AS sm,
             -- r11: operands widened to DECIMAL(38,0) -- DuckDB's
             -- DECIMAL(18)xDECIMAL(18) multiply stays on the int64
             -- DECIMAL(18,0) fast path and overflows at sf0.1
             -- (cents^2 ~ 3e18 > 1e18); 38 takes the int128 path.
             -- Exact integer arithmetic, value-identical.
             SUM(CAST(m AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0))) AS sm2
      FROM weekly
    ),
    calc AS (
      SELECT n,
             CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
             SQRT((CAST(sm2 AS DOUBLE)
                   - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)
                     / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1)) AS sd_c
      FROM sums
    ),
    fit AS (
      SELECT n, mean_c, sd_c,
             sd_c * {_SQRT6!r} / {_PI!r} AS beta_c,
             mean_c - {_EULER_GAMMA!r} * (sd_c * {_SQRT6!r} / {_PI!r})
               AS mu_c
      FROM calc
    )
    SELECT n AS n_weeks,
           FLOOR(mean_c / 100.0 * 1000000.0 + 0.5) / 1000000.0
             AS mean_weekly_max,
           FLOOR(sd_c / 100.0 * 1000000.0 + 0.5) / 1000000.0
             AS sd_weekly_max,
           FLOOR(mu_c / 100.0 * 1000000.0 + 0.5) / 1000000.0 AS gumbel_mu,
           FLOOR(beta_c / 100.0 * 1000000.0 + 0.5) / 1000000.0
             AS gumbel_beta,
           FLOOR((mu_c - beta_c * {_GUMBEL_LNLN_52!r}) / 100.0
                 * 1000000.0 + 0.5) / 1000000.0 AS return_level_52w
    FROM fit
    """,
)


# ---------------------------------------------------------------------------
# t-closeness (privacy): per-segment EMD of the sensitive attribute
# ---------------------------------------------------------------------------


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit -- the privacy metric one step past
    `k_anonymity`/`l_diversity`: for each market-segment equivalence
    class, the 1-D earth-mover's distance between the class's
    account-balance distribution and the GLOBAL distribution, over
    rank-rule global deciles. A class with small t reveals little
    about any member's balance; max(t) is the table's disclosure
    bound (output per class so the auditor sees which class leaks).

    Exactness: decile boundaries are rank-rule k-th-smallest cents
    (never interpolated); bin membership is an integer comparison
    against nine broadcast boundaries; the EMD numerator
    sum_j |cum_s(j)*N - cum_g(j)*N_s| is PURE BIGINT (common
    denominator N_s*N factored out; one division at the end,
    /(N_s*N*(m-1))). Bins are densified by an explicit 1..10
    cross-join so zero-count bins still contribute their |r_j| term.

    Scale (r11 optimization): the cents DOMAIN is generator-bounded
    (c_acctbal spans a fixed [-999.99, 9999.99] band regardless of
    fact volume → ≤ 1.1M distinct cents), so the fact collapses to a
    weighted (segment, cents, count) table in ONE combinable scan;
    the decile boundaries are an exclusive cumsum over the cents
    marginal of THAT table (k-th smallest = the unique v with
    cum_before < k ≤ cum_before + count — identical to the previous
    two-pass histogram pick by definition), and bin counts reuse the
    same weighted table instead of a second fact scan. The previous
    form paid two rank_pick passes + a third scan for the driver-side
    total (124 Exchange refs → see plans/r11/t_closeness_*)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        # floor-cents, not cast: Spark's double->long cast truncates
        # toward zero while DuckDB's rounds -- FLOOR(x*100+0.5) is the
        # same IEEE expression on both engines
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    seg_cent = cust.groupBy("c_mktsegment", "cents").agg(
        F.count("*").alias("c")
    )
    marg = seg_cent.groupBy("cents").agg(F.sum("c").alias("cg"))
    w_mc = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    cum_m = marg.select(
        "cents",
        "cg",
        F.coalesce(F.sum("cg").over(w_mc), F.lit(0)).alias("cb"),
        F.sum("cg").over(
            Window.orderBy("cents").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    qs = cum_m.agg(
        *[
            F.max(
                F.when(
                    (F.col("cb") < F.expr(f"({i} * n + 9) div 10"))
                    & (
                        F.expr(f"({i} * n + 9) div 10")
                        <= F.col("cb") + F.col("cg")
                    ),
                    F.col("cents"),
                )
            ).alias(f"q{i}")
            for i in range(1, 10)
        ],
        F.max("n").alias("n_total"),
    )
    kcol = F.lit(1)
    for i in range(1, 10):
        kcol = kcol + (F.col("cents") > F.col(f"q{i}")).cast("int")
    # r11: the per-segment distribution lands as a DENSE 10-element
    # count vector via conditional sums in ONE grouped pass — the
    # previous densify chain (segs × range(1,11) crossJoin, left join
    # back, per-bin window cumsums, global-bin join) was ~7 tiny
    # joins/windows = ~15 sequential driver jobs on a ≤50-row table.
    # Zero-count bins are explicit zeros in the vector, the cumsums
    # and the |cum_s·N − cum_g·n_s| EMD fold are in-row BIGINT higher-
    # order functions, and the global vector is one 5-row re-agg that
    # rides back as a 1-row broadcast. Same exact integers throughout.
    seg_vec = (
        seg_cent.crossJoin(F.broadcast(qs.drop("n_total")))
        .select("c_mktsegment", kcol.alias("bin"), "c")
        .groupBy("c_mktsegment")
        .agg(
            F.array(
                *[
                    F.coalesce(
                        F.sum(F.when(F.col("bin") == j, F.col("c"))),
                        F.lit(0).cast("long"),
                    )
                    for j in range(1, 11)
                ]
            ).alias("cnts"),
            F.sum("c").alias("n_s"),
        )
    )
    glob_vec = seg_vec.agg(
        F.array(
            *[F.sum(F.element_at("cnts", j)) for j in range(1, 11)]
        ).alias("gcnts"),
        F.sum("n_s").alias("n_total"),
    )
    # inclusive cumsum of a 10-element vector, in-row
    cumvec = lambda col: F.transform(  # noqa: E731
        F.sequence(F.lit(1), F.lit(10)),
        lambda j: F.aggregate(
            F.slice(col, F.lit(1), j),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    scored = seg_vec.crossJoin(F.broadcast(glob_vec)).select(
        "c_mktsegment",
        "n_s",
        "n_total",
        F.aggregate(
            F.zip_with(
                cumvec(F.col("cnts")),
                cumvec(F.col("gcnts")),
                lambda s, g: F.abs(
                    s * F.col("n_total") - g * F.col("n_s")
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("emd_num"),
    )
    t = F.col("emd_num").cast("double") / (
        F.col("n_s").cast("double")
        * F.col("n_total").cast("double")
        * F.lit(9.0)
    )
    return scored.select(
        "c_mktsegment",
        F.col("n_s").cast("long").alias("n_class"),
        _r6(t).alias("t_closeness"),
    )


registry.register(
    "t_closeness",
    q_t_closeness,
    """
    WITH cents AS (
      SELECT c_mktsegment, CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ),
    ranked AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents) AS rn,
             COUNT(*) OVER () AS n
      FROM cents
    ),
    qs AS (
      SELECT MAX(CASE WHEN rn = (1 * n + 9) // 10 THEN cents END) AS q1,
             MAX(CASE WHEN rn = (2 * n + 9) // 10 THEN cents END) AS q2,
             MAX(CASE WHEN rn = (3 * n + 9) // 10 THEN cents END) AS q3,
             MAX(CASE WHEN rn = (4 * n + 9) // 10 THEN cents END) AS q4,
             MAX(CASE WHEN rn = (5 * n + 9) // 10 THEN cents END) AS q5,
             MAX(CASE WHEN rn = (6 * n + 9) // 10 THEN cents END) AS q6,
             MAX(CASE WHEN rn = (7 * n + 9) // 10 THEN cents END) AS q7,
             MAX(CASE WHEN rn = (8 * n + 9) // 10 THEN cents END) AS q8,
             MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN cents END) AS q9
      FROM ranked
    ),
    binned AS (
      SELECT c_mktsegment,
             1 + CAST(cents > q1 AS INT) + CAST(cents > q2 AS INT)
               + CAST(cents > q3 AS INT) + CAST(cents > q4 AS INT)
               + CAST(cents > q5 AS INT) + CAST(cents > q6 AS INT)
               + CAST(cents > q7 AS INT) + CAST(cents > q8 AS INT)
               + CAST(cents > q9 AS INT) AS bin
      FROM cents CROSS JOIN qs
    ),
    seg_bin AS (
      SELECT c_mktsegment, bin, COUNT(*) AS c_sb FROM binned GROUP BY 1, 2
    ),
    segs AS (
      SELECT c_mktsegment, SUM(c_sb) AS n_s FROM seg_bin GROUP BY 1
    ),
    dense AS (
      SELECT s.c_mktsegment, s.n_s, b.bin, COALESCE(sb.c_sb, 0) AS c_sb
      FROM segs s
      CROSS JOIN (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),
                                        (9),(10)) t(bin)) b
      LEFT JOIN seg_bin sb
        ON sb.c_mktsegment = s.c_mktsegment AND sb.bin = b.bin
    ),
    gbin AS (
      SELECT bin, SUM(c_sb) AS c_gb,
             SUM(SUM(c_sb)) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_g
      FROM dense GROUP BY bin
    ),
    total AS (SELECT COUNT(*) AS n FROM cents),
    cum AS (
      SELECT d.c_mktsegment, d.n_s, d.bin, g.cum_g,
             SUM(d.c_sb) OVER (PARTITION BY d.c_mktsegment ORDER BY d.bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_s
      FROM dense d JOIN gbin g USING (bin)
    )
    SELECT c_mktsegment,
           CAST(MAX(n_s) AS BIGINT) AS n_class,
           FLOOR(CAST(SUM(ABS(cum_s * t.n - cum_g * n_s)) AS DOUBLE)
                 / (CAST(MAX(n_s) AS DOUBLE) * CAST(MAX(t.n) AS DOUBLE)
                    * 9.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS t_closeness
    FROM cum CROSS JOIN total t
    GROUP BY c_mktsegment
    """,
)


# ---------------------------------------------------------------------------
# Jarque-Bera normality test on ship latency
# ---------------------------------------------------------------------------


def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test on ship latency: JB =
    n/6*(skew^2 + excess_kurtosis^2/4) from the third and fourth
    standardized moments -- the gatekeeper diagnostic before any
    normality-assuming method in the suite (anova_f, welch_ttest,
    the +/-2-sigma bands) is trusted.

    Exactness: latency is a small integer, so the four raw power
    sums S1..S4 are EXACT BIGINTs (v^4 <= 2.6e10 per row; the sums
    hold to ~sf1, DECIMAL(38,0) upgrade documented past that);
    central moments come from the standard algebraic identities as
    one deterministic IEEE tree, and skew's m2^1.5 is written
    m2*sqrt(m2) (correctly-rounded sqrt, never POW whose libm paths
    differ). Scale: one map-combinable fact agg, 1-row output."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    lat = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .cast("long")
        .alias("v")
    )
    sums = lat.agg(
        F.count("*").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("s2"),
        F.sum(F.col("v") * F.col("v") * F.col("v")).cast("long").alias("s3"),
        F.sum(F.col("v") * F.col("v") * F.col("v") * F.col("v"))
        .cast("long")
        .alias("s4"),
    )
    n = F.col("n").cast("double")
    m = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    m2 = r2 - m * m
    m3 = r3 - 3.0 * m * r2 + 2.0 * m * m * m
    m4 = r4 - 4.0 * m * r3 + 6.0 * m * m * r2 - 3.0 * m * m * m * m
    skew = m3 / (m2 * F.sqrt(m2))
    exk = m4 / (m2 * m2) - 3.0
    jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
    return sums.select(
        F.col("n"),
        _r6(skew).alias("skewness"),
        _r6(exk).alias("excess_kurtosis"),
        _r6(jb).alias("jb_stat"),
    )


registry.register(
    "jarque_bera",
    q_jarque_bera,
    """
    WITH lat AS (
      SELECT CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
                  AS BIGINT) AS v
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    sums AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(v) AS BIGINT) AS s1,
             CAST(SUM(v * v) AS BIGINT) AS s2,
             CAST(SUM(v * v * v) AS BIGINT) AS s3,
             CAST(SUM(v * v * v * v) AS BIGINT) AS s4
      FROM lat
    ),
    mom AS (
      SELECT n,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
             CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
             CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
             CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
      FROM sums
    ),
    cm AS (
      SELECT n, r2 - m * m AS m2,
             r3 - 3.0 * m * r2 + 2.0 * m * m * m AS m3,
             r4 - 4.0 * m * r3 + 6.0 * m * m * r2
               - 3.0 * m * m * m * m AS m4
      FROM mom
    ),
    st AS (
      SELECT n, m3 / (m2 * SQRT(m2)) AS skew,
             m4 / (m2 * m2) - 3.0 AS exk
      FROM cm
    )
    SELECT n,
           FLOOR(skew * 1000000.0 + 0.5) / 1000000.0 AS skewness,
           FLOOR(exk * 1000000.0 + 0.5) / 1000000.0 AS excess_kurtosis,
           FLOOR(CAST(n AS DOUBLE) / 6.0
                 * (skew * skew + exk * exk / 4.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS jb_stat
    FROM st
    """,
)


# ---------------------------------------------------------------------------
# Grubbs outlier test on the daily revenue series
# ---------------------------------------------------------------------------


def q_grubbs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs single-outlier test on daily revenue: G =
    max|x - mean| / sd over the daily series, plus WHICH day -- the
    formal 'is the biggest spike statistically an outlier' answer
    behind ad-hoc spike triage (compare `rolling_anomaly`, which
    flags locally; Grubbs tests globally).

    Exactness: daily cents are quantized-before-sum; mean/sd come
    from exact BIGINT / DECIMAL(38,0) sums (cents^2); the argmax day
    is picked by lexicographic MIN over (-deviation, day) so a
    deviation tie resolves to the earliest day on both engines.
    Scale: fact -> ~2400-day aggregate; the 1-row stats are
    broadcast back for the deviation pass."""
    o = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("pc"),
    )
    daily = o.groupBy("d").agg(F.sum("pc").cast("long").alias("cents"))
    stats = daily.agg(
        F.count("*").alias("n"),
        F.sum("cents").cast("long").alias("s1"),
        F.sum(
            F.col("cents").cast("decimal(18,0)")
            * F.col("cents").cast("decimal(18,0)")
        ).alias("s2"),
    )
    n = F.col("n").cast("double")
    mean_c = F.col("s1").cast("double") / n
    sd_c = F.sqrt(
        (F.col("s2").cast("double")
         - F.col("s1").cast("double") * F.col("s1").cast("double") / n)
        / (n - 1)
    )
    dev = F.abs(F.col("cents").cast("double") - F.col("mean_c"))
    picked = (
        daily.crossJoin(
            F.broadcast(
                stats.select(
                    "n", mean_c.alias("mean_c"), sd_c.alias("sd_c")
                )
            )
        )
        .select(
            "n",
            "mean_c",
            "sd_c",
            F.struct((-dev).alias("neg"), F.col("d").alias("d")).alias("kd"),
        )
        .groupBy("n", "mean_c", "sd_c")
        .agg(F.min("kd").alias("kd"))
    )
    return picked.select(
        F.col("n").cast("long").alias("n_days"),
        _r6(-F.col("kd.neg") / F.col("sd_c")).alias("g_stat"),
        F.col("kd.d").alias("outlier_day"),
        _r6(-F.col("kd.neg") / 100.0).alias("abs_deviation_dollars"),
    )


registry.register(
    "grubbs_test",
    q_grubbs_test,
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    stats AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(cents) AS BIGINT) AS s1,
             -- r11: DECIMAL(38,0) operands (int128 path) -- the
             -- DECIMAL(18) multiply overflowed at sf0.1; exact,
             -- value-identical
             SUM(CAST(cents AS DECIMAL(38,0))
                 * CAST(cents AS DECIMAL(38,0))) AS s2
      FROM daily
    ),
    calc AS (
      SELECT n,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
             SQRT((CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                     / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1)) AS sd_c
      FROM stats
    ),
    devs AS (
      SELECT c.n, c.mean_c, c.sd_c, d.d,
             ABS(CAST(d.cents AS DOUBLE) - c.mean_c) AS dev
      FROM daily d CROSS JOIN calc c
    ),
    pick AS (
      SELECT n, mean_c, sd_c, d, dev
      FROM devs ORDER BY dev DESC, d ASC LIMIT 1
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           FLOOR(dev / sd_c * 1000000.0 + 0.5) / 1000000.0 AS g_stat,
           d AS outlier_day,
           FLOOR(dev / 100.0 * 1000000.0 + 0.5) / 1000000.0
             AS abs_deviation_dollars
    FROM pick
    """,
)


# ---------------------------------------------------------------------------
# Cochran's Q: paired binary outcomes across three years
# ---------------------------------------------------------------------------


def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test: did the same customers' propensity to order
    change across 1995/1996/1997? Subjects are customers active in
    at least one of the three years, the binary outcome is
    'placed >=1 order that year'; Q is the paired k-sample extension
    of McNemar (`mcnemar_paired` is the k=2 special case).

    Q = (k-1) * (k*sum(G_j^2) - (sum G_j)^2)
        / (k*sum(L_i) - sum(L_i^2))
    with column totals G_j and per-subject row totals L_i in
    {1..3} -- every term an EXACT BIGINT; the k=3 column totals are
    combined in fixed literal year order. Scale: one orders scan ->
    per-customer-year flags -> bounded aggregates."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("yr")
    ).filter(F.col("yr").isin(1995, 1996, 1997))
    flags = o.groupBy("o_custkey").agg(
        F.max((F.col("yr") == 1995).cast("long")).alias("x95"),
        F.max((F.col("yr") == 1996).cast("long")).alias("x96"),
        F.max((F.col("yr") == 1997).cast("long")).alias("x97"),
    )
    sums = flags.agg(
        F.count("*").alias("n_subjects"),
        F.sum("x95").cast("long").alias("g1"),
        F.sum("x96").cast("long").alias("g2"),
        F.sum("x97").cast("long").alias("g3"),
        F.sum(F.col("x95") + F.col("x96") + F.col("x97"))
        .cast("long")
        .alias("sl"),
        F.sum(
            (F.col("x95") + F.col("x96") + F.col("x97"))
            * (F.col("x95") + F.col("x96") + F.col("x97"))
        ).cast("long").alias("sl2"),
    )
    g1, g2, g3 = (F.col(c).cast("double") for c in ["g1", "g2", "g3"])
    sl, sl2 = F.col("sl").cast("double"), F.col("sl2").cast("double")
    gs = g1 + g2 + g3
    q = (
        F.lit(2.0)
        * (F.lit(3.0) * (g1 * g1 + g2 * g2 + g3 * g3) - gs * gs)
        / (F.lit(3.0) * sl - sl2)
    )
    return sums.select(
        F.col("n_subjects").cast("long").alias("n_subjects"),
        F.col("g1").cast("long").alias("active_1995"),
        F.col("g2").cast("long").alias("active_1996"),
        F.col("g3").cast("long").alias("active_1997"),
        _r6(q).alias("q_stat"),
        F.lit(2).alias("df"),
    )


registry.register(
    "cochran_q",
    q_cochran_q,
    """
    WITH o AS (
      SELECT o_custkey,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr
      FROM orders
      WHERE CAST(EXTRACT(year FROM o_orderdate) AS INT) IN
            (1995, 1996, 1997)
    ),
    flags AS (
      SELECT o_custkey,
             MAX(CAST(yr = 1995 AS BIGINT)) AS x95,
             MAX(CAST(yr = 1996 AS BIGINT)) AS x96,
             MAX(CAST(yr = 1997 AS BIGINT)) AS x97
      FROM o GROUP BY 1
    ),
    sums AS (
      SELECT COUNT(*) AS n_subjects,
             CAST(SUM(x95) AS BIGINT) AS g1,
             CAST(SUM(x96) AS BIGINT) AS g2,
             CAST(SUM(x97) AS BIGINT) AS g3,
             CAST(SUM(x95 + x96 + x97) AS BIGINT) AS sl,
             CAST(SUM((x95 + x96 + x97) * (x95 + x96 + x97)) AS BIGINT)
               AS sl2
      FROM flags
    )
    SELECT CAST(n_subjects AS BIGINT) AS n_subjects,
           g1 AS active_1995, g2 AS active_1996, g3 AS active_1997,
           FLOOR(2.0 * (3.0 * (CAST(g1 AS DOUBLE) * CAST(g1 AS DOUBLE)
                               + CAST(g2 AS DOUBLE) * CAST(g2 AS DOUBLE)
                               + CAST(g3 AS DOUBLE) * CAST(g3 AS DOUBLE))
                        - (CAST(g1 AS DOUBLE) + CAST(g2 AS DOUBLE)
                           + CAST(g3 AS DOUBLE))
                          * (CAST(g1 AS DOUBLE) + CAST(g2 AS DOUBLE)
                             + CAST(g3 AS DOUBLE)))
                 / (3.0 * CAST(sl AS DOUBLE) - CAST(sl2 AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS q_stat,
           2 AS df
    FROM sums
    """,
)


# ---------------------------------------------------------------------------
# Tukey median polish of the year x month revenue matrix
# ---------------------------------------------------------------------------


def q_median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey median polish (two full sweeps) of the year x month
    monthly-revenue matrix: robust additive decomposition
    value ~ row(year) + col(month) + residual, the outlier-immune
    alternative to two-way ANOVA means (`anova_two_way`) -- one bad
    month cannot drag its whole year's effect. Output is long-form:
    per-year row effects, per-month column effects, and the final
    L1 residual mass.

    Exactness: cells are exact BIGINT cents (quantize-before-sum);
    every median is the rank-rule LOWER median -- element
    (n+1) div 2 of the sorted <=12-value list -- so the ENTIRE
    decomposition stays in integer arithmetic end to end; no float
    exists anywhere. Scale: after one fact scan the polish runs on
    an ~84-cell table (collect_list per row/col is bounded by 12);
    two sweeps are a fixed 4-step plan, no driver loop state."""
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("pc"),
    )
    cells = o.groupBy("yr", "mo").agg(
        F.sum("pc").cast("long").alias("e")
    )

    med = F.expr(
        "element_at(sort_array(collect_list(e)), "
        "CAST((size(collect_list(e)) + 1) div 2 AS INT))"
    )

    def sweep(df, key, out):
        m = df.groupBy(key).agg(med.alias("m"))
        return (
            df.join(F.broadcast(m), key)
            .select(
                "yr", "mo", (F.col("e") - F.col("m")).alias("e")
            ),
            m.select(F.col(key).alias(f"{out}_k"), F.col("m").alias(out)),
        )

    e1, rm1 = sweep(cells, "yr", "r1")
    e2, cm1 = sweep(e1, "mo", "c1")
    e3, rm2 = sweep(e2, "yr", "r2")
    e4, cm2 = sweep(e3, "mo", "c2")
    row_eff = rm1.join(rm2, rm1["r1_k"] == rm2["r2_k"]).select(
        F.lit("row").alias("component"),
        F.col("r1_k").cast("int").alias("k"),
        (F.col("r1") + F.col("r2")).cast("long").alias("effect_cents"),
    )
    col_eff = cm1.join(cm2, cm1["c1_k"] == cm2["c2_k"]).select(
        F.lit("col").alias("component"),
        F.col("c1_k").cast("int").alias("k"),
        (F.col("c1") + F.col("c2")).cast("long").alias("effect_cents"),
    )
    resid = e4.agg(
        F.lit("resid_l1").alias("component"),
        F.lit(-1).alias("k"),
        F.sum(F.abs(F.col("e"))).cast("long").alias("effect_cents"),
    )
    return row_eff.unionByName(col_eff).unionByName(resid).orderBy(
        "component", "k"
    )


registry.register(
    "median_polish",
    q_median_polish,
    """
    WITH cells AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
             CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS e
      FROM orders GROUP BY 1, 2
    ),
    rm1 AS (
      SELECT yr, list(e ORDER BY e)[(COUNT(e) + 1) // 2] AS m
      FROM cells GROUP BY yr
    ),
    e1 AS (
      SELECT c.yr, c.mo, c.e - r.m AS e
      FROM cells c JOIN rm1 r USING (yr)
    ),
    cm1 AS (
      SELECT mo, list(e ORDER BY e)[(COUNT(e) + 1) // 2] AS m
      FROM e1 GROUP BY mo
    ),
    e2 AS (
      SELECT t.yr, t.mo, t.e - c.m AS e
      FROM e1 t JOIN cm1 c USING (mo)
    ),
    rm2 AS (
      SELECT yr, list(e ORDER BY e)[(COUNT(e) + 1) // 2] AS m
      FROM e2 GROUP BY yr
    ),
    e3 AS (
      SELECT t.yr, t.mo, t.e - r.m AS e
      FROM e2 t JOIN rm2 r USING (yr)
    ),
    cm2 AS (
      SELECT mo, list(e ORDER BY e)[(COUNT(e) + 1) // 2] AS m
      FROM e3 GROUP BY mo
    ),
    e4 AS (
      SELECT t.yr, t.mo, t.e - c.m AS e
      FROM e3 t JOIN cm2 c USING (mo)
    ),
    row_eff AS (
      SELECT 'row' AS component, CAST(yr AS INT) AS k,
             CAST(r1.m + r2.m AS BIGINT) AS effect_cents
      FROM rm1 r1 JOIN rm2 r2 USING (yr)
    ),
    col_eff AS (
      SELECT 'col' AS component, CAST(mo AS INT) AS k,
             CAST(c1.m + c2.m AS BIGINT) AS effect_cents
      FROM cm1 c1 JOIN cm2 c2 USING (mo)
    ),
    resid AS (
      SELECT 'resid_l1' AS component, -1 AS k,
             CAST(SUM(ABS(e)) AS BIGINT) AS effect_cents
      FROM e4
    )
    SELECT * FROM row_eff
    UNION ALL SELECT * FROM col_eff
    UNION ALL SELECT * FROM resid
    ORDER BY component, k
    """,
)


# ---------------------------------------------------------------------------
# Mahalanobis outlier audit on (quantity, price)
# ---------------------------------------------------------------------------


def q_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate Mahalanobis outlier audit over lineitem
    (quantity, extended price): squared distance under the 2x2
    population covariance, flagged against the chi-square(2) 99%
    cutoff 9.21034 -- the multivariate upgrade of `iqr_outliers`
    that catches points unusual in the JOINT distribution (cheap
    big-quantity orders, expensive small ones) that both marginals
    call normal.

    Exactness: the five sufficient statistics are exact
    BIGINT/DECIMAL(38,0) sums (price-cents squares via DECIMAL(19)
    to force int128 multiplies); the inverse covariance is the
    closed-form 2x2 adjugate over one determinant, applied per row
    as a deterministic IEEE expression against broadcast scalars.
    The mean of d^2 under the population covariance is EXACTLY the
    dimension (=2) -- emitted as a self-check column. Scale: two
    map-combinable fact scans (moments, then scoring), 1-row out."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    sums = li.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(
            F.col("y").cast("decimal(19,0)") * F.col("y").cast("decimal(19,0)")
        ).alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    n = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / n
    my = F.col("sy").cast("double") / n
    cxx = F.col("sxx").cast("double") / n - mx * mx
    cyy = F.col("syy").cast("double") / n - my * my
    cxy = F.col("sxy").cast("double") / n - mx * my
    det = cxx * cyy - cxy * cxy
    stats = sums.select(
        "n",
        mx.alias("mx"),
        my.alias("my"),
        cxx.alias("cxx"),
        cyy.alias("cyy"),
        cxy.alias("cxy"),
        det.alias("det"),
    )
    dx = F.col("x").cast("double") - F.col("mx")
    dy = F.col("y").cast("double") - F.col("my")
    d2 = (
        F.col("cyy") * dx * dx
        - 2.0 * F.col("cxy") * dx * dy
        + F.col("cxx") * dy * dy
    ) / F.col("det")
    scored = li.crossJoin(F.broadcast(stats))
    return scored.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((d2 > 9.21034).cast("long")).cast("long").alias(
            "n_outliers_99"
        ),
        _r6(
            F.sum((d2 > 9.21034).cast("long")).cast("double")
            / F.count("*").cast("double")
        ).alias("outlier_share"),
        _r6(F.max(d2)).alias("max_d2"),
        _r6(
            F.sum(F.floor(d2 * 1000000.0 + F.lit(0.5)).cast("long"))
            .cast("double")
            / (F.count("*").cast("double") * 1000000.0)
        ).alias("mean_d2_check"),
    )


registry.register(
    "mahalanobis_outliers",
    q_mahalanobis_outliers,
    """
    WITH li AS (
      SELECT CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS x,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
      FROM lineitem
    ),
    sums AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
               AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM li
    ),
    st AS (
      SELECT n,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
             CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS cxx,
             CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS cyy,
             CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS cxy
      FROM sums
    ),
    st2 AS (
      SELECT *, cxx * cyy - cxy * cxy AS det FROM st
    ),
    scored AS (
      SELECT st2.n AS n_tot,
             (cyy * (CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx)
              - 2.0 * cxy * (CAST(x AS DOUBLE) - mx)
                * (CAST(y AS DOUBLE) - my)
              + cxx * (CAST(y AS DOUBLE) - my)
                * (CAST(y AS DOUBLE) - my)) / det AS d2
      FROM li CROSS JOIN st2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(d2 > 9.21034 AS BIGINT)) AS BIGINT)
             AS n_outliers_99,
           FLOOR(CAST(SUM(CAST(d2 > 9.21034 AS BIGINT)) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS outlier_share,
           FLOOR(MAX(d2) * 1000000.0 + 0.5) / 1000000.0 AS max_d2,
           FLOOR(CAST(SUM(CAST(FLOOR(d2 * 1000000.0 + 0.5) AS BIGINT))
                      AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE) * 1000000.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS mean_d2_check
    FROM scored
    """,
)


# ---------------------------------------------------------------------------
# Empirical tail dependence between order value and ship latency
# ---------------------------------------------------------------------------


def q_tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical tail-dependence coefficients between order value and
    the order's worst ship latency: lambda_U = P(value > q95 |
    latency > q95) and lambda_L = P(value <= q05 | latency <= q05).
    Correlation (`corr_matrix`) describes the middle of the joint
    distribution; tail dependence asks whether EXTREMES co-occur --
    the risk question (do the slowest orders skew expensive?) that
    `copula_grid` renders as a picture and this reduces to two
    numbers.

    Exactness: both 95th/5th thresholds are rank-rule k-th-smallest
    integers from the two-pass histogram (never interpolated);
    exceedance is an integer comparison against broadcast scalars
    and every output ratio is one division of exact BIGINT counts.
    Scale: lineitem collapses to per-order max latency (one shuffle
    on orderkey), then histogram passes; no windows."""
    from airflow_baseball_spark.operators.rank_select import rank_pick

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("pc"),
    )
    per_order = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.max("pc").alias("pc"),
            F.max(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
            ).cast("long").alias("lat"),
        )
        # materialize once: two rank_pick calls + the scoring pass
        # would otherwise re-run the fact join ~7x (measured 47
        # exchanges in the unmaterialized plan)
        .localCheckpoint()
    )
    # r11 (optimization): ONE grouped rank_pick over the stacked
    # (metric, v) table instead of two independent rank_picks — the
    # histogram/locate/pick machinery (and its ~6 broadcast jobs) runs
    # once for both metrics; each metric's picked values are identical
    # because rank_pick is per-group exact (group_cols=["metric"]).
    stacked = per_order.select(
        F.explode(
            F.array(
                F.struct(F.lit("pc").alias("metric"), F.col("pc").alias("v")),
                F.struct(F.lit("lat").alias("metric"), F.col("lat").alias("v")),
            )
        ).alias("mv")
    ).select("mv.metric", "mv.v")
    picked = rank_pick(
        stacked,
        "v",
        [
            ("q05", lambda n: F.expr("(5 * n + 99) div 100")),
            ("q95", lambda n: F.expr("(95 * n + 99) div 100")),
        ],
        group_cols=["metric"],
    )
    thr = picked.agg(
        F.max(
            F.when(
                (F.col("metric") == "pc") & (F.col("rank_label") == "q05"),
                F.col("v"),
            )
        ).alias("p05"),
        F.max(
            F.when(
                (F.col("metric") == "pc") & (F.col("rank_label") == "q95"),
                F.col("v"),
            )
        ).alias("p95"),
        F.max(
            F.when(
                (F.col("metric") == "lat") & (F.col("rank_label") == "q05"),
                F.col("v"),
            )
        ).alias("l05"),
        F.max(
            F.when(
                (F.col("metric") == "lat") & (F.col("rank_label") == "q95"),
                F.col("v"),
            )
        ).alias("l95"),
    )
    scored = per_order.crossJoin(F.broadcast(thr))
    return scored.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum((F.col("lat") > F.col("l95")).cast("long"))
        .cast("long")
        .alias("n_lat_hi"),
        F.sum(
            ((F.col("lat") > F.col("l95")) & (F.col("pc") > F.col("p95")))
            .cast("long")
        ).cast("long").alias("n_joint_hi"),
        F.sum((F.col("lat") <= F.col("l05")).cast("long"))
        .cast("long")
        .alias("n_lat_lo"),
        F.sum(
            ((F.col("lat") <= F.col("l05")) & (F.col("pc") <= F.col("p05")))
            .cast("long")
        ).cast("long").alias("n_joint_lo"),
        _r6(
            F.sum(
                ((F.col("lat") > F.col("l95")) & (F.col("pc") > F.col("p95")))
                .cast("long")
            ).cast("double")
            / F.sum((F.col("lat") > F.col("l95")).cast("long"))
            .cast("double")
        ).alias("lambda_upper"),
        _r6(
            F.sum(
                ((F.col("lat") <= F.col("l05"))
                 & (F.col("pc") <= F.col("p05"))).cast("long")
            ).cast("double")
            / F.sum((F.col("lat") <= F.col("l05")).cast("long"))
            .cast("double")
        ).alias("lambda_lower"),
    )


registry.register(
    "tail_dependence",
    q_tail_dependence,
    """
    WITH per_order AS (
      SELECT o.o_orderkey,
             MAX(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS pc,
             CAST(MAX(date_diff('day', o.o_orderdate, l.l_shipdate))
                  AS BIGINT) AS lat
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    ),
    rp AS (
      SELECT pc, ROW_NUMBER() OVER (ORDER BY pc) AS rn,
             COUNT(*) OVER () AS n
      FROM per_order
    ),
    qp AS (
      SELECT MAX(CASE WHEN rn = (5 * n + 99) // 100 THEN pc END) AS p05,
             MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN pc END) AS p95
      FROM rp
    ),
    rl AS (
      SELECT lat, ROW_NUMBER() OVER (ORDER BY lat) AS rn,
             COUNT(*) OVER () AS n
      FROM per_order
    ),
    ql AS (
      SELECT MAX(CASE WHEN rn = (5 * n + 99) // 100 THEN lat END) AS l05,
             MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN lat END) AS l95
      FROM rl
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(lat > l95 AS BIGINT)) AS BIGINT) AS n_lat_hi,
           CAST(SUM(CAST(lat > l95 AND pc > p95 AS BIGINT)) AS BIGINT)
             AS n_joint_hi,
           CAST(SUM(CAST(lat <= l05 AS BIGINT)) AS BIGINT) AS n_lat_lo,
           CAST(SUM(CAST(lat <= l05 AND pc <= p05 AS BIGINT)) AS BIGINT)
             AS n_joint_lo,
           FLOOR(CAST(SUM(CAST(lat > l95 AND pc > p95 AS BIGINT))
                      AS DOUBLE)
                 / CAST(SUM(CAST(lat > l95 AS BIGINT)) AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS lambda_upper,
           FLOOR(CAST(SUM(CAST(lat <= l05 AND pc <= p05 AS BIGINT))
                      AS DOUBLE)
                 / CAST(SUM(CAST(lat <= l05 AS BIGINT)) AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS lambda_lower
    FROM per_order CROSS JOIN qp CROSS JOIN ql
    """,
)


# ---------------------------------------------------------------------------
# Intraclass correlation ICC(1) of order value within customer
# ---------------------------------------------------------------------------


def q_icc_intraclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICC(1) -- how much of order-value variance lives BETWEEN
    customers vs within them, from the one-way random-effects ANOVA
    on customers with >=2 orders. The clustering diagnostic that
    decides whether per-customer random effects (or clustered
    standard errors) are needed before trusting `ols_two_factor`-
    style regressions on order-grain data; ICC ~ 0 means orders are
    exchangeable, ICC ~ 1 means customers are homogeneous blocks.

    Exactness: values are whole DOLLARS quantized per row (floor,
    shared expression), so N, k, sum(y), sum(y^2), sum(n_g^2) are
    exact BIGINTs and each group's (sum y_g)^2/n_g term is
    floor-quantized to an integer BEFORE the cross-group sum
    (quantize-before-sum; the raw double sum would be
    partition-ordered). The unbalanced-design n0 and the final ICC
    are one deterministic IEEE tree. Scale: one orders scan, one
    customer-keyed agg, 1-row output."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") + F.lit(0.5)).cast("long").alias("y"),
    )
    per_g = o.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum("y").cast("long").alias("sy_g"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sy2_g"),
    ).filter(F.col("n_g") >= 2)
    sums = per_g.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("sy_g").cast("long").alias("sy"),
        F.sum("sy2_g").cast("long").alias("sy2"),
        F.sum(F.col("n_g") * F.col("n_g")).cast("long").alias("sn2"),
        F.sum(
            F.floor(
                F.col("sy_g").cast("double")
                * F.col("sy_g").cast("double")
                / F.col("n_g").cast("double")
                + F.lit(0.5)
            ).cast("long")
        ).cast("long").alias("sgt"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    sgt = F.col("sgt").cast("double")
    syd = F.col("sy").cast("double")
    ssb = sgt - syd * syd / nd
    ssw = F.col("sy2").cast("double") - sgt
    msb = ssb / (kd - 1)
    msw = ssw / (nd - kd)
    n0 = (nd - F.col("sn2").cast("double") / nd) / (kd - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    return sums.select(
        F.col("k").alias("n_customers"),
        F.col("n").alias("n_orders"),
        _r6(msb / 1.0e6).alias("ms_between_m"),
        _r6(msw / 1.0e6).alias("ms_within_m"),
        _r6(n0).alias("n0_effective"),
        _r6(icc).alias("icc1"),
    )


registry.register(
    "icc_intraclass",
    q_icc_intraclass,
    """
    WITH o AS (
      SELECT o_custkey,
             CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS y
      FROM orders
    ),
    per_g AS (
      SELECT o_custkey, COUNT(*) AS n_g,
             CAST(SUM(y) AS BIGINT) AS sy_g,
             CAST(SUM(y * y) AS BIGINT) AS sy2_g
      FROM o GROUP BY 1 HAVING COUNT(*) >= 2
    ),
    sums AS (
      SELECT COUNT(*) AS k,
             CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(sy_g) AS BIGINT) AS sy,
             CAST(SUM(sy2_g) AS BIGINT) AS sy2,
             CAST(SUM(n_g * n_g) AS BIGINT) AS sn2,
             CAST(SUM(CAST(FLOOR(CAST(sy_g AS DOUBLE)
                                 * CAST(sy_g AS DOUBLE)
                                 / CAST(n_g AS DOUBLE) + 0.5)
                           AS BIGINT)) AS BIGINT) AS sgt
      FROM per_g
    ),
    calc AS (
      SELECT k, n,
             (CAST(sgt AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1) AS msb,
             (CAST(sy2 AS DOUBLE) - CAST(sgt AS DOUBLE))
               / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS msw,
             (CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(k AS DOUBLE) - 1) AS n0
      FROM sums
    )
    SELECT CAST(k AS BIGINT) AS n_customers,
           CAST(n AS BIGINT) AS n_orders,
           FLOOR(msb / 1.0e6 * 1000000.0 + 0.5) / 1000000.0
             AS ms_between_m,
           FLOOR(msw / 1.0e6 * 1000000.0 + 0.5) / 1000000.0
             AS ms_within_m,
           FLOOR(n0 * 1000000.0 + 0.5) / 1000000.0 AS n0_effective,
           FLOOR((msb - msw) / (msb + (n0 - 1) * msw)
                 * 1000000.0 + 0.5) / 1000000.0 AS icc1
    FROM calc
    """,
)


# ---------------------------------------------------------------------------
# Circular day-of-week concentration per event type
# ---------------------------------------------------------------------------

# cos/sin of the 7 weekday angles 2*pi*d/7, evaluated once in Python
# and inlined as shared literals (no runtime trig -- engines' libm
# cos/sin are not correctly rounded). Weekday = epoch-day % 7, a pure
# integer with no engine calendar convention.
_CIRC7 = [
    (
        __import__("math").cos(2.0 * __import__("math").pi * d / 7.0),
        __import__("math").sin(2.0 * __import__("math").pi * d / 7.0),
    )
    for d in range(7)
]


def q_circular_dow_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular weekly concentration per event type: the mean
    resultant length R = |sum of unit vectors at weekday angles|/n,
    the CORRECT 'how weekly is this signal' statistic --
    `seasonality_dow` reports per-day shares, but R collapses them
    to one rotation-invariant number (R=0 uniform over the week, R=1
    all on one weekday) that doesn't care which day the peak is.
    Also reports the peak weekday by count (deterministic (count
    desc, day asc) tie-break).

    Exactness: weekday is epoch-day % 7 (no calendar function, no
    DOW convention); per-(type, weekday) counts are exact; R's sums
    are counts times the SEVEN inlined cos/sin literals combined in
    fixed weekday order -- no runtime trig, no engine-ordered float
    sum. Scale: one events scan -> <=7 rows per type."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (
            F.datediff(F.to_date("ts"), F.lit("1970-01-05").cast("date"))
            % 7
        ).alias("dow"),
    )
    per = ev.groupBy("event_type", "dow").agg(F.count("*").alias("c"))
    cexp = [F.max(F.when(F.col("dow") == d, F.col("c"))) for d in range(7)]
    one = per.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n"),
        *[
            F.coalesce(cexp[d], F.lit(0)).cast("long").alias(f"c{d}")
            for d in range(7)
        ],
    )
    sc = sum(
        (F.col(f"c{d}").cast("double") * F.lit(_CIRC7[d][0]) for d in range(7)),
        F.lit(0.0),
    )
    ss = sum(
        (F.col(f"c{d}").cast("double") * F.lit(_CIRC7[d][1]) for d in range(7)),
        F.lit(0.0),
    )
    r_len = F.sqrt(sc * sc + ss * ss) / F.col("n").cast("double")
    peak_expr = F.greatest(*[F.col(f"c{d}") for d in range(7)])
    peak_day = F.lit(6)
    for d in range(6, -1, -1):
        peak_day = F.when(F.col(f"c{d}") == peak_expr, F.lit(d)).otherwise(
            peak_day
        )
    return one.select(
        "event_type",
        "n",
        _r6(r_len).alias("resultant_length"),
        peak_day.cast("int").alias("peak_weekday"),
    ).orderBy("event_type")


_CIRC7_COS_SQL = ", ".join(repr(c) for c, _ in _CIRC7)
_CIRC7_SIN_SQL = ", ".join(repr(s) for _, s in _CIRC7)

registry.register(
    "circular_dow_concentration",
    q_circular_dow_concentration,
    f"""
    WITH ev AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-05', CAST(ts AS DATE)) % 7
               AS dow
      FROM events
    ),
    per AS (
      SELECT event_type, dow, COUNT(*) AS c FROM ev GROUP BY 1, 2
    ),
    one AS (
      SELECT event_type,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(COALESCE(MAX(CASE WHEN dow = 0 THEN c END), 0)
                  AS BIGINT) AS c0,
             CAST(COALESCE(MAX(CASE WHEN dow = 1 THEN c END), 0)
                  AS BIGINT) AS c1,
             CAST(COALESCE(MAX(CASE WHEN dow = 2 THEN c END), 0)
                  AS BIGINT) AS c2,
             CAST(COALESCE(MAX(CASE WHEN dow = 3 THEN c END), 0)
                  AS BIGINT) AS c3,
             CAST(COALESCE(MAX(CASE WHEN dow = 4 THEN c END), 0)
                  AS BIGINT) AS c4,
             CAST(COALESCE(MAX(CASE WHEN dow = 5 THEN c END), 0)
                  AS BIGINT) AS c5,
             CAST(COALESCE(MAX(CASE WHEN dow = 6 THEN c END), 0)
                  AS BIGINT) AS c6
      FROM per GROUP BY 1
    ),
    vec AS (
      SELECT event_type, n, c0, c1, c2, c3, c4, c5, c6,
             list_sum(list_transform(range(0, 7), d ->
               CAST([c0, c1, c2, c3, c4, c5, c6][d + 1] AS DOUBLE)
               * [{_CIRC7_COS_SQL}][d + 1])) AS sc,
             list_sum(list_transform(range(0, 7), d ->
               CAST([c0, c1, c2, c3, c4, c5, c6][d + 1] AS DOUBLE)
               * [{_CIRC7_SIN_SQL}][d + 1])) AS ss
      FROM one
    )
    SELECT event_type, n,
           FLOOR(SQRT(sc * sc + ss * ss) / CAST(n AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS resultant_length,
           CAST(CASE
             WHEN c0 = greatest(c0, c1, c2, c3, c4, c5, c6) THEN 0
             WHEN c1 = greatest(c0, c1, c2, c3, c4, c5, c6) THEN 1
             WHEN c2 = greatest(c0, c1, c2, c3, c4, c5, c6) THEN 2
             WHEN c3 = greatest(c0, c1, c2, c3, c4, c5, c6) THEN 3
             WHEN c4 = greatest(c0, c1, c2, c3, c4, c5, c6) THEN 4
             WHEN c5 = greatest(c0, c1, c2, c3, c4, c5, c6) THEN 5
             ELSE 6 END AS INT) AS peak_weekday
    FROM vec ORDER BY event_type
    """,
)


# ---------------------------------------------------------------------------
# Church-Gale term burstiness over the documents corpus
# ---------------------------------------------------------------------------


def q_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale burstiness of the 20 highest-frequency terms:
    observed document frequency vs the Poisson expectation
    D*(1 - exp(-cf/D)) -- 'the' appears everywhere (ratio ~ 1) while
    topical terms CLUMP into few documents (df far below Poisson).
    The statistic behind stopword detection and tf-idf's df choice
    that `tfidf`/`vocab_topk` take as given.

    Exactness: cf/df are exact counts; the top-20 cut is a
    deterministic (cf desc, token asc) rank over the
    vocabulary-bounded term table; the single transcendental
    EXP(-cf/D) is `_r6`-bounded (mixture_weights precedent).
    burst_ratio = df_expected/df_observed > 1 flags clumping.
    Scale: token explode -> (term, doc) distinct -> vocab-bounded
    aggregates; the rank window runs on the vocab table only."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    term_doc = docs.groupBy("tok", "doc_id").agg(F.count("*").alias("tf"))
    stats = term_doc.groupBy("tok").agg(
        F.sum("tf").cast("long").alias("cf"),
        F.count("*").cast("long").alias("df"),
    )
    n_docs = load_table(spark, sf_dir, "documents").select(
        F.countDistinct("doc_id").cast("long").alias("d")
    )
    w = Window.orderBy(F.col("cf").desc(), F.col("tok"))
    top = (
        stats.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .crossJoin(F.broadcast(n_docs))
    )
    exp_df = F.col("d").cast("double") * (
        F.lit(1.0)
        - F.exp(-F.col("cf").cast("double") / F.col("d").cast("double"))
    )
    return top.select(
        F.col("rn").cast("int").alias("rank"),
        "tok",
        "cf",
        "df",
        _r6(exp_df).alias("df_poisson_expected"),
        _r6(exp_df / F.col("df").cast("double")).alias("burst_ratio"),
    ).orderBy("rank")


registry.register(
    "term_burstiness",
    q_term_burstiness,
    """
    WITH term_doc AS (
      SELECT tok, doc_id, COUNT(*) AS tf
      FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY 1, 2
    ),
    stats AS (
      SELECT tok, CAST(SUM(tf) AS BIGINT) AS cf,
             CAST(COUNT(*) AS BIGINT) AS df
      FROM term_doc GROUP BY 1
    ),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS d
           FROM documents),
    top AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY cf DESC, tok) AS rn
      FROM stats
    )
    SELECT CAST(rn AS INT) AS rank, tok, cf, df,
           FLOOR(CAST(d AS DOUBLE)
                 * (1.0 - EXP(-CAST(cf AS DOUBLE) / CAST(d AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0 AS df_poisson_expected,
           FLOOR(CAST(d AS DOUBLE)
                 * (1.0 - EXP(-CAST(cf AS DOUBLE) / CAST(d AS DOUBLE)))
                 / CAST(df AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS burst_ratio
    FROM top CROSS JOIN nd
    WHERE rn <= 20 ORDER BY rank
    """,
)


# ---------------------------------------------------------------------------
# Negative-binomial fit (method of moments) on per-user purchase counts
# ---------------------------------------------------------------------------


def q_nb_fit_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-of-moments negative-binomial fit to per-user purchase
    counts (zero class included): r = m^2/(v - m), plus the observed
    zero share against BOTH the NB and Poisson predictions -- the
    standard 'is Poisson enough' check (`poisson_dispersion` flags
    overdispersion; this fits the distribution practitioners switch
    to and validates it where it matters most, at zero).

    Exactness: per-user counts and their power sums are exact
    BIGINTs; m, v, r are one deterministic IEEE tree; the two
    transcendental predictions EXP(r*ln(r/(r+m))) and EXP(-m) are
    `_r6`-bounded (mixture_weights precedent). Scale: two events
    aggs (per-user, then moments), 1-row output."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long")
        .alias("y")
    )
    sums = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s1"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("s2"),
        F.sum((F.col("y") == 0).cast("long")).cast("long").alias("z"),
    )
    n = F.col("n").cast("double")
    m = F.col("s1").cast("double") / n
    v = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / n
    ) / (n - 1)
    # NB is defined only for overdispersed data; report NULL
    # (identically on both engines) when v <= m
    r = F.when(v > m, m * m / (v - m))
    zero_nb = F.when(v > m, F.exp(r * F.log(r / (r + m))))
    zero_pois = F.exp(-m)
    return sums.select(
        F.col("n").alias("n_users"),
        _r6(m).alias("mean_purchases"),
        _r6(v).alias("var_purchases"),
        _r6(r).alias("nb_r"),
        _r6(F.col("z").cast("double") / n).alias("zero_share_observed"),
        _r6(zero_nb).alias("zero_share_nb"),
        _r6(zero_pois).alias("zero_share_poisson"),
    )


registry.register(
    "nb_fit_moments",
    q_nb_fit_moments,
    """
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CAST(event_type = 'purchase' AS BIGINT)) AS BIGINT)
               AS y
      FROM events GROUP BY 1
    ),
    sums AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(y) AS BIGINT) AS s1,
             CAST(SUM(y * y) AS BIGINT) AS s2,
             CAST(SUM(CAST(y = 0 AS BIGINT)) AS BIGINT) AS z
      FROM per_user
    ),
    calc AS (
      SELECT n, z,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
             (CAST(s2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS v
      FROM sums
    ),
    fit AS (
      SELECT n, z, m, v,
             CASE WHEN v > m THEN m * m / (v - m) END AS r
      FROM calc
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           FLOOR(m * 1000000.0 + 0.5) / 1000000.0 AS mean_purchases,
           FLOOR(v * 1000000.0 + 0.5) / 1000000.0 AS var_purchases,
           FLOOR(r * 1000000.0 + 0.5) / 1000000.0 AS nb_r,
           FLOOR(CAST(z AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS zero_share_observed,
           CASE WHEN r IS NOT NULL THEN
             FLOOR(EXP(r * LN(r / (r + m))) * 1000000.0 + 0.5) / 1000000.0
           END AS zero_share_nb,
           FLOOR(EXP(-m) * 1000000.0 + 0.5) / 1000000.0
             AS zero_share_poisson
    FROM fit
    """,
)


# ---------------------------------------------------------------------------
# Fixed-effect meta-analysis pooling of per-segment effect sizes
# ---------------------------------------------------------------------------


def q_fixed_effect_pooling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-variance fixed-effect meta-analysis of the md5-coin
    A/B effect across event-type segments: pool the per-segment
    Cohen's d values (`cohens_d_segments` reports them individually)
    into one weighted estimate, plus Cochran's Q and the I^2
    heterogeneity share -- the aggregation step every multi-segment
    experiment readout needs, done the meta-analytic way instead of
    re-running the test on the pooled rows (which Simpson's paradox
    can silently invert).

    Exactness: each segment's d and its sampling variance
    (na+nb)/(na*nb) + d^2/(2(na+nb)) derive from exact integer
    sufficient statistics; the cross-segment sums (<= a handful of
    terms, but data-dependent count) run as ORDERED cumulative
    windows over the segment table with the last row taken -- the
    theil_index precedent that fixes float summation order on both
    engines. Degenerate segments (either arm < 2) are excluded
    identically. Scale: one events pass, then <=5-row windows."""
    from airflow_baseball_spark.operators.sampling import hash_unit

    ev = load_table(spark, sf_dir, "events")
    cents = (dec_portable("value", 18, 2) * 100).cast("long")
    arm_a = hash_unit(F.col("user_id"), seed="ab") < 0.5
    g = ev.groupBy("event_type").agg(
        F.count(F.when(arm_a, 1)).alias("na"),
        F.sum(F.when(arm_a, cents).otherwise(0)).alias("sa"),
        F.sum(
            F.when(arm_a, cents.cast("decimal(38,0)") * cents).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("qa"),
        F.count(F.when(~arm_a, 1)).alias("nb"),
        F.sum(F.when(~arm_a, cents).otherwise(0)).alias("sb"),
        F.sum(
            F.when(
                ~arm_a, cents.cast("decimal(38,0)") * cents
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("qb"),
    )
    nad, nbd = F.col("na").cast("double"), F.col("nb").cast("double")
    sad, sbd = F.col("sa").cast("double"), F.col("sb").cast("double")
    ssa = F.col("qa").cast("double") - sad * sad / nad
    ssb = F.col("qb").cast("double") - sbd * sbd / nbd
    s_pool = F.sqrt((ssa + ssb) / (nad + nbd - F.lit(2.0)))
    d = (sad / nad - sbd / nbd) / s_pool
    var_d = (nad + nbd) / (nad * nbd) + d * d / (
        F.lit(2.0) * (nad + nbd)
    )
    eff = g.filter((F.col("na") >= 2) & (F.col("nb") >= 2)).select(
        "event_type", d.alias("d"), (F.lit(1.0) / var_d).alias("w")
    )
    w_cum = Window.orderBy("event_type").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.orderBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = eff.select(
        "event_type",
        "d",
        "w",
        F.sum(F.col("w") * F.col("d")).over(w_cum).alias("swd"),
        F.sum("w").over(w_cum).alias("sw"),
        F.count("*").over(w_all).alias("k"),
        F.row_number().over(Window.orderBy("event_type")).alias("rn"),
    )
    pooled_tbl = staged.filter(F.col("rn") == F.col("k")).select(
        (F.col("swd") / F.col("sw")).alias("pooled"), "k", "sw"
    )
    q_terms = eff.crossJoin(F.broadcast(pooled_tbl)).select(
        "event_type",
        "k",
        "pooled",
        F.sum(
            F.col("w")
            * (F.col("d") - F.col("pooled"))
            * (F.col("d") - F.col("pooled"))
        ).over(w_cum).alias("q_cum"),
        F.row_number().over(Window.orderBy("event_type")).alias("rn"),
    )
    fin = q_terms.filter(F.col("rn") == F.col("k"))
    i2 = F.greatest(
        F.lit(0.0),
        (F.col("q_cum") - (F.col("k").cast("double") - 1)) / F.col("q_cum"),
    )
    return fin.select(
        F.col("k").cast("long").alias("k_segments"),
        _r6(F.col("pooled")).alias("pooled_d"),
        _r6(F.col("q_cum")).alias("cochran_q"),
        _r6(i2).alias("i_squared"),
    )


registry.register(
    "fixed_effect_pooling",
    q_fixed_effect_pooling,
    """
    WITH g AS (
      SELECT event_type,
             COUNT(CASE WHEN h < 0.5 THEN 1 END) AS na,
             SUM(CASE WHEN h < 0.5 THEN cents ELSE 0 END) AS sa,
             SUM(CASE WHEN h < 0.5
                 THEN CAST(cents AS DECIMAL(38,0)) * cents
                 ELSE CAST(0 AS DECIMAL(38,0)) END) AS qa,
             COUNT(CASE WHEN h >= 0.5 THEN 1 END) AS nb,
             SUM(CASE WHEN h >= 0.5 THEN cents ELSE 0 END) AS sb,
             SUM(CASE WHEN h >= 0.5
                 THEN CAST(cents AS DECIMAL(38,0)) * cents
                 ELSE CAST(0 AS DECIMAL(38,0)) END) AS qb
      FROM (
        SELECT event_type,
               CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               CAST(list_sum(list_transform(generate_series(1, 8),
                 i -> (strpos('0123456789abcdef',
                       substring(md5(CAST(user_id AS VARCHAR) || ':ab'),
                                 i, 1)) - 1)
                      * 16 ** (8 - i))) AS BIGINT)
                 / 4294967296.0 AS h
        FROM events
      ) GROUP BY 1
    ),
    eff AS (
      SELECT event_type,
             (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
              - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
             / SQRT(((CAST(qa AS DOUBLE)
                      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                        / CAST(na AS DOUBLE))
                     + (CAST(qb AS DOUBLE)
                        - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                          / CAST(nb AS DOUBLE)))
                    / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2.0))
               AS d,
             na, nb
      FROM g WHERE na >= 2 AND nb >= 2
    ),
    wts AS (
      SELECT event_type, d,
             1.0 / ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                    + d * d / (2.0 * (CAST(na AS DOUBLE)
                                      + CAST(nb AS DOUBLE)))) AS w
      FROM eff
    ),
    staged AS (
      SELECT event_type, d, w,
             SUM(w * d) OVER (ORDER BY event_type
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS swd,
             SUM(w) OVER (ORDER BY event_type
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sw,
             COUNT(*) OVER () AS k,
             ROW_NUMBER() OVER (ORDER BY event_type) AS rn
      FROM wts
    ),
    pooled AS (
      SELECT swd / sw AS pooled, k FROM staged WHERE rn = k
    ),
    qt AS (
      SELECT w.event_type, p.k, p.pooled,
             SUM(w.w * (w.d - p.pooled) * (w.d - p.pooled))
               OVER (ORDER BY w.event_type
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS q_cum,
             ROW_NUMBER() OVER (ORDER BY w.event_type) AS rn
      FROM wts w CROSS JOIN pooled p
    )
    SELECT CAST(k AS BIGINT) AS k_segments,
           FLOOR(pooled * 1000000.0 + 0.5) / 1000000.0 AS pooled_d,
           FLOOR(q_cum * 1000000.0 + 0.5) / 1000000.0 AS cochran_q,
           FLOOR(GREATEST(0.0, (q_cum - (CAST(k AS DOUBLE) - 1)) / q_cum)
                 * 1000000.0 + 0.5) / 1000000.0 AS i_squared
    FROM qt WHERE rn = k
    """,
)


# ---------------------------------------------------------------------------
# Distribution-free confidence interval for the median (order statistics)
# ---------------------------------------------------------------------------


def q_median_ci_orderstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the median ship
    latency: the classic order-statistic interval [x_(l), x_(u)] with
    l = floor((n - 1.959964*sqrt(n))/2) and u = n + 1 - l -- valid
    for ANY continuous distribution (no normality, no bootstrap),
    the uncertainty answer `two_pass_median`'s point estimate lacks.

    Exactness: l and u are integer ranks computed through one shared
    floor expression (sqrt is correctly rounded; the z constant is a
    shared literal); the three order statistics (l, median, u) are
    located by the two-pass histogram in ONE rank_pick call -- no
    global sort, same oracle rank rule. Scale: two histogram passes
    over the fact, bounded tables after."""
    from airflow_baseball_spark.operators.rank_select import rank_pick

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    lat = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .cast("long")
        .alias("v")
    )
    z = "1.959964"
    lo_rank = f"CAST(FLOOR((n - {z} * SQRT(CAST(n AS DOUBLE))) / 2) AS BIGINT)"
    picked = rank_pick(
        lat,
        "v",
        [
            ("lo", lambda n, e=lo_rank: F.expr(e)),
            ("med", lambda n: F.expr("(n + 1) div 2")),
            ("hi", lambda n, e=lo_rank: F.expr(f"n + 1 - {e}")),
        ],
    )
    pv = lambda lbl: F.max(  # noqa: E731
        F.when(F.col("rank_label") == lbl, F.col("v"))
    )
    return picked.groupBy().agg(
        F.max("n").cast("long").alias("n"),
        pv("lo").cast("long").alias("ci_low"),
        pv("med").cast("long").alias("median"),
        pv("hi").cast("long").alias("ci_high"),
    )


registry.register(
    "median_ci_orderstat",
    q_median_ci_orderstat,
    """
    WITH lat AS (
      SELECT CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
                  AS BIGINT) AS v
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    ranked AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn,
             COUNT(*) OVER () AS n
      FROM lat
    ),
    ranks AS (
      SELECT n,
             CAST(FLOOR((n - 1.959964 * SQRT(CAST(n AS DOUBLE))) / 2)
                  AS BIGINT) AS lo_r
      FROM ranked LIMIT 1
    )
    SELECT CAST(MAX(r.n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN r.rn = k.lo_r THEN r.v END) AS BIGINT)
             AS ci_low,
           CAST(MAX(CASE WHEN r.rn = (r.n + 1) // 2 THEN r.v END)
                AS BIGINT) AS median,
           CAST(MAX(CASE WHEN r.rn = r.n + 1 - k.lo_r THEN r.v END)
                AS BIGINT) AS ci_high
    FROM ranked r CROSS JOIN ranks k
    """,
)


# ---------------------------------------------------------------------------
# Partial correlation: quantity vs price controlling for discount
# ---------------------------------------------------------------------------


def q_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation of quantity and extended price CONTROLLING
    for discount: r_xy.z = (r_xy - r_xz*r_yz) /
    sqrt((1-r_xz^2)(1-r_yz^2)) -- the 'is the raw correlation just
    the confounder' answer that `corr_matrix`'s marginal r cannot
    give. Reports raw and partial side by side so the confounding
    share is visible.

    Exactness: all three pairwise correlations derive from one
    map-combinable pass of exact integer/DECIMAL(38) sufficient
    statistics (units, floor-cents, discount basis points), each r
    the identical IEEE expression on both engines; the partial
    formula is a few more shared ops, `_r6`-bounded. Scale: one fact
    scan, 1-row output."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("y"),
        F.floor(F.col("l_discount") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("z"),
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    sums = li.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("z").cast("long").alias("sz"),
        F.sum(d19("x") * d19("x")).alias("sxx"),
        F.sum(d19("y") * d19("y")).alias("syy"),
        F.sum(d19("z") * d19("z")).alias("szz"),
        F.sum(d19("x") * d19("y")).alias("sxy"),
        F.sum(d19("x") * d19("z")).alias("sxz"),
        F.sum(d19("y") * d19("z")).alias("syz"),
    )
    n = F.col("n").cast("double")

    def corr(sab, sa, sb, saa, sbb):
        num = n * F.col(sab).cast("double") - F.col(sa).cast(
            "double"
        ) * F.col(sb).cast("double")
        den = F.sqrt(
            (n * F.col(saa).cast("double")
             - F.col(sa).cast("double") * F.col(sa).cast("double"))
            * (n * F.col(sbb).cast("double")
               - F.col(sb).cast("double") * F.col(sb).cast("double"))
        )
        return num / den

    rxy = corr("sxy", "sx", "sy", "sxx", "syy")
    rxz = corr("sxz", "sx", "sz", "sxx", "szz")
    ryz = corr("syz", "sy", "sz", "syy", "szz")
    partial = (rxy - rxz * ryz) / F.sqrt(
        (1.0 - rxz * rxz) * (1.0 - ryz * ryz)
    )
    return sums.select(
        F.col("n").cast("long").alias("n"),
        _r6(rxy).alias("r_qty_price"),
        _r6(rxz).alias("r_qty_disc"),
        _r6(ryz).alias("r_price_disc"),
        _r6(partial).alias("r_partial_qty_price"),
    )


registry.register(
    "partial_correlation",
    q_partial_correlation,
    """
    WITH li AS (
      SELECT CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS x,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS y,
             CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT) AS z
      FROM lineitem
    ),
    sums AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(z) AS BIGINT) AS sz,
             SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
               AS sxx,
             SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
               AS syy,
             SUM(CAST(z AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0)))
               AS szz,
             SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
               AS sxy,
             SUM(CAST(x AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0)))
               AS sxz,
             SUM(CAST(y AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0)))
               AS syz
      FROM li
    ),
    cr AS (
      SELECT n,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               AS rxy,
             (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
             / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                       - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)))
               AS rxz,
             (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
             / SQRT((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                       - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)))
               AS ryz
      FROM sums
    )
    SELECT CAST(n AS BIGINT) AS n,
           FLOOR(rxy * 1000000.0 + 0.5) / 1000000.0 AS r_qty_price,
           FLOOR(rxz * 1000000.0 + 0.5) / 1000000.0 AS r_qty_disc,
           FLOOR(ryz * 1000000.0 + 0.5) / 1000000.0 AS r_price_disc,
           FLOOR((rxy - rxz * ryz)
                 / SQRT((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
                 * 1000000.0 + 0.5) / 1000000.0 AS r_partial_qty_price
    FROM cr
    """,
)


# ---------------------------------------------------------------------------
# Cronbach's alpha over the lineitem numeric "item battery"
# ---------------------------------------------------------------------------


def q_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha treating each order's lineitem aggregates
    (total quantity, total discount bps, line count) as a 3-item
    battery scored per order: alpha = k/(k-1) * (1 - sum(var_i)/
    var_total) -- the internal-consistency coefficient behind every
    composite index ('do these three size measures move together
    enough to average into one order-size score?'). Psychometrics'
    workhorse, applied to metric design.

    Exactness: per-order item scores are exact BIGINTs; each item's
    variance and the composite's variance come from exact
    integer/DECIMAL(38) power sums; the 3-term variance sums combine
    in FIXED literal order. Scale: one lineitem shuffle on orderkey,
    then a map-combinable 1-row agg."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("q"),
        F.floor(F.col("l_discount") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("dbp"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sum("q").cast("long").alias("i1"),
        F.sum("dbp").cast("long").alias("i2"),
        F.count("*").cast("long").alias("i3"),
    ).select(
        "i1", "i2", "i3", (F.col("i1") + F.col("i2") + F.col("i3")).alias("t")
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    sums = per_order.agg(
        F.count("*").alias("n"),
        F.sum("i1").cast("long").alias("s1"),
        F.sum(d19("i1") * d19("i1")).alias("q1"),
        F.sum("i2").cast("long").alias("s2"),
        F.sum(d19("i2") * d19("i2")).alias("q2"),
        F.sum("i3").cast("long").alias("s3"),
        F.sum(d19("i3") * d19("i3")).alias("q3"),
        F.sum("t").cast("long").alias("st"),
        F.sum(d19("t") * d19("t")).alias("qt"),
    )
    n = F.col("n").cast("double")

    def var(s, q):
        sd = F.col(s).cast("double")
        return (F.col(q).cast("double") - sd * sd / n) / (n - 1)

    vsum = var("s1", "q1") + var("s2", "q2") + var("s3", "q3")
    vtot = var("st", "qt")
    alpha = F.lit(1.5) * (F.lit(1.0) - vsum / vtot)
    return sums.select(
        F.col("n").cast("long").alias("n_orders"),
        _r6(var("s1", "q1") / 1.0e6).alias("var_qty_m"),
        _r6(var("s2", "q2") / 1.0e6).alias("var_disc_m"),
        _r6(var("s3", "q3") / 1.0e6).alias("var_lines_m"),
        _r6(alpha).alias("cronbach_alpha"),
    )


registry.register(
    "cronbach_alpha",
    q_cronbach_alpha,
    """
    WITH li AS (
      SELECT l_orderkey,
             CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS q,
             CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT) AS dbp
      FROM lineitem
    ),
    per_order AS (
      SELECT l_orderkey,
             CAST(SUM(q) AS BIGINT) AS i1,
             CAST(SUM(dbp) AS BIGINT) AS i2,
             CAST(COUNT(*) AS BIGINT) AS i3
      FROM li GROUP BY 1
    ),
    w AS (
      SELECT i1, i2, i3, i1 + i2 + i3 AS t FROM per_order
    ),
    sums AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(i1) AS BIGINT) AS s1,
             SUM(CAST(i1 AS DECIMAL(19,0)) * CAST(i1 AS DECIMAL(19,0)))
               AS q1,
             CAST(SUM(i2) AS BIGINT) AS s2,
             SUM(CAST(i2 AS DECIMAL(19,0)) * CAST(i2 AS DECIMAL(19,0)))
               AS q2,
             CAST(SUM(i3) AS BIGINT) AS s3,
             SUM(CAST(i3 AS DECIMAL(19,0)) * CAST(i3 AS DECIMAL(19,0)))
               AS q3,
             CAST(SUM(t) AS BIGINT) AS st,
             SUM(CAST(t AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0)))
               AS qt
      FROM w
    ),
    vars AS (
      SELECT n,
             (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
              / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS v1,
             (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
              / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS v2,
             (CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE)
              / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS v3,
             (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
              / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS vt
      FROM sums
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           FLOOR(v1 / 1.0e6 * 1000000.0 + 0.5) / 1000000.0 AS var_qty_m,
           FLOOR(v2 / 1.0e6 * 1000000.0 + 0.5) / 1000000.0 AS var_disc_m,
           FLOOR(v3 / 1.0e6 * 1000000.0 + 0.5) / 1000000.0 AS var_lines_m,
           FLOOR(1.5 * (1.0 - (v1 + v2 + v3) / vt) * 1000000.0 + 0.5)
             / 1000000.0 AS cronbach_alpha
    FROM vars
    """,
)


# ---------------------------------------------------------------------------
# Atkinson inequality index (epsilon = 0.5) of order values
# ---------------------------------------------------------------------------


def q_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index (inequality-aversion epsilon = 0.5)
    of order values: A = 1 - ((1/n)*sum(sqrt(x)))^2 / mean(x) -- the
    welfare-theoretic member of the inequality family next to
    `gini_coefficient` (rank-based) and `theil_index` (entropy): A
    is the share of total value society would give up to equalize,
    and unlike Gini it is decomposable and tunable by epsilon.

    Exactness: x is exact floor-cents; sqrt(x) is correctly rounded
    per row and quantized to micro-units BEFORE the sum
    (quantize-before-sum -- the raw double sum is partition-
    ordered); mean(x) comes from the exact BIGINT total. Scale: one
    map-combinable fact agg, 1-row output."""
    o = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("pc"),
    )
    sums = o.agg(
        F.count("*").alias("n"),
        F.sum("pc").cast("long").alias("s"),
        F.sum(
            F.floor(F.sqrt(F.col("pc").cast("double")) * 1000000.0
                    + F.lit(0.5)).cast("long")
        ).cast("long").alias("srt6"),
    )
    n = F.col("n").cast("double")
    mean_x = F.col("s").cast("double") / n
    mean_rt = F.col("srt6").cast("double") / (n * 1000000.0)
    atk = F.lit(1.0) - mean_rt * mean_rt / mean_x
    return sums.select(
        F.col("n").cast("long").alias("n_orders"),
        _r6(mean_x / 100.0).alias("mean_value"),
        _r6(atk).alias("atkinson_05"),
    )


registry.register(
    "atkinson_index",
    q_atkinson_index,
    """
    WITH o AS (
      SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS pc
      FROM orders
    ),
    sums AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(pc) AS BIGINT) AS s,
             CAST(SUM(CAST(FLOOR(SQRT(CAST(pc AS DOUBLE)) * 1000000.0
                                 + 0.5) AS BIGINT)) AS BIGINT) AS srt6
      FROM o
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           FLOOR(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
                 * 1000000.0 + 0.5) / 1000000.0 AS mean_value,
           FLOOR((1.0 - (CAST(srt6 AS DOUBLE)
                         / (CAST(n AS DOUBLE) * 1000000.0))
                        * (CAST(srt6 AS DOUBLE)
                           / (CAST(n AS DOUBLE) * 1000000.0))
                        / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0 AS atkinson_05
    FROM sums
    """,
)


# ---------------------------------------------------------------------------
# TwoNN intrinsic dimension estimate of the embedding space
# ---------------------------------------------------------------------------


def q_intrinsic_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TwoNN intrinsic-dimension estimate (Facco et al. 2017) of the
    embedding corpus: for each probe vector the ratio mu = d2/d1 of
    its second- to first-nearest-neighbor distance, and the MLE
    id = n / sum(ln mu) -- 'how many degrees of freedom do these
    64-dim vectors actually use', the diagnostic that explains why
    `matryoshka_recall` barely drops when truncating dims and how
    aggressively `embedding_quantize`/PQ can compress.

    Determinism: 20 fixed probes (vec_id % 32 = 0, < 640) broadcast
    against the corpus; squared distances sum the 64 dims IN ARRAY
    ORDER on both engines (the cosine_topk in-order precedent); the
    two smallest are found by lexicographic MIN of (d2, id) then a
    second MIN over the remainder (never a corpus-wide sort); each
    ln(d2^2/d1^2) is floor-quantized to 1e-9 before the probe sum,
    id = 2n/(sum/1e9). Zero-distance duplicates are excluded
    identically. Scale: probe set is O(1); one broadcast pass."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    probes = emb.filter(
        (F.col("vec_id") % 32 == 0) & (F.col("vec_id") < 640)
    ).select(
        F.col("vec_id").alias("pid"), F.col("embedding").alias("pv")
    )
    d2_expr = F.expr(
        "aggregate(zip_with(pv, embedding, (a, b) ->"
        " (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"
        " * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),"
        " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    scored = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("pid"))
        .select(
            "pid",
            F.struct(
                d2_expr.alias("d2"), F.col("vec_id").alias("nid")
            ).alias("s"),
        )
    )
    first = scored.groupBy("pid").agg(F.min("s").alias("s1"))
    second = (
        scored.join(F.broadcast(first), "pid")
        .filter(F.col("s") != F.col("s1"))
        .groupBy("pid")
        .agg(F.min("s").alias("s2"), F.first("s1").alias("s1"))
    )
    terms = second.filter(F.col("s1.d2") > 0).select(
        "pid",
        F.floor(
            F.log(F.col("s2.d2") / F.col("s1.d2")) * 1.0e9 + F.lit(0.5)
        ).cast("long").alias("lr9"),
    )
    agg = terms.agg(
        F.count("*").cast("long").alias("n_probes"),
        F.sum("lr9").cast("long").alias("slr9"),
    )
    id_hat = (
        F.lit(2.0)
        * F.col("n_probes").cast("double")
        / (F.col("slr9").cast("double") / 1.0e9)
    )
    return agg.select(
        "n_probes",
        _r6(F.col("slr9").cast("double") / 1.0e9 / 2.0
            / F.col("n_probes").cast("double")).alias("mean_ln_mu"),
        _r6(id_hat).alias("intrinsic_dim"),
    )


registry.register(
    "intrinsic_dimension",
    q_intrinsic_dimension,
    """
    WITH probes AS (
      SELECT vec_id AS pid, embedding AS pv
      FROM embeddings WHERE vec_id % 32 = 0 AND vec_id < 640
    ),
    scored AS (
      SELECT p.pid, e.vec_id AS nid,
             (SELECT SUM((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                         * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)))
              FROM (SELECT unnest(p.pv) x, unnest(e.embedding) y)) AS d2
      FROM embeddings e CROSS JOIN probes p
      WHERE e.vec_id <> p.pid
    ),
    first AS (
      SELECT pid, d2 AS d1sq, nid AS nid1 FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY pid
                                     ORDER BY d2, nid) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    second AS (
      SELECT s.pid, f.d1sq, MIN(struct_pack(d2 := s.d2, nid := s.nid))
               AS s2
      FROM scored s JOIN first f ON s.pid = f.pid
      WHERE NOT (s.d2 = f.d1sq AND s.nid = f.nid1)
      GROUP BY s.pid, f.d1sq
    ),
    terms AS (
      SELECT pid,
             CAST(FLOOR(LN(s2.d2 / d1sq) * 1.0e9 + 0.5) AS BIGINT) AS lr9
      FROM second WHERE d1sq > 0
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
             CAST(SUM(lr9) AS BIGINT) AS slr9
      FROM terms
    )
    SELECT n_probes,
           FLOOR(CAST(slr9 AS DOUBLE) / 1.0e9 / 2.0
                 / CAST(n_probes AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS mean_ln_mu,
           FLOOR(2.0 * CAST(n_probes AS DOUBLE)
                 / (CAST(slr9 AS DOUBLE) / 1.0e9) * 1000000.0 + 0.5)
             / 1000000.0 AS intrinsic_dim
    FROM agg
    """,
)
