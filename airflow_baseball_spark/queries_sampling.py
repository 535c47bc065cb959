"""Sampling / splitting driver queries: hash sampling, train/test
splits, stratified sampling and k-fold assignment, the Poisson
bootstrap CI, and Efraimidis-Spirakis weighted reservoir sampling.
Oracles recompute the md5 unit hash independently in DuckDB —
assignments must match row-for-row, which is the whole point of
hash-based (vs rand-based) splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_baseball_spark import registry
from airflow_baseball_spark.functions.scalar import dec_portable
from airflow_baseball_spark.functions.scalar import round6_portable as _r6
from airflow_baseball_spark.operators.sampling import (
    hash_sample,
    hash_unit_sql,
    stratified_sample,
    train_test_split,
)
from airflow_baseball_spark.schemas import load_table

_U_DOC = hash_unit_sql("doc_id", "42")
_U_EV = hash_unit_sql("event_id", "7")


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return train_test_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed="42"
    ).select("doc_id", "split")


registry.register(
    "train_test_split",
    q_train_test_split,
    f"""
    SELECT doc_id,
           CASE WHEN {_U_DOC} < 0.8 THEN 'train'
                WHEN {_U_DOC} < 0.9 THEN 'val'
                WHEN {_U_DOC} < 1.0 THEN 'test'
                ELSE 'held' END AS split
    FROM documents
    """,
)


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return hash_sample(ev, "event_id", 0.1, seed="7").select(
        "event_id", "event_type"
    )


registry.register(
    "hash_sample",
    q_hash_sample,
    f"""
    SELECT event_id, event_type FROM events WHERE {_U_EV} < 0.1
    """,
)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the noisy event types, keep purchases whole."""
    ev = load_table(spark, sf_dir, "events")
    out = stratified_sample(
        ev,
        "event_type",
        {"purchase": 1.0, "view": 0.2, "click": 0.2},
        id_col="event_id",
        default_fraction=0.05,
        seed="7",
    )
    return out.select("event_id", "event_type")


registry.register(
    "stratified_sample",
    q_stratified_sample,
    f"""
    SELECT event_id, event_type
    FROM events
    WHERE {_U_EV} < CASE event_type
                      WHEN 'purchase' THEN 1.0
                      WHEN 'view' THEN 0.2
                      WHEN 'click' THEN 0.2
                      ELSE 0.05 END
    """,
)


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (CCNet/C4-style): at most 15 docs per source,
    survivors chosen by identity hash so the cap is a uniform stable
    sample of each domain, not arrival order."""
    from airflow_baseball_spark.operators.sampling import domain_cap

    docs = load_table(spark, sf_dir, "documents")
    return domain_cap(docs, "source", 15, id_col="doc_id", seed="11").select(
        "doc_id", "source", "domain_rank"
    )


registry.register(
    "domain_cap",
    q_domain_cap,
    f"""
    SELECT doc_id, source, domain_rank FROM (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {hash_unit_sql("doc_id", "11")}, doc_id
             ) AS BIGINT) AS domain_rank
      FROM documents
    ) WHERE domain_rank <= 15
    """,
)


def q_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling of the labeled embeddings: every
    label keeps exactly min-class-count rows, chosen by a
    DETERMINISTIC hash order (md5 of the id — no RNG, so the sample
    is reproducible at any parallelism and any engine). The rank
    window partitions by label; the min count is a labels-sized
    aggregate broadcast back. Output: per-label kept counts plus the
    hash-order checksum of the kept ids, so the oracle attests WHICH
    rows were kept, not just how many."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    counts = emb.groupBy("label").agg(F.count("*").alias("n"))
    min_n = counts.agg(F.min("n").alias("min_n"))
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    kept = (
        emb.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(min_n))
        .filter(F.col("rk") <= F.col("min_n"))
    )
    return kept.groupBy("label").agg(
        F.count("*").alias("n_kept"),
        F.sum("vec_id").cast("long").alias("kept_id_sum"),
    )


registry.register(
    "class_balance",
    q_class_balance,
    """
    WITH counts AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
    mn AS (SELECT MIN(n) AS min_n FROM counts),
    ranked AS (
      SELECT label, vec_id,
             ROW_NUMBER() OVER (
               PARTITION BY label
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
      FROM embeddings
    )
    SELECT label, COUNT(*) AS n_kept,
           CAST(SUM(vec_id) AS BIGINT) AS kept_id_sum
    FROM ranked CROSS JOIN mn
    WHERE rk <= min_n
    GROUP BY label
    """,
)


def q_churn_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn screen: users whose LAST event is more than 7 days before
    the corpus horizon (max ts), with their inactivity gap in hours.
    Horizon and per-user last-seen come from the same scan (the
    horizon is a 1-row broadcast); all arithmetic is exact epoch-µs."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("us")
    )
    last = ev.groupBy("user_id").agg(F.max("us").alias("last_us"))
    horizon = ev.agg(F.max("us").alias("h"))
    seven_d = 7 * 24 * 3600 * 1000000
    j = last.crossJoin(F.broadcast(horizon))
    return j.select(
        "user_id",
        _r6(
            (F.col("h") - F.col("last_us")).cast("double") / 3600000000.0
        ).alias("idle_hours"),
        (F.col("h") - F.col("last_us") > F.lit(seven_d)).alias("churned"),
    )


registry.register(
    "churn_flag",
    q_churn_flag,
    f"""
    WITH l AS (
      SELECT user_id, MAX(epoch_us(ts)) AS last_us FROM events
      GROUP BY user_id
    ),
    h AS (SELECT MAX(epoch_us(ts)) AS h FROM events)
    SELECT user_id,
           FLOOR((CAST(h.h - l.last_us AS DOUBLE) / 3600000000.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS idle_hours,
           h.h - l.last_us > {7 * 24 * 3600 * 1000000} AS churned
    FROM l CROSS JOIN h
    """,
)


# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap CI for the mean
# ---------------------------------------------------------------------------

_BOOT_B = 40
# cumulative Poisson(1) probabilities, identical decimal literals on
# both engines (weights 0..5, remainder -> 6)
_POIS_CUM = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
)


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-bootstrap 95% CI for the mean order price via the
    POISSON bootstrap — the resampling scheme that actually
    distributes: sampling-with-replacement needs global indexing, but
    Poisson(1) per-row replicate weights are iid, so each partition
    draws its own weights and the replicate means reduce map-side
    (this is how bootstrap runs on sharded data at 100 TB).

    Determinism: the Poisson draws invert md5 identity hashes against
    fixed cumulative thresholds — engine-identical weights
    row-for-row. Cost lever: each md5 yields FOUR independent 32-bit
    coins (hex chars 1-8, 9-16, 17-24, 25-32), so B=40 replicates
    need 10 digests per row, not 40 — the digest is the dominant
    per-row cost (r9: 2 coins -> 4 halved the bench time again,
    identical construction, equally-valid iid draws). The digest is
    computed BEFORE the explode, so it prices once per (row, digest).
    CI = rank 1 and B−1 of the B sorted replicate means (B-sized
    sort); means are exact integer Σw·cents / Σw."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (dec_portable("o_totalprice", 18, 2) * 100).cast("long")
    base = orders.select(F.col("o_orderkey").alias("k"), cents.alias("v"))
    # r11 (optimization): the replicate digests (10 md5 + 40 conv per
    # order row) are the dominant cost and sit BELOW the first exchange,
    # so a single-file scan ran them all on one task — spread() buys
    # full parallelism and is a no-op once the scan yields enough splits.
    from airflow_baseball_spark.partitioning import spread

    rep = spread(base).select(
        "k",
        "v",
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B // 4))).alias("b"),
    )
    h = F.md5(
        F.concat(
            F.concat_ws(
                "-", F.col("k").cast("string"), F.col("b").cast("string")
            ),
            F.lit(":boot"),
        )
    )
    withh = rep.select("v", "b", h.alias("h"))

    def pois(offset: int):
        u = F.conv(F.substring("h", offset, 8), 16, 10).cast("long") / F.lit(
            float(2**32)
        )
        w = F.when(u < _POIS_CUM[0], 0)
        for i, c in enumerate(_POIS_CUM[1:], start=1):
            w = w.when(u < c, i)
        return w.otherwise(6)

    # all four coins fold in ONE groupBy(b) — the 4x explode never
    # materializes; the 40 replicate means unpack from 10 group rows
    aggs = []
    for q in range(1, 5):
        aggs += [
            F.sum(F.col(f"w{q}") * F.col("v")).alias(f"s{q}"),
            F.sum(f"w{q}").alias(f"c{q}"),
        ]
    per_b = (
        withh.select(
            "b",
            "v",
            *[pois(1 + 8 * (q - 1)).alias(f"w{q}") for q in range(1, 5)],
        )
        .groupBy("b")
        .agg(*aggs)
    )
    means = per_b.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("b") * 4 - (4 - q)).alias("r"),
                        (
                            F.col(f"s{q}").cast("double")
                            / (F.lit(100.0) * F.col(f"c{q}").cast("double"))
                        ).alias("m"),
                    )
                    for q in range(1, 5)
                ]
            )
        ).alias("x")
    ).select(F.col("x.r").alias("r"), F.col("x.m").alias("m"))
    w_rank = Window.orderBy("m", "r")
    ranked = means.select("m", F.row_number().over(w_rank).alias("rn"))
    point = base.agg(
        F.count("*").alias("n_orders"),
        (
            F.sum("v").cast("double")
            / (F.lit(100.0) * F.count("*").cast("double"))
        ).alias("mean_price"),
    )
    ci = ranked.agg(
        F.lit(_BOOT_B).cast("long").alias("n_replicates"),
        F.min(F.when(F.col("rn") == 1, F.col("m"))).alias("lo"),
        F.min(F.when(F.col("rn") == _BOOT_B - 1, F.col("m"))).alias("hi"),
    )
    return point.crossJoin(ci).select(
        F.col("n_orders").cast("long").alias("n_orders"),
        _r6(F.col("mean_price")).alias("mean_price"),
        "n_replicates",
        _r6(F.col("lo")).alias("ci_lo"),
        _r6(F.col("hi")).alias("ci_hi"),
    )


def _hex8_int_sql(expr: str) -> str:
    """Exact integer of an 8-hex-char string column (no re-hashing)."""
    return f"""list_sum(list_transform(generate_series(1, 8),
        i -> (strpos('0123456789abcdef', substring({expr}, i, 1)) - 1)
             * 16 ** (8 - i)))"""


def _bootstrap_sql() -> str:
    cases = {
        q: " ".join(
            f"WHEN u{q} < {c!r} THEN {i}" for i, c in enumerate(_POIS_CUM)
        )
        for q in range(1, 5)
    }
    us = ", ".join(
        _hex8_int_sql(f"substring(h, {1 + 8 * (q - 1)}, 8)")
        + f" / 4294967296.0 AS u{q}"
        for q in range(1, 5)
    )
    w_cols = ", ".join(
        f"CASE {cases[q]} ELSE 6 END AS w{q}" for q in range(1, 5)
    )
    sums = ", ".join(
        f"SUM(w{q} * v) AS s{q}, SUM(w{q}) AS c{q}" for q in range(1, 5)
    )
    mean_rows = "\n      UNION ALL\n".join(
        f"""      SELECT 4 * b - {4 - q} AS r,
             CAST(s{q} AS DOUBLE) / (100.0 * CAST(c{q} AS DOUBLE)) AS m
      FROM per_b"""
        for q in range(1, 5)
    )
    return f"""
    WITH base AS (
      SELECT o_orderkey AS k,
             CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM orders
    ),
    rep AS (
      SELECT k, v, CAST(b AS INTEGER) AS b,
             md5(CAST(k AS VARCHAR) || '-' || CAST(b AS VARCHAR)
                 || ':boot') AS h
      FROM base, LATERAL unnest(generate_series(1, {_BOOT_B // 4})) AS g(b)
    ),
    weighted AS (
      SELECT b, v, {w_cols}
      FROM (SELECT b, v, {us} FROM rep)
    ),
    per_b AS (
      SELECT b, {sums}
      FROM weighted GROUP BY 1
    ),
    means AS (
{mean_rows}
    ),
    ranked AS (
      SELECT m, ROW_NUMBER() OVER (ORDER BY m, r) AS rn FROM means
    ),
    point AS (
      SELECT COUNT(*) AS n_orders,
             CAST(SUM(v) AS DOUBLE) / (100.0 * CAST(COUNT(*) AS DOUBLE))
               AS mean_price
      FROM base
    ),
    ci AS (
      SELECT CAST({_BOOT_B} AS BIGINT) AS n_replicates,
             MIN(CASE WHEN rn = 1 THEN m END) AS lo,
             MIN(CASE WHEN rn = {_BOOT_B - 1} THEN m END) AS hi
      FROM ranked
    )
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
           FLOOR(mean_price * 1000000.0 + 0.5) / 1000000.0 AS mean_price,
           n_replicates,
           FLOOR(lo * 1000000.0 + 0.5) / 1000000.0 AS ci_lo,
           FLOOR(hi * 1000000.0 + 0.5) / 1000000.0 AS ci_hi
    FROM point CROSS JOIN ci
    """


registry.register("bootstrap_ci", q_bootstrap_ci, _bootstrap_sql())


# ---------------------------------------------------------------------------
# Weighted reservoir sampling without replacement (Efraimidis-Spirakis)
# ---------------------------------------------------------------------------


def q_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 orders per segment sampled ∝ price WITHOUT replacement
    via Efraimidis-Spirakis A-ES keys: score = ln(u)/w, keep the k
    largest — THE distributed weighted-reservoir algorithm (each
    partition keeps its own top-k of iid keys, merge is another
    top-k; no global state, no sequential pass). weighted_sample is
    the with-replacement/Bernoulli sibling.

    Determinism: u is the md5 identity coin, w the exact cent weight;
    rank orders (score DESC, orderkey) so a sub-ulp score tie cannot
    flip membership between engines.

    r7: the merge is now EXPLICITLY two-phase — top-5 per
    (segment, key-salt block) in parallel, then top-5 of the ≤ 64·5
    block survivors per segment — so a 5-valued segment key never
    funnels a segment's full volume through one window task (the
    low-cardinality-window sweep; the top-5 of block top-5s is
    exactly the global top-5)."""
    from airflow_baseball_spark.operators.sampling import hash_unit

    orders = load_table(spark, sf_dir, "orders").join(
        load_table(spark, sf_dir, "customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    cents = (dec_portable("o_totalprice", 18, 2) * 100).cast("long")
    u = hash_unit(F.col("o_orderkey"), seed="aes")
    base = orders.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderkey").alias("k"),
        cents.alias("w"),
        (F.log(u) / cents.cast("double")).alias("score"),
    )
    w_blk = Window.partitionBy("seg", F.expr("k % 64")).orderBy(
        F.col("score").desc(), "k"
    )
    survivors = base.withColumn("brk", F.row_number().over(w_blk)).filter(
        F.col("brk") <= 5
    )
    wr = Window.partitionBy("seg").orderBy(F.col("score").desc(), "k")
    return (
        survivors.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("seg").alias("c_mktsegment"),
            F.col("rk").cast("long").alias("rank"),
            F.col("k").alias("o_orderkey"),
            (F.col("w").cast("double") / 100.0).alias("o_totalprice"),
        )
    )


def _weighted_reservoir_sql() -> str:
    u = hash_unit_sql("o_orderkey", "aes")
    return f"""
    WITH base AS (
      SELECT c.c_mktsegment AS seg, o.o_orderkey AS k,
             CAST(CAST(FLOOR(o.o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS w,
             LN({u})
               / CAST(CAST(CAST(FLOOR(o.o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100
                           AS BIGINT) AS DOUBLE) AS score
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT seg AS c_mktsegment,
           CAST(rk AS BIGINT) AS rank,
           k AS o_orderkey,
           CAST(w AS DOUBLE) / 100.0 AS o_totalprice
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY seg
                                   ORDER BY score DESC, k) AS rk
      FROM base
    ) WHERE rk <= 5
    """


registry.register(
    "weighted_reservoir", q_weighted_reservoir, _weighted_reservoir_sql()
)


# ---------------------------------------------------------------------------
# Stratified k-fold assignment
# ---------------------------------------------------------------------------


def q_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation assignment stratified by language:
    within each language, docs order by the md5 identity coin and
    take fold = row_number mod 5 — every fold carries each language's
    share to within one doc (train_test_split's k-fold sibling;
    hash-ordering inside the stratum keeps folds random-looking yet
    reproducible). Output is the (lang, fold) balance table the
    assignment guarantees; one window per stratum, all counts."""
    from airflow_baseball_spark.operators.sampling import hash_unit

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        hash_unit(F.col("doc_id"), seed="fold"), "doc_id"
    )
    assigned = docs.select(
        "lang", ((F.row_number().over(w) - 1) % 5).alias("fold")
    )
    return assigned.groupBy("lang", "fold").agg(
        F.count("*").cast("long").alias("n_docs")
    )


def _kfold_sql() -> str:
    u = hash_unit_sql("doc_id", "fold")
    return f"""
    WITH assigned AS (
      SELECT lang,
             (ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY {u}, doc_id) - 1) % 5 AS fold
      FROM documents
    )
    SELECT lang, fold, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM assigned GROUP BY 1, 2
    """


registry.register("stratified_kfold", q_stratified_kfold, _kfold_sql())


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch (SRM) check
# ---------------------------------------------------------------------------


def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The experimentation-platform guardrail: users hash-assigned
    50/50 to A/B, then a χ² sample-ratio-mismatch statistic against
    the declared split — an SRM flags broken assignment plumbing
    before anyone reads the metric (here the md5 coin is the
    assignment, so the stat doubles as a uniformity audit of the
    coin itself).

    Exact group counts from one distinct-users aggregate; χ² =
    (na−nb)²/(na+nb) for a 50/50 split, one shared expression from
    two integers. The flag compares the χ² against 3.84 (α=0.05,
    1 dof) — a constant threshold, so the boolean is as deterministic
    as the counts."""
    from airflow_baseball_spark.operators.sampling import hash_unit

    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    arm = F.when(hash_unit(F.col("user_id"), seed="ab") < 0.5, "A").otherwise(
        "B"
    )
    counts = users.select(arm.alias("arm")).groupBy().agg(
        F.count(F.when(F.col("arm") == "A", 1)).alias("na"),
        F.count(F.when(F.col("arm") == "B", 1)).alias("nb"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    chi2 = (na - nb) * (na - nb) / (na + nb)
    return counts.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        _r6(chi2).alias("srm_chi2"),
        (chi2 > 3.841458820694124).alias("srm_detected"),
    )


def _srm_sql() -> str:
    u = hash_unit_sql("user_id", "ab")
    return f"""
    WITH users AS (SELECT DISTINCT user_id FROM events),
    counts AS (
      SELECT COUNT(CASE WHEN {u} < 0.5 THEN 1 END) AS na,
             COUNT(CASE WHEN {u} >= 0.5 THEN 1 END) AS nb
      FROM users
    )
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           FLOOR(((CAST(na AS DOUBLE) - CAST(nb AS DOUBLE))
                  * (CAST(na AS DOUBLE) - CAST(nb AS DOUBLE))
                  / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0 AS srm_chi2,
           ((CAST(na AS DOUBLE) - CAST(nb AS DOUBLE))
            * (CAST(na AS DOUBLE) - CAST(nb AS DOUBLE))
            / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
             > 3.841458820694124 AS srm_detected
    FROM counts
    """


registry.register("srm_check", q_srm_check, _srm_sql())


# ---------------------------------------------------------------------------
# Cross-fold metric variance
# ---------------------------------------------------------------------------


def q_cv_metric_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does a 5-fold split give stable metrics? Per-fold mean doc
    length plus the across-fold variance of those means — the sanity
    panel a CV pipeline prints before trusting fold-level eval
    deltas (stratified_kfold makes the assignment; this closes the
    loop by measuring it).

    Per-fold sums are exact integers; the 5-term variance of means
    uses the integer sufficient-statistics identity on the per-fold
    (n, Σ) pairs through one shared expression."""
    from airflow_baseball_spark.operators.sampling import hash_unit

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        hash_unit(F.col("doc_id"), seed="fold"), "doc_id"
    )
    assigned = docs.select(
        ((F.row_number().over(w) - 1) % 5).alias("fold"),
        F.length("text").cast("long").alias("len"),
    )
    per_fold = assigned.groupBy("fold").agg(
        F.count("*").alias("n"), F.sum("len").alias("s")
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    wn = Window.partitionBy()
    staged = per_fold.select(
        "fold",
        "n",
        mean.alias("m"),
        F.sum(mean).over(wn).alias("sm"),
        F.sum(mean * mean).over(wn).alias("sm2"),
        F.count("*").over(wn).alias("k"),
    )
    return staged.select(
        F.col("fold").cast("long").alias("fold"),
        F.col("n").cast("long").alias("n_docs"),
        _r6(F.col("m")).alias("fold_mean_len"),
        _r6(
            (F.col("sm2") - F.col("sm") * F.col("sm") / F.col("k"))
            / F.col("k")
        ).alias("var_of_fold_means"),
    )


def _cv_var_sql() -> str:
    u = hash_unit_sql("doc_id", "fold")
    return f"""
    WITH assigned AS (
      SELECT (ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY {u}, doc_id) - 1) % 5 AS fold,
             CAST(LENGTH(text) AS BIGINT) AS len
      FROM documents
    ),
    per_fold AS (
      SELECT fold, COUNT(*) AS n, SUM(len) AS s
      FROM assigned GROUP BY 1
    ),
    staged AS (
      SELECT fold, n,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
             SUM(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) OVER () AS sm,
             SUM((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) OVER () AS sm2,
             COUNT(*) OVER () AS k
      FROM per_fold
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(n AS BIGINT) AS n_docs,
           FLOOR(m * 1000000.0 + 0.5) / 1000000.0 AS fold_mean_len,
           FLOOR(((sm2 - sm * sm / k) / k) * 1000000.0 + 0.5) / 1000000.0
             AS var_of_fold_means
    FROM staged
    """


registry.register(
    "cv_metric_variance", q_cv_metric_variance, _cv_var_sql()
)


# ---------------------------------------------------------------------------
# Referentially-consistent warehouse sample
# ---------------------------------------------------------------------------


def q_consistent_fk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referentially-consistent downsampling of the warehouse: pick 5%
    of CUSTOMERS by key hash, then take the FK closure — their orders
    and those orders' lineitems — so every sampled row's parent is
    also in the sample (the property row-independent sampling
    destroys, and the reason dev/staging copies of a warehouse are
    sampled by entity, not by row). Reports per-segment closure sizes
    and fan-out ratios as the sample's audit card.

    Shapes: the coin is the same md5 unit hash every split op here
    uses (so the sample is reproducible on any engine); the closure
    is two key-equi joins that shuffle only sampled keys; ratios are
    integer micro-divisions."""
    cust = hash_sample(
        load_table(spark, sf_dir, "customer"), "c_custkey", 0.05, seed="13"
    ).select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    s_orders = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select("c_mktsegment", "o_orderkey")
    s_items = s_orders.join(
        li, s_orders["o_orderkey"] == li["l_orderkey"]
    ).groupBy("c_mktsegment").agg(F.count("*").alias("n_lineitems"))
    per_seg = (
        cust.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .join(
            s_orders.groupBy("c_mktsegment").agg(
                F.count("*").alias("n_orders")
            ),
            "c_mktsegment",
            "left",
        )
        .join(s_items, "c_mktsegment", "left")
    )
    return per_seg.select(
        "c_mktsegment",
        "n_customers",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_lineitems", F.lit(0)).alias("n_lineitems"),
        F.expr(
            "(COALESCE(n_orders, 0) * 1000000) DIV n_customers"
        ).alias("orders_per_cust_micro"),
        F.when(
            F.coalesce("n_orders", F.lit(0)) > 0,
            F.expr("(COALESCE(n_lineitems, 0) * 1000000)"
                   " DIV COALESCE(n_orders, 1)"),
        ).otherwise(F.lit(0)).alias("items_per_order_micro"),
    )


_U_CUST = hash_unit_sql("c_custkey", "13")

registry.register(
    "consistent_fk_sample",
    q_consistent_fk_sample,
    f"""
    WITH sc AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE {_U_CUST} < 0.05
    ),
    so AS (
      SELECT c.c_mktsegment, o.o_orderkey
      FROM orders o JOIN sc c ON o.o_custkey = c.c_custkey
    ),
    si AS (
      SELECT s.c_mktsegment, COUNT(*) AS n_lineitems
      FROM so s JOIN lineitem l ON s.o_orderkey = l.l_orderkey
      GROUP BY 1
    ),
    seg AS (
      SELECT c.c_mktsegment,
             COUNT(*) AS n_customers,
             (SELECT COUNT(*) FROM so s
              WHERE s.c_mktsegment = c.c_mktsegment) AS n_orders,
             (SELECT COALESCE(MAX(n_lineitems), 0) FROM si i
              WHERE i.c_mktsegment = c.c_mktsegment) AS n_lineitems
      FROM sc c GROUP BY 1
    )
    SELECT c_mktsegment,
           CAST(n_customers AS BIGINT) AS n_customers,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(n_lineitems AS BIGINT) AS n_lineitems,
           (n_orders * 1000000) // n_customers AS orders_per_cust_micro,
           CASE WHEN n_orders > 0
                THEN (n_lineitems * 1000000) // n_orders
                ELSE 0 END AS items_per_order_micro
    FROM seg
    """,
)


# ---------------------------------------------------------------------------
# Neyman optimal stratified-sample allocation
# ---------------------------------------------------------------------------


def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal allocation of a 10,000-row sample budget across
    the 5 order-priority strata: n_h ∝ N_h·S_h — the sampling plan a
    100 TB pipeline computes BEFORE drawing a quality-audit sample
    (`stratified_sample` draws proportionally; Neyman reweights
    toward high-variance strata, and the efficiency ratio column
    reports exactly how much variance that buys back).

    Exactness: per-stratum variance comes from exact integer
    sufficient statistics (n, Σ, Σ² in DECIMAL(38,0)); the weight
    N_h·S_h is quantized to micro-unit DECIMAL before any cross-row
    use, so the allocation itself is the mixture_weights
    largest-remainder apportionment on exact integers — quotas sum to
    the budget EXACTLY. The design-effect ratio (V_proportional /
    V_neyman ≥ 1) is assembled from the same quantized sums.

    Scale: one combinable fact pass to 5 stratum rows; everything
    after is stratum-count-sized."""
    budget = 10000
    orders = load_table(spark, sf_dir, "orders")
    cents = (dec_portable("o_totalprice", 18, 2) * 100).cast(
        "long"
    )
    g = orders.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count("*").alias("nh"),
        F.sum(cents).alias("sh"),
        F.sum(cents.cast("decimal(38,0)") * cents).alias("qh"),
    )
    nhd = F.col("nh").cast("double")
    var = (
        F.col("qh").cast("double")
        - F.col("sh").cast("double") * F.col("sh").cast("double") / nhd
    ) / (nhd - F.lit(1.0))
    sd = F.sqrt(var)
    # quantize N_h*S_h to whole cents BEFORE the cross-stratum sums
    # (cent-resolution is ample for apportionment and keeps the
    # FLOOR->BIGINT step inside int64 at any realistic SF)
    wq = F.floor(nhd * sd + F.lit(0.5)).cast("decimal(38,0)")
    # quantize N_h*S_h^2 the same way (proportional-allocation variance)
    vq = F.floor(nhd * var + F.lit(0.5)).cast("decimal(38,0)")
    wn = Window.partitionBy()
    staged = g.select(
        "stratum",
        "nh",
        sd.alias("s_h"),
        wq.alias("wq"),
        vq.alias("vq"),
        F.sum(wq).over(wn).alias("w_tot"),
        F.sum(vq).over(wn).alias("v_tot"),
        F.sum("nh").over(wn).alias("n_tot"),
    )
    base = F.expr("CAST(wq * %d DIV w_tot AS BIGINT)" % budget)
    rem = F.expr("CAST((wq * %d) %% w_tot AS DECIMAL(38,0))" % budget)
    based = staged.select(
        "*",
        base.alias("base"),
        rem.alias("frac"),
    )
    w_rem = Window.orderBy(F.col("frac").desc(), "stratum")
    wn2 = Window.partitionBy()
    ranked = based.select(
        "*",
        F.row_number().over(w_rem).alias("rn"),
        (F.lit(budget) - F.sum("base").over(wn2)).alias("short"),
    )
    wtd = F.col("w_tot").cast("double")
    vtd = F.col("v_tot").cast("double")
    ntd = F.col("n_tot").cast("double")
    bd = F.lit(float(budget))
    v_ney = wtd * wtd / (ntd * ntd * bd)
    v_prop = vtd / (ntd * bd)
    return ranked.select(
        "stratum",
        F.col("nh").cast("long").alias("n_pop"),
        _r6(F.col("s_h")).alias("s_h_cents"),
        (
            F.col("base")
            + F.when(F.col("rn") <= F.col("short"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_alloc"),
        _r6(v_prop / v_ney).alias("neyman_efficiency"),
    )


def _neyman_sql() -> str:
    budget = 10000
    return f"""
    WITH g AS (
      SELECT o_orderpriority AS stratum, COUNT(*) AS nh,
             SUM(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS sh,
             SUM(CAST(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100
                           AS BIGINT) AS HUGEINT)
                 * CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS qh
      FROM orders GROUP BY 1
    ),
    staged AS (
      SELECT stratum, nh,
             sqrt((CAST(qh AS DOUBLE)
                   - CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE)
                     / CAST(nh AS DOUBLE))
                  / (CAST(nh AS DOUBLE) - 1.0)) AS s_h,
             CAST(FLOOR(CAST(nh AS DOUBLE)
                        * sqrt((CAST(qh AS DOUBLE)
                                - CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE)
                                  / CAST(nh AS DOUBLE))
                               / (CAST(nh AS DOUBLE) - 1.0))
                        + 0.5) AS HUGEINT) AS wq,
             CAST(FLOOR(CAST(nh AS DOUBLE)
                        * ((CAST(qh AS DOUBLE)
                            - CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE)
                              / CAST(nh AS DOUBLE))
                           / (CAST(nh AS DOUBLE) - 1.0))
                        + 0.5) AS HUGEINT) AS vq
      FROM g
    ),
    tot AS (
      SELECT stratum, nh, s_h, wq, vq,
             SUM(wq) OVER () AS w_tot, SUM(vq) OVER () AS v_tot,
             SUM(nh) OVER () AS n_tot
      FROM staged
    ),
    based AS (
      SELECT *,
             CAST(wq * {budget} // w_tot AS BIGINT) AS base,
             (wq * {budget}) % w_tot AS frac
      FROM tot
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY frac DESC, stratum) AS rn,
             {budget} - SUM(base) OVER () AS short
      FROM based
    )
    SELECT stratum, CAST(nh AS BIGINT) AS n_pop,
           FLOOR(s_h * 1000000.0 + 0.5) / 1000000.0 AS s_h_cents,
           CAST(base + CASE WHEN rn <= short THEN 1 ELSE 0 END
                AS BIGINT) AS n_alloc,
           FLOOR((CAST(v_tot AS DOUBLE)
                  / (CAST(n_tot AS DOUBLE) * {budget}.0))
                 / (CAST(w_tot AS DOUBLE) * CAST(w_tot AS DOUBLE)
                    / (CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE)
                       * {budget}.0))
                 * 1000000.0 + 0.5) / 1000000.0 AS neyman_efficiency
    FROM ranked
    """


registry.register("neyman_allocation", q_neyman_allocation, _neyman_sql())


# ---------------------------------------------------------------------------
# Permutation test (md5-coin label swaps, map-side replicates)
# ---------------------------------------------------------------------------

_PERM_R = 64  # replicates (two per digest — the bootstrap_ci cost lever)


def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample permutation test for the purchase-vs-click mean
    value difference: R random relabelings of the pooled sample, the
    p-value is the fraction of replicates whose |Δ| reaches the
    observed |Δ| (with the standard +1 smoothing). The exact-ish
    nonparametric sibling of mann_whitney_u.

    Distribution shape (the reason this phrasing scales): label
    swaps are iid per row, so each partition draws its own md5 coins
    and every replicate's sums reduce MAP-SIDE in one groupBy(b) —
    no resample materialization, no shuffle of the fact beyond the
    R-sized aggregate, the bootstrap_ci Poisson pattern with
    Bernoulli(1/2) coins. Each digest yields two independent 32-bit
    coins (hex 1-8, 9-16), so R=64 costs 32 digests/row.

    Determinism: md5 coins are engine-identical; replicate means are
    exact integer ratios; |Δ| comparisons run on identically-derived
    doubles; the p-value is an exact integer ratio quantized at
    1e-6."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    cents = (dec_portable("value", 18, 2) * 100).cast("long")
    base = ev.select(
        F.col("event_id").alias("k"),
        (F.col("event_type") == "purchase").cast("long").alias("g"),
        cents.alias("v"),
    )
    tot = base.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.sum("g").alias("n1"),
        F.sum(F.col("g") * F.col("v")).alias("s1"),
    )
    # r11 (optimization): 32 md5 digests per event row below the first
    # exchange — single-task on a one-split scan without spread() (same
    # fix as bootstrap_ci; no-op at scale).
    from airflow_baseball_spark.partitioning import spread

    rep = spread(base).select(
        "k",
        "v",
        F.explode(F.sequence(F.lit(1), F.lit(_PERM_R // 2))).alias("b"),
    )
    h = F.md5(
        F.concat(
            F.concat_ws("-", F.col("k").cast("string"), F.col("b").cast("string")),
            F.lit(":perm"),
        )
    )
    withh = rep.select("v", "b", h.alias("h"))
    coin = lambda off: (  # noqa: E731
        F.conv(F.substring("h", off, 8), 16, 10).cast("long") % 2
    )
    per_b = (
        withh.select("b", "v", coin(1).alias("c1"), coin(9).alias("c2"))
        .groupBy("b")
        .agg(
            F.sum(F.col("c1") * F.col("v")).alias("sa1"),
            F.sum("c1").alias("na1"),
            F.sum(F.col("c2") * F.col("v")).alias("sa2"),
            F.sum("c2").alias("na2"),
        )
    )
    # Δ_b = mean(coin=1) − mean(coin=0), via broadcast pooled totals
    both = per_b.crossJoin(F.broadcast(tot))
    delta = lambda sa, na: (  # noqa: E731
        F.col(sa).cast("double") / F.col(na).cast("double")
        - (F.col("s") - F.col(sa)).cast("double")
        / (F.col("n") - F.col(na)).cast("double")
    )
    deltas = both.select(
        F.explode(
            F.array(F.abs(delta("sa1", "na1")), F.abs(delta("sa2", "na2")))
        ).alias("ad")
    )
    obs = tot.select(
        "n",
        "n1",
        F.abs(
            F.col("s1").cast("double") / F.col("n1").cast("double")
            - (F.col("s") - F.col("s1")).cast("double")
            / (F.col("n") - F.col("n1")).cast("double")
        ).alias("ad_obs"),
    )
    counted = deltas.crossJoin(F.broadcast(obs)).agg(
        F.max("n").alias("n"),
        F.max("n1").alias("n1"),
        F.max("ad_obs").alias("ad_obs"),
        F.sum((F.col("ad") >= F.col("ad_obs")).cast("long")).alias("n_ge"),
    )
    return counted.select(
        F.col("n").cast("long").alias("n_events"),
        F.col("n1").cast("long").alias("n_purchase"),
        _r6(F.col("ad_obs") / 100.0).alias("abs_delta_obs"),
        F.col("n_ge").cast("long").alias("n_replicates_ge"),
        _r6(
            (F.col("n_ge") + 1).cast("double") / F.lit(float(_PERM_R + 1))
        ).alias("p_value"),
    )


registry.register(
    "permutation_test",
    q_permutation_test,
    f"""
    WITH base AS (
      SELECT event_id AS k,
             CAST(event_type = 'purchase' AS BIGINT) AS g,
             CAST(CAST(FLOOR(value * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    tot AS (
      SELECT COUNT(*) AS n, SUM(v) AS s, SUM(g) AS n1,
             SUM(g * v) AS s1
      FROM base
    ),
    rep AS (
      SELECT k, v, b.b,
             MD5(CONCAT(CONCAT_WS('-', CAST(k AS VARCHAR),
                                  CAST(b.b AS VARCHAR)), ':perm')) AS h
      FROM base
      CROSS JOIN (SELECT UNNEST(generate_series(1, {_PERM_R // 2})) AS b) b
    ),
    per_b AS (
      SELECT b,
             SUM((CAST(CONCAT('0x', SUBSTRING(h, 1, 8)) AS BIGINT) % 2) * v)
               AS sa1,
             SUM(CAST(CONCAT('0x', SUBSTRING(h, 1, 8)) AS BIGINT) % 2) AS na1,
             SUM((CAST(CONCAT('0x', SUBSTRING(h, 9, 8)) AS BIGINT) % 2) * v)
               AS sa2,
             SUM(CAST(CONCAT('0x', SUBSTRING(h, 9, 8)) AS BIGINT) % 2) AS na2
      FROM rep GROUP BY b
    ),
    deltas AS (
      SELECT UNNEST([
        ABS(CAST(sa1 AS DOUBLE) / CAST(na1 AS DOUBLE)
            - CAST(t.s - sa1 AS DOUBLE) / CAST(t.n - na1 AS DOUBLE)),
        ABS(CAST(sa2 AS DOUBLE) / CAST(na2 AS DOUBLE)
            - CAST(t.s - sa2 AS DOUBLE) / CAST(t.n - na2 AS DOUBLE))
      ]) AS ad
      FROM per_b CROSS JOIN tot t
    ),
    obs AS (
      SELECT n, n1,
             ABS(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(s - s1 AS DOUBLE) / CAST(n - n1 AS DOUBLE)) AS ad_obs
      FROM tot
    )
    SELECT MAX(o.n) AS n_events,
           MAX(o.n1) AS n_purchase,
           FLOOR((MAX(o.ad_obs) / 100.0) * 1000000.0 + 0.5) / 1000000.0
             AS abs_delta_obs,
           SUM(CASE WHEN d.ad >= o.ad_obs THEN 1 ELSE 0 END)
             AS n_replicates_ge,
           FLOOR(((CAST(SUM(CASE WHEN d.ad >= o.ad_obs THEN 1 ELSE 0 END)
                        AS BIGINT) + 1)
                  / {float(_PERM_R + 1)})
                 * 1000000.0 + 0.5) / 1000000.0 AS p_value
    FROM deltas d CROSS JOIN obs o
    """,
)
