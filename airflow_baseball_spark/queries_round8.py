"""Round-8 additions: generation-diversity and lexical-quality
metrics over ``documents`` — the standard text-corpus health checks a
training-data pipeline runs next to dedup (distinct-n, type/token,
per-source KL drift, shingle containment).

House rules throughout: whitespace tokenization (byte-safe — identical
on both engines for any text vintage), md5 gram keys (16-byte shuffle
payload, never raw n-grams), integer-exact hash surfaces with the one
`_r6`-bounded float division at the end (entropy precedent), no
pairwise work without a blocking key and a hot-key cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_baseball_spark import registry
from airflow_baseball_spark.functions.scalar import round6_portable as _r6
from airflow_baseball_spark.schemas import load_table

_TOKS = "string_split_regex(trim(text), '\\s+')"


def _tokens(docs: DataFrame) -> DataFrame:
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select("doc_id", "source", F.explode(toks).alias("w")).filter(
        F.length("w") > 0
    )


# ---------------------------------------------------------------------------
# distinct-n diversity (the generation-eval distinct-1 / distinct-2)
# ---------------------------------------------------------------------------


def q_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-1 / distinct-2 ratios — the diversity
    metric used to catch mode collapse in generated corpora (Li et
    al.'s distinct-n): distinct unigrams over total tokens, distinct
    word-bigrams over total bigrams.

    Scale: tokens explode once; both distinct counts are gram-keyed
    aggs (md5 16-byte keys for bigrams), so the plan is two
    map-combinable shuffles keyed by (source, gram) — no document
    pairing, no collect. The two ratios are single divisions of exact
    BIGINTs (`_r6`)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.select("source", toks.alias("toks"))
    uni = base.select("source", F.explode("toks").alias("w")).filter(
        F.length("w") > 0
    )
    uni_stats = uni.groupBy("source").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("w").alias("n_types"),
    )
    bigrams = base.filter(F.size("toks") >= 2).select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice(F.col("toks"), i, F.lit(2)))
                ),
            )
        ).alias("g"),
    )
    bi_stats = bigrams.groupBy("source").agg(
        F.count("*").alias("n_bigrams"),
        F.countDistinct("g").alias("n_bigram_types"),
    )
    return (
        uni_stats.join(bi_stats, "source")
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_bigrams",
            "n_bigram_types",
            _r6(
                F.col("n_types").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("distinct1"),
            _r6(
                F.col("n_bigram_types").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("distinct2"),
        )
    )


registry.register(
    "distinct_ngrams",
    q_distinct_ngrams,
    f"""
    WITH toked AS (
      SELECT doc_id, source, {_TOKS} AS toks FROM documents
    ),
    uni AS (
      SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT w) AS n_types
      FROM (SELECT source, UNNEST(toks) AS w FROM toked)
      WHERE length(w) > 0
      GROUP BY 1
    ),
    bi AS (
      SELECT source, COUNT(*) AS n_bigrams,
             COUNT(DISTINCT g) AS n_bigram_types
      FROM (
        SELECT source,
               md5(toks[i] || ' ' || toks[i + 1]) AS g
        FROM toked, UNNEST(range(1, len(toks))) AS t(i)
        WHERE len(toks) >= 2
      )
      GROUP BY 1
    )
    SELECT u.source, n_tokens, n_types, n_bigrams, n_bigram_types,
           FLOOR(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS distinct1,
           FLOOR(CAST(n_bigram_types AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS distinct2
    FROM uni u JOIN bi b ON u.source = b.source
    """,
)


# ---------------------------------------------------------------------------
# type/token ratio + hapax share (lexical-quality screen)
# ---------------------------------------------------------------------------


def q_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source type/token ratio and hapax share (fraction of types
    occurring exactly once) — the cheap lexical-richness screen that
    separates boilerplate-heavy sources from natural text. One
    (source, word)-keyed count (map-combinable), one source-keyed
    rollup; ratios are exact-integer divisions."""
    tok = _tokens(load_table(spark, sf_dir, "documents"))
    wc = tok.groupBy("source", "w").agg(F.count("*").alias("n"))
    return (
        wc.groupBy("source")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.count(F.when(F.col("n") == 1, 1)).alias("n_hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            _r6(
                F.col("n_types").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("ttr"),
            _r6(
                F.col("n_hapax").cast("double")
                / F.col("n_types").cast("double")
            ).alias("hapax_share"),
        )
    )


registry.register(
    "type_token_ratio",
    q_type_token_ratio,
    f"""
    WITH wc AS (
      SELECT source, w, COUNT(*) AS n
      FROM (
        SELECT source, UNNEST({_TOKS}) AS w FROM documents
      )
      WHERE length(w) > 0
      GROUP BY 1, 2
    )
    SELECT source,
           SUM(n) AS n_tokens,
           COUNT(*) AS n_types,
           SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS n_hapax,
           FLOOR(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS ttr,
           FLOOR(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS hapax_share
    FROM wc GROUP BY source
    """,
)


# ---------------------------------------------------------------------------
# per-source unigram KL vs the corpus (mixture drift)
# ---------------------------------------------------------------------------


def q_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(source ‖ corpus) over the unigram distribution, with add-one
    smoothing on the corpus side — the drift score that flags a source
    whose vocabulary usage diverges from the mixture it feeds.

    Exactness: the KL sum is Σ_w p_s(w)·ln(p_s(w)/q(w)) over exact
    integer counts; per-term floats are an identical IEEE/libm
    expression tree on both engines (LN verified engine-identical by
    the retired probe_engine_echo), and the cross-term reduction is
    the house entropy precedent: quantize each term to micro-nats
    BEFORE the sum, so summation order cannot move the hash.

    Scale: counts are (source, word)- and word-keyed aggs; the KL join
    is word-keyed between two vocabulary-bounded tables. Nothing
    pairwise, nothing collected."""
    tok = _tokens(load_table(spark, sf_dir, "documents"))
    sw = tok.groupBy("source", "w").agg(F.count("*").alias("n_sw"))
    s_tot = sw.groupBy("source").agg(F.sum("n_sw").alias("n_s"))
    cw = sw.groupBy("w").agg(F.sum("n_sw").alias("n_w"))
    c_tot = cw.agg(
        F.sum("n_w").alias("n_c"), F.count("*").alias("v")
    )
    j = (
        sw.join(F.broadcast(s_tot), "source")
        .join(cw, "w")
        .crossJoin(F.broadcast(c_tot))
    )
    p_s = F.col("n_sw").cast("double") / F.col("n_s").cast("double")
    q_c = (F.col("n_w").cast("double") + 1.0) / (
        F.col("n_c").cast("double") + F.col("v").cast("double")
    )
    term_micro = F.floor(
        p_s * (F.log(p_s) - F.log(q_c)) * 1e6 + F.lit(0.5)
    ).cast("long")
    return (
        j.groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.count("*").alias("n_terms"),
            F.sum(term_micro).alias("kl_micro"),
        )
        .select(
            "source",
            "n_tokens",
            "n_terms",
            "kl_micro",
            _r6(F.col("kl_micro").cast("double") / 1e6).alias("kl_nats"),
        )
    )


registry.register(
    "unigram_kl",
    q_unigram_kl,
    f"""
    WITH tok AS (
      SELECT source, w
      FROM (SELECT source, UNNEST({_TOKS}) AS w FROM documents)
      WHERE length(w) > 0
    ),
    sw AS (SELECT source, w, COUNT(*) AS n_sw FROM tok GROUP BY 1, 2),
    s_tot AS (SELECT source, SUM(n_sw) AS n_s FROM sw GROUP BY 1),
    cw AS (SELECT w, SUM(n_sw) AS n_w FROM sw GROUP BY 1),
    c_tot AS (SELECT SUM(n_w) AS n_c, COUNT(*) AS v FROM cw),
    terms AS (
      SELECT sw.source,
             s_tot.n_s,
             CAST(FLOOR(
               (CAST(n_sw AS DOUBLE) / CAST(n_s AS DOUBLE))
               * (LN(CAST(n_sw AS DOUBLE) / CAST(n_s AS DOUBLE))
                  - LN((CAST(n_w AS DOUBLE) + 1.0)
                       / (CAST(n_c AS DOUBLE) + CAST(v AS DOUBLE))))
               * 1e6 + 0.5) AS BIGINT) AS term_micro
      FROM sw
      JOIN s_tot ON sw.source = s_tot.source
      JOIN cw ON sw.w = cw.w
      CROSS JOIN c_tot
    )
    SELECT source,
           MAX(n_s) AS n_tokens,
           COUNT(*) AS n_terms,
           SUM(term_micro) AS kl_micro,
           FLOOR(CAST(SUM(term_micro) AS DOUBLE) / 1e6
                 * 1000000.0 + 0.5) / 1000000.0 AS kl_nats
    FROM terms GROUP BY source
    """,
)


# ---------------------------------------------------------------------------
# shingle containment (asymmetric near-dup: quote/subset detection)
# ---------------------------------------------------------------------------

_CONTAIN_DF_CAP = 64  # skip shingles shared by more docs (boilerplate)
_CONTAIN_MIN = 0.8  # report pairs where A is ≥80% contained in B


def q_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment |A∩B| / |A| over word-5-gram shingle
    sets — the subset/quotation detector Jaccard misses (a short doc
    fully quoted inside a long one has low Jaccard but containment 1).

    Scale design: shingles are md5 keys; candidate pairs come ONLY
    from co-occurrence under a shingle whose document frequency is ≤
    {cap} (hot boilerplate shingles generate quadratic pairs and zero
    signal — the same hot-key cap as the media near-dup family), so
    pair volume is bounded by Σ min(df,cap)² per shingle, never
    |docs|². The intersection size falls out of the same explode (one
    groupBy over (a,b)); |A| joins in from a per-doc distinct-shingle
    count. Output keeps pairs with containment ≥ {min_c} — count plus
    max-containment fingerprint per source pair keeps the surface
    integer-plus-one-ratio."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= 5
    )
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 4),
            lambda i: F.md5(
                F.concat_ws(" ", F.slice(F.col("toks"), i, F.lit(5)))
            ),
        )
    )
    ds = base.select("doc_id", F.explode(shingles).alias("s"))
    sizes = ds.groupBy("doc_id").agg(F.count("*").alias("n_a"))
    df_ok = (
        ds.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= _CONTAIN_DF_CAP)
        .select("s")
    )
    pruned = ds.join(df_ok, "s")
    a = pruned.select(F.col("doc_id").alias("a"), "s")
    b = pruned.select(F.col("doc_id").alias("b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    scored = (
        inter.join(sizes.withColumnRenamed("doc_id", "a"), "a")
        .select(
            "a",
            "b",
            "n_inter",
            "n_a",
            _r6(
                F.col("n_inter").cast("double") / F.col("n_a").cast("double")
            ).alias("containment"),
        )
        .filter(F.col("containment") >= _CONTAIN_MIN)
    )
    return scored.agg(
        F.count("*").alias("n_pairs"),
        F.coalesce(F.sum("n_inter"), F.lit(0)).cast("long").alias(
            "sum_inter"
        ),
        F.coalesce(
            # explicit floor: a bare double→int cast TRUNCATES on Spark
            # but ROUNDS on DuckDB — floor(x+0.5) is engine-identical
            F.sum(F.floor(F.col("containment") * 1e6 + F.lit(0.5)).cast("long")),
            F.lit(0),
        ).alias("sum_containment_micro"),
    )


q_shingle_containment.__doc__ = q_shingle_containment.__doc__.format(
    cap=_CONTAIN_DF_CAP, min_c=_CONTAIN_MIN
)

registry.register(
    "shingle_containment",
    q_shingle_containment,
    f"""
    WITH toked AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    ds AS (
      SELECT DISTINCT doc_id,
             md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                 || ' ' || toks[i+3] || ' ' || toks[i+4]) AS s
      FROM toked, UNNEST(range(1, len(toks) - 3)) AS t(i)
      WHERE len(toks) >= 5
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_a FROM ds GROUP BY 1),
    ok AS (
      SELECT s FROM ds GROUP BY s HAVING COUNT(*) <= {_CONTAIN_DF_CAP}
    ),
    pruned AS (SELECT ds.* FROM ds JOIN ok USING (s)),
    inter AS (
      SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS n_inter
      FROM pruned x JOIN pruned y USING (s)
      WHERE x.doc_id <> y.doc_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT a, b, n_inter, n_a,
             FLOOR(CAST(n_inter AS DOUBLE) / CAST(n_a AS DOUBLE)
                   * 1000000.0 + 0.5) / 1000000.0 AS containment
      FROM inter JOIN sizes ON inter.a = sizes.doc_id
    )
    SELECT COUNT(*) AS n_pairs,
           CAST(COALESCE(SUM(n_inter), 0) AS BIGINT) AS sum_inter,
           COALESCE(SUM(CAST(FLOOR(containment * 1e6 + 0.5) AS BIGINT)), 0)
             AS sum_containment_micro
    FROM scored WHERE containment >= {_CONTAIN_MIN}
    """,
)
