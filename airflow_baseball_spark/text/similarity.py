"""Similarity search over embedding columns (``array<float>``).

Two paths:

* :func:`cosine_topk` — brute-force exact top-k: the baseline. The
  query set broadcasts; the corpus streams through one stage computing
  dot products with in-row array expressions (``zip_with`` +
  ``aggregate`` — JVM-side, no Python). Cost O(|Q|·|corpus|·dim) but
  embarrassingly parallel and shuffle-free until the final per-query
  top-k window on |Q|·|corpus| rows.
* :func:`ivf_topk` — IVF-style: assign every vector to its nearest of
  C coarse centroids (broadcast), then search only the query's probe
  cluster(s). At 100 TB the corpus is *stored partitioned by cluster
  id*, so a query touches 1/C of the data (partition pruning), the
  classic inverted-file trade: recall vs fan-in.

Cosine values are rounded to 6 places for ranking so Spark/DuckDB
float-sum ordering noise cannot flip ranks; ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airflow_baseball_spark.operators.topk import top_k_per_key


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (self-matches excluded).
    Output: query_id, neighbor_id, cos (rounded), rank."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"),
        )
    )
    return top_k_per_key(
        scored,
        ["query_id"],
        [F.col("cos").desc(), F.col("neighbor_id")],
        k=k,
        rank_col="rank",
    )


def assign_clusters(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """Nearest-centroid assignment (broadcast centroids, one pass).
    Returns (vec_id, cluster_id). Deterministic: ties on rounded
    cosine break toward the lower centroid id."""
    c = centroids.select(
        F.col(id_col).alias(centroid_id), F.col(vec_col).alias("cent_vec")
    )
    scored = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(
        F.broadcast(c)
    ).select(
        id_col,
        centroid_id,
        F.round(cosine(F.col(vec_col), F.col("cent_vec")), 6).alias("cos"),
    )
    best = top_k_per_key(
        scored, [id_col], [F.col("cos").desc(), F.col(centroid_id)], k=1
    )
    return best.select(F.col(id_col), F.col(centroid_id).alias("cluster_id"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search only the query's own cluster
    (nprobe=1). Output schema matches :func:`cosine_topk`."""
    assign = assign_clusters(corpus, centroids, id_col, vec_col)
    blocked_corpus = corpus.join(assign, id_col)
    blocked_queries = (
        queries.join(assign, id_col)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            "cluster_id",
        )
    )
    c = blocked_corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("cluster_id").alias("c_cluster"),
    )
    scored = (
        c.join(
            F.broadcast(blocked_queries),
            (F.col("c_cluster") == F.col("cluster_id"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"),
        )
    )
    return top_k_per_key(
        scored,
        ["query_id"],
        [F.col("cos").desc(), F.col("neighbor_id")],
        k=k,
        rank_col="rank",
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    block_col: str,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs above a cosine threshold, blocked by
    ``block_col`` (label / coarse cluster) — the blocked self-join keeps
    the pair count linear-ish instead of |corpus|²."""
    a = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        F.col(block_col).alias("blk"),
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        F.col(block_col).alias("blk_b"),
    )
    return (
        a.join(b, (F.col("blk") == F.col("blk_b")) & (F.col("id_a") < F.col("id_b")))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cos"),
        )
        .filter(F.col("cos") > threshold)
    )
