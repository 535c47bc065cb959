"""Similarity search over embedding columns (``array<float>``).

Paths:

* :func:`cosine_topk` — brute-force exact top-k, vectorized: the query
  matrix (bounded — it is the *ask*, not the corpus) broadcasts into a
  numpy matmul over Arrow batches of the corpus; each partition emits
  only its partial top-k per query, and a final window merges partials.
  Cost O(|Q|·|corpus|·dim) flops but BLAS-speed, shuffle limited to
  |Q|·k·partitions rows.
* :func:`ivf_topk` — IVF-style: assign vectors to nearest coarse
  centroid (broadcast matmul), then search only the query's own cluster
  (nprobe=1). At 100 TB the corpus is *stored partitioned by cluster
  id*, so a query touches 1/C of the data — the classic inverted-file
  recall/fan-in trade.
* :func:`embedding_neardup_pairs` — blocked self-join: per-block
  pairwise matmul via ``applyInPandas``; never an unblocked cross join.

Determinism: cosines are rounded to 6 places *before* ranking and
thresholding (both here and in the DuckDB oracles) so float-summation
order can never flip a rank; ties break on neighbor id. Partial top-k
uses exactly the final comparator, so partition-merge is lossless.

Column-expression forms (:func:`cosine`) are kept for in-plan use, e.g.
threshold filters fused into a scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airflow_baseball_spark.operators.topk import top_k_per_key
from airflow_baseball_spark.partitioning import spread


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
    """In-plan cosine over two array columns (JVM-side, no Python)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str):
    """Driver-side (bounded) id list + float64 matrix."""
    import numpy as np

    rows = df.select(id_col, vec_col).collect()
    ids = [r[0] for r in rows]
    mat = np.array([r[1] for r in rows], dtype="float64")
    return ids, mat


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (self-matches excluded).
    Output: query_id, neighbor_id, cos (rounded), rank."""
    import numpy as np

    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_id_arr = np.array(q_ids, dtype="int64")

    def partial_topk(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype="int64")
            c = np.array(list(pdf[vec_col]), dtype="float64")
            c /= np.linalg.norm(c, axis=1, keepdims=True)
            scores = np.round(c @ q_norm.T, 6)  # (n_corpus, n_q)
            out_q, out_n, out_s = [], [], []
            for j in range(scores.shape[1]):
                col = scores[:, j]
                mask = ids != q_id_arr[j]
                cand_ids, cand_s = ids[mask], col[mask]
                # final comparator: (-cos, neighbor_id) — lossless merge
                order = np.lexsort((cand_ids, -cand_s))[:k]
                out_q.extend([q_id_arr[j]] * len(order))
                out_n.extend(cand_ids[order])
                out_s.extend(cand_s[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos": out_s}
            )

    partials = spread(corpus.select(id_col, vec_col)).mapInPandas(
        partial_topk, "query_id long, neighbor_id long, cos double"
    )
    return top_k_per_key(
        partials,
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
) -> DataFrame:
    """Nearest-centroid assignment (broadcast centroid matrix, one
    matmul pass). Returns (vec_id, cluster_id); ties on rounded cosine
    break toward the lower centroid id."""
    import numpy as np

    c_ids, c_mat = _collect_matrix(centroids, id_col, vec_col)
    c_norm = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
    c_id_arr = np.array(c_ids, dtype="int64")
    # centroids sorted by id → argmax picks the lowest id on ties
    order = np.argsort(c_id_arr)
    c_id_arr, c_norm = c_id_arr[order], c_norm[order]

    def assign(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(list(pdf[vec_col]), dtype="float64")
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            scores = np.round(v @ c_norm.T, 6)
            best = np.argmax(scores, axis=1)  # first (lowest id) on ties
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cluster_id": c_id_arr[best]}
            )

    return spread(corpus.select(id_col, vec_col)).mapInPandas(
        assign, f"{id_col} long, cluster_id long"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k searching only the query's own cluster
    (nprobe=1). Output schema matches :func:`cosine_topk`."""
    assign = assign_clusters(corpus, centroids, id_col, vec_col)
    blocked = corpus.select(id_col, vec_col).join(assign, id_col)
    q_blocked = queries.select(id_col, vec_col).join(assign, id_col)
    scored = (
        blocked.alias("c")
        .join(
            F.broadcast(q_blocked.alias("q")),
            (F.col("c.cluster_id") == F.col("q.cluster_id"))
            & (F.col(f"c.{id_col}") != F.col(f"q.{id_col}")),
        )
        .select(
            F.col(f"q.{id_col}").alias("query_id"),
            F.col(f"c.{id_col}").alias("neighbor_id"),
            F.round(cosine(F.col(f"q.{vec_col}"), F.col(f"c.{vec_col}")), 6).alias(
                "cos"
            ),
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
    ``block_col`` (label / coarse cluster): one pairwise matmul per
    block, upper-triangle only — pair count stays O(Σ block²), never
    |corpus|²."""

    def block_pairs(pdf):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        ids = pdf[id_col].to_numpy(dtype="int64")
        order = np.argsort(ids)
        ids = ids[order]
        v = np.array(list(pdf[vec_col]), dtype="float64")[order]
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        s = np.round(v @ v.T, 6)
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = s[iu, ju] > threshold
        return pd.DataFrame(
            {"id_a": ids[iu[keep]], "id_b": ids[ju[keep]], "cos": s[iu, ju][keep]}
        )

    return (
        embeddings.select(id_col, vec_col, block_col)
        .groupBy(block_col)
        .applyInPandas(block_pairs, "id_a long, id_b long, cos double")
    )
