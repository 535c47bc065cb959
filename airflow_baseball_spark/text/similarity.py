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


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with the norms PRECOMPUTED per side (r9): a norm depends
    only on its own vector, so projecting it once per row before a
    pairwise join yields bit-identical IEEE doubles at a third of the
    per-pair flops (dot only, instead of dot + both norms). Use this
    form in every corpus x query cross join."""
    return _dot(a, b) / (na * nb)


MAX_DRIVER_MATRIX_ROWS = 4096
"""Hard cap on driver-collected id+vector matrices.

The brute-force/centroid paths collect the *query* (or centroid) side
to the driver; that is only scale-safe when the collected set is "the
ask" — O(1) w.r.t. the corpus. Enforcing the cap here makes the
contract explicit: a corpus-derived query set that grows past the cap
fails fast instead of silently OOMing the driver at 100 TB. Large
query sets belong on the bucketed paths (hyperplane_lsh_pairs /
ivf_topk with a distributed query side)."""


def _collect_matrix(
    df: DataFrame, id_col: str, vec_col: str, max_rows: int = MAX_DRIVER_MATRIX_ROWS
):
    """Driver-side (bounded) id list + float64 matrix; raises if the
    set exceeds ``max_rows`` (see MAX_DRIVER_MATRIX_ROWS)."""
    import numpy as np

    rows = df.select(id_col, vec_col).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"refusing to collect >{max_rows} vectors to the driver; "
            "bound the query/centroid set or use the LSH/IVF paths"
        )
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
    (nprobe=1). Output schema matches :func:`cosine_topk`.

    The nearest-centroid assignment runs ONCE (localCheckpoint pins the
    (id, cluster) table — 2 longs/row — so the corpus and query sides
    share it instead of re-running the Python assignment stage; on a
    cluster prefer storing the corpus partitioned by cluster_id so the
    assignment is free at query time)."""
    assign = assign_clusters(corpus, centroids, id_col, vec_col).localCheckpoint()
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


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (cosine) — the bucketed ANN scale path
# ---------------------------------------------------------------------------

# 32 hyperplanes over 64 dims, integer weights in [-2^15, 2^15) from a
# fixed LCG so Spark and the DuckDB oracle share byte-identical planes.
# 32 planes → 4 bands × 8 bits: 8-bit band values give a 256-value
# bucket keyspace; 4-bit bands mega-bucket (16 values) and the
# within-bucket join goes quadratic in corpus size.
_HP_PLANES = 32
_HP_DIM = 64
_HP_BANDS = 4


def _hp_weight(p: int, j: int) -> int:
    x = (1103515245 * (p * _HP_DIM + j + 1) + 12345) % 2147483648
    return (x % 65536) - 32768


HP_WEIGHTS: list[list[int]] = [
    [_hp_weight(p, j) for j in range(_HP_DIM)] for p in range(_HP_PLANES)
]


def hyperplane_fingerprints(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Sign fingerprint (one bit per hyperplane) of each vector against
    the fixed random hyperplanes. *Integer-exact*: vectors quantize to
    1e-6 BIGINTs (round-half-away-from-zero — bit-identical to Spark's
    and DuckDB's ``round``), then all plane dot products are ONE int64
    matmul per Arrow batch — no float summation anywhere, so a sign
    bit can never flip with partitioning, batch order, or engine. A
    pure map stage: zero shuffle at any scale.

    (A column-expression form via ``zip_with``/``aggregate`` was 25×
    slower — higher-order lambdas are interpreted per element; 32
    planes × 64 dims is exactly the 'vectorization demands a Pandas
    UDF' case.)"""
    import numpy as np

    w_t = np.array(HP_WEIGHTS, dtype=np.int64).T  # (dim, planes)
    shifts = np.arange(_HP_PLANES, dtype=np.uint64)

    def fingerprint(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(list(pdf[vec_col]), dtype="float64") * 1e6
            q = (np.floor(np.abs(v) + 0.5) * np.sign(v)).astype(np.int64)
            dots = q @ w_t  # exact int64
            bits = (dots >= 0).astype(np.uint64)
            fp = (bits << shifts).sum(axis=1).astype(np.int64)
            yield pd.DataFrame({id_col: pdf[id_col], "hp_fp": fp})

    return spread(emb.select(id_col, vec_col)).mapInPandas(
        fingerprint, f"{id_col} long, hp_fp long"
    )


def hyperplane_lsh_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
) -> DataFrame:
    """Approximate cosine near-neighbor pairs: vectors whose
    fingerprints agree on any 4-bit band become candidates (bucket
    join on the tiny (band, value) key — the corpus never self-joins
    unblocked); candidates get an exact cosine verify and a threshold
    filter. Cosine is rounded to 6 before thresholding so float order
    cannot flip membership (matches the neardup/topk convention)."""
    # checkpoint: the l/r sides of the bucket self-join would otherwise
    # run the fingerprint UDF stage twice (AQE breaks exchange reuse
    # across Python-eval stages); fps is (id, long) — tiny at any scale
    fps = hyperplane_fingerprints(emb, id_col, vec_col).localCheckpoint()
    bits_per = _HP_PLANES // _HP_BANDS
    mask = (1 << bits_per) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftright(F.col("hp_fp"), b * bits_per)
                .bitwiseAND(F.lit(mask))
                .alias("band_val"),
            )
            for b in range(_HP_BANDS)
        ]
    )
    banded = fps.select(F.col(id_col), F.explode(bands).alias("bs")).select(
        id_col,
        F.col("bs.band_id").alias("band_id"),
        F.col("bs.band_val").alias("band_val"),
    )
    l = banded.alias("l")
    r = banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )
    ea = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    eb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    joined = cand.join(ea, "id_a").join(eb, "id_b")

    # vectorized exact-cosine verify: candidate volume is skew-prone
    # (clustered corpora concentrate band values), so the verify must
    # be batch matmul work, not per-row expression trees
    def verify(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            if not len(pdf):
                continue
            a = np.array(list(pdf["__va"]), dtype="float64")
            b = np.array(list(pdf["__vb"]), dtype="float64")
            cos = np.round(
                (a * b).sum(axis=1)
                / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)),
                6,
            )
            out = pd.DataFrame(
                {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "cos": cos}
            )
            yield out[out["cos"] > threshold]

    return joined.mapInPandas(verify, "id_a long, id_b long, cos double")


# ---------------------------------------------------------------------------
# k-means training (Lloyd's iterations)
# ---------------------------------------------------------------------------


def kmeans_fit(
    corpus: DataFrame,
    init_centroids: DataFrame,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reduce_partials: str = "driver",
) -> DataFrame:
    """Lloyd's algorithm over a distributed corpus; returns the final
    (cluster_id, centroid array<double>, n_members) table.

    Scale shape per iteration: one numpy pass per Arrow batch assigns
    vectors to their nearest centroid (broadcast k×dim matrix — the
    classic bounded-state iterate) and emits ONE partial row per
    (cluster) per batch: (cluster_id, sum_vector, count) — k·n_partitions
    rows regardless of corpus size. Two reduce strategies:

    * ``"driver"`` (default): collect the partial rows and merge in
      numpy. Bounded at k·partitions·dim doubles (k=256, 10k
      partitions, dim=1024 → ~20 GB is the break point; typical
      configs are MBs) and saves a full shuffle + two agg stages per
      round — measured 8.2s → 2.3s for 3 rounds at sf0.01.
    * ``"spark"``: posexplode + two-stage groupBy reduce, collecting
      only k·dim doubles. Use when partitions·k·dim outgrows driver
      memory.

    No row of corpus data is ever collected or re-shuffled either way.
    """
    import numpy as np

    c_rows = init_centroids.select(id_col, vec_col).collect()
    order = np.argsort([r[0] for r in c_rows])
    cent = np.array([c_rows[i][1] for i in order], dtype="float64")
    cent_ids = np.array([c_rows[i][0] for i in order], dtype="int64")
    k = len(cent_ids)

    data = spread(corpus.select(vec_col)).localCheckpoint()

    for _ in range(n_iter):
        c = cent  # rebind for closure capture of this round's matrix

        def partials(batches, c=c):
            import numpy as np  # noqa: PLC0415
            import pandas as pd  # noqa: PLC0415

            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.array(list(pdf[vec_col]), dtype="float64")
                # squared L2 via expansion; argmin ties -> lowest index
                d2 = (v * v).sum(1, keepdims=True) - 2 * v @ c.T + (c * c).sum(1)
                a = np.argmin(d2, axis=1)
                rows = [
                    (int(j), (v[a == j]).sum(0).tolist(), int((a == j).sum()))
                    for j in range(len(c))
                    if (a == j).any()
                ]
                yield pd.DataFrame(rows, columns=["cid", "vsum", "n"])

        part_df = data.mapInPandas(
            partials, "cid int, vsum array<double>, n long"
        )
        if reduce_partials == "driver":
            sums: dict[int, object] = {}
            ns: dict[int, int] = {}
            for r in part_df.collect():
                if r["cid"] in sums:
                    sums[r["cid"]] = sums[r["cid"]] + np.array(r["vsum"])
                    ns[r["cid"]] += r["n"]
                else:
                    sums[r["cid"]] = np.array(r["vsum"])
                    ns[r["cid"]] = r["n"]
            for j, s in sums.items():
                cent[j] = s / ns[j]
            counts = dict(ns)
        else:
            agg = (
                part_df
                .select("cid", "n", F.posexplode("vsum").alias("pos", "val"))
                .groupBy("cid", "pos")
                .agg(F.sum("val").alias("val"), F.sum("n").alias("n"))
                .groupBy("cid")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "val"))
                    ).alias("pv"),
                    F.first("n").alias("n"),
                )
                .select(
                    "cid",
                    F.transform("pv", lambda s: s["val"]).alias("vsum"),
                    "n",
                )
                .collect()
            )
            for r in agg:
                cent[r["cid"]] = np.array(r["vsum"]) / r["n"]
            counts = {r["cid"]: r["n"] for r in agg}

    spark = corpus.sparkSession
    out = [
        (int(cent_ids[j]), [float(x) for x in cent[j]], int(counts.get(j, 0)))
        for j in range(k)
    ]
    return spark.createDataFrame(
        out, "cluster_id long, centroid array<double>, n_members long"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric distance (ADC) top-k
# ---------------------------------------------------------------------------


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codewords: DataFrame,
    n_subspaces: int = 4,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN: each corpus vector is compressed to
    ``n_subspaces`` codeword ids (one per dimension block), queries
    stay full-precision, and candidate distance is the classic ADC
    lookup-table sum (Jégou et al. 2011) — the memory-side scale play:
    a 64-dim float corpus becomes 4 small ints/vector, so the scan
    reads ~2% of the bytes and never touches raw embeddings after
    encode.

    Determinism contract (what makes the DuckDB oracle exact): all
    distances are per-element micro-units —
    ``Σ_i floor((a_i-b_i)² · 1e6 + 0.5)`` as int64 — so both the
    encode argmin and the ADC sum are INTEGER arithmetic; no
    FP-summation-order divergence is possible between engines. Ties
    break toward the lower codeword / neighbor id.

    Scale design: the codebook (K codewords) and the query matrix are
    driver-bounded (`_collect_matrix`, hard cap); encode + ADC are one
    Arrow-batched pass over the corpus emitting per-partition partial
    top-k (k rows per query per partition), merged losslessly by
    :func:`top_k_per_key`. The corpus is never collected, never
    self-joined."""
    import numpy as np

    M = int(n_subspaces)
    cw_ids, cw_mat = _collect_matrix(codewords, id_col, vec_col)
    cw_order = np.argsort(np.array(cw_ids, dtype="int64"))
    cw_id_arr = np.array(cw_ids, dtype="int64")[cw_order]
    cw_mat = cw_mat[cw_order]
    D = cw_mat.shape[1]
    if D % M:
        raise ValueError(f"dim {D} not divisible into {M} subspaces")
    S = D // M
    cw_sub = cw_mat.reshape(-1, M, S).transpose(1, 0, 2)  # (M, K, S)

    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col)
    q_id_arr = np.array(q_ids, dtype="int64")
    q_sub = q_mat.reshape(-1, M, S)  # (Q, M, S)
    # LUT[q, m, j] = micro-dist(query q's m-th block, codeword j)
    lut = (
        np.floor((q_sub[:, :, None, :] - cw_sub[None]) ** 2 * 1e6 + 0.5)
        .astype("int64")
        .sum(-1)
    )  # (Q, M, K)
    lut_t = lut.transpose(1, 2, 0)  # (M, K, Q)

    def partial(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype="int64")
            c_sub = np.array(list(pdf[vec_col]), dtype="float64").reshape(-1, M, S)
            d = (
                np.floor((c_sub[:, :, None, :] - cw_sub[None]) ** 2 * 1e6 + 0.5)
                .astype("int64")
                .sum(-1)
            )  # (n, M, K)
            codes = np.argmin(d, axis=2)  # first (lowest codeword id) on ties
            gathered = lut_t[np.arange(M)[None, :], codes, :]  # (n, M, Q)
            adc = gathered.sum(axis=1)  # (n, Q) int64
            out_q, out_n, out_s = [], [], []
            for j in range(adc.shape[1]):
                mask = ids != q_id_arr[j]
                cand_ids, cand_d = ids[mask], adc[mask, j]
                order = np.lexsort((cand_ids, cand_d))[:k]
                out_q.extend([q_id_arr[j]] * len(order))
                out_n.extend(cand_ids[order])
                out_s.extend(cand_d[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "adc_micro": out_s}
            )

    partials = spread(corpus.select(id_col, vec_col)).mapInPandas(
        partial, "query_id long, neighbor_id long, adc_micro long"
    )
    return top_k_per_key(
        partials,
        ["query_id"],
        [F.col("adc_micro").asc(), F.col("neighbor_id")],
        k=k,
        rank_col="rank",
    )
