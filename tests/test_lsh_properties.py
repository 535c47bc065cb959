"""Property tests for the LSH family — independent of the DuckDB
oracles (which mirror the same bucketing arithmetic and would mirror a
bucketing bug). Brute force at sf0.001 is the ground truth here.

* SimHash block bucketing is EXACT for Hamming ≤ 3 (pigeonhole over 4
  blocks): candidate recall must be 1.0, and the verify must leave
  zero false positives.
* Hyperplane LSH is approximate in recall but exact in precision:
  every emitted pair must truly clear the cosine threshold; ids are
  ordered; no self-pairs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from airflow_baseball_spark.schemas import load_table
from airflow_baseball_spark.text import dedup, similarity

SF = "/root/testdata/sf0.001"


def test_simhash_pairs_exact_for_small_hamming(spark):
    fps_df = dedup.simhash(load_table(spark, SF, "documents"))
    fps = {r["doc_id"]: r["simhash"] for r in fps_df.collect()}
    ids = sorted(fps)
    expected = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_pairs(fps_df).collect()
    }
    assert got == expected


def test_hyperplane_pairs_precision_and_shape(spark):
    emb_df = load_table(spark, SF, "embeddings")
    rows = emb_df.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype="int64")
    mat = np.array([r["embedding"] for r in rows], dtype="float64")
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    cos = np.round(mat @ mat.T, 6)

    pairs = similarity.hyperplane_lsh_pairs(emb_df, threshold=0.3).collect()
    assert pairs, "expected at least one near pair in the fixture"
    idx = {v: i for i, v in enumerate(ids)}
    for r in pairs:
        assert r["id_a"] < r["id_b"]
        truth = cos[idx[r["id_a"]], idx[r["id_b"]]]
        # emitted cosine matches brute force and clears the threshold
        assert abs(r["cos"] - truth) < 1e-5
        assert r["cos"] > 0.3


def test_hyperplane_fingerprints_deterministic_across_partitioning(spark):
    emb_df = load_table(spark, SF, "embeddings")
    one = {
        (r["vec_id"], r["hp_fp"])
        for r in similarity.hyperplane_fingerprints(
            emb_df.coalesce(1)
        ).collect()
    }
    many = {
        (r["vec_id"], r["hp_fp"])
        for r in similarity.hyperplane_fingerprints(
            emb_df.repartition(13)
        ).collect()
    }
    assert one == many


def test_lsh_candidate_edges_same_components_as_pairs(spark):
    """Star-contracted edges must produce exactly the components of the
    all-pairs graph (the contract dedup_clusters relies on)."""
    docs = load_table(spark, SF, "documents")
    sigs = dedup.minhash_signatures(docs)

    def components(edge_rows):
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edge_rows:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    pairs = [
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs(sigs).collect()
    ]
    edges = [
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_edges(sigs).collect()
    ]
    assert len(edges) <= len(pairs)
    assert components(pairs) == components(edges)


def test_kmeans_fit_monotone_inertia(spark):
    """Lloyd's invariant: total within-cluster squared distance is
    non-increasing over iterations; memberships partition the corpus."""
    emb_df = load_table(spark, SF, "embeddings")
    init = emb_df.filter(F.col("vec_id") < 8)
    rows = emb_df.select("embedding").collect()
    v = np.array([r[0] for r in rows], dtype="float64")
    n_total = len(v)

    def inertia(fit_df):
        out = fit_df.collect()
        c = np.array([r["centroid"] for r in out], dtype="float64")
        assert sum(r["n_members"] for r in out) == n_total
        d2 = ((v[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        return d2.min(axis=1).sum()

    i1 = inertia(similarity.kmeans_fit(emb_df, init, n_iter=1))
    i3 = inertia(similarity.kmeans_fit(emb_df, init, n_iter=3))
    assert i3 <= i1 + 1e-9


def test_kmeans_reduce_paths_agree(spark):
    """driver-merge and spark-reduce partial strategies must produce
    identical centroids and membership counts."""
    emb_df = load_table(spark, SF, "embeddings")
    init = emb_df.filter(F.col("vec_id") < 8)
    a = {r.cluster_id: r for r in
         similarity.kmeans_fit(emb_df, init, n_iter=2, reduce_partials="driver").collect()}
    b = {r.cluster_id: r for r in
         similarity.kmeans_fit(emb_df, init, n_iter=2, reduce_partials="spark").collect()}
    assert a.keys() == b.keys()
    for cid in a:
        assert a[cid].n_members == b[cid].n_members
        assert max(abs(x - y) for x, y in
                   zip(a[cid].centroid, b[cid].centroid)) < 1e-9
