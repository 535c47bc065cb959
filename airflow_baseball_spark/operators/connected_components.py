"""Connected components — single-link clustering of candidate-pair
graphs (the step after LSH: pairs → duplicate *clusters*).

Pregel-style min-label propagation: every node starts labeled with its
own id; each round, a node takes the minimum label among itself and its
neighbors; converged when no label changes. Rounds needed = graph
diameter (near-dup clusters are shallow — a handful), each round is one
join + one groupBy on the edge list: embarrassingly scalable, no
adjacency matrix, no driver-side graph.

The driver loop holds only a per-round changed-count (a bounded action,
not data). Each round's labels are ``localCheckpoint``-ed: persisting
alone is NOT enough for iterative plans — the cache holds the data but
Catalyst still re-analyzes the whole accumulated join tree every round
(measured 1.4s → 83s/round by iteration 5); checkpointing truncates the
lineage so every round optimizes a constant-size plan. On a production
cluster prefer reliable ``checkpoint()`` (HDFS-backed) for fault
tolerance; localCheckpoint trades that for speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 15,
) -> DataFrame:
    """(node, root) for every node appearing in ``edges``; root is the
    minimum node id reachable in the undirected graph."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["u"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_min") < F.col("label")).alias("__changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("root"))


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Every row of ``df`` labeled with its duplicate-cluster root
    (singletons root to themselves). Downstream dedup keeps rows where
    ``cluster_root == id`` and drops the rest."""
    comp = connected_components(pairs, src, dst)
    return (
        df.select(id_col)
        .join(comp, df[id_col] == comp["node"], "left")
        .select(
            id_col,
            F.coalesce(F.col("root"), F.col(id_col)).alias("cluster_root"),
        )
    )
