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
    # no distinct: duplicate edges cannot change a min-aggregate, and
    # (u,v)⊎(v,u) cannot collide when pairs arrive ordered (id_a <
    # id_b, as LSH emits them) — so deduping here would be one full
    # extra shuffle of the edge list for nothing.
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    for it in range(max_iter):
        # (a HashToMin-style label-edge augmentation was tried and
        # reverted: the pointer jump below already shortcuts through
        # the label tree, so the extra edges changed nothing in the
        # propagation sequence while tripling the per-round plan)
        nbr_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = labels.join(
            nbr_min, labels["node"] == nbr_min["u"], "left"
        ).select(
            "node",
            F.col("label").alias("old"),
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
            ).alias("mid"),
        )
        # pointer jump (path halving): label ← label's label. Labels
        # are monotone (label(x) ≤ x), so label(mid) ≤ mid and the
        # jump only improves. Halves remaining component diameter each
        # round → O(log d) rounds instead of O(d).
        jump = stepped.select(
            F.col("node").alias("jn"), F.col("mid").alias("jl")
        )
        # ONE checkpoint per round (the round's output): materializing
        # the intermediates too would mean 3 driver-roundtrip jobs per
        # round — stepped is recomputed once inside the jump join, which
        # is cheaper than an extra materialization barrier (measured
        # ~2.2s/round → ~1.2s/round at sf0.1).
        new_labels = (
            stepped.join(jump, stepped["mid"] == jump["jn"], "left")
            .select(
                "node",
                F.coalesce(F.col("jl"), F.col("mid")).alias("label"),
                (F.coalesce(F.col("jl"), F.col("mid")) < F.col("old")).alias(
                    "__changed"
                ),
            )
            .localCheckpoint()
        )
        labels = new_labels.drop("__changed")
        # star-contracted LSH graphs need ≥2 pointer-jumped rounds for
        # any nontrivial component — skip the convergence job until then
        if it >= 1 and new_labels.filter(F.col("__changed")).count() == 0:
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
