"""PageRank — link-analysis ranking over an edge list, the standard
importance prior for web-scale corpus curation (rank-weighted sampling
of crawled documents; cf. Page et al., "The PageRank Citation
Ranking", 1999).

Fixed-iteration power method on DataFrames: each round every node's
rank is redistributed equally over its out-edges, summed per target
(one shuffle keyed on ``dst``), damped, and topped up with the
teleport term. The variant here is "leaky" (mass that lands on
dangling nodes is not re-injected) — deterministic, one less global
agg per round, and rank-ORDER-equivalent for ranking use; callers who
need a true probability vector can renormalize the output.

Scale posture: per round, one join of edges→ranks (both hash-
partitioned on the join key; the edge list's degree column is
precomputed once so rounds never re-aggregate it) and one
map-combinable sum. Ranks are ``localCheckpoint``-ed every
``checkpoint_interval`` rounds — deep runs need the lineage
truncation of ``operators/connected_components.py`` (iterative joins
otherwise re-optimize an exponentially growing plan), but shallow
runs are faster WITHOUT per-round materialization (measured 2x at 3
iterations). The only driver-side value is the node count (one
scalar). On a production cluster prefer reliable ``checkpoint()``
for fault tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_interval: int = 5,
) -> DataFrame:
    """(node, rank) for every node in ``edges`` after ``iterations``
    synchronous power-method rounds from the uniform start vector.

    ``edges`` is directed and should be pre-deduplicated if parallel
    edges must not double-weight (callers decide; ``distinct()`` here
    would hide a modeling choice).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()  # one driver scalar — bounded
    if n == 0:
        # empty edge list: no nodes, return the empty frame with the
        # output schema instead of dividing by zero below
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # src, dst, out_deg: degree rides the edge list so iteration joins
    # never recompute it
    ew = e.join(deg, "src").localCheckpoint()

    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iterations):
        contribs = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        # r11 (optimization): contribs is node-scale (one row per
        # in-linked node); without the hint the planner ran this
        # left join as a sort-merge — two exchanges + two sorts per
        # round (plans/r11/pagerank_{before,after}.txt). Broadcasting
        # the build side leaves `nodes` unmoved. Join strategy cannot
        # change the float sums — they are fixed upstream in the
        # groupBy.
        ranks = nodes.join(
            F.broadcast(contribs), nodes["node"] == contribs["dst"], "left"
        ).select(
            "node",
            (
                F.lit(teleport)
                + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
            ).alias("rank"),
        )
        # checkpoint every K rounds, not every round: each eager
        # localCheckpoint materializes the frame, and for shallow runs
        # that costs more than re-optimizing a few stacked joins
        # (measured 2x at 3 iterations, sf0.1); deep runs still get
        # their lineage truncated before Catalyst re-analysis blows up
        # (the failure mode measured in connected_components.py)
        if (i + 1) % checkpoint_interval == 0:
            ranks = ranks.localCheckpoint()
    return ranks
