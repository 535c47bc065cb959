"""Breadth-first reachability — minimum hop distance from a source
set, the building block for closure queries (BOM explosion, org-chart
rollups, citation/link neighborhoods) and for bounding crawl frontier
expansion in corpus curation.

Synchronous frontier expansion on DataFrames: round ``h`` joins the
current frontier (nodes first reached at distance ``h``) to the edge
list, anti-joins away everything already visited, and tags survivors
with ``h+1``. Rounds stop early when a frontier empties — the
driver's only per-round value is that emptiness flag (bounded action,
not data).

Scale posture: each round is one join keyed on the frontier node and
one anti-join against the visited set — both hash-partitioned on the
node id, so the exchanges line up round over round. Frontier and
visited sets are ``localCheckpoint``-ed per round (same lineage-
truncation requirement as ``operators/connected_components.py`` /
``operators/pagerank.py``); visited grows monotonically to at most
|reachable nodes|, never |edges|. On a production cluster prefer
reliable ``checkpoint()`` for fault tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_hops: int = 6,
) -> DataFrame:
    """(node, dist) for every node reachable from ``sources`` within
    ``max_hops`` directed hops; sources themselves are distance 0.
    ``dist`` is the MINIMUM hop count (BFS order guarantees the first
    visit is minimal)."""
    visited = (
        sources.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    frontier = visited
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    for hop in range(1, max_hops + 1):
        # r11 (optimization): broadcast the frontier and the visited
        # set — both are node-scale (bounded by |V|, orders of
        # magnitude under the edge list this walks), so the planner's
        # sort-merge choice re-shuffled and re-sorted the WHOLE edge
        # list every hop (4 edge exchanges per walk; the hint removes
        # all of them — the edge list now never moves). For node sets
        # beyond broadcast range, pre-partition `edges` by src once
        # and let the rounds reuse that exchange instead.
        nxt = (
            F.broadcast(frontier)
            .join(e, frontier["node"] == e["e_src"])
            .select(F.col("e_dst").alias("node"))
            .distinct()
            .join(
                F.broadcast(visited.select("node")), "node", "left_anti"
            )
            .withColumn("dist", F.lit(hop))
            .localCheckpoint()
        )
        if nxt.isEmpty():  # bounded driver check — one flag per round
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited
