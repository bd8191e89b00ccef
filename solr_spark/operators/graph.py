"""Graph traversal operators: frontier expansion + shortest path.

Reference (SURVEY.md §2.3): `nodes`/`gatherNodes` does ONE BFS frontier
expansion per wrap (solrj io/graph/GatherNodesStream.java, 845 LoC —
distributed via worker hash partitioning), and `shortestPath` iterates BFS
to a target (io/graph/ShortestPathStream.java, 519 LoC). The `{!graph}`
query parser (search/GraphQParserPlugin.java) is the same walk as a filter.

Spark shape: each hop is one equi-join frontier→edges plus an anti-join
against the visited set — the standard iterative-join BFS (GraphFrames
style). Frontiers are checkpoint-friendly DataFrames; at scale, persist the
visited set and repartition edges by src once so every hop co-locates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gather_nodes(
    edges: DataFrame,
    seeds: DataFrame,
    hops: int = 1,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Nodes reachable in EXACTLY <= hops steps from seeds (seeds excluded),
    annotated with the hop at which each node was first reached.

    ``seeds``: one column named ``node``. Returns (node, hop).
    """
    visited = seeds.select(F.col("node"), F.lit(0).alias("hop"))
    frontier = visited
    for h in range(1, hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges[src])
            .select(F.col(dst).alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h))
        )
        if h >= 2:
            # Deep walks: truncate the plan per hop — without this the
            # visited-set lineage doubles every iteration (each hop re-plans
            # every earlier join) and the driver's plan-compile time, not
            # the data, becomes the bottleneck.
            nxt = nxt.localCheckpoint(eager=True)
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited.where(F.col("hop") > 0)


def shortest_path(
    edges: DataFrame,
    from_node,
    to_node,
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> int | None:
    """BFS shortest-path LENGTH between two nodes (None if unreachable
    within max_hops). Driver-side loop, executor-side joins."""
    spark = edges.sparkSession
    seeds = spark.createDataFrame([(from_node,)], ["node"])
    reach = gather_nodes(edges, seeds, hops=max_hops, src=src, dst=dst)
    hit = reach.where(F.col("node") == F.lit(to_node)).orderBy("hop").limit(1).collect()
    return int(hit[0]["hop"]) if hit else None
