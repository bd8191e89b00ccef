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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gather_nodes(
    edges: DataFrame,
    seeds: DataFrame,
    hops: int = 1,
    src: str = "src",
    dst: str = "dst",
    traversal_filter: Column | None = None,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Nodes reachable in EXACTLY <= hops steps from seeds (seeds excluded),
    annotated with the hop at which each node was first reached.

    ``seeds``: one column named ``node``. Returns (node, hop).

    ``traversal_filter`` — a predicate over the edge columns applied at
    every expansion (GatherNodesStream.java:353,514 forwards its
    queryParams as an fq on each hop's join query).

    ``max_doc_freq`` — the hot-node cap (GatherNodesStream.java:531-532
    `{!graphTerms f=... maxDocFreq=N}`; search/GraphTermsQParserPlugin):
    frontier keys matching more than N edges are NOT expanded. This is the
    reference's skew guard — at web scale one celebrity node would
    otherwise pull its whole neighborhood into every walk; the cap turns
    that into a df-aggregate + anti-join, never a hot-key shuffle.
    """
    if traversal_filter is not None:
        edges = edges.where(traversal_filter)
    hot = None
    if max_doc_freq is not None:
        hot = (
            edges.groupBy(F.col(src).alias("node"))
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") > max_doc_freq)
            .select("node")
        )
    visited = seeds.select(F.col("node"), F.lit(0).alias("hop"))
    frontier = visited
    for h in range(1, hops + 1):
        if hot is not None:
            frontier = frontier.join(hot, "node", "left_anti")
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


def score_nodes(
    nodes: DataFrame,
    stats: DataFrame,
    num_docs: int,
    count_col: str = "count",
) -> DataFrame:
    """`scoreNodes` — tf-idf weighting of gathered nodes
    (solrj io/stream/ScoreNodesStream.java:241):

        nodeScore = (ln(termFreq) + 1) · (ln((numDocs+1)/(docFreq+1)) + 1)

    where termFreq is the node's gathered ``count(*)`` and docFreq its
    document frequency in the collection. The reference fetches docFreq
    with one TermsComponent request per batch; here ``stats`` is the
    (node, docFreq) frame — typically one reusable aggregate over the edge
    table — broadcast when small. Adds nodeScore/docFreq/numDocs columns,
    pure JVM arithmetic."""
    joined = nodes.join(stats, "node", "left").withColumn(
        "docFreq", F.coalesce(F.col("docFreq"), F.lit(0)).cast("long")
    )
    score = (F.log(F.col(count_col).cast("double")) + F.lit(1.0)) * (
        F.log(
            (F.lit(float(num_docs + 1)))
            / (F.col("docFreq").cast("double") + F.lit(1.0))
        )
        + F.lit(1.0)
    )
    return joined.withColumn("nodeScore", score).withColumn(
        "numDocs", F.lit(num_docs).cast("long")
    )


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
