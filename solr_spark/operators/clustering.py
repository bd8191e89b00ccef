"""On-line search-result clustering (dynamic facets over the top hits).

Reference: the clustering search component
(`contrib/clustering/src/java/org/apache/solr/handler/clustering/
ClusteringComponent.java`, ref guide `result-clustering.adoc`): cluster the
documents of a single query's result window into labeled groups. The
reference delegates the algorithm to the external Carrot2 library (Lingo's
SVD phrase extraction, STC, bisecting k-means); those engines are not
reimplemented here. This module ships the same component contract with a
deterministic significant-terms labeling engine — the ref guide's own
framing ("clusters ... can be perceived as dynamic facets") — which is the
part that matters for a distributed engine: it reads the RESULT SET's
stored text (not the index), discovers k labels, assigns every hit to its
best label or to the catch-all group, and is exactly reproducible in SQL.

Scale shape: the result window is small by construction (top-N of a
query), so every aggregation here runs on N rows; the only wide input is
the text column of those N rows. One explode + two keyed aggregations +
one broadcast-size label join. No Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from solr_spark.functions.dedup import tokens_col

#: the reference's Other/ungrouped cluster label (Carrot2 convention)
OTHER_LABEL = "Other topics"


def cluster_results(
    results: DataFrame,
    text_col: str,
    id_col: str,
    k_labels: int = 5,
    min_df: int = 2,
    stop_terms: tuple[str, ...] = (),
) -> DataFrame:
    """Assign each result doc to a labeled cluster.

    Labels are the ``k_labels`` terms with the highest within-results
    significance ``df_r * ln(N_r / df_r)`` (0 for terms in every doc —
    they can't split the set; maximized near df_r ≈ N_r/e), requiring
    ``df_r >= min_df`` and not in ``stop_terms``; ties break to the
    alphabetically-first term. Every doc joins the best-ranked label it
    contains, or ``OTHER_LABEL``.

    Returns (id, label, label_rank) — one row per input doc;
    ``label_rank`` is 1-based label order (0 for the Other group).
    """
    toks = results.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("term"),
    )
    per_term = toks.groupBy("term").agg(F.count("*").alias("df_r"))
    total = results.select(F.count("*").alias("n_r"))
    scored = per_term.crossJoin(F.broadcast(total)).select(
        "term", "df_r",
        (F.col("df_r") * F.log(F.col("n_r") / F.col("df_r"))).alias("score"),
    )
    if stop_terms:
        scored = scored.where(~F.col("term").isin(*stop_terms))
    labels = (
        scored.where(F.col("df_r") >= min_df)
        .withColumn(
            "label_rank",
            F.row_number().over(
                Window.orderBy(F.col("score").desc(), F.col("term").asc())
            ),
        )
        .where(F.col("label_rank") <= k_labels)
        .select(F.col("term").alias("label"), "label_rank")
    )
    assigned = (
        toks.join(F.broadcast(labels), toks["term"] == labels["label"])
        .groupBy("id")
        .agg(F.min("label_rank").alias("label_rank"))
    )
    best = labels.select("label", F.col("label_rank").alias("_lr"))
    out = (
        results.select(F.col(id_col).alias("id"))
        .join(assigned, "id", "left")
        .join(F.broadcast(best), F.col("label_rank") == F.col("_lr"), "left")
        .select(
            "id",
            F.coalesce(F.col("label"), F.lit(OTHER_LABEL)).alias("label"),
            F.coalesce(F.col("label_rank"), F.lit(0)).alias("label_rank"),
        )
    )
    return out


def cluster_summary(assignments: DataFrame) -> DataFrame:
    """(label, label_rank, n_docs) per discovered cluster, Other last."""
    return (
        assignments.groupBy("label", "label_rank")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(
            F.when(F.col("label_rank") == 0, F.lit(10**9)).otherwise(
                F.col("label_rank")
            )
        )
    )
