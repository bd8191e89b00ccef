"""Solr join operators: {!join}, ScoreJoin modes, block (parent/child) join.

Reference (SURVEY.md §2.3):
- `{!join from=f to=t}` — term-set semi-join: docs of the target whose ``t``
  appears among the ``f`` values of docs matching the inner query
  (search/JoinQuery.java). No scores by default.
- ScoreJoin `score=avg|max|min|total` — aggregates the from-side scores
  onto each to-side doc (search/join/ScoreJoinQParserPlugin.java:81-86,
  via Lucene JoinUtil).
- Block join `{!parent which=...}` / `{!child of=...}` — parent/child
  hierarchies stored as contiguous blocks; on DataFrames the hierarchy is
  just two tables and the block trick (a bitset walk to the enclosing
  parent) becomes an equi-join on the parent key
  (search/join/BlockJoinParentQParserPlugin.java).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCORE_AGG = {
    "avg": F.avg,
    "max": F.max,
    "min": F.min,
    "total": F.sum,
}


def join_filter(
    to_df: DataFrame, from_df: DataFrame, from_col: str, to_col: str
) -> DataFrame:
    """`{!join}`: rows of to_df whose to_col appears in from_df.from_col."""
    keys = from_df.select(F.col(from_col).alias(to_col)).distinct()
    return to_df.join(keys, to_col, "left_semi")


def score_join(
    to_df: DataFrame,
    from_scored: DataFrame,
    from_col: str,
    to_col: str,
    mode: str = "max",
) -> DataFrame:
    """ScoreJoin: to-side rows with the from-side scores aggregated.

    ``from_scored`` carries (from_col, score). mode='none' reduces to the
    plain semi-join with score 0 (Solr's default)."""
    if mode == "none":
        return join_filter(to_df, from_scored, from_col, to_col).withColumn(
            "score", F.lit(0.0)
        )
    agg = _SCORE_AGG[mode]
    scores = (
        from_scored.groupBy(F.col(from_col).alias(to_col))
        .agg(agg("score").alias("score"))
    )
    return to_df.join(scores, to_col, "inner")


def parent_join(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_filter: Column,
) -> DataFrame:
    """`{!parent}`: parents having >= 1 child matching child_filter."""
    hits = children.where(child_filter).select(parent_key).distinct()
    return parents.join(hits, parent_key, "left_semi")


def child_join(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    parent_filter: Column,
) -> DataFrame:
    """`{!child}`: children whose parent matches parent_filter."""
    hits = parents.where(parent_filter).select(parent_key).distinct()
    return children.join(hits, parent_key, "left_semi")


def atomic_update(
    docs: DataFrame,
    updates: DataFrame,
    key: str,
    set_cols: list[str] = (),
    inc_cols: list[str] = (),
) -> DataFrame:
    """Atomic update semantics (update/processor/AtomicUpdateDocumentMerger
    .java): merge partial documents onto stored docs — ``set`` replaces a
    field when the update provides a non-null value, ``inc`` adds to it.
    Rows absent from ``updates`` pass through unchanged. (On Iceberg this is
    MERGE INTO; expressed here as the equivalent left join + coalesce.)"""
    upd = updates.select(
        key,
        *[F.col(c).alias(f"_set_{c}") for c in set_cols],
        *[F.col(c).alias(f"_inc_{c}") for c in inc_cols],
    )
    out = docs.join(upd, key, "left")
    for c in set_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"_set_{c}"), F.col(c)))
    for c in inc_cols:
        out = out.withColumn(
            c, F.col(c) + F.coalesce(F.col(f"_inc_{c}"), F.lit(0))
        )
    return out.drop(*[f"_set_{c}" for c in set_cols], *[f"_inc_{c}" for c in inc_cols])


def child_transform(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_filter: Column | None = None,
    limit: int | None = None,
    order_by: str | Column | list[str | Column] | None = None,
) -> DataFrame:
    """The `[child]` doc transformer (response/transform/
    ChildDocTransformerFactory.java): attach each matched parent's child
    docs — optional childFilter, at most ``limit`` children per parent in
    ``order_by`` order. Long form (one row per surviving child), where the
    reference nests the same rows under the parent.

    The per-parent cap is a window PARTITIONED by the parent key — ranks
    compute within each parent's partition, never a global sort.

    ``order_by`` should be a TOTAL order within each parent (a list of
    columns is accepted): the reference caps children in segment-docid
    order, which is total by construction, so any tie in a partial sort
    key here would make the capped subset an arbitrary (if deterministic)
    choice among tied children."""
    from pyspark.sql import Window

    kids = children.where(child_filter) if child_filter is not None else children
    kids = kids.join(parents.select(parent_key), parent_key, "left_semi")
    if limit is not None:
        if order_by is None:
            order_cols = [parent_key]
        elif isinstance(order_by, (list, tuple)):
            order_cols = list(order_by)
        else:
            order_cols = [order_by]
        w = Window.partitionBy(parent_key).orderBy(*order_cols)
        kids = (
            kids.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= limit)
            .drop("_rn")
        )
    return kids
