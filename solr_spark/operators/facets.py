"""Faceting + stats — Solr's aggregation frameworks on DataFrames.

Reference (SURVEY.md §2.4): the JSON Facet API
(solr/core/src/java/org/apache/solr/search/facet/ — FacetField terms
buckets, FacetRange, FacetQuery; agg functions in facet/*Agg.java) and the
legacy StatsComponent (handler/component/StatsComponent.java +
StatsValuesFactory.java).

Physical note: the reference picks a per-field strategy by hand
(FacetFieldProcessorByArrayDV / ByHashDV / ByEnumTermsStream) and does a
distributed over-request + refinement dance (FacetComponent.java:346-519)
because per-shard top-N buckets can miss global winners. Spark's partial+
final hash aggregate is EXACT by construction — the groupBy shuffles each
key once, so no refinement round exists or is needed; top-N is applied
after the exact global counts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def terms_facet(
    df: DataFrame,
    field: str,
    limit: int = 10,
    mincount: int = 1,
    sort_by_count: bool = True,
    offset: int = 0,
) -> DataFrame:
    """Terms facet: value -> count with limit/offset/mincount/sort.

    Matches `json.facet={f:{type:terms,field:...,limit:...,mincount:...,
    sort:"count desc"}}` (facet/FacetField.java). Bucket sort ties break by
    the bucket value ascending (Solr's index order), making output
    deterministic.
    """
    out = df.groupBy(F.col(field).alias("value")).agg(F.count("*").alias("count"))
    if mincount > 0:
        out = out.where(F.col("count") >= mincount)
    order = (
        [F.col("count").desc(), F.col("value").asc()]
        if sort_by_count
        else [F.col("value").asc()]
    )
    out = out.orderBy(*order)
    if offset:
        out = out.offset(offset)
    return out.limit(limit)


def range_facet(
    df: DataFrame,
    field: str,
    start: float,
    end: float,
    gap: float,
    mincount: int = 0,
) -> DataFrame:
    """Numeric range facet: fixed-width buckets [start, end) with width gap.

    Matches facet.range / {type:range} (facet/FacetRange.java). Buckets with
    zero hits are omitted unless the caller unions a bucket spine (Solr
    emits empty buckets; for oracle comparability we emit observed buckets
    with mincount=0 semantics of 'present in data').
    """
    bucket = (
        F.floor((F.col(field) - F.lit(start)) / F.lit(gap)) * F.lit(gap) + F.lit(start)
    )
    out = (
        df.where((F.col(field) >= start) & (F.col(field) < end))
        .groupBy(bucket.cast("double").alias("bucket"))
        .agg(F.count("*").alias("count"))
    )
    if mincount > 0:
        out = out.where(F.col("count") >= mincount)
    return out.orderBy("bucket")


def query_facet(df: DataFrame, buckets: dict[str, Column]) -> DataFrame:
    """Query facet: named arbitrary-predicate buckets counted in ONE pass.

    Matches {type:query} buckets (facet/FacetQuery.java). Implemented as
    conditional aggregation — a single scan, no per-bucket jobs.
    """
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in buckets.items()
    ]
    return df.agg(*aggs)


def pivot_facet(
    df: DataFrame, fields: Sequence[str], limit_per_level: int | None = None
) -> DataFrame:
    """Hierarchical pivot facet: nested value counts over ``fields``.

    Matches facet.pivot (handler/component/PivotFacetProcessor.java). The
    flat (f1, f2, ..., count) form; Solr nests the same numbers as JSON.
    """
    out = df.groupBy(*fields).agg(F.count("*").alias("count"))
    return out.orderBy(*[F.col(f).asc() for f in fields])


def field_stats(
    df: DataFrame,
    field: str,
    by: str | None = None,
    percentiles: Sequence[float] = (),
) -> DataFrame:
    """StatsComponent: min/max/sum/count/missing/sumOfSquares/mean/stddev.

    Matches handler/component/StatsComponent.java + StatsValuesFactory.
    ``percentiles`` uses Spark's exact percentile (the reference uses a
    t-digest sketch — AVLTreeDigest(100), facet/PercentileAgg.java:151 — so
    sketched values differ; exact is the stronger contract and what the
    DuckDB oracle computes).
    """
    c = F.col(field)
    aggs = [
        F.count(c).alias("count"),
        F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("long").alias("missing"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        F.sum(c * c).alias("sumsq"),
        F.avg(c).alias("mean"),
        F.stddev_samp(c).alias("stddev"),
    ]
    aggs += [
        F.percentile(c, F.lit(p)).alias(f"p{int(p * 100)}") for p in percentiles
    ]
    if by is None:
        return df.agg(*aggs)
    return df.groupBy(by).agg(*aggs).orderBy(by)


def unique_agg(df: DataFrame, field: str, by: str | None = None) -> DataFrame:
    """`unique` facet agg — exact distinct count (facet/UniqueAgg.java)."""
    agg = F.countDistinct(F.col(field)).alias("unique")
    return df.agg(agg) if by is None else df.groupBy(by).agg(agg).orderBy(by)


def hll_agg(df: DataFrame, field: str, by: str | None = None, rsd: float = 0.023) -> DataFrame:
    """`hll` facet agg — approximate distinct via HLL++ (facet/HLLAgg.java
    uses org.apache.solr.util.hll; Spark's approx_count_distinct is the
    HyperLogLog++ equivalent). Not oracle-comparable (different sketch)."""
    agg = F.approx_count_distinct(F.col(field), rsd).alias("hll")
    return df.agg(agg) if by is None else df.groupBy(by).agg(agg).orderBy(by)
