"""Re-ranking + function-query operators.

- ``rerank``: re-score the top-N docs of a main query with a second scorer
  and combine (reference: solr/core/src/java/org/apache/solr/search/
  ReRankQParserPlugin.java — reRankDocs window, reRankWeight multiplier;
  default combine is main + weight·rerank).
- ``boost_by``: multiply a query's score by a function of stored fields
  ({!boost b=f(x)} — search/BoostQParserPlugin.java).
- ``frange``: filter by a function's value range
  ({!frange l=.. u=..} — search/FunctionRangeQParserPlugin.java). Function
  queries are arbitrary Column expressions — pyspark.sql.functions covers
  Solr's ValueSourceParser registry nearly 1:1 (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rerank(
    main_scored: DataFrame,
    rerank_scored: DataFrame,
    rerank_docs: int = 200,
    rerank_weight: float = 2.0,
    k: int = 10,
) -> DataFrame:
    """Re-rank the top ``rerank_docs`` of ``main_scored`` (docid, score) by
    adding ``rerank_weight`` × the second query's score; docs outside the
    window keep their original score and order (Solr semantics)."""
    window = (
        main_scored.orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(rerank_docs)
    )
    combined = (
        window.join(
            rerank_scored.withColumnRenamed("score", "rr_score"), "docid", "left"
        )
        .select(
            "docid",
            (
                F.col("score")
                + F.lit(rerank_weight) * F.coalesce(F.col("rr_score"), F.lit(0.0))
            ).alias("score"),
        )
    )
    return combined.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)


def boost_by(scored: DataFrame, docs: DataFrame, boost: Column, k: int | None = None) -> DataFrame:
    """score ×= boost(doc). ``boost`` is any Column over ``docs``."""
    out = (
        scored.join(docs.select("docid", boost.alias("_b")), "docid")
        .select("docid", (F.col("score") * F.col("_b")).alias("score"))
    )
    out = out.orderBy(F.col("score").desc(), F.col("docid").asc())
    return out.limit(k) if k else out


def frange(df: DataFrame, expr: Column, lower=None, upper=None,
           incl_lower: bool = True, incl_upper: bool = True) -> DataFrame:
    """Keep rows where the function value lies in [lower, upper]."""
    pred = F.lit(True)
    if lower is not None:
        pred = pred & (expr >= lower if incl_lower else expr > lower)
    if upper is not None:
        pred = pred & (expr <= upper if incl_upper else expr < upper)
    return df.where(pred)


def map_func(expr: Column, mn: float, mx: float, target: float,
             default: Column | float | None = None) -> Column:
    """``map(x, min, max, target[, default])`` — values inside [min, max]
    become ``target``, others pass through (or ``default``)
    (Lucene/Solr RangeMapFloatFunction via ValueSourceParser "map")."""
    inside = (expr >= F.lit(mn)) & (expr <= F.lit(mx))
    other = expr if default is None else (
        default if isinstance(default, Column) else F.lit(float(default))
    )
    return F.when(inside, F.lit(float(target))).otherwise(other)


def scale_func(
    docs: DataFrame, expr: Column, target_min: float, target_max: float,
    out: str = "scaled",
) -> DataFrame:
    """``scale(f, min, max)`` — linearly rescale a function's values so the
    corpus-wide min/max land on [target_min, target_max] (Lucene
    ScaleFloatFunction via ValueSourceParser "scale"; the reference scans
    the index once per searcher to find the extremes). One tiny aggregate
    broadcast-joined back — no second pass over the data, no driver
    collect. A constant column maps to target_min (range 0 guard)."""
    mm = docs.agg(F.min(expr).alias("_mn"), F.max(expr).alias("_mx"))
    rng = F.col("_mx") - F.col("_mn")
    scaled = F.when(
        rng > 0,
        F.lit(float(target_min))
        + (expr - F.col("_mn")) * F.lit(float(target_max - target_min)) / rng,
    ).otherwise(F.lit(float(target_min)))
    return (
        docs.crossJoin(F.broadcast(mm))
        .withColumn(out, scaled)
        .drop("_mn", "_mx")
    )


def ord_func(
    docs: DataFrame, field: str, reverse: bool = False, out: str = "ord",
) -> DataFrame:
    """``ord(f)`` / ``rord(f)`` — the 1-based position of a doc's value in
    the index-sorted term dictionary for the field (Lucene OrdFieldSource /
    ReverseOrdFieldSource via ValueSourceParser "ord"/"rord"; ordinals are
    per-searcher in the reference — here the logical single-searcher view).

    Scale shape: the ordinal dictionary is DISTINCT values + dense_rank —
    a tiny frame (cardinality of the field, not rows) built with one
    aggregate + one single-partition sort of the distinct values only,
    then broadcast-joined back. Never a window over the full table.
    """
    from pyspark.sql import Window

    order = F.col(field).desc() if reverse else F.col(field).asc()
    dict_df = (
        docs.select(field).where(F.col(field).isNotNull()).distinct()
        .withColumn(out, F.dense_rank().over(Window.orderBy(order)))
    )
    return docs.join(F.broadcast(dict_df), field, "left")


def ms_func(a: Column | str, b: Column | str) -> Column:
    """``ms(a, b)`` — milliseconds between two instants (ValueSourceParser
    "ms", DualFloatFunction over date fields). ``a`` is commonly a resolved
    ``NOW``-anchored date-math literal (the reference resolves NOW once per
    request — see functions/datemath.py); pass it as an ISO string so it
    stays a pushable constant."""
    ca = F.lit(a).cast("timestamp") if isinstance(a, str) else a.cast("timestamp")
    cb = F.lit(b).cast("timestamp") if isinstance(b, str) else b.cast("timestamp")
    return F.unix_millis(ca) - F.unix_millis(cb)


def recip_func(x: Column, m: float, a: float, b: float) -> Column:
    """``recip(x, m, a, b)`` = a/(m·x+b) (Lucene ReciprocalFloatFunction via
    ValueSourceParser "recip") — the standard date-freshness boost shape
    ``recip(ms(NOW, date), 3.16e-11, 1, 1)``: 1.0 for "now", ~0.5 at one
    year old. Pure JVM arithmetic, whole-stage codegen."""
    return F.lit(float(a)) / (F.lit(float(m)) * x.cast("double") + F.lit(float(b)))


def strdist(a: Column, b: Column, measure: str = "edit") -> Column:
    """``strdist(s1, s2, measure)`` — string similarity in [0,1]
    (ValueSourceParser "strdist"; measure 'edit' = Lucene
    LevenshteinDistance.getDistance: 1 - edits/longerLength)."""
    if measure != "edit":
        raise NotImplementedError(f"strdist measure {measure!r}")
    longer = F.greatest(F.length(a), F.length(b))
    return F.when(longer == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - F.levenshtein(a, b) / longer.cast("double")
    )
