"""Query elevation — editorial pinning/exclusion above any scorer.

Reference: solr/core/src/java/org/apache/solr/handler/component/
QueryElevationComponent.java — an elevate.xml maps query text to ids that
must appear FIRST (in configured order, regardless of score) and ids that
must not appear at all. With forceElevation (the default applied here),
pinned docs are included even when the organic query did not match them.

Spark shape: the elevation map is editorial metadata — a tiny broadcast.
The organic (docid, score) stream gets an elevation rank via a broadcast
join; ordering is (elevated first by pin position, then score desc, docid
asc); excluded ids drop via the same broadcast (no extra shuffle beyond
the top-k the query already does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def elevate(
    scored: DataFrame,
    docs: DataFrame,
    pinned: list[int],
    excluded: list[int] | None = None,
    k: int = 10,
) -> DataFrame:
    """Apply elevation to an organic (docid, score) stream.

    ``docs`` supplies rows for pinned ids the organic query missed
    (forceElevation — they surface with score 0). Returns top-k
    (docid, score, elevated) ordered pin-position-first then score."""
    excluded = excluded or []
    spark = scored.sparkSession
    organic = scored
    if excluded:
        organic = organic.where(~F.col("docid").isin(excluded))
    if pinned:
        pins = F.broadcast(
            spark.createDataFrame(
                [(int(d), i) for i, d in enumerate(pinned)], "docid long, pin int"
            )
        )
        # forceElevation: pinned ids absent from the organic stream join in
        # from the corpus with score 0. Union + max-groupBy rather than an
        # anti-join so the organic stream executes ONCE (organic scores are
        # non-negative, so max() keeps the real score when both rows exist).
        forced = (
            docs.select("docid")
            .join(pins.select("docid"), "docid", "left_semi")
            .select("docid", F.lit(0.0).alias("score"))
        )
        organic = (
            organic.unionByName(forced)
            .groupBy("docid")
            .agg(F.max("score").alias("score"))
            .join(pins, "docid", "left")
        )
    else:
        organic = organic.withColumn("pin", F.lit(None).cast("int"))
    out = organic.select(
        "docid",
        "score",
        F.col("pin").isNotNull().alias("elevated"),
        F.coalesce(F.col("pin"), F.lit(1 << 30)).alias("_rank"),
    )
    return (
        out.orderBy(
            F.col("_rank").asc(), F.col("score").desc(), F.col("docid").asc()
        )
        .limit(k)
        .select("docid", "score", "elevated")
    )
