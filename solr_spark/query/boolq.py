"""`{!bool}` query parser — boolean composition of named sub-queries.

Reference: solr/core/src/java/org/apache/solr/search/BoolQParserPlugin.java
(`{!bool must=... must_not=... filter=... should=...}`), which builds a
Lucene BooleanQuery: MUST clauses score and restrict, SHOULD clauses add
score when they match, FILTER clauses restrict without scoring (wrapped in
FilterQuery, BoolQParserPlugin.java:50-55), MUST_NOT excludes. Lucene
BooleanQuery semantics: when no MUST/FILTER clause exists at least one
SHOULD must match; the document score is the sum of its matching scoring
clauses; a bool query with only filter/must_not clauses scores 0.

Spark-first: every sub-query string runs through the same Lucene-grammar
``search`` compiler as a full (docid, score) stream; composition is one
union + groupBy-sum for the scoring clauses, a left-semi join per
must/filter set, a left-anti join per must_not set, then one
TakeOrderedAndProject. Sub-query streams are keyed aggregations over
term-pruned postings scans, so nothing here adds a driver loop or an extra
pass over the corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solr_spark.index.build import IndexTables
from solr_spark.query.bm25 import B_DEFAULT, K1_DEFAULT
from solr_spark.query.parser import search


def optional_under_required(
    domain: DataFrame, should_parts: Sequence[DataFrame]
) -> DataFrame:
    """Lucene BooleanQuery combination when required clauses exist
    (ReqOptSumScorer): every ``domain`` doc matches; its score is the sum
    of whichever optional (SHOULD) streams it also matches, 0 when none.
    Shared by `{!bool}` and the XML BooleanQuery so the semantics cannot
    drift between the two grammars."""
    if not should_parts:
        return domain.select("docid", F.lit(0.0).alias("score"))
    allc = should_parts[0].select("docid", "score")
    for p in should_parts[1:]:
        allc = allc.unionByName(p.select("docid", "score"))
    opt = allc.groupBy("docid").agg(F.sum("score").alias("_opt"))
    return domain.join(opt, "docid", "left").select(
        "docid", F.coalesce(F.col("_opt"), F.lit(0.0)).alias("score")
    )


def bool_query(
    index: IndexTables,
    must: Sequence[str] = (),
    must_not: Sequence[str] = (),
    filter: Sequence[str] = (),  # noqa: A002 - Solr param name
    should: Sequence[str] = (),
    k: int = 10,
    default_field: str = "text",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k (docid, score) for a `{!bool}` composition of sub-queries."""
    if not (must or must_not or filter or should):
        raise ValueError("bool query needs at least one clause")

    def sub(q: str) -> DataFrame:
        return search(
            index, q, k=k, default_field=default_field, k1=k1, b=b,
            _scores_only=True,
        )

    # MUST enforcement by membership COUNT inside the one union+groupBy:
    # each sub-query stream is docid-unique, so a doc matching all of the
    # len(must) required streams contributes exactly len(must) `_m` — no
    # re-execution of the must streams as separate semi-join sets.
    filter_sets = [sub(q).select("docid") for q in filter]
    not_sets = [sub(q).select("docid") for q in must_not]

    if must:
        parts = [sub(q).withColumn("_m", F.lit(1)) for q in must] + [
            sub(q).withColumn("_m", F.lit(0)) for q in should
        ]
        allc = parts[0]
        for p in parts[1:]:
            allc = allc.unionByName(p)
        scored = (
            allc.groupBy("docid")
            .agg(F.sum("score").alias("score"), F.sum("_m").alias("_m"))
            .where(F.col("_m") == len(must))
            .drop("_m")
        )
    elif filter_sets:
        # Required clauses exist (FILTER counts as required in Lucene's
        # BooleanQuery), so SHOULD becomes purely optional (filter-only
        # bool: matches score 0 — FilterQuery).
        domain = filter_sets[0]
        for s in filter_sets[1:]:
            domain = domain.join(s, "docid", "left_semi")
        filter_sets = []
        scored = optional_under_required(domain, [sub(q) for q in should])
    elif should:
        # no required clause: at least one SHOULD must match
        su = [sub(q) for q in should]
        allc = su[0]
        for p in su[1:]:
            allc = allc.unionByName(p)
        scored = allc.groupBy("docid").agg(F.sum("score").alias("score"))
    else:
        raise ValueError("bool query with only must_not clauses matches nothing")

    for s in filter_sets:
        scored = scored.join(s, "docid", "left_semi")
    for s in not_sets:
        scored = scored.join(s, "docid", "left_anti")
    return scored.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)


def switch_query(value: str | None, cases: dict[str, str], default: str | None = None) -> str:
    """`{!switch}` (search/SwitchQParserPlugin.java): route a request
    value to one of several sub-query strings. ``cases`` keys match the
    trimmed value; '' matches a present-but-blank value (case.''); a
    missing/None value or an unmatched value falls to ``default``;
    no-default + no-match is an error, like the reference."""
    if value is not None:
        key = value.strip()
        if key in cases:
            return cases[key]
    if default is not None:
        return default
    raise ValueError(f"switch: no case matches {value!r} and no default")
