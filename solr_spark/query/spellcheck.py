"""Spell checking: dictionary-driven correction candidates.

Reference: solr/core/src/java/org/apache/solr/spelling/
DirectSolrSpellChecker.java — candidate terms within maxEdits (default 2)
of the input, drawn directly from the live term dictionary, ranked by edit
distance then document frequency; WordBreakSolrSpellChecker handles
split/join variants.

Spark shape: the term dictionary is the (term, df) table; candidates are a
levenshtein filter over it — a broadcast-size scan at any corpus scale
since the dictionary is orders of magnitude smaller than the corpus. A
first-letter prune mirrors DirectSpellChecker's FST prefix constraint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solr_spark.index.build import IndexTables


def spellcheck(
    index: IndexTables,
    word: str,
    max_edits: int = 2,
    count: int = 5,
    min_df: int = 1,
    require_same_first_letter: bool = True,
) -> DataFrame:
    """Correction candidates for ``word``: (term, df, dist), ranked by
    (dist asc, df desc, term asc). The input word itself is excluded."""
    w = word.lower()
    t = index.term_stats().where(F.col("df") >= min_df)
    if require_same_first_letter and w:
        t = t.where(F.col("term").startswith(w[0]))
    t = t.withColumn("dist", F.levenshtein(F.col("term"), F.lit(w)))
    return (
        t.where((F.col("dist") <= max_edits) & (F.col("term") != w))
        .orderBy(F.col("dist").asc(), F.col("df").desc(), F.col("term").asc())
        .limit(count)
        .select("term", "df", "dist")
    )
