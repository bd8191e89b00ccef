"""Highlighting: snippet extraction around query-term matches.

Reference: solr/core/src/java/org/apache/solr/highlight/
DefaultSolrHighlighter.java (1011 LoC) re-analyzes stored text and wraps
matches in <em> tags within best-scoring fragments. This is the JVM-side
DataFrame reduction of that: locate the first match of any query term in
the lowercased text, cut a window of ``frag_size`` characters around it,
and wrap occurrences with the pre/post tags. Single-fragment, first-match
semantics — the common UI case — as pure string expressions (no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _first_pos(text_lc: Column, terms: list[str]) -> Column:
    """1-based position of the earliest match of any term (0 = no match)."""
    pos = F.lit(0)
    for t in terms:
        p = F.locate(t.lower(), text_lc)
        pos = F.when(
            (p > 0) & ((pos == 0) | (p < pos)), p
        ).otherwise(pos)
    return pos


def highlight(
    df: DataFrame,
    text_col: str,
    terms: list[str],
    frag_size: int = 80,
    pre: str = "<em>",
    post: str = "</em>",
    out: str = "snippet",
) -> DataFrame:
    """Add a ``snippet`` column: a frag_size window around the first match
    with every term occurrence tagged; NULL when nothing matches."""
    text = F.col(text_col)
    lc = F.lower(text)
    pos = _first_pos(lc, terms)
    start = F.greatest(F.lit(1), pos - F.lit(frag_size // 4))
    frag = F.substring(text, start.cast("int"), frag_size)
    tagged = F.lower(frag)
    for t in sorted(set(t.lower() for t in terms)):
        tagged = F.regexp_replace(
            tagged, f"\\b{t}\\b", f"{pre}{t}{post}"
        )
    return df.withColumn(out, F.when(pos > 0, tagged))
