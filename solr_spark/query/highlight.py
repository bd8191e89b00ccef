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
    # Tag the ORIGINAL-case fragment (the reference highlighter returns the
    # stored text verbatim around the tags) with a case-insensitive
    # word-boundary match; $0 keeps the matched casing inside the tags.
    tagged = F.substring(text, start.cast("int"), frag_size)
    for t in sorted(set(t.lower() for t in terms)):
        tagged = F.regexp_replace(
            tagged, f"(?i)\\b{t}\\b", f"{pre}$0{post}"
        )
    return df.withColumn(out, F.when(pos > 0, tagged))


def _frag_counts(frag_lc: Column, term: str) -> Column:
    """WHOLE-WORD occurrences of ``term`` in the lowercased fragment — the
    same \\b boundary rule the tagger uses, so a fragment selected as best
    (n_terms > 0) always contains at least one tag."""
    return F.regexp_count(frag_lc, F.lit(f"\\b{term}\\b")).cast("int")


def highlight_fragments(
    df: DataFrame,
    text_col: str,
    terms: list[str],
    frag_size: int = 80,
    max_fragments: int = 3,
    pre: str = "<em>",
    post: str = "</em>",
    out: str = "snippets",
) -> DataFrame:
    """Multi-fragment highlighting with FRAGMENT SCORING
    (highlight/DefaultSolrHighlighter.java fragment ranking): the text is
    cut into fixed frag_size windows; each fragment scores (distinct query
    terms present, total occurrences); the best ``max_fragments`` fragments
    (score desc, position asc) are returned tagged, as an array column.

    Everything is JVM array expressions: window split via transform over a
    sequence, per-fragment counts via length-diff, ranking via array_sort
    with a comparator — no explode, no Python.
    """
    tl = sorted({t.lower() for t in terms})
    text = F.col(text_col)
    n_frags = F.ceil(F.length(text) / F.lit(frag_size)).cast("int")
    frags = F.transform(
        F.sequence(F.lit(0), F.greatest(n_frags - 1, F.lit(0))),
        lambda i: F.struct(
            i.alias("idx"),
            F.substring(text, (i * frag_size + 1).cast("int"), frag_size).alias("frag"),
        ),
    )

    def scored(s):
        frag_lc = F.lower(s["frag"])
        n_total = None
        n_distinct = None
        for t in tl:
            c = _frag_counts(frag_lc, t)
            n_total = c if n_total is None else n_total + c
            d = F.when(c > 0, 1).otherwise(0)
            n_distinct = d if n_distinct is None else n_distinct + d
        return F.struct(
            n_distinct.alias("n_terms"), n_total.alias("n_hits"),
            s["idx"].alias("idx"), s["frag"].alias("frag"),
        )

    ranked = F.array_sort(
        F.transform(frags, scored),
        lambda a, b: F.when(a["n_terms"] != b["n_terms"],
                            b["n_terms"] - a["n_terms"])
        .when(a["n_hits"] != b["n_hits"], b["n_hits"] - a["n_hits"])
        .otherwise(a["idx"] - b["idx"]),
    )
    best = F.filter(
        F.slice(ranked, 1, max_fragments), lambda s: s["n_terms"] > 0
    )

    def tag(s):
        frag = s["frag"]  # original case; $0 keeps the matched casing
        for t in tl:
            frag = F.regexp_replace(frag, f"(?i)\\b{t}\\b", f"{pre}$0{post}")
        return frag

    return df.withColumn(out, F.transform(best, tag)).withColumn(
        "_frag_meta",
        F.transform(best, lambda s: F.struct(
            s["idx"].alias("idx"), s["n_terms"].alias("n_terms"),
            s["n_hits"].alias("n_hits"),
        )),
    )
