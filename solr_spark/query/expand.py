"""Bounded multi-term expansion against the term dictionary.

Lucene never expands a wildcard/fuzzy clause by scanning the whole term
dictionary into the query: FuzzyQuery intersects a Levenshtein automaton
with the terms FST (sub-linear in dictionary size) and the TopTerms
rewrite caps the rewritten boolean at maxExpansions = 50 picking the best
terms (reference grammar: solr/core/src/java/org/apache/solr/parser/
QueryParser.jj:139-141; FuzzyQuery/TopTermsRewrite are public Lucene). At
a 100 TB corpus the dictionary holds 10^8-10^9 terms, so an uncapped
full-dictionary Levenshtein scan per query — or an uncapped driver collect
of every ``s*`` match — is the scale-killer this module removes.

DataFrame analogues:

- :func:`fuzzy_candidates` — pruned dictionary probe. A LENGTH-BAND
  predicate (``abs(length(term) - len(q)) <= maxEdits``, a cheap codegen
  comparison evaluated before any edit distance — sound because each edit
  changes the length by at most one) restricts the rows that ever reach
  the THRESHOLDED Levenshtein (early-exit banded DP: cost O(maxEdits·len)
  per row, not O(len²)). Survivors are ranked (distance asc, df desc,
  term asc — the best-first order of Lucene's top-terms priority queue)
  and capped at ``max_expansions`` with a distributed ORDER BY/LIMIT
  (TakeOrderedAndProject) BEFORE the driver sees anything: the collect is
  always <= max_expansions rows regardless of dictionary size.

- Prefix clauses need NO dictionary expansion at all: the prefix predicate
  pushes into the postings scan itself (parquet StringStartsWith — the
  postings files are term-sorted, so row groups outside the prefix range
  are skipped via min/max stats) and matching is aggregated per doc.
  Lucene's CONSTANT_SCORE_REWRITE likewise materializes a docid bitset,
  never a term list. :func:`prefix_docids` returns that match-set stream;
  callers score it constant (boost once per matching doc).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Lucene FuzzyQuery.defaultMaxExpansions
MAX_EXPANSIONS = 50


def damerau_levenshtein(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein (transposition = ONE edit), the
    distance Lucene's FuzzyQuery counts by default (transpositions=true,
    QueryParser.jj fuzzy slop) and the one DuckDB's damerau_levenshtein
    implements — e.g. ('ca','abc') = 2, where restricted/OSA would say 3.
    Wagner-Lowrance DP; terms are short, so O(|a||b|) per pair is fine on
    the pruned candidate set this module feeds it."""
    la, lb = len(a), len(b)
    inf = la + lb
    da: dict[str, int] = {}
    d = [[inf] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = inf
    for i in range(la + 1):
        d[i + 1][1] = i
        d[i + 1][0] = inf
    for j in range(lb + 1):
        d[1][j + 1] = j
        d[0][j + 1] = inf
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            i1 = da.get(b[j - 1], 0)
            j1 = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,              # substitution
                d[i + 1][j] + 1,             # insertion
                d[i][j + 1] + 1,             # deletion
                d[i1][j1] + (i - i1 - 1) + 1 + (j - j1 - 1),  # transposition
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def fuzzy_candidates_df(
    term_stats: DataFrame,
    base: str,
    max_edits: int,
    max_expansions: int = MAX_EXPANSIONS,
    transpositions: bool = True,
) -> DataFrame:
    """The capped probe as a (term, df) DataFrame — ORDER BY/LIMIT compiles
    to TakeOrderedAndProject, so every partition ships at most
    ``max_expansions`` rows to the driver.

    ``transpositions=True`` (Lucene FuzzyQuery's default) counts a swap of
    two adjacent characters as ONE edit. The JVM has no Damerau primitive,
    so the pipeline stays pruned in codegen and pays Python only on
    survivors: length band (sound for Damerau too — a transposition
    preserves length), then thresholded plain Levenshtein at 2·max_edits
    (sound superset: lev <= 2·damerau, every transposition being two plain
    edits), then the exact Damerau distance via an Arrow-batched UDF on
    what little remains."""
    qlen = len(base)
    tlen = F.length(F.col("term"))
    banded = term_stats.where(
        (tlen >= qlen - max_edits) & (tlen <= qlen + max_edits)
    )
    if transpositions:
        from pyspark.sql.functions import pandas_udf

        def _dl_fn(terms: "pd.Series") -> "pd.Series":
            return terms.map(lambda t: damerau_levenshtein(t, base))

        _dl = pandas_udf(_dl_fn, "int")

        cand = banded.withColumn(
            "_lev", F.levenshtein(F.col("term"), F.lit(base), 2 * max_edits)
        ).where(F.col("_lev") >= 0).withColumn("_dist", _dl(F.col("term")))
        # the <= max_edits cut applies ABOVE the top-50: dist-ascending
        # order puts every true match before any over-distance row, so the
        # result set is identical and the Python UDF evaluates ONCE (a
        # pre-limit filter on the UDF column makes Catalyst re-evaluate it)
        return (
            cand.orderBy(
                F.col("_dist").asc(), F.col("df").desc(), F.col("term").asc()
            )
            .limit(max_expansions)
            .where(F.col("_dist") <= max_edits)
            .select("term", "df")
        )
    cand = banded.withColumn(
        "_dist", F.levenshtein(F.col("term"), F.lit(base), max_edits)
    ).where(F.col("_dist") >= 0)
    return (
        cand.orderBy(
            F.col("_dist").asc(), F.col("df").desc(), F.col("term").asc()
        )
        .limit(max_expansions)
        .select("term", "df")
    )


def fuzzy_candidates(
    term_stats: DataFrame,
    base: str,
    max_edits: int,
    max_expansions: int = MAX_EXPANSIONS,
    transpositions: bool = True,
) -> dict[str, int]:
    """Terms within ``max_edits`` of ``base``, best-first-capped.

    Returns {term: df}, at most ``max_expansions`` entries, chosen by
    (edit distance asc, df desc, term asc). The probe never scans the
    whole dictionary with a full DP: the length band rejects most rows
    with one integer comparison and the thresholded Levenshtein
    early-exits at ``max_edits``.
    """
    cand = fuzzy_candidates_df(
        term_stats, base, max_edits, max_expansions, transpositions
    )
    return {r["term"]: r["df"] for r in cand.collect()}


def prefix_docids(postings: DataFrame, prefix: str) -> DataFrame:
    """Distinct docids whose text contains any term with ``prefix``.

    One postings scan with a pushed-down StringStartsWith filter + a
    distinct on docid — no term list ever reaches the driver. This is the
    match-set (bitset) shape of Lucene's constant-score multi-term
    rewrite; callers attach the constant score.
    """
    return (
        postings.where(F.col("term").startswith(prefix))
        .select("docid")
        .distinct()
    )


def prefix_top_terms(
    term_stats: DataFrame,
    prefix: str,
    max_expansions: int = MAX_EXPANSIONS,
) -> dict[str, int]:
    """Capped prefix expansion for callers that genuinely need a TERM list
    (complexphrase wildcard slots, spellcheck probes): top
    ``max_expansions`` by (df desc, term asc) — Lucene's top-terms span
    rewrite order — via distributed ORDER BY/LIMIT, never an uncapped
    collect."""
    cand = (
        term_stats.where(F.col("term").startswith(prefix))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(max_expansions)
    )
    return {r["term"]: r["df"] for r in cand.select("term", "df").collect()}
