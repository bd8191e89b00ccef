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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Lucene FuzzyQuery.defaultMaxExpansions
MAX_EXPANSIONS = 50


def fuzzy_candidates_df(
    term_stats: DataFrame,
    base: str,
    max_edits: int,
    max_expansions: int = MAX_EXPANSIONS,
) -> DataFrame:
    """The capped probe as a (term, df) DataFrame — ORDER BY/LIMIT compiles
    to TakeOrderedAndProject, so every partition ships at most
    ``max_expansions`` rows to the driver."""
    qlen = len(base)
    tlen = F.length(F.col("term"))
    return (
        term_stats.where(
            (tlen >= qlen - max_edits) & (tlen <= qlen + max_edits)
        )
        .withColumn(
            "_dist", F.levenshtein(F.col("term"), F.lit(base), max_edits)
        )
        .where(F.col("_dist") >= 0)
        .orderBy(F.col("_dist").asc(), F.col("df").desc(), F.col("term").asc())
        .limit(max_expansions)
        .select("term", "df")
    )


def fuzzy_candidates(
    term_stats: DataFrame,
    base: str,
    max_edits: int,
    max_expansions: int = MAX_EXPANSIONS,
) -> dict[str, int]:
    """Terms within ``max_edits`` of ``base``, best-first-capped.

    Returns {term: df}, at most ``max_expansions`` entries, chosen by
    (edit distance asc, df desc, term asc). The probe never scans the
    whole dictionary with a full DP: the length band rejects most rows
    with one integer comparison and the thresholded Levenshtein
    early-exits at ``max_edits``.
    """
    cand = fuzzy_candidates_df(term_stats, base, max_edits, max_expansions)
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
