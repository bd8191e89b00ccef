"""PhrasesIdentificationComponent — query collocation scoring.

Reference: handler/component/PhrasesIdentificationComponent.java:1000-1086.
Given a query string, every contiguous span (up to ``max_query_len``) is
scored for "is this span a real phrase in this corpus?" with the
reference's Bayesian model over indexed shingle statistics:

  for each largest indexed sub-phrase w (here: bigrams) of the span:
    P(w|phrase)      = ttf(w as adjacent bigram) / min(ttf of w's terms)
    P(w|not phrase)  = ttf(w) / max(ttf of w's terms)
    P(phrase)        = conj_count(span terms) / conj_count(w terms)
    score_w = P(w|phrase)·(P(phrase) − wrapper) − P(w|not phrase)·(1 − (P(phrase) − wrapper))
  field_score = Σ score_w · 1/(1 + max_query_len − max_indexed_len)
                         · conj_count(span) / max(conj counts of subs)

Scope: ``max_indexed_len = 2`` (bigram shingles). That makes the wrapper
term exactly 0 — a bigram has no INDEXED super-phrase — so the math above
is the reference's formula verbatim, not an approximation. (The shipping
configset's 3-shingle index adds wrapper statistics; extending means one
more shingle-stats table, same shapes.) Single-word spans score 0 when the
word is indexed, −1 when not (reference lines 960-975).

Shapes at scale: every statistic is an aggregate over term-pruned postings
scans — per-term ttf (broadcast-sized), per-bigram adjacent ttf (docid
join of two pruned scans, adjacency counted inside the packed position
arrays — no explode), and conjunction doc counts (semi-join chains).
Query-side span set is O(query length²) — driver-trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solr_spark.analysis.chain import analyze
from solr_spark.index.build import IndexTables


def _adjacent_tf(idx: IndexTables, t0: str, t1: str) -> DataFrame:
    """(docid, tf) of exact-adjacent ``t0 t1`` occurrences, counted inside
    the packed position arrays (same shape as the phrase query path)."""
    p0 = idx.postings.where(F.col("term") == t0).select(
        "docid", F.col("positions").alias("_p0")
    )
    p1 = idx.postings.where(F.col("term") == t1).select(
        "docid", F.col("positions").alias("_p1")
    )
    both = p0.join(p1, "docid")
    tf = F.size(
        F.filter(F.col("_p0"), lambda p: F.array_contains(F.col("_p1"), p + 1))
    )
    return both.select("docid", tf.alias("tf")).where(F.col("tf") > 0)


def phrases_identification(
    idx: IndexTables,
    query: str,
    analyzer: str = "simple",
    max_query_len: int = 3,
) -> DataFrame:
    """Score every contiguous span of ``query`` (lengths 1..max_query_len)
    as a candidate phrase. Returns (phrase, pos_start, pos_end, score) in
    score-descending order; scores <= 0 mean "not a phrase"."""
    spark = idx.postings.sparkSession
    toks = analyze(query, analyzer)
    if not toks:
        return spark.createDataFrame(
            [], "phrase string, pos_start int, pos_end int, score double"
        )

    terms = sorted(set(toks))
    stats = {
        r["term"]: (int(r["ttf"]), int(r["df"]))
        for r in idx.postings.where(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.sum("tf").alias("ttf"), F.count("*").alias("df"))
        .collect()
    }

    # conjunction doc counts for every distinct term-set we need
    def conj_count(ts: list[str]) -> int:
        uniq = sorted(set(ts))
        dfset = None
        for t in uniq:
            s = idx.postings.where(F.col("term") == t).select("docid")
            dfset = s if dfset is None else dfset.join(s, "docid", "left_semi")
        return dfset.count()

    # bigram adjacent ttfs
    bigrams = {
        (toks[i], toks[i + 1]) for i in range(len(toks) - 1)
        if all(t in stats for t in (toks[i], toks[i + 1]))
    }
    bigram_ttf = {
        bg: int(
            _adjacent_tf(idx, *bg).agg(F.coalesce(F.sum("tf"), F.lit(0))).first()[0]
        )
        for bg in bigrams
    }
    conj_cache: dict[tuple[str, ...], int] = {}

    def conj(ts: list[str]) -> int:
        key = tuple(sorted(set(ts)))
        if key not in conj_cache:
            conj_cache[key] = conj_count(list(key)) if all(
                t in stats for t in key
            ) else 0
        return conj_cache[key]

    max_indexed_len = 2
    rows = []
    for length in range(1, min(max_query_len, len(toks)) + 1):
        for start in range(0, len(toks) - length + 1):
            span = toks[start : start + length]
            phrase = " ".join(span)
            if any(t not in stats for t in span):
                rows.append((phrase, start, start + length, -1.0))
                continue
            if length == 1:
                rows.append((phrase, start, start + length, 0.0))
                continue
            span_conj = conj(span)
            if span_conj <= 0:
                rows.append((phrase, start, start + length, -1.0))
                continue
            field_score = 0.0
            max_sub_conj = span_conj
            viable = True
            for i in range(length - 1):
                bg = (span[i], span[i + 1])
                ttf_bi = bigram_ttf.get(bg, 0)
                w_conj = conj(list(bg))
                if w_conj <= 0:
                    viable = False
                    break
                max_sub_conj = max(max_sub_conj, w_conj)
                ttfs = [stats[bg[0]][0], stats[bg[1]][0]]
                wpp = ttf_bi / min(ttfs)
                wnp = ttf_bi / max(ttfs)
                phrase_prob = span_conj / w_conj
                # wrapper term = 0: no indexed super-phrase at max_indexed=2
                field_score += wpp * phrase_prob - wnp * (1.0 - phrase_prob)
            if not viable:
                rows.append((phrase, start, start + length, -1.0))
                continue
            field_score *= 1.0 / (1 + max_query_len - max_indexed_len)
            field_score *= span_conj / max_sub_conj
            rows.append((phrase, start, start + length, field_score))
    out = spark.createDataFrame(
        rows, "phrase string, pos_start int, pos_end int, score double"
    )
    return out.orderBy(F.col("score").desc(), F.col("pos_start").asc(),
                       F.col("pos_end").asc())
