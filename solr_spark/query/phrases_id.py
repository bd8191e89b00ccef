"""PhrasesIdentificationComponent — query collocation scoring.

Reference: handler/component/PhrasesIdentificationComponent.java:1000-1086.
Given a query string, every contiguous span (up to ``max_query_len``) is
scored for "is this span a real phrase in this corpus?" with the
reference's Bayesian model over indexed shingle statistics:

  for each largest indexed sub-phrase w of the span (contiguous subspans of
  length min(len, max_indexed_len) that occur ADJACENTLY somewhere):
    P(w|phrase)      = ttf(w as adjacent shingle) / min(ttf of w's terms)
    P(w|not phrase)  = ttf(w) / max(ttf of w's terms)
    P(phrase)        = conj_count(span terms) / conj_count(w terms)
    wrapper          = max over INDEXED query spans T ⊃ w with
                       len(T) <= max_indexed_len of df(T)/conj_count(T)
    score_w = P(w|phrase)·(P(phrase) − wrapper)
            − P(w|not phrase)·(1 − (P(phrase) − wrapper))
  field_score = Σ score_w · 1/(1 + max_query_len − max_indexed_len)
                          · conj_count(span)/max(conj counts of subs)

The wrapper term is the reference's bias correction: a sub-phrase always
co-occurs wherever its super-phrase does, so the super-phrase's own
phrase-probability is subtracted before crediting the sub
(PhrasesIdentificationComponent.java:1010-1014, 1035-1042). With the
shipped configset (shingles up to 3) ``max_indexed_len=3`` is full parity.
Single-word spans score 0 when indexed, −1 when not; a span whose terms
never all share a document scores −1 (lines 960-975).

Shapes at scale: every statistic is an aggregate over term-pruned postings
scans — per-term ttf (broadcast-sized), per-shingle adjacent ttf/df (docid
join of the pruned scans, adjacency counted inside the packed position
arrays — no explode), and conjunction doc counts (semi-join chains). The
query-side span set is O(query length²) — driver-trivial, like the term
stats lookups every query parser already does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solr_spark.analysis.chain import analyze
from solr_spark.index.build import IndexTables


def _adjacent_stats(idx: IndexTables, terms: tuple[str, ...]) -> tuple[int, int]:
    """(ttf, df) of exact-adjacent ``terms`` occurrences: total occurrence
    count and number of docs with at least one, counted inside the packed
    position arrays (same shape as the phrase query path)."""
    base = idx.postings.where(F.col("term") == terms[0]).select(
        "docid", F.col("positions").alias("_p0")
    )
    for i, t in enumerate(terms[1:], start=1):
        pi = idx.postings.where(F.col("term") == t).select(
            "docid", F.col("positions").alias(f"_p{i}")
        )
        base = base.join(pi, "docid")
    def _adj(i: int):
        # unary closure: a default-arg lambda would be seen as the
        # (element, index) binary form by F.filter's arity inspection
        return lambda p: F.array_contains(F.col(f"_p{i}"), p + i)

    occ = F.col("_p0")
    for i in range(1, len(terms)):
        occ = F.filter(occ, _adj(i))
    tf = F.size(occ)
    row = (
        base.select(tf.alias("tf"))
        .where(F.col("tf") > 0)
        .agg(F.coalesce(F.sum("tf"), F.lit(0)), F.count("*"))
        .first()
    )
    return int(row[0]), int(row[1])


def phrases_identification(
    idx: IndexTables,
    query: str,
    analyzer: str = "simple",
    max_query_len: int = 3,
    max_indexed_len: int = 3,
) -> DataFrame:
    """Score every contiguous span of ``query`` (lengths 1..max_query_len)
    as a candidate phrase. Returns (phrase, pos_start, pos_end, score) in
    score-descending order; scores <= 0 mean "not a phrase"."""
    # the effective indexed shingle depth can never exceed the query depth
    # (reference: maxIndexedPositionLength is read from the INDEX analyzer,
    # maxQueryPositionLength >= it by config validation)
    max_indexed_len = min(max_indexed_len, max_query_len)
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

    spans: list[tuple[int, int]] = [
        (s, s + ln)
        for ln in range(1, min(max_query_len, len(toks)) + 1)
        for s in range(0, len(toks) - ln + 1)
    ]

    conj_cache: dict[tuple[str, ...], int] = {}

    def conj(ts: tuple[str, ...]) -> int:
        key = tuple(sorted(set(ts)))
        if key not in conj_cache:
            if not all(t in stats for t in key):
                conj_cache[key] = 0
            else:
                dfset = None
                for t in key:
                    s = idx.postings.where(F.col("term") == t).select("docid")
                    dfset = s if dfset is None else dfset.join(
                        s, "docid", "left_semi"
                    )
                conj_cache[key] = dfset.count()
        return conj_cache[key]

    # adjacent (ttf, df) for every indexed-size subspan we will need
    shingle: dict[tuple[str, ...], tuple[int, int]] = {}
    for s, e in spans:
        if 1 < e - s <= max_indexed_len:
            key = tuple(toks[s:e])
            if key not in shingle and all(t in stats for t in key):
                shingle[key] = _adjacent_stats(idx, key)

    def wrapper_prob(ws: int, we: int) -> float:
        """max df(T)/conj(T) over indexed query spans T strictly containing
        [ws, we) with len(T) <= max_indexed_len."""
        best = 0.0
        for s, e in spans:
            if (s, e) == (ws, we) or s > ws or e < we:
                continue
            if e - s > max_indexed_len:
                continue
            key = tuple(toks[s:e])
            st = shingle.get(key)
            if not st or st[0] <= 0:
                continue  # not indexed as an adjacent shingle
            c = conj(key)
            if c > 0:
                best = max(best, st[1] / c)
        return best

    rows = []
    for s, e in spans:
        span = tuple(toks[s:e])
        phrase = " ".join(span)
        length = e - s
        if any(t not in stats for t in span):
            rows.append((phrase, s, e, -1.0))
            continue
        if length == 1:
            rows.append((phrase, s, e, 0.0))
            continue
        span_conj = conj(span)
        if span_conj <= 0:
            rows.append((phrase, s, e, -1.0))
            continue
        sub_len = min(length, max_indexed_len)
        field_score = 0.0
        max_sub_conj = span_conj
        for i in range(length - sub_len + 1):
            w = span[i : i + sub_len]
            st = shingle.get(w)
            if not st or st[0] <= 0:
                continue  # sub-phrase not indexed: contributes nothing
            ttf_w = st[0]
            w_conj = conj(w)
            if w_conj <= 0:
                continue
            max_sub_conj = max(max_sub_conj, w_conj)
            ttfs = [stats[t][0] for t in w]
            wpp = ttf_w / min(ttfs)
            wnp = ttf_w / max(ttfs)
            pp = span_conj / w_conj
            wrap = wrapper_prob(s + i, s + i + sub_len)
            field_score += wpp * (pp - wrap) - wnp * (1.0 - (pp - wrap))
        field_score *= 1.0 / (1 + max_query_len - max_indexed_len)
        field_score *= span_conj / max_sub_conj
        rows.append((phrase, s, e, field_score))
    out = spark.createDataFrame(
        rows, "phrase string, pos_start int, pos_end int, score double"
    )
    return out.orderBy(
        F.col("score").desc(), F.col("pos_start").asc(), F.col("pos_end").asc()
    )
