"""edismax: phrase boosts, aliasing, multiplicative boost vs hand oracles.

Reference: search/ExtendedDismaxQParser.java:73,101-152 (pf/pf2/pf3 shingled
phrase boosts, Alias expansion, multiplicative boost)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.index.build import build_index
from solr_spark.query.dismax import dismax_search
from solr_spark.query.edismax import edismax_search, resolve_aliases


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def idx(docs):
    i = build_index(docs, id_col="doc_id", text_col="text", analyzer="simple",
                    stored_cols=("n_chars",))
    i.postings = i.postings.persist()
    i.doclens = i.doclens.persist()
    return i


def _rows(df):
    return [(int(r[0]), round(float(r[1]), 9)) for r in df.collect()]


def test_no_boosts_equals_dismax(idx):
    a = _rows(edismax_search({"text": idx}, "spark join", k=10))
    b = _rows(dismax_search({"text": idx}, "spark join", k=10))
    assert a == b


def test_pf_adds_phrase_score(idx):
    from solr_spark.query.phrase import phrase_score_df

    base = dict(_rows(edismax_search({"text": idx}, "spark join", k=100000)))
    boosted = dict(
        _rows(
            edismax_search(
                {"text": idx}, "spark join", pf={"text": 3.0}, k=100000
            )
        )
    )
    ph = {
        int(r.docid): round(float(r.score), 9)
        for r in phrase_score_df(
            idx, ["spark", "join"], boost=3.0, quantize_norms=False
        ).collect()
    }
    assert set(base) == set(boosted)  # pf never changes the match set
    assert ph  # phrase matches exist at this sf
    for d, s in boosted.items():
        want = base[d] + ph.get(d, 0.0)
        assert abs(s - want) < 1e-6, (d, s, want)


def test_pf2_bigrams(idx):
    # 3-term query: pf2 adds both bigram phrase scores.
    from solr_spark.query.phrase import phrase_score_df

    base = dict(_rows(edismax_search({"text": idx}, "part filter scan", k=100000)))
    boosted = dict(
        _rows(
            edismax_search(
                {"text": idx}, "part filter scan", pf2={"text": 2.0}, k=100000
            )
        )
    )
    b1 = {
        int(r.docid): float(r.score)
        for r in phrase_score_df(idx, ["part", "filter"], boost=2.0,
                                 quantize_norms=False).collect()
    }
    b2 = {
        int(r.docid): float(r.score)
        for r in phrase_score_df(idx, ["filter", "scan"], boost=2.0,
                                 quantize_norms=False).collect()
    }
    for d, s in boosted.items():
        want = base[d] + b1.get(d, 0.0) + b2.get(d, 0.0)
        assert abs(s - want) < 1e-6


def test_alias_expansion():
    out = resolve_aliases(
        {"content": 2.0, "text": 1.0},
        {"content": {"text": 1.5, "title": 0.5}},
    )
    assert out == {"text": 1.0 + 2.0 * 1.5, "title": 1.0}


def test_multiplicative_boost(idx):
    base = dict(_rows(edismax_search({"text": idx}, "spark join", k=100000)))
    boosted = dict(
        _rows(
            edismax_search(
                {"text": idx}, "spark join",
                boost_col=F.col("n_chars").cast("double") / 100.0, k=100000,
            )
        )
    )
    nchars = {
        int(r.docid): int(r.n_chars)
        for r in idx.docs.select("docid", "n_chars").collect()
    }
    for d, s in boosted.items():
        assert abs(s - base[d] * nchars[d] / 100.0) < 1e-6


def test_pf_preserves_stopword_gaps(spark):
    # text_en drops 'and' but keeps its position increment: "quick and
    # dirty" analyzes to quick@0 dirty@2. Lucene's edismax builds the pf
    # PhraseQuery from that gapped stream, so the boost fires for docs
    # containing the literal "quick and dirty" — and NOT for an adjacent
    # "quick dirty" (position gap mismatch), mirroring the parser's quoted
    # phrases.
    docs = spark.createDataFrame(
        [(0, "quick and dirty hack"), (1, "quick dirty hack"), (2, "dirty stuff")],
        ["doc_id", "text"],
    )
    idx = build_index(docs, id_col="doc_id", text_col="text", analyzer="text_en")
    q = "quick and dirty"
    base = dict(_rows(edismax_search({"text": idx}, q, k=10)))
    boosted = dict(
        _rows(edismax_search({"text": idx}, q, pf={"text": 5.0}, k=10))
    )
    assert boosted[0] > base[0] + 1e-9  # gapped phrase boost fires
    assert abs(boosted[1] - base[1]) < 1e-9  # adjacent bigram: no boost


def test_mm_repeated_term_gram_not_resurrected(spark):
    # A pf2 gram of a REPEATED term evidences only one distinct query term,
    # so it cannot satisfy mm=2 — the boosted doc must stay excluded.
    docs = spark.createDataFrame(
        [(0, "spark spark burns bright"), (1, "spark join runs")],
        ["doc_id", "text"],
    )
    idx = build_index(docs, id_col="doc_id", text_col="text", analyzer="simple")
    out = dict(
        _rows(
            edismax_search(
                {"text": idx}, "spark spark join", mm=2, pf2={"text": 2.0}, k=10
            )
        )
    )
    assert 1 in out
    assert 0 not in out  # matched only 'spark' (1 distinct term) despite bigram


def test_combined_boosts_equal_per_gram_sum(spark):
    # The single-scan combined phrase-boost path must produce exactly the
    # per-gram phrase_score_df sum it replaced.
    from solr_spark.query.edismax import _combined_phrase_boosts
    from solr_spark.query.phrase import phrase_score_df
    from solr_spark.query.bm25 import idf

    docs = spark.createDataFrame(
        [(0, "fast merge sort wins"), (1, "merge sort is fast"),
         (2, "fast sort"), (3, "merge fast merge sort")],
        ["doc_id", "text"],
    )
    idx = build_index(docs, id_col="doc_id", text_col="text",
                      analyzer="simple")
    n, _ = idx.corpus_stats()
    stats = {r["term"]: r["df"] for r in idx.term_stats().collect()}
    grams = [["fast", "merge"], ["merge", "sort"], ["fast", "merge", "sort"]]
    specs = [
        (g, list(range(len(g))), 2.0 * sum(idf(n, stats[t]) for t in g))
        for g in grams
    ]
    got = dict(_rows(_combined_phrase_boosts(idx, specs, k1=1.2, b=0.75)))
    want: dict = {}
    for g in grams:
        for d, s in _rows(
            phrase_score_df(idx, g, boost=2.0, quantize_norms=False)
        ):
            want[d] = want.get(d, 0.0) + s
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-8)
