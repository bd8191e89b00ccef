"""DisMax / MLT / rerank / function-query semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.index.build import build_index
from solr_spark.query.bm25 import bm25_score_df
from solr_spark.query.dismax import build_multi_index, dismax_search
from solr_spark.query.mlt import interesting_terms, more_like_this
from solr_spark.query.rerank import boost_by, frange, rerank


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumnRenamed("doc_id", "docid")
    )


@pytest.fixture(scope="module")
def idx(docs):
    i = build_index(docs, text_col="text", analyzer="simple")
    i.postings = i.postings.persist()
    i.doclens = i.doclens.persist()
    return i


@pytest.fixture(scope="module")
def multi(docs):
    m = build_multi_index(docs, {"text": "text", "source": "source"},
                          analyzer="simple")
    for ix in m.values():
        ix.postings = ix.postings.persist()
        ix.doclens = ix.doclens.persist()
    return m


def test_dismax_single_field_reduces_to_bm25(multi, idx):
    """With one field and tie=0, DisMax == plain BM25 on that field."""
    got = dismax_search({"text": multi["text"]}, "spark join", k=10)
    want = (
        bm25_score_df(idx, ["join", "spark"], quantize_norms=False)
        .orderBy(F.col("score").desc(), F.col("docid").asc()).limit(10)
    )
    a = [(r.docid, round(r.score, 9)) for r in got.collect()]
    b = [(r.docid, round(r.score, 9)) for r in want.collect()]
    assert a == b


def test_dismax_field_match_found(multi):
    """A term that only matches the source field still scores."""
    rows = dismax_search(multi, "src3", qf={"text": 1.0, "source": 1.0},
                         k=5).collect()
    assert rows and all(r.score > 0 for r in rows)


def test_dismax_mm(multi):
    both = dismax_search(multi, "spark join", mm=2, k=1000).count()
    any_ = dismax_search(multi, "spark join", mm=1, k=1000).count()
    assert 0 < both < any_


def test_mlt_excludes_source_and_ranks(idx):
    terms = interesting_terms(idx, 0, max_terms=10, min_tf=1, min_df=2,
                              max_df_pct=1.0)
    assert terms and all(w > 0 for _, w in terms)
    rows = more_like_this(idx, 0, k=10, min_tf=1, min_df=2,
                          max_df_pct=1.0).collect()
    assert rows
    assert all(r.docid != 0 for r in rows)
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rerank_window_semantics(idx, docs):
    main = bm25_score_df(idx, ["data"], quantize_norms=False)
    rr = docs.select("docid", (F.col("n_chars") / 100.0).alias("score"))
    out = rerank(main, rr, rerank_docs=20, rerank_weight=1.0, k=5).collect()
    assert len(out) == 5
    # Every returned doc must come from the top-20 main window.
    window = {
        r.docid
        for r in main.orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(20).collect()
    }
    assert all(r.docid in window for r in out)


def test_frange_and_boost(idx, docs):
    main = bm25_score_df(idx, ["data"], quantize_norms=False)
    lo, hi = 0.05, 2.0
    kept = frange(main, F.col("score"), lo, hi)
    assert kept.where((F.col("score") < lo) | (F.col("score") > hi)).count() == 0
    boosted = boost_by(kept, docs.select("docid", "n_chars"),
                       F.log(F.col("n_chars")))
    assert boosted.count() == kept.count()


def test_wordbreak_split_and_combine(idx):
    from solr_spark.query.spellcheck import wordbreak_combine, wordbreak_split

    rows = wordbreak_split(idx, "sparkjoin", count=5).collect()
    assert [(r.left, r.right) for r in rows] == [("spark", "join")]
    dfs = {r["term"]: r["df"] for r in idx.term_stats().where(
        F.col("term").isin(["spark", "join"])).collect()}
    assert rows[0].df_left == dfs["spark"] and rows[0].df_right == dfs["join"]
    # combine: 'spa' + 'rk' not both terms, but 'sp'+'ark' -> no; use a real
    # dictionary word split across two inputs:
    comb = wordbreak_combine(idx, ["spa", "rk", "join"], count=5).collect()
    assert [(r.left, r.right, r.combined) for r in comb] == [("spa", "rk", "spark")]


def test_highlight_fragments_scoring(spark):
    from solr_spark.query.highlight import highlight_fragments

    pad = "x " * 45  # ~90 chars: pushes later content into a new fragment
    rows = [(0, "spark join here. " + pad + " only spark there"),
            (1, pad + " nothing relevant")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = highlight_fragments(df, "text", ["spark", "join"], frag_size=40,
                              max_fragments=2).collect()
    by_id = {r.doc_id: r for r in out}
    meta0 = by_id[0]._frag_meta
    assert meta0[0].idx == 0 and meta0[0].n_terms == 2  # both terms up front
    assert len(meta0) == 2 and meta0[1].n_terms == 1  # the lone 'spark' frag
    assert "<em>spark</em>" in by_id[0].snippets[0]
    assert by_id[1]._frag_meta == []  # no matching fragment


def test_highlight_preserves_case_and_tags_best(spark):
    # Tags wrap the ORIGINAL casing (the reference highlighter returns the
    # stored text verbatim), and scoring uses the same \b word-boundary rule
    # as tagging — so a selected fragment always contains >= 1 tag.
    from solr_spark.query.highlight import highlight, highlight_fragments

    rows = [(0, "Spark is fast. SPARKY is not a term hit."),
            (1, "sparkplug only")]  # substring but not a word match
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           highlight(df, "text", ["spark"], frag_size=40).collect()}
    assert "<em>Spark</em>" in out[0].snippet  # original case kept
    assert "SPARKY" in out[0].snippet and "<em>SPARKY" not in out[0].snippet

    fr = {r.doc_id: r for r in
          highlight_fragments(df, "text", ["spark"], frag_size=40,
                              max_fragments=2).collect()}
    assert fr[0].snippets and all("<em>" in s for s in fr[0].snippets)
    # 'sparkplug' is a substring, not a \b word: no fragment selected
    assert fr[1]._frag_meta == [] and fr[1].snippets == []


def test_synonym_rules_parse_and_spans():
    from solr_spark.analysis.synonyms import expand_spans, parse_rules

    rules = parse_rules(
        ["sort, order  # comment", "", "hashjoin => hash join",
         "big data, bigdata"],
        analyzer="simple",
    )
    # equivalence: every member maps to the full class, itself included
    assert rules[("sort",)] == [["sort"], ["order"]]
    assert rules[("order",)] == [["sort"], ["order"]]
    # => replaces: no identity path
    assert rules[("hashjoin",)] == [["hash", "join"]]
    # multi-word LHS analyzed into a token tuple
    assert rules[("big", "data")] == [["big", "data"], ["bigdata"]]

    spans = expand_spans(["big", "data", "hashjoin", "scan"], rules)
    # longest match wins: "big data" consumed as one span
    assert spans[0] == (0, 2, [["big", "data"], ["bigdata"]])
    assert spans[1] == (2, 1, [["hash", "join"]])
    assert spans[2] == (3, 1, [["scan"]])  # identity for unmatched tokens


def test_synonym_search_blended_and_phrase(spark):
    import math

    from solr_spark.analysis.synonyms import parse_rules
    from solr_spark.index.build import build_index
    from solr_spark.query.synonym import synonym_search

    rows = [
        (0, "sort the rows"),          # matches via 'sort'
        (1, "order the rows"),         # matches via synonym 'order'
        (2, "sort order madness"),     # tf blends: 1 + 1
        (3, "hash join plan"),         # phrase path target
        (4, "join hash reversed"),     # NOT a "hash join" phrase
    ]
    idx = build_index(
        spark.createDataFrame(rows, "docid long, text string"),
        analyzer="simple", text_col="text",
    )
    rules = parse_rules(["sort, order"], analyzer="simple")
    got = {r.docid: r.score
           for r in synonym_search(idx, "sort", rules, k=10).collect()}
    # SynonymQuery: df = max(df_sort, df_order) = 2, N = 5
    n, avgdl = idx.corpus_stats()
    w = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))
    assert set(got) == {0, 1, 2}

    def sat(tf, dl):
        return tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    assert got[0] == pytest.approx(w * sat(1, 3))
    assert got[1] == pytest.approx(w * sat(1, 3))
    assert got[2] == pytest.approx(w * sat(2, 3))  # blended tf = 2

    # multi-word replacement: only the true adjacent bigram matches
    prules = parse_rules(["hashjoin => hash join"], analyzer="simple")
    ph = {r.docid for r in
          synonym_search(idx, "hashjoin", prules, k=10).collect()}
    assert ph == {3}


def test_query_elevation_pin_exclude(spark):
    from solr_spark.query.elevation import elevate

    scored = spark.createDataFrame(
        [(10, 5.0), (11, 4.0), (12, 3.0), (13, 2.0)], "docid long, score double"
    )
    docs = spark.createDataFrame([(i,) for i in range(10, 20)], "docid long")
    out = elevate(scored, docs, pinned=[13, 15], excluded=[11], k=10).collect()
    assert [r.docid for r in out] == [13, 15, 10, 12]
    # pinned-first in editorial order; 15 force-elevated with score 0
    assert [r.elevated for r in out] == [True, True, False, False]
    assert out[1].score == 0.0
    # excluded id is gone even though it scored second
    assert all(r.docid != 11 for r in out)


def test_delimited_payloads_and_score(spark):
    from solr_spark.query.payload import delimited_payload_postings, payload_score

    rows = [
        (0, "spark|2.5 join|1 spark|0.5"),
        (1, "spark nopayload|x join|3"),   # bad/absent payloads -> default 1.0
        (2, "other|9"),
    ]
    df = spark.createDataFrame(rows, "docid long, text string")
    pp = delimited_payload_postings(df, text_col="text")
    by = {(r.term, r.docid): r for r in pp.collect()}
    # payloads stay aligned with sorted positions
    assert by[("spark", 0)].positions == [0, 2]
    assert by[("spark", 0)].payloads == [2.5, 0.5]
    assert by[("spark", 1)].payloads == [1.0]      # no delimiter -> default
    assert by[("nopayload", 1)].payloads == [1.0]  # unparseable -> default

    got = {r.docid: r for r in payload_score(
        pp, "spark", "max",
        extra_funcs={"s": "sum", "a": "average", "f": "first", "m": "min"},
    ).collect()}
    assert got[0].score == 2.5 and got[0].s == 3.0
    assert got[0].a == pytest.approx(1.5)
    assert got[0].f == 2.5 and got[0].m == 0.5
    assert got[1].score == 1.0
    assert 2 not in got


def test_scale_func_bounds_and_constant_guard(spark):
    from solr_spark.query.rerank import scale_func

    df = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 15.0)], "docid long, v double")
    out = {r.docid: r.scaled
           for r in scale_func(df, F.col("v"), 0.0, 2.0).collect()}
    assert out == {1: 0.0, 2: 2.0, 3: 1.0}
    const = spark.createDataFrame([(1, 5.0), (2, 5.0)], "docid long, v double")
    got = {r.scaled for r in scale_func(const, F.col("v"), 3.0, 9.0).collect()}
    assert got == {3.0}


def test_map_func_inside_outside_default(spark):
    from solr_spark.query.rerank import map_func

    df = spark.createDataFrame([(50,), (150,), (250,)], "v int")
    got = [r.m for r in df.select(
        map_func(F.col("v"), 100, 200, 0.1).alias("m")).collect()]
    assert got == [50.0, 0.1, 250.0]
    got2 = [r.m for r in df.select(
        map_func(F.col("v"), 100, 200, 0.1, default=1.0).alias("m")).collect()]
    assert got2 == [1.0, 0.1, 1.0]


def test_collapse_null_policies(spark):
    from solr_spark.operators.collapse import collapse

    df = spark.createDataFrame(
        [(1, "a", 9.0), (2, "a", 5.0), (3, None, 7.0), (4, None, 6.0),
         (5, "b", 1.0)],
        "docid long, grp string, score double",
    )
    order = [F.col("score").desc(), F.col("docid").asc()]
    ign = {r.docid for r in collapse(df, "grp", order).collect()}
    assert ign == {1, 5}                    # nulls dropped (reference default)
    exp = {r.docid for r in collapse(df, "grp", order, null_policy="expand").collect()}
    assert exp == {1, 5, 3, 4}              # each null its own group
    col = {r.docid for r in collapse(df, "grp", order, null_policy="collapse").collect()}
    assert col == {1, 5, 3}                 # nulls one group, head kept
    import pytest as _pt
    with _pt.raises(ValueError):
        collapse(df, "grp", order, null_policy="bogus")


def test_salted_collapse_parity(spark):
    """Salted two-phase collapse/group/expand == the unsalted window, row
    for row, on skewed data (one group value covers ~half the rows)."""
    from solr_spark.operators.collapse import collapse, expand, group_top_n

    rows = [(i, "hot" if i % 2 == 0 else f"g{i % 7}", float(i % 13))
            for i in range(200)]
    df = spark.createDataFrame(rows, "docid long, grp string, score double")
    order = [F.col("score").desc(), F.col("docid").asc()]

    def key(frame):
        return sorted((r.grp, r.docid) for r in frame.collect())

    for s in (2, 8):
        assert key(collapse(df, "grp", order, salt=s)) == key(
            collapse(df, "grp", order))
        assert key(group_top_n(df, "grp", order, n=3, salt=s)) == key(
            group_top_n(df, "grp", order, n=3))
        assert key(expand(df, "grp", order, rows=2, salt=s)) == key(
            expand(df, "grp", order, rows=2))
    # nullPolicy=collapse + salt: the all-null group is split too
    dfn = df.withColumn(
        "grp", F.when(F.col("docid") % 3 == 0, None).otherwise(F.col("grp"))
    )
    assert key(
        collapse(dfn, "grp", order, null_policy="collapse", salt=4)
        .fillna({"grp": "∅"})
    ) == key(
        collapse(dfn, "grp", order, null_policy="collapse")
        .fillna({"grp": "∅"})
    )


def test_gather_nodes_traversal_filter_and_maxdf(spark):
    import math

    from solr_spark.operators.graph import gather_nodes, score_nodes

    # a -> {b, c, hub}; hub -> {d, e, f}; b -> {d}; edge a->c is "light"
    edges = spark.createDataFrame(
        [("a", "b", 10), ("a", "c", 1), ("a", "hub", 10),
         ("hub", "d", 10), ("hub", "e", 10), ("hub", "f", 10),
         ("b", "d", 10)],
        "src string, dst string, w int",
    )
    seeds = spark.createDataFrame([("a",)], ["node"])

    plain = {(r.node, r.hop) for r in gather_nodes(edges, seeds, hops=2).collect()}
    assert plain == {("b", 1), ("c", 1), ("hub", 1),
                     ("d", 2), ("e", 2), ("f", 2)}

    # traversal filter drops the light a->c edge at every hop
    filt = {(r.node, r.hop) for r in gather_nodes(
        edges, seeds, hops=2, traversal_filter=F.col("w") >= 5).collect()}
    assert ("c", 1) not in filt and ("b", 1) in filt

    # maxDocFreq applies to EVERY frontier (seeds included — the reference
    # wraps each hop's join in {!graphTerms maxDocFreq=N}): seed a has df 3,
    # so with cap 2 nothing expands at all
    assert gather_nodes(edges, seeds, hops=2, max_doc_freq=2).count() == 0

    # with a 2-edge seed: hub (3 outgoing edges) is gathered but NOT expanded
    edges2 = spark.createDataFrame(
        [("a", "b", 10), ("a", "hub", 10),
         ("hub", "d", 10), ("hub", "e", 10), ("hub", "f", 10),
         ("b", "d", 10)],
        "src string, dst string, w int",
    )
    capped = {(r.node, r.hop) for r in gather_nodes(
        edges2, seeds, hops=2, max_doc_freq=2).collect()}
    assert ("hub", 1) in capped
    assert capped == {("b", 1), ("hub", 1), ("d", 2)}

    # scoreNodes: (ln(tf)+1) * (ln((N+1)/(df+1))+1), ScoreNodesStream.java:241
    nodes = spark.createDataFrame([("x", 4), ("y", 1)], ["node", "count"])
    stats = spark.createDataFrame([("x", 9)], ["node", "docFreq"])
    got = {r.node: r.nodeScore for r in score_nodes(nodes, stats, 99).collect()}
    assert abs(got["x"] - (math.log(4) + 1) * (math.log(100 / 10) + 1)) < 1e-9
    # absent from stats -> docFreq 0
    assert abs(got["y"] - (math.log(1) + 1) * (math.log(100 / 1) + 1)) < 1e-9


def test_dismax_boost_with_duplicate_docids_sums(multi, spark):
    """A boost stream carrying several rows per docid must SUM into the
    match (Lucene SHOULD siblings), not fan out the joined row."""
    base = dismax_search({"text": multi["text"]}, "spark join", k=10)
    b = [(r.docid, 1.5) for r in base.collect()[:2]]
    dup_boost = spark.createDataFrame(b + b, ["docid", "score"])  # 2x each
    out = dismax_search({"text": multi["text"]}, "spark join", k=10,
                        boosts=[dup_boost]).toPandas()
    assert out["docid"].is_unique
    got = dict(zip(out["docid"], out["score"]))
    want = {r.docid: r.score for r in base.collect()}
    for d, _ in b:
        assert abs(got[d] - (want[d] + 3.0)) < 1e-9  # 1.5 summed twice


def test_payload_check_phrase_ops(spark):
    """SpanPayloadCheckQuery: adjacency + per-position payload predicate."""
    import pytest as _pt

    from solr_spark.query.payload import delimited_payload_postings, payload_check

    rows = [
        (1, "alpha|3 beta|4 gamma|1"),     # alpha beta adjacent, pays 3,4
        (2, "alpha|1 beta|4"),             # pay0=1 fails gte 2
        (3, "alpha|3 zzz|9 beta|4"),       # not adjacent
        (4, "alpha|5 beta|1 alpha|3 beta|3"),  # occ1: beta 1 fails; occ2 ok
    ]
    df = spark.createDataFrame(rows, ["doc_id", "ptext"])
    pp = delimited_payload_postings(df, id_col="doc_id", text_col="ptext")

    out = payload_check(pp, ["alpha", "beta"], [2.0, 2.0], op="gte").toPandas()
    got = dict(zip(out["docid"], out["matches"]))
    assert got == {1: 1, 4: 1}

    eq = payload_check(pp, ["alpha", "beta"], [3.0, 4.0], op="eq").toPandas()
    assert dict(zip(eq["docid"], eq["matches"])) == {1: 1}

    lt = payload_check(pp, ["alpha"], [4.0], op="lt").toPandas()
    # single term: count of alpha occurrences with payload < 4
    assert dict(zip(lt["docid"], lt["matches"])) == {1: 1, 2: 1, 3: 1, 4: 1}

    with _pt.raises(ValueError):
        payload_check(pp, ["a", "b"], [1.0], op="eq")
    with _pt.raises(ValueError):
        payload_check(pp, ["a"], [1.0], op="between")


def test_json_request_api_lowering(spark):
    """JSON Request API == the string front-end, row for row; unsupported
    nodes fail loudly rather than silently changing semantics."""
    import pytest as _pt

    from solr_spark.index.build import build_index
    from solr_spark.query.boolq import bool_query
    from solr_spark.query.jsonq import _lower_leaf, json_query_search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = build_index(
        docs.withColumn("docid", F.col("doc_id")), id_col="docid",
        text_col="text", analyzer="simple", positions=False,
    )
    req = {
        "query": {"bool": {"must": ["data"],
                           "should": [{"lucene": {"query": "spark"}}],
                           "must_not": ["merge"]}},
        "filter": ["lang:en"],
        "limit": 10,
    }
    got = [(r.docid, round(r.score, 9))
           for r in json_query_search(idx, req).collect()]
    want = [(r.docid, round(r.score, 9)) for r in bool_query(
        idx, must=["data"], should=["spark"], must_not=["merge"],
        filter=["lang:en"], k=10).collect()]
    assert got == want and got
    # bare-string query == single-must bool
    got2 = {r.docid for r in json_query_search(
        idx, {"query": "data", "limit": 5}).collect()}
    want2 = {r.docid for r in bool_query(idx, must=["data"], k=5).collect()}
    assert got2 == want2

    assert _lower_leaf({"field": {"f": "lang", "query": "en"}}, "text") == 'lang:"en"'
    assert _lower_leaf({"prefix": {"f": "text", "query": "spar"}}, "text") == "text:spar*"
    with _pt.raises(NotImplementedError):
        _lower_leaf({"bool": {"must": ["x"]}}, "text")
    with _pt.raises(ValueError):
        _lower_leaf({"frange": {}, "extra": {}}, "text")
    with _pt.raises(ValueError):
        json_query_search(idx, {"query": {"bool": {"mustnt": ["x"]}}})


def test_json_single_string_filter_and_literal_guard(spark):
    """A top-level single-string filter is ONE filter node (RequestUtil
    flattens bare node / list alike) — not iterated character-by-character;
    field/prefix literal values reject grammar metacharacters loudly."""
    import pytest as _pt

    from solr_spark.index.build import build_index
    from solr_spark.query.jsonq import _lower_leaf, json_query_search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = build_index(
        docs.withColumn("docid", F.col("doc_id")), id_col="docid",
        text_col="text", analyzer="simple", positions=False,
    )
    as_str = [(r.docid, round(r.score, 9)) for r in json_query_search(
        idx, {"query": "data", "filter": "lang:en", "limit": 10}).collect()]
    as_list = [(r.docid, round(r.score, 9)) for r in json_query_search(
        idx, {"query": "data", "filter": ["lang:en"], "limit": 10}).collect()]
    assert as_str == as_list and as_str

    with _pt.raises(ValueError):
        _lower_leaf({"field": {"f": "lang", "query": 'e"n'}}, "text")
    with _pt.raises(ValueError):
        _lower_leaf({"prefix": {"f": "text", "query": "spa:r"}}, "text")
    with _pt.raises(ValueError):
        _lower_leaf({"prefix": {"f": "text", "query": "spa*"}}, "text")


def test_json_dismax_edismax_nodes(spark):
    """JSON dismax/edismax query nodes == the dedicated engines
    (JsonQueryConverter routes any registered parser), including the
    "field^boost" qf string form and fq filter restriction."""
    from solr_spark.index.build import build_index
    from solr_spark.query.dismax import build_multi_index, dismax_search
    from solr_spark.query.edismax import edismax_search
    from solr_spark.query.jsonq import json_query_search
    from solr_spark.query.parser import search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = docs.withColumn("docid", F.col("doc_id"))
    idx = build_index(
        d, id_col="docid", text_col="text", analyzer="simple", positions=True,
    )
    idxs = build_multi_index(d, {"text": "text", "source": "source"},
                             analyzer="simple")

    got = [(r.docid, round(r.score, 9)) for r in json_query_search(
        idx,
        {"query": {"dismax": {"query": "spark src3",
                              "qf": "text source^2.0", "tie": 0.3}},
         "filter": "lang:en", "limit": 10},
        indexes=idxs,
    ).collect()]
    fset = search(idx, "lang:en", _scores_only=True).select("docid")
    want = [(r.docid, round(r.score, 9)) for r in dismax_search(
        idxs, "spark src3", qf={"text": 1.0, "source": 2.0}, tie=0.3,
        k=10, filter_sets=[fset]).collect()]
    assert got == want and got

    got_e = [(r.docid, round(r.score, 9)) for r in json_query_search(
        idx,
        {"query": {"edismax": {"query": "part filter scan", "qf": "text",
                               "pf": "text^2.0", "pf2": "text^1.5"}},
         "limit": 10},
    ).collect()]
    want_e = [(r.docid, round(r.score, 9)) for r in edismax_search(
        {"text": idx}, "part filter scan", qf={"text": 1.0},
        pf={"text": 2.0}, pf2={"text": 1.5}, k=10).collect()]
    assert got_e == want_e and got_e


def test_distribution_negative_k_guard(spark):
    """pmf/cdf evaluators return 0 for k < 0 — the otherwise-branch folds
    sequence(1, k), which is DESCENDING through i=0 for negative k
    (division by zero / garbage)."""
    from solr_spark.functions.mathstream import (
        binom_cdf_col,
        binom_pmf_col,
        poisson_cdf_col,
        poisson_pmf_col,
    )

    df = spark.createDataFrame([(-3,), (-1,), (0,), (2,)], ["k"])
    out = df.select(
        "k",
        poisson_pmf_col(F.col("k"), 2.0).alias("pp"),
        poisson_cdf_col(F.col("k"), 2.0).alias("pc"),
        binom_pmf_col(F.col("k"), 10, 0.3).alias("bp"),
        binom_cdf_col(F.col("k"), 10, 0.3).alias("bc"),
    ).orderBy("k").collect()
    for r in out:
        if r.k < 0:
            assert r.pp == 0.0 and r.pc == 0.0 and r.bp == 0.0 and r.bc == 0.0
        else:
            assert r.pp > 0 and r.pc > 0 and r.bp > 0 and r.bc > 0
    import math
    r2 = out[-1]
    assert abs(r2.pp - math.exp(-2.0) * 2.0 ** 2 / 2) < 1e-12
    assert abs(r2.bp - 45 * 0.3 ** 2 * 0.7 ** 8) < 1e-12
