"""Lucene-grammar parser: parse shapes + execution semantics vs set oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.index.build import build_index
from solr_spark.query.bm25 import bm25_score_df
from solr_spark.query.parser import parse_query, search


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def idx(docs):
    i = build_index(docs, id_col="doc_id", text_col="text", analyzer="simple",
                    stored_cols=("lang", "source", "n_chars"))
    i.postings = i.postings.persist()
    i.doclens = i.doclens.persist()
    return i


@pytest.fixture(scope="module")
def term_docs(idx):
    def _get(term):
        return {
            r.docid
            for r in idx.postings.where(F.col("term") == term)
            .select("docid").collect()
        }

    return _get


def test_parse_shapes():
    p = parse_query('spark +join -table lang:en n_chars:[100 TO 300] "fast scan" spar*^2')
    kinds = [(c.kind, c.occur) for c in p.clauses]
    assert kinds == [
        ("term", "should"), ("term", "must"), ("term", "must_not"),
        ("filter_eq", "should"), ("filter_range", "should"),
        ("phrase", "should"), ("prefix", "should"),
    ]
    assert p.clauses[-1].boost == 2.0
    assert p.clauses[4].lo == "100" and p.clauses[4].hi == "300"


def test_or_equals_bm25(idx):
    a = [(r.docid, round(r.score, 9)) for r in search(idx, "spark join data", k=10).collect()]
    b = [
        (r.docid, round(r.score, 9))
        for r in bm25_score_df(idx, ["spark", "join", "data"], quantize_norms=False)
        .orderBy(F.col("score").desc(), F.col("docid").asc()).limit(10).collect()
    ]
    assert a == b


def test_and_semantics(idx, term_docs):
    got = {r.docid for r in search(idx, "spark AND join", k=1000).collect()}
    assert got == term_docs("spark") & term_docs("join")


def test_not_semantics(idx, term_docs):
    got = {r.docid for r in search(idx, "spark -join", k=1000).collect()}
    assert got == term_docs("spark") - term_docs("join")


def test_phrase_true_adjacency(idx, term_docs):
    # True PhraseQuery: a quoted clause matches only docs where the terms
    # are ADJACENT — a strict subset of the conjunction, verified against a
    # positions-join oracle built from the raw postings.
    got = {r.docid for r in search(idx, '"spark join"', k=100000).collect()}
    conj = term_docs("spark") & term_docs("join")
    pos = {
        (r.docid, r.term): list(r.positions)
        for r in idx.postings.where(F.col("term").isin(["spark", "join"]))
        .collect()
    }
    want = {
        d for d in conj
        if any(q + 1 in pos[(d, "join")] for q in pos[(d, "spark")])
    }
    assert got == want and got < conj


def test_phrase_slop_window(idx, term_docs):
    # slop widens the match set monotonically, between adjacency and the
    # full conjunction.
    adj = {r.docid for r in search(idx, '"spark join"', k=100000).collect()}
    s2 = {r.docid for r in search(idx, '"spark join"~2', k=100000).collect()}
    conj = term_docs("spark") & term_docs("join")
    assert adj <= s2 <= conj


def test_phrase_fallback_without_positions(docs, term_docs):
    # positions=False index: quoted clause degrades to a conjunction.
    i = build_index(docs, id_col="doc_id", text_col="text",
                    analyzer="simple", positions=False)
    got = {r.docid for r in search(i, '"spark join"', k=100000).collect()}
    assert got == term_docs("spark") & term_docs("join")


def test_must_not_phrase(idx):
    base = {r.docid for r in search(idx, "data", k=100000).collect()}
    adj = {r.docid for r in search(idx, '"spark join"', k=100000).collect()}
    got = {
        r.docid
        for r in search(idx, 'data -"spark join"', k=100000).collect()
    }
    assert got == base - adj


def test_filters(idx, docs, term_docs):
    rows = search(idx, "spark lang:en n_chars:[100 TO 300]", k=1000).collect()
    meta = {r["doc_id"]: (r["lang"], r["n_chars"]) for r in docs.collect()}
    assert rows
    for r in rows:
        assert r.docid in term_docs("spark")
        assert meta[r.docid][0] == "en"
        assert 100 <= meta[r.docid][1] <= 300


def test_pure_filter_query(idx, docs):
    got = {r.docid for r in search(idx, "lang:zh", k=1000).collect()}
    want = {r["doc_id"] for r in docs.where(F.col("lang") == "zh").collect()}
    assert got == want


def test_prefix_constant_score(idx):
    rows = search(idx, "quer*", k=5).collect()
    assert rows and all(r.score == 1.0 for r in rows)


def test_boost_reweights(idx, term_docs):
    # With a huge boost on a term, its docs must dominate the top-k.
    rows = search(idx, "spark^100 join", k=5).collect()
    assert all(r.docid in term_docs("spark") for r in rows)


def test_fuzzy_expansion(idx, term_docs):
    p = parse_query("tabel~1")
    assert p.clauses[0].kind == "fuzzy"
    assert p.clauses[0].lo == "1"
    # plain Levenshtein: the 'le'<->'el' transposition costs 2 edits
    # (Lucene's FuzzyQuery defaults to Damerau — transpositions=1 — a
    # documented divergence; see parser.py).
    got = {r.docid for r in search(idx, "tabel~2", k=1000).collect()}
    assert term_docs("table") <= got
    # default maxEdits is 2
    assert parse_query("tabel~").clauses[0].lo == "2"


def test_absent_must_term_empty(idx):
    assert search(idx, "+zzznotaterm spark", k=10).count() == 0
    assert search(idx, "", k=10).count() == 0


def test_must_prefix_enforced(idx, term_docs):
    # A required prefix restricts results to docs matching an expansion.
    prefix_docs = {
        r.docid
        for r in idx.postings.where(F.col("term").startswith("tabl"))
        .select("docid").collect()
    }
    got = {r.docid for r in search(idx, "+tabl* spark", k=10000).collect()}
    assert got and got <= prefix_docs
    # A required prefix with ZERO dictionary expansions -> empty result.
    assert search(idx, "+zzznotaprefix* spark", k=10).count() == 0


def test_must_not_prefix_excludes(idx):
    prefix_docs = {
        r.docid
        for r in idx.postings.where(F.col("term").startswith("tabl"))
        .select("docid").collect()
    }
    got = {r.docid for r in search(idx, "spark -tabl*", k=10000).collect()}
    assert got and not (got & prefix_docs)


def test_fuzzy_multidigit_clamped():
    # term~10 parses as fuzzy with maxEdits clamped to Lucene's max of 2,
    # not as the literal term 'term~10'.
    p = parse_query("spark~10")
    assert p.clauses[0].kind == "fuzzy" and p.clauses[0].lo == "2"


def test_grouped_should(idx, term_docs):
    # "(spark join) (table scan)" == flat "spark join table scan" scores
    a = {(r.docid, round(r.score, 9))
         for r in search(idx, "(spark join) (table scan)", k=100000).collect()}
    b = {(r.docid, round(r.score, 9))
         for r in search(idx, "spark join table scan", k=100000).collect()}
    assert a == b


def test_must_group_restricts(idx, term_docs):
    got = {r.docid for r in search(idx, "+(spark join) data", k=100000).collect()}
    assert got and got <= (term_docs("spark") | term_docs("join"))
    # every returned doc matches the must group (spark OR join)
    base = {r.docid for r in search(idx, "spark join data", k=100000).collect()}
    assert got == {d for d in base if d in (term_docs("spark") | term_docs("join"))}


def test_must_not_group_excludes(idx, term_docs):
    got = {r.docid for r in search(idx, "data -(spark join)", k=100000).collect()}
    assert got == term_docs("data") - term_docs("spark") - term_docs("join")


def test_group_boost_scales(idx):
    plain = {r.docid: r.score for r in search(idx, "(spark)", k=100000).collect()}
    boosted = {r.docid: r.score
               for r in search(idx, "(spark)^3", k=100000).collect()}
    assert boosted and all(abs(boosted[d] - 3 * s) < 1e-9 for d, s in plain.items())


def test_nested_groups(idx, term_docs):
    got = {r.docid
           for r in search(idx, "+((spark) (join)) -table", k=100000).collect()}
    assert got == (term_docs("spark") | term_docs("join")) - term_docs("table")


def test_group_with_filters_and_and(idx, docs, term_docs):
    got = {r.docid
           for r in search(idx, "(spark join) AND (table)", k=100000).collect()}
    assert got == (term_docs("spark") | term_docs("join")) & term_docs("table")


def test_flat_must_enforced_against_groups(idx, term_docs):
    # '+spark (table)': the required flat clause must constrain group-only
    # docs too (Lucene BooleanQuery semantics).
    got = {r.docid for r in search(idx, "+spark (table)", k=100000).collect()}
    assert got and got <= term_docs("spark")


def test_split_top_level_quote_blind():
    from solr_spark.query.parser import _split_top_level

    # parens inside a quoted phrase are NOT group delimiters
    flat, groups = _split_top_level('"foo (bar" baz')
    assert groups == [] and flat.strip() == '"foo (bar" baz'
    # unbalanced '(' keeps the full tail as the group body
    flat, groups = _split_top_level("a (b c")
    assert flat.strip() == "a" and groups == [("should", 1.0, "b c")]


def test_and_promotes_flat_neighbor_of_group(idx, term_docs):
    # 'a AND (b)' ≡ '+a +(b)': docs matching only b must NOT be returned
    # (Lucene requires BOTH sides of an AND).
    got = {r.docid for r in search(idx, "spark AND (join)", k=100000).collect()}
    assert got == term_docs("spark") & term_docs("join")
    # '(b) AND a' — same, AND after the group.
    got2 = {r.docid for r in search(idx, "(join) AND spark", k=100000).collect()}
    assert got2 == got


def test_and_between_groups_still_promotes_both(idx, term_docs):
    got = {r.docid for r in search(idx, "(spark) AND (join)", k=100000).collect()}
    assert got == term_docs("spark") & term_docs("join")


def test_and_promotion_is_adjacent_only(idx, term_docs):
    # '(a) x AND (b)': the AND binds x and (b) — (a) stays SHOULD.
    got = {
        r.docid
        for r in search(idx, "(table) spark AND (join)", k=100000).collect()
    }
    assert got == term_docs("spark") & term_docs("join")
    assert (term_docs("table") - term_docs("spark")) & got == set()


def test_promote_helpers_respect_tokens():
    from solr_spark.query.parser import _promote_first_clause, _promote_last_clause

    assert _promote_last_clause("a b") == "a +b"
    assert _promote_last_clause("a +b") == "a +b"  # already must
    assert _promote_last_clause("-b") == "-b"  # negative stays
    assert _promote_last_clause('x "a b"~2') == 'x +"a b"~2'  # phrase token
    assert _promote_last_clause("n:[1 TO 2]") == "+n:[1 TO 2]"  # range token
    assert _promote_first_clause("  b c") == "  +b c"
    assert _promote_first_clause("NOT b") == "NOT b"


# --- {!bool} composition ----------------------------------------------------


def test_bool_query_must_should_mustnot_filter(spark, idx, term_docs):
    from solr_spark.query.boolq import bool_query
    from solr_spark.query.parser import search

    out = bool_query(idx, must=["data"], should=["spark"],
                     must_not=["merge"], filter=["lang:en"], k=200)
    rows = out.collect()
    data_d, spark_d, merge_d = (term_docs(t) for t in ("data", "spark", "merge"))
    got = {r.docid for r in rows}
    assert got, "bool query matched nothing"
    assert got <= data_d and not (got & merge_d)
    # scores: must bm25 + should bm25 when the should term matches
    base = {r.docid: r.score
            for r in search(idx, "data", k=10**6, _scores_only=True).collect()}
    both = {r.docid: r.score
            for r in search(idx, "data spark", k=10**6, _scores_only=True).collect()}
    for r in rows:
        want = both[r.docid] if r.docid in spark_d else base[r.docid]
        assert r.score == pytest.approx(want)


def test_bool_query_filter_only_scores_zero(spark, idx):
    from solr_spark.query.boolq import bool_query

    rows = bool_query(idx, filter=["lang:en"], k=5).collect()
    assert rows and all(r.score == 0.0 for r in rows)


def test_bool_query_should_only_requires_one_match(spark, idx, term_docs):
    from solr_spark.query.boolq import bool_query

    out = bool_query(idx, should=["data", "spark"], k=10**6)
    got = {r.docid for r in out.collect()}
    assert got == term_docs("data") | term_docs("spark")


def test_bool_query_mustnot_only_raises(idx):
    from solr_spark.query.boolq import bool_query

    with pytest.raises(ValueError):
        bool_query(idx, must_not=["data"])
    with pytest.raises(ValueError):
        bool_query(idx)


# --- round-3 review regressions ----------------------------------------------


def test_not_clause_next_to_and_group_keeps_polarity(spark, idx, term_docs):
    """'NOT x AND (b)' must EXCLUDE x-docs (review: the '+' promotion used
    to override the NOT and require them)."""
    from solr_spark.query.parser import search

    out = {r.docid for r in
           search(idx, "NOT merge AND (data)", k=10**6).collect()}
    assert out == term_docs("data") - term_docs("merge")


def test_ampamp_group_promotion(spark, idx, term_docs):
    """'a && (b)' and '(a) && b' are conjunctions like their AND spellings."""
    from solr_spark.query.parser import search

    both = term_docs("data") & term_docs("spark")
    got1 = {r.docid for r in search(idx, "data && (spark)", k=10**6).collect()}
    got2 = {r.docid for r in search(idx, "(data) && spark", k=10**6).collect()}
    want = {r.docid for r in search(idx, "data AND (spark)", k=10**6).collect()}
    assert got1 == got2 == want == both


def test_single_term_sloppy_phrase_is_termfreq(spark, idx):
    """'\"spark\"~2' degrades to a term query (freq = tf), not a crash."""
    from solr_spark.query.parser import search

    out = search(idx, '"spark"~2', k=5).collect()
    assert len(out) == 5


def test_bool_query_should_optional_under_filter(spark, idx, term_docs):
    """FILTER is a required clause, so SHOULD must be optional: lang:en docs
    without the should term still match, scoring 0 (ReqOptSumScorer)."""
    from solr_spark.query.boolq import bool_query
    from solr_spark.query.parser import search

    en = {r.docid for r in idx.docs.where(F.col("lang") == "en")
          .select("docid").collect()}
    out = {r.docid: r.score
           for r in bool_query(idx, should=["spark"], filter=["lang:en"],
                               k=10**6).collect()}
    assert set(out) == en  # every filter doc matches, should or not
    sp = term_docs("spark")
    base = {r.docid: r.score
            for r in search(idx, "spark", k=10**6, _scores_only=True).collect()}
    for d, s in out.items():
        if d in sp:
            assert s == pytest.approx(base[d])
        else:
            assert s == 0.0


def test_fuzzy_damerau_transposition(spark):
    """Lucene FuzzyQuery counts adjacent transpositions as ONE edit
    (transpositions=true default): 'sprak'~1 must match 'spark' (Damerau
    1, plain Levenshtein 2); with transpositions=False it must not."""
    from pyspark.sql import functions as F

    from solr_spark.query.expand import damerau_levenshtein, fuzzy_candidates

    assert damerau_levenshtein("spark", "sprak") == 1
    assert damerau_levenshtein("ca", "abc") == 2      # true DL, not OSA
    stats = spark.createDataFrame(
        [("spark", 10), ("spars", 3), ("sprat", 1), ("join", 5)],
        "term string, df long",
    )
    with_t = fuzzy_candidates(stats, "sprak", 1)
    assert "spark" in with_t
    without = fuzzy_candidates(stats, "sprak", 1, transpositions=False)
    assert "spark" not in without and "sprat" in without


def test_weight_literals_single_join_plan(idx):
    """Unique-term queries compile (w, gid) to map literals (SURVEY
    §11c-bis): the term-contrib plan's only join is doclens — no
    LocalTableScan weights table, no second join."""
    q = search(idx, "spark join data", k=10)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan, plan
    assert plan.count("Join") == 1, plan


def test_weight_literal_matches_joined_form(spark, idx):
    """Per-posting contribs from the map-literal path are bit-identical
    (exact ==, no rounding) to the joined weights-table form it replaced."""
    from solr_spark.query.bm25 import (
        B_DEFAULT,
        K1_DEFAULT,
        query_weights,
        tf_saturation,
        weight_map_col,
    )

    n_docs, avgdl = idx.corpus_stats()
    weights = query_weights(idx, ["spark", "join", "data"], n_docs)
    assert len(weights) == 3
    scan = idx.postings.where(
        F.col("term").isin([t for t, _ in weights])
    ).join(idx.doclens, "docid")
    sat = tf_saturation("tf", F.col("dl"), K1_DEFAULT, B_DEFAULT, avgdl)
    lit = scan.select(
        "docid", "term",
        (F.element_at(weight_map_col(weights), F.col("term")) * sat)
        .alias("contrib"),
    )
    wdf = F.broadcast(
        spark.createDataFrame(
            [(t, w, i + 1) for i, (t, w) in enumerate(weights)],
            ["term", "w", "gid"],
        )
    )
    joined = scan.join(wdf, "term").select(
        "docid", "term", (F.col("w") * sat).alias("contrib")
    )
    a = {(r.docid, r.term): r.contrib for r in lit.collect()}
    b = {(r.docid, r.term): r.contrib for r in joined.collect()}
    assert a == b


def test_duplicate_term_clauses_fall_back_and_double(idx):
    """'spark spark' is TWO clauses with their own gids — a map literal
    cannot hold two values per key, so the joined weights table handles
    it; each clause contributes once, so scores are exactly doubled."""
    one = {r.docid: r.score for r in search(idx, "spark", k=10**6).collect()}
    two = {
        r.docid: r.score
        for r in search(idx, "spark spark", k=10**6).collect()
    }
    assert set(one) == set(two) and one
    for d, s in one.items():
        assert two[d] == pytest.approx(2 * s, rel=1e-12)
