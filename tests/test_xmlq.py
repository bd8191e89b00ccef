"""Lucene XML query parser ({!xmlparser}) — element semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.index.build import build_index
from solr_spark.query.xmlq import xml_query


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    i = build_index(docs, id_col="doc_id", text_col="text", analyzer="simple",
                    stored_cols=("lang", "source", "n_chars"))
    i.postings = i.postings.persist()
    i.doclens = i.doclens.persist()
    return i


def _ids(df):
    return [r.docid for r in df.collect()]


def test_termquery_matches_string_parser(idx):
    from solr_spark.query.parser import search

    a = xml_query(idx, "<TermQuery>data</TermQuery>", k=10).collect()
    b = search(idx, "data", k=10).collect()
    assert [(r.docid, r.score) for r in a] == [(r.docid, r.score) for r in b]


def test_boolean_must_mustnot_filter(idx):
    q = """
    <BooleanQuery>
      <Clause occurs="must"><TermQuery>data</TermQuery></Clause>
      <Clause occurs="mustnot"><TermQuery>merge</TermQuery></Clause>
      <Clause occurs="filter"><TermQuery fieldName="lang">en</TermQuery></Clause>
    </BooleanQuery>
    """
    out = xml_query(idx, q, k=10**6)
    rows = out.collect()
    assert rows
    data = {r.docid for r in idx.postings.where(F.col("term") == "data")
            .select("docid").collect()}
    merge = {r.docid for r in idx.postings.where(F.col("term") == "merge")
             .select("docid").collect()}
    en = {r.docid for r in idx.docs.where(F.col("lang") == "en")
          .select("docid").collect()}
    got = {r.docid for r in rows}
    assert got == (data - merge) & en


def test_dismax_tiebreaker_math(idx):
    from solr_spark.query.parser import search

    q = ('<DisjunctionMaxQuery tieBreaker="0.3">'
         "<TermQuery>data</TermQuery><TermQuery>spark</TermQuery>"
         "</DisjunctionMaxQuery>")
    got = {r.docid: r.score for r in xml_query(idx, q, k=10**6).collect()}
    s1 = {r.docid: r.score
          for r in search(idx, "data", k=10**6, _scores_only=True).collect()}
    s2 = {r.docid: r.score
          for r in search(idx, "spark", k=10**6, _scores_only=True).collect()}
    for d, s in got.items():
        parts = [x for x in (s1.get(d), s2.get(d)) if x is not None]
        want = max(parts) + 0.3 * (sum(parts) - max(parts))
        assert s == pytest.approx(want)


def test_matchall_and_range_and_boost(idx):
    n = idx.doclens.count()
    all_rows = xml_query(idx, '<MatchAllDocsQuery boost="2.5"/>', k=10**6).collect()
    assert len(all_rows) == n and all(r.score == 2.5 for r in all_rows)

    rng = xml_query(
        idx,
        '<RangeQuery fieldName="n_chars" lowerTerm="200" upperTerm="300" '
        'includeUpper="false"/>',
        k=10**6,
    )
    got = {r.docid for r in rng.collect()}
    want = {r.docid for r in
            idx.docs.where((F.col("n_chars") >= 200) & (F.col("n_chars") < 300))
            .select("docid").collect()}
    assert got == want


def test_constant_score_and_user_query(idx):
    q = ('<ConstantScoreQuery boost="7.0">'
         "<UserQuery>+data +spark</UserQuery></ConstantScoreQuery>")
    rows = xml_query(idx, q, k=10**6).collect()
    assert rows and all(r.score == 7.0 for r in rows)


def test_terms_query_constant_score(idx):
    rows = xml_query(
        idx, '<TermsQuery fieldName="lang">en de</TermsQuery>', k=10**6
    ).collect()
    want = idx.docs.where(F.col("lang").isin(["en", "de"])).count()
    assert len(rows) == want and all(r.score == 1.0 for r in rows)


def test_span_near_ordered_matches_phrase(idx):
    from solr_spark.query.phrase import phrase_score_df

    q = ('<SpanNear slop="1" inOrder="true">'
         "<SpanTerm>fast</SpanTerm><SpanTerm>merge</SpanTerm></SpanNear>")
    got = {(r.docid, r.score) for r in xml_query(idx, q, k=10**6).collect()}
    want = {(r.docid, r.score)
            for r in phrase_score_df(idx, ["fast", "merge"], slop=1,
                                     quantize_norms=False).collect()}
    assert got == want


def test_unknown_element_raises(idx):
    with pytest.raises(ValueError, match="unsupported"):
        xml_query(idx, "<FuzzyLikeThisQuery>x</FuzzyLikeThisQuery>")


def test_boolean_should_optional_under_filter(idx):
    """A SHOULD clause beside a FILTER clause is optional (Lucene
    BooleanQuery: FILTER is required): every lang:en doc matches, scoring
    the should term's bm25 when it matches and 0 otherwise."""
    q = ('<BooleanQuery>'
         '<Clause occurs="filter"><TermsQuery fieldName="lang">en</TermsQuery></Clause>'
         '<Clause occurs="should"><TermQuery>spark</TermQuery></Clause>'
         '</BooleanQuery>')
    rows = {r.docid: r.score for r in xml_query(idx, q, k=10**6).collect()}
    en = {r.docid for r in idx.docs.where(F.col("lang") == "en")
          .select("docid").collect()}
    assert set(rows) == en
    assert any(s > 0 for s in rows.values()) and any(s == 0.0 for s in rows.values())
