"""`{!simple}` — SimpleQueryParser lowering + leniency + engine parity.

Reference: SimpleQParserPlugin.java (Lucene SimpleQueryParser semantics:
+ AND, | OR, - negation, phrases, prefix*, fuzzy~, groups, never raises).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.query.parser import search
from solr_spark.query.simpleq import simple_query, simple_to_lucene


@pytest.mark.parametrize(
    "simple,lucene",
    [
        ("spark + data", "spark AND data"),
        ("spark | data batch", "spark OR data batch"),
        ("-spark data", "-spark data"),
        ('"fast merge"~2 index*', '"fast merge"~2 index*'),
        ("(spark | batch) + data", "(spark OR batch) AND data"),
        ("a + (b | c", "a AND (b OR c)"),          # unclosed paren repaired
        ('"unterminated phrase', '"unterminated phrase"'),
        ("a + + | b", "a OR b"),                   # operator soup: last wins
        ("a ) b", "a b"),                          # stray ')' dropped
        ("-(a b) c", "-(a b) c"),
        ("a () b", "a b"),                         # empty group dropped
        ("don't stop~1", "don t stop~1"),          # escapes/punct normalized
        ("", ""),
        ("+ | -", ""),                             # pure operators: empty
        (r"a\+b", "a b"),                          # escaped '+' is literal
    ],
)
def test_simple_lowering(simple, lucene):
    assert simple_to_lucene(simple) == lucene


def test_simple_default_operator_and():
    assert simple_to_lucene("a b", "AND") == "a AND b"


@pytest.fixture(scope="module")
def idx(spark):
    from solr_spark.index.build import build_index

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("docid"), "text")
    )
    ix = build_index(docs, text_col="text", analyzer="simple")
    ix.postings = ix.postings.persist()
    ix.doclens = ix.doclens.persist()
    return ix


def test_simple_query_matches_lucene_engine(idx):
    a = [(r.docid, round(r.score, 9))
         for r in simple_query(idx, "spark + data -python", k=10).collect()]
    b = [(r.docid, round(r.score, 9))
         for r in search(idx, "spark AND data -python", k=10).collect()]
    assert a == b and len(a) > 0


def test_simple_query_never_raises(idx):
    for junk in ['"((', "+++", "a + (b | -", ")(", '-"', ""]:
        simple_query(idx, junk, k=5).collect()  # must not raise


def test_thin_parsers(spark, idx):
    """{!field}/{!raw}/{!query}/{!filters} — the registry tail."""
    from solr_spark.query.parser import search
    from solr_spark.query.thinparsers import (
        field_eq, field_query, filters_query, nested_query, raw_eq,
    )

    # field on the text field: multi-token value -> phrase; 1 token -> term
    a = [(r.docid, round(r.score, 9))
         for r in field_query(idx, "Fast, MERGE!", "simple", k=5).collect()]
    b = [(r.docid, round(r.score, 9))
         for r in search(idx, '"fast merge"', k=5).collect()]
    assert a == b and a
    one = field_query(idx, "SPARK?", "simple", k=5).collect()
    assert [r.docid for r in one] == [r.docid for r in search(idx, "spark", k=5).collect()]
    assert field_query(idx, "???", "simple", k=5).count() == 0

    # nested = delegation
    n = nested_query(idx, "spark AND data", k=5).collect()
    m = search(idx, "spark AND data", k=5).collect()
    assert [r.docid for r in n] == [r.docid for r in m]

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # raw: byte equality, no lowercasing — 'EN' matches nothing
    assert docs.where(raw_eq(docs, "lang", "EN")).count() == 0
    assert docs.where(field_eq(docs, "lang", "en")).count() > 0

    got = filters_query(
        docs,
        {"A": F.col("lang") == "en", "B": F.col("n_chars") >= 200,
         "C": F.col("source") == "nope"},
        exclude_tags=("C",),
    ).count()
    want = docs.where((F.col("lang") == "en") & (F.col("n_chars") >= 200)).count()
    assert got == want > 0


def test_simple_lowering_never_raises_fuzz():
    """SimpleQueryParser's defining property is total leniency: ANY input
    must lower to a string the lucene grammar can parse without raising."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from solr_spark.query.parser import parse_query

    alphabet = st.sampled_from(list('ab01 +|-"()\\~*^:[]{}!&'))

    @settings(max_examples=500, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=40))
    def run(q):
        lowered = simple_to_lucene(q)
        # balanced quotes and parens by construction
        assert lowered.count('"') % 2 == 0
        depth = 0
        for ch in lowered:
            depth += ch == "("
            depth -= ch == ")"
            assert depth >= 0
        assert depth == 0
        parse_query(lowered)  # the flat level must never raise

    run()


def test_phrases_identification_planted_collocation(spark):
    """A bigram that ALWAYS occurs adjacently must outscore one whose words
    co-occur but never adjacently; unindexed words score -1."""
    from solr_spark.index.build import build_index
    from solr_spark.query.phrases_id import phrases_identification

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta delta gamma"),
        (3, "gamma alpha beta epsilon"),
        (4, "delta epsilon gamma"),
    ]
    docs = spark.createDataFrame(rows, ["docid", "text"]) \
        .select(F.col("docid").cast("string").alias("docid"), "text")
    ix = build_index(docs, text_col="text", analyzer="simple")

    out = phrases_identification(ix, "alpha beta", max_query_len=2).toPandas()
    strong = dict(zip(out["phrase"], out["score"]))
    assert strong["alpha beta"] > 0          # always adjacent
    assert strong["alpha"] == 0.0            # singles score 0

    weak = phrases_identification(ix, "gamma delta", max_query_len=2).toPandas()
    wk = dict(zip(weak["phrase"], weak["score"]))
    assert wk["gamma delta"] < strong["alpha beta"]

    miss = phrases_identification(ix, "alpha zzz", max_query_len=2).toPandas()
    ms = dict(zip(miss["phrase"], miss["score"]))
    assert ms["zzz"] == -1.0 and ms["alpha zzz"] == -1.0
