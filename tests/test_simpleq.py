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
