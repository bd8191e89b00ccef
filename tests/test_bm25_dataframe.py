"""BM25 DataFrame engine vs the independent pure-Python oracle.

Mirrors the reference's distributed-vs-control oracle
(BaseDistributedSearchTestCase.compareSolrResponses — SURVEY.md §5): the
engine's distributed result must be rank-identical, scores within 1e-4.
"""

from __future__ import annotations

import pytest

from solr_spark.corpus import REFERENCE_QUERIES, corpus_pandas
from solr_spark.index.build import build_index
from solr_spark.index.docid import with_docid
from solr_spark.index.norms import byte4_to_int, int_to_byte4, quantize_length
from solr_spark.query.bm25 import bm25_topk
from tests.oracle.bm25_oracle import OracleIndex


@pytest.fixture(scope="module")
def small(spark):
    pdf = corpus_pandas(300, seed=42)
    sdf = with_docid(spark.createDataFrame(pdf).repartition(8))
    index = build_index(sdf, analyzer="text_en")
    index.postings = index.postings.cache()
    index.doclens = index.doclens.cache()

    oracle = OracleIndex(analyzer="text_en")
    docids = {r["path"]: r["docid"] for r in sdf.select("path", "docid").collect()}
    for row in pdf.itertuples():
        oracle.add(docids[row.path], row.content)
    return index, oracle


@pytest.mark.parametrize("qid,qtext", REFERENCE_QUERIES)
def test_topk_matches_oracle(small, qid, qtext):
    index, oracle = small
    got = [(r["docid"], r["score"]) for r in bm25_topk(index, qtext, k=10).collect()]
    want = oracle.topk(qtext, k=10)
    assert [d for d, _ in got] == [d for d, _ in want], f"rank mismatch q{qid}"
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-4)


def test_partition_invariance(spark):
    """Same result at 1 partition and 16 partitions, byte-identical ids."""
    pdf = corpus_pandas(200, seed=7)
    results = []
    for nparts in (1, 16):
        sdf = with_docid(spark.createDataFrame(pdf).repartition(nparts))
        index = build_index(sdf, analyzer="text_en")
        rows = bm25_topk(index, "scorer merger posting", k=10).collect()
        results.append([(r["docid"], round(r["score"], 9)) for r in rows])
    assert results[0] == results[1]


def test_smallfloat_roundtrip():
    # Identity below the free-value threshold, monotone lossy above.
    for i in [0, 1, 39, 100, 255, 1000, 65536, 2**30]:
        q = quantize_length(i)
        assert q <= i
        assert byte4_to_int(int_to_byte4(i)) == q
    # Encode is monotone and decode(encode(x)) is the floor of the grid.
    prev = -1
    for i in range(0, 5000, 7):
        b = int_to_byte4(i)
        assert b >= prev
        prev = b
        assert quantize_length(quantize_length(i)) == quantize_length(i)


def test_smallfloat_property_sweep():
    """Hypothesis sweep of the SmallFloat norm codec over the full doc-length
    range: round-trip lands on the quantization grid at or below the input,
    quantization is idempotent, and encode is monotone on arbitrary pairs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        i=st.integers(min_value=0, max_value=2**31 - 1),
        j=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(i, j):
        q = quantize_length(i)
        assert 0 <= q <= i
        assert byte4_to_int(int_to_byte4(i)) == q
        assert quantize_length(q) == q
        lo, hi = sorted((i, j))
        assert int_to_byte4(lo) <= int_to_byte4(hi)

    check()


def test_sha256_invariant(spark):
    """Per-row sha256(content) equality input vs index docs table."""
    import hashlib

    pdf = corpus_pandas(50, seed=42)
    sdf = with_docid(spark.createDataFrame(pdf))
    index = build_index(sdf)
    got = {r["docid"]: r["content_sha256"] for r in index.docs.collect()}
    want_rows = sdf.select("docid", "content").collect()
    assert len(got) == 50
    for r in want_rows:
        assert got[r["docid"]] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_weight_map_col_paths_bit_identical(spark):
    """The one-call F.expr map literal and the per-element F.lit fallback
    must produce bit-identical doubles for any finite weight (the
    ann._lit_vec rule), and terms that would break a SQL string literal
    must route to the fallback and still look up correctly."""
    import math

    from pyspark.sql import functions as F

    from solr_spark.query.bm25 import weight_map_col

    weights = [
        ("plain", 1.2345678901234567),
        ("unicode_ñé中", math.pi),
        ("tiny", 5e-324),
        ("big", 1.7976931348623157e308),
        ("neg", -0.1),
    ]
    fast = weight_map_col(weights)          # safe: expr path
    slow = F.create_map(
        *[c for t, w in weights for c in (F.lit(t), F.lit(float(w)))]
    )
    df = spark.createDataFrame([(t,) for t, _ in weights], ["term"])
    rows = df.select(
        "term",
        F.element_at(fast, F.col("term")).alias("a"),
        F.element_at(slow, F.col("term")).alias("b"),
    ).collect()
    assert len(rows) == len(weights)
    for r in rows:
        assert r["a"] == r["b"] and str(r["a"]) == str(r["b"]), r

    # quote / backslash / control-char terms and non-finite weights fall
    # back to per-element construction and still resolve
    tricky = [("it's", 2.0), ("back\\slash", 3.0), ("tab\there", 4.0)]
    m = weight_map_col(tricky)
    got = {
        r["term"]: r["w"]
        for r in spark.createDataFrame([(t,) for t, _ in tricky], ["term"])
        .select("term", F.element_at(m, F.col("term")).alias("w"))
        .collect()
    }
    assert got == {t: w for t, w in tricky}
    inf_m = weight_map_col([("a", float("inf"))])
    row = spark.range(1).select(
        F.element_at(inf_m, F.lit("a")).alias("w")
    ).collect()[0]
    assert row["w"] == float("inf")
