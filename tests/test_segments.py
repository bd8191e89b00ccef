"""Physical index: build/resume/merge + WAND rank-identity vs DataFrame BM25.

The oracle pattern mirrors the reference's distributed-vs-control tests
(test-framework BaseDistributedSearchTestCase: same docs at 1 shard and N
shards must agree — SURVEY.md §5): the physical WAND path must return
rank- AND score-identical results to the logical DataFrame path, at 1 and
at 8 partitions, with and without block-max pruning.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from solr_spark.index.build import build_index
from solr_spark.index.segments import (
    build_index_dir,
    build_segments,
    finalize_index,
    merge_index,
)
from solr_spark.query.bm25 import bm25_topk
from solr_spark.query.wand import wand_topk

QUERIES = ["spark join data", "table", "window batch order", "zzznotaterm"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def logical(docs):
    idx = build_index(docs, id_col="doc_id", text_col="text", analyzer="simple")
    idx.postings = idx.postings.persist()
    idx.doclens = idx.doclens.persist()
    return idx


@pytest.fixture(scope="module")
def idx_dir(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx") / "phys")
    build_index_dir(docs, d, n_partitions=8, analyzer="simple",
                    id_col="doc_id", text_col="text")
    return d


def _rows(df):
    return [(int(r[0]), round(float(r[1]), 9)) for r in df.collect()]


@pytest.mark.parametrize("q", QUERIES)
def test_wand_matches_dataframe(spark, idx_dir, logical, q):
    terms = sorted(set(q.split()))
    want = _rows(bm25_topk(logical, terms, k=10, quantize_norms=True))
    got = _rows(wand_topk(spark, idx_dir, q, k=10))
    assert got == want


def test_wand_pruning_lossless(spark, idx_dir):
    a = _rows(wand_topk(spark, idx_dir, "spark join data", k=10, use_wand=True))
    b = _rows(wand_topk(spark, idx_dir, "spark join data", k=10, use_wand=False))
    assert a == b


def test_partition_count_invariance(spark, docs, idx_dir, tmp_path_factory):
    d1 = str(tmp_path_factory.mktemp("idx") / "p1")
    build_index_dir(docs, d1, n_partitions=1, analyzer="simple",
                    id_col="doc_id", text_col="text")
    for q in QUERIES[:2]:
        assert _rows(wand_topk(spark, d1, q, k=10)) == _rows(
            wand_topk(spark, idx_dir, q, k=10)
        )


def test_resume_skips_committed(docs, idx_dir):
    m = build_segments(docs, idx_dir, 8, "simple", 0, "doc_id", "text")
    assert m["skipped"].all()
    assert len(m) == 8
    assert m["n_docs"].sum() == 500


def test_merge_generations(spark, docs, idx_dir, tmp_path_factory):
    gen_dir = str(tmp_path_factory.mktemp("idx") / "gens")
    build_segments(docs.where(F.col("doc_id") % 2 == 0), gen_dir, 4,
                   "simple", 0, "doc_id", "text")
    build_segments(docs.where(F.col("doc_id") % 2 == 1), gen_dir, 4,
                   "simple", 1, "doc_id", "text")
    finalize_index(spark, gen_dir, "simple")
    # Multi-gen index is queryable as-is...
    want = _rows(wand_topk(spark, idx_dir, "spark join data", k=10))
    assert _rows(wand_topk(spark, gen_dir, "spark join data", k=10)) == want
    # ...and merging to one generation preserves results exactly.
    merged = str(tmp_path_factory.mktemp("idx") / "merged")
    stats = merge_index(spark, gen_dir, merged)
    assert stats["n_docs"] == 500
    assert stats["generations"] == [0]
    assert _rows(wand_topk(spark, merged, "spark join data", k=10)) == want
    shutil.rmtree(gen_dir, ignore_errors=True)


def test_bucketed_build_equivalent(spark, docs, idx_dir, tmp_path_factory):
    """The zero-shuffle bucketed-input path must produce an index that
    answers identically to the shuffled default path."""
    from pyspark.sql import functions as F

    from solr_spark.index.segments import partition_col

    d2 = str(tmp_path_factory.mktemp("idx") / "bucketed")
    bucketed = (
        docs.select(
            F.col("doc_id").cast("long").alias("docid"),
            F.col("text").alias("content"),
        )
        .withColumn("p", partition_col("docid", 8))
        .repartition(8, "p")
    )
    m = build_segments(bucketed, d2, 8, "simple", assume_partitioned=True)
    assert m["n_docs"].sum() == 500
    finalize_index(spark, d2, "simple")
    want = _rows(wand_topk(spark, idx_dir, "spark join data", k=10))
    assert _rows(wand_topk(spark, d2, "spark join data", k=10)) == want


def test_open_no_full_dictionary_collect(spark, idx_dir):
    """Opening an index must NOT collect the term dictionary to the driver;
    only the query's terms are looked up (and cached) per query."""
    from solr_spark.query import wand as wand_mod

    ix = wand_mod.PhysicalIndex(spark, idx_dir)
    assert ix._term_df_cache == {}
    ix.topk("spark join data", k=5).collect()
    assert set(ix._term_df_cache) == {"spark", "join", "data"}
    # OOV terms are negative-cached, not re-scanned.
    ix.topk("zzznotaterm", k=5).collect()
    assert ix._term_df_cache["zzznotaterm"] is None


def test_reader_cache_invalidation(spark, docs, tmp_path_factory):
    """A cached searcher reopens after a new generation is committed."""
    from solr_spark.query.wand import open_index

    d = str(tmp_path_factory.mktemp("inval") / "phys")
    half = docs.where(F.col("doc_id") % 2 == 0)
    build_segments(half, d, n_partitions=4, analyzer="simple",
                   id_col="doc_id", text_col="text", generation=0)
    finalize_index(spark, d, analyzer="simple")
    ix1 = open_index(spark, d)
    n1 = ix1.stats["n_docs"]
    assert open_index(spark, d) is ix1  # unchanged commit -> cache hit
    build_segments(docs.where(F.col("doc_id") % 2 == 1), d, n_partitions=4,
                   analyzer="simple", id_col="doc_id", text_col="text",
                   generation=1)
    finalize_index(spark, d, analyzer="simple")
    ix2 = open_index(spark, d)
    assert ix2 is not ix1 and ix2.stats["n_docs"] == docs.count() > n1


def test_topk_tie_break_at_boundary(spark, tmp_path_factory):
    """40 identical docs in ONE segment: the k-th score ties 40-way; the
    returned top-10 must be the 10 SMALLEST docids (score desc, docid asc),
    not an arbitrary argpartition subset."""
    d = str(tmp_path_factory.mktemp("ties") / "phys")
    rows = [(i, "alpha beta gamma") for i in range(40)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    build_index_dir(corpus, d, n_partitions=1, analyzer="simple",
                    id_col="doc_id", text_col="text")
    got = [int(r.docid) for r in wand_topk(spark, d, "alpha beta", k=10).collect()]
    assert got == list(range(10))


def test_assume_partitioned_violation_raises(spark, tmp_path_factory):
    """Rows of one p split across two Spark partitions must RAISE, not
    silently drop the losing task's rows."""
    d = str(tmp_path_factory.mktemp("viol") / "phys")
    rows = [(i, f"word{i} common", 0) for i in range(100)]
    corpus = spark.createDataFrame(
        rows, "doc_id long, text string, p int"
    ).repartition(4, "doc_id")  # p=0 rows scattered over 4 partitions
    with pytest.raises(Exception, match="not co-located|checksum|DIFFERENT"):
        build_segments(corpus, d, analyzer="simple", id_col="doc_id",
                       text_col="text", assume_partitioned=True)


PHRASES = [("part filter scan", 0), ("spark join", 0), ("spark join", 2),
           # 3-term sloppy: physical = batched numpy sweep, logical = the
           # n-iterator JVM fold — rank/score identity closes the loop on
           # both new paths at once
           ("part filter scan", 2), ("part filter scan", 5)]


@pytest.mark.parametrize("q,slop", PHRASES)
def test_wand_phrase_matches_dataframe(spark, idx_dir, logical, q, slop):
    """Physical phrase path must be rank- AND score-identical to the logical
    positions-join path (quantized norms on both)."""
    from solr_spark.query.phrase import phrase_topk
    from solr_spark.query.wand import wand_phrase_topk

    want = _rows(phrase_topk(logical, q, k=10, slop=slop, quantize_norms=True))
    got = _rows(wand_phrase_topk(spark, idx_dir, q, k=10, slop=slop))
    assert got == want and got  # non-empty


def test_merge_preserves_positions(spark, docs, tmp_path_factory):
    """Positions survive a generation merge: phrase results over the merged
    index equal those over the multi-generation index."""
    from solr_spark.query.wand import wand_phrase_topk

    d = str(tmp_path_factory.mktemp("mergepos") / "multi")
    m = str(tmp_path_factory.mktemp("mergepos") / "merged")
    build_segments(docs.where(F.col("doc_id") % 2 == 0), d, n_partitions=4,
                   analyzer="simple", id_col="doc_id", text_col="text",
                   generation=0)
    build_segments(docs.where(F.col("doc_id") % 2 == 1), d, n_partitions=4,
                   analyzer="simple", id_col="doc_id", text_col="text",
                   generation=1)
    finalize_index(spark, d, analyzer="simple")
    merge_index(spark, d, m)
    a = _rows(wand_phrase_topk(spark, d, "spark join", k=10))
    bb = _rows(wand_phrase_topk(spark, m, "spark join", k=10))
    assert a == bb and a


def test_phrase_partition_count_invariance(spark, docs, idx_dir, tmp_path_factory):
    """Phrase results must be rank- and score-identical at 1 vs 8 segment
    partitions (the distributed-vs-control oracle, phrase edition)."""
    from solr_spark.query.wand import wand_phrase_topk

    d1 = str(tmp_path_factory.mktemp("ph1") / "phys")
    build_index_dir(docs, d1, n_partitions=1, analyzer="simple",
                    id_col="doc_id", text_col="text")
    for q, slop in [("spark join", 0), ("spark join", 2)]:
        a = _rows(wand_phrase_topk(spark, d1, q, k=10, slop=slop))
        b = _rows(wand_phrase_topk(spark, idx_dir, q, k=10, slop=slop))
        assert a == b and a


@pytest.mark.parametrize("q", [
    "+spark +join -slow data",
    "spark join data",
    "+table -zzznotaterm",
    "spar* table",
    "+spar* data",
    "spark spar*",  # same term scored AND const-prefix-expanded
])
def test_physical_boolean_matches_logical(spark, idx_dir, logical, q):
    """PhysicalIndex.search must be rank- and score-identical to the logical
    parser path (quantized norms on both)."""
    from solr_spark.query.parser import search
    from solr_spark.query.wand import open_index

    want = _rows(search(logical, q, k=10, quantize_norms=True))
    got = _rows(open_index(spark, idx_dir).search(q, k=10))
    assert got == want and got


@pytest.mark.parametrize("q", [
    "(spark join) data",                # should-group + flat
    "+(spark table^2) -slow data",      # must-group with inner boost + neg
    "(spark join)^2 (table batch)",     # two boosted should-groups
    "data AND (spark join)",            # AND promotes both sides
    "((spark table) join) order",       # nested groups
    "(spar* data) table",               # prefix inside a group
])
def test_physical_grouped_matches_logical(spark, idx_dir, logical, q):
    """Grouped boolean queries on the physical path must be rank- AND
    score-identical to the logical parser's grouped combination (same
    _split_top_level grammar, per-segment ordinal-set algebra)."""
    from solr_spark.query.parser import search
    from solr_spark.query.wand import open_index

    want = _rows(search(logical, q, k=10, quantize_norms=True))
    got = _rows(open_index(spark, idx_dir).search(q, k=10))
    assert got == want and got


def test_physical_fuzzy_matches_logical(spark, idx_dir, logical):
    from solr_spark.query.parser import search
    from solr_spark.query.wand import open_index

    for q in ["tabel~2", "+tabel~2 spark"]:
        want = _rows(search(logical, q, k=10, quantize_norms=True))
        got = _rows(open_index(spark, idx_dir).search(q, k=10))
        assert got == want and got


def test_phrase_raises_on_positionless_index(spark, docs, tmp_path_factory):
    from solr_spark.query.wand import wand_phrase_topk

    d = str(tmp_path_factory.mktemp("nopos") / "phys")
    build_index_dir(docs, d, n_partitions=2, analyzer="simple",
                    id_col="doc_id", text_col="text", store_positions=False)
    with pytest.raises(ValueError, match="positions"):
        wand_phrase_topk(spark, d, "spark join", k=5)


def test_merge_mixed_positions_raises(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mixed") / "multi")
    m = str(tmp_path_factory.mktemp("mixed") / "merged")
    build_segments(docs.where(F.col("doc_id") % 2 == 0), d, n_partitions=2,
                   analyzer="simple", id_col="doc_id", text_col="text",
                   generation=0, store_positions=False)
    build_segments(docs.where(F.col("doc_id") % 2 == 1), d, n_partitions=2,
                   analyzer="simple", id_col="doc_id", text_col="text",
                   generation=1, store_positions=True)
    finalize_index(spark, d, analyzer="simple")
    with pytest.raises(Exception, match="store_positions"):
        merge_index(spark, d, m)
