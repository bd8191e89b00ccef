"""Round-3 additions: explain transformer, spellcheck collations, heatmap
facet. Oracle: independent pandas/python recomputation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from solr_spark.index.build import build_index


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return build_index(
        docs.withColumn("docid", F.col("doc_id").cast("string")),
        text_col="text", analyzer="simple",
    )


def test_explain_rows_sum_to_score(spark, idx):
    from solr_spark.query.bm25 import bm25_score_df, explain_score

    total = {
        r.docid: r.score
        for r in bm25_score_df(idx, ["data", "spark"]).collect()
    }
    some = sorted(total)[:5]
    rows = explain_score(idx, ["data", "spark"], docids=some).toPandas()
    by_doc = rows.groupby("docid")["contrib"].sum()
    for d in some:
        assert by_doc[d] == pytest.approx(total[d], rel=1e-12)
    # idf matches the BM25 formula from the row's own df
    n_docs, _ = idx.corpus_stats()
    for _, r in rows.iterrows():
        assert r["idf"] == pytest.approx(
            math.log(1 + (n_docs - r["df"] + 0.5) / (r["df"] + 0.5))
        )


def test_collate_counts_and_ranks(spark, idx):
    from solr_spark.query.spellcheck import collate

    out = collate(idx, ["sar", "jion"], max_candidates=3).toPandas()
    assert len(out) >= 1
    assert out["hits"].is_monotonic_decreasing
    # every collation's hit count equals the true AND count
    post = idx.postings.select("docid", "term").distinct().toPandas()
    docs_of = {t: set(g["docid"]) for t, g in post.groupby("term")}
    for _, r in out.iterrows():
        t1, t2 = r["collation"].split(" ")
        assert r["hits"] == len(docs_of[t1] & docs_of[t2])
        assert r["hits"] > 0


def test_collate_includes_valid_original_word(spark, idx):
    from solr_spark.query.spellcheck import collate

    # 'spark' is a real dictionary term: collations must include it as-is
    out = collate(idx, ["spark", "jion"], max_candidates=2).toPandas()
    assert any(c.startswith("spark ") for c in out["collation"])


def test_heatmap_grid_clamps_and_sums(spark):
    from solr_spark.functions.spatial import heatmap_facet

    pts = spark.createDataFrame(
        [(90.0, -180.0), (90.0, 180.0), (-90.0, 0.0), (0.0, 0.0),
         (89.9, -179.9), (45.0, 45.0)],
        ["lat", "lon"],
    )
    out = heatmap_facet(pts, "lat", "lon", -90, 90, -180, 180,
                        rows=6, cols=8).toPandas()
    assert out["count"].sum() == 6
    got = {
        (row, col): cnt
        for row, col, cnt in zip(out["grid_row"], out["grid_col"], out["count"])
    }
    assert got[(0, 0)] == 2          # north-west corner incl. 89.9,-179.9
    assert got[(0, 7)] == 1          # lon=+180 clamps into last col
    assert got[(5, 4)] == 1          # lat=-90 clamps into last row
    assert (out["grid_row"].between(0, 5)).all()
    assert (out["grid_col"].between(0, 7)).all()
