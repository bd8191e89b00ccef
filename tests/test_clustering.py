"""Result clustering (operators/clustering.py)."""

from __future__ import annotations

from solr_spark.operators.clustering import (
    OTHER_LABEL,
    cluster_results,
    cluster_summary,
)


def _assign(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["id"]: (r["label"], r["label_rank"])
            for r in cluster_results(df, "text", "doc_id", **kw).collect()}


def test_cluster_labels_and_other_bucket(spark):
    rows = [
        (0, "apache spark compute engine"),
        (1, "spark fast compute engine"),
        (2, "solr search index lucene"),
        (3, "search index query lucene solr"),
        (4, "banana fruit salad"),
    ]
    got = _assign(spark, rows, k_labels=4)
    # docs 0/1 and 2/3 land in labeled clusters; the singleton is Other
    assert got[0] == got[1] and got[0][1] >= 1
    assert got[2] == got[3] and got[2][1] >= 1
    assert got[0][0] != got[2][0]
    assert got[4] == (OTHER_LABEL, 0)


def test_cluster_every_doc_assigned_exactly_once(spark):
    rows = [(i, f"common t{i % 3} filler") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cluster_results(df, "text", "doc_id", k_labels=2).collect()
    assert len(out) == 12 and len({r["id"] for r in out}) == 12
    sizes = {r["label"]: r["n_docs"]
             for r in cluster_summary(
                 cluster_results(df, "text", "doc_id", k_labels=2)).collect()}
    assert sum(sizes.values()) == 12


def test_cluster_stop_terms_excluded_from_labels(spark):
    rows = [(i, "query query match doc") for i in range(4)]
    got = _assign(spark, rows, k_labels=3, stop_terms=("query",))
    labels = {v[0] for v in got.values()}
    assert "query" not in labels


def test_cluster_label_significance_prefers_splitting_terms(spark):
    # a term in EVERY doc has significance df*ln(N/df) = 0 -> never a label
    rows = ([(i, "ubiq alpha alpha-side") for i in range(3)]
            + [(i + 3, "ubiq beta beta-side") for i in range(3)])
    got = _assign(spark, rows, k_labels=2)
    labels = {v[0] for v in got.values()}
    assert "ubiq" not in labels
    assert got[0][0] != got[3][0]  # the two halves split
