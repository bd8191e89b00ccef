"""LTR rerank ({!ltr}) — solr/contrib/ltr semantics.

Covers: LinearModel dot product, MultipleAdditiveTreesModel split rule with
NODE_SPLIT_SLACK (<= threshold+1e-6 → left), normalizers, managed-model JSON
loading, window/remainder rerank semantics (LTRRescorer: model score REPLACES
original inside the window; docs past reRankDocs keep original score below),
and the no-UDF/codegen plan shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.query.ltr import (
    LinearModel,
    TreesModel,
    from_solr_json,
    ltr_rerank,
    minmax_norm,
    standard_norm,
)


def _feat_df(spark):
    rows = [
        # docid, score (main query), f1, lang
        ("a", 5.0, 10.0, "en"),
        ("b", 4.0, 100.0, "de"),
        ("c", 3.0, 50.0, "en"),
        ("d", 2.0, 80.0, "fr"),
        ("e", 1.0, 90.0, "en"),
    ]
    return spark.createDataFrame(rows, ["docid", "score", "f1", "lang"])


def _features():
    return {
        "originalScore": F.col("score"),
        "f1": F.col("f1"),
        "isEn": F.when(F.col("lang") == "en", 1.0).otherwise(0.0),
    }


def test_linear_model_dot_product(spark):
    df = _feat_df(spark)
    model = LinearModel({"originalScore": 2.0, "f1": 0.01})
    out = df.select("docid", model.compile(_features()).alias("s")).collect()
    got = {r.docid: r.s for r in out}
    assert got["a"] == pytest.approx(2 * 5.0 + 0.01 * 10.0)
    assert got["b"] == pytest.approx(2 * 4.0 + 0.01 * 100.0)


def test_linear_missing_feature_raises(spark):
    with pytest.raises(ValueError, match="undefined features"):
        LinearModel({"nope": 1.0}).compile(_features())


def test_trees_split_slack_boundary(spark):
    """Feature EXACTLY at the threshold routes left (<= t + 1e-6),
    matching MultipleAdditiveTreesModel's parsed +1e-6 slack."""
    df = spark.createDataFrame([("x", 0.8), ("y", 0.8000001), ("z", 0.81)],
                               ["docid", "v"])
    model = TreesModel([
        {"weight": 1.0, "root": {
            "feature": "v", "threshold": 0.8,
            "left": {"value": -1.0}, "right": {"value": 1.0}}},
    ])
    out = df.select("docid", model.compile({"v": F.col("v")}).alias("s"))
    got = {r.docid: r.s for r in out.collect()}
    assert got["x"] == -1.0          # == threshold → left
    assert got["y"] == -1.0          # within slack → left
    assert got["z"] == 1.0


def test_trees_weighted_sum_and_null_default(spark):
    df = spark.createDataFrame([("a", None), ("b", 5.0)], ["docid", "v"])
    model = TreesModel([
        {"weight": 2.0, "root": {
            "feature": "v", "threshold": 1.0,
            "left": {"value": 10.0}, "right": {"value": 20.0}}},
        {"weight": 0.5, "root": {"value": 4.0}},
    ])
    got = {r.docid: r.s for r in
           df.select("docid", model.compile({"v": F.col("v")}).alias("s")).collect()}
    # null feature → 0.0 (reference Feature defaultValue) → left leaf
    assert got["a"] == pytest.approx(2 * 10.0 + 0.5 * 4.0)
    assert got["b"] == pytest.approx(2 * 20.0 + 0.5 * 4.0)


def test_normalizers(spark):
    df = spark.createDataFrame([("a", 15.0)], ["docid", "v"])
    mm = minmax_norm(10.0, 20.0)(F.col("v"))
    st = standard_norm(10.0, 2.0)(F.col("v"))
    r = df.select(mm.alias("mm"), st.alias("st")).first()
    assert r.mm == pytest.approx(0.5)
    assert r.st == pytest.approx(2.5)
    with pytest.raises(ValueError):
        minmax_norm(3.0, 3.0)
    with pytest.raises(ValueError):
        standard_norm(0.0, 0.0)


def test_from_solr_json_linear_with_norms(spark):
    model = from_solr_json({
        "class": "org.apache.solr.ltr.model.LinearModel",
        "features": [
            {"name": "f1",
             "norm": {"class": "org.apache.solr.ltr.norm.MinMaxNormalizer",
                      "params": {"min": "0", "max": "200"}}},
        ],
        "params": {"weights": {"f1": 2.0, "originalScore": 1.0}},
    })
    df = _feat_df(spark)
    got = {r.docid: r.s for r in
           df.select("docid", model.compile(_features()).alias("s")).collect()}
    assert got["b"] == pytest.approx(1.0 * 4.0 + 2.0 * (100.0 / 200.0))


def test_from_solr_json_trees(spark):
    model = from_solr_json({
        "class": "org.apache.solr.ltr.model.MultipleAdditiveTreesModel",
        "params": {"trees": [
            {"weight": "1.5", "root": {
                "feature": "f1", "threshold": "50",
                "left": {"value": "1"}, "right": {"value": "2"}}},
        ]},
    })
    df = _feat_df(spark)
    got = {r.docid: r.s for r in
           df.select("docid", model.compile(_features()).alias("s")).collect()}
    assert got["a"] == pytest.approx(1.5 * 1.0)   # 10 <= 50
    assert got["c"] == pytest.approx(1.5 * 1.0)   # 50 == threshold → left
    assert got["b"] == pytest.approx(1.5 * 2.0)   # 100 > 50


def test_rerank_replaces_window_scores_and_keeps_tail(spark):
    """reRankDocs=3: top-3 by original score get model scores and re-sort;
    docs 'd','e' keep original scores and sort BELOW the window
    (LTRRescorer.java: rescored window first, remainder in original order)."""
    df = _feat_df(spark)
    model = LinearModel({"f1": 1.0})          # reranks purely by f1
    out = ltr_rerank(df.select("docid", "score"),
                     df.select("docid", "f1", "lang"),
                     _features(), model, rerank_docs=3, k=5)
    rows = out.collect()
    assert [r.docid for r in rows] == ["b", "c", "a", "d", "e"]
    got = {r.docid: r.score for r in rows}
    assert got["b"] == pytest.approx(100.0)   # model score replaced
    assert got["d"] == pytest.approx(2.0)     # original kept
    assert got["e"] == pytest.approx(1.0)


def test_rerank_k_smaller_than_window(spark):
    df = _feat_df(spark)
    model = LinearModel({"f1": 1.0})
    out = ltr_rerank(df.select("docid", "score"),
                     df.select("docid", "f1", "lang"),
                     _features(), model, rerank_docs=3, k=2)
    assert [r.docid for r in out.collect()] == ["b", "c"]


def test_compiled_plan_has_no_python_udf(spark):
    """The whole model is Catalyst CASE WHEN arithmetic — no BatchEvalPython
    / ArrowEvalPython stage anywhere in the rerank plan."""
    df = _feat_df(spark)
    model = TreesModel([
        {"weight": 1.0, "root": {
            "feature": "f1", "threshold": 50.0,
            "left": {"value": 0.1}, "right": {"value": 0.9}}},
    ])
    out = ltr_rerank(df.select("docid", "score"),
                     df.select("docid", "f1", "lang"),
                     _features(), model, rerank_docs=3, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_node_budget_enforced(spark):
    def mk(d):
        if d == 0:
            return {"value": 1.0}
        return {"feature": "f1", "threshold": 1.0,
                "left": mk(d - 1), "right": mk(d - 1)}

    model = TreesModel([{"weight": 1.0, "root": mk(14)}])  # 2^15-1 nodes
    with pytest.raises(ValueError, match="nodes"):
        model.compile({"f1": F.col("f1")})
