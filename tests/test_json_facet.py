"""JSON Facet API: nested buckets, stat sub-aggs, stat-sorted buckets.

Oracle: pandas recomputation over the same parquet (independent engine)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from solr_spark.operators.facets import json_facet


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def pdocs(docs):
    return docs.select("lang", "source", "n_chars").toPandas()


def test_stat_sorted_buckets(docs, pdocs):
    res = json_facet(
        docs,
        {"field": "lang", "limit": 3, "sort": "sum_chars desc",
         "facet": {"sum_chars": "sum(n_chars)", "avg_chars": "avg(n_chars)"}},
    )["buckets"].toPandas()
    want = (
        pdocs.groupby("lang")
        .agg(count=("n_chars", "size"), sum_chars=("n_chars", "sum"),
             avg_chars=("n_chars", "mean"))
        .reset_index()
        .sort_values(["sum_chars", "lang"], ascending=[False, True])
        .head(3)
        .reset_index(drop=True)
    )
    assert list(res["lang"]) == list(want["lang"])
    assert list(res["sum_chars"]) == list(want["sum_chars"])
    assert [round(x, 6) for x in res["avg_chars"]] == [
        round(x, 6) for x in want["avg_chars"]
    ]


def test_index_sort_and_mincount(docs, pdocs):
    res = json_facet(
        docs, {"field": "lang", "limit": 100, "sort": "index asc",
               "mincount": 50},
    )["buckets"].toPandas()
    vc = pdocs["lang"].value_counts()
    want = sorted(v for v in vc.index if vc[v] >= 50)
    assert list(res["lang"]) == want


def test_nested_subfacet_per_bucket_limit(docs, pdocs):
    res = json_facet(
        docs,
        {"field": "lang", "limit": 2, "sort": "count desc",
         "facet": {"srcs": {"field": "source", "limit": 2,
                            "sort": "count desc"}}},
    )
    top_langs = (
        pdocs.groupby("lang").size().reset_index(name="n")
        .sort_values(["n", "lang"], ascending=[False, True]).head(2)["lang"]
        .tolist()
    )
    child = res["srcs"].toPandas()
    assert sorted(child["lang"].unique()) == sorted(top_langs)
    for lang in top_langs:
        sub = pdocs[pdocs["lang"] == lang]
        vc = (
            sub.groupby("source").size().reset_index(name="count")
            .sort_values(["count", "source"], ascending=[False, True]).head(2)
        )
        got = child[child["lang"] == lang].sort_values(
            ["count", "source"], ascending=[False, True]
        )
        assert list(got["source"]) == list(vc["source"])
        assert list(got["count"]) == list(vc["count"])


def test_three_level_nesting_runs(docs):
    res = json_facet(
        docs,
        {"field": "lang", "limit": 2,
         "facet": {"s": {"field": "source", "limit": 2,
                         "facet": {"b": {"field": "lang", "limit": 1}}}}},
    )
    assert set(res) == {"buckets", "s", "s.b"}
    grand = res["s.b"].toPandas()
    assert list(grand.columns[:3]) == ["lang", "source", "lang"] or len(grand.columns) >= 3


def test_unsupported_agg_raises(docs):
    with pytest.raises(ValueError, match="unsupported"):
        json_facet(docs, {"field": "lang", "facet": {"x": "median(n_chars)"}})[
            "buckets"
        ].collect()


@pytest.fixture(scope="module")
def nully(docs):
    """Docs with some null sources, for missing-bucket semantics."""
    spark = docs.sparkSession
    return spark.createDataFrame(
        [("a", "en", "s1", 10), ("b", "en", "s1", 20), ("c", "en", None, 5),
         ("d", "de", "s2", 7), ("e", "de", None, 3), ("f", "en", "t9", 40)],
        "doc_id string, lang string, source string, n_chars int",
    )


def test_missing_allbuckets_numbuckets(nully):
    res = json_facet(
        nully,
        {"field": "source", "missing": True, "allBuckets": True,
         "numBuckets": True, "facet": {"s": "sum(n_chars)"}},
    )
    m = res["missing"].first()
    assert (m["count"], m["s"]) == (2, 8)          # c + e
    ab = res["allBuckets"].first()
    assert (ab["count"], ab["s"]) == (4, 77)       # non-null only
    assert res["numBuckets"].first()["numBuckets"] == 3
    # null values form no bucket of their own
    assert None not in {r.source for r in res["buckets"].collect()}


def test_prefix_restricts_buckets_and_numbuckets(nully):
    res = json_facet(
        nully, {"field": "source", "prefix": "s", "numBuckets": True,
                "sort": "index asc"},
    )
    assert [r.source for r in res["buckets"].collect()] == ["s1", "s2"]
    assert res["numBuckets"].first()["numBuckets"] == 2


def test_domain_filter(nully):
    res = json_facet(
        nully, {"field": "source", "domain": {"filter": "lang:en"},
                "sort": "index asc"},
    )
    got = {(r.source, r["count"]) for r in res["buckets"].collect()}
    assert got == {("s1", 2), ("t9", 1)}
    # SQL-expression form of the domain filter
    res2 = json_facet(
        nully, {"field": "source", "domain": {"filter": "n_chars >= 10"},
                "sort": "index asc"},
    )
    got2 = {(r.source, r["count"]) for r in res2["buckets"].collect()}
    assert got2 == {("s1", 2), ("t9", 1)}


def test_nested_extras_grouped_by_parent(nully):
    res = json_facet(
        nully,
        {"field": "lang", "limit": 5, "sort": "index asc",
         "facet": {"srcs": {"field": "source", "missing": True,
                            "numBuckets": True}}},
    )
    assert {"srcs", "srcs.missing", "srcs.numBuckets"} <= set(res)
    miss = {r.lang: r["count"] for r in res["srcs.missing"].collect()}
    assert miss == {"en": 1, "de": 1}
    nb = {r.lang: r.numBuckets for r in res["srcs.numBuckets"].collect()}
    assert nb == {"en": 2, "de": 1}


def test_extended_stat_aggs(nully):
    res = json_facet(
        nully,
        {"field": "lang", "sort": "index asc",
         "facet": {"sq": "sumsq(n_chars)", "cv": "countvals(source)",
                   "ms": "missing(source)", "sd": "stddev(n_chars)"}},
    )
    rows = {r.lang: r for r in res["buckets"].collect()}
    # en: n_chars 10,20,5,40 -> sumsq 2125; sources s1,s1,None,t9
    assert rows["en"].sq == 2125.0
    assert rows["en"].cv == 3 and rows["en"].ms == 1
    import statistics
    assert rows["en"].sd == pytest.approx(statistics.stdev([10, 20, 5, 40]))


def test_range_subfacet_and_query_type(spark, docs, pdocs):
    from solr_spark.operators.facets import json_facet

    # range facet with a stat
    res = json_facet(docs, {
        "type": "range", "field": "n_chars", "start": 0, "end": 600,
        "gap": 200, "key": "b",
        "facet": {"avg_nc": "avg(n_chars)"},
    })
    got = res["buckets"].toPandas().set_index("b")
    n = pdocs["n_chars"]
    for lo in (0.0, 200.0, 400.0):
        sel = pdocs[(n >= lo) & (n < lo + 200) & (n >= 0) & (n < 600)]
        if len(sel):
            assert got.loc[lo, "count"] == len(sel)
            assert abs(got.loc[lo, "avg_nc"] - sel.n_chars.mean()) < 1e-9

    # query facet with a nested terms sub-facet
    res2 = json_facet(docs, {
        "type": "query", "q": "n_chars >= 300",
        "facet": {"cnt_big": "count",
                  "langs": {"type": "terms", "field": "lang", "limit": 3}},
    })
    bucket = res2["buckets"].collect()[0]
    big = pdocs[pdocs.n_chars >= 300]
    assert bucket["count"] == len(big)
    langs = res2["langs"].toPandas()
    exp = big.groupby("lang").size().sort_values(ascending=False)
    assert len(langs) == min(3, len(exp))
    assert dict(zip(langs["lang"], langs["count"])) == {
        k: int(exp[k]) for k in langs["lang"]
    }


def test_nested_exclude_tags_rebuilds_domain(spark, docs, pdocs):
    """A CHILD facet's domain:{excludeTags} must rebuild from the
    pre-filter base (Solr regenerates the domain minus the excluded tags,
    then re-applies the bucket constraint) — not silently no-op over the
    already-filtered parent domain."""
    import pytest as _pt

    from solr_spark.operators.facets import json_facet

    tagged = {"LANG": F.col("lang") == "en"}
    res = json_facet(
        docs,
        {"type": "terms", "field": "source", "limit": 3,
         "facet": {"langs": {"type": "terms", "field": "lang", "limit": 10,
                             "domain": {"excludeTags": ["LANG"]}}}},
        tagged_filters=tagged,
    )
    # parent buckets: top sources among lang=en docs
    top_sources = list(res["buckets"].toPandas()["source"])
    en = pdocs[pdocs.lang == "en"]
    exp_sources = list(en.groupby("source").size()
                       .sort_values(ascending=False).index[:3])
    # ties break by value; compare as sets of (count) winners
    assert set(top_sources) <= set(
        en.groupby("source").size().sort_values(ascending=False).index[:10]
    )
    # child counts: ALL langs within those sources (filter excluded)
    langs = res["langs"].toPandas()
    for src in top_sources:
        sub = langs[langs.source == src]
        exp = pdocs[pdocs.source == src].groupby("lang").size().to_dict()
        assert dict(zip(sub["lang"], sub["count"])) == exp
        assert len(exp) > 1  # more than just 'en' — the rebuild happened

    # excludeTags in a child without tagged_filters at this level -> error
    with _pt.raises(ValueError, match="excludeTags"):
        json_facet(docs, {"type": "terms", "field": "source",
                          "facet": {"x": {"type": "terms", "field": "lang",
                                          "domain": {"excludeTags": ["T"]}}}})

    # range facets reject missing (no missing bucket in the reference)
    with _pt.raises(ValueError, match="missing"):
        json_facet(docs, {"type": "range", "field": "n_chars",
                          "start": 0, "end": 100, "gap": 50, "missing": True})


def test_range_spine_default_and_exclude_leak(spark):
    """FacetRange defaults: full bucket spine (empty buckets, count 0) and
    a rebuilt (excludeTags) child domain that must NOT leak rows beyond
    `end` that share the trailing partial bucket's floor value."""
    from solr_spark.operators.facets import json_facet

    rows = [
        (10, "en"), (110, "en"),           # buckets 0 and 100
        (210, "en"), (220, "en"),          # bucket 200 (partial: end=250)
        (260, "fr"), (270, "fr"),          # BEYOND end — same floor bucket
    ]
    df = spark.createDataFrame(rows, ["n_chars", "lang"])

    res = json_facet(
        df,
        {"type": "range", "field": "n_chars", "start": 0, "end": 250,
         "gap": 100, "key": "bucket",
         "facet": {"langs": {"type": "terms", "field": "lang",
                             "domain": {"excludeTags": ["LANG"]}}}},
        tagged_filters={"LANG": F.col("lang") == "en"},
    )
    b = res["buckets"].toPandas().sort_values("bucket")
    # spine: ceil(250/100) = 3 buckets, all emitted
    assert list(b["bucket"]) == [0.0, 100.0, 200.0]
    assert list(b["count"]) == [1, 1, 2]
    langs = res["langs"].toPandas()
    # the rebuilt child domain must not contain the fr rows at 260/270
    assert "fr" not in set(langs["lang"])
    assert langs[langs.bucket == 200.0]["count"].sum() == 2

    # explicit mincount>0 suppresses the spine (observed buckets only)
    df2 = spark.createDataFrame([(10, "en"), (510, "en")], ["n_chars", "lang"])
    res2 = json_facet(df2, {"type": "range", "field": "n_chars",
                            "start": 0, "end": 600, "gap": 100,
                            "key": "bucket", "mincount": 1})
    assert len(res2["buckets"].toPandas()) == 2
    # default: the full 6-bucket spine
    res3 = json_facet(df2, {"type": "range", "field": "n_chars",
                            "start": 0, "end": 600, "gap": 100,
                            "key": "bucket"})
    p3 = res3["buckets"].toPandas()
    assert len(p3) == 6 and int(p3["count"].sum()) == 2


def test_facet2d_nonadditive_metric_and_nulls(spark):
    from solr_spark.operators.facets import facet2d

    # x=a: three y-buckets each avg 10 (sum of per-y avgs 30); x=b: one
    # y-bucket avg 20. Metric-sorted x must pick b (whole-bucket avg).
    rows = [("a", "y1", 10.0), ("a", "y2", 10.0), ("a", "y3", 10.0),
            ("b", "z1", 20.0)]
    df = spark.createDataFrame(rows, ["x", "y", "price"])
    out = facet2d(df, "x", "y", dim_x=1, dim_y=5,
                  metric=F.avg("price"), metric_name="avg_price").toPandas()
    assert set(out["x"]) == {"b"}

    # a frequent NULL x must not consume a dim_x slot
    rows2 = [(None, "s", 1)] * 3 + [("en", "s", 1)] * 2 + [("de", "s", 1)]
    df2 = spark.createDataFrame(rows2, ["lang", "source", "v"])
    out2 = facet2d(df2, "lang", "source", dim_x=2, dim_y=2).toPandas()
    assert set(out2["lang"]) == {"en", "de"}
