"""Round-3 facet/function additions: interval facets, range `other`
buckets, ord/rord/strdist function queries, term vectors, timeseries
gap-fill. Oracle: pandas recomputation over the same parquet."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from solr_spark.operators.facets import interval_facet, range_facet_other


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def pdocs(docs):
    return docs.select("doc_id", "lang", "source", "n_chars").toPandas()


def test_interval_facet_overlap_and_bounds(docs, pdocs):
    out = interval_facet(
        docs, "n_chars", ["[*,100)", "[100,300)", "[200,400]", "(400,*)"]
    ).toPandas()
    got = dict(zip(out["interval"], out["count"]))
    n = pdocs["n_chars"]
    assert got["[*,100)"] == int((n < 100).sum())
    assert got["[100,300)"] == int(((n >= 100) & (n < 300)).sum())
    assert got["[200,400]"] == int(((n >= 200) & (n <= 400)).sum())
    assert got["(400,*)"] == int((n > 400).sum())
    # overlapping intervals double-count by design (unlike range facets)
    assert sum(got.values()) >= len(pdocs)


def test_interval_parse_rejects_garbage():
    from solr_spark.operators.facets import _parse_interval

    with pytest.raises(ValueError):
        _parse_interval("0,10")
    assert _parse_interval("(1.5, *]") == (1.5, False, None, True)


def test_range_facet_other_partitions_everything(docs, pdocs):
    out = range_facet_other(
        docs, "n_chars", start=100, end=400, gap=100
    ).toPandas()
    got = dict(zip(out["bucket"], out["count"]))
    n = pdocs["n_chars"]
    assert got["before"] == int((n < 100).sum())
    assert got["after"] == int((n >= 400).sum())
    assert got["between"] == int(((n >= 100) & (n < 400)).sum())
    # numeric buckets sum to `between`; before+after+between == all rows
    numeric = sum(v for k, v in got.items()
                  if k not in ("before", "after", "between"))
    assert numeric == got["between"]
    assert got["before"] + got["after"] + got["between"] == len(pdocs)
    assert got[str(float(100))] == int(((n >= 100) & (n < 200)).sum())


def test_range_facet_other_include_upper(docs, pdocs):
    out = range_facet_other(
        docs, "n_chars", start=100, end=400, gap=100, include="upper"
    ).toPandas()
    got = dict(zip(out["bucket"], out["count"]))
    n = pdocs["n_chars"]
    assert got["before"] == int((n <= 100).sum())
    assert got["between"] == int(((n > 100) & (n <= 400)).sum())
    # (100,200] bucket is labeled by its lower bound
    assert got[str(float(100))] == int(((n > 100) & (n <= 200)).sum())


def test_ord_rord_are_dictionary_ranks(docs, pdocs):
    from solr_spark.query.rerank import ord_func

    out = ord_func(docs, "lang", out="o")
    out = ord_func(out, "lang", reverse=True, out="r").toPandas()
    langs = sorted(pdocs["lang"].dropna().unique())
    for lang, grp in out.groupby("lang"):
        assert (grp["o"] == langs.index(lang) + 1).all()
        assert (grp["r"] == len(langs) - langs.index(lang)).all()


def test_strdist_edit_similarity(spark):
    from solr_spark.query.rerank import strdist

    df = spark.createDataFrame(
        [("kitten", "sitting"), ("abc", "abc"), ("", "")], ["a", "b"]
    ).select(strdist(F.col("a"), F.col("b")).alias("s"))
    got = [r.s for r in df.collect()]
    assert got[0] == pytest.approx(1 - 3 / 7)  # 3 edits / len("sitting")
    assert got[1] == 1.0
    assert got[2] == 1.0  # both empty -> identical


def test_term_vectors_tf_df_tfidf(spark, docs):
    from solr_spark.index.build import build_index
    from solr_spark.query.mlt import term_vectors

    idx = build_index(
        docs.withColumn("docid", F.col("doc_id").cast("string")),
        text_col="text", analyzer="simple",
    )
    tv = term_vectors(idx, ["0", "1"]).toPandas()
    assert set(tv["docid"]) <= {"0", "1"}
    assert (tv["tfidf"] == tv["tf"] / tv["df"]).all()
    # parity with the raw postings slice
    rows = idx.postings.where(F.col("docid") == "0").count()
    assert (tv["docid"] == "0").sum() == rows


def test_timeseries_gapfill_emits_empty_buckets(spark):
    from solr_spark.operators.streams import timeseries_stream

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet").where(
        (F.col("event_type") == "purchase") & (F.col("value") > 200)
    )
    out = timeseries_stream(
        e, "ts", "day", {"n": F.count("*"), "total": F.sum("value")},
        start="2024-01-01", end="2024-01-30",
    ).toPandas()
    assert len(out) == 30  # full spine, gaps included
    assert (out["n"] == 0).sum() > 0  # sf0.001 has only 4 non-empty days
    assert out.loc[out["n"] == 0, "total"].eq(0).all()
    nonzero = timeseries_stream(
        e, "ts", "day", {"n": F.count("*")}
    ).toPandas()
    assert (out["n"] > 0).sum() == len(nonzero)


def test_date_math_parser_reference_cases():
    from datetime import datetime, timezone

    from solr_spark.functions.datemath import parse_date_math

    now = datetime(2024, 1, 10, 13, 45, 30, tzinfo=timezone.utc)

    def iso(e):
        return parse_date_math(e, now).isoformat()

    assert iso("NOW/DAY") == "2024-01-10T00:00:00+00:00"
    assert iso("NOW/DAY+7DAYS") == "2024-01-17T00:00:00+00:00"
    assert iso("NOW-1MONTH/MONTH") == "2023-12-01T00:00:00+00:00"
    # month arithmetic clamps like java.time plusMonths
    assert iso("2024-03-31T00:00:00Z-1MONTH") == "2024-02-29T00:00:00+00:00"
    assert iso("NOW/YEAR+1YEAR-1MILLI") == "2024-12-31T23:59:59.999000+00:00"
    import pytest as _pytest
    for bad in ("NOW/3DAYS", "NOW+DAYS", "NOW/DAY junk", "FOO", "NOW+1FORTNIGHT"):
        with _pytest.raises(ValueError):
            parse_date_math(bad, now)
    with _pytest.raises(ValueError):
        parse_date_math("NOW/DAY")  # NOW needs an explicit anchor


def test_delete_by_query_shrinks_stats(spark, docs):
    from solr_spark.index.build import build_index, delete_by_query
    from solr_spark.query.bm25 import bm25_topk

    idx = build_index(
        docs.withColumn("docid", F.col("doc_id").cast("string")),
        text_col="text", analyzer="simple",
    )
    n0, _ = idx.corpus_stats()
    deleted = {r.docid for r in idx.docs.where(F.col("lang") == "de")
               .select("docid").collect()}
    live = delete_by_query(idx, F.col("lang") == "de")
    n1, _ = live.corpus_stats()
    assert n1 == n0 - len(deleted) and deleted
    hits = {r.docid for r in bm25_topk(live, "data", k=10**6).collect()}
    assert not (hits & deleted)


def test_switch_query_routing():
    from solr_spark.query.boolq import switch_query

    cases = {"day": "q_day", "": "q_blank"}
    assert switch_query("day", cases) == "q_day"
    assert switch_query("  day ", cases) == "q_day"
    assert switch_query("", cases, default="d") == "q_blank"
    assert switch_query("night", cases, default="d") == "d"
    assert switch_query(None, cases, default="d") == "d"
    with pytest.raises(ValueError):
        switch_query("night", cases)


def test_multiselect_exclude_tags(spark, docs, pdocs):
    from solr_spark.operators.facets import json_facet

    tagged = {"LANG": F.col("lang") == "en", "NCH": F.col("n_chars") >= 300}
    # excluding LANG: counts per lang among n_chars>=300 docs
    out = json_facet(
        docs, {"type": "terms", "field": "lang", "limit": 100,
               "domain": {"excludeTags": ["LANG"]}},
        tagged_filters=tagged,
    )["buckets"].toPandas()
    exp = (pdocs[pdocs.n_chars >= 300].groupby("lang").size())
    assert dict(zip(out["lang"], out["count"])) == exp.to_dict()

    # no exclusion: ALL tagged filters apply
    out2 = json_facet(
        docs, {"type": "terms", "field": "lang", "limit": 100},
        tagged_filters=tagged,
    )["buckets"].toPandas()
    n_en = int(((pdocs.lang == "en") & (pdocs.n_chars >= 300)).sum())
    assert dict(zip(out2["lang"], out2["count"])) == {"en": n_en}

    # excluding BOTH tags: the unfiltered facet
    out3 = json_facet(
        docs, {"type": "terms", "field": "lang", "limit": 100,
               "domain": {"excludeTags": ["LANG", "NCH"]}},
        tagged_filters=tagged,
    )["buckets"].toPandas()
    assert dict(zip(out3["lang"], out3["count"])) == pdocs.groupby("lang").size().to_dict()


def test_block_facet_domains(spark):
    from solr_spark.operators.facets import json_facet

    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    po = orders.select("o_orderkey", "o_orderstatus").toPandas()
    pl = li.select("l_orderkey", "l_returnflag").toPandas()

    # parents -> children
    out = json_facet(
        orders.where(F.col("o_orderstatus") == "F"),
        {"type": "terms", "field": "l_returnflag", "limit": 10,
         "domain": {"blockChildren": (li, "o_orderkey", "l_orderkey")}},
    )["buckets"].toPandas()
    keys = set(po[po.o_orderstatus == "F"].o_orderkey)
    exp = pl[pl.l_orderkey.isin(keys)].groupby("l_returnflag").size().to_dict()
    assert dict(zip(out["l_returnflag"], out["count"])) == exp

    # children -> parents (blockParent)
    out2 = json_facet(
        li.where(F.col("l_returnflag") == "R"),
        {"type": "terms", "field": "o_orderstatus", "limit": 10,
         "domain": {"blockParent": (orders, "l_orderkey", "o_orderkey")}},
    )["buckets"].toPandas()
    pkeys = set(pl[pl.l_returnflag == "R"].l_orderkey)
    exp2 = po[po.o_orderkey.isin(pkeys)].groupby("o_orderstatus").size().to_dict()
    assert dict(zip(out2["o_orderstatus"], out2["count"])) == exp2


def test_date_range_facet_calendar_gap_and_empties(spark):
    from solr_spark.operators.facets import date_range_facet

    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    pdf = orders.select("o_orderdate").toPandas()

    out = date_range_facet(
        orders, "o_orderdate", "1995-01-01T00:00:00Z",
        "1996-01-01T00:00:00Z", "+1MONTH",
    ).toPandas()
    assert list(out["bucket"]) == [f"1995-{m:02d}-01" for m in range(1, 13)]
    months = pdf["o_orderdate"].dt.to_period("M").astype(str)
    exp = months[months.str.startswith("1995")].value_counts()
    got = dict(zip(out["bucket"], out["count"]))
    for m in range(1, 13):
        assert got[f"1995-{m:02d}-01"] == int(exp.get(f"1995-{m:02d}", 0))

    # a range before the data: all-empty buckets still emitted
    empty = date_range_facet(
        orders, "o_orderdate", "1990-01-01T00:00:00Z",
        "1990-04-01T00:00:00Z", "+1MONTH",
    ).toPandas()
    assert list(empty["count"]) == [0, 0, 0]
    # mincount prunes them
    pruned = date_range_facet(
        orders, "o_orderdate", "1990-01-01T00:00:00Z",
        "1990-04-01T00:00:00Z", "+1MONTH", mincount=1,
    ).toPandas()
    assert len(pruned) == 0


def test_recip_ms_freshness(spark):
    from solr_spark.query.rerank import ms_func, recip_func

    df = spark.createDataFrame(
        [("2001-08-31 00:00:00",), ("2000-09-01 00:00:00",)], ["d"]
    ).select(F.col("d").cast("timestamp").alias("d"))
    out = df.select(
        ms_func("2001-09-01", F.col("d")).alias("ms"),
        recip_func(ms_func("2001-09-01", F.col("d")), 3.16e-11, 1.0, 1.0).alias("r"),
    ).collect()
    assert out[0]["ms"] == 86400000
    assert abs(out[0]["r"] - 1.0 / (3.16e-11 * 86400000 + 1.0)) < 1e-12
    # one-year-old doc decays to ~0.5 with the canonical 3.16e-11 slope
    assert 0.45 < out[1]["r"] < 0.55


def test_delete_by_query_keeps_null_predicate_docs(spark):
    """deleteByQuery('lang:de') must KEEP docs whose lang is NULL —
    ~(NULL == 'de') is NULL, which where() would silently drop."""
    from solr_spark.index.build import build_index, delete_by_query

    df = spark.createDataFrame(
        [("1", "aa bb", "de"), ("2", "bb cc", "en"), ("3", "cc dd", None)],
        "docid string, text string, lang string",
    )
    idx = build_index(df, text_col="text", analyzer="simple")
    live = delete_by_query(idx, F.col("lang") == "de")
    assert {r.docid for r in live.docs.collect()} == {"2", "3"}
    assert {r.docid for r in live.doclens.collect()} == {"2", "3"}


def test_datemath_leap_year_clamp():
    from solr_spark.functions.datemath import parse_date_math

    assert parse_date_math("2024-02-29T00:00:00Z+1YEAR").isoformat() \
        == "2025-02-28T00:00:00+00:00"
    assert parse_date_math("2024-02-29T00:00:00Z-1YEAR").isoformat() \
        == "2023-02-28T00:00:00+00:00"
    assert parse_date_math("2024-02-29T00:00:00Z+4YEARS").isoformat() \
        == "2028-02-29T00:00:00+00:00"


def test_polyfit_ignores_incomplete_pairs(spark):
    from solr_spark.functions.mathstream import polyfit

    rows = [(float(i), 2.0 * i + 1.0) for i in range(10)]
    rows += [(99.0, None), (100.0, None)]  # x present, y null
    df = spark.createDataFrame(rows, "x double, y double")
    out = polyfit(df, "x", "y", degree=1).collect()[0]
    assert out.coef_0 == pytest.approx(1.0, abs=1e-9)
    assert out.coef_1 == pytest.approx(2.0, abs=1e-9)


def test_date_range_facet_subday_labels_and_bad_gap(spark):
    from solr_spark.operators.facets import date_range_facet

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    out = date_range_facet(
        events, "ts", "2024-01-01T00:00:00Z", "2024-01-02T00:00:00Z", "+6HOURS"
    ).toPandas()
    assert list(out["bucket"]) == [
        "2024-01-01T00:00:00Z", "2024-01-01T06:00:00Z",
        "2024-01-01T12:00:00Z", "2024-01-01T18:00:00Z",
    ]
    assert int(out["count"].sum()) > 0
    with pytest.raises(ValueError, match="does not advance"):
        date_range_facet(events, "ts", "2024-01-01T00:00:00Z",
                         "2024-01-02T00:00:00Z", "/DAY")


def test_term_vectors_topn_is_per_doc(spark, docs):
    from solr_spark.index.build import build_index
    from solr_spark.query.mlt import term_vectors

    idx = build_index(
        docs.withColumn("docid", F.col("doc_id").cast("string")),
        text_col="text", analyzer="simple",
    )
    ids = ["0", "1", "2"]
    out = term_vectors(idx, ids, top_n=5).toPandas()
    per_doc = out.groupby("docid").size().to_dict()
    assert set(per_doc) == set(ids)          # every requested doc present
    assert all(v <= 5 for v in per_doc.values())
    assert all(v >= 1 for v in per_doc.values())


def test_timeseries_quarter_gapfill(spark):
    from solr_spark.operators.streams import timeseries_stream

    df = spark.createDataFrame(
        [("2024-01-15",), ("2024-07-01",)], ["d"]
    ).select(F.col("d").cast("timestamp").alias("ts"))
    out = timeseries_stream(
        df, "ts", "quarter", {"count": F.count("*")},
        start="2024-01-01", end="2024-12-31",
    ).toPandas()
    assert len(out) == 4                      # full quarter spine
    assert list(out["count"]) == [1, 0, 1, 0]


def test_facet2d_metric_sorted_both_levels(docs, pdocs):
    from solr_spark.operators.facets import facet2d

    out = facet2d(docs, "lang", "source", dim_x=3, dim_y=2).toPandas()
    xtop = list(
        pdocs.groupby("lang").size()
        .reset_index(name="n")
        .sort_values(["n", "lang"], ascending=[False, True])["lang"][:3]
    )
    assert sorted(out["lang"].unique()) == sorted(xtop)
    for lang in xtop:
        sub = out[out["lang"] == lang]
        assert len(sub) <= 2
        exp = (
            pdocs[pdocs.lang == lang].groupby("source").size()
            .reset_index(name="n")
            .sort_values(["n", "source"], ascending=[False, True])[:2]
        )
        assert list(sub["source"]) == list(exp["source"])
        assert list(sub["count"]) == list(exp["n"])


def test_incremental_dedup_matches_pairwise_lsh(docs):
    from solr_spark.functions.dedup import (
        incremental_lsh_dedup,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    sigs = minhash_signatures(docs, "text", "doc_id", k=32).cache()
    new = sigs.where(F.col("id") % 10 == 0)
    corpus = sigs.where(F.col("id") % 10 != 0)
    inc = incremental_lsh_dedup(new, corpus).toPandas()

    # oracle: the full pairwise LSH restricted to (new, corpus) pairs
    pairs = minhash_lsh_pairs(sigs).toPandas()
    cross = {}
    for _, r in pairs.iterrows():
        for a, b in ((r.id_a, r.id_b), (r.id_b, r.id_a)):
            if a % 10 == 0 and b % 10 != 0:
                cross[a] = cross.get(a, 0) + 1
    got = dict(zip(inc["id"], inc["n_dup_of"]))
    assert got == cross

    # a brand-new unique doc collides with nothing
    solo = docs.sparkSession.createDataFrame(
        [(999983, "zxq wvut unique never seen shingle text qqq zz yy xx ww vv")],
        ["doc_id", "text"],
    )
    s2 = minhash_signatures(solo, "text", "doc_id", k=32)
    assert incremental_lsh_dedup(s2, corpus).count() == 0
