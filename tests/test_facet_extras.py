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
