"""Physical plan shape assertions (.explain-driven).

Correctness tests prove the WHAT; these prove the HOW holds at scale: the
term filter reaches the postings scan (partition/row-group pruning), tiny
weight tables broadcast instead of shuffling, and top-k compiles to
TakeOrderedAndProject (per-partition heap + driver merge — Solr's two-phase
distributed top-k, built in).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.index.build import build_index
from solr_spark.query.bm25 import bm25_topk


@pytest.fixture(scope="module")
def idx_parquet(spark, tmp_path_factory):
    """Index whose postings are PERSISTED AS PARQUET so pushdown is visible
    in the scan node (in-memory frames don't show PushedFilters)."""
    d = str(tmp_path_factory.mktemp("plans") / "postings")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = build_index(docs, id_col="doc_id", text_col="text", analyzer="simple")
    idx.postings.write.parquet(d)
    return spark.read.parquet(d)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        spark_explain_mode(df.sparkSession)
    )


def spark_explain_mode(spark):
    jvm = spark.sparkContext._jvm
    return jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")


def test_term_filter_pushdown(idx_parquet):
    q = idx_parquet.where(F.col("term").isin("spark", "join")).select("docid", "tf")
    plan = _formatted(q)
    assert "PushedFilters" in plan
    assert "In(term" in plan  # the IN filter reached the parquet scan
    # Column pruning: content-bearing columns not read
    assert "ReadSchema" in plan


def test_bm25_plan_broadcasts_and_takeordered(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = build_index(docs, id_col="doc_id", text_col="text", analyzer="simple")
    idx.postings = idx.postings.persist()
    idx.doclens = idx.doclens.persist()
    top = bm25_topk(idx, ["spark", "join"], k=10, quantize_norms=False)
    plan = _plan(top)
    assert "TakeOrderedAndProject" in plan  # two-phase top-k merge
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the per-term idf weights ride a map literal in the projection, not a
    # broadcast-joined single-use DataFrame: exactly ONE join (doclens)
    assert plan.count("Join") == 1, plan


def test_facet_partial_final_aggregate(spark):
    from solr_spark.operators.facets import terms_facet

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(terms_facet(docs, "lang", limit=5))
    # partial (map-side combine) + final hash aggregate
    assert plan.count("HashAggregate") >= 2


def test_collapse_single_shuffle(spark):
    from solr_spark.operators.collapse import collapse

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = collapse(
        docs.select("source", "doc_id", "n_chars"),
        "source",
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
    )
    plan = _plan(out)
    # one shuffle for the window partitioning, and a WindowGroupLimit /
    # rank-pushdown should bound the sort (Spark 3.5+ optimization)
    assert plan.count("Exchange") == 1
    assert "WindowGroupLimit" in plan or "Window" in plan


def test_collapse_salted_two_phase(spark):
    """salt=N compiles to exactly two bounded phases: a (field, salt)
    window then a field window, each with the rank-limit pushed down
    (WindowGroupLimit) so no full-group sort materializes anywhere."""
    from solr_spark.operators.collapse import collapse

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = collapse(
        docs.select("lang", "doc_id", "n_chars"),
        "lang",
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        salt=8,
    )
    plan = _plan(out)
    assert plan.count("Exchange") == 2
    assert plan.count("WindowGroupLimit") >= 2


def test_broadcast_dim_join(spark):
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    j = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).groupBy("n_name").count()
    assert "BroadcastHashJoin" in _plan(j)


def test_phrase_plan_pushdown_and_no_generate(spark, tmp_path_factory):
    """Phrase over parquet-backed postings: each term scan gets a pushed
    term filter; positions stay packed (no Generate over positions); the
    adjacency check is a join condition (HOF lambdafunction)."""
    from solr_spark.index.build import IndexTables
    from solr_spark.query.phrase import phrase_match_df

    d = str(tmp_path_factory.mktemp("pplans") / "postings")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = build_index(docs, id_col="doc_id", text_col="text", analyzer="simple")
    idx.postings.write.parquet(d)
    pidx = IndexTables(
        postings=spark.read.parquet(d), doclens=idx.doclens, docs=idx.docs,
        analyzer="simple", has_positions=True,
    )
    q = phrase_match_df(pidx, ["spark", "join"])
    plan = _formatted(q)
    assert "PushedFilters" in plan and "EqualTo(term," in plan
    assert "lambdafunction" in _plan(q)
    assert "Generate" not in _plan(q)


def test_simhash_single_shuffle_no_bit_explosion(spark):
    from solr_spark.functions.dedup import simhash

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(simhash(docs, "text", "doc_id"))
    # token explode is the only Generate; the 60 bit sums are aggregate
    # columns, so exactly two shuffles exist (id,term combine + id final)
    assert "sequence(0, 59" not in plan
    assert plan.count("Generate") == 1


def test_significant_terms_single_postings_aggregate(spark, tmp_path_factory):
    """significant_terms must reuse term_stats, not re-aggregate all
    postings: its plan contains exactly one groupBy over the full postings
    (the fg aggregate) plus the persisted term_stats scan."""
    from solr_spark import entry_queries as eq

    df = eq.CATALOG["significant_terms_spark"].fn(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "InMemoryTableScan" in plan  # persisted term_stats reused


def test_fuzzy_probe_pruned_and_capped(spark, tmp_path_factory):
    """The fuzzy dictionary probe is never a full-DP full scan: the length
    band filters before levenshtein and the cap compiles to
    TakeOrderedAndProject (per-partition heap, <= max_expansions rows to
    the driver)."""
    from solr_spark.query.expand import fuzzy_candidates_df

    d = str(tmp_path_factory.mktemp("fzplans") / "tstats")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = build_index(docs, id_col="doc_id", text_col="text", analyzer="simple")
    idx.term_stats().write.parquet(d)
    ts = spark.read.parquet(d)
    q = fuzzy_candidates_df(ts, "tabel", 2)
    plan = _plan(q)
    assert "TakeOrderedAndProject" in plan  # expansion cap
    assert "length(term" in plan  # band prune precedes the edit distance
    # thresholded prefilter at 2x the edit budget (Damerau superset bound)
    assert "levenshtein" in plan and "Some(4)" in plan
    # transpositions=False keeps the pure-JVM single-threshold path
    plain = _plan(fuzzy_candidates_df(ts, "tabel", 2, transpositions=False))
    assert "Some(2)" in plain and "ArrowEvalPython" not in plain


def test_prefix_stream_pushdown_no_expansion(idx_parquet):
    """Prefix clauses scan postings with a pushed StartsWith filter and
    reduce to a docid set — no term list, no driver collect."""
    from solr_spark.query.expand import prefix_docids

    q = prefix_docids(idx_parquet, "tabl")
    plan = _formatted(q)
    assert "StartsWith" in plan and "PushedFilters" in plan


def test_geofilt_bbox_pushdown(spark, tmp_path_factory):
    """geofilt's phase-1 bounding box must reach the parquet scan as plain
    range predicates (GreaterThanOrEqual/LessThanOrEqual on lat/lon) so a
    spatially-partitioned layout prunes row groups; the haversine runs only
    above the pruned scan."""
    from solr_spark.functions.spatial import geofilt

    d = str(tmp_path_factory.mktemp("geo") / "pts")
    pts = spark.range(0, 1000).select(
        F.col("id"),
        ((F.col("id") * 9973 % 18000) / 100.0 - 90.0).alias("lat"),
        ((F.col("id") * 7919 % 36000) / 100.0 - 180.0).alias("lon"),
    )
    pts.write.parquet(d)
    out = geofilt(spark.read.parquet(d), 40.7, -74.0, 500.0)
    plan = _formatted(out)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(lat" in plan and "LessThanOrEqual(lat" in plan
    assert "GreaterThanOrEqual(lon" in plan and "LessThanOrEqual(lon" in plan
    # the exact distance predicate stays above the scan (not pushable)
    ids = sorted(r.id for r in out.collect())
    # cross-check against brute-force haversine on the same rows
    import math

    def hav(lat, lon):
        r = 6371.0087714
        a = (math.sin(math.radians(40.7 - lat) / 2) ** 2
             + math.cos(math.radians(lat)) * math.cos(math.radians(40.7))
             * math.sin(math.radians(-74.0 - lon) / 2) ** 2)
        return 2 * r * math.asin(min(1.0, math.sqrt(a)))

    want = sorted(
        i for i in range(1000)
        if hav((i * 9973 % 18000) / 100.0 - 90.0,
               (i * 7919 % 36000) / 100.0 - 180.0) <= 500.0
    )
    assert ids == want


def test_multiselect_facet_pushes_tagged_filters(spark):
    """excludeTags faceting: the NON-excluded tagged filter must reach the
    parquet scan as a pushed filter, and the facet is one hash aggregate."""
    from solr_spark.operators.facets import json_facet

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tagged = {"LANG": F.col("lang") == "en", "NCH": F.col("n_chars") >= 300}
    out = json_facet(
        docs, {"type": "terms", "field": "lang", "limit": 10,
               "domain": {"excludeTags": ["LANG"]}},
        tagged_filters=tagged,
    )["buckets"]
    plan = _formatted(out)
    assert "PushedFilters" in plan and "GreaterThanOrEqual(n_chars,300)" in plan
    # the excluded filter must NOT appear anywhere in the plan
    assert "lang,en" not in plan.replace(" ", "")
    assert plan.count("HashAggregate") >= 2  # partial + final of ONE groupBy


def test_freshness_boost_single_scan_takeordered(spark):
    from solr_spark.query.rerank import ms_func, recip_func

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    age = ms_func("2001-09-01", F.col("o_orderdate"))
    score = F.col("o_totalprice") * recip_func(age, 3.16e-11, 1.0, 1.0)
    top = orders.select("o_orderkey", score.alias("s")).orderBy(
        F.col("s").desc()).limit(10)
    plan = _plan(top)
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Scan parquet") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # column pruning: only the two referenced columns read
    fmt = _formatted(top)
    assert "o_comment" not in fmt


def test_date_range_facet_one_scan_no_python(spark):
    from solr_spark.operators.facets import date_range_facet

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    out = date_range_facet(orders, "o_orderdate", "1995-01-01T00:00:00Z",
                           "1996-01-01T00:00:00Z", "+1MONTH")
    plan = _plan(out)
    assert plan.count("Scan parquet") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunking_plan_no_shuffle(spark):
    """chunk_tokens must be a narrow map + one Generate — NO Exchange."""
    from solr_spark.functions.textstats import chunk_tokens

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = chunk_tokens(docs, "text", "doc_id", size=64, overlap=16)
    plan = _plan(out)
    assert "Exchange" not in plan
    assert plan.count("Generate") == 1          # the single posexplode


def test_bq_coarse_scan_prunes_float_column(spark, tmp_path_factory):
    """With precomputed sign words stored alongside the floats, the coarse
    Hamming phase's parquet scan must NOT read the embedding column (the
    32x IO saving is the point of binary quantization)."""
    from solr_spark.functions.ann import hamming_words, sign_bits

    d = str(tmp_path_factory.mktemp("bq") / "vecs")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.withColumn("bits", sign_bits(F.col("embedding"), 64)).write.parquet(d)
    stored = spark.read.parquet(d)

    qwords = F.array(F.lit(123).cast("long"), F.lit(456).cast("long"))
    coarse = (
        stored.select("vec_id", hamming_words(F.col("bits"), qwords).alias("h"))
        .orderBy("h", "vec_id").limit(100)
    )
    plan = _formatted(coarse)
    assert "ReadSchema" in plan
    scan_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_schema and all("embedding" not in l for l in scan_schema)
    assert "TakeOrderedAndProject" in _plan(coarse)


def test_facet2d_broadcast_semijoin(spark):
    from solr_spark.operators.facets import facet2d

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = facet2d(docs, "lang", "source", dim_x=3, dim_y=2)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_bq_rerank_cosine_above_join(spark):
    """The exact-cosine projection must sit ABOVE the rerank join — only
    the coarse survivors' float vectors get dotted, never the full table."""
    from solr_spark.functions.ann import bq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(v) for v in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    out = bq_topk(emb.where(F.col("vec_id") != 0), qv, k=10, rerank=100)
    plan = _plan(out)
    ix_join = plan.find("BroadcastHashJoin")
    ix_cos = plan.find("aggregate(zip_with")
    assert 0 <= ix_cos < ix_join


def test_fuzzy_damerau_probe_plan(spark):
    """The Damerau probe's plan: the length-band + thresholded-Levenshtein
    prefilter sits BELOW a single ArrowEvalPython stage (exact Damerau runs
    once, only on JVM-pruned survivors), capped by TakeOrderedAndProject."""
    from solr_spark.query.expand import fuzzy_candidates_df

    stats = spark.createDataFrame(
        [("spark", 10), ("join", 5)], "term string, df long")
    plan = fuzzy_candidates_df(
        stats, "sprak", 1
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "levenshtein" in plan and "length" in plan
    assert "TakeOrderedAndProject" in plan
    # prefilter below the Python stage: the JVM filter line appears after
    # (deeper than) the ArrowEvalPython line in the tree dump
    assert plan.index("ArrowEvalPython") < plan.index("levenshtein")


def test_ks_mannwhitney_windows_are_bucket_partitioned(spark):
    """ks/mannWhitney rank machinery: the fact table collapses to a
    distinct-value dictionary (one groupBy) and every window over it is
    PARTITIONED by the prefix-sum range bucket; the only unpartitioned
    window is distributed_prefix_sum's <= n_buckets totals frame. The old
    shape (an unpartitioned windowspecdefinition ordered directly on v)
    must not reappear."""
    from solr_spark.functions.mathstream import (
        _ecdf_gap_frame,
        _midrank_sum_frame,
    )

    df = spark.createDataFrame(
        [(float(i % 37), "a" if i % 3 else "b") for i in range(500)],
        "v double, g string",
    )
    for frame in (
        _ecdf_gap_frame(df, "v", "g", "a", "b"),
        _midrank_sum_frame(df, "v", "g", "a", "b"),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        # full-data windows keyed on the bucket -> parallel across buckets
        assert "hashpartitioning(_psum_bucket" in plan
        # an unpartitioned window whose FIRST spec column is the value
        # column would be the old single-partition ECDF/rank funnel
        assert "windowspecdefinition(v#" not in plan
        assert "BatchEvalPython" not in plan


def test_ranking_and_convolve_never_funnel(spark):
    """natural_ranking and convolve run their running sums through the
    bucket-parallel prefix sum: windows over the dictionary are partitioned
    by the range bucket, no unpartitioned window keyed on the value column,
    and no Python workers anywhere in either plan."""
    from solr_spark.functions.mathstream import convolve, natural_ranking

    df = spark.createDataFrame(
        [(i, float(i % 23)) for i in range(400)], "k int, v double"
    )
    ranked = natural_ranking(df, "v", keys=["k"])
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_psum_bucket" in plan
    assert "windowspecdefinition(_v#" not in plan
    assert "BatchEvalPython" not in plan

    series = spark.createDataFrame(
        [(float(i), float((i * 7) % 11)) for i in range(64)],
        "x double, y double",
    )
    conv = convolve(series, "x", "y", [0.25, 0.5, 0.25])
    plan = conv._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_psum_bucket" in plan
    assert "BatchEvalPython" not in plan
    # the kernel side is tiny and must broadcast, not shuffle
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_outliers_filter_is_codegen_scan_side(spark):
    """outliers_normal: the CDF threshold test is pure JVM expression work
    over a broadcast one-row stats frame — no Python, no sort, no
    unpartitioned window."""
    from solr_spark.functions.mathstream import outliers_normal

    df = spark.createDataFrame(
        [(i, float(50 + (i * 13) % 97)) for i in range(300)],
        "k int, v double",
    )
    out = outliers_normal(df, "v", 0.05, 0.95)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "windowspecdefinition" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_perplexity_and_keep_best_never_funnel(spark):
    """unigram_perplexity: two hash aggregations + a term-keyed join, no
    Python, no window, no global sort of the fact frame. keep_best_canonical:
    join + min-struct groupBy + broadcast winner join — no window."""
    from solr_spark.functions.curation import unigram_perplexity
    from solr_spark.functions.dedup import keep_best_canonical

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta tok{i % 7}") for i in range(200)],
        "doc_id int, text string",
    )
    ppl = unigram_perplexity(docs, "text", "doc_id")
    plan = ppl._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "windowspecdefinition" not in plan
    assert "CartesianProduct" not in plan

    clusters = spark.createDataFrame(
        [(i, i % 11) for i in range(200)], "node int, cluster int"
    )
    scores = spark.createDataFrame(
        [(i, float(i % 17)) for i in range(200)], "node int, score double"
    )
    kb = keep_best_canonical(clusters, scores, "node", "score")
    plan = kb._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "windowspecdefinition" not in plan
    assert "BroadcastExchange" in plan


def test_perplexity_persist_tf_single_scan(spark, tmp_path_factory):
    """unigram_perplexity's static plan re-reads the corpus per branch
    (model fit / vocab total / scoring); AQE exchange reuse collapses that
    at runtime. persist_tf=True materializes the (doc, term) tf frame
    once, so the plan holds NO file scan at all (ExistingRDD reads of the
    checkpoint) regardless of AQE — and the values are identical."""
    from solr_spark.functions.curation import unigram_perplexity

    d = str(tmp_path_factory.mktemp("ppl") / "docs")
    spark.createDataFrame(
        [(i, f"alpha beta gamma delta tok{i % 7} tok{i % 3}")
         for i in range(100)],
        "doc_id int, text string",
    ).write.parquet(d)
    docs = spark.read.parquet(d)

    lazy = unigram_perplexity(docs, "text", "doc_id")
    got2 = {r.id: (r.n_tokens, round(r.perplexity, 9))
            for r in lazy.collect()}
    fin = lazy._jdf.queryExecution().executedPlan().toString()
    assert fin.count("ReusedExchange") >= 1  # tf shuffle built once

    onescan = unigram_perplexity(docs, "text", "doc_id", persist_tf=True)
    plan1 = onescan._jdf.queryExecution().executedPlan().toString()
    assert plan1.count("Scan parquet") == 0
    assert "ExistingRDD" in plan1

    got1 = {r.id: (r.n_tokens, round(r.perplexity, 9))
            for r in onescan.collect()}
    assert got1 == got2
