"""igain / textLogit / relatedness / uniqueBlock semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from solr_spark.functions.classify import (
    igain_terms,
    text_logit_predict,
    text_logit_train,
)
from solr_spark.operators.facets import relatedness_facet, unique_block_agg


@pytest.fixture(scope="module")
def toy(spark):
    """40 docs: positives always contain 'alpha', negatives 'beta'; 'noise'
    appears everywhere (zero information)."""
    rows = []
    for i in range(40):
        pos = i < 20
        terms = ["noise", "alpha" if pos else "beta"]
        for t in terms:
            rows.append((i, t, pos))
    postings = spark.createDataFrame(
        [(t, i) for i, t, _ in rows], "term string, docid long"
    )
    labels = spark.createDataFrame(
        [(i, 1 if i < 20 else 0) for i in range(40)], "docid long, label int"
    )
    return postings, labels


def test_igain_perfect_separator_wins(toy):
    postings, labels = toy
    out = {r.term: r.score for r in igain_terms(postings, labels, n_terms=3).collect()}
    # alpha and beta fully determine the label; noise carries ~0 gain.
    assert out["alpha"] > out["noise"] and out["beta"] > out["noise"]
    assert abs(out["noise"]) < 1e-9
    # alpha's gain equals the reference formula by hand:
    # H(0.5) - (20/40)*H(20/20=1) - (20/40)*H((20-20)/(40-20+1))
    assert abs(out["alpha"] - math.log(2)) < 1e-9


def test_text_logit_learns_separable(toy):
    postings, labels = toy
    w = text_logit_train(postings, labels, ["alpha", "beta", "noise"],
                         iterations=50, learning_rate=2.0)
    assert w["alpha"] > 0 > w["beta"]
    preds = {
        int(r.docid): float(r.prob)
        for r in text_logit_predict(postings, w).collect()
    }
    acc = sum(
        1 for d, p in preds.items() if (p > 0.5) == (d < 20)
    ) / len(preds)
    assert acc == 1.0


def test_relatedness_reference_math(spark):
    """relatedness must equal the hand-computed z+5-sigmoid reference value
    (RelatednessAgg.java:696-725)."""
    rows = [(i, "hot" if i < 30 else "cold", i % 3 == 0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, bucket string, fg boolean")
    out = {
        r.value: (r.relatedness, r.foreground_popularity, r.background_popularity)
        for r in relatedness_facet(df, "bucket", F.col("fg")).collect()
    }

    def ref(fg_count, fg_size, bg_count, bg_size):
        bg_prob = bg_count / bg_size
        denom = math.sqrt(fg_size * bg_prob * (1 - bg_prob)) or 1e-10
        z = (fg_count - fg_size * bg_prob) / denom
        sig = lambda x, o, s: (x + o) / (s + abs(x + o))  # noqa: E731
        rel = 0.2 * (sig(z, -80, 50) + sig(z, -30, 30) + sig(z, 0, 30)
                     + sig(z, 30, 30) + sig(z, 80, 50))
        return round(rel * 1e5) / 1e5

    fg_size = sum(1 for i in range(100) if i % 3 == 0)
    hot_fg = sum(1 for i in range(30) if i % 3 == 0)
    assert out["hot"][0] == pytest.approx(ref(hot_fg, fg_size, 30, 100), abs=1e-9)
    assert out["hot"][1] == pytest.approx(round(hot_fg * 1e5 / 100) / 1e5)


def test_unique_block(spark):
    rows = [(1, "a"), (1, "a"), (2, "a"), (3, "b"), (3, "b")]
    df = spark.createDataFrame(rows, "parent long, flag string")
    out = {r.flag: r.unique_block
           for r in unique_block_agg(df, "parent", by="flag").collect()}
    assert out == {"a": 2, "b": 1}


def test_predict_covers_featureless_docs(spark, toy):
    postings, labels = toy
    w = text_logit_train(postings, labels, ["alpha"], iterations=20,
                         learning_rate=2.0)
    # doc universe includes docs with no feature term (the negatives)
    preds = {int(r.docid): float(r.prob)
             for r in text_logit_predict(postings, w, docs=labels).collect()}
    assert len(preds) == 40  # every doc predicted, not just alpha-matching
    import math
    b = w["_intercept"]
    for d in range(20, 40):
        assert abs(preds[d] - 1.0 / (1.0 + math.exp(-b))) < 1e-9


def test_hist_degenerate_range(spark):
    from solr_spark.functions.mathstream import hist

    df = spark.createDataFrame([(5.0,)] * 7, "x double")
    out = hist(df, "x", 10).collect()
    assert len(out) == 1 and out[0].bin == 0 and out[0]["count"] == 7


def test_hist_empty_input_returns_empty(spark):
    from solr_spark.functions.mathstream import hist

    df = spark.createDataFrame([], "x double")
    out = hist(df, "x", 10).collect()
    assert out == []
    # all-null column behaves the same
    df2 = spark.createDataFrame([(None,), (None,)], "x double")
    assert hist(df2, "x", 5).collect() == []


def test_moving_mad_and_spearman(spark):
    """movingMAD hand value (reference: MAD around the WINDOW MEAN) and
    Spearman with ties vs a hand-computed fractional-rank correlation."""
    from solr_spark.functions.mathstream import moving_mad, spearman_corr

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([1.0, 5.0, 3.0, 7.0])], "t long, x double")
    got = {r.t: r.moving_mad for r in moving_mad(df, "x", "t", window=3).collect()}
    assert got[0] is None and got[1] is None       # frame shorter than window
    # window [1,5,3]: mean 3, MAD = (2+2+0)/3
    assert abs(got[2] - 4.0 / 3.0) < 1e-12
    # window [5,3,7]: mean 5, MAD = (0+2+2)/3
    assert abs(got[3] - 4.0 / 3.0) < 1e-12

    # monotone -> spearman exactly 1 even though pearson < 1
    mono = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 100.0), (3.0, 101.0), (4.0, 5000.0)], "a double, b double")
    assert abs(spearman_corr(mono, "a", "b").first()["spearman"] - 1.0) < 1e-12
    # ties: a=[1,1,2], ranks a -> [1.5,1.5,3]; b=[4,5,6] ranks [1,2,3]
    # pearson([1.5,1.5,3],[1,2,3]) = (by hand) sqrt(3)/2
    import math
    ties = spark.createDataFrame(
        [(1.0, 4.0), (1.0, 5.0), (2.0, 6.0)], "a double, b double")
    got_s = spearman_corr(ties, "a", "b").first()["spearman"]
    assert abs(got_s - math.sqrt(3) / 2) < 1e-12


def test_corr_significance_pvalue(spark):
    """p-value parity with the textbook t transform: r=0.9, n=5 ->
    t = 0.9*sqrt(3/0.19), p = 2*sf(t, 3) ~= 0.03739 (commons-math
    PearsonsCorrelation.getCorrelationPValues reference value)."""
    from solr_spark.functions.mathstream import corr_significance, student_t_sf

    # construct exact r=0.9? easier: known small sample, compare against the
    # transform applied to the SAME r the aggregate computes
    rows = [(1.0, 2.0), (2.0, 1.5), (3.0, 3.5), (4.0, 3.9), (5.0, 5.2)]
    df = spark.createDataFrame(rows, "a double, b double")
    got = corr_significance(df, "a", "b").first()
    r, n, p = got["corr"], got["n"], got["p_value"]
    t = abs(r) * ((n - 2) / (1 - r * r)) ** 0.5
    assert abs(p - 2 * student_t_sf(t, n - 2)) < 1e-15
    assert 0.0 < p < 0.1 and n == 5
    # perfect correlation -> p = 0
    perf = spark.createDataFrame([(1.0, 2.0), (2.0, 4.0), (3.0, 6.0)],
                                 "a double, b double")
    assert corr_significance(perf, "a", "b").first()["p_value"] == 0.0


def test_closed_form_distribution_cdfs(spark):
    """weibull/lognormal/triangular CDF columns vs python closed forms."""
    import math

    from solr_spark.functions.mathstream import (
        lognormal_cdf_col,
        triangular_cdf_col,
        weibull_cdf_col,
    )

    df = spark.createDataFrame([(x,) for x in (-1.0, 0.5, 2.0, 10.0)], "x double")
    got = df.select(
        "x",
        weibull_cdf_col(F.col("x"), 1.5, 2.0).alias("w"),
        lognormal_cdf_col(F.col("x"), 0.0, 1.0).alias("l"),
        triangular_cdf_col(F.col("x"), 0.0, 1.0, 4.0).alias("t"),
    ).collect()
    for r in got:
        x = r.x
        ww = 0.0 if x <= 0 else 1 - math.exp(-((x / 2.0) ** 1.5))
        assert abs(r.w - ww) < 1e-12
        if x <= 0:
            assert r.l == 0.0
        else:
            # erf polynomial: |err| < 1.5e-7
            ln = 0.5 * (1 + math.erf(math.log(x) / math.sqrt(2)))
            assert abs(r.l - ln) < 2e-7
        if x <= 0:
            tt = 0.0
        elif x >= 4:
            tt = 1.0
        elif x <= 1:
            tt = x * x / (4.0 * 1.0)
        else:
            tt = 1 - (4 - x) ** 2 / (4.0 * 3.0)
        assert abs(r.t - tt) < 1e-12


def test_zipf_and_geometric_pmf(spark):
    """zipf pmf sums to 1 over its support and matches the closed form;
    geometric pmf matches (1-p)^k * p with 0 below support."""
    import math

    from solr_spark.functions.mathstream import geometric_pmf_col, zipf_pmf_col

    ks = spark.range(0, 6).select(F.col("id").alias("k"))
    got = {r.k: (r.z, r.g) for r in ks.select(
        "k",
        zipf_pmf_col(F.col("k"), 5, 1.0).alias("z"),
        geometric_pmf_col(F.col("k"), 0.25).alias("g"),
    ).collect()}
    h5 = sum(1.0 / i for i in range(1, 6))
    assert got[0][0] == 0.0                       # k=0 outside zipf support
    for k in range(1, 6):
        assert abs(got[k][0] - (1.0 / k) / h5) < 1e-12
    assert abs(sum(z for z, _ in got.values()) - 1.0) < 1e-12
    for k in range(0, 6):
        assert abs(got[k][1] - (0.75 ** k) * 0.25) < 1e-12
