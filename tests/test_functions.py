"""Training-data ops: dedup family, ANN variants, textstats, multimodal."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_spark.functions.ann import (
    cosine_topk,
    ivf_topk,
    lsh_planes,
    lsh_topk,
    train_centroids,
    with_ivf_cell,
    with_lsh_bucket,
)
from solr_spark.functions.dedup import (
    exact_dedup,
    minhash_jaccard_estimate,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from solr_spark.functions.multimodal import (
    decode_image_batch,
    frame_sample_plan,
    pack_binary,
)
from solr_spark.functions.textstats import (
    fingerprint,
    identify_language,
    quality_features,
    token_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


# --- dedup ------------------------------------------------------------------


def test_exact_dedup_finds_planted_dup(spark, docs):
    dup = docs.limit(1).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    with_dup = docs.unionByName(dup)
    groups = exact_dedup(with_dup, "text", "doc_id").collect()
    assert len(groups) == 1
    assert groups[0]["n"] == 2


def test_jaccard_pair_symmetric_bounds(docs):
    rows = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.3).collect()
    for r in rows:
        assert r.id_a < r.id_b
        assert 0.3 <= r.jaccard <= 1.0


def test_minhash_estimates_jaccard(docs):
    """MinHash agreement must approximate true Jaccard on high-sim pairs."""
    sigs = minhash_signatures(docs, "text", "doc_id", k=32)
    pairs = minhash_lsh_pairs(sigs, bands=8, rows_per_band=4)
    est = minhash_jaccard_estimate(sigs, pairs, k=32)
    true = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.0)
    joined = est.join(true, ["id_a", "id_b"]).collect()
    assert joined
    for r in joined:
        assert abs(r.est_jaccard - r.jaccard) < 0.35  # k=32 sketch tolerance


def test_simhash_identical_docs_distance_zero(spark, docs):
    dup = docs.limit(1).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    both = docs.select("doc_id", "text").unionByName(dup)
    sig = simhash(both, "text", "doc_id")
    pairs = simhash_pairs(sig, max_distance=0).collect()
    planted = [p for p in pairs if p.id_b == p.id_a + 100000]
    assert planted and planted[0].dist == 0


# --- ANN --------------------------------------------------------------------


@pytest.fixture(scope="module")
def qvec(embeddings):
    return list(embeddings.where(F.col("vec_id") == 0).collect()[0]["embedding"])


def test_bruteforce_topk_is_sorted(embeddings, qvec):
    rows = cosine_topk(embeddings.where(F.col("vec_id") != 0), qvec, k=10).collect()
    sims = [r.sim for r in rows]
    assert len(rows) == 10
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 + 1e-9 for s in sims)


def test_lsh_finds_planted_neighbors(spark, embeddings, qvec):
    """On near-uniform random vectors no ANN beats brute force, so test the
    mechanism: plant 5 near-copies of the query (sim ~0.99) and require LSH
    to retrieve them — high-similarity vectors share sign buckets w.h.p."""
    rng = np.random.default_rng(5)
    q = np.asarray(qvec, dtype=np.float64)
    planted = [
        (10_000 + i, (q + 0.05 * rng.standard_normal(len(q))).tolist(), -1)
        for i in range(5)
    ]
    extra = spark.createDataFrame(
        [(i, [float(x) for x in v], lbl) for i, v, lbl in planted],
        "vec_id long, embedding array<float>, label int",
    )
    all_vecs = embeddings.select("vec_id", "embedding", "label").unionByName(extra)
    planes = lsh_planes(64, n_planes=6, seed=777)
    bucketed = with_lsh_bucket(all_vecs.where(F.col("vec_id") != 0), planes)
    got = {
        r.vec_id
        for r in lsh_topk(bucketed, qvec, planes, k=5, multiprobe=1).collect()
    }
    assert len(got & {i for i, _, _ in planted}) >= 4


def test_ivf_recall_vs_bruteforce(embeddings, qvec):
    sample = np.array(
        [r["embedding"] for r in embeddings.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    cents = train_centroids(sample, n_cells=8, iters=5, seed=99)
    celled = with_ivf_cell(embeddings.where(F.col("vec_id") != 0), cents)
    approx = {r.vec_id for r in ivf_topk(celled, qvec, cents, k=10, n_probe=4).collect()}
    exact = {
        r.vec_id
        for r in cosine_topk(embeddings.where(F.col("vec_id") != 0), qvec, 10).collect()
    }
    assert len(exact & approx) >= 5


# --- textstats --------------------------------------------------------------


def test_identify_language_plants(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog was in the house"),
            (2, "el perro y la casa de un gato"),
            (3, "xyzzy qwerty asdf"),
        ],
        "id long, text string",
    )
    got = {r.id: r.pred_lang for r in identify_language(df, "text", "id").collect()}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "und"


def test_quality_features_ranges(docs):
    rows = quality_features(docs.limit(50), "text", "doc_id").collect()
    for r in rows:
        assert 0.0 <= r.quality <= 1.0
        assert 0.0 < r.ttr <= 1.0
        assert r.n_types <= r.n_tokens


def test_token_counts_consistency(docs):
    rows = token_counts(docs.limit(20), "text", "doc_id").collect()
    for r in rows:
        assert r.bpe_est_tokens >= r.analyzer_tokens  # ceil(len/4) >= 1 per token


def test_fingerprint_stable(docs):
    a = {r.id: r.fingerprint for r in fingerprint(docs.limit(20), "text", "doc_id").collect()}
    b = {r.id: r.fingerprint for r in fingerprint(docs.limit(20), "text", "doc_id").collect()}
    assert a == b
    assert all(f for f in a.values())


# --- multimodal -------------------------------------------------------------


def test_multimodal_decode_fake(docs):
    packed = pack_binary(docs.limit(5), "text", "doc_id")
    out = decode_image_batch(packed, fake=True).collect()
    assert len(out) == 5
    for r in out:
        assert r.width == 16 + r.n_bytes % 64
        assert abs(sum(r.hist) - 1.0) < 1e-9


def test_multimodal_batch_matches_scalar_oracle(docs):
    """The vectorized batch decoder must equal the scalar _fake_decode
    row-for-row — pins the numpy batch rewrite to the reference math."""
    from solr_spark.functions.multimodal import _fake_decode

    packed = pack_binary(docs.limit(8), "text", "doc_id")
    got = {r.id: r for r in decode_image_batch(packed, fake=True).collect()}
    for p in packed.collect():
        w, h, hist = _fake_decode(bytes(p.payload))
        r = got[p.id]
        assert (r.width, r.height) == (w, h)
        assert r.n_bytes == len(bytes(p.payload))
        assert all(abs(a - b) < 1e-12 for a, b in zip(r.hist, hist))


def test_multimodal_decode_stub_raises(docs):
    packed = pack_binary(docs.limit(1), "text", "doc_id")
    with pytest.raises(Exception):
        decode_image_batch(packed, fake=False).collect()


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, 3.5), (2, 0.4)], "id long, duration_s double")
    rows = frame_sample_plan(df, every_n_seconds=1.0).collect()
    per_id = {}
    for r in rows:
        per_id.setdefault(r.id, []).append(r.frame_ts)
    assert sorted(per_id[1]) == [0.0, 1.0, 2.0]
    assert per_id[2] == [0.0]


def test_simhash_vectorized_equals_longform(spark):
    """The production 60-aggregate-column SimHash must produce identical
    signatures to the long-form (terms x bits) oracle variant, and its plan
    must not explode the bit dimension."""
    from solr_spark.functions.dedup import simhash, simhash_longform

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r.id: r.simhash for r in simhash(docs, "text", "doc_id").collect()}
    b = {r.id: r.simhash
         for r in simhash_longform(docs, "text", "doc_id").collect()}
    assert a == b and len(a) == docs.count()
    plan = (
        simhash(docs, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the only Generate allowed is the token explode; no sequence(0,59)
    assert "sequence(0, 59" not in plan


def test_fft_matches_numpy(spark):
    import numpy as np

    from solr_spark.functions.mathstream import fft_magnitudes

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, v double"
    )
    got = [r.magnitude for r in fft_magnitudes(df, "v", "i").orderBy("idx").collect()]
    want = np.abs(np.fft.fft(np.array(vals))).tolist()
    assert got == pytest.approx(want)


def test_linear_regression_known_line(spark):
    from solr_spark.functions.mathstream import linear_regression

    rows = [(float(x), 2.0 * x + 5.0) for x in range(100)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = linear_regression(df, "x", "y").collect()[0]
    assert r.slope == pytest.approx(2.0) and r.intercept == pytest.approx(5.0)
    assert r.r2 == pytest.approx(1.0) and r.n == 100


def test_polyfit_recovers_exact_quadratic(spark):
    from solr_spark.functions.mathstream import polyfit

    rows = [(x / 10.0, 3.0 - 2.0 * (x / 10.0) + 0.5 * (x / 10.0) ** 2)
            for x in range(-50, 51)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = polyfit(df, "x", "y", degree=2).collect()[0]
    assert r.coef_0 == pytest.approx(3.0, abs=1e-9)
    assert r.coef_1 == pytest.approx(-2.0, abs=1e-9)
    assert r.coef_2 == pytest.approx(0.5, abs=1e-9)


def test_polyfit_degree1_matches_regr(spark):
    from solr_spark.functions.mathstream import linear_regression, polyfit

    rows = [(float(x), 1.5 * x + 4.0 + (x % 7) * 0.3) for x in range(200)]
    df = spark.createDataFrame(rows, "x double, y double")
    p = polyfit(df, "x", "y", degree=1).collect()[0]
    lr = linear_regression(df, "x", "y").collect()[0]
    assert p.coef_1 == pytest.approx(lr.slope, rel=1e-9)
    assert p.coef_0 == pytest.approx(lr.intercept, rel=1e-9)


def test_loess_smooths_line_and_resists_outlier(spark):
    from solr_spark.functions.mathstream import loess

    # exactly-linear data: local linear fit must reproduce the line
    rows = [(float(x), 2.0 * x + 1.0) for x in range(40)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = loess(df, "x", "y", bandwidth=0.3, robust_iters=0).collect()
    for r in out:
        assert r.smoothed == pytest.approx(2.0 * r.x + 1.0, abs=1e-9)

    # one wild outlier in mildly noisy data: robustness iterations suppress
    # it (without them the neighborhood is dragged tens of units off)
    rng = np.random.default_rng(7)
    noise = rng.normal(0, 0.1, size=40)
    rows2 = [(float(x), float(2.0 * x + 1.0 + noise[x]) + (500.0 if x == 20 else 0.0))
             for x in range(40)]
    df2 = spark.createDataFrame(rows2, "x double, y double")
    naive = {r.x: r.smoothed
             for r in loess(df2, "x", "y", bandwidth=0.3, robust_iters=0).collect()}
    got = {r.x: r.smoothed
           for r in loess(df2, "x", "y", bandwidth=0.3, robust_iters=2).collect()}
    assert abs(naive[19.0] - (2.0 * 19 + 1.0)) > 20.0  # unrobust fit is dragged
    assert got[19.0] == pytest.approx(2.0 * 19 + 1.0, abs=1.0)
    assert got[21.0] == pytest.approx(2.0 * 21 + 1.0, abs=1.0)


def test_welch_ttest_known_values(spark):
    from solr_spark.functions.mathstream import welch_ttest

    # classic two-sample data with known Welch results
    a = [27.5, 21.0, 19.0, 23.6, 17.0, 17.9, 16.9, 20.1, 21.9, 22.6, 23.1,
         19.6, 19.0, 21.7, 21.4]
    b = [27.1, 22.0, 20.8, 23.4, 23.4, 23.5, 25.8, 22.0, 24.8, 20.2, 21.9,
         22.1, 22.9, 30.5, 28.4, 23.5, 20.8, 20.1, 29.3, 21.4, 26.3]
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, "v double, g string")
    r = welch_ttest(df, "v", "g", "a", "b").collect()[0]
    # independent expected values: numpy sample moments + Welch's published
    # formulas (the code under test computes these via distributed filtered
    # aggregates; the t-CDF is separately table-verified below)
    na, nb = len(a), len(b)
    va, vb = np.var(a, ddof=1) / na, np.var(b, ddof=1) / nb
    t = (np.mean(a) - np.mean(b)) / np.sqrt(va + vb)
    dof = (va + vb) ** 2 / (va**2 / (na - 1) + vb**2 / (nb - 1))
    assert r.t_stat == pytest.approx(t, rel=1e-12)
    assert r.df == pytest.approx(dof, rel=1e-12)
    assert 0.0 < r.p_value < 0.02  # clearly significant, two-sided
    assert r.n_a == na and r.n_b == nb


def test_student_t_sf_against_known_table(spark):
    from solr_spark.functions.mathstream import student_t_sf

    # standard t-table values: P(T > t) one-sided
    assert student_t_sf(2.228, 10) == pytest.approx(0.025, abs=2e-4)
    assert student_t_sf(1.645, 1e9) == pytest.approx(0.05, abs=1e-3)
    assert student_t_sf(0.0, 7) == pytest.approx(0.5, abs=1e-12)
    assert student_t_sf(-2.228, 10) == pytest.approx(0.975, abs=2e-4)


def test_ecdf_simple(spark):
    from solr_spark.functions.mathstream import ecdf

    df = spark.createDataFrame([(float(i),) for i in range(1, 11)], "v double")
    out = {r.probe: r.cum_prob for r in ecdf(df, "v", [0.0, 5.0, 10.0]).collect()}
    assert out[0.0] == 0.0
    assert out[5.0] == pytest.approx(0.5)
    assert out[10.0] == pytest.approx(1.0)


def test_normal_cdf_matches_math_erf(spark):
    import math

    from solr_spark.functions.mathstream import normal_cdf

    probes = [-3.0, -1.0, -0.5, 0.0, 0.7, 1.96, 2.5]
    df = spark.createDataFrame([(p,) for p in probes], "x double")
    got = {r.x: r.c for r in
           df.select("x", normal_cdf(F.col("x"), 1.0, 2.0).alias("c")).collect()}
    for p in probes:
        want = 0.5 * (1.0 + math.erf((p - 1.0) / (2.0 * math.sqrt(2.0))))
        assert got[p] == pytest.approx(want, abs=2e-7)


def test_kmeans_matches_numpy_lloyd(spark):
    from solr_spark.functions.ann import kmeans

    rng = np.random.default_rng(42)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    pts = np.vstack([c + rng.normal(0, 0.5, size=(20, 2)) for c in centers])
    rows = [(i, [float(a) for a in p]) for i, p in enumerate(pts)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans(df, k=3, iters=10)

    # numpy reference: identical deterministic init + Lloyd updates
    cents = pts[:3].astype(np.float64).copy()
    for _ in range(10):
        d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(3):
            m = pts[assign == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    want_sizes = np.bincount(assign, minlength=3)

    got = out.collect()
    assert [r.size for r in got] == want_sizes.tolist()
    for r in got:
        assert list(r.centroid) == pytest.approx(cents[r.cluster].tolist(), abs=1e-9)


def test_knn_regress_prediction(spark):
    from solr_spark.functions.ann import knn_regress

    # neighbors of [1, 0] by cosine: exactly the x-axis points
    rows = [(i, [1.0, 0.001 * i], 5.0 + i) for i in range(5)]
    rows += [(100 + i, [0.0, 1.0], 1000.0) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, y double")
    r = knn_regress(df, [1.0, 0.0], "y", k=5).collect()[0]
    assert r.k == 5
    assert r.prediction == pytest.approx(sum(5.0 + i for i in range(5)) / 5)


def test_haversine_known_distances(spark):
    from solr_spark.functions.spatial import geodist, geofilt

    # JFK (40.6413, -73.7781) to LHR (51.4700, -0.4543) ~ 5540 km (great circle)
    df = spark.createDataFrame(
        [(1, 51.4700, -0.4543), (2, 40.7, -74.0), (3, -33.9, 151.2)],
        "id long, lat double, lon double",
    )
    got = {r.id: r.dist_km
           for r in geodist(df, 40.6413, -73.7781).collect()}
    assert got[1] == pytest.approx(5539.5, abs=10.0)  # published JFK-LHR distance
    assert got[2] < 25.0
    assert got[3] == pytest.approx(16000, abs=250)    # NYC-Sydney ~ 15,990 km

    near = geofilt(df, 40.6413, -73.7781, 100.0).collect()
    assert [r.id for r in near] == [2]


def test_geofilt_dateline_wrap(spark):
    from solr_spark.functions.spatial import bbox_filter, geofilt

    # points near the antimeridian: fiji-ish (-17.7, 178.0) and (-17.7, -179.5)
    df = spark.createDataFrame(
        [(1, -17.7, 178.0), (2, -17.7, -179.5), (3, -17.7, 170.0)],
        "id long, lat double, lon double",
    )
    out = sorted(r.id for r in geofilt(df, -17.7, 179.5, 300.0).collect())
    assert out == [1, 2]
    bb = sorted(r.id for r in bbox_filter(df, -17.7, 179.5, 300.0).collect())
    assert bb == [1, 2]


def test_cosine_neardup_pairs_recall_and_precision(spark):
    """Planted near-parallel pairs recovered; orthogonal-ish vectors not
    paired; no CartesianProduct in the plan (banded-bucket join only)."""
    import numpy as np

    from solr_spark.functions.dedup import cosine_neardup_pairs

    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # near-copy: coordinate-wise jitter, cosine ~0.999
        rows.append((i + 1000, [float(x * (1 + 0.02 * ((j % 5) - 2)))
                                for j, x in enumerate(v)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_neardup_pairs(df, 0.99, bands=8, planes_per_band=8)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert got == {(i, i + 1000) for i in range(20)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_hyperplane_band_sigs_shape(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from solr_spark.functions.ann import lsh_planes
    from solr_spark.functions.dedup import hyperplane_band_sigs

    planes = lsh_planes(8, 12, seed=5)
    df = spark.createDataFrame([([1.0] * 8,)], "embedding array<double>")
    sigs = df.select(
        hyperplane_band_sigs(F.col("embedding"), planes, 3, 4).alias("s")
    ).first().s
    assert len(sigs) == 3
    # recompute band 0 with numpy signs
    want = sum((1 << p) for p in range(4) if float(np.ones(8) @ planes[p]) >= 0)
    assert sigs[0] == want


def test_sign_bits_and_bq_recall(spark, embeddings):
    import numpy as np

    from solr_spark.functions.ann import (
        WORD_BITS, _query_sign_words, bq_topk, cosine_topk, sign_bits,
    )

    rows = embeddings.limit(3).collect()
    for r in rows:
        v = list(r.embedding)
        got = (
            embeddings.where(F.col("vec_id") == r.vec_id)
            .select(sign_bits(F.col("embedding"), len(v)).alias("b"))
            .first()["b"]
        )
        want = _query_sign_words([float(x) for x in v])
        assert list(got) == want
        assert len(got) == (len(v) + WORD_BITS - 1) // WORD_BITS

    qv = [float(x) for x in rows[0].embedding]
    others = embeddings.where(F.col("vec_id") != rows[0].vec_id)
    # an identical copy of the query vector is Hamming-0 and cosine-1: the
    # quantized path must agree with brute force on the top hit
    bq = bq_topk(others, qv, k=5, rerank=50).toPandas()
    bf = cosine_topk(others, qv, k=5).toPandas()
    assert bq.iloc[0]["vec_id"] == bf.iloc[0]["vec_id"]
    # coarse recall: most of the exact top-5 survive the hamming gate
    assert len(set(bq["vec_id"]) & set(bf["vec_id"])) >= 3


def test_chunk_tokens_coverage_and_overlap(spark):
    import pytest as _pt

    from solr_spark.functions.textstats import chunk_tokens

    words = " ".join(f"w{i}" for i in range(110))
    df = spark.createDataFrame(
        [(1, words), (2, "a b c"), (3, ""), (4, "!!! ...")],
        ["doc_id", "text"],
    )
    out = chunk_tokens(df, "text", "doc_id", size=64, overlap=16).toPandas()

    d1 = out[out.id == 1].sort_values("chunk_id")
    assert len(d1) == 2                       # ceil((110-64)/48)=1 extra
    toks0 = d1.iloc[0]["chunk"].split()
    toks1 = d1.iloc[1]["chunk"].split()
    assert len(toks0) == 64 and d1.iloc[0]["n_tokens"] == 64
    assert toks1[-1] == "w109"                # tail covered
    assert len(toks1) == 64                   # pulled-back full window
    assert set(toks0) | set(toks1) == {f"w{i}" for i in range(110)}

    d2 = out[out.id == 2]
    assert len(d2) == 1 and d2.iloc[0]["chunk"] == "a b c"
    assert d2.iloc[0]["n_tokens"] == 3
    assert set(out["id"]) == {1, 2}           # empty/no-token docs: no rows

    with _pt.raises(ValueError):
        chunk_tokens(df, "text", "doc_id", size=10, overlap=10)


def test_contamination_scores_plants(spark):
    from solr_spark.functions.dedup import contamination_scores

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # full copy
            (2, "quick brown fox sat still"),                    # partial
            (3, "completely unrelated text about spark engines"),
        ],
        ["doc_id", "text"],
    )
    out = contamination_scores(train, bench, "text", "doc_id", n=3).toPandas()
    got = dict(zip(out["id"], out["contamination"]))
    assert got[1] == 1.0                      # verbatim copy: fully hit
    assert 0.0 < got[2] < 1.0                 # shares 'quick brown fox'
    assert got[3] == 0.0
    d2 = out[out.id == 2].iloc[0]
    assert d2["n_hit"] == 1 and d2["n_shingles"] == 3


def test_minhash_xxhash_fast_path(spark, docs):
    """The xxhash64 production hash gives valid signatures and similar
    LSH candidates (different hash family — same docs, similar pairs)."""
    import pytest as _pt

    from solr_spark.functions.dedup import minhash_lsh_pairs, minhash_signatures, shingle_hashes

    s_md5 = minhash_signatures(docs, "text", "doc_id", k=32, hash="md5")
    s_xx = minhash_signatures(docs, "text", "doc_id", k=32, hash="xxhash64")
    assert s_md5.count() == s_xx.count()
    # signatures are all in [0, 2^31): the pmod guard holds for signed xxhash
    mins = s_xx.select(F.array_min("minhash").alias("m")).agg(F.min("m")).first()[0]
    assert mins >= 0
    p_md5 = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(s_md5).collect()}
    p_xx = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(s_xx).collect()}
    # near-dup pairs are hash-family-robust: strong overlap
    assert len(p_md5 & p_xx) >= int(0.8 * max(len(p_md5), 1))

    with _pt.raises(ValueError):
        shingle_hashes(F.col("text"), 3, hash="sha1")


def test_duplicate_span_stats_hand_check(spark):
    """Lee et al. ExactSubstr at span granularity, k=3: interval-union
    coverage verified against a hand computation (overlapping windows
    'a b c' x3 and 'b c d' x2; doc below k excluded; clean doc dup_frac 0)."""
    from solr_spark.functions.dedup import duplicate_span_stats

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y a b c d q"), (3, "zz q"),
         (4, "a b c x y z"), (5, "p q r s t")],
        "id long, t string",
    )
    got = {r.id: r for r in duplicate_span_stats(df, "t", "id", k=3).collect()}
    assert set(got) == {1, 2, 4, 5}        # doc 3 has < k tokens
    # doc1: dup windows abc@0, bcd@1 -> union [0,4) = 4 of 6 tokens
    assert (got[1].n_dup_windows, got[1].covered_tokens) == (2, 4)
    assert abs(got[1].dup_frac - 4 / 6) < 1e-12
    # doc2: abc@2, bcd@3 -> 4 of 7
    assert (got[2].covered_tokens, got[2].n_tokens) == (4, 7)
    # doc4: abc@0 only -> exactly k covered
    assert (got[4].n_dup_windows, got[4].covered_tokens) == (1, 3)
    # doc5 shares nothing
    assert got[5].n_dup_windows == 0 and got[5].dup_frac == 0.0
    # min_count=3: only the 'a b c' triple survives
    got3 = {r.id: r for r in
            duplicate_span_stats(df, "t", "id", k=3, min_count=3).collect()}
    assert got3[1].n_dup_windows == 1 and got3[2].covered_tokens == 3


def test_text_profile_signature_reference_semantics(spark):
    """TextProfileSignature.java semantics: rare tokens vanish after
    quantization, so boilerplate-equal docs hash identically even when
    their rare tokens differ; short tokens (len <= 2) never count."""
    import hashlib

    from solr_spark.functions.dedup import text_profile_signature

    boiler = ("common " * 150).strip()
    rows = [
        (1, boiler + " uniqueword"),        # rare token -> discarded
        (2, boiler + " differentrare"),     # other rare token -> same sig
        (3, boiler + " " + ("other " * 150).strip()),  # new frequent token
        (4, "ab cd ef"),                    # all tokens len<=2 -> no profile
        (5, "hello"),                       # maxFreq 1 -> quant 1, kept
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = text_profile_signature(df, "text", "doc_id").toPandas()
    sig = dict(zip(out["id"], out["signature"]))
    assert sig[1] == sig[2]                 # fuzzy: rare diffs ignored
    assert sig[3] != sig[1]
    assert 4 not in sig                     # nothing survives -> no row
    # doc 5: maxFreq=1 -> quant=1, profile "hello 1"
    assert sig[5] == hashlib.md5(b"hello 1").hexdigest()
    # doc 1: common appears 150x, quant = round(1.5)=2, 150//2*2=150
    assert sig[1] == hashlib.md5(b"common 150").hexdigest()


def test_chunk_tokens_property_sweep(spark):
    """Property sweep over (size, overlap, doc length): full coverage, no
    overlong chunk, stride spacing, deterministic pullback tail."""
    import random

    from solr_spark.functions.textstats import chunk_tokens

    rng = random.Random(7)
    rows = [
        (i, " ".join(f"t{i}x{j}" for j in range(rng.randint(0, 200))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for size, overlap in [(64, 16), (32, 0), (10, 9), (100, 50)]:
        out = chunk_tokens(df, "text", "doc_id", size=size, overlap=overlap) \
            .toPandas()
        for i, text in rows:
            toks = text.split()
            sub = out[out.id == i].sort_values("chunk_id")
            if not toks:
                assert len(sub) == 0
                continue
            got_tokens = set()
            for _, r in sub.iterrows():
                ct = r["chunk"].split()
                assert len(ct) <= size and len(ct) == r["n_tokens"]
                got_tokens.update(ct)
            assert got_tokens == set(toks)          # full coverage
            if len(toks) <= size:
                assert len(sub) == 1                # single window


def test_frequency_table_counts_and_cumulatives(spark):
    from solr_spark.functions.mathstream import frequency_table

    df = spark.createDataFrame([(v,) for v in [1, 2, 2, 3, 3, 3, 5]], "x long")
    rows = frequency_table(df, "x").collect()
    assert [(r.value, r["count"], r.cumFreq) for r in rows] == [
        (1, 1, 1), (2, 2, 3), (3, 3, 6), (5, 1, 7)
    ]
    assert rows[-1].cumPct == pytest.approx(100.0)
    assert rows[1].pct == pytest.approx(2 / 7 * 100)


def test_exp_moving_avg_matches_recurrence(spark):
    import random

    from solr_spark.functions.mathstream import exp_moving_avg

    rng = random.Random(7)
    xs = [rng.uniform(0, 10) for _ in range(60)]
    df = spark.createDataFrame(list(enumerate(xs)), "t long, x double")
    got = {r.t: r.ema for r in exp_moving_avg(df, "x", "t", 7).collect()}
    a = 2.0 / 8.0
    ema = sum(xs[:7]) / 7
    want = {6: ema}
    for i in range(7, 60):
        ema = a * (xs[i] - ema) + ema
        want[i] = ema
    for t in range(6):
        assert got[t] is None  # before the seed window completes
    for t, w in want.items():
        assert got[t] == pytest.approx(w, rel=1e-9)


def test_anova_oneway_hand_computed(spark):
    from solr_spark.functions.mathstream import anova_oneway

    rows = ([("a", x) for x in [1.0, 2.0, 3.0, 4.0]]
            + [("b", x) for x in [2.0, 3.0, 4.0, 5.0]]
            + [("c", x) for x in [5.0, 6.0, 7.0, 9.0]])
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "v", "g").collect()[0]
    # hand calc: SSB=39.5 (df 2), SSW=18.75 (df 9) -> F = 19.75/2.08333
    assert r.f_ratio == pytest.approx(9.48, abs=1e-9)
    assert r.df_between == 2 and r.df_within == 9
    assert 0.0 < r.p_value < 0.01


def test_f_and_chi2_survival_golden_quantiles():
    """The driver-side special functions against classic table values."""
    from solr_spark.functions.mathstream import _betainc, chi2_sf

    # P(F(1,10) > 4.965) = 0.05  (F distribution 5% critical value)
    assert _betainc(5.0, 0.5, 10 / (10 + 4.965)) == pytest.approx(0.05, abs=1e-4)
    # chi-square 5% critical values: 3.841 (1 dof), 11.070 (5 dof)
    assert chi2_sf(3.841, 1) == pytest.approx(0.05, abs=1e-4)
    assert chi2_sf(11.070, 5) == pytest.approx(0.05, abs=1e-4)


def test_chi_square_and_gtest_datasets(spark):
    from solr_spark.functions.mathstream import (
        chi_square_datasets, g_test_datasets)

    # equal totals (60/60): plain sum (a-b)^2/(a+b)
    df = spark.createDataFrame(
        [(10.0, 12.0), (20.0, 18.0), (30.0, 30.0)], "a double, b double")
    r = chi_square_datasets(df, "a", "b").collect()[0]
    want = 4 / 22 + 4 / 38 + 0.0
    assert r.chisq_stat == pytest.approx(want, rel=1e-12) and r.dof == 2

    g = g_test_datasets(df, "a", "b").collect()[0]
    import math
    tot, sa, sb = 120.0, 60.0, 60.0
    want_g = 2 * sum(
        o * math.log(o / (s * c / tot))
        for (oa, ob) in [(10, 12), (20, 18), (30, 30)]
        for o, s, c in [(oa, sa, oa + ob), (ob, sb, oa + ob)]
    )
    assert g.g_stat == pytest.approx(want_g, rel=1e-12) and g.dof == 2

    # unequal totals: commons-math K = sqrt(Sa/Sb) weighting
    df2 = spark.createDataFrame(
        [(10.0, 20.0), (30.0, 20.0), (20.0, 40.0)], "a double, b double")
    r2 = chi_square_datasets(df2, "a", "b").collect()[0]
    k = math.sqrt(60.0 / 80.0)
    want2 = sum((oa / k - ob * k) ** 2 / (oa + ob)
                for oa, ob in [(10, 20), (30, 20), (20, 40)])
    assert r2.chisq_stat == pytest.approx(want2, rel=1e-12)


def test_ks_two_sample_matches_bruteforce(spark):
    import bisect
    import random

    from solr_spark.functions.mathstream import ks_two_sample

    rng = random.Random(11)
    xa = sorted(rng.gauss(0, 1) for _ in range(50))
    xb = sorted(rng.gauss(0.5, 1) for _ in range(60))
    rows = [("a", v) for v in xa] + [("b", v) for v in xb]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_two_sample(df, "v", "g", "a", "b").collect()[0]
    want = max(
        abs(bisect.bisect_right(xa, v) / 50 - bisect.bisect_right(xb, v) / 60)
        for v in xa + xb
    )
    assert r.d_stat == pytest.approx(want, rel=1e-12)
    assert r.n_a == 50 and r.n_b == 60
    assert 0.0 <= r.p_asymptotic <= 1.0


def test_mann_whitney_u_with_ties(spark):
    from solr_spark.functions.mathstream import mann_whitney_u

    # ties across and within groups exercise the midrank path
    xa = [1.0, 2.0, 2.0, 3.0, 5.0]
    xb = [2.0, 4.0, 4.0, 6.0]
    rows = [("a", v) for v in xa] + [("b", v) for v in xb]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    # midranks: 1.0->1; 2.0,2.0,2.0->3; 3.0->5; 4.0,4.0->6.5; 5.0->8; 6.0->9
    ra = 1 + 3 + 3 + 5 + 8  # = 20
    ua = ra - 5 * 6 / 2     # = 5
    ub = 5 * 4 - ua         # = 15
    assert r.u_stat == pytest.approx(max(ua, ub))
    assert r.n_a == 5 and r.n_b == 4
    assert 0.0 <= r.p_value <= 1.0


def test_markov_transitions_probabilities(spark):
    from solr_spark.functions.mathstream import markov_transitions

    rows = [("u1", 1, "x"), ("u1", 2, "y"), ("u1", 3, "x"),
            ("u2", 1, "x"), ("u2", 2, "y"), ("u2", 3, "y")]
    df = spark.createDataFrame(rows, "u string, t long, s string")
    got = {(r.state, r.next_state): (r.n, r.prob)
           for r in markov_transitions(df, "s", "t", "u").collect()}
    assert got == {("x", "y"): (2, 1.0),
                   ("y", "x"): (1, 0.5), ("y", "y"): (1, 0.5)}


def test_erf_and_norm_cdf_golden(spark):
    import math

    from solr_spark.functions.mathstream import erf_col, norm_cdf_col

    df = spark.createDataFrame([(x / 4.0,) for x in range(-12, 13)], "x double")
    rows = df.select(
        "x", erf_col(F.col("x")).alias("e"),
        norm_cdf_col(F.col("x"), 0.0, 1.0).alias("c")).collect()
    for r in rows:
        # A&S 7.1.26 polynomial: |error| < 1.5e-7 (published bound)
        assert abs(r.e - math.erf(r.x)) < 1.5e-7
        assert abs(r.c - 0.5 * (1 + math.erf(r.x / math.sqrt(2)))) < 1.5e-7


def test_poisson_and_binomial_columns_golden(spark):
    import math

    from solr_spark.functions.mathstream import (
        binom_cdf_col, binom_pmf_col, poisson_cdf_col, poisson_pmf_col)

    kdf = spark.createDataFrame([(k,) for k in range(0, 21)], "k int")
    lam, n, p = 6.5, 20, 0.34
    got = {r.k: r for r in kdf.select(
        "k",
        poisson_pmf_col(F.col("k"), lam).alias("pp"),
        poisson_cdf_col(F.col("k"), lam).alias("pc"),
        binom_pmf_col(F.col("k"), n, p).alias("bp"),
        binom_cdf_col(F.col("k"), n, p).alias("bc")).collect()}
    pcum = bcum = 0.0
    for k in range(21):
        ppmf = math.exp(-lam) * lam ** k / math.factorial(k)
        bpmf = math.comb(n, k) * p ** k * (1 - p) ** (n - k)
        pcum += ppmf
        bcum += bpmf
        assert got[k].pp == pytest.approx(ppmf, rel=1e-12)
        assert got[k].pc == pytest.approx(pcum, rel=1e-12)
        assert got[k].bp == pytest.approx(bpmf, rel=1e-12)
        assert got[k].bc == pytest.approx(bcum, rel=1e-12)
    assert got[20].bc == pytest.approx(1.0, rel=1e-9)


def test_cut_duplicate_spans_keeps_canonical(spark):
    """ExactSubstr CUT policy: the minimal (id, start) occurrence of each
    duplicated span survives; every other occurrence's tokens are removed."""
    from solr_spark.functions.dedup import cut_duplicate_spans

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y a b c d q"), (3, "zz q"),
         (4, "a b c x y z")],
        "id long, t string",
    )
    got = {r.id: r for r in cut_duplicate_spans(df, "t", "id", k=3).collect()}
    assert got[1].text_clean == "a b c d e f"      # canonical: untouched
    assert got[1].n_cut_tokens == 0
    assert got[2].text_clean == "x y q"            # abc@2+bcd@3 cut
    assert got[2].n_cut_tokens == 4
    assert got[4].text_clean == "x y z"            # abc@0 cut
    assert got[3].text_clean == "zz q"             # below k: pass-through
    # idempotence: a second pass over the cleaned text cuts nothing
    again = cut_duplicate_spans(
        spark.createDataFrame(
            [(r.id, r.text_clean) for r in got.values()], "id long, t string"
        ),
        "t", "id", k=3,
    )
    assert again.agg(F.sum("n_cut_tokens")).first()[0] == 0


def test_shingles_short_docs_no_crash(spark):
    """Docs shorter than the shingle width produce EMPTY shingle sets:
    sequence(1, 0) yields a descending [1, 0] in Spark and slice errors on
    start 0, so the index list must be explicitly emptied (regression)."""
    from solr_spark.functions.dedup import minhash_signatures, shingle_hashes

    df = spark.createDataFrame(
        [(1, "hello"), (2, "two tokens"), (3, ""), (4, "now three tokens")],
        "doc_id long, text string",
    )
    ns = {r.doc_id: r.n for r in df.select(
        "doc_id", F.size(shingle_hashes(F.col("text"), 3)).alias("n")
    ).collect()}
    assert ns == {1: 0, 2: 0, 3: 0, 4: 1}
    # minhash silently drops shingle-less docs instead of crashing
    assert minhash_signatures(df, "text", "doc_id", k=8).count() == 1


def test_duplicate_spans_randomized_parity(spark):
    """duplicate_span_stats + cut_duplicate_spans vs a brute-force Python
    reference over random tiny-alphabet corpora (collisions everywhere):
    coverage arithmetic, canonical election, and pass-through rows must all
    agree exactly."""
    import random
    import re

    from solr_spark.functions.dedup import (
        cut_duplicate_spans,
        duplicate_span_stats,
    )

    def toks(s):
        return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]

    for seed in range(6):
        rng = random.Random(seed)
        k = rng.choice([2, 3, 4])
        docs = {
            i: " ".join(rng.choice("ab cd ef gh".split())
                        for _ in range(rng.randint(0, 12)))
            for i in range(rng.randint(2, 10))
        }
        # brute force
        from collections import defaultdict
        occ = defaultdict(list)
        for i, s in sorted(docs.items()):
            tl = toks(s)
            for st_ in range(len(tl) - k + 1):
                occ[" ".join(tl[st_:st_ + k])].append((i, st_))
        dup_cover, cut_cover = defaultdict(set), defaultdict(set)
        for gram, places in occ.items():
            if len(places) >= 2:
                for (i, st_) in places:
                    dup_cover[i].update(range(st_, st_ + k))
                for (i, st_) in places[1:]:   # places sorted by (id, start)
                    cut_cover[i].update(range(st_, st_ + k))
        df = spark.createDataFrame(
            sorted(docs.items()), "id long, t string")
        got_stats = {r.id: r for r in
                     duplicate_span_stats(df, "t", "id", k=k).collect()}
        got_cut = {r.id: r for r in
                   cut_duplicate_spans(df, "t", "id", k=k).collect()}
        assert set(got_cut) == set(docs)
        for i, s in docs.items():
            tl = toks(s)
            if len(tl) >= k:
                assert got_stats[i].covered_tokens == len(dup_cover[i]), (
                    seed, i, s)
            else:
                assert i not in got_stats
            want_clean = " ".join(
                t for p, t in enumerate(tl) if p not in cut_cover[i])
            assert got_cut[i].text_clean == want_clean, (seed, i, s)
            assert got_cut[i].n_cut_tokens == len(cut_cover[i])


def test_dbscan_core_border_noise(spark):
    """DBSCAN hand case (Ester et al. 1996 semantics, commons-math
    neighborhood convention): dense blob -> core, a point with one core
    neighbor -> border (attached, not core), isolated point -> noise; a
    border point reachable from TWO clusters joins the lower cluster id
    (the documented deterministic policy)."""
    from solr_spark.functions.ann import dbscan

    rows = [
        (1, [0.0, 0.0]), (2, [0.1, 0.0]), (3, [0.0, 0.1]), (4, [0.1, 0.1]),
        (5, [0.4, 0.0]),          # only neighbor is 2 (d=0.3) -> border of A
        (10, [5.0, 5.0]), (11, [5.1, 5.0]), (12, [5.0, 5.1]), (13, [5.1, 5.1]),
        (20, [2.5, 2.5]),         # far from all -> noise
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    got = {r.id: r for r in dbscan(df, eps=0.31, min_pts=3).collect()}
    assert all(got[i].cluster == 1 and got[i].is_core for i in (1, 2, 3, 4))
    assert got[5].cluster == 1 and not got[5].is_core       # border
    assert all(got[i].cluster == 10 and got[i].is_core for i in (10, 11, 12, 13))
    assert got[20].cluster == -1 and not got[20].is_core    # noise

    # second blob + a 2-neighbor point: border via its CORE neighbor only
    rows2 = rows + [
        (30, [0.8, 0.0]), (31, [0.9, 0.0]), (32, [0.8, 0.1]), (33, [0.9, 0.1]),
        (25, [0.55, -0.1]),  # neighbors: 5 (d=.18, border) and 30 (d=.269, core)
    ]
    df2 = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows2],
        "vec_id long, embedding array<float>",
    )
    got2 = {r.id: r for r in dbscan(df2, eps=0.31, min_pts=3).collect()}
    assert got2[30].cluster == 30 and got2[30].is_core
    # 25's degree is 2 (< minPts) -> border; only core neighbor is 30;
    # 5's degree is 2 as well -> stays a border of cluster A
    assert got2[25].cluster == 30 and not got2[25].is_core
    assert got2[5].cluster == 1 and not got2[5].is_core


def test_akima_derivative_and_integral_parity(spark):
    """akima_derivatives == a direct numpy transcription of commons-math
    AkimaSplineInterpolator (weights, vanishing-weight midpoint branch,
    three-point endpoints); akima_integrals == the exact piecewise Hermite
    integral; integrating a linear series reproduces the quadratic."""
    import numpy as np

    from solr_spark.functions.mathstream import (
        akima_derivatives,
        akima_integrals,
    )

    def akima_ref(xv, yv):
        n = len(xv)
        d = np.diff(yv) / np.diff(xv)
        w = np.empty(n - 1)
        w[0] = np.nan
        w[1:] = np.abs(np.diff(d))
        fd = np.empty(n)

        def tp(i, i0, i1, i2):
            x0, x1, x2 = xv[i0], xv[i1], xv[i2]
            y0, y1, y2 = yv[i0], yv[i1], yv[i2]
            t, t1, t2 = xv[i] - x0, x1 - x0, x2 - x0
            a = (y2 - y0 - (t2 / t1 * (y1 - y0))) / (t2 * t2 - t1 * t2)
            b = (y1 - y0 - a * t1 * t1) / t1
            return 2 * a * t + b

        for i in range(2, n - 2):
            wp, wm = w[i + 1], w[i - 1]
            if wp == 0.0 and wm == 0.0:
                fd[i] = (
                    (xv[i + 1] - xv[i]) * d[i - 1]
                    + (xv[i] - xv[i - 1]) * d[i]
                ) / (xv[i + 1] - xv[i - 1])
            else:
                fd[i] = (wp * d[i - 1] + wm * d[i]) / (wp + wm)
        fd[0] = tp(0, 0, 1, 2)
        fd[1] = tp(1, 0, 1, 2)
        fd[n - 2] = tp(n - 2, n - 3, n - 2, n - 1)
        fd[n - 1] = tp(n - 1, n - 3, n - 2, n - 1)
        return fd

    rng = np.random.default_rng(5)
    for _ in range(4):
        n = int(rng.integers(5, 30))
        xv = np.sort(
            rng.choice(np.arange(100), size=n, replace=False)
        ).astype(float)
        yv = rng.normal(size=n) * 10 + np.sin(xv / 5) * 4
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(xv, yv)],
            "x double, y double",
        )
        fd = akima_ref(xv, yv)
        gd = np.array([r.dy for r in akima_derivatives(df, "x", "y").collect()])
        assert np.allclose(gd, fd, atol=1e-9)
        segs = (
            np.diff(xv) * (yv[:-1] + yv[1:]) / 2
            + np.diff(xv) ** 2 * (fd[:-1] - fd[1:]) / 12
        )
        ci = np.concatenate([[0.0], np.cumsum(segs)])
        gc = np.array([r.cum for r in akima_integrals(df, "x", "y").collect()])
        assert np.allclose(gc, ci, atol=1e-9)

    # exactness check: a linear series integrates to its quadratic
    xv = np.arange(0, 20, dtype=float)
    df = spark.createDataFrame(
        [(float(a), float(3 * a + 1)) for a in xv], "x double, y double"
    )
    gc = np.array([r.cum for r in akima_integrals(df, "x", "y").collect()])
    want = 1.5 * xv**2 + xv
    assert np.allclose(gc, want - want[0], atol=1e-9)


def test_kendall_tau_matches_brute_force(spark):
    """kendall_tau (joint-dictionary cell-pair fold) == O(n²) tau-b with
    tie corrections, on integer-valued columns with heavy ties."""
    from collections import Counter

    import numpy as np

    from solr_spark.functions.mathstream import kendall_tau

    rng = np.random.default_rng(3)
    for _ in range(3):
        n = 150
        x = rng.integers(0, 10, n).astype(float)
        y = (x * 2 + rng.integers(0, 12, n)).astype(float)
        c_n = d_n = 0
        for i in range(n):
            for j in range(i + 1, n):
                dx, dy = x[j] - x[i], y[j] - y[i]
                if dx != 0 and dy != 0:
                    if np.sign(dx) * np.sign(dy) > 0:
                        c_n += 1
                    else:
                        d_n += 1
        n0 = n * (n - 1) / 2
        n1 = sum(t * (t - 1) // 2 for t in Counter(x).values())
        n2 = sum(t * (t - 1) // 2 for t in Counter(y).values())
        want = (c_n - d_n) / np.sqrt((n0 - n1) * (n0 - n2))
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)],
            "a double, b double",
        )
        got = kendall_tau(df, "a", "b").collect()[0].kendall_tau
        assert abs(got - want) < 1e-12


def test_convolve_matches_numpy(spark):
    """convolve == numpy.convolve (MathArrays.convolve parity) for several
    random series/kernel shapes, including kernel longer than 1 element and
    a non-contiguous x domain (alignment is by x RANK, like the reference's
    positional arrays)."""
    import numpy as np

    from solr_spark.functions.mathstream import convolve

    rng = np.random.default_rng(7)
    for m in (2, 3, 5):
        ys = rng.integers(-5, 10, 20).astype(float)
        ker = rng.normal(size=m).round(3).tolist()
        # gappy x: ranks must come from order, not value
        xs = np.cumsum(rng.integers(1, 4, 20)).astype(float)
        df = spark.createDataFrame(
            [(float(x), float(y)) for x, y in zip(xs, ys)],
            "x double, y double",
        )
        got = {int(r.k): r.conv for r in convolve(df, "x", "y", ker).collect()}
        want = np.convolve(ys, ker)
        assert len(got) == len(want)
        assert all(abs(got[k] - want[k]) < 1e-9 for k in range(len(want)))


def test_find_delay_reference_parity(spark):
    """find_delay == FindDelayEvaluator.java: argmax |conv(a, rev(b))| with
    the reference's first-max-wins strict > scan, delay = idx+1 - len(b) —
    including a constructed shifted pair where the delay is known."""
    import numpy as np

    from solr_spark.functions.mathstream import find_delay

    def ref_delay(a, b):
        conv = np.convolve(a, b[::-1])
        mx, idx = -np.inf, -1
        for i, v in enumerate(conv):
            if abs(v) > mx:
                mx, idx = abs(v), i
        return (idx + 1) - len(b)

    rng = np.random.default_rng(11)
    base = rng.normal(size=24)
    for shift in (0, 3, -4):
        a = base
        b = np.roll(base, shift)
        df = spark.createDataFrame(
            [(float(i), float(x), float(y)) for i, (x, y) in
             enumerate(zip(a, b))],
            "x double, a double, b double",
        )
        got = find_delay(df, "x", "a", "b").collect()[0].delay
        assert got == ref_delay(a, b)


def test_paired_ttest_and_mean_difference(spark):
    """paired_ttest t/p == direct formula + t-distribution golden values;
    mean_difference == mean(a-b)."""
    import numpy as np

    from solr_spark.functions.mathstream import (
        mean_difference,
        paired_ttest,
        student_t_sf,
    )

    rng = np.random.default_rng(13)
    a = rng.normal(10, 2, 40)
    b = a + rng.normal(0.5, 1, 40)
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(a, b)], "a double, b double"
    )
    d = a - b
    t_want = d.mean() / np.sqrt(d.var(ddof=1) / len(d))
    p_want = 2.0 * student_t_sf(abs(t_want), len(d) - 1)
    row = paired_ttest(df, "a", "b").collect()[0]
    assert abs(row.t_stat - t_want) < 1e-9
    assert abs(row.p_value - min(1.0, p_want)) < 1e-12
    assert row.n == 40
    md = mean_difference(df, "a", "b").collect()[0].mean_diff
    assert abs(md - d.mean()) < 1e-9
    # golden check of the t tail itself (Simpson integration of the t pdf
    # over [2, 60] with dof 39 gives 0.0262495077)
    assert abs(student_t_sf(2.0, 39) - 0.0262495077) < 1e-7


def test_series_distances_family(spark):
    """All six distance measures == numpy folds; canberra's 0/0 terms
    contribute 0 (commons-math CanberraDistance parity)."""
    import numpy as np

    from solr_spark.functions.mathstream import series_distances

    a = np.array([0.0, 1.0, -2.0, 3.0, 0.0, 5.0])
    b = np.array([0.0, 2.0, -2.0, -1.0, 0.0, 4.0])
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(a, b)], "a double, b double"
    )
    r = series_distances(df, "a", "b").collect()[0]
    assert abs(r.euclidean - np.sqrt(((a - b) ** 2).sum())) < 1e-12
    assert abs(r.manhattan - np.abs(a - b).sum()) < 1e-12
    assert abs(r.chebyshev - np.abs(a - b).max()) < 1e-12
    den = np.abs(a) + np.abs(b)
    terms = np.where(den == 0, 0.0, np.abs(a - b) / np.where(den == 0, 1, den))
    assert abs(r.canberra - terms.sum()) < 1e-12
    assert abs(r.dot_product - a @ b) < 1e-12
    assert abs(r.cosine_sim - (a @ b) / np.sqrt((a @ a) * (b @ b))) < 1e-12


def test_scale_series_and_lerp(spark):
    """minmax/unit/normsum == the commons-math vector transforms; lerp
    midpoints == (y_i + y_{i+1}) / 2 at (x_i + x_{i+1}) / 2."""
    import numpy as np

    from solr_spark.functions.mathstream import lerp_midpoints, scale_series

    ys = np.array([3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0])
    xs = np.array([0.0, 1.0, 2.0, 4.0, 5.0, 8.0, 9.0])  # gappy
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(xs, ys)], "x double, y double"
    )
    rows = {r.x: r for r in scale_series(df, "y").collect()}
    mn, mx = ys.min(), ys.max()
    l2, s = np.sqrt((ys * ys).sum()), ys.sum()
    for x, y in zip(xs, ys):
        assert abs(rows[x].minmax - (y - mn) / (mx - mn)) < 1e-12
        assert abs(rows[x].unit - y / l2) < 1e-12
        assert abs(rows[x].normsum - y / s) < 1e-12
    mids = sorted((r.xm, r.ym) for r in lerp_midpoints(df, "x", "y").collect())
    for i in range(len(xs) - 1):
        assert mids[i] == ((xs[i] + xs[i + 1]) / 2, (ys[i] + ys[i + 1]) / 2)


def test_polyfit_derivative_matches_numpy(spark):
    """polyfit_derivative(degree=3) == derivative of numpy.polyfit
    coefficients evaluated at the sample points; exact on an actual cubic."""
    import numpy as np

    from solr_spark.functions.mathstream import polyfit_derivative

    xs = np.arange(12, dtype=float)
    # exact cubic: derivative must be recovered to machine-ish precision
    ys = 0.5 * xs**3 - 2 * xs**2 + 3 * xs - 7
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(xs, ys)], "x double, y double"
    )
    got = {r.x: r.dy for r in polyfit_derivative(df, "x", "y", 3).collect()}
    for x in xs:
        want = 1.5 * x**2 - 4 * x + 3
        assert abs(got[x] - want) < 1e-6


def test_natural_ranking_midranks(spark):
    """natural_ranking == commons-math NaturalRanking TIES_AVERAGED
    (1-based average midranks), brute-forced."""
    import numpy as np

    from solr_spark.functions.mathstream import natural_ranking

    rng = np.random.default_rng(17)
    vals = rng.integers(0, 8, 50).astype(float)
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vals)], "k int, v double"
    )
    got = {r.k: r.rank for r in
           natural_ranking(df, "v", keys=["k"]).collect()}
    sv = np.sort(vals)
    for i, v in enumerate(vals):
        idxs = np.where(sv == v)[0] + 1
        assert abs(got[i] - idxs.mean()) < 1e-12


def test_natural_cubic_spline_parity(spark):
    """natural_cubic_midpoints == an independent full-matrix solve of the
    natural-cubic second-derivative system; exact on linear data."""
    import numpy as np

    from solr_spark.functions.mathstream import natural_cubic_midpoints

    xs = np.array([0.0, 1.0, 2.0, 4.0, 5.0, 8.0, 9.0, 11.0])
    ys = np.array([3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0])
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(xs, ys)], "x double, y double"
    )
    got = {r.xm: r.ym for r in natural_cubic_midpoints(df, "x", "y").collect()}
    n = len(xs)
    h = np.diff(xs)
    a = np.zeros((n, n))
    rhs = np.zeros(n)
    a[0, 0] = a[-1, -1] = 1
    for i in range(1, n - 1):
        a[i, i - 1], a[i, i], a[i, i + 1] = h[i - 1], 2 * (h[i - 1] + h[i]), h[i]
        rhs[i] = 6 * ((ys[i + 1] - ys[i]) / h[i] - (ys[i] - ys[i - 1]) / h[i - 1])
    m = np.linalg.solve(a, rhs)
    for i in range(n - 1):
        xm = (xs[i] + xs[i + 1]) / 2
        t = xm - xs[i]
        ym = (ys[i] + t * ((ys[i + 1] - ys[i]) / h[i]
                           - h[i] * (2 * m[i] + m[i + 1]) / 6)
              + t * t * m[i] / 2 + t ** 3 * (m[i + 1] - m[i]) / (6 * h[i]))
        assert abs(got[xm] - ym) < 1e-9
    # spline through linear data is linear at every midpoint
    ld = spark.createDataFrame(
        [(float(i), float(2 * i + 1)) for i in range(6)], "x double, y double"
    )
    for r in natural_cubic_midpoints(ld, "x", "y").collect():
        assert abs(r.ym - (2 * r.xm + 1)) < 1e-9


def test_outliers_normal(spark):
    """outliers_normal flags exactly the rows whose fitted-normal CDF trips
    a bound, with the A&S-polynomial CDF within its documented 1.5e-7."""
    import math

    import numpy as np

    from solr_spark.functions.mathstream import outliers_normal

    rng = np.random.default_rng(23)
    vals = rng.normal(100, 10, 400)
    vals[0], vals[1] = 170.0, 30.0  # planted tails
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vals)], "k int, v double"
    )
    rows = outliers_normal(df, "v", 0.001, 0.999).collect()
    ids = {r.k for r in rows}
    assert {0, 1} <= ids
    mu, sd = vals.mean(), vals.std(ddof=1)
    for r in rows:
        want = 0.5 * (1 + math.erf((vals[r.k] - mu) / (sd * math.sqrt(2))))
        assert abs(r.cum_prob - want) < 2e-7
        assert r.is_low == (want <= 0.001 + 3e-7) or r.is_high
    # negative bound disables that side (reference's low >= 0 guard)
    lows = outliers_normal(df, "v", -1.0, 0.999).collect()
    assert all(r.is_high and not r.is_low for r in lows)


def test_uniform_distribution_columns(spark):
    """uniform real CDF + integer pmf/CDF closed forms (commons-math
    UniformRealDistribution / UniformIntegerDistribution inclusive)."""
    from pyspark.sql import functions as F

    from solr_spark.functions.mathstream import (
        uniform_cdf_col,
        uniform_int_cdf_col,
        uniform_int_pmf_col,
    )

    r = spark.range(1).select(
        uniform_cdf_col(F.lit(5.0), 0.0, 10.0).alias("c_mid"),
        uniform_cdf_col(F.lit(-1.0), 0.0, 10.0).alias("c_below"),
        uniform_cdf_col(F.lit(15.0), 0.0, 10.0).alias("c_above"),
        uniform_int_pmf_col(F.lit(3), 1, 50).alias("p_in"),
        uniform_int_pmf_col(F.lit(0), 1, 50).alias("p_out"),
        uniform_int_cdf_col(F.lit(25), 1, 50).alias("ic_mid"),
        uniform_int_cdf_col(F.lit(50), 1, 50).alias("ic_top"),
        uniform_int_cdf_col(F.lit(0), 1, 50).alias("ic_below"),
    ).collect()[0]
    assert (r.c_mid, r.c_below, r.c_above) == (0.5, 0.0, 1.0)
    assert abs(r.p_in - 1 / 50) < 1e-12 and r.p_out == 0.0
    assert abs(r.ic_mid - 0.5) < 1e-12
    assert r.ic_top == 1.0 and r.ic_below == 0.0


def test_fuzzy_kmeans_numpy_parity(spark):
    """fuzzy_kmeans == an in-memory numpy fuzzy c-means run with the
    identical deterministic init, centroid-for-centroid."""
    import numpy as np

    from solr_spark.functions.ann import fuzzy_kmeans

    rng = np.random.default_rng(5)
    pts = np.vstack([
        rng.normal(0, 0.5, (20, 3)),
        rng.normal(4, 0.5, (20, 3)),
        rng.normal(-4, 0.5, (20, 3)),
    ])
    df = spark.createDataFrame(
        [(i, [float(v) for v in p]) for i, p in enumerate(pts)],
        "vec_id int, embedding array<double>",
    )
    k, m = 3, 2.0
    cents = pts[:k].astype(float).copy()
    for _ in range(10):
        d2 = np.maximum(1e-30, ((pts[:, None, :] - cents[None]) ** 2).sum(-1))
        u = (1.0 / d2) ** (1.0 / (m - 1))
        u = u / u.sum(1, keepdims=True)
        new = (u.T ** m @ pts) / (u.T ** m).sum(1, keepdims=True)
        if np.allclose(new, cents, atol=1e-12):
            cents = new
            break
        cents = new
    out = fuzzy_kmeans(df, k=3, fuzziness=2.0, iters=10).collect()
    got = np.array([list(r.centroid) for r in out])
    assert np.allclose(got, cents, atol=1e-8)
    d2 = np.maximum(1e-30, ((pts[:, None, :] - cents[None]) ** 2).sum(-1))
    u = (1.0 / d2) ** (1.0 / (m - 1))
    u = u / u.sum(1, keepdims=True)
    assert [r.size for r in out] == np.bincount(
        u.argmax(1), minlength=3
    ).tolist()


def test_multi_kmeans_beats_or_ties_single(spark):
    """multi_kmeans picks the lowest-WCSS restart: its WCSS is <= the
    single deterministic-init kmeans WCSS on the same data."""
    import numpy as np

    from solr_spark.functions.ann import kmeans, multi_kmeans

    rng = np.random.default_rng(29)
    pts = np.vstack([
        rng.normal(0, 0.4, (15, 2)),
        rng.normal(5, 0.4, (15, 2)),
        rng.normal((0, 6), 0.4, (15, 2)),
    ])
    df = spark.createDataFrame(
        [(i, [float(v) for v in p]) for i, p in enumerate(pts)],
        "vec_id int, embedding array<double>",
    )

    def wcss(out):
        cen = np.array([list(r.centroid) for r in out.collect()])
        d2 = ((pts[:, None, :] - cen[None]) ** 2).sum(-1)
        return d2.min(1).sum()

    single = wcss(kmeans(df, k=3, iters=8))
    multi = wcss(multi_kmeans(df, k=3, trials=3, iters=8))
    assert multi <= single + 1e-9
    assert sum(r.size for r in multi_kmeans(df, k=3, trials=3, iters=8)
               .collect()) == 45


def test_gamma_beta_cdf_golden(spark):
    """gamma_cdf_probes / beta_cdf_probes special functions == Simpson
    integration of the respective pdfs at the fitted parameters."""
    import math

    import numpy as np

    from solr_spark.functions.mathstream import (
        beta_cdf_probes,
        gamma_cdf_probes,
    )

    rng = np.random.default_rng(31)
    vals = rng.gamma(3.0, 2.0, 600)
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    mu, var = vals.mean(), vals.var(ddof=1)
    k, th = mu * mu / var, var / mu

    def gamma_cdf_num(x):
        c = 1.0 / (math.gamma(k) * th ** k)
        n, a = 20000, 1e-12
        h = (x - a) / n
        s = (a ** (k - 1)) * math.exp(-a / th) + (x ** (k - 1)) * math.exp(-x / th)
        for i in range(1, n):
            t = a + i * h
            s += (t ** (k - 1)) * math.exp(-t / th) * (4 if i % 2 else 2)
        return c * s * h / 3

    probes = [2.0, 5.0, 9.0]
    got = {r.probe: r.cdf for r in gamma_cdf_probes(df, "v", probes).collect()}
    for p in probes:
        assert abs(got[p] - gamma_cdf_num(p)) < 1e-7

    uv = rng.beta(2.0, 5.0, 600)
    bdf = spark.createDataFrame([(float(v),) for v in uv], "v double")
    m, v = uv.mean(), uv.var(ddof=1)
    common = m * (1 - m) / v - 1
    a_, b_ = m * common, (1 - m) * common

    def beta_cdf_num(x):
        c = math.gamma(a_ + b_) / (math.gamma(a_) * math.gamma(b_))
        n = 20000
        lo = 1e-12
        h = (x - lo) / n
        s = (lo ** (a_ - 1)) * ((1 - lo) ** (b_ - 1)) \
            + (x ** (a_ - 1)) * ((1 - x) ** (b_ - 1))
        for i in range(1, n):
            t = lo + i * h
            s += (t ** (a_ - 1)) * ((1 - t) ** (b_ - 1)) * (4 if i % 2 else 2)
        return c * s * h / 3

    probes = [0.15, 0.3, 0.6]
    got = {r.probe: r.cdf for r in beta_cdf_probes(bdf, "v", probes).collect()}
    for p in probes:
        assert abs(got[p] - beta_cdf_num(p)) < 1e-6


def test_convex_hull_and_enclosing_disk(spark):
    """Distributed convex_hull == an independent gift-wrapping hull on the
    same points; hull_attributes shoelace area matches; enclosing_disk is
    minimal (brute-force pairs+triples over the hull) and covers every
    input point."""
    import numpy as np

    from solr_spark.functions.spatial import (
        convex_hull,
        enclosing_disk,
        hull_attributes,
    )

    rng = np.random.default_rng(41)
    pts = rng.normal(0, 3, (600, 2))
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x double, y double"
    ).repartition(8)
    hull = convex_hull(df, "x", "y")

    def gift_wrap(p):
        p = np.unique(p, axis=0)
        start = min(range(len(p)), key=lambda i: (p[i][0], p[i][1]))
        idx = [start]
        while True:
            cur = idx[-1]
            cand = (cur + 1) % len(p)
            for j in range(len(p)):
                if j == cur:
                    continue
                cr = np.cross(p[cand] - p[cur], p[j] - p[cur])
                if cr < -1e-12 or (
                    abs(cr) < 1e-12
                    and np.linalg.norm(p[j] - p[cur])
                    > np.linalg.norm(p[cand] - p[cur])
                ):
                    cand = j
            if cand == start:
                break
            idx.append(cand)
        return p[idx]

    gw = gift_wrap(pts)
    assert set(map(tuple, np.round(hull, 9))) == set(map(tuple, np.round(gw, 9)))

    att = hull_attributes(hull)
    x, y = gw[:, 0], gw[:, 1]
    area = abs((x * np.roll(y, -1) - np.roll(x, -1) * y).sum() / 2)
    assert abs(att["area"] - area) < 1e-9
    assert att["n_vertices"] == len(gw)

    disk = enclosing_disk(hull)
    c = np.array([disk["cx"], disk["cy"]])
    assert (np.linalg.norm(pts - c, axis=1) <= disk["radius"] + 1e-6).all()
    # brute-force minimality over hull vertices
    h = np.asarray(hull)
    best = None
    n = len(h)

    def covers(cc, r):
        return (np.linalg.norm(h - cc, axis=1) <= r + 1e-9).all()

    for i in range(n):
        for j in range(i + 1, n):
            cc = (h[i] + h[j]) / 2
            r = np.linalg.norm(h[i] - cc)
            if covers(cc, r) and (best is None or r < best):
                best = r
    for i in range(n):
        for j in range(i + 1, n):
            for k in range(j + 1, n):
                ax, ay = h[i]
                bx, by = h[j]
                cx, cy = h[k]
                d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
                if abs(d) < 1e-18:
                    continue
                ux = ((ax * ax + ay * ay) * (by - cy)
                      + (bx * bx + by * by) * (cy - ay)
                      + (cx * cx + cy * cy) * (ay - by)) / d
                uy = ((ax * ax + ay * ay) * (cx - bx)
                      + (bx * bx + by * by) * (ax - cx)
                      + (cx * cx + cy * cy) * (bx - ax)) / d
                cc = np.array([ux, uy])
                r = np.linalg.norm(h[i] - cc)
                if covers(cc, r) and (best is None or r < best):
                    best = r
    assert abs(best - disk["radius"]) < 1e-6
    # degenerate inputs: 1 and 2 points
    single = enclosing_disk(np.array([[2.0, 3.0]]))
    assert single["radius"] == 0.0 and single["support"] == 1
    two = enclosing_disk(np.array([[0.0, 0.0], [2.0, 0.0]]))
    assert abs(two["radius"] - 1.0) < 1e-12 and (two["cx"], two["cy"]) == (1.0, 0.0)


def test_harmonic_and_gaussian_fit_exact_recovery(spark):
    """harmonic_fit recovers (A, omega, phi) exactly from a clean
    sinusoid (the optimum commons-math LM converges to); gaussian_fit
    recovers (N, m, sigma) exactly from a clean Gaussian; both stay close
    under noise. oscillate == A*cos(omega*x + phi) closed form."""
    import numpy as np

    from solr_spark.functions.mathstream import (
        gaussian_fit,
        harmonic_fit,
        oscillate_series,
    )

    xs = np.arange(60, dtype=float)
    amp_t, w_t, ph_t = 3.5, 0.37, 1.1
    ys = amp_t * np.cos(w_t * xs + ph_t)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(xs, ys)], "x double, y double"
    )
    (amp, w, ph), fitted = harmonic_fit(df, "x", "y")
    assert abs(amp - amp_t) < 1e-6 and abs(w - w_t) < 1e-6
    assert abs(((ph - ph_t + np.pi) % (2 * np.pi)) - np.pi) < 1e-5
    fr = {r.x: r.fit for r in fitted.collect()}
    assert all(abs(fr[x] - y) < 1e-6 for x, y in zip(xs, ys))

    rng = np.random.default_rng(3)
    dfn = spark.createDataFrame(
        [(float(a), float(b)) for a, b in
         zip(xs, ys + rng.normal(0, 0.1, len(xs)))],
        "x double, y double",
    )
    (amp2, w2, _), _ = harmonic_fit(dfn, "x", "y")
    assert abs(amp2 - amp_t) < 0.1 and abs(w2 - w_t) < 0.01

    n_t, m_t, s_t = 5.0, 12.0, 3.0
    gx = np.linspace(0, 25, 80)
    gy = n_t * np.exp(-((gx - m_t) ** 2) / (2 * s_t * s_t))
    dg = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(gx, gy)], "x double, y double"
    )
    (n_, m_, s_), _ = gaussian_fit(dg, "x", "y")
    assert abs(n_ - n_t) < 1e-8 and abs(m_ - m_t) < 1e-8 and abs(s_ - s_t) < 1e-8

    rows = oscillate_series(spark, 2.0, 0.5, 0.25, n=16).collect()
    assert len(rows) == 16
    for r in rows:
        assert abs(r.y - 2.0 * np.cos(0.5 * r.x + 0.25)) < 1e-12


def test_bicubic_midpoints_cubic_exactness(spark):
    """bicubic_midpoints reproduces any cubic-in-each-variable polynomial
    exactly at interior midpoints (the defining property of the 4x4
    Lagrange tensor), and drops midpoints lacking a full neighborhood."""
    def f(x, y):
        return (2 * x ** 3 - x * x + 3 * x - 1) * (0.5 * y ** 3 + y * y - 2)

    from solr_spark.functions.mathstream import bicubic_midpoints

    rows = [(i, j, f(i, j)) for i in range(8) for j in range(8)]
    df = spark.createDataFrame(rows, "x int, y int, v double")
    out = bicubic_midpoints(df, "x", "y", "v").collect()
    assert len(out) == 25  # cx, cy in 1..5 — full 4x4 neighborhoods only
    for r in out:
        want = f(r.xm, r.ym)
        assert abs(r.value - want) < 1e-8 * max(1, abs(want))


def test_lit_vec_bit_identical_to_per_element_lits(spark):
    """_lit_vec builds the array<double> literal via one F.expr parse; its
    values must be BIT-identical to the per-element F.lit form for every
    representable float (repr round-trips exactly), and the non-finite
    fallback must kick in for inf/nan."""
    import math
    import random

    from pyspark.sql import functions as F

    from solr_spark.functions.ann import _lit_vec

    rng = random.Random(20260820)
    awkward = [0.1 + 0.2, 1e-308, 5e-324, 1.7976931348623157e308, -0.0,
               123456789.123456789, math.pi, -1e-17]
    vals = awkward + [rng.uniform(-1e6, 1e6) for _ in range(56)]
    a = _lit_vec(vals)
    b = F.array(*[F.lit(float(v)) for v in vals])
    row = spark.range(1).select(
        (a == b).alias("eq"), a.alias("a"), b.alias("b")).collect()[0]
    assert row["eq"] is True
    assert row["a"] == row["b"]

    nonfin = [1.0, float("inf"), float("nan")]
    got = spark.range(1).select(_lit_vec(nonfin).alias("v")).collect()[0]["v"]
    assert got[0] == 1.0 and math.isinf(got[1]) and math.isnan(got[2])


def test_gaussian_fit_degenerate_series_stay_bounded(spark):
    """Damped GN regression (round-5 sf0.001 sweep find): undamped
    Gauss-Newton diverged to ~1e118 on a FLAT histogram (every step
    taken unconditionally). With SSE step rejection the fit must stay
    finite on degenerate series — flat, spike, ramp, minimal — and the
    flat case must keep norm near the data scale."""
    import numpy as np

    from solr_spark.functions.mathstream import gaussian_fit

    cases = {
        # the sf0.001 orders histogram shape: 20 flat 25k-spaced buckets
        "flat": [(12500.0 + 25000.0 * i, 70.0 + (i * 7) % 20)
                 for i in range(20)],
        "spike": [(float(i), 1.0 if i != 5 else 100.0) for i in range(11)],
        "ramp": [(float(i), float(i + 1)) for i in range(12)],
        "minimal": [(0.0, 2.0), (1.0, 5.0), (2.0, 2.0)],
    }
    for name, rows in cases.items():
        df = spark.createDataFrame(rows, "x double, y double")
        (norm, mean, sigma), fitted = gaussian_fit(df, "x", "y")
        assert all(np.isfinite([norm, mean, sigma])), (name, norm, mean, sigma)
        fit_vals = [r.fit for r in fitted.collect()]
        assert all(np.isfinite(fit_vals)), name
    # the flat case must not explode: norm stays near the count scale
    df = spark.createDataFrame(cases["flat"], "x double, y double")
    (norm, _, _), _ = gaussian_fit(df, "x", "y")
    assert abs(norm) < 1e6
