"""Similarity search over embedding columns: brute-force, LSH, IVF.

Three tiers for the 100 TB curation use-case:

- ``cosine_topk``  — exact brute-force: one scan, JVM-side zip_with dot
  product, TakeOrderedAndProject top-k. The correctness baseline and the
  right choice when the query batch is small.
- ``lsh_topk``     — random-hyperplane LSH: each vector gets a bucket id
  from the sign pattern of ``n_planes`` fixed hyperplanes; a query probes
  only its bucket (optionally multi-probe with Hamming-1 neighbors).
  Sub-linear scan at the cost of recall; the planes are deterministic
  (seeded) so results are reproducible and SQL-checkable.
- ``ivf_topk``     — inverted-file index: k-means centroids (trained
  driver-side on a sample with numpy, fixed seed/iterations), vectors
  assigned to nearest centroid; a query probes the ``n_probe`` nearest
  cells. The standard big-index layout (probe set is a pushed-down IN
  filter on the cell column, so a cell-partitioned parquet layout prunes
  partitions).

All distances run in float64 JVM expressions — no Python in the scan path.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_vec(values) -> Column:
    """array<double> literal in ONE py4j call. The per-element
    ``F.array(*[F.lit(x) ...])`` form costs ~dim py4j round-trips per vector
    and dominated the kmeans-family driver time (dim=64, k centroids, every
    iteration — measured 33x slower to build; SURVEY §11c). ``repr`` emits
    the shortest exactly-round-tripping decimal for a Python float and the
    ``D`` suffix pins DoubleType, so the literal is bit-identical to the
    F.lit form (equality-tested). Non-finite values fall back to the
    per-element form (SQL literals cannot spell inf/nan)."""
    vs = [float(v) for v in values]
    if vs and all(math.isfinite(v) for v in vs):
        return F.expr("array(" + ",".join(f"{v!r}D" for v in vs) + ")")
    return F.array(*[F.lit(v) for v in vs]).cast("array<double>")


# Per-dimension mean aggregate columns for the centroid-update step, cached:
# a pure function of (vec_col, dim) built once per process instead of dim
# py4j calls per Lloyd iteration (same rationale as curation._gopher_n_cols;
# keyed on the live gateway so a relaunched JVM restarts the cache).
_MEAN_COLS: dict[tuple, list] = {}


def _mean_cols(vec_col: str, dim: int) -> list:
    from solr_spark.session import gateway_key

    key = (gateway_key(), vec_col, dim)
    hit = _MEAN_COLS.get(key)
    if hit is None:
        hit = _MEAN_COLS[key] = [
            F.avg(F.col(vec_col)[d]).alias(f"m{d}") for d in range(dim)
        ]
    return hit


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def sq_l2(a: Column, b: Column) -> Column:
    """Squared euclidean distance ||a - b||² as a JVM fold."""
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    vectors: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector."""
    q = _lit_vec(query_vec)
    sim = cosine(F.col(vec_col), q)
    return (
        vectors.select(F.col(id_col).alias("vec_id"), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


# --- LSH --------------------------------------------------------------------


def lsh_planes(dim: int, n_planes: int = 12, seed: int = 777) -> np.ndarray:
    """Deterministic random hyperplanes (n_planes x dim, float64)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Sign-pattern bucket id: bit i = 1 iff vec · plane_i >= 0."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = _lit_vec(plane)
        bit = F.when(dot(vec, p) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def with_lsh_bucket(
    vectors: DataFrame, planes: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Add the ``bucket`` column. At scale, write the result partitioned/
    bucketed by this column so a probe prunes to one partition."""
    return vectors.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))


def lsh_topk(
    bucketed: DataFrame, query_vec: list[float], planes: np.ndarray,
    k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding",
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: probe the query's bucket (+ Hamming-``multiprobe``
    neighbor buckets) and rank exactly within."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qbucket = 0
    for i, plane in enumerate(planes):
        if float(qv @ plane) >= 0:
            qbucket |= 1 << i
    probes = {qbucket}
    if multiprobe >= 1:
        probes |= {qbucket ^ (1 << i) for i in range(len(planes))}
    q = _lit_vec(query_vec)
    sim = cosine(F.col(vec_col), q)
    return (
        bucketed.where(F.col("bucket").isin(list(probes)))
        .select(F.col(id_col).alias("vec_id"), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


# --- IVF --------------------------------------------------------------------


def train_centroids(
    sample: np.ndarray, n_cells: int = 16, iters: int = 10,
    seed: int | None = 99,
) -> np.ndarray:
    """Plain Lloyd k-means on an in-memory sample (deterministic).

    ``seed=None`` seeds from the FIRST ``n_cells`` sample rows instead of
    an RNG draw — fully replayable cross-engine (the ivf_ann_top10 oracle
    unrolls the training run in SQL), at the usual k-means init-quality
    tradeoff, which the recall tests bound either way."""
    if seed is None:
        cents = sample[:n_cells].astype(np.float64).copy()
    else:
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(sample), size=n_cells, replace=False)
        cents = sample[idx].astype(np.float64)
    for _ in range(iters):
        # cosine assignment on normalized vectors
        sims = sample @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(n_cells):
            m = sample[assign == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    return cents


def assign_cell(vec: Column, centroids: np.ndarray) -> Column:
    """argmax_c (vec · centroid_c). Built as one sims array + array_position
    (a chained-when formulation would double the expression tree per
    centroid — 2^n_cells nodes — and stall Catalyst)."""
    sims = F.array(
        *[
            dot(vec, _lit_vec(cent))
            for cent in centroids
        ]
    )
    return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")


def with_ivf_cell(
    vectors: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    return vectors.withColumn("cell", assign_cell(F.col(vec_col), centroids))


def ivf_topk(
    celled: DataFrame, query_vec: list[float], centroids: np.ndarray,
    k: int = 10, n_probe: int = 4, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the n_probe nearest cells, rank exactly within them."""
    qv = np.asarray(query_vec, dtype=np.float64)
    # kind="stable": equal inner products elect the LOWER cluster id —
    # the tie-break the ivf_ann_top10 oracle pins (ip DESC, cluster ASC).
    # Default introsort would make the probe set version-dependent.
    order = np.argsort(-(centroids @ qv), kind="stable")
    probes = [int(c) for c in order[:n_probe]]
    q = _lit_vec(query_vec)
    sim = cosine(F.col(vec_col), q)
    return (
        celled.where(F.col("cell").isin(probes))
        .select(F.col(id_col).alias("vec_id"), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


# --- stream-evaluator-shaped clustering / regression ------------------------


def kmeans(
    vectors: DataFrame, k: int = 8, iters: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """`kmeans(matrix, k)` (solrj io/eval/KmeansEvaluator.java, commons-math
    KMeansPlusPlusClusterer) as DISTRIBUTED Lloyd iterations — the reference
    clusters an in-memory matrix inside /stream; here each iteration is one
    scan with broadcast centroids:

    - assignment: ``assign_cell`` compiles the k centroids into a JVM sims
      array + argmax (no Python in the scan);
    - update: per-dimension means via ``dim`` avg() aggregate columns in a
      single groupBy(cell) — the shuffle carries k x dim partial sums, never
      rows.

    Deterministic init (the k lowest-id vectors) so results are reproducible
    and testable. Returns (cluster, size, centroid array).

    Euclidean assignment (commons-math default), not cosine."""
    init = vectors.orderBy(id_col).limit(k).select(vec_col).collect()
    if len(init) < k:
        raise ValueError(f"kmeans(k={k}) needs at least k vectors, got {len(init)}")
    dim = len(init[0][0])
    cents = np.array([list(r[0]) for r in init], dtype=np.float64)

    def _euclid_cell(vec: Column, c: np.ndarray) -> Column:
        # argmin ||v - c||^2 = argmax (2 v.c - ||c||^2): same sims-array +
        # array_position trick as assign_cell, linear expression tree.
        sims = F.array(
            *[
                2.0 * dot(vec, _lit_vec(cent))
                - float(cent @ cent)
                for cent in c
            ]
        )
        return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")

    assigned = None
    for _ in range(iters):
        assigned = vectors.withColumn("cluster", _euclid_cell(F.col(vec_col), cents))
        rows = (
            assigned.groupBy("cluster")
            .agg(
                F.count("*").alias("n"),
                *_mean_cols(vec_col, dim),
            )
            .collect()
        )
        new = cents.copy()
        for r in rows:
            new[r["cluster"]] = [r[f"m{d}"] for d in range(dim)]
        if np.allclose(new, cents, atol=1e-12):
            cents = new
            break
        cents = new
    assigned = vectors.withColumn("cluster", _euclid_cell(F.col(vec_col), cents))
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("size"),
            *_mean_cols(vec_col, dim),
        )
        .select(
            "cluster",
            "size",
            F.array(*[F.col(f"m{d}") for d in range(dim)]).alias("centroid"),
        )
        .orderBy("cluster")
    )


def knn_regress(
    vectors: DataFrame, query_vec: list[float], y_col: str, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """`knnRegress(obs, outcomes, k)` (io/eval/KnnRegressionEvaluator.java):
    predict the query point's outcome as the mean outcome of its k nearest
    neighbors — here exact cosine top-k (one scan, TakeOrderedAndProject)
    then a k-row average. Returns (prediction, k)."""
    q = _lit_vec(query_vec)
    sim = cosine(F.col(vec_col), q)
    nn = (
        vectors.select(F.col(y_col).alias("_y"), sim.alias("sim"),
                       F.col(id_col).alias("_id"))
        .orderBy(F.col("sim").desc(), F.col("_id").asc())
        .limit(k)
    )
    return nn.agg(
        F.avg("_y").alias("prediction"), F.count("*").cast("int").alias("k")
    )


# --- Binary quantization (sign bits + Hamming rerank) ------------------------

WORD_BITS = 32  # packed word width; 32 keeps every engine's BIGINT shifts safe


def sign_bits(vec: Column, dim: int) -> Column:
    """array<long> of ceil(dim/32) words; word w bit j = 1 iff
    vec[w*32 + j] > 0. The modern binary-quantization layout: a 64-dim
    float vector compresses 32x into two longs, and angular similarity is
    approximated by Hamming distance over the words (pure JVM
    bit_count(xor)). 32-bit words sidestep BIGINT overflow on bit 63 in
    engines that check shifts.
    """
    words = []
    for w in range(0, dim, WORD_BITS):
        word = F.lit(0).cast("long")
        for j in range(w, min(dim, w + WORD_BITS)):
            word = word + F.when(
                vec[j] > 0, F.lit(1 << (j - w)).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        words.append(word)
    return F.array(*words)


def _query_sign_words(query_vec: list[float]) -> list[int]:
    out = []
    for w in range(0, len(query_vec), WORD_BITS):
        word = 0
        for j in range(w, min(len(query_vec), w + WORD_BITS)):
            if query_vec[j] > 0:
                word |= 1 << (j - w)
        out.append(word)
    return out


def hamming_words(a: Column, b: Column) -> Column:
    """Hamming distance between two equal-length packed-word arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def bq_topk(
    vectors: DataFrame, query_vec: list[float], k: int = 10,
    rerank: int = 100, id_col: str = "vec_id", vec_col: str = "embedding",
    bits_col: str | None = None,
) -> DataFrame:
    """Binary-quantized ANN: coarse top-``rerank`` by Hamming distance over
    sign-bit words, exact cosine rerank to top-``k`` among the survivors.
    Returns (vec_id, hamming, sim).

    Shape at scale: the coarse phase reads ONLY the packed words (two
    longs per 64-dim vector — 32x less IO than the float column when
    ``bits_col`` is precomputed and stored; column pruning keeps the float
    array out of the scan) and is a TakeOrderedAndProject; the float
    vectors are touched for just the ``rerank`` survivors via a keyed
    semi-join.
    """
    dim = len(query_vec)
    qwords = F.array(*[F.lit(w).cast("long") for w in _query_sign_words(query_vec)])
    bits = F.col(bits_col) if bits_col else sign_bits(F.col(vec_col), dim)
    coarse = (
        vectors.select(
            F.col(id_col).alias("vec_id"),
            hamming_words(bits, qwords).alias("hamming"),
        )
        .orderBy(F.col("hamming").asc(), F.col("vec_id").asc())
        .limit(rerank)
    )
    q = _lit_vec(query_vec)
    floats = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")
    )
    # cosine is projected ABOVE the join so only the `rerank` survivors'
    # float vectors are dotted — pushing it below would re-scan and score
    # the whole table, defeating the coarse phase
    return (
        coarse.join(floats, "vec_id")
        .select("vec_id", "hamming", cosine(F.col("_v"), q).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


# --- DBSCAN -------------------------------------------------------------------


def dbscan(
    vectors: DataFrame,
    eps: float,
    min_pts: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """DBSCAN (Ester et al., KDD 1996) — the reference exposes it as the
    `dbscan(matrix, eps, minPts)` stream evaluator (solrj
    io/eval/DbscanEvaluator.java, wrapping commons-math DBSCANClusterer):
    core points have >= min_pts OTHER points within ``eps`` (euclidean,
    commons-math's neighborhood convention); clusters are the connected
    components of the core-core eps-graph; border points (non-core with a
    core neighbor) attach to a cluster; the rest is noise (cluster = -1).

    DETERMINISM: commons-math assigns a border point reachable from several
    clusters to whichever it visits first (iteration-order-dependent); here
    a border point joins the cluster with the SMALLEST cluster id, and a
    cluster's id is the minimum id of its core points — reproducible at any
    parallelism (the same documented-determinism policy as
    TextProfileSignature's tie order).

    Shape at scale: the only quadratic step is eps-pair discovery; by
    default it is an exact self-join (right for evaluator-sized matrices,
    and for the oracle). For corpus-scale inputs pass ``pairs`` — candidate
    (id_a, id_b) pairs from a banded-LSH prefilter
    (`hyperplane_band_sigs` / `cosine_neardup_pairs` machinery) — and only
    candidates are distance-checked. Components run on dup_clusters'
    iterative min-label propagation (O(diameter) rounds, distributed).

    Returns (id, cluster, is_core).
    """
    from solr_spark.functions.dedup import dup_clusters

    # double-precision distances so the <= eps decision is bit-identical to
    # the SQL oracle (float32 subtraction would diverge near the boundary)
    pts = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if pairs is None:
        a = pts.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
        b = pts.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        cand = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        cand = (
            pairs.select("id_a", "id_b")
            .join(pts.select(F.col("id").alias("id_a"),
                             F.col("v").alias("va")), "id_a")
            .join(pts.select(F.col("id").alias("id_b"),
                             F.col("v").alias("vb")), "id_b")
        )
    dist2 = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    edges = cand.where(dist2 <= float(eps) * float(eps)).select("id_a", "id_b")
    # eager localCheckpoint, not persist: it materializes once (edges feed
    # sym, core_edges AND the iterative dup_clusters) but its storage is
    # released when the DataFrame is GC'd — an explicit persist here is
    # pinned in the session CacheManager until unpersist, so repeated
    # dbscan() calls would accumulate cached RDDs for the session lifetime.
    edges = edges.localCheckpoint(eager=True)
    sym = edges.unionByName(
        edges.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    degree = sym.groupBy("id_a").agg(F.count("*").alias("deg"))
    core = degree.where(F.col("deg") >= min_pts).select(
        F.col("id_a").alias("id")
    ).localCheckpoint(eager=True)

    core_edges = (
        edges.join(core.select(F.col("id").alias("id_a")), "id_a", "left_semi")
        .join(core.select(F.col("id").alias("id_b")), "id_b", "left_semi")
    )
    comp = dup_clusters(core_edges).select(
        F.col("node").alias("id"), F.col("cluster")
    )
    # isolated core points (>= min_pts border neighbors, no core neighbor)
    # form their own singleton cluster, as in the reference
    core_cl = (
        core.join(comp, "id", "left")
        .select("id", F.coalesce("cluster", F.col("id")).alias("cluster"))
        .localCheckpoint(eager=True)
    )
    border = (
        sym.withColumnRenamed("id_a", "id")
        .join(core_cl.select(F.col("id").alias("id_b"), "cluster"), "id_b")
        .join(core_cl.select("id"), "id", "left_anti")
        .groupBy("id")
        .agg(F.min("cluster").alias("cluster"))
    )
    out = (
        pts.select("id")
        .join(
            core_cl.withColumn("is_core", F.lit(True))
            .unionByName(border.withColumn("is_core", F.lit(False))),
            "id",
            "left",
        )
        .select(
            "id",
            F.coalesce("cluster", F.lit(-1)).alias("cluster"),
            F.coalesce("is_core", F.lit(False)).alias("is_core"),
        )
    )
    return out


def fuzzy_kmeans(
    vectors: DataFrame, k: int = 4, fuzziness: float = 2.0, iters: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """`fuzzyKmeans(matrix, k, fuzziness)` (solrj io/eval/
    FuzzyKmeansEvaluator.java, commons-math FuzzyKMeansClusterer default
    fuzziness 2.0) as DISTRIBUTED fuzzy c-means.

    Each iteration is ONE scan: the k centroids broadcast as literal JVM
    arrays, per-row memberships u_j = (1/d_j²)^(1/(m-1)) normalized (the
    standard closed form; d=0 snaps to hard membership), and the centroid
    update Σ u_j^m·x / Σ u_j^m arrives as k×dim partial-aggregate columns —
    the shuffle never carries rows. The reference seeds the membership
    matrix from an RNG; this uses the same deterministic init as kmeans()
    (the k lowest-id vectors) so runs are reproducible and testable —
    divergence documented like kmeans/dbscan.

    Returns per-cluster (cluster, size [hard argmax assignment],
    soft_size [Σ memberships], centroid)."""
    init = vectors.orderBy(id_col).limit(k).select(vec_col).collect()
    if len(init) < k:
        raise ValueError(f"fuzzy_kmeans(k={k}) needs at least k vectors")
    dim = len(init[0][0])
    cents = np.array([list(r[0]) for r in init], dtype=np.float64)
    expo = 1.0 / (fuzziness - 1.0)

    def _memberships(vec: Column, c: np.ndarray) -> Column:
        # u_j ∝ (1/d_j²)^(1/(m-1)); exact-hit rows (d=0) snap to that
        # centroid. Built as a literal expression tree — no Python workers.
        d2s = [
            F.greatest(
                F.lit(1e-30),
                sq_l2(vec, _lit_vec(cent)),
            )
            for cent in c
        ]
        raw = [F.pow(F.lit(1.0) / d2, F.lit(expo)) for d2 in d2s]
        tot = raw[0]
        for r in raw[1:]:
            tot = tot + r
        return F.array(*[r / tot for r in raw])

    for _ in range(iters):
        mem = vectors.withColumn("u", _memberships(F.col(vec_col), cents))
        aggs = []
        for j in range(k):
            um = F.pow(F.col("u")[j], F.lit(fuzziness))
            aggs.append(F.sum(um).alias(f"w{j}"))
            aggs += [
                F.sum(um * F.col(vec_col)[d]).alias(f"s{j}_{d}")
                for d in range(dim)
            ]
        row = mem.agg(*aggs).collect()[0]
        new = np.array(
            [[row[f"s{j}_{d}"] / row[f"w{j}"] for d in range(dim)]
             for j in range(k)]
        )
        if np.allclose(new, cents, atol=1e-12):
            cents = new
            break
        cents = new

    mem = vectors.withColumn("u", _memberships(F.col(vec_col), cents))
    hard = (F.array_position(F.col("u"), F.array_max("u")) - 1).cast("int")
    return (
        mem.withColumn("cluster", hard)
        .groupBy("cluster")
        .agg(
            F.count("*").alias("size"),
            F.sum(F.col("u")[F.col("cluster")]).alias("soft_size"),
        )
        .join(
            mem.sparkSession.createDataFrame(
                [(int(j), [float(v) for v in cents[j]]) for j in range(k)],
                "cluster int, centroid array<double>",
            ),
            "cluster",
            "right",
        )
        .select(
            "cluster",
            F.coalesce("size", F.lit(0)).alias("size"),
            F.coalesce("soft_size", F.lit(0.0)).alias("soft_size"),
            "centroid",
        )
        .orderBy("cluster")
    )


def multi_kmeans(
    vectors: DataFrame, k: int = 4, trials: int = 3, iters: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """`multiKmeans(matrix, k, trials)` (solrj io/eval/MultiKmeansEvaluator
    .java): run kmeans ``trials`` times and keep the clustering with the
    lowest within-cluster sum of squares. The reference restarts from RNG
    seeds; here trial t seeds from the vectors ranked t·k … t·k+k-1 by id —
    deterministic restarts, same divergence note as kmeans(). Each trial's
    WCSS is one scan with broadcast centroids."""
    best = None
    best_wcss = float("inf")
    ordered = vectors.orderBy(id_col)
    for t in range(trials):
        init = (
            ordered.limit(k * (t + 1)).orderBy(F.col(id_col).desc())
            .limit(k).select(vec_col).collect()
        )
        if len(init) < k:
            continue
        cents = np.array([list(r[0]) for r in init], dtype=np.float64)
        out = _kmeans_from(vectors, cents, iters, vec_col=vec_col)
        cen = np.array([list(r["centroid"]) for r in out.collect()])
        d2s = F.array(
            *[
                sq_l2(F.col(vec_col), _lit_vec(c))
                for c in cen
            ]
        )
        wcss = vectors.agg(
            F.sum(F.array_min(d2s)).alias("w")
        ).collect()[0]["w"]
        if wcss < best_wcss:
            best_wcss, best = wcss, out
    return best


def _kmeans_from(
    vectors: DataFrame, cents: "np.ndarray", iters: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd iterations from explicit initial centroids (shared by kmeans
    restarts). Same per-iteration shape as kmeans(): broadcast-literal
    assignment + k×dim partial-aggregate update."""
    dim = cents.shape[1]

    def _euclid_cell(vec: Column, c: np.ndarray) -> Column:
        sims = F.array(
            *[
                2.0 * dot(vec, _lit_vec(cent))
                - float(cent @ cent)
                for cent in c
            ]
        )
        return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")

    for _ in range(iters):
        assigned = vectors.withColumn(
            "cluster", _euclid_cell(F.col(vec_col), cents)
        )
        rows = (
            assigned.groupBy("cluster")
            .agg(
                F.count("*").alias("n"),
                *_mean_cols(vec_col, dim),
            )
            .collect()
        )
        new = cents.copy()
        for r in rows:
            new[r["cluster"]] = [r[f"m{d}"] for d in range(dim)]
        if np.allclose(new, cents, atol=1e-12):
            cents = new
            break
        cents = new
    assigned = vectors.withColumn("cluster", _euclid_cell(F.col(vec_col), cents))
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("size"),
            *_mean_cols(vec_col, dim),
        )
        .select(
            "cluster",
            "size",
            F.array(*[F.col(f"m{d}") for d in range(dim)]).alias("centroid"),
        )
        .orderBy("cluster")
    )
