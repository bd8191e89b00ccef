"""On-line search-result clustering (dynamic facets over the top hits).

Reference: the clustering search component
(`contrib/clustering/src/java/org/apache/solr/handler/clustering/
ClusteringComponent.java`, ref guide `result-clustering.adoc`): cluster the
documents of a single query's result window into labeled groups. The
reference delegates the algorithm to the external Carrot2 library (Lingo's
SVD phrase extraction, STC, bisecting k-means). This module ships the same
component contract with two engines: ``stc_clusters`` — the published STC
algorithm itself (Zamir & Etzioni, SIGIR 1998), implemented from the paper
— and a deterministic significant-terms labeling engine — the ref guide's own
framing ("clusters ... can be perceived as dynamic facets") — which is the
part that matters for a distributed engine: it reads the RESULT SET's
stored text (not the index), discovers k labels, assigns every hit to its
best label or to the catch-all group, and is exactly reproducible in SQL.

Scale shape: the result window is small by construction (top-N of a
query), so every aggregation here runs on N rows; the only wide input is
the text column of those N rows. One explode + two keyed aggregations +
one broadcast-size label join. No Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from solr_spark.functions.dedup import tokens_col

#: the reference's Other/ungrouped cluster label (Carrot2 convention)
OTHER_LABEL = "Other topics"


def gram_arrays(n_lo: int, n_hi: int, toks: str = "toks") -> list:
    """Positional token n-gram columns over a token-array column: one
    array column per n in [n_lo, n_hi], each holding every space-joined
    n-gram of ``toks`` in position order (Carrot2's preprocessing feeds
    phrases into the vector space alongside unigrams). Shared by all
    three clustering engines; callers flatten/explode per their own
    distinctness semantics."""

    def _gram_fn(n: int):
        # one-arg lambda via factory: pyspark HOFs treat a second lambda
        # parameter as the array index, so `lambda i, n=n:` must not be used
        return lambda i: F.concat_ws(" ", F.slice(F.col(toks), i, n))

    return [
        F.transform(
            # sequence(1, 0) would yield [1, 0] — emit an empty index list
            # for docs shorter than n tokens
            F.when(
                F.size(toks) >= n,
                F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            ).otherwise(F.array().cast("array<int>")),
            _gram_fn(n),
        )
        for n in range(n_lo, n_hi + 1)
    ]


def cluster_results(
    results: DataFrame,
    text_col: str,
    id_col: str,
    k_labels: int = 5,
    min_df: int = 2,
    stop_terms: tuple[str, ...] = (),
) -> DataFrame:
    """Assign each result doc to a labeled cluster.

    Labels are the ``k_labels`` terms with the highest within-results
    significance ``df_r * ln(N_r / df_r)`` (0 for terms in every doc —
    they can't split the set; maximized near df_r ≈ N_r/e), requiring
    ``df_r >= min_df`` and not in ``stop_terms``; ties break to the
    alphabetically-first term. Every doc joins the best-ranked label it
    contains, or ``OTHER_LABEL``.

    Returns (id, label, label_rank) — one row per input doc;
    ``label_rank`` is 1-based label order (0 for the Other group).
    """
    toks = results.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("term"),
    )
    per_term = toks.groupBy("term").agg(F.count("*").alias("df_r"))
    total = results.select(F.count("*").alias("n_r"))
    scored = per_term.crossJoin(F.broadcast(total)).select(
        "term", "df_r",
        (F.col("df_r") * F.log(F.col("n_r") / F.col("df_r"))).alias("score"),
    )
    if stop_terms:
        scored = scored.where(~F.col("term").isin(*stop_terms))
    labels = (
        # score > 0 excludes terms present in EVERY doc (df_r == N_r →
        # score exactly 0): the docstring's "they can't split the set"
        # must hold even with sparse vocabularies / large k_labels, where
        # a 0-scored term could otherwise win a label slot and absorb all
        # docs.
        scored.where((F.col("df_r") >= min_df) & (F.col("score") > 0))
        .withColumn(
            "label_rank",
            F.row_number().over(
                Window.orderBy(F.col("score").desc(), F.col("term").asc())
            ),
        )
        .where(F.col("label_rank") <= k_labels)
        .select(F.col("term").alias("label"), "label_rank")
    )
    assigned = (
        toks.join(F.broadcast(labels), toks["term"] == labels["label"])
        .groupBy("id")
        .agg(F.min("label_rank").alias("label_rank"))
    )
    best = labels.select("label", F.col("label_rank").alias("_lr"))
    out = (
        results.select(F.col(id_col).alias("id"))
        .join(assigned, "id", "left")
        .join(F.broadcast(best), F.col("label_rank") == F.col("_lr"), "left")
        .select(
            "id",
            F.coalesce(F.col("label"), F.lit(OTHER_LABEL)).alias("label"),
            F.coalesce(F.col("label_rank"), F.lit(0)).alias("label_rank"),
        )
    )
    return out


def stc_clusters(
    results: DataFrame,
    text_col: str,
    id_col: str,
    max_phrase: int = 4,
    min_df: int = 2,
    max_df_frac: float = 0.8,
    max_base: int = 500,
    merge_threshold: float = 0.5,
    k_clusters: int = 10,
) -> DataFrame:
    """Suffix Tree Clustering — the published algorithm behind Carrot2's STC
    engine (Zamir & Etzioni, "Web Document Clustering: A Feasibility
    Demonstration", SIGIR 1998), which the reference's clustering component
    delegates to (`contrib/clustering`, result-clustering.adoc).

    Phase 1 (base clusters): every shared phrase (token n-gram, n ≤
    ``max_phrase``) with document frequency ≥ ``min_df`` and ≤
    ``max_df_frac``·N forms a base cluster scored ``|B| · f(|P|)`` with the
    paper's length adjustment f(1)=0.5, f(m)=min(m, 6). The paper's suffix
    tree is a single-machine device for enumerating shared phrases; the
    same base-cluster set falls out of one distributed n-gram explode +
    groupBy (phrases a suffix tree would merge — sub-phrases with identical
    doc sets — are collapsed by phase 2 exactly as the paper describes).

    Phase 2 (merge): base clusters a, b connect when |A∩B|/|A| and
    |A∩B|/|B| both exceed ``merge_threshold`` (the paper's 0.5 binary
    similarity); final clusters are the connected components, ranked by the
    sum of member base-cluster scores, labeled by the best member phrase
    (score desc, longer = more specific first, then lexicographic).

    Scale shape: phase 1 is distributed (explode + one groupBy over the
    top-N result window's text). Phase 2 runs on at most ``max_base``
    base clusters (the paper caps at 500) — a driver-side union-find over a
    bounded set, the appropriate shape for a per-query component whose
    input is a result page, not the corpus.

    Returns one row per (doc, cluster) membership — STC clusters OVERLAP by
    design — plus (id, 'Other topics', 0) for docs in no cluster:
    (id, label, cluster_rank, cluster_score).
    """
    ids = results.select(F.col(id_col).alias("id"))
    n_r = ids.count()
    toks = results.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("toks")
    )
    grams = toks.select(
        "id",
        F.explode(
            F.array_distinct(F.flatten(F.array(*gram_arrays(1, max_phrase))))
        ).alias("phrase"),
    ).where(F.col("phrase") != "")
    plen = F.size(F.split(F.col("phrase"), " "))
    base = (
        grams.groupBy("phrase")
        .agg(F.collect_set("id").alias("docs"), F.count("*").alias("df"))
        .where(
            (F.col("df") >= min_df) & (F.col("df") <= int(max_df_frac * n_r))
        )
        .select(
            "phrase",
            "docs",
            "df",
            (
                F.col("df")
                * F.when(plen == 1, F.lit(0.5)).otherwise(
                    F.least(plen, F.lit(6)).cast("double")
                )
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("phrase").asc())
        .limit(max_base)
    )
    rows = base.collect()

    # Driver-side union-find over <= max_base base clusters (paper phase 2).
    parent = list(range(len(rows)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    docsets = [frozenset(r["docs"]) for r in rows]
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            inter = len(docsets[i] & docsets[j])
            if (
                inter > merge_threshold * len(docsets[i])
                and inter > merge_threshold * len(docsets[j])
            ):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)

    comps: dict[int, list[int]] = {}
    for i in range(len(rows)):
        comps.setdefault(find(i), []).append(i)

    def label_key(i: int):
        return (-rows[i]["score"], -len(rows[i]["phrase"].split()),
                rows[i]["phrase"])

    clusters = sorted(
        (
            (
                sum(rows[i]["score"] for i in members),
                rows[min(members, key=label_key)]["phrase"],
                frozenset().union(*(docsets[i] for i in members)),
            )
            for members in comps.values()
        ),
        key=lambda c: (-c[0], c[1]),
    )[:k_clusters]

    out_rows = [
        (doc, label, rank, float(score))
        for rank, (score, label, docs) in enumerate(clusters, start=1)
        for doc in sorted(docs)
    ]
    covered = {doc for _, _, docs in clusters for doc in docs}
    id_type = ids.schema[0].dataType.simpleString()
    schema = f"id {id_type}, label string, cluster_rank int, cluster_score double"
    spark = results.sparkSession
    assigned = spark.createDataFrame(out_rows, schema) if out_rows else (
        spark.createDataFrame([], schema)
    )
    other = (
        ids.join(
            spark.createDataFrame(
                [(d,) for d in covered] or [(None,)], f"id {id_type}"
            ),
            "id",
            "left_anti",
        )
        .select(
            "id",
            F.lit(OTHER_LABEL).alias("label"),
            F.lit(0).alias("cluster_rank"),
            F.lit(0.0).alias("cluster_score"),
        )
    )
    return assigned.unionByName(other)


def lingo_clusters(
    results: DataFrame,
    text_col: str,
    id_col: str,
    k_clusters: int = 5,
    max_phrase: int = 3,
    min_df: int = 2,
    max_df_frac: float = 0.8,
    assign_threshold: float = 0.20,
) -> DataFrame:
    """Lingo — Carrot2's DEFAULT result-clustering algorithm (Osiński &
    Weiss, "A Concept-Driven Algorithm for Clustering Search Results",
    IEEE Intelligent Systems 2005), which the reference's clustering
    contrib ships as its default engine.

    Description-comes-first, per the paper:
    1. term-document matrix A over the result window (tf-idf, unit doc
       columns; terms with df ≥ ``min_df`` and ≤ ``max_df_frac``·N),
    2. SVD of A; the top ``k_clusters`` left singular vectors are the
       abstract concepts,
    3. label induction: each concept is matched against the frequent-
       phrase candidates (token n-grams, n ≤ ``max_phrase``, df ≥
       ``min_df``) expressed as unit vectors in the same term space; the
       phrase with the highest |cosine| becomes the concept's label,
    4. cluster content: doc d joins label j when cos(label_j, doc_d) >
       ``assign_threshold``; docs matching no label land in Other,
    5. cluster score = label-concept cosine × member count (Carrot2's
       size-weighted label score), rank by score desc then label.

    Scale shape: term/phrase statistics and the (term, doc, tf) triples
    come from distributed aggregations over the result window; the SVD
    runs driver-side on the collected T×N matrix — N is the result page
    (tens of docs) by construction, same scope as the reference component.
    Clusters OVERLAP (a doc may match several labels), like the paper.

    Returns (id, label, cluster_rank, cluster_score).
    """
    ids = results.select(F.col(id_col).alias("id"))
    n_r = ids.count()
    toks = results.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("toks")
    )
    triples = (
        toks.select("id", F.explode("toks").alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    tstats = triples.groupBy("term").agg(F.countDistinct("id").alias("df"))
    tstats = tstats.where(
        (F.col("df") >= min_df) & (F.col("df") <= int(max_df_frac * n_r))
    )
    trows = (
        triples.join(tstats, "term")
        .select("id", "term", "tf", "df")
        .collect()
    )

    phrase_rows = (
        toks.select(
            "id",
            F.explode(
                F.array_distinct(F.flatten(F.array(*gram_arrays(2, max_phrase))))
            ).alias("phrase"),
        )
        .where(F.col("phrase") != "")
        .groupBy("phrase")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
        .collect()
    ) if max_phrase >= 2 else []

    import numpy as np

    terms = sorted({r["term"] for r in trows})
    docs = sorted({r["id"] for r in trows})
    if not terms or not docs:
        return ids.select(
            "id",
            F.lit(OTHER_LABEL).alias("label"),
            F.lit(0).alias("cluster_rank"),
            F.lit(0.0).alias("cluster_score"),
        )
    t_ix = {t: i for i, t in enumerate(terms)}
    d_ix = {d: j for j, d in enumerate(docs)}
    A = np.zeros((len(terms), len(docs)))
    idf = {}
    for r in trows:
        idf[r["term"]] = np.log(n_r / r["df"])
        A[t_ix[r["term"]], d_ix[r["id"]]] = r["tf"] * idf[r["term"]]
    norms = np.linalg.norm(A, axis=0)
    norms[norms == 0] = 1.0
    A /= norms

    # label candidates: qualifying single terms + frequent phrases whose
    # member terms all survived the df filters, as unit term-space vectors
    cand_labels: list[str] = list(terms)
    cand_vecs = [np.eye(len(terms))[t_ix[t]] for t in terms]
    for r in phrase_rows:
        ws = r["phrase"].split(" ")
        if all(w in t_ix for w in ws):
            v = np.zeros(len(terms))
            for w in ws:
                v[t_ix[w]] += idf[w]
            n = np.linalg.norm(v)
            if n > 0:
                cand_labels.append(r["phrase"])
                cand_vecs.append(v / n)
    P = np.column_stack(cand_vecs)

    k = min(k_clusters, min(A.shape))
    U, s, _ = np.linalg.svd(A, full_matrices=False)
    chosen: list[tuple[str, np.ndarray, float]] = []
    used: set[str] = set()
    for i in range(k):
        m = np.abs(U[:, i] @ P)
        for j in np.argsort(-m, kind="stable"):
            if cand_labels[j] not in used:
                used.add(cand_labels[j])
                chosen.append((cand_labels[j], P[:, j], float(m[j])))
                break

    out_rows = []
    clusters = []
    for label, vec, lscore in chosen:
        sims = vec @ A
        members = [docs[j] for j in range(len(docs))
                   if sims[j] > assign_threshold]
        if members:
            clusters.append((lscore * len(members), label, members))
    clusters.sort(key=lambda c: (-c[0], c[1]))
    for rank, (score, label, members) in enumerate(clusters, start=1):
        for d in sorted(members):
            out_rows.append((d, label, rank, float(score)))

    covered = {d for _, _, ms in clusters for d in ms}
    id_type = ids.schema[0].dataType.simpleString()
    schema = f"id {id_type}, label string, cluster_rank int, cluster_score double"
    spark = results.sparkSession
    assigned = spark.createDataFrame(out_rows, schema) if out_rows else (
        spark.createDataFrame([], schema)
    )
    other = (
        ids.join(
            spark.createDataFrame(
                [(d,) for d in covered] or [(None,)], f"id {id_type}"
            ),
            "id",
            "left_anti",
        )
        .select(
            "id",
            F.lit(OTHER_LABEL).alias("label"),
            F.lit(0).alias("cluster_rank"),
            F.lit(0.0).alias("cluster_score"),
        )
    )
    return assigned.unionByName(other)


def bisecting_kmeans_clusters(
    results: DataFrame,
    text_col: str,
    id_col: str,
    k_clusters: int = 5,
    min_df: int = 2,
    max_df_frac: float = 0.8,
    label_terms: int = 3,
    max_iter: int = 20,
    max_phrase: int = 1,
) -> DataFrame:
    """Bisecting k-means — the third clustering engine the reference's
    contrib ships (result-clustering.adoc: Lingo, STC, Bisecting K-Means;
    the algorithm is Steinbach/Karypis/Kumar, "A Comparison of Document
    Clustering Techniques", KDD 2000 workshop).

    Doc vectors are unit tf-idf columns (same preprocessing as Lingo);
    with ``max_phrase`` > 1 the feature space additionally includes
    positional token n-grams (n ≤ ``max_phrase``) under the same df
    bounds — Carrot2's preprocessing also feeds phrases into the vector
    space, and on corpora with a small unigram vocabulary the phrases
    carry all the df contrast.
    Starting from one all-docs cluster, the largest cluster is repeatedly
    split by 2-means until ``k_clusters`` exist. DETERMINISTIC
    initialization replaces Carrot2's random restarts: seed A = the
    cluster's lowest doc id, seed B = the doc with minimal cosine to A
    (ties to lower id); Lloyd iterations then converge identically at any
    parallelism. Labels are the top-``label_terms`` centroid terms
    (comma-joined); score = mean member cosine to centroid × size.
    Assignment is HARD (non-overlapping) — unlike Lingo/STC.

    Same scope as the reference component: the distributed part feeds
    (term, doc, tf/df) aggregates; the bisection loop runs driver-side on
    the result page's T×N matrix.

    Returns (id, label, cluster_rank, cluster_score).
    """
    ids = results.select(F.col(id_col).alias("id"))
    n_r = ids.count()
    toks = results.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("toks")
    )
    units = toks.select("id", F.explode("toks").alias("term"))
    if max_phrase >= 2:
        grams = toks.select(
            "id",
            F.explode(F.flatten(F.array(*gram_arrays(2, max_phrase)))).alias(
                "term"
            ),
        ).where(F.col("term") != "")
        units = units.unionByName(grams)
    triples = units.groupBy("id", "term").agg(F.count("*").alias("tf"))
    tstats = triples.groupBy("term").agg(F.countDistinct("id").alias("df"))
    tstats = tstats.where(
        (F.col("df") >= min_df) & (F.col("df") <= int(max_df_frac * n_r))
    )
    trows = triples.join(tstats, "term").select("id", "term", "tf", "df").collect()

    import numpy as np

    terms = sorted({r["term"] for r in trows})
    docs = sorted({r["id"] for r in trows})
    if not terms or not docs:
        return ids.select(
            "id",
            F.lit(OTHER_LABEL).alias("label"),
            F.lit(0).alias("cluster_rank"),
            F.lit(0.0).alias("cluster_score"),
        )
    t_ix = {t: i for i, t in enumerate(terms)}
    d_ix = {d: j for j, d in enumerate(docs)}
    A = np.zeros((len(terms), len(docs)))
    for r in trows:
        A[t_ix[r["term"]], d_ix[r["id"]]] = r["tf"] * np.log(n_r / r["df"])
    norms = np.linalg.norm(A, axis=0)
    norms[norms == 0] = 1.0
    A /= norms

    def _two_means(members: list[int]) -> tuple[list[int], list[int]]:
        a = members[0]                       # lowest doc index (docs sorted)
        sims_a = A[:, a] @ A[:, members]
        b = members[int(np.argmin(sims_a))]
        if b == a:
            return members, []
        # Lloyd on unit vectors (spherical k-means): centroids renormalized
        ca, cb = A[:, a].copy(), A[:, b].copy()
        assign_prev = None
        for _ in range(max_iter):
            sa = ca @ A[:, members]
            sb = cb @ A[:, members]
            assign = sa >= sb                # ties to the A side
            if assign_prev is not None and np.array_equal(assign, assign_prev):
                break
            assign_prev = assign
            ga = [m for m, f in zip(members, assign) if f]
            gb = [m for m, f in zip(members, assign) if not f]
            if not ga or not gb:
                return members, []
            ca = A[:, ga].mean(axis=1)
            cb = A[:, gb].mean(axis=1)
            ca /= max(np.linalg.norm(ca), 1e-12)
            cb /= max(np.linalg.norm(cb), 1e-12)
        return ga, gb

    clusters: list[list[int]] = [list(range(len(docs)))]
    while len(clusters) < k_clusters:
        clusters.sort(key=lambda c: (-len(c), c[0]))
        target = clusters[0]
        if len(target) < 2:
            break
        ga, gb = _two_means(target)
        if not gb:
            break
        clusters = clusters[1:] + [ga, gb]

    scored = []
    for members in clusters:
        c = A[:, members].mean(axis=1)
        cn = max(np.linalg.norm(c), 1e-12)
        cohesion = float(np.mean((c / cn) @ A[:, members]))
        top = np.argsort(-c, kind="stable")[:label_terms]
        label = ", ".join(terms[i] for i in top if c[i] > 0)
        scored.append((cohesion * len(members), label or OTHER_LABEL, members))
    scored.sort(key=lambda s: (-s[0], s[1]))

    out_rows = [
        (docs[m], label, rank, float(score))
        for rank, (score, label, members) in enumerate(scored, start=1)
        for m in sorted(members)
    ]
    id_type = ids.schema[0].dataType.simpleString()
    schema = f"id {id_type}, label string, cluster_rank int, cluster_score double"
    spark = results.sparkSession
    assigned = spark.createDataFrame(out_rows, schema)
    other = (
        ids.join(assigned.select("id"), "id", "left_anti")
        .select(
            "id",
            F.lit(OTHER_LABEL).alias("label"),
            F.lit(0).alias("cluster_rank"),
            F.lit(0.0).alias("cluster_score"),
        )
    )
    return assigned.unionByName(other)


def cluster_summary(assignments: DataFrame) -> DataFrame:
    """(label, label_rank, n_docs) per discovered cluster, Other last."""
    return (
        assignments.groupBy("label", "label_rank")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(
            F.when(F.col("label_rank") == 0, F.lit(10**9)).otherwise(
                F.col("label_rank")
            )
        )
    )
