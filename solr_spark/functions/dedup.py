"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The reference ships dedup as an ingest transform
(solr/core/src/java/org/apache/solr/update/processor/
SignatureUpdateProcessorFactory.java — md5 of concatenated fields — and
Lookup3Signature/TextProfileSignature variants) plus a MinHash query
(search/MinHashQParserPlugin.java). Here the family is rebuilt as DataFrame
operators sized for corpus-scale curation.

Scale shapes:
- exact:     one groupBy on the content hash (map-side combine; no skew —
             dup groups are small by definition).
- jaccard:   exact pairwise via a self-join on shingle hash. O(Σ df²) —
             the VERIFY step for candidates, not the discovery step.
- minhash:   partition-local shingle explode, then ONE groupBy whose k
             aggregate columns are the permutation-mins — partial (map-side)
             aggregation collapses to one row per doc before the shuffle;
             then LSH banding: docs sharing any (band, band-signature)
             bucket become candidate pairs. The only shuffles are the
             per-doc signature combine and the band keys — the classic
             sub-quadratic path.
- simhash:   64-bit-ish (60-bit) signature from tf-weighted term-hash bits;
             near-dups = signatures within Hamming distance d, discovered by
             exact-match on bit-blocks (pigeonhole: d/4-block partitioning).

Determinism/portability: hashes derive from md5 hex (identical across
engines); the MinHash permutation family works mod 2^31-1 so every product
fits a plain 64-bit integer in BOTH engines (no overflow semantics, full
whole-stage codegen). Parameters come from a seeded generator shared with
the SQL oracle builder.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Permutation family modulus: 2^31-1 keeps every product a*(x mod p)+b under
# 2^62, so the k hash functions run in PLAIN LONG whole-stage-codegen
# arithmetic. The earlier 2^61-1 family needed decimal(38) (Spark) / HUGEINT
# (DuckDB) — interpreted BigDecimal per shingle per function, measured ~10x
# slower end-to-end. 31-bit min-hashes lose nothing statistically at any
# realistic shingle count (collision odds n/2^31).
MOD_PRIME = (1 << 31) - 1


def content_hash(text: Column) -> Column:
    """Portable 60-bit content hash (md5 hex prefix as int64)."""
    return F.conv(F.substring(F.md5(text), 1, 15), 16, 10).cast("long")


def minhash_params(k: int, seed: int = 1337) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs for h_i(x) = (a·(x mod p) + b) mod p."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MOD_PRIME), rng.randrange(0, MOD_PRIME))
        for _ in range(k)
    ]


def tokens_col(text: Column) -> Column:
    """simple-analyzer tokenization as a JVM expression (matches
    analysis.chain 'simple' and the SQL oracle's regexp_split_to_array)."""
    return F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != ""
    )


def shingles_from_tokens(toks: Column, n: int = 3, hash: str = "md5") -> Column:
    """Distinct hashed n-gram shingles (array<long>) of a TOKEN ARRAY
    column. Callers with a DataFrame in hand should bind the tokenization
    into its own projection first (``select(tokens_col(text).alias(...))``)
    and pass the bound column — ``toks`` is referenced n+1 times here, so
    an inline tokenization expression would be evaluated that many times
    per row.

    CAPTURE-FREE gram build: the n shifted token slices are the zip_with
    calls' ARRAY ARGUMENTS (evaluated once per row each), and every lambda
    touches only its parameters. The previous index-transform formulation
    did slice(toks, i, n) INSIDE the lambda — a higher-order lambda
    re-evaluates captured subexpressions per element, so the whole
    tokenization (split + filter) ran once PER SHINGLE: measured 8x slower
    on the 3-shingle pipeline at 50k docs (41 s -> 5 s bound / 6.9 s
    unbound). Gram strings are byte-identical (concat of non-empty tokens
    == concat_ws over the slice), so every md5 oracle value is unchanged.

    ``hash``: "md5" (default) is the PORTABLE hash — byte-identical in
    DuckDB, so every oracle checks against it. "xxhash64" is Spark's native
    codegen hash, measured ~3x faster on the shingle pipeline — the
    production fast path when cross-engine reproducibility isn't needed
    (both are deterministic within Spark).
    """
    m = F.size(toks) - (n - 1)  # number of shingles (may be <= 0)

    def seg(j: int) -> Column:
        return F.slice(toks, j + 1, m)

    joined = seg(0)
    for j in range(1, n):
        joined = F.zip_with(
            joined, seg(j), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    grams = F.when(m >= 1, joined).otherwise(F.array().cast("array<string>"))
    if hash == "xxhash64":
        hf = lambda s: F.xxhash64(s)  # noqa: E731 (varargs fn -> unary lambda)
    elif hash == "md5":
        hf = content_hash
    else:
        raise ValueError(f"unknown hash {hash!r}; 'md5' or 'xxhash64'")
    return F.array_distinct(F.transform(grams, hf))


def shingle_hashes(text: Column, n: int = 3, hash: str = "md5") -> Column:
    """Distinct hashed token n-gram shingles of a TEXT column (array<long>):
    ``shingles_from_tokens(tokens_col(text), ...)``. Column-level
    convenience; DataFrame-level operators bind the tokenization first and
    call :func:`shingles_from_tokens` (see its docstring for why)."""
    return shingles_from_tokens(tokens_col(text), n, hash=hash)


def _tokens_bound(df: DataFrame, text_col: str, *keep: Column) -> DataFrame:
    """Projection binding the 'simple' tokenization ONCE as ``_tk`` (plus
    any ``keep`` columns) — the prerequisite for shingles_from_tokens'
    once-per-row cost."""
    return df.select(*keep, tokens_col(F.col(text_col)).alias("_tk"))


# --- exact ------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Duplicate groups by exact content hash: (hash, canonical_id, n_dups).

    canonical = min id (the row a curation pipeline would keep)."""
    return (
        df.select(
            content_hash(F.col(text_col)).alias("hash"), F.col(id_col).alias("id")
        )
        .groupBy("hash")
        .agg(F.min("id").alias("canonical_id"), F.count("*").alias("n"))
        .where(F.col("n") > 1)
    )


# --- exact n-gram Jaccard ---------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """All pairs (id_a < id_b) with shingle-set Jaccard >= threshold.

    Exact O(pairs-sharing-a-shingle) self-join — the verification-grade
    measure. At corpus scale run it only on LSH candidates."""
    sh = _tokens_bound(df, text_col, F.col(id_col).alias("id")).select(
        "id",
        F.explode(shingles_from_tokens(F.col("_tk"), n)).alias("sh"),
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "jaccard")


# --- MinHash + LSH ----------------------------------------------------------


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, k: int = 32,
    n: int = 3, seed: int = 1337, hash: str = "md5",
) -> DataFrame:
    """(id, minhash: array<long>[k]) — k permutation-min signatures.

    Docs with zero shingles (< n tokens) yield no row, as before."""
    params = minhash_params(k, seed)
    # One Generate (partition-local explode) so each shingle is hashed
    # EXACTLY once, then the k permutation-mins ride ONE groupBy as k
    # aggregate columns — partial aggregation collapses to a single row per
    # doc before the shuffle. (The tempting alternative — k array
    # transforms over a shared shingle column — gets its projects collapsed
    # by Catalyst, duplicating the md5 shingle pipeline into every one of
    # the k expressions: measured ~10x slower.)
    sh = _tokens_bound(df, text_col, F.col(id_col).alias("id")).select(
        "id",
        F.explode(shingles_from_tokens(F.col("_tk"), n, hash=hash)).alias("_h"),
    )
    # pmod: xxhash64 values are signed — a plain % would leak negative
    # residues and bias every min toward them
    hmod = F.pmod(F.col("_h"), F.lit(MOD_PRIME))
    aggs = [
        F.min((F.lit(a) * hmod + F.lit(b)) % F.lit(MOD_PRIME)).alias(f"_m{i}")
        for i, (a, b) in enumerate(params)
    ]
    return (
        sh.groupBy("id")
        .agg(*aggs)
        .select(
            "id", F.array(*[F.col(f"_m{i}") for i in range(k)]).alias("minhash")
        )
    )


def _band_sigs(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(id, band, sig) — one row per (doc, band); the banded LSH key."""
    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "-",
                            *[
                                F.col("minhash")[b * rows_per_band + r]
                                for r in range(rows_per_band)
                            ],
                        ).alias("sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("id", "bs.band", "bs.sig")


def incremental_lsh_dedup(
    new_sigs: DataFrame,
    corpus_sigs: DataFrame,
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Dedup an incoming batch AGAINST an existing corpus (the incremental
    crawl-ingest shape: the corpus signatures are precomputed and stored;
    only the new batch is shingled+hashed this run).

    Returns one row per new doc: (id, n_dup_of) — n_dup_of = number of
    DISTINCT corpus docs sharing at least one full band signature; 0 rows
    are docs with no candidate (keep), n_dup_of >= 1 are candidates to
    verify/drop. New-vs-new duplicates are minhash_lsh_pairs on the batch.

    Shape at scale: the join key is (band, sig) — corpus side shuffles
    once per ingest on that key (or is bucket-stored on it between
    ingests); never an all-pairs comparison, and the small new batch
    never forces a corpus re-scan of text.
    """
    nb = _band_sigs(new_sigs, bands, rows_per_band)
    cb = _band_sigs(corpus_sigs, bands, rows_per_band).select(
        F.col("id").alias("corpus_id"), "band", "sig"
    )
    return (
        nb.join(cb, ["band", "sig"])
        .groupBy("id")
        .agg(F.countDistinct("corpus_id").alias("n_dup_of"))
    )


def minhash_lsh_pairs(
    sigs: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Candidate near-dup pairs from LSH banding over signatures.

    Docs sharing the full r-row signature of ANY band collide. Returns
    distinct (id_a < id_b, n_bands) — n_bands = number of colliding bands
    (a cheap confidence proxy). Verify candidates with ngram_jaccard_pairs
    or the minhash Jaccard estimate."""
    banded = _band_sigs(sigs, bands, rows_per_band)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.countDistinct("a.band").alias("n_bands"))
    )


def minhash_jaccard_estimate(sigs: DataFrame, pairs: DataFrame, k: int = 32) -> DataFrame:
    """Estimated Jaccard = fraction of agreeing signature positions."""
    s_a = sigs.select(F.col("id").alias("id_a"), F.col("minhash").alias("mh_a"))
    s_b = sigs.select(F.col("id").alias("id_b"), F.col("minhash").alias("mh_b"))
    agree = F.size(
        F.filter(
            F.zip_with(F.col("mh_a"), F.col("mh_b"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    return (
        pairs.join(s_a, "id_a")
        .join(s_b, "id_b")
        .select("id_a", "id_b", (agree / F.lit(k)).alias("est_jaccard"))
    )


# --- SimHash ----------------------------------------------------------------

SIMHASH_BITS = 60  # content_hash yields 60-bit values


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, simhash long) — tf-weighted 60-bit SimHash of the token stream.

    bit_j(sig) = 1 iff Σ_terms tf·(2·bit_j(h(term)) − 1) > 0.

    PRODUCTION shape: one row per (id, distinct term) with the 60 per-bit
    signed sums as 60 aggregate COLUMNS of a single groupBy(id) — pure JVM
    whole-stage codegen, one shuffle keyed by id, and NO bit-dimension row
    explosion (the long-form terms×60 variant below exists only as the
    SQL-oracle cross-check; at 100 TB the 60× row blowup is a scale-killer).
    """
    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens_col(F.col(text_col))).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", content_hash(F.col("term")))
    )
    # Σ tf·(2·bit_j − 1) = 2·Σ tf·bit_j − Σ tf, per bit j, as plain columns.
    per_bit = tf.groupBy("id").agg(
        *[
            F.sum(
                F.col("tf")
                * (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)).cast("long") * 2 - 1)
            ).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    sig = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = bit if sig is None else sig + bit
    return per_bit.select("id", sig.alias("simhash"))


def simhash_longform(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Long-format SimHash (terms × 60 bit-rows) — kept ONLY as the
    independent cross-check the DuckDB oracle can reproduce; use simhash()
    in pipelines. Both produce identical signatures (tested)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    tf = tf.withColumn("h", content_hash(F.col("term")))
    bits = tf.select(
        "id",
        "tf",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("j"),
    ).withColumn(
        "contrib",
        F.col("tf") * (F.expr("shiftright(h, j) & 1L") * 2 - 1),
    )
    per_bit = bits.groupBy("id", "j").agg(F.sum("contrib").alias("s"))
    return (
        per_bit.withColumn(
            "bitval",
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, j)")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        .groupBy("id")
        .agg(F.sum("bitval").cast("long").alias("simhash"))
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    sig: DataFrame, max_distance: int = 3, n_blocks: int = 4
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_distance.

    Pigeonhole blocking: split the signature into n_blocks bit-blocks; any
    pair within distance d < n_blocks must agree exactly on >= 1 block, so
    candidates come from equality joins on block values (sub-quadratic),
    then exact bit_count verification."""
    width = SIMHASH_BITS // n_blocks
    blocked = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright(F.col("simhash"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("bv"),
    ).select("id", "simhash", "bv.blk", "bv.val")
    a = blocked.alias("a")
    b = blocked.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn("dist", hamming64(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("dist") <= max_distance)
        .select("id_a", "id_b", "dist")
    )


# --- embedding-cosine near-dup ----------------------------------------------


def hyperplane_band_sigs(
    vec: Column, planes, bands: int, planes_per_band: int
) -> Column:
    """Array of ``bands`` signature longs; band b's signature packs the sign
    bits of ``vec · plane`` for that band's ``planes_per_band`` hyperplanes.
    Two vectors at angle θ agree on one plane's sign with probability
    1 - θ/π, so near-parallel vectors collide on whole bands while unrelated
    ones rarely do — the banded random-hyperplane LSH family (Charikar,
    STOC'02). Pure JVM expressions (literal plane arrays + zip_with dot)."""
    from solr_spark.functions.ann import _lit_vec, dot

    sigs = []
    for b in range(bands):
        sig = F.lit(0).cast("long")
        for p in range(planes_per_band):
            plane = planes[b * planes_per_band + p]
            pa = _lit_vec(plane)  # 64 hyperplanes x dim: one py4j call each
            sig = sig + F.when(
                dot(vec, pa) >= 0, F.lit(1 << p).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        sigs.append(sig)
    return F.array(*sigs)


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 8,
    planes_per_band: int = 8,
    seed: int = 777,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine(a, b) >= threshold.

    Discovery is banded hyperplane LSH — each vector lands in ``bands``
    buckets; a pair is a candidate iff it shares >= 1 (band, signature)
    bucket. The only shuffle is the equality join on band signatures
    (sub-quadratic, the MinHash-banding shape); candidates are then verified
    with the exact JVM cosine. Recall is 1-(1-p^r)^b for per-plane agreement
    p = 1 - θ/π: with the default 8x8 at cosine 0.999 the per-pair miss
    probability is ~1e-9 — tune bands up for looser thresholds. Unlike
    pigeonhole SimHash blocking this is probabilistic, so callers needing a
    guarantee should raise ``bands`` until b·ln(1-p^r) clears their budget.
    """
    from solr_spark.functions.ann import cosine, lsh_planes

    dim = len(vectors.select(vec_col).first()[0])
    planes = lsh_planes(dim, bands * planes_per_band, seed)
    v = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    sigged = v.select(
        "id",
        "vec",
        F.posexplode(
            hyperplane_band_sigs(F.col("vec"), planes, bands, planes_per_band)
        ).alias("band", "sig"),
    )
    a, b = sigged.alias("a"), sigged.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.vec").alias("vec_a"),
            F.col("b.vec").alias("vec_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.withColumn("sim", cosine(F.col("vec_a"), F.col("vec_b")))
        .where(F.col("sim") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "sim")
    )


def dup_clusters(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over near-duplicate pairs -> (node, cluster).

    The step a 100 TB dedup pipeline runs AFTER pair discovery (minhash /
    simhash / cosine buckets emit PAIRS; dropping duplicates needs the
    transitive closure so each group keeps exactly one canonical doc).
    cluster = the component's minimum node id; is_canonical = node equals
    it.

    Iterative min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels (one join + one groupBy per
    round), converging in O(component diameter) rounds — near-dup
    components are short chains in practice, so this terminates in a few
    rounds. Lineage is cut per round (localCheckpoint) so the plan stays
    flat. For adversarially long chains swap in the large-star/small-star
    alternation (Kiveris et al., "Connected Components in MapReduce"),
    which needs O(log^2 n) rounds; same interface.
    """
    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("label").alias("nl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("mn"))
            .withColumnRenamed("src", "node")
        )
        new_labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("mn"), F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.select("node", F.col("label").alias("old")), "node"
            )
            .where(F.col("label") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        "node",
        F.col("label").alias("cluster"),
        (F.col("node") == F.col("label")).alias("is_canonical"),
    )


# --- decontamination ----------------------------------------------------------


def contamination_scores(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    hash: str = "md5",
) -> DataFrame:
    """Train/test decontamination: per training doc, the fraction of its
    distinct token ``n``-gram shingles that appear ANYWHERE in the
    benchmark set — the standard eval-leakage screen a training-data
    pipeline runs before a corpus ships.

    Returns (id, n_shingles, n_hit, contamination) for every training doc
    with at least one shingle; ``contamination`` in [0, 1].

    Shape at scale: benchmark shingles become one DISTINCT hash set
    (shuffled once, or broadcast when the benchmark is small — benchmarks
    are); training docs explode to (id, shingle-hash) rows, a left semi-ish
    join marks hits, ONE groupBy re-packs per doc. No pairwise comparison
    with benchmark docs ever happens — membership, not similarity.
    """
    bh = (
        _tokens_bound(benchmark, text_col).select(
            F.explode(shingles_from_tokens(F.col("_tk"), n, hash=hash)).alias("h")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    th = _tokens_bound(train, text_col, F.col(id_col).alias("id")).select(
        "id",
        F.explode(shingles_from_tokens(F.col("_tk"), n, hash=hash)).alias("h"),
    )
    # no broadcast hint: the planner auto-broadcasts a small benchmark and
    # falls back to a shuffle join when the shingle set outgrows the
    # threshold — forcing broadcast would OOM on a large benchmark suite
    return (
        th.join(bh, "h", "left")
        .groupBy("id")
        .agg(
            F.count("*").cast("int").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("int").alias("n_hit"),
        )
        .withColumn(
            "contamination", F.col("n_hit") / F.col("n_shingles")
        )
    )


# --- exact duplicate spans (Lee et al. 2021) ----------------------------------


def _window_hash_array(toks: Column, n: Column, k: int, hash: str) -> Column:
    """array<long> of hashes of every k-token window (stride 1) of ``toks``.
    Caller guarantees n >= k.

    "md5" (portable oracle default) hashes the space-joined window STRING —
    byte-identical in DuckDB but it materializes ~k tokens of text per
    position (O(T·k) bytes per doc; at k=50 a 50× transient blowup).
    "xxhash64" is the production fast path: the same window string hashed
    with the JVM's xxhash64 intrinsic — measured 1.6× faster than md5 at
    k=50/sf0.1 (1.17 s vs 1.83 s for the full window groupBy).

    Measured dead end, recorded so it isn't retried: a "rolling" variant
    that hashes each token once and folds the k member hashes per window in
    modular long arithmetic (to avoid materializing window strings) ran 3×
    SLOWER than either string path — Catalyst inlines the token-hash array
    expression into every one of the T window transforms (the same
    CollapseProject duplication that cost minhash 8×), so the "O(T) token
    hashing" is really O(T·k) interpreted struct folds. The window string
    is a per-element transform output, stays in codegen, and the intrinsic
    hash over ~k·6 bytes is cheaper than k interpreted fold steps.
    """
    if hash == "md5":
        return F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: content_hash(F.concat_ws(" ", F.slice(toks, i, k))),
        )
    if hash == "xxhash64":
        return F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, k))),
        )
    raise ValueError(f"unknown hash {hash!r}; 'md5' or 'xxhash64'")


def duplicate_span_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 50,
    min_count: int = 2,
    hash: str = "md5",
) -> DataFrame:
    """Exact duplicate-substring detection at span granularity — the
    published ExactSubstr dedup of Lee et al. 2021 ("Deduplicating Training
    Data Makes Language Models Better"), re-expressed for Spark: the paper
    builds one suffix array over the concatenated corpus and reports every
    ``k``-token substring that occurs twice; an equivalent-by-construction
    distributed form hashes EVERY k-token window (stride 1) and keeps the
    hashes seen ≥ ``min_count`` times corpus-wide — each such window IS a
    k-token substring occurring min_count times (md5 collisions aside).

    Returns one row per doc with ≥ k tokens:
    (id, n_tokens, n_windows, n_dup_windows, covered_tokens, dup_frac) where
    ``covered_tokens`` is the union length of the duplicated windows'
    [start, start+k) intervals and ``dup_frac`` = covered/n_tokens — the
    per-doc "fraction of text that is duplicated elsewhere" a curation
    pipeline thresholds on (the paper CUTS those spans; the fraction is the
    decision signal).

    Shape at scale: window hashes are built IN-ROW (one transform over the
    token array — no per-window row until the explode), the corpus-wide
    count is one groupBy on the hash (associative, map-side combine), dup
    membership flows back as a semi-join on the hash, and the interval
    union is a pure-JVM fold over each doc's sorted start array: with
    starts sorted and every interval the same length k, union =
    Σ min(k, next_start − start) + k for the last — no sweep-line state.
    Nothing driver-side; no all-pairs anything.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = tokens_col(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("id"), toks.alias("toks"), F.size(toks).alias("n")
    ).where(F.col("n") >= k)
    win = base.select(
        "id",
        "n",
        F.posexplode(
            _window_hash_array(F.col("toks"), F.col("n"), k, hash)
        ).alias("start", "h"),
    )
    dup_h = (
        win.groupBy("h")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .select("h")
    )
    dup_starts = (
        win.join(dup_h, "h", "left_semi")
        .groupBy("id")
        .agg(
            F.array_sort(F.collect_list("start")).alias("starts"),
            F.count("*").cast("int").alias("n_dup_windows"),
        )
    )
    # union of equal-length sorted intervals as a zip_with against the
    # shifted starts (sentinel pads the tail so the last window adds k)
    nexts = F.concat(
        F.slice(F.col("starts"), 2, F.greatest(F.size("starts") - 1, F.lit(0))),
        F.array(F.lit(2**31 - 1)),
    )
    covered = F.aggregate(
        F.zip_with(
            F.col("starts"), nexts,
            lambda a, b: F.least(F.lit(k), b - a),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        base.select("id", "n")
        .join(dup_starts, "id", "left")
        .select(
            "id",
            F.col("n").cast("int").alias("n_tokens"),
            (F.col("n") - F.lit(k - 1)).cast("int").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.coalesce(covered, F.lit(0)).cast("int").alias("covered_tokens"),
            (F.coalesce(covered, F.lit(0)) / F.col("n")).alias("dup_frac"),
        )
    )


def cut_duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 50,
    hash: str = "md5",
) -> DataFrame:
    """The destructive half of Lee et al. 2021 ExactSubstr dedup: REMOVE
    every duplicated k-token span, keeping exactly the canonical (first)
    occurrence corpus-wide. Canonical = the minimal (id, start) pair per
    window hash — deterministic at any parallelism; every other occurrence's
    [start, start+k) token range is cut from its document. (The paper cuts
    byte spans found via a suffix array; this is the same policy at token
    granularity.)

    Returns (id, n_tokens, n_cut_tokens, text_clean) for EVERY input doc
    (docs shorter than k tokens, or with no duplicated window, pass through
    with the token-normalized text — the transform's output space is
    tokenized text, so untouched docs are re-joined from their tokens too,
    keeping the output uniform).

    Shape at scale: one window explode, one groupBy(h) min-struct to elect
    canonicals, one semi-ish join back, one groupBy(id) to pack cut starts,
    then a pure-JVM per-token filter (no Python, no driver). The per-token
    coverage test is exists() over the doc's cut-start array — bounded by
    the doc's own duplication, not the corpus.
    """
    toks = tokens_col(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("id"), toks.alias("toks"), F.size(toks).alias("n")
    )
    eligible = base.where(F.col("n") >= k)
    win = eligible.select(
        "id",
        F.posexplode(
            _window_hash_array(F.col("toks"), F.col("n"), k, hash)
        ).alias("start", "h"),
    )
    canon = win.groupBy("h").agg(
        F.min(F.struct("id", "start")).alias("c"),
        F.count("*").alias("cnt"),
    ).where(F.col("cnt") >= 2)
    cuts = (
        win.join(canon, "h")
        .where(
            (F.col("id") != F.col("c.id")) | (F.col("start") != F.col("c.start"))
        )
        .groupBy("id")
        .agg(F.array_sort(F.collect_set("start")).alias("cut_starts"))
    )
    joined = base.join(cuts, "id", "left").withColumn(
        "cut_starts",
        F.coalesce("cut_starts", F.array().cast("array<int>")),
    )
    kept = F.filter(
        F.transform(
            F.col("toks"), lambda t, i: F.struct(t.alias("t"), i.alias("i"))
        ),
        lambda s: ~F.exists(
            F.col("cut_starts"),
            lambda c: (c <= s["i"]) & (s["i"] < c + F.lit(k)),
        ),
    )
    return joined.select(
        "id",
        F.col("n").cast("int").alias("n_tokens"),
        (F.col("n") - F.size(kept)).cast("int").alias("n_cut_tokens"),
        F.concat_ws(" ", F.transform(kept, lambda s: s["t"])).alias("text_clean"),
    )


# --- TextProfileSignature (reference parity) ---------------------------------


def text_profile_signature(
    df: DataFrame,
    text_col: str,
    id_col: str,
    quant_rate: float = 0.01,
    min_token_len: int = 2,
) -> DataFrame:
    """Solr's fuzzy dedup signature (update/processor/
    TextProfileSignature.java:49, copied there from Apache Nutch): lowercase
    alnum tokens LONGER than ``min_token_len``; quant = round(maxFreq *
    quant_rate) clamped to 2 when maxFreq > 1 (else 1); each token's count
    floored to a quant multiple, tokens below quant discarded; the profile
    "token count" lines joined by newline in count-descending order; md5 of
    the profile is the signature. Docs whose boilerplate-heavy texts differ
    only in rare tokens hash identically.

    One divergence, deliberate: the reference sorts ties in HashMap
    iteration order (unspecified, JVM-dependent); here ties break by token
    ascending so the signature is deterministic and oracle-checkable.

    Returns (id, signature). Shape: explode + two keyed aggregations, both
    on the (id[, term]) keys — partial aggregation combines map-side; no
    driver involvement, no pairwise anything.
    """
    toks = F.filter(
        tokens_col(F.col(text_col)),
        lambda t: F.length(t) > min_token_len,
    )
    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").cast("int").alias("cnt"))
    )
    quant = F.when(
        F.round(F.col("_maxf") * F.lit(float(quant_rate))).cast("int") >= 2,
        F.round(F.col("_maxf") * F.lit(float(quant_rate))).cast("int"),
    ).otherwise(F.when(F.col("_maxf") > 1, F.lit(2)).otherwise(F.lit(1)))
    maxf = tf.groupBy("id").agg(F.max("cnt").alias("_maxf"))
    q = tf.join(maxf, "id").withColumn("_q", quant)
    kept = q.withColumn(
        "_qcnt", (F.col("cnt") / F.col("_q")).cast("int") * F.col("_q")
    ).where(F.col("_qcnt") >= F.col("_q"))
    profile = (
        kept.groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct((-F.col("_qcnt")).alias("nc"), "term"))
            ).alias("_p")
        )
        .select(
            "id",
            F.md5(
                F.array_join(
                    F.transform(
                        F.col("_p"),
                        lambda s: F.concat_ws(
                            " ", s["term"], (-s["nc"]).cast("string")
                        ),
                    ),
                    "\n",
                )
            ).alias("signature"),
        )
    )
    return profile


def keep_best_canonical(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "node",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware canonical election over dedup clusters: instead of
    dup_clusters' minimum-id survivor, keep the HIGHEST-SCORING member of
    each component (ties -> lowest id) — the real pipeline policy ("keep
    the longest / highest-quality duplicate", e.g. the RefinedWeb and
    FineWeb dedup stages).

    One join + one groupBy: the winner is min(struct(-score, id)) per
    cluster — no window, deterministic at any parallelism. Returns
    (node, cluster, score, keep)."""
    joined = clusters.join(
        scores.select(F.col(id_col).alias("node"),
                      F.col(score_col).cast("double").alias("_score")),
        "node",
    )
    best = joined.groupBy("cluster").agg(
        F.min(F.struct((-F.col("_score")).alias("ns"),
                       F.col("node").alias("win"))).alias("b")
    ).select("cluster", F.col("b.win").alias("_winner"))
    return (
        joined.join(F.broadcast(best), "cluster")
        .select(
            "node", "cluster",
            F.col("_score").alias("score"),
            (F.col("node") == F.col("_winner")).alias("keep"),
        )
    )
