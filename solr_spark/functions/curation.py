"""Training-data curation filters: Gopher repetition/quality signals,
C4 line filtering, and PII scrubbing.

All published heuristics, re-expressed as distributed DataFrame plans:

- Gopher repetition + quality rules: Rae et al. 2021, "Scaling Language
  Models: Methods, Analysis & Insights from Training Gopher", Appendix A
  (Table A1 repetition thresholds, §A1.1 quality rules).
- C4 line filters: Raffel et al. 2020, "Exploring the Limits of Transfer
  Learning with a Unified Text-to-Text Transformer", §2.2.
- PII masking patterns: the standard email/IPv4/phone regexes used by
  public corpus pipelines (e.g. BigScience ROOTS-style preprocessing).

Execution shapes (the 100 TB question):

- ``gopher_repetition`` is fully in-row: per n, sort the doc's HASHED
  gram array (struct<h,l> from once-per-doc token hashes — no gram
  strings are ever materialized) and fold adjacent-equal runs with one
  aggregate() — zero shuffle, O(g log g) per doc, no Python. (See the
  function docstring for why this beats the explode+groupBy formulation
  ~6x and the string-gram formulation's GC wall.)
- ``gopher_quality`` and ``c4_line_filter`` are pure JVM higher-order
  expressions per row: zero shuffle, zero Python.
- ``pii_scrub`` is regexp_replace chains — JVM, zero shuffle.

Tokenization is the engine's ``simple`` analyzer (lowercase,
split on non-[a-z0-9]) via :func:`solr_spark.functions.dedup.tokens_col`,
so the DuckDB oracles reproduce every value exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solr_spark.functions.dedup import tokens_col
from solr_spark.functions.textstats import LANG_PROFILES

# Gopher Table A1 thresholds (Rae et al. 2021). Fractions are of document
# characters; n-gram char spans are counted as the space-joined gram length
# (overlapping occurrences each count, so a pathological doc can exceed 1 —
# the paper's filters only ever compare against <1 thresholds, where the
# overlap inflation is conservative: it only makes a repetitive doc MORE
# likely to be dropped).
TOP_NGRAM_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_NGRAM_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}

_STOPWORDS = LANG_PROFILES["en"]  # Gopher's rule needs >=2 of a small list


def _gram_structs(th: Column, tl: Column, n: int) -> Column:
    """array<struct<h:long, l:long>> of the doc's n-grams, given the
    per-token hash array ``th`` (xxhash64 of each token, computed ONCE per
    doc) and the per-token char-length array ``tl``. ``h`` combines the n
    member token hashes with one variadic xxhash64 (order-dependent,
    64-bit); ``l`` is the char length the space-joined gram WOULD have
    (sum of token lengths + n-1 separators) — the value every downstream
    fraction is measured in.

    This is the allocation-light replacement for materialized gram
    strings: per position it is n primitive element_at reads + one
    codegen hash, no string building, and the per-n arrays it feeds to
    array_sort compare as two longs instead of byte strings. Two DISTINCT
    grams of a doc merge only on a 64-bit hash collision AND equal char
    length (< g²/2⁶⁴ per doc — at 10⁹ docs of 10³ grams, ~10⁻⁷ expected
    merges corpus-wide); the DuckDB oracle checks the real string
    semantics, so any merge would surface as a value mismatch."""
    idx = F.sequence(F.lit(0), F.size(th) - n)

    def mk(i: Column) -> Column:
        hs = [F.element_at(th, i + j + 1) for j in range(n)]
        h = F.xxhash64(*hs) if n > 1 else hs[0]
        length = F.element_at(tl, i + 1)
        for j in range(1, n):
            length = length + F.element_at(tl, i + j + 1)
        if n > 1:
            length = length + F.lit(n - 1)
        return F.struct(h.alias("h"), length.cast("long").alias("l"))

    return F.when(F.size(th) >= n, F.transform(idx, mk)).otherwise(
        F.array().cast("array<struct<h:bigint,l:bigint>>")
    )


# Cache of the per-n (sorted-gram, run-stats) column pair. Both expressions
# are pure functions of n and the FIXED internal names (_th/_tl/_gn), and a
# pyspark Column is an immutable unresolved expression tree that can be bound
# into any number of plans — but BUILDING one costs ~200 py4j round-trips per
# n (measured 1.8 s for the 9-signal set, dominating the job at bench scale).
# The cache makes every warm gopher_repetition call skip that entirely. The
# cached JVM objects live in the process-wide py4j gateway, which survives
# SparkSession restarts within a process — the cache key carries
# session.gateway_key() so a relaunched gateway JVM starts a fresh
# generation instead of handing out stale JavaObject references.
_GOPHER_N_COLS: dict[tuple, "tuple[Column, Column]"] = {}


def _gopher_n_cols(n: int) -> "tuple[Column, Column]":
    from solr_spark.session import gateway_key

    key = (gateway_key(), n)
    hit = _GOPHER_N_COLS.get(key)
    if hit is None:
        gram = F.array_sort(
            _gram_structs(F.col("_th"), F.col("_tl"), n)
        ).alias(f"_g{n}")
        stat = _run_stats(F.col(f"_g{n}")).alias(f"_s{n}")
        hit = _GOPHER_N_COLS[key] = (gram, stat)
    return hit


def _run_stats(sorted_grams: Column) -> Column:
    """struct<top_chars,dup_chars> over a SORTED array<struct<h,l>> of
    hashed grams: one aggregate() fold over adjacent-equal runs (equal =
    same hash AND same length). top = chars of the most frequent gram
    (ties to the longest — lexicographic (count, length) max, matching the
    former groupBy formulation; the max over runs is order-independent,
    so hash ordering vs lexicographic ordering cannot change it); dup =
    chars of all grams with count > 1.
    O(g) per row after the O(g log g) sort, zero shuffle.

    CAPTURE-FREE fold: everything the step needs per position — same-as-
    previous, previous length, current length — is precomputed into a pair
    array that is the aggregate's INPUT. An earlier formulation indexed the
    captured ``sorted_grams`` inside the lambda; that is fine while the
    column is a bound attribute, but the moment a downstream filter (e.g.
    ``where(gopher_repetition_keep(rep))``) is pushed through the
    projections, Catalyst substitutes the full gram pipeline into the
    lambda body and every element access re-evaluates it — O(g² log g)
    per row, measured ~2 s/doc. Input expressions, by contrast, are
    evaluated once per row no matter how they are inlined."""
    g = F.size(sorted_grams)
    empty = F.struct(
        F.lit(0).cast("long").alias("top_chars"),
        F.lit(0).cast("long").alias("dup_chars"),
    )

    # pairs[i-1] for i in 2..g: (gram[i]==gram[i-1], len(gram[i-1]), len(gram[i]))
    pairs = F.zip_with(
        F.slice(sorted_grams, 1, g - 1),
        F.slice(sorted_grams, 2, g - 1),
        lambda prev, cur: F.struct(
            ((cur["h"] == prev["h"]) & (cur["l"] == prev["l"])).alias("same"),
            prev["l"].alias("lp"),
            cur["l"].alias("lc"),
        ),
    )

    init = F.struct(
        F.lit(1).cast("long").alias("run"),
        F.lit(0).cast("long").alias("bc"),   # best run count so far
        F.lit(0).cast("long").alias("bg"),   # its gram char length
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("ll"),   # length of the last gram seen
    )

    def step(acc, p):
        same = p["same"]
        glp = p["lp"]
        better = (acc["run"] > acc["bc"]) | (
            (acc["run"] == acc["bc"]) & (glp > acc["bg"])
        )
        return F.when(
            same,
            F.struct(
                (acc["run"] + 1).alias("run"), acc["bc"].alias("bc"),
                acc["bg"].alias("bg"), acc["dup"].alias("dup"),
                p["lc"].alias("ll"),
            ),
        ).otherwise(
            F.struct(
                F.lit(1).cast("long").alias("run"),
                F.when(better, acc["run"]).otherwise(acc["bc"]).alias("bc"),
                F.when(better, glp).otherwise(acc["bg"]).alias("bg"),
                (acc["dup"] + F.when(acc["run"] > 1, acc["run"] * glp)
                 .otherwise(F.lit(0).cast("long"))).alias("dup"),
                p["lc"].alias("ll"),
            )
        )

    def finish(acc):
        gll = acc["ll"]  # close the final run (length of gram[g])
        better = (acc["run"] > acc["bc"]) | (
            (acc["run"] == acc["bc"]) & (gll > acc["bg"])
        )
        return F.struct(
            F.when(better, acc["run"] * gll)
            .otherwise(acc["bc"] * acc["bg"]).alias("top_chars"),
            (acc["dup"] + F.when(acc["run"] > 1, acc["run"] * gll)
             .otherwise(F.lit(0).cast("long"))).alias("dup_chars"),
        )

    folded = F.aggregate(pairs, init, step, finish)
    single = F.struct(
        F.element_at(sorted_grams, 1)["l"].alias("top_chars"),
        F.lit(0).cast("long").alias("dup_chars"),
    )
    return F.when(g >= 2, folded).when(g == 1, single).otherwise(empty)


def gopher_repetition(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Per-doc Gopher repetition signals (Rae et al. 2021, Table A1).

    Returns one row per doc: ``top_frac_{n}`` = chars covered by the most
    frequent n-gram / total chars, for n in ``top_ns`` (most frequent =
    highest count, ties to the longest gram — deterministic); and
    ``dup_frac_{n}`` = chars covered by ALL n-grams occurring more than
    once / total chars, for n in ``dup_ns``. Char span of a gram
    occurrence = length of the space-joined gram.

    Shape: ZERO SHUFFLE. All grams of a doc live in its own row, so each
    signal is computed in place: per n, build the gram array, sort it, and
    fold adjacent-equal runs with one aggregate() — O(g log g) per doc,
    embarrassingly parallel, no explode/groupBy round trips. (A first cut
    exploded grams into a (id, n, gram) groupBy; with mostly-unique grams
    the partial aggregation bought nothing and the double shuffle moved
    every gram string twice — this shape measured ~6x faster at sf0.1 and
    scales per-doc.) Grams are HASHED, never materialized as strings:
    tokens are xxhash64'd once per doc and each of the 9 per-n gram arrays
    is struct<h,l> built from primitive reads of the two long arrays —
    the string formulation allocated ~Σn copies of the document text per
    row and its GC pressure was the one super-linear reading in the 1000×
    growth series (see _gram_structs for the collision bound). Chained
    projections keep every reused array a BOUND column: a higher-order
    lambda re-evaluates captured subexpressions per element, so folding
    over grams built inline from tokens_col(text) would re-run the regex
    tokenization once per gram (measured 5x slower before counting the
    shuffles).
    """
    all_ns = sorted(set(top_ns) | set(dup_ns))
    toked = df.select(
        F.col(id_col).alias("id"),
        F.length(F.col(text_col)).cast("double").alias("nc"),
        tokens_col(F.col(text_col)).alias("_ts"),
    )
    # Hash + measure every token ONCE; every per-n gram array is built from
    # these two long arrays (primitive element_at reads, no string building).
    hashed = toked.select(
        "id", "nc",
        F.transform(F.col("_ts"), lambda t: F.xxhash64(t)).alias("_th"),
        F.transform(F.col("_ts"), lambda t: F.length(t).cast("long")).alias("_tl"),
    )
    per_n = [_gopher_n_cols(n) for n in all_ns]
    sorted_grams = hashed.select("id", "nc", *[g for g, _ in per_n])
    stats = sorted_grams.select("id", "nc", *[s for _, s in per_n])
    safe_nc = F.greatest(F.col("nc"), F.lit(1.0))

    # Pushdown barrier: a filter on the signal columns (the universal
    # `where(gopher_repetition_keep(rep))` shape) must NOT be pushed through
    # these projections — PushDownPredicates substitutes the full gram
    # pipeline into the condition, and element_at on a substituted array
    # re-evaluates the token-hash transform PER ELEMENT (O(g²) per row;
    # measured 45 s for 100 docs — even the old string formulation paid 47×
    # here). Wrapping each fraction in a non-deterministic no-op keeps the
    # filter above this projection, so signals are computed once per row and
    # rows drop immediately after — strictly better at any scale, since the
    # condition is derived (never a parquet-pushable predicate anyway).
    # Filters that touch only `id` still push down: column pruning removes
    # the guarded fractions first, leaving a deterministic projection.
    # (`rand() > -1` would be folded away — Spark 4 knows rand's range —
    # but rand() is never NaN, so this guard is an exact no-op the
    # optimizer keeps.)
    def guarded(expr: Column) -> Column:
        return F.when(F.isnan(F.rand(7)), F.lit(None)).otherwise(expr)

    return stats.select(
        "id",
        *[guarded(F.col(f"_s{n}.top_chars") / safe_nc).alias(f"top_frac_{n}")
          for n in top_ns],
        *[guarded(F.col(f"_s{n}.dup_chars") / safe_nc).alias(f"dup_frac_{n}")
          for n in dup_ns],
    )


def gopher_repetition_keep(rep: DataFrame) -> Column:
    """Boolean keep column for :func:`gopher_repetition` output under the
    paper's Table A1 thresholds (doc dropped when ANY signal exceeds its
    threshold)."""
    cond = F.lit(True)
    for n, t in TOP_NGRAM_THRESHOLDS.items():
        cond = cond & (F.col(f"top_frac_{n}") <= t)
    for n, t in DUP_NGRAM_THRESHOLDS.items():
        cond = cond & (F.col(f"dup_frac_{n}") <= t)
    return cond


def gopher_quality(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher §A1.1 word-level quality rules as one zero-shuffle projection.

    Per doc: word_count, mean_word_len, alpha_word_frac (words containing
    at least one alphabetic char), stopword_hits (distinct hits in a small
    English function-word list), symbol_ratio (#/... occurrences per word),
    bullet_frac / ellipsis_frac over lines, and ``keep`` under the
    published thresholds: 50 <= words <= 100000, 3 <= mean len <= 10,
    alpha fraction >= 0.8, >= 2 stopword hits, symbol ratio <= 0.1,
    bullets <= 90% of lines, ellipses <= 30% of lines.
    """
    text = F.col(text_col)
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    safe_n = F.greatest(n_words, F.lit(1))
    mean_len = F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)) / safe_n
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / safe_n
    )
    lower = F.lower(text)
    stop_hits = F.lit(0)
    for sw in _STOPWORDS:
        stop_hits = stop_hits + F.when(
            lower.rlike(f"(^|[^a-z0-9]){sw}([^a-z0-9]|$)"), 1
        ).otherwise(0)
    n_symbols = (
        F.length(text) - F.length(F.regexp_replace(text, "#", ""))
        + F.coalesce(
            F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", "")),
            F.lit(0),
        ) / 3
    )
    symbol_ratio = n_symbols / safe_n
    lines = F.filter(F.split(text, "\n"), lambda x: x != "")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = (
        F.size(F.filter(lines, lambda x: x.rlike(r"^\s*([-*•])"))) / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$"))) / n_lines
    )
    keep = (
        (n_words >= 50) & (n_words <= 100000)
        & (mean_len >= 3.0) & (mean_len <= 10.0)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_words.alias("word_count"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        keep.alias("keep"),
    )


# C4 §2.2: a line survives when it ends in terminal punctuation, has at
# least `min_words` words, and mentions none of the blocklist phrases;
# a page survives when it keeps >= `min_lines` lines and contains neither
# "lorem ipsum" nor a curly brace anywhere.
C4_TERMINAL = ('.', '!', '?', '"')
C4_LINE_BLOCKLIST = ("javascript", "cookie", "terms of use", "privacy policy")
C4_MIN_LINE_WORDS = 5


def c4_line_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_lines: int = 3,
) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2) as JVM HOFs.

    Returns (id, n_lines, n_kept, clean_text, has_lorem_ipsum, has_brace,
    keep): per-line rules (terminal punctuation, >= 5 words, no blocklist
    phrase) via one array filter; page rules (>= min_lines kept lines, no
    "lorem ipsum", no '{') on top. Zero shuffle, zero Python.
    """
    text = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )

    def line_ok(line: Column) -> Column:
        last = F.substring(line, -1, 1)
        terminal = last.isin(*C4_TERMINAL)
        n_words = F.size(F.filter(F.split(line, r"\s+"), lambda w: w != ""))
        blocked = F.lit(False)
        for phrase in C4_LINE_BLOCKLIST:
            blocked = blocked | F.contains(F.lower(line), F.lit(phrase))
        return terminal & (n_words >= C4_MIN_LINE_WORDS) & ~blocked

    kept = F.filter(lines, line_ok)
    has_lorem = F.contains(F.lower(text), F.lit("lorem ipsum"))
    has_brace = F.contains(text, F.lit("{"))
    keep = (F.size(kept) >= min_lines) & ~has_lorem & ~has_brace
    return df.select(
        F.col(id_col).alias("id"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.concat_ws("\n", kept).alias("clean_text"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        keep.alias("keep"),
    )


# Public-corpus PII patterns (RE2-safe: no backrefs, so the same pattern
# string runs in Java regex and the DuckDB oracle).
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IP": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "PHONE": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
}


def pii_scrub(
    df: DataFrame, text_col: str, out_col: str = "scrubbed"
) -> DataFrame:
    """Mask emails / IPv4s / phone-shaped numbers with <TYPE> tokens and
    count the masks per type — chained regexp_replace, zero shuffle.
    Order matters (EMAIL before IP/PHONE so 'user@1.2.3.4' masks as one
    email, not an email plus an IP); the masks themselves contain no
    digits or '@' so later patterns cannot re-match earlier masks."""
    text = F.col(text_col)
    scrubbed = text
    counts = []
    for name, pat in PII_PATTERNS.items():
        counts.append(
            F.size(F.split(scrubbed, pat, -1)) - 1
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name}>")
    out = df.withColumn(out_col, scrubbed)
    for (name, _), c in zip(PII_PATTERNS.items(), counts):
        out = out.withColumn(f"n_{name.lower()}", c.cast("int"))
    return out


def distributed_prefix_sum(
    df: DataFrame,
    value: str,
    order_key: str,
    tiebreak: str | None = None,
    n_buckets: int = 256,
    out_col: str = "cumsum",
) -> DataFrame:
    """Global running sum of ``value`` in (order_key, tiebreak) order — the
    parallel prefix-sum pattern, NOT a single-partition window.

    A plain ``Window.orderBy(...)`` with no partitionBy funnels every row
    through ONE task (the classic 100 TB killer). Instead: (1) one tiny
    min/max job fixes ``n_buckets`` equal ranges of the numeric order key;
    (2) the within-bucket running sum is a window PARTITIONED by bucket —
    parallel across buckets; (3) bucket totals (<= n_buckets rows) get
    their own running sum on the driver-sized side and broadcast-join back
    as per-bucket offsets. Wall-clock scales with the largest bucket, not
    the corpus.

    ``out_col`` is the INCLUSIVE running sum; ``out_col + '_before'`` the
    exclusive one. Deterministic when (order_key, tiebreak) is unique.
    """
    from pyspark.sql import Window

    key = F.col(order_key)
    lohi = df.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).collect()[0]
    if lohi["lo"] is None:
        return df.withColumn(out_col, F.lit(None).cast("double")).withColumn(
            f"{out_col}_before", F.lit(None).cast("double")
        )
    lo, hi = float(lohi["lo"]), float(lohi["hi"])
    span = max((hi - lo) / n_buckets, 1e-12)
    bucket = F.least(
        F.floor((key.cast("double") - F.lit(lo)) / F.lit(span)),
        F.lit(n_buckets - 1),
    ).cast("int")
    order_cols = [F.col(order_key)] + (
        [F.col(tiebreak)] if tiebreak is not None else []
    )
    w_in = Window.partitionBy("_psum_bucket").orderBy(*order_cols)
    withb = df.withColumn("_psum_bucket", bucket).withColumn(
        "_psum_in", F.sum(F.col(value).cast("double")).over(w_in)
    )
    totals = withb.groupBy("_psum_bucket").agg(
        F.sum(F.col(value).cast("double")).alias("_psum_total")
    )
    w_b = Window.orderBy("_psum_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_psum_bucket",
        F.coalesce(F.sum("_psum_total").over(w_b), F.lit(0.0)).alias(
            "_psum_offset"
        ),
    )
    out = (
        withb.join(F.broadcast(offsets), "_psum_bucket")
        .withColumn(out_col, F.col("_psum_in") + F.col("_psum_offset"))
        .withColumn(
            f"{out_col}_before",
            F.col(out_col) - F.col(value).cast("double"),
        )
        .drop("_psum_bucket", "_psum_in", "_psum_offset")
    )
    return out


def pack_concat(
    df: DataFrame,
    n_tokens_col: str,
    order_key: str,
    tiebreak: str | None = None,
    seq_len: int = 2048,
    n_buckets: int = 256,
) -> DataFrame:
    """GPT-style concat-and-cut sequence packing: lay every chunk's tokens
    end-to-end in deterministic (order_key, tiebreak) order and cut a
    training example every ``seq_len`` tokens (the packing used by the
    GPT/T5 pretraining pipelines — no padding, chunks may straddle a cut).

    Adds: ``start_pos`` (global token offset of the chunk), ``first_bin`` /
    ``last_bin`` (training examples the chunk touches). Built on
    :func:`distributed_prefix_sum`, so the scan parallelism survives at
    corpus scale; the only driver-side state is one row per bucket.
    """
    out = distributed_prefix_sum(
        df, n_tokens_col, order_key, tiebreak=tiebreak,
        n_buckets=n_buckets, out_col="_pk_cum",
    )
    start = F.col("_pk_cum_before")
    end_incl = F.col("_pk_cum") - 1
    return (
        out.withColumn("start_pos", start.cast("long"))
        .withColumn("first_bin", F.floor(start / seq_len).cast("long"))
        .withColumn(
            "last_bin",
            F.when(
                F.col(n_tokens_col) > 0, F.floor(end_incl / seq_len)
            ).otherwise(F.floor(start / seq_len)).cast("long"),
        )
        .drop("_pk_cum", "_pk_cum_before")
    )


def unigram_perplexity(
    df: DataFrame, text_col: str, id_col: str, persist_tf: bool = False
) -> DataFrame:
    """CCNet-style model-based quality signal (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    per-document perplexity under a unigram LM fit on the corpus itself —
    the distributed analogue of CCNet's KenLM perplexity bucketing, with
    the unigram model standing in for the 5-gram LM (the harness, not the
    checkpoint, is the point; swap the model table for real LM scores at
    will).

    ppl(d) = 2^( -Σ_t tf_dt · log2 p(t) / Σ_t tf_dt ),  p(t) = ctf_t / T.

    Distributed shape: one (doc, term) aggregation (map-side combine), the
    model table derives from IT by a term aggregation, and the scoring
    join is term-keyed — at 100 TB the model table is vocabulary-sized and
    usually broadcastable; nothing ever funnels.

    The model fit, the vocabulary total, and the scoring side all descend
    from the (doc, term) tf frame — three scan branches in the static
    plan, which AQE's exchange reuse collapses at runtime (the tf shuffle
    is built once and ReusedExchange feeds the other branches, so the
    corpus is scanned/tokenized once per action). That lazy default is
    the right call at 100 TB: nothing is pinned, and a re-run is a cheap
    columnar scan. ``persist_tf=True`` materializes the tf frame eagerly
    instead (localCheckpoint, same GC-managed lifetime policy as
    dbscan's), guaranteeing the single tokenization independent of AQE
    and across multiple downstream actions — the right call for mid-sized
    corpora that are re-queried."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    if persist_tf:
        tf = tf.localCheckpoint(eager=True)
    model = tf.groupBy("term").agg(F.sum("tf").alias("ctf"))
    total = model.agg(F.sum("ctf").alias("t"))
    model = model.crossJoin(F.broadcast(total)).select(
        "term", (F.log2(F.col("ctf")) - F.log2(F.col("t"))).alias("logp")
    )
    return (
        tf.join(model, "term")
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (-F.sum(F.col("tf") * F.col("logp")) / F.sum("tf")).alias("nll"),
        )
        .select(
            "id", "n_tokens",
            F.pow(F.lit(2.0), F.col("nll")).alias("perplexity"),
        )
    )


def mixing_weights(
    df: DataFrame,
    text_col: str,
    group_col: str,
    targets: dict[str, float] | None = None,
) -> DataFrame:
    """Training-mix reweighting (the "data mixing" stage of every published
    LLM corpus recipe — e.g. The Pile's per-set epochs, Gopher/Chinchilla
    domain weights): per-group token share vs a TARGET share, and the
    sampling weight target/actual that a downstream weighted sampler
    applies. targets=None means uniform across the observed groups.

    One token-count aggregation (map-side combine) + a groups-sized
    fold — the shuffle carries one row per group, never documents."""
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tok"),
    )
    per = toks.groupBy("grp").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("tokens")
    )
    tot = per.agg(F.sum("tokens").alias("t"), F.count("*").alias("g"))
    out = per.crossJoin(F.broadcast(tot)).withColumn(
        "actual_frac", F.col("tokens") / F.col("t")
    )
    if targets is None:
        out = out.withColumn("target_frac", 1.0 / F.col("g"))
    else:
        mapping = F.create_map(
            *[F.lit(v) for kv in targets.items() for v in kv]
        )
        out = out.withColumn("target_frac", mapping[F.col("grp")])
    return out.select(
        F.col("grp").alias(group_col), "n_docs", "tokens",
        "actual_frac", "target_frac",
        (F.col("target_frac") / F.col("actual_frac")).alias("weight"),
    )
