"""Text analysis for corpus curation: language-ID, quality, fingerprints.

All JVM-expression implementations over the same ``simple`` tokenization as
the engine (so the SQL oracles reproduce them exactly). The reference ships
language detection as a contrib update processor
(solr/modules/langid — LangDetectLanguageIdentifierUpdateProcessor); here it
is a stopword-profile n-gram heuristic suited to batch curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solr_spark.functions.dedup import content_hash, tokens_col

# Tiny function-word profiles (public common-word lists, truncated). The
# heuristic: predicted language = profile with the most token hits; ties
# break alphabetically. On synthetic corpora this is arbitrary but
# deterministic — the operator's value is the plumbing + oracle parity.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "en": ("the", "and", "of", "to", "in", "is", "it", "that", "for", "was"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "una"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "est", "pour"),
}


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    toks = tokens_col(text)
    out = []
    for lang in sorted(LANG_PROFILES):
        words = LANG_PROFILES[lang]
        hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
        out.append((lang, hits))
    return out


def identify_language(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pred_lang, hits) — argmax profile hits, alphabetical tiebreak,
    'und' (undetermined) when no profile hits at all."""
    scores = lang_scores(F.col(text_col))
    # Alphabetical iteration with a STRICT > keeps the alphabetically first
    # language on ties; hits must exceed 0 to displace 'und'.
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang, hits in scores:
        cond = hits > best_hits
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(cond, hits).otherwise(best_hits)
    return df.select(
        F.col(id_col).alias("id"), best_lang.alias("pred_lang"),
        best_hits.alias("hits"),
    )


def quality_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc quality features for filter pipelines:
    n_chars, n_tokens, n_types, ttr, mean_token_len, digit_ratio,
    upper_ratio, and a [0,1] composite quality score."""
    text = F.col(text_col)
    toks = tokens_col(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_types = F.size(F.array_distinct(toks))
    sum_len = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    digits = F.length(F.regexp_replace(text, "[^0-9]", ""))
    uppers = F.length(F.regexp_replace(text, "[^A-Z]", ""))
    ttr = n_types / F.greatest(n_tokens, F.lit(1))
    mean_tok = sum_len / F.greatest(n_tokens, F.lit(1))
    digit_ratio = digits / F.greatest(n_chars, F.lit(1))
    upper_ratio = uppers / F.greatest(n_chars, F.lit(1))
    # Composite: reward lexical diversity + sane token lengths, punish
    # digit-heavy or shouting text. Clamped to [0, 1].
    score = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.0),
            ttr * 0.5
            + (F.lit(1.0) - digit_ratio) * 0.3
            + (F.lit(1.0) - upper_ratio) * 0.2
            - F.when((mean_tok < 2) | (mean_tok > 12), 0.3).otherwise(0.0),
        ),
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_types.alias("n_types"),
        ttr.alias("ttr"),
        mean_tok.alias("mean_token_len"),
        digit_ratio.alias("digit_ratio"),
        upper_ratio.alias("upper_ratio"),
        score.alias("quality"),
    )


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace tokens vs analyzer tokens vs a BPE-ish subword estimate
    (ceil(chars/4) per token — the common ~4-chars-per-token heuristic)."""
    text = F.col(text_col)
    ws = F.size(F.filter(F.split(text, r"\s+"), lambda t: t != ""))
    toks = tokens_col(text)
    bpe_est = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda a, t: a + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
    )
    return df.select(
        F.col(id_col).alias("id"),
        ws.alias("ws_tokens"),
        F.size(toks).alias("analyzer_tokens"),
        bpe_est.alias("bpe_est_tokens"),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str, n: int = 3,
                n_mins: int = 4) -> DataFrame:
    """Winnowing-style document fingerprint: the ``n_mins`` smallest distinct
    hashed n-gram shingles (a stable, order-free sketch; equal fingerprints
    => near-identical content). Returned as a '-'-joined string key."""
    from solr_spark.functions.dedup import _tokens_bound, shingles_from_tokens

    sh = shingles_from_tokens(F.col("_tk"), n)
    mins = F.slice(F.array_sort(sh), 1, n_mins)
    return _tokens_bound(df, text_col, F.col(id_col).alias("id")).select(
        "id",
        F.concat_ws("-", F.transform(mins, lambda v: v.cast("string"))).alias(
            "fingerprint"
        ),
    )


def chunk_tokens(
    df: DataFrame, text_col: str, id_col: str,
    size: int = 256, overlap: int = 32,
) -> DataFrame:
    """Sliding-window document chunking — the training-data prep step that
    turns long documents into model-sized pieces: chunks of ``size``
    whitespace-ish tokens with ``overlap`` tokens shared between
    consecutive chunks (stride = size - overlap). The last chunk is pulled
    back so every token is covered exactly once by some chunk and no chunk
    exceeds ``size``.

    Returns (id, chunk_id, n_tokens, chunk) — one row per chunk; docs with
    zero tokens emit no rows.

    Shape at scale: one narrow projection per doc (tokenize + arithmetic,
    all JVM expressions), then ONE explode of the per-doc chunk array — no
    shuffle at all; output partitioning follows the input, so a downstream
    repartition only happens if the caller asks for it.
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    # Bind the tokenization in its own projection: the chunk transform
    # slices ``toks`` INSIDE its lambda, and a captured inline tokenization
    # expression would re-run once per chunk (O(n²/stride) on long docs).
    # As a bound attribute the array is materialized once per row.
    df = df.select(
        F.col(id_col).alias(id_col),
        tokens_col(F.col(text_col)).alias("_tk"),
    )
    toks = F.col("_tk")  # the shared 'simple' tokenization, bound
    n = F.size(toks)
    # chunk starts: 0, stride, 2*stride, ..., last = ceil((n-size)/stride)
    # (clamped to >= 0) so the tail never spills past the token list
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0), F.ceil((n - F.lit(size)) / F.lit(stride)).cast("int")
    )
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.least(i * F.lit(stride), F.greatest(n - F.lit(size), F.lit(0))),
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.array_join(F.slice(toks, s + 1, size), " ").alias("chunk"),
            F.least(n - s, F.lit(size)).alias("n_tokens"),
        ),
    )
    return (
        df.where(n > 0)
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(chunks).alias("chunk_id", "c"),
        )
        .select("id", "chunk_id", F.col("c.n_tokens").alias("n_tokens"),
                F.col("c.chunk").alias("chunk"))
    )


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 10
) -> "DataFrame":
    """Distributed byte-pair-encoding vocabulary training (Sennrich,
    Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
    Subword Units" — the learn_bpe algorithm): iteratively merge the most
    frequent adjacent symbol pair, starting from characters with the
    word-final symbol tagged '</w>'.

    Distributed shape: training runs over the WORD-FREQUENCY DICTIONARY
    (one corpus-wide groupBy — the only pass that sees every row; the
    dictionary is vocabulary-sized from then on). Each merge round is one
    pair-count aggregation over the dictionary plus a pure-JVM fold that
    applies the merge greedily left-to-right (Sennrich's non-overlapping
    re.sub semantics); lineage is cut per round. Ties break
    (count desc, left asc, right asc) — deterministic at any parallelism,
    unlike dict-order-dependent reference implementations.

    Returns (rank, left, right, freq) — the ordered merge table."""
    from solr_spark.functions.dedup import tokens_col

    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .groupBy("w").agg(F.count("*").alias("freq"))
    )
    # char symbols, word-final char tagged '</w>'
    n = F.length("w")
    syms = F.concat(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.col("w").substr(i, F.lit(1)),
        ),
        F.array(F.concat(F.col("w").substr(n, F.lit(1)), F.lit("</w>"))),
    )
    # Lazy checkpoints: each round's pair-count collect materializes the
    # PREVIOUS round's merge-apply in the same job (one job per round, not
    # two), and the final round's vocab — which nothing reads — is never
    # computed. Lineage is still cut at every round boundary.
    vocab = words.select(
        F.when(n > 1, syms)
        .otherwise(F.array(F.concat(F.col("w"), F.lit("</w>")))).alias("s"),
        "freq",
    ).localCheckpoint(eager=False)

    merges = []
    for rank in range(n_merges):
        pairs = (
            vocab.where(F.size("s") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("s") - 2),
                        lambda i: F.struct(
                            F.element_at("s", i + 1).alias("a"),
                            F.element_at("s", i + 2).alias("b"),
                        ),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b").agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["c"] < 2:
            break
        a, b, c = pairs[0]["a"], pairs[0]["b"], int(pairs[0]["c"])
        merges.append((rank, a, b, c))
        ab = a + b
        merged = F.aggregate(
            F.col("s"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.lit(ab)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        vocab = vocab.select(merged.alias("s"), "freq") \
            .localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges or [], "rank int, left string, right string, freq long"
    )


def bpe_encode(
    df: DataFrame, text_col: str, id_col: str,
    merges: "list[tuple[str, str]]",
) -> DataFrame:
    """Apply a trained BPE merge table (from :func:`bpe_train`) and count
    subword tokens per document — the tokenizer-side half of the BPE pair
    (Sennrich et al. 2016 apply_bpe): each word starts as characters with
    the '</w>' word-final tag and the merges replay IN TRAINING ORDER,
    each one a greedy left-to-right non-overlapping substitution.

    Distributed shape: documents explode to (id, word); the merge chain
    runs over the DISTINCT-WORD dictionary (corpus-vocabulary-sized, the
    only frame the chain touches) as pure whole-stage-codegen `replace`
    calls on sentinel-delimited symbol strings '{a}{b}{c}' — braces make a
    pair pattern unable to match across symbol boundaries, so one replace
    IS the greedy merge (the same encoding the trainer's oracle uses).
    Subword counts broadcast-join back to the word stream and aggregate
    per doc. Returns (id, n_words, n_subwords)."""
    from solr_spark.functions.dedup import tokens_col

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("w"),
    )
    dic = toks.select("w").distinct()
    n = F.length("w")
    syms = F.concat(
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.concat(F.lit("{"), F.col("w").substr(i, F.lit(1)),
                                   F.lit("}")),
            ),
        ),
        F.concat(F.lit("{"), F.col("w").substr(n, F.lit(1)), F.lit("</w>}")),
    )
    enc = F.when(n > 1, syms).otherwise(
        F.concat(F.lit("{"), F.col("w"), F.lit("</w>}"))
    )
    for a, b in merges:
        enc = F.replace(enc, F.lit("{" + a + "}{" + b + "}"),
                        F.lit("{" + a + b + "}"))
    dic = dic.select(
        "w",
        (F.length(enc) - F.length(F.replace(enc, F.lit("}"), F.lit(""))))
        .alias("n_sub"),
    )
    return (
        toks.join(F.broadcast(dic), "w")
        .groupBy("id")
        .agg(F.count("*").alias("n_words"), F.sum("n_sub").alias("n_subwords"))
    )
