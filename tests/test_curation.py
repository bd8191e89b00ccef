"""Gopher/C4/PII curation filters (functions/curation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.functions.curation import (
    DUP_NGRAM_THRESHOLDS,
    TOP_NGRAM_THRESHOLDS,
    c4_line_filter,
    gopher_quality,
    gopher_repetition,
    gopher_repetition_keep,
    pii_scrub,
)


def _rep_dict(spark, text, **kw):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return gopher_repetition(df, "text", "doc_id", **kw).collect()[0].asDict()


def test_gopher_repetition_hand_computed(spark):
    # "the cat" (7 chars) occurs 3x in a 68-char doc
    text = "the cat sat on the mat the cat sat on the mat the cat sat on the mat"
    r = _rep_dict(spark, text)
    assert r["top_frac_2"] == pytest.approx(3 * len("the cat") / len(text))
    # every 5-gram occurs 3x (doc = 6-token sentence x3 minus boundary
    # effects) -> dup_frac_5 > 1 from overlap, which the module documents
    assert r["dup_frac_5"] > 1.0
    # a no-repeat doc has zero dup fractions
    r2 = _rep_dict(spark, "one two three four five six seven eight nine ten")
    for n in (5, 6, 7, 8, 9, 10):
        assert r2[f"dup_frac_{n}"] == 0.0


def test_gopher_repetition_matches_bruteforce_random(spark):
    """Randomized parity vs a pure-Python reference over STRING grams:
    locks the hashed-gram representation (struct<h,l> built from token
    hashes) to the published string semantics — most-frequent-gram chars
    with (count, length) tie-break, and duplicated-gram chars — on docs
    drawn from a tiny alphabet so gram repetition is heavy."""
    import random
    from collections import Counter

    rng = random.Random(20260819)
    vocab = ["a", "bb", "ccc", "dd", "e", "fff", "gg"]
    rows = []
    for i in range(40):
        toks = [rng.choice(vocab) for _ in range(rng.randint(0, 60))]
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r.asDict()
           for r in gopher_repetition(df, "text", "doc_id").collect()}

    for i, text in rows:
        toks = [t for t in text.lower().split() if t]
        nc = max(len(text), 1.0)
        for n in range(2, 11):
            grams = [" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)]
            counts = Counter(grams)
            if counts:
                best_c, best_l = max(
                    (c, len(g)) for g, c in counts.items())
                top = best_c * best_l
                dup = sum(c * len(g) for g, c in counts.items() if c > 1)
            else:
                top = dup = 0
            if n in (2, 3, 4):
                assert got[i][f"top_frac_{n}"] == pytest.approx(
                    top / nc, abs=1e-12), (i, n)
            if n >= 5:
                assert got[i][f"dup_frac_{n}"] == pytest.approx(
                    dup / nc, abs=1e-12), (i, n)


def test_gopher_repetition_short_and_empty_docs_survive(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "")], "doc_id long, text string")
    rows = {r["id"]: r.asDict() for r in
            gopher_repetition(df, "text", "doc_id").collect()}
    assert set(rows) == {0, 1}
    assert rows[0]["top_frac_2"] == pytest.approx(3 / 3)  # "a b" is its own bigram
    assert rows[1]["top_frac_2"] == 0.0
    assert rows[1]["dup_frac_10"] == 0.0


def test_gopher_repetition_cached_columns_are_plan_independent(spark):
    """The per-n signal columns are built once and shared across calls
    (curation._gopher_n_cols). A pyspark Column is an immutable unresolved
    tree, so binding the SAME object into two different plans must yield
    independent, correct results — this guards the cache against any
    future mutation of the shared objects (e.g. in-place alias tricks)."""
    a = spark.createDataFrame(
        [(0, "x y x y x y x y")], "doc_id long, text string")
    b = spark.createDataFrame(
        [(7, "p q r s t u v w")], "doc_id long, text string")
    ra = gopher_repetition(a, "text", "doc_id").collect()[0].asDict()
    rb = gopher_repetition(b, "text", "doc_id").collect()[0].asDict()
    ra2 = gopher_repetition(a, "text", "doc_id").collect()[0].asDict()
    assert ra == ra2                       # warm call identical to first
    assert ra["top_frac_2"] > 0.5          # "x y" repeats
    assert rb["top_frac_2"] < 0.5 and rb["dup_frac_5"] == 0.0  # all-unique


def test_gopher_repetition_keep_thresholds(spark):
    repetitive = " ".join(["the cat sat on the mat"] * 10)
    clean = " ".join(f"tok{i}" for i in range(200))
    df = spark.createDataFrame(
        [(0, repetitive), (1, clean)], "doc_id long, text string")
    rep = gopher_repetition(df, "text", "doc_id")
    got = {r["id"]: r["keep"] for r in
           rep.select("id", gopher_repetition_keep(rep).alias("keep")).collect()}
    assert got == {0: False, 1: True}
    # thresholds are the published Table A1 values
    assert TOP_NGRAM_THRESHOLDS[2] == 0.20 and DUP_NGRAM_THRESHOLDS[10] == 0.10


def test_gopher_quality_rules(spark):
    good = ("The quick brown fox jumps over the lazy dog and runs far away "
            * 10)
    short = "too few words here."
    digits = " ".join(str(i) for i in range(100))  # no alpha words
    shouty = " ".join(["#tag"] * 100)              # symbol ratio 1.0
    df = spark.createDataFrame(
        [(0, good), (1, short), (2, digits), (3, shouty)],
        "doc_id long, text string")
    got = {r["id"]: r for r in gopher_quality(df, "text", "doc_id").collect()}
    assert got[0]["keep"] is True
    assert got[1]["keep"] is False        # < 50 words
    assert got[2]["keep"] is False and got[2]["alpha_word_frac"] == 0.0
    assert got[3]["keep"] is False and got[3]["symbol_ratio"] >= 0.9


def test_gopher_quality_line_rules(spark):
    bullets = "\n".join(["- item one of several listed here"] * 10
                        + ["a normal line"])
    ellipses = "\n".join(["this line trails off..."] * 5
                         + ["a normal line here"])
    df = spark.createDataFrame(
        [(0, bullets), (1, ellipses)], "doc_id long, text string")
    got = {r["id"]: r for r in gopher_quality(df, "text", "doc_id").collect()}
    assert got[0]["bullet_frac"] == pytest.approx(10 / 11)
    assert got[1]["ellipsis_frac"] == pytest.approx(5 / 6)


def test_c4_line_filter_rules(spark):
    rows = [
        (0, "This line is long enough to keep.\nshort line\n"
            "Another keeper line is right here.\n"
            "And a third good line for the page.\nno punctuation line here"),
        (1, "Lorem ipsum dolor sit amet something.\n"
            "Good line that would otherwise be kept.\n"
            "Another fine line with punctuation."),
        (2, "function f() { return 1; }\nA perfectly good line otherwise."),
        (3, "Enable javascript to view this page.\n"
            "First good line stays around here.\n"
            "Second good line stays around here.\n"
            "Third good line stays around here."),
        (4, "We use cookie consent banners here.\n"
            "First good line stays around here.\n"
            "Second good line stays around here.\n"
            "Third good line stays around here."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in c4_line_filter(df, "text", "doc_id").collect()}
    assert got[0]["n_lines"] == 5 and got[0]["n_kept"] == 3
    assert got[0]["keep"] is True
    assert "short line" not in got[0]["clean_text"]
    assert got[1]["keep"] is False and got[1]["has_lorem_ipsum"] is True
    assert got[2]["keep"] is False and got[2]["has_brace"] is True
    # the javascript/cookie LINES are dropped but the pages survive
    assert got[3]["n_kept"] == 3 and got[3]["keep"] is True
    assert "javascript" not in got[3]["clean_text"]
    assert got[4]["n_kept"] == 3 and got[4]["keep"] is True


def test_pii_scrub_order_and_counts(spark):
    rows = [
        (0, "mail john.doe@example.com or 10.0.0.1 or 555-123-4567 done"),
        (1, "two mails a@b.io c@d.org and ips 1.2.3.4 5.6.7.8"),
        (2, "no pii in this row at all"),
        (3, "version 1.2.3 is not an ip; 1.2.3.4 is"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df, "text").collect()}
    assert got[0]["scrubbed"] == "mail <EMAIL> or <IP> or <PHONE> done"
    assert (got[0]["n_email"], got[0]["n_ip"], got[0]["n_phone"]) == (1, 1, 1)
    assert got[1]["n_email"] == 2 and got[1]["n_ip"] == 2
    assert got[2]["scrubbed"] == rows[2][1]
    assert got[3]["n_ip"] == 1 and "1.2.3 is not" in got[3]["scrubbed"]


def test_curation_plan_shapes(spark):
    """quality/c4/pii are zero-shuffle projections; repetition explodes
    grams exactly once and aggregates with partial (map-side) combine."""
    df = spark.createDataFrame([(0, "a b c . d\ne f.")],
                               "doc_id long, text string")
    for op in (
        lambda: gopher_quality(df, "text", "doc_id"),
        lambda: c4_line_filter(df, "text", "doc_id"),
        lambda: pii_scrub(df, "text"),
    ):
        plan = op()._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan

    # repetition is fully in-row: sorted-gram run folds, NO explode/groupBy
    rep = gopher_repetition(df, "text", "doc_id")
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("split(") == 1            # tokenization runs ONCE


def test_gopher_repetition_keep_filter_stays_above_signal_projection(spark):
    """Regression: the universal `where(gopher_repetition_keep(rep))` shape
    must NOT be pushed through the signal projections. PushDownPredicates
    substitutes the full gram pipeline into the condition, and element_at
    on a substituted array re-evaluates the token-hash transform PER
    ELEMENT — O(g²) per row (measured 45 s for 100 docs before the
    non-deterministic guard in gopher_repetition pinned the filter above
    the projection)."""
    df = spark.createDataFrame([(0, "a b c a b c d e f g h i j")],
                               "doc_id long, text string")
    rep = gopher_repetition(df, "text", "doc_id")
    q = rep.where(gopher_repetition_keep(rep))
    opt = q._jdf.queryExecution().optimizedPlan().toString()
    # Filter on top, condition referencing only the projected fraction
    # attributes — never a substituted copy of the gram pipeline.
    assert opt.lstrip().startswith("Filter")
    # one token-hash transform + one combine per gram level; the pushdown
    # blowup duplicated this >100x (1144 occurrences at 9 levels)
    assert opt.count("xxhash64") <= 12


def test_gopher_repetition_unused_signals_are_pruned(spark):
    """The guard must stay surgical: an aggregate touching two signals
    prunes the other seven gram pipelines (column pruning still removes
    guarded-but-unreferenced fractions)."""
    import re

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(0, "a b c a b c d e f g h i j")],
                               "doc_id long, text string")
    agg = gopher_repetition(df, "text", "doc_id").agg(
        F.sum("top_frac_2"), F.sum("dup_frac_10"))
    opt = agg._jdf.queryExecution().optimizedPlan().toString()
    assert set(re.findall(r"_g(\d+)#", opt)) == {"2", "10"}


def test_distributed_prefix_sum_matches_sequential(spark):
    import random

    from solr_spark.functions.curation import distributed_prefix_sum

    rng = random.Random(3)
    rows = [(k, rng.randint(1, 300)) for k in rng.sample(range(10000), 400)]
    df = spark.createDataFrame(rows, "k long, nt long").repartition(8)
    got = {r["k"]: (r["cumsum"], r["cumsum_before"])
           for r in distributed_prefix_sum(df, "nt", "k", n_buckets=16).collect()}
    run = 0
    for k, nt in sorted(rows):
        assert got[k] == (run + nt, run)
        run += nt


@pytest.mark.parametrize("n_buckets", [1, 2, 7, 64])
def test_distributed_prefix_sum_buckets_dupes_negatives(spark, n_buckets):
    """The scale primitive behind ks/mannWhitney/packing, swept across bucket
    counts (incl. the degenerate single bucket), DUPLICATE order keys broken
    by a tiebreak column, negative keys, and a skewed key distribution."""
    import random

    from solr_spark.functions.curation import distributed_prefix_sum

    rng = random.Random(n_buckets)
    # Skew: half the rows land on 10 hot keys, half spread wide (some < 0).
    rows = []
    for t in range(300):
        k = rng.choice(range(10)) if t % 2 else rng.randint(-5000, 5000)
        rows.append((k, t, rng.randint(1, 99)))
    df = spark.createDataFrame(rows, "k long, t long, nt long").repartition(8)
    out = distributed_prefix_sum(
        df, "nt", "k", tiebreak="t", n_buckets=n_buckets
    )
    got = {(r["k"], r["t"]): (r["cumsum"], r["cumsum_before"])
           for r in out.collect()}
    run = 0
    for k, t, nt in sorted(rows):
        assert got[(k, t)] == (run + nt, run)
        run += nt


def test_distributed_prefix_sum_empty(spark):
    from solr_spark.functions.curation import distributed_prefix_sum

    df = spark.createDataFrame([], "k long, nt long")
    assert distributed_prefix_sum(df, "nt", "k").count() == 0


def test_pack_concat_bins_and_straddle(spark):
    from solr_spark.functions.curation import pack_concat

    # 3 chunks of 300 tokens, seq_len 512: chunk 1 straddles bins 0/1
    df = spark.createDataFrame(
        [(0, 300), (1, 300), (2, 300)], "k long, nt long")
    got = {r["k"]: r for r in
           pack_concat(df, "nt", "k", seq_len=512, n_buckets=4).collect()}
    assert (got[0]["start_pos"], got[0]["first_bin"], got[0]["last_bin"]) == (0, 0, 0)
    assert (got[1]["start_pos"], got[1]["first_bin"], got[1]["last_bin"]) == (300, 0, 1)
    assert (got[2]["start_pos"], got[2]["first_bin"], got[2]["last_bin"]) == (600, 1, 1)


def test_pack_concat_plan_is_bucket_parallel(spark):
    """The full-data window must be hash-partitioned by the range bucket;
    only the <=n_buckets totals table may pass through a single partition."""
    from solr_spark.functions.curation import pack_concat

    df = spark.createDataFrame([(k, 10) for k in range(100)], "k long, nt long")
    plan = pack_concat(df, "nt", "k", seq_len=64, n_buckets=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_psum_bucket" in plan
    assert "BatchEvalPython" not in plan


def test_unigram_perplexity_manual(spark):
    """unigram_perplexity == manual corpus-unigram NLL computation
    (CCNet-style perplexity bucketing signal)."""
    import math
    import re
    from collections import Counter

    from solr_spark.functions.curation import unigram_perplexity

    texts = ["the cat sat on the mat", "the fat cat ate the rat",
             "rare words here only once"]
    toks = [[x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
            for t in texts]
    ctf = Counter(t for d in toks for t in d)
    total = sum(ctf.values())
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {r.id: r for r in
           unigram_perplexity(df, "text", "doc_id").collect()}
    for i, d in enumerate(toks):
        nll = -sum(math.log2(ctf[t] / total) for t in d) / len(d)
        assert got[i].n_tokens == len(d)
        assert abs(got[i].perplexity - 2 ** nll) < 1e-9
    # the all-rare doc must be the most perplexing
    assert got[2].perplexity == max(r.perplexity for r in got.values())


def test_bpe_train_sennrich_parity(spark):
    """bpe_train == an in-memory transcription of Sennrich et al. 2016
    learn_bpe (same '</w>' word-final tagging, same greedy left-to-right
    merge application, same (count desc, pair asc) tie-break), merge
    table equal element-for-element. Includes single-char words."""
    from collections import Counter

    from solr_spark.functions.textstats import bpe_train

    texts = ["the cat sat on the mat", "the fat cat ate the rat",
             "low lower lowest", "new newer newest wider wide", "a i a i"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [(r.rank, r.left, r.right, r.freq)
           for r in bpe_train(df, "text", n_merges=8).collect()]

    import re
    wf = Counter()
    for t in texts:
        for w in [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]:
            wf[w] += 1
    vocab: dict = {}
    for w, f in wf.items():
        syms = (tuple(list(w[:-1]) + [w[-1] + "</w>"])
                if len(w) > 1 else (w + "</w>",))
        vocab[syms] = vocab.get(syms, 0) + f
    want = []
    for rank in range(8):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), c = min(pairs.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if c < 2:
            break
        want.append((rank, a, b, c))
        newv: dict = {}
        for syms, f in vocab.items():
            out: list = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            newv[tuple(out)] = newv.get(tuple(out), 0) + f
        vocab = newv
    assert got == want


def test_keep_best_canonical(spark):
    """keep_best_canonical elects the highest-score member per cluster,
    min-id on ties; exactly one keep per cluster."""
    from solr_spark.functions.dedup import keep_best_canonical

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)], "node int, cluster int"
    )
    scores = spark.createDataFrame(
        [(1, 10.0), (2, 30.0), (3, 30.0), (5, 7.0), (6, 2.0)],
        "node int, score double",
    )
    rows = keep_best_canonical(clusters, scores, "node", "score").collect()
    keep = {r.node: r.keep for r in rows}
    assert keep == {1: False, 2: True, 3: False, 5: True, 6: False}
    per_cluster = {}
    for r in rows:
        per_cluster.setdefault(r.cluster, 0)
        per_cluster[r.cluster] += int(r.keep)
    assert all(v == 1 for v in per_cluster.values())


def test_mixing_weights(spark):
    """mixing_weights: actual token shares sum to 1, uniform target,
    weight = target/actual; explicit-targets path honors the mapping."""
    from solr_spark.functions.curation import mixing_weights

    docs = spark.createDataFrame(
        [(0, "a b c d", "web"), (1, "e f", "web"), (2, "g h i j k l", "code"),
         (3, "m n o p", "books")],
        "doc_id int, text string, source string",
    )
    rows = {r.source: r for r in
            mixing_weights(docs, "text", "source").collect()}
    total = sum(r.tokens for r in rows.values())
    assert total == 16
    assert abs(sum(r.actual_frac for r in rows.values()) - 1.0) < 1e-12
    for r in rows.values():
        assert abs(r.target_frac - 1 / 3) < 1e-12
        assert abs(r.weight - (1 / 3) / (r.tokens / total)) < 1e-12
    # explicit targets
    t = {"web": 0.5, "code": 0.3, "books": 0.2}
    rows = {r.source: r for r in
            mixing_weights(docs, "text", "source", targets=t).collect()}
    for s, frac in t.items():
        assert abs(rows[s].target_frac - frac) < 1e-12


def test_bpe_encode_apply_parity(spark):
    """bpe_encode == in-memory apply_bpe (merges replayed in training
    order with greedy left-to-right application), per-doc word and
    subword counts equal."""
    import re

    from solr_spark.functions.textstats import bpe_encode, bpe_train

    texts = ["the cat sat on the mat", "the fat cat ate the rat",
             "low lower lowest", "new newer newest wider wide", "a i a i"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    merges = [(r.left, r.right)
              for r in bpe_train(df, "text", n_merges=8).collect()]
    got = {r.id: (r.n_words, r.n_subwords)
           for r in bpe_encode(df, "text", "doc_id", merges).collect()}

    def ref(t):
        tw = ts = 0
        for w in [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]:
            syms = (list(w[:-1]) + [w[-1] + "</w>"]
                    if len(w) > 1 else [w + "</w>"])
            for a, b in merges:
                out = []
                for s in syms:
                    if out and out[-1] == a and s == b:
                        out[-1] = a + b
                    else:
                        out.append(s)
                syms = out
            tw += 1
            ts += len(syms)
        return tw, ts

    for i, t in enumerate(texts):
        assert got[i] == ref(t)
