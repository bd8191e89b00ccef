"""True phrase/slop semantics on a hand-built corpus (position oracle by
construction). Reference semantics: Lucene PhraseQuery via the classic
parser's quoted clauses (parser/QueryParser.jj phrase+slop,
SolrQueryParserBase getFieldQuery)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.index.build import build_index
from solr_spark.query.phrase import phrase_match_df, phrase_topk

ROWS = [
    (0, "the quick brown fox"),
    (1, "brown quick the fox"),
    (2, "quick fox brown the quick brown dog"),
    (3, "a quick and dirty hack"),
    (4, "quick dirty hack"),
    (5, "quick quick quick"),
]


@pytest.fixture(scope="module")
def idx(spark):
    corpus = spark.createDataFrame(ROWS, "docid long, text string")
    i = build_index(corpus, analyzer="simple", text_col="text")
    i.postings = i.postings.persist()
    i.doclens = i.doclens.persist()
    return i


@pytest.fixture(scope="module")
def idx_en(spark):
    corpus = spark.createDataFrame(ROWS, "docid long, text string")
    i = build_index(corpus, analyzer="text_en", text_col="text")
    i.postings = i.postings.persist()
    i.doclens = i.doclens.persist()
    return i


def _docids(df):
    return sorted(r.docid for r in df.collect())


def test_exact_adjacency(idx):
    assert _docids(phrase_match_df(idx, ["quick", "brown"])) == [0, 2]


def test_phrase_tf_counts_occurrences(idx):
    tf = {
        r.docid: r.tf_p
        for r in phrase_match_df(idx, ["quick", "brown"]).collect()
    }
    assert tf == {0: 1, 2: 1}  # doc2: only quick@4 brown@5 is adjacent


def test_repeated_term_phrase(idx):
    tf = {r.docid: r.tf_p for r in phrase_match_df(idx, ["quick", "quick"]).collect()}
    assert tf == {5: 2}  # positions 0-1 and 1-2


def test_slop_window(idx):
    # slop=1 admits one intervening token.
    assert _docids(phrase_match_df(idx, ["quick", "fox"], slop=1)) == [0, 1, 2]
    # the transposition "fox quick" costs matchLength 2 — out of reach at
    # slop=1 everywhere in this corpus (Lucene sloppy semantics).
    assert _docids(phrase_match_df(idx, ["fox", "quick"], slop=1)) == []


def test_sloppy_out_of_order_and_weights(idx):
    """Lucene SloppyPhraseMatcher parity: out-of-order arrangements match
    within the slop and each match weighs 1/(1+matchLength) into a float
    freq — "brown quick"~2 over doc0's "quick brown" is a transposition
    (matchLength 2 → 1/3); doc1 has it in order (1.0); doc2 accumulates a
    one-gap match (1/2) plus a transposition (1/3)."""
    tf = {
        r.docid: r.tf_p
        for r in phrase_match_df(idx, ["brown", "quick"], slop=2).collect()
    }
    assert set(tf) == {0, 1, 2}
    assert tf[0] == pytest.approx(1 / 3)
    assert tf[1] == pytest.approx(1.0)
    assert tf[2] == pytest.approx(1 / 2 + 1 / 3)
    # slop=2 reaches the transposed "fox quick" in doc2 (fox@1 quick@0)
    tf2 = {
        r.docid: r.tf_p
        for r in phrase_match_df(idx, ["fox", "quick"], slop=2).collect()
    }
    assert tf2[2] == pytest.approx(2 / 3)


def test_sloppy_freq_unit():
    """The greedy sweep on hand-checkable arrangements (spec cases)."""
    import numpy as np

    from solr_spark.query.sloppy import sloppy_freq

    def f(pls, offs, slop, terms=None):
        return sloppy_freq([np.array(p) for p in pls], offs, slop, terms)

    assert f([[0], [1]], [0, 1], 0) == 1.0          # exact adjacency
    assert f([[1], [0]], [0, 1], 2) == pytest.approx(1 / 3)  # transposed
    assert f([[1], [0]], [0, 1], 1) == 0.0          # transposition needs 2
    assert f([[0], [2]], [0, 1], 1) == 0.5          # one-gap in-order
    assert f([[0, 2], [1, 3]], [0, 1], 0) == 2.0    # two exact matches
    assert f([[0], [1], [2]], [0, 1, 2], 0) == 1.0  # 3-term exact
    assert f([[0], [2], [1]], [0, 1, 2], 2) == pytest.approx(1 / 3)
    # stopword gap offsets: quick@0 dirty@2 matching "quick X dirty"
    assert f([[0], [2]], [0, 2], 0) == 1.0
    # repeated term: "a a"~2 over "a x a" (duplicates seated distinctly)
    assert f([[0, 2], [0, 2]], [0, 1], 2, terms=["a", "a"]) == 0.5


def test_three_term_adjacency(idx):
    assert _docids(phrase_match_df(idx, ["quick", "brown", "fox"])) == [0]
    # doc0 at 0-2; doc2 at 3-5 ("... the quick brown dog")
    assert _docids(phrase_match_df(idx, ["the", "quick", "brown"])) == [0, 2]


def test_stopword_gap_lucene_parity(idx_en):
    # text_en drops "and" but its position survives as a gap: the query
    # "quick and dirty" compiles to quick@0 dirty@2 and must match doc3
    # (same gap) but NOT doc4 (adjacent).
    assert _docids(phrase_topk(idx_en, "quick and dirty", k=10)) == [3]
    assert _docids(phrase_topk(idx_en, "quick dirty", k=10)) == [4]


def test_phrase_requires_positions(spark):
    corpus = spark.createDataFrame(ROWS, "docid long, text string")
    bare = build_index(corpus, analyzer="simple", text_col="text", positions=False)
    with pytest.raises(ValueError, match="positions"):
        phrase_match_df(bare, ["quick", "brown"]).collect()


def test_phrase_plan_no_explode(idx):
    """The phrase plan must keep position arrays packed — adjacency runs as
    JVM higher-order functions (lambdafunction in the join condition), never
    exploding positions into rows. (The only Generate allowed is the index
    build's own explode of term_freqs inside the cached relation.)"""
    plan = (
        phrase_match_df(idx, ["quick", "brown"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "lambdafunction" in plan
    assert "explode(positions" not in plan and "explode(pos_" not in plan


def test_multiterm_slot_union(idx):
    # slot ["brown", "dirty"] matches either term at the middle position:
    # "quick brown" (docs 0,2) plus "quick dirty" (doc 4).
    got = _docids(phrase_match_df(idx, ["quick", ["brown", "dirty"]]))
    assert got == [0, 2, 4]


def test_hll_within_tolerance(spark):
    from pyspark.sql import functions as F

    from solr_spark.operators.facets import hll_agg, unique_agg

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("t"))
    exact = unique_agg(toks, "t").collect()[0]["unique"]
    approx = hll_agg(toks, "t", rsd=0.02).collect()[0]["hll"]
    assert abs(approx - exact) / exact < 0.06  # 3x rsd


def test_span_near_unordered(idx):
    from solr_spark.query.phrase import span_near_df

    # "fox quick" never occurs in order, but unordered-within-2 matches
    # doc0 (quick@1 fox@3) and doc1 (quick@1 fox@3) and doc2 (quick@0 fox@1).
    got = {r.docid: r.tf_p for r in
           span_near_df(idx, ["fox", "quick"], slop=1, ordered=False).collect()}
    assert set(got) == {0, 1, 2}
    # ordered=True keeps the in-order contract
    assert _docids(span_near_df(idx, ["fox", "quick"], slop=1, ordered=True)) == []
    # adjacency-only unordered: doc2 has quick@0 fox@1 (span 1)
    tight = {r.docid for r in
             span_near_df(idx, ["fox", "quick"], slop=0, ordered=False).collect()}
    assert tight == {2}


def test_sloppy2_jvm_fold_parity(spark):
    """The pure-JVM 2-term sloppy fold (sloppy2_tf_expr) must agree with
    the Python reference matcher bit-for-bit, including position ties
    after offset adjustment (where consumption order is NOT a sorted
    merge — the matcher stays on the current iterator)."""
    import random
    from collections import defaultdict

    import numpy as np

    from solr_spark.query.sloppy import sloppy2_tf_expr, sloppy_freq

    random.seed(11)
    rows = [([5, 9], [6, 7], 0, 1, 2), ([1, 3], [3, 8], 0, 1, 0),
            ([10, 20], [2, 20], 0, 1, 8), ([0, 100], [1, 2, 3], 0, 1, 2),
            ([5], [5], 0, 1, 0), ([0], [0, 1, 2, 7], 0, 1, 1),
            ([5], [0, 6, 7], 0, 1, 1)]
    for _ in range(400):
        a = sorted(random.sample(range(25), random.randint(1, 10)))
        b = sorted(random.sample(range(25), random.randint(1, 10)))
        o0 = random.randint(0, 2)
        rows.append((a, b, o0, o0 + random.randint(1, 3), random.randint(0, 5)))

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b, _, _, _) in enumerate(rows)],
        "id long, pos_0 array<long>, pos_1 array<long>",
    ).cache()
    groups = defaultdict(list)
    for i, (_, _, o0, o1, slop) in enumerate(rows):
        groups[(o0, o1, slop)].append(i)
    for (o0, o1, slop), ids in groups.items():
        got = {r.id: r.tf for r in df.where(F.col("id").isin(ids)).select(
            "id", F.expr(sloppy2_tf_expr("pos_0", "pos_1", o0, o1, slop)).alias("tf")
        ).collect()}
        for i in ids:
            a, b, _, _, _ = rows[i]
            want = sloppy_freq([np.array(a), np.array(b)], [o0, o1], slop,
                               ["t0", "t1"])
            assert abs(got[i] - want) < 1e-9, (rows[i], got[i], want)
    df.unpersist()


def test_sloppy2_plan_is_jvm_only(idx):
    """The 2-term sloppy path must not contain a Python/Arrow eval node."""
    from solr_spark.query.phrase import phrase_match_df

    plan = phrase_match_df(idx, ["fast", "merge"], slop=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_sloppyn_jvm_fold_parity(spark):
    """The n-iterator JVM sloppy fold (sloppyn_tf_expr) must agree with the
    Python reference matcher bit-for-bit for 3-5 distinct-term phrases,
    including offset gaps (dropped stopwords) and position ties."""
    import random
    from collections import defaultdict

    import numpy as np

    from solr_spark.query.sloppy import sloppy_freq, sloppyn_tf_expr

    random.seed(23)
    cases = []
    for _ in range(400):
        n = random.choice([3, 3, 4, 5])
        lists = [
            sorted(random.sample(range(25), random.randint(1, 6)))
            for _ in range(n)
        ]
        offs = [0]
        for _i in range(1, n):
            offs.append(offs[-1] + random.randint(1, 2))
        cases.append((lists, tuple(offs), random.randint(0, 6)))

    groups = defaultdict(list)
    for i, (lists, offs, slop) in enumerate(cases):
        groups[(len(lists), offs, slop)].append(i)
    for (n, offs, slop), ids in groups.items():
        df = spark.createDataFrame(
            [(i, *cases[i][0]) for i in ids],
            "id long, " + ", ".join(f"pos_{j} array<long>" for j in range(n)),
        )
        expr = sloppyn_tf_expr(
            [f"pos_{j}" for j in range(n)], list(offs), slop
        )
        got = {r.id: r.tf for r in
               df.select("id", F.expr(expr).alias("tf")).collect()}
        for i in ids:
            lists, _, _ = cases[i]
            want = sloppy_freq(
                [np.array(x) for x in lists], list(offs), slop
            )
            assert abs(got[i] - want) < 1e-9, (cases[i], got[i], want)


def test_sloppyn_plan_is_jvm_only(idx):
    """The 3+-distinct-term sloppy path must not contain a Python/Arrow
    eval node (the n-iterator fold runs in whole-stage codegen)."""
    from solr_spark.query.phrase import phrase_match_df

    plan = phrase_match_df(
        idx, ["part", "filter", "scan"], slop=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_sloppy_batch_matches_per_candidate():
    """sloppy_freq_batch (the physical path's one-pass numpy sweep over all
    conjunction candidates) == sloppy_freq per candidate, for random
    batches of 2-5 distinct-term phrases."""
    import random

    import numpy as np

    from solr_spark.query.sloppy import sloppy_freq, sloppy_freq_batch

    rng = random.Random(31)
    for _trial in range(60):
        n = rng.choice([2, 3, 3, 4, 5])
        cands = rng.randint(1, 30)
        offs = [0]
        for _i in range(1, n):
            offs.append(offs[-1] + rng.randint(1, 2))
        slop = rng.randint(0, 6)
        slots, per_cand = [], [[] for _ in range(cands)]
        for i in range(n):
            flat, starts, lens = [], [], []
            for ci in range(cands):
                pl = sorted(rng.sample(range(25), rng.randint(1, 6)))
                starts.append(len(flat))
                lens.append(len(pl))
                flat.extend(pl)
                per_cand[ci].append(np.asarray(pl, dtype=np.int64))
            slots.append((
                np.asarray(flat, dtype=np.int64),
                np.asarray(starts, dtype=np.int64),
                np.asarray(lens, dtype=np.int64),
                offs[i],
            ))
        got = sloppy_freq_batch(slots, slop)
        for ci in range(cands):
            want = sloppy_freq(per_cand[ci], offs, slop)
            assert abs(got[ci] - want) < 1e-12
