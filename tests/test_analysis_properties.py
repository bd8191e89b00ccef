"""Hypothesis sweep of the analysis chains (reference: Solr's
text_general / text_en field types + SimpleTokenizer; SURVEY §1.4/§1.5).

Pinned contract: every analyzer is a TOTAL function over arbitrary
unicode (index builds must never die on a weird document), returns a
list of non-empty strings, is deterministic, and the positions variant
agrees with the flat variant term-for-term with strictly increasing
positions. Pure Python — no SparkSession.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from solr_spark.analysis.chain import ANALYZERS, ANALYZERS_POS, analyze, analyze_pos

_ANALYZER_NAMES = sorted(ANALYZERS)

# full-unicode text, biased toward tokenizer edge fodder
_EDGE = "a'sA.B-C_d 0x1f ßİıﬃ あ \U0001f600 's'' .."
_texts = st.text(
    alphabet=st.one_of(st.sampled_from(list(_EDGE)), st.characters()),
    max_size=120,
)


@settings(max_examples=400, deadline=None)
@given(st.sampled_from(_ANALYZER_NAMES), _texts)
def test_analyze_total_and_well_formed(name, text):
    toks = analyze(text, name)
    assert isinstance(toks, list)
    for t in toks:
        assert isinstance(t, str) and t != ""
    assert analyze(text, name) == toks  # deterministic


@settings(max_examples=400, deadline=None)
@given(st.sampled_from(_ANALYZER_NAMES), _texts)
def test_analyze_pos_consistent_with_flat(name, text):
    toks = analyze(text, name)
    pos = analyze_pos(text, name)
    # same terms in the same order
    assert [t for t, _ in pos] == toks
    # positions strictly increase (stopword drops may leave gaps in
    # text_en — Lucene's enablePositionIncrements=true — but never
    # repeat or go backward)
    ps = [p for _, p in pos]
    assert all(b > a for a, b in zip(ps, ps[1:]))
    assert all(p >= 0 for p in ps)


@settings(max_examples=200, deadline=None)
@given(_texts)
def test_analyzer_registries_aligned(text):
    assert sorted(ANALYZERS) == sorted(ANALYZERS_POS)
    for name in ANALYZERS:
        assert len(analyze_pos(text, name)) == len(analyze(text, name))
