"""Hypothesis robustness sweep of the Lucene-grammar parser.

The reference parser (solr/core/src/java/org/apache/solr/parser/
QueryParser.jj) is generated from a grammar and throws SyntaxError on
malformed input; ours is deliberately LENIENT (unmatched characters are
skipped, unbalanced quotes/parens degrade gracefully) because a search
box should never 500 on user input. These properties pin that contract:
``parse_query`` and ``_split_top_level`` are total functions over
arbitrary text, their output is always structurally well-formed, and
parsing is deterministic. Pure Python — no SparkSession needed.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from solr_spark.query.parser import Clause, ParsedQuery, _split_top_level, parse_query

_KINDS = {"term", "phrase", "prefix", "fuzzy", "filter_eq", "filter_range"}
_OCCURS = {"should", "must", "must_not"}

# Arbitrary text, biased toward query metacharacters so the sweep spends
# its examples on the grammar's edges rather than on plain prose.
_META = '+-!^~*"()[]{}:&|\\ \t'
_adversarial = st.text(
    alphabet=st.one_of(
        st.sampled_from(_META),
        st.characters(codec="ascii"),
        st.characters(),  # full unicode
    ),
    max_size=80,
)


def _assert_well_formed(p: ParsedQuery) -> None:
    assert isinstance(p, ParsedQuery)
    for c in p.clauses:
        assert isinstance(c, Clause)
        assert c.kind in _KINDS, c
        assert c.occur in _OCCURS, c
        assert isinstance(c.boost, float) and not math.isnan(c.boost), c
        assert c.boost >= 0.0, c
        assert isinstance(c.slop, int) and c.slop >= 0, c
        if c.kind == "filter_range":
            assert c.field and c.lo is not None and c.hi is not None, c
        if c.kind == "filter_eq":
            assert c.field, c
        if c.kind in ("term", "phrase", "prefix"):
            assert isinstance(c.text, str), c


@settings(max_examples=300, deadline=None)
@given(_adversarial)
def test_parse_query_total_and_well_formed(q):
    _assert_well_formed(parse_query(q))


@settings(max_examples=100, deadline=None)
@given(_adversarial)
def test_parse_query_deterministic(q):
    assert parse_query(q) == parse_query(q)


@settings(max_examples=300, deadline=None)
@given(_adversarial)
def test_split_top_level_total_and_shrinking(q):
    flat, groups = _split_top_level(q)
    assert isinstance(flat, str)
    for occur, boost, inner in groups:
        assert occur in _OCCURS
        assert isinstance(boost, float) and not math.isnan(boost) and boost >= 0.0
        # Every group body is STRICTLY shorter than its input: the group's
        # own parenthesis is consumed. This is the termination argument for
        # search()'s recursive group compilation — depth is bounded by the
        # query length even on unbalanced-paren garbage.
        assert len(inner) < max(len(q), 1)
        # The flat remainder re-parses cleanly too (search() does this).
        _assert_well_formed(parse_query(inner))
    _assert_well_formed(parse_query(flat))


@settings(max_examples=100, deadline=None)
@given(_adversarial)
def test_split_top_level_deterministic(q):
    assert _split_top_level(q) == _split_top_level(q)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=40))
def test_plain_terms_never_lost(q):
    """Whitespace-separated [a-z0-9] words with no grammar metachars parse
    to exactly one SHOULD term clause per word."""
    words = [w for w in q.split() if w.isalnum() and w.islower()]
    p = parse_query(" ".join(words))
    assert [c.text for c in p.clauses] == words
    assert all(c.kind == "term" and c.occur == "should" for c in p.clauses)
