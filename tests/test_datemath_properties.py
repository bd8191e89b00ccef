"""Hypothesis sweep of the date-math parser (DateMathParser.java parity).

Contract pinned here: ``parse_date_math`` either returns a tz-aware UTC
datetime or raises ValueError — no other exception type escapes, for ANY
input text (the reference throws its one SyntaxError analogue the same
way). Plus algebraic properties on well-formed expressions: rounding is
idempotent, fixed-duration +N/-N cancels, and operations apply left to
right. Pure Python — no SparkSession.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from solr_spark.functions.datemath import parse_date_math

_NOW = datetime(2026, 8, 19, 14, 33, 7, 123456, tzinfo=timezone.utc)

_META = "NOW+-/0123456789DAYSMONTHYEARHOURMINSECMILLI TZ:."
_garbage = st.text(
    alphabet=st.one_of(st.sampled_from(_META), st.characters()),
    max_size=40,
)

_ROUND_UNITS = ["YEAR", "MONTH", "DAY", "HOUR", "MINUTE", "SECOND", "MILLI"]
_FIXED_UNITS = ["DAYS", "HOURS", "MINUTES", "SECONDS", "MILLIS"]

_valid_op = st.one_of(
    st.sampled_from(["/" + u for u in _ROUND_UNITS]),
    st.tuples(
        st.sampled_from(["+", "-"]),
        st.integers(min_value=0, max_value=9999),
        st.sampled_from(_FIXED_UNITS),
    ).map(lambda t: f"{t[0]}{t[1]}{t[2]}"),
    # calendar units bounded so 5 ops can't leave datetime's [1, 9999]
    # year range (a PLATFORM bound, correctly reported as ValueError —
    # test_single_exception_contract covers the out-of-range behavior)
    st.tuples(
        st.sampled_from(["+", "-"]),
        st.integers(min_value=0, max_value=100),
        st.sampled_from(["MONTHS", "YEARS"]),
    ).map(lambda t: f"{t[0]}{t[1]}{t[2]}"),
)
_valid_expr = st.lists(_valid_op, max_size=5).map(lambda ops: "NOW" + "".join(ops))


@settings(max_examples=500, deadline=None)
@given(_garbage)
def test_single_exception_contract(s):
    try:
        out = parse_date_math(s, now=_NOW)
    except ValueError:
        return
    assert isinstance(out, datetime) and out.tzinfo is not None


@settings(max_examples=300, deadline=None)
@given(_valid_expr)
def test_valid_expressions_resolve(expr):
    out = parse_date_math(expr, now=_NOW)
    assert out.tzinfo is not None
    assert parse_date_math(expr, now=_NOW) == out  # deterministic


@settings(max_examples=100, deadline=None)
@given(st.sampled_from(_ROUND_UNITS))
def test_rounding_idempotent(unit):
    once = parse_date_math(f"NOW/{unit}", now=_NOW)
    twice = parse_date_math(f"NOW/{unit}/{unit}", now=_NOW)
    assert once == twice
    assert once <= _NOW


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=99999), st.sampled_from(_FIXED_UNITS))
def test_fixed_duration_cancels(n, unit):
    assert parse_date_math(f"NOW+{n}{unit}-{n}{unit}", now=_NOW) == _NOW


def test_left_to_right_order():
    # round THEN add != add THEN round
    a = parse_date_math("NOW/DAY+1HOUR", now=_NOW)
    b = parse_date_math("NOW+1HOUR/DAY", now=_NOW)
    assert a == datetime(2026, 8, 19, 1, 0, tzinfo=timezone.utc)
    assert b == datetime(2026, 8, 19, tzinfo=timezone.utc)


def test_overflow_is_valueerror():
    with pytest.raises(ValueError):
        parse_date_math("NOW+999999999999999DAYS", now=_NOW)
    with pytest.raises(ValueError):
        parse_date_math("NOW+999999999YEARS", now=_NOW)


def test_now_requires_anchor():
    with pytest.raises(ValueError):
        parse_date_math("NOW/DAY")
