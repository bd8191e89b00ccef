"""Solr date math: ``NOW/DAY+7DAYS``-style expressions.

Reference (solr/core/src/java/org/apache/solr/util/DateMathParser.java;
SURVEY.md §2.2 range queries): a date anchor (``NOW`` or an ISO instant
ending in ``Z``) followed by operations applied LEFT TO RIGHT:

- ``+N UNIT`` / ``-N UNIT`` — arithmetic (months/years via calendar math,
  the rest as fixed durations);
- ``/UNIT`` — round DOWN to the start of that unit.

Units (singular or plural, per the reference's CALENDAR_UNITS):
YEAR MONTH DAY DATE HOUR MINUTE MINUTES MIN SECOND SECONDS SEC
MILLI MILLIS MILLISECOND MILLISECONDS.

The reference resolves the expression to a literal instant BEFORE building
the range query — same here: resolve driver-side, push the literal into
the scan predicate (partition-prunable, nothing per-row).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_UNIT_CANON = {
    "YEAR": "YEAR", "YEARS": "YEAR",
    "MONTH": "MONTH", "MONTHS": "MONTH",
    "DAY": "DAY", "DAYS": "DAY", "DATE": "DAY",
    "HOUR": "HOUR", "HOURS": "HOUR",
    "MINUTE": "MINUTE", "MINUTES": "MINUTE", "MIN": "MINUTE", "MINS": "MINUTE",
    "SECOND": "SECOND", "SECONDS": "SECOND", "SEC": "SECOND", "SECS": "SECOND",
    "MILLI": "MILLI", "MILLIS": "MILLI",
    "MILLISECOND": "MILLI", "MILLISECONDS": "MILLI",
}

_OP_RE = re.compile(r"([+\-/])(\d*)([A-Z]+)")


def _round_down(t: datetime, unit: str) -> datetime:
    if unit == "YEAR":
        return t.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "MONTH":
        return t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "DAY":
        return t.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "HOUR":
        return t.replace(minute=0, second=0, microsecond=0)
    if unit == "MINUTE":
        return t.replace(second=0, microsecond=0)
    if unit == "SECOND":
        return t.replace(microsecond=0)
    if unit == "MILLI":
        return t.replace(microsecond=(t.microsecond // 1000) * 1000)
    raise ValueError(f"bad unit {unit}")


def _add(t: datetime, n: int, unit: str) -> datetime:
    if unit == "YEAR":
        # clamp Feb 29 -> Feb 28 like java.time plusYears
        try:
            return t.replace(year=t.year + n)
        except ValueError:
            return t.replace(year=t.year + n, day=28)
    if unit == "MONTH":
        # calendar month math, clamping the day like java.time plusMonths
        total = (t.year * 12 + t.month - 1) + n
        y, m = divmod(total, 12)
        m += 1
        for day in range(t.day, 27, -1):
            try:
                return t.replace(year=y, month=m, day=day)
            except ValueError:
                continue
        return t.replace(year=y, month=m, day=min(t.day, 28))
    delta = {
        "DAY": timedelta(days=n),
        "HOUR": timedelta(hours=n),
        "MINUTE": timedelta(minutes=n),
        "SECOND": timedelta(seconds=n),
        "MILLI": timedelta(milliseconds=n),
    }[unit]
    return t + delta


def parse_date_math(expr: str, now: datetime | None = None) -> datetime:
    """Resolve a date-math expression to a concrete UTC instant.

    ``now`` anchors ``NOW`` (the reference takes it from the request's
    NOW= param or the wall clock); an explicit ISO anchor ignores it.
    """
    s = expr.strip()
    if s.upper().startswith("NOW"):
        if now is None:
            raise ValueError(
                "expression anchored at NOW needs an explicit now= "
                "(deterministic resolution; the reference reads NOW= too)"
            )
        t, rest = now, s[3:]
    else:
        m = re.match(r"(\d{4}-\d{2}-\d{2}(?:T\d{2}:\d{2}(?::\d{2}(?:\.\d+)?)?)?)Z?",
                     s)
        if not m:
            raise ValueError(f"bad date math anchor in {expr!r}")
        iso = m.group(1)
        if "T" not in iso:
            iso += "T00:00:00"
        elif iso.count(":") == 1:
            iso += ":00"
        t = datetime.fromisoformat(iso).replace(tzinfo=timezone.utc)
        rest = s[m.end():]
    if t.tzinfo is None:
        t = t.replace(tzinfo=timezone.utc)

    pos = 0
    for m in _OP_RE.finditer(rest):
        if m.start() != pos:
            raise ValueError(f"bad date math ops in {expr!r}")
        pos = m.end()
        op, num, unit_s = m.groups()
        unit = _UNIT_CANON.get(unit_s)
        if unit is None:
            raise ValueError(f"unknown date math unit {unit_s!r}")
        if op == "/":
            if num:
                raise ValueError(f"rounding takes no count in {expr!r}")
            t = _round_down(t, unit)
        else:
            if not num:
                raise ValueError(f"{op}{unit_s} needs a count in {expr!r}")
            try:
                t = _add(t, int(num) if op == "+" else -int(num), unit)
            except OverflowError as e:
                # timedelta/datetime overflow on absurd counts: surface the
                # same typed error as every other malformed expression so
                # callers have ONE exception contract (ValueError).
                raise ValueError(f"date math count out of range in {expr!r}") from e
    if pos != len(rest.strip()):
        raise ValueError(f"trailing junk in date math {expr!r}")
    return t
