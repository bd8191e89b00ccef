"""cursorMark deep paging — keyset pagination.

Reference: solr/core/src/java/org/apache/solr/search/CursorMark.java:42-69 —
the cursor totem serializes the LAST document's sort values; the next page
adds a filter "sort tuple strictly after the totem" so deep pages cost
O(page), not O(offset). Requires the sort to end with the uniqueKey so the
tuple order is total (CursorMark enforces this; we do too).

Spark shape: the keyset predicate is an ordinary filter — it pushes down to
the scan — followed by the same ORDER BY ... LIMIT page_size top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _after_totem(sort_spec: list[tuple[str, bool]], totem: tuple) -> Column:
    """Lexicographic 'row > totem' predicate for a mixed asc/desc sort."""
    pred = F.lit(False)
    for i in range(len(sort_spec) - 1, -1, -1):
        col, asc = sort_spec[i]
        c = F.col(col)
        v = F.lit(totem[i])
        strict = c > v if asc else c < v
        pred = strict | ((c == v) & pred)
    return pred


def cursor_page(
    df: DataFrame,
    sort_spec: list[tuple[str, bool]],
    page_size: int,
    totem: tuple | None = None,
) -> DataFrame:
    """One page. ``sort_spec`` = [(col, ascending), ...] and MUST end with a
    unique column. ``totem=None`` is the first page (cursorMark=*); else the
    sort values of the previous page's last row."""
    if totem is not None:
        df = df.where(_after_totem(sort_spec, totem))
    order = [F.col(c).asc() if asc else F.col(c).desc() for c, asc in sort_spec]
    return df.orderBy(*order).limit(page_size)


def next_totem(page_rows: list, sort_spec: list[tuple[str, bool]]) -> tuple | None:
    """Driver-side: compute the cursor for the following page."""
    if not page_rows:
        return None
    last = page_rows[-1]
    return tuple(last[c] for c, _ in sort_spec)
