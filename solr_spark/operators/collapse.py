"""Field collapsing / expand / grouping — Solr's window-function analogues.

Reference behavior (SURVEY.md §2.5):
- Collapse: keep one "group head" per collapse-field value, chosen by
  max/min of a sort criterion (solr/core/src/java/org/apache/solr/search/
  CollapsingQParserPlugin.java:107-139 — 3480 LoC of hand-rolled per-segment
  collectors; here it is one window spec).
- Expand: after collapsing, return the top-N *other* members of each
  collapsed group (handler/component/ExpandComponent.java).
- Grouping (`group=true`): top-N docs per group value, distributed via a
  TOP_GROUPS stage (search/Grouping.java:1046, ResponseBuilder STAGE
  constants). Spark's window + filter compiles to one shuffle on the group
  key — the same data movement Solr's two-phase group merge performs.

Determinism: every spec must end with a unique tiebreak column (the docid),
mirroring Lucene's internal-docID tie-break, so results are identical at any
parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordered_window(partition_col: str, order_by: list[Column]):
    return Window.partitionBy(partition_col).orderBy(*order_by)


def _salted_top_n(
    df: DataFrame, field: str, order_by: list[Column], n: int, salt: int
) -> DataFrame:
    """Two-phase salted top-n per ``field`` value (returns rows + ``_rn``).

    The single-window shape shuffles EVERY row of a hot group value into one
    window partition — on a web corpus where one collapse value covers 40%
    of 10^12 docs that partition is the job. Salting bounds it: phase 1
    partitions by (field, hash(row) % salt) and keeps each bucket's top-n,
    so phase 2's per-key partition holds at most ``salt * n`` rows. Because
    every spec ends in a unique tiebreak (module contract), the ordering is
    total and the union of per-bucket top-n sets contains exactly the global
    top-n — results are identical to the unsalted window at any parallelism.
    This is the north-star "salted repartitioning for hot-term skew" applied
    at the one place this engine still keys a per-row shuffle by a
    potentially hot value (index build / term stats aggregate by
    (term, docid) / associative sums, which partial-aggregate map-side and
    need no salt).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    w1 = Window.partitionBy(field, "_salt").orderBy(*order_by)
    local = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= n)
        .drop("_rn", "_salt")
    )
    w2 = _ordered_window(field, order_by)
    return local.withColumn("_rn", F.row_number().over(w2)).where(
        F.col("_rn") <= n
    )


def collapse(
    df: DataFrame, field: str, order_by: list[Column],
    keep_rank_col: bool = False, null_policy: str = "ignore",
    salt: int | None = None,
) -> DataFrame:
    """`{!collapse field=f sort=... nullPolicy=...}`: one group-head row per
    value of ``field``.

    nullPolicy (CollapsingQParserPlugin NULL_IGNORE/NULL_EXPAND/
    NULL_COLLAPSE): ``ignore`` drops null-field docs (the reference
    default), ``expand`` keeps every null-field doc as its own group,
    ``collapse`` treats null as one more group value (all nulls shuffle to
    one window partition — fine for sparse nulls, a skew hazard when most
    docs lack the field; prefer expand/ignore there, or pass ``salt``).

    ``salt``: route hot collapse values through the two-phase salted
    top-1 (see ``_salted_top_n``) — identical results, per-key window
    partitions bounded at ``salt`` rows in the final phase. Use when a
    single field value can dominate the corpus."""
    if null_policy not in ("ignore", "expand", "collapse"):
        raise ValueError(f"unknown nullPolicy {null_policy!r}")
    base = df if null_policy == "collapse" else df.where(F.col(field).isNotNull())
    if salt and salt > 1:
        out = _salted_top_n(base, field, order_by, 1, salt)
    else:
        w = _ordered_window(field, order_by)
        out = base.withColumn("_rn", F.row_number().over(w)).where(
            F.col("_rn") == 1
        )
    if null_policy == "expand":
        nulls = df.where(F.col(field).isNull()).withColumn("_rn", F.lit(1))
        out = out.unionByName(nulls)
    return out if keep_rank_col else out.drop("_rn")


def expand(
    df: DataFrame, field: str, order_by: list[Column], rows: int = 5,
    salt: int | None = None,
) -> DataFrame:
    """ExpandComponent: top-``rows`` NON-head members of each collapsed group."""
    if salt and salt > 1:
        ranked = _salted_top_n(df, field, order_by, rows + 1, salt)
    else:
        w = _ordered_window(field, order_by)
        ranked = df.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.where((F.col("_rn") > 1) & (F.col("_rn") <= rows + 1))
        .drop("_rn")
    )


def group_top_n(
    df: DataFrame, field: str, order_by: list[Column], n: int = 1,
    salt: int | None = None,
) -> DataFrame:
    """`group=true&group.field=f&group.limit=n`: top-n rows per group value."""
    if salt and salt > 1:
        return _salted_top_n(df, field, order_by, n, salt).drop("_rn")
    w = _ordered_window(field, order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )
