"""Faceting + stats — Solr's aggregation frameworks on DataFrames.

Reference (SURVEY.md §2.4): the JSON Facet API
(solr/core/src/java/org/apache/solr/search/facet/ — FacetField terms
buckets, FacetRange, FacetQuery; agg functions in facet/*Agg.java) and the
legacy StatsComponent (handler/component/StatsComponent.java +
StatsValuesFactory.java).

Physical note: the reference picks a per-field strategy by hand
(FacetFieldProcessorByArrayDV / ByHashDV / ByEnumTermsStream) and does a
distributed over-request + refinement dance (FacetComponent.java:346-519)
because per-shard top-N buckets can miss global winners. Spark's partial+
final hash aggregate is EXACT by construction — the groupBy shuffles each
key once, so no refinement round exists or is needed; top-N is applied
after the exact global counts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def terms_facet(
    df: DataFrame,
    field: str,
    limit: int = 10,
    mincount: int = 1,
    sort_by_count: bool = True,
    offset: int = 0,
) -> DataFrame:
    """Terms facet: value -> count with limit/offset/mincount/sort.

    Matches `json.facet={f:{type:terms,field:...,limit:...,mincount:...,
    sort:"count desc"}}` (facet/FacetField.java). Bucket sort ties break by
    the bucket value ascending (Solr's index order), making output
    deterministic.
    """
    out = df.groupBy(F.col(field).alias("value")).agg(F.count("*").alias("count"))
    if mincount > 0:
        out = out.where(F.col("count") >= mincount)
    order = (
        [F.col("count").desc(), F.col("value").asc()]
        if sort_by_count
        else [F.col("value").asc()]
    )
    out = out.orderBy(*order)
    if offset:
        out = out.offset(offset)
    return out.limit(limit)


def range_facet(
    df: DataFrame,
    field: str,
    start: float,
    end: float,
    gap: float,
    mincount: int = 0,
) -> DataFrame:
    """Numeric range facet: fixed-width buckets [start, end) with width gap.

    Matches facet.range / {type:range} (facet/FacetRange.java). Buckets with
    zero hits are omitted unless the caller unions a bucket spine (Solr
    emits empty buckets; for oracle comparability we emit observed buckets
    with mincount=0 semantics of 'present in data').
    """
    bucket = (
        F.floor((F.col(field) - F.lit(start)) / F.lit(gap)) * F.lit(gap) + F.lit(start)
    )
    out = (
        df.where((F.col(field) >= start) & (F.col(field) < end))
        .groupBy(bucket.cast("double").alias("bucket"))
        .agg(F.count("*").alias("count"))
    )
    if mincount > 0:
        out = out.where(F.col("count") >= mincount)
    return out.orderBy("bucket")


def range_facet_other(
    df: DataFrame,
    field: str,
    start: float,
    end: float,
    gap: float,
    include: str = "lower",
) -> DataFrame:
    """Range facet with the ``other`` sibling buckets (before/after/between).

    Matches facet.range.other=all (facet/FacetRange.java, FacetRangeOther
    enum) with facet.range.include = ``lower`` ([lo,hi) buckets, the
    default) or ``upper`` ((lo,hi] buckets). Returns (bucket string, count):
    numeric bucket starts plus the 'before' / 'after' / 'between' rows —
    Solr emits those as response siblings; the long form keeps one schema.

    One scan: the in-range rows feed the groupBy, and before/after/between
    are conditional sums of a SECOND aggregate over the same cached-free
    scan unioned in — both aggregations are map-side partial, so the
    shuffle carries only bucket keys + 3 counters.
    """
    x = F.col(field)
    if include == "upper":
        in_range = (x > F.lit(start)) & (x <= F.lit(end))
        before = x <= F.lit(start)
        idx = F.ceil((x - F.lit(start)) / F.lit(gap)) - F.lit(1)
    else:
        in_range = (x >= F.lit(start)) & (x < F.lit(end))
        before = x < F.lit(start)
        idx = F.floor((x - F.lit(start)) / F.lit(gap))
    bucket = (idx * F.lit(gap) + F.lit(start)).cast("double")
    buckets = (
        df.where(in_range)
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("count"))
        .select(F.col("bucket").cast("string").alias("bucket"), "count")
    )
    others = df.agg(
        F.sum(F.when(before, 1).otherwise(0)).cast("long").alias("before"),
        F.sum(F.when(~before & ~in_range, 1).otherwise(0)).cast("long").alias("after"),
        F.sum(F.when(in_range, 1).otherwise(0)).cast("long").alias("between"),
    ).select(
        F.expr("stack(3, 'before', before, 'after', after, 'between', between)")
        .alias("bucket", "count")
    )
    return buckets.unionByName(others).orderBy("bucket")


def date_range_facet(
    df: DataFrame,
    field: str,
    start: str,
    end: str,
    gap: str,
    mincount: int = 0,
) -> DataFrame:
    """Date range facet with a calendar-aware date-math gap.

    Matches ``facet.range`` on a date field with
    ``facet.range.gap=+1MONTH``-style gaps (facet/FacetRange.java —
    the reference calls DateMathParser per bucket edge because calendar
    months/years are irregular; util/DateMathParser.java). ``start`` /
    ``end`` are ISO instants or date-math expressions; ``gap`` is the
    date-math op string appended per step (``+1MONTH``, ``+7DAYS``…).

    Bucket edges are resolved DRIVER-SIDE (they're request constants, like
    the reference) and the counts come from ONE conditional-aggregate scan
    — each bucket is a ``sum(when(lo <= f < hi, 1))`` column of a single
    global aggregate, so the shuffle carries #buckets counters, never rows.
    Empty buckets are emitted (Solr does too); rows outside [start, end)
    are ignored. Returns (bucket ISO-date string, count) ordered by bucket.
    """
    from ..functions.datemath import parse_date_math

    lo = parse_date_math(start)
    hi = parse_date_math(end)
    edges = [lo]
    while edges[-1] < hi:
        nxt = parse_date_math(edges[-1].strftime("%Y-%m-%dT%H:%M:%S") + "Z" + gap)
        if nxt <= edges[-1]:
            raise ValueError(f"date range gap {gap!r} does not advance")
        if len(edges) >= 10_000:
            raise ValueError("date range facet with >10k buckets — widen the gap")
        edges.append(nxt)

    # midnight-aligned edges label as dates (the common facet.range shape);
    # sub-day gaps need the full instant or labels collide
    day_aligned = all(
        e.hour == 0 and e.minute == 0 and e.second == 0 and e.microsecond == 0
        for e in edges
    )
    label_fmt = "%Y-%m-%d" if day_aligned else "%Y-%m-%dT%H:%M:%SZ"

    x = F.col(field).cast("timestamp")
    aggs = []
    for i in range(len(edges) - 1):
        b_lo = edges[i].strftime("%Y-%m-%d %H:%M:%S")
        b_hi = edges[i + 1].strftime("%Y-%m-%d %H:%M:%S")
        aggs.append(
            F.sum(
                F.when(
                    (x >= F.lit(b_lo).cast("timestamp"))
                    & (x < F.lit(b_hi).cast("timestamp")),
                    1,
                ).otherwise(0)
            ).cast("long").alias(f"_b{i}")
        )
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{edges[i].strftime(label_fmt)}', _b{i}" for i in range(len(edges) - 1)
    )
    out = row.select(
        F.expr(f"stack({len(edges) - 1}, {stack_args})").alias("bucket", "count")
    )
    if mincount > 0:
        out = out.where(F.col("count") >= mincount)
    return out.orderBy("bucket")


def _parse_interval(spec: str):
    """Parse Solr interval syntax '[a,b)' / '(a,b]' / '[*,b]' / '(a,*)'.

    Returns (lo, lo_incl, hi, hi_incl) with None for '*'. Reference:
    request/IntervalFacets.java getInterval() — '[' / '(' select bound
    inclusivity; '*' is unbounded.
    """
    s = spec.strip()
    if s[0] not in "[(" or s[-1] not in ")]":
        raise ValueError(f"bad interval {spec!r}")
    lo_incl, hi_incl = s[0] == "[", s[-1] == "]"
    body = s[1:-1]
    lo_s, hi_s = (p.strip() for p in body.split(",", 1))
    lo = None if lo_s == "*" else float(lo_s)
    hi = None if hi_s == "*" else float(hi_s)
    return lo, lo_incl, hi, hi_incl


def interval_facet(df: DataFrame, field: str, intervals: Sequence[str]) -> DataFrame:
    """Interval facets: arbitrary (possibly overlapping) bound sets.

    Matches facet.interval (request/IntervalFacets.java): each interval is
    counted independently — unlike range facets they may overlap or leave
    gaps. ONE conditional-aggregation pass (the reference streams docValues
    once per field too); output (interval, count) in the given order.
    """
    x = F.col(field)
    preds = []
    for spec in intervals:
        lo, lo_incl, hi, hi_incl = _parse_interval(spec)
        p = F.lit(True) & x.isNotNull()
        if lo is not None:
            p = p & (x >= lo if lo_incl else x > lo)
        if hi is not None:
            p = p & (x <= hi if hi_incl else x < hi)
        preds.append(p)
    aggs = [
        F.sum(F.when(p, 1).otherwise(0)).cast("long").alias(f"_i{i}")
        for i, p in enumerate(preds)
    ]
    stack_args = ", ".join(
        f"'{spec}', _i{i}" for i, spec in enumerate(intervals)
    )
    return df.agg(*aggs).select(
        F.expr(f"stack({len(intervals)}, {stack_args})").alias("interval", "count")
    )


def query_facet(df: DataFrame, buckets: dict[str, Column]) -> DataFrame:
    """Query facet: named arbitrary-predicate buckets counted in ONE pass.

    Matches {type:query} buckets (facet/FacetQuery.java). Implemented as
    conditional aggregation — a single scan, no per-bucket jobs.
    """
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in buckets.items()
    ]
    return df.agg(*aggs)


def pivot_facet(
    df: DataFrame, fields: Sequence[str], limit_per_level: int | None = None
) -> DataFrame:
    """Hierarchical pivot facet: nested value counts over ``fields``.

    Matches facet.pivot (handler/component/PivotFacetProcessor.java). The
    flat (f1, f2, ..., count) form; Solr nests the same numbers as JSON.
    """
    out = df.groupBy(*fields).agg(F.count("*").alias("count"))
    return out.orderBy(*[F.col(f).asc() for f in fields])


def facet2d(
    df: DataFrame,
    x: str,
    y: str,
    dim_x: int = 10,
    dim_y: int = 10,
    metric: Column | None = None,
    metric_name: str = "count",
) -> DataFrame:
    """Facet2DStream: top ``dim_x`` x-buckets by the metric, then within
    each the top ``dim_y`` y-buckets (solrj io/stream/Facet2DStream.java:55
    — it issues a JSON terms facet on x, limit dimensionX, sorted metric
    desc, with a nested terms facet on y, limit dimensionY).

    Differs from ``pivot_facet``: both levels are METRIC-sorted and
    -limited, not value-ordered and exhaustive.

    Shape at scale: ONE (x, y) groupBy shuffle; the x-level totals are a
    re-aggregation of those (tiny) buckets; the surviving x set is
    broadcast back as a semi-join; the per-x window ranks at most
    dim_x * |y| bucket rows, never raw rows.
    """
    m = metric if metric is not None else F.count("*")
    # Facets never emit null buckets: a frequent NULL must neither win a
    # dim_x slot (it would then vanish in the semi-join, silently returning
    # fewer buckets) nor appear as a y bucket.
    dom = df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
    base = dom.groupBy(x, y).agg(m.alias(metric_name))
    # The x-level sort metric is the metric over the WHOLE x bucket (the
    # reference's outer JSON terms facet) — NOT a sum of per-(x,y) values,
    # which diverges for non-additive metrics (avg/min/max/unique). Two
    # aggregations over the same scan; both are bucket-sized.
    xtot = dom.groupBy(x).agg(m.alias("_xm"))
    topx = xtot.orderBy(F.col("_xm").desc(), F.col(x).asc()).limit(dim_x)
    pruned = base.join(F.broadcast(topx.select(x)), x, "left_semi")
    w = Window.partitionBy(x).orderBy(
        F.col(metric_name).desc(), F.col(y).asc()
    )
    return (
        pruned.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= dim_y)
        .drop("_r")
        .orderBy(x, F.col(metric_name).desc(), y)
    )


def field_stats(
    df: DataFrame,
    field: str,
    by: str | None = None,
    percentiles: Sequence[float] = (),
) -> DataFrame:
    """StatsComponent: min/max/sum/count/missing/sumOfSquares/mean/stddev.

    Matches handler/component/StatsComponent.java + StatsValuesFactory.
    ``percentiles`` uses Spark's exact percentile (the reference uses a
    t-digest sketch — AVLTreeDigest(100), facet/PercentileAgg.java:151 — so
    sketched values differ; exact is the stronger contract and what the
    DuckDB oracle computes).
    """
    c = F.col(field)
    aggs = [
        F.count(c).alias("count"),
        F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("long").alias("missing"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        F.sum(c * c).alias("sumsq"),
        F.avg(c).alias("mean"),
        F.stddev_samp(c).alias("stddev"),
    ]
    aggs += [
        F.percentile(c, F.lit(p)).alias(f"p{int(p * 100)}") for p in percentiles
    ]
    if by is None:
        return df.agg(*aggs)
    return df.groupBy(by).agg(*aggs).orderBy(by)


# ---------------------------------------------------------------------------
# JSON Facet API: nested buckets with stat sub-aggs and stat-sorted buckets
# ---------------------------------------------------------------------------

import re as _re

_AGG_RE = _re.compile(
    r"(sum|avg|min|max|unique|percentile|sumsq|variance|stddev|missing|countvals)"
    r"\((\w+)(?:\s*,\s*([\d.]+))?\)"
)


def _stat_col(expr: str) -> Column:
    """Parse a JSON-facet stat expression ('sum(f)', 'avg(f)', 'min(f)',
    'max(f)', 'unique(f)', 'percentile(f, 50)', 'sumsq(f)', 'variance(f)',
    'stddev(f)', 'missing(f)', 'countvals(f)', 'count') into a Column
    (facet/SlotAcc.java agg registry). variance/stddev are the sample
    (n-1) forms, matching Solr's VarianceAgg/StddevAgg."""
    if expr == "count":
        return F.count("*")
    m = _AGG_RE.fullmatch(expr.strip())
    if not m:
        raise ValueError(f"unsupported facet agg: {expr!r}")
    fn, fld, arg = m.group(1), m.group(2), m.group(3)
    c = F.col(fld)
    if fn == "sum":
        return F.sum(c)
    if fn == "avg":
        return F.avg(c)
    if fn == "min":
        return F.min(c)
    if fn == "max":
        return F.max(c)
    if fn == "unique":
        return F.countDistinct(c)
    if fn == "sumsq":
        return F.sum(c.cast("double") * c.cast("double"))
    if fn == "variance":
        return F.var_samp(c)
    if fn == "stddev":
        return F.stddev_samp(c)
    if fn == "missing":
        return F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("long")
    if fn == "countvals":
        return F.count(c)
    return F.percentile(c, F.lit(float(arg) / 100.0))


def _domain_filter(df: DataFrame, flt) -> DataFrame:
    """Apply a JSON-facet ``domain: {filter: ...}`` (FacetRequest.java
    domain changes). Accepts a Column, a simple ``field:value`` query
    string, or a SQL boolean expression string."""
    if isinstance(flt, Column):
        return df.where(flt)
    m = _re.fullmatch(r"(\w+):([\w.]+)", flt.strip())
    if m:
        return df.where(F.col(m.group(1)) == m.group(2))
    return df.where(F.expr(flt))


def _apply_domain(
    df: DataFrame,
    domain: dict,
    tagged_filters: dict[str, Column] | None,
) -> DataFrame:
    """FacetRequest.java domain changes, applied in the reference's order:

    1. ``excludeTags`` — multi-select faceting (the `{!tag=X}` / `{!ex=X}`
       idiom, facet/FacetRequest.java parseDomain + QueryContext tagMap):
       the caller passes the UNFILTERED base df plus ``tagged_filters``
       ({tag: predicate}); every tagged filter is applied EXCEPT the
       excluded tags, so a facet on field X can count over the domain that
       ignores X's own filter while keeping all the others.
    2. ``blockChildren`` / ``blockParent`` — block-join domain switches
       (search/join/BlockJoinChildQParserPlugin + FacetRequest's
       toChildren/toParent). On the two-table model the "bitset walk to
       the enclosing block" is an equi-semi-join on the block key:
       ``(other_df, domain_key, other_key)`` maps the surviving domain
       rows to the other table. The distinct key set is limit-unbounded
       but key-cardinality-sized — at 100 TB this stays a plain shuffled
       semi-join (no collect).
    3. ``filter`` — an extra predicate on the (possibly switched) domain.
    """
    excluded = set(domain.get("excludeTags") or [])
    for tag, pred in (tagged_filters or {}).items():
        if tag not in excluded:
            df = df.where(pred)
    for key in ("blockChildren", "blockParent"):
        block = domain.get(key)
        if block is not None:
            other_df, domain_key, other_key = block
            keys = df.select(F.col(domain_key).alias(other_key)).distinct()
            df = other_df.join(keys, other_key, "left_semi")
    if domain.get("filter") is not None:
        df = _domain_filter(df, domain["filter"])
    return df


def json_facet(df: DataFrame, spec: dict, _parents: list[str] | None = None,
               tagged_filters: dict[str, Column] | None = None
               ) -> dict[str, DataFrame]:
    """JSON Facet API terms facet with nested sub-facets and stat sorting.

    ``spec`` mirrors Solr's json.facet (facet/FacetField.java +
    FacetRequest.java): ``{"type": "terms", "field": ..., "limit": N,
    "mincount": M, "sort": "<stat>|count|index asc|desc", "prefix": str,
    "missing": bool, "allBuckets": bool, "numBuckets": bool,
    "domain": {"filter": <query>}, "facet":
    {statName: "sum(col)", subName: {nested terms spec}}}``.

    Returns ``{"buckets": <this facet's buckets>, "<subName>": <child flat
    table with the parent bucket columns>, ...}`` — nested children are
    flattened with dotted keys. Optional keys add siblings, each grouped by
    the parent bucket columns when nested: ``"missing"`` (count + stats over
    docs with a null field value — FacetField missing bucket),
    ``"allBuckets"`` (one bucket over the whole domain regardless of field
    value or limit), ``"numBuckets"`` (distinct non-null value count before
    offset/limit; computed exactly — no approximation, unlike distributed
    Solr's hll estimate). ``prefix`` restricts to values with the given
    prefix (applied to the domain rows, so stats and numBuckets see the
    same restriction). Bucket ties always break by bucket value
    ascending (Solr's index order), so output is deterministic.

    Scale shape: ONE groupBy per facet level (stats ride the same partial+
    final aggregate as the count — exact, no refinement pass needed, see
    module docstring); sub-facets semi-join the SURVIVING parent buckets
    (broadcast — the bucket list is limit-bounded) before their own single
    groupBy, and per-parent top-N is a window over the child aggregate, not
    a per-bucket job.
    """
    parents = _parents or []
    ftype = spec.get("type", "terms")
    base = df  # the pre-domain frame — children with excludeTags rebuild from it

    domain = spec.get("domain") or {}
    if domain or tagged_filters:
        df = _apply_domain(df, domain, tagged_filters)

    sub_spec = spec.get("facet", {}) or {}
    stats = {n: s for n, s in sub_spec.items() if isinstance(s, str)}
    subs = {n: s for n, s in sub_spec.items() if isinstance(s, dict)}

    def _child_base(s: dict, default: DataFrame, restrict) -> DataFrame:
        """Child facet domain. Normally the parent's surviving rows; a
        child ``domain:{excludeTags}`` REBUILDS from the pre-filter base
        (Solr regenerates the domain from the request minus the excluded
        tags, then re-applies the bucket constraint) — that needs the
        ``tagged_filters`` dict at this level."""
        cdom = s.get("domain") or {}
        if not cdom.get("excludeTags"):
            return default
        if not tagged_filters:
            raise ValueError(
                "a nested facet's domain.excludeTags needs tagged_filters "
                "passed to the json_facet level that applied them"
            )
        rebuilt = _apply_domain(base, cdom, tagged_filters)
        return restrict(rebuilt)

    def _strip_domain(s: dict) -> dict:
        return {k: v for k, v in s.items() if k != "domain"} \
            if (s.get("domain") or {}).get("excludeTags") else s

    aggs = [F.count("*").alias("count")] + [
        _stat_col(e).alias(n) for n, e in stats.items()
    ]

    if ftype == "query":
        # {"type":"query","q":...} — one bucket of the docs matching q
        # (facet/FacetQuery.java); sub-facets recurse on the matching rows.
        qdf = _domain_filter(df, spec["q"])
        buckets = qdf.groupBy(*parents).agg(*aggs) if parents else qdf.agg(*aggs)
        if parents:
            buckets = buckets.orderBy(*[F.col(p).asc() for p in parents])
        out = {"buckets": buckets}
        for name, s in subs.items():
            cb = _child_base(s, qdf, lambda re: _domain_filter(re, spec["q"]))
            child = json_facet(cb, _strip_domain(s), _parents=parents)
            for ck, cv in child.items():
                out[name if ck == "buckets" else f"{name}.{ck}"] = cv
        return out

    if ftype == "range":
        if spec.get("missing"):
            raise ValueError(
                "range facets have no missing bucket (use range_facet_other "
                "for before/after/between siblings)"
            )
        # {"type":"range","field":...,"start","end","gap"} — numeric range
        # buckets as a synthetic bucket column, then the shared terms logic
        # (one groupBy; stats/sub-facets/sort all apply per range bucket).
        x = F.col(spec["field"])
        start, end, gap = (float(spec[k]) for k in ("start", "end", "gap"))
        bname = spec.get("key", f"{spec['field']}_bucket")
        bucket = (
            F.floor((x - F.lit(start)) / F.lit(gap)) * F.lit(gap) + F.lit(start)
        ).cast("double")
        df = df.where((x >= start) & (x < end)).withColumn(bname, bucket)
        # children rebuilding their domain (excludeTags) semi-join on the
        # bucket column — give the pre-filter base the same synthetic col,
        # AND the same [start, end) restriction (otherwise rows beyond end
        # that share the trailing partial bucket's floor value would leak
        # into rebuilt child domains).
        base = base.where((x >= start) & (x < end)).withColumn(bname, bucket)
        field = bname
        limit = spec.get("limit")  # None — Solr ranges have no limit
        mincount = spec.get("mincount", 0)  # FacetRange default: full spine
        sort = spec.get("sort", "index asc")
    else:
        field = spec["field"]
        limit = spec.get("limit", 10)
        mincount = spec.get("mincount", 1)
        sort = spec.get("sort", "count desc")
    offset = spec.get("offset", 0)
    if limit is not None and limit < 0:
        limit = None  # Solr: limit:-1 = unlimited

    extras: dict[str, DataFrame] = {}
    if spec.get("missing"):
        mb = df.where(F.col(field).isNull())
        extras["missing"] = (
            mb.groupBy(*parents).agg(*aggs) if parents else mb.agg(*aggs)
        )
    if spec.get("prefix") is not None:
        df = df.where(F.col(field).startswith(spec["prefix"]))
    if spec.get("allBuckets"):
        ab = df.where(F.col(field).isNotNull())
        extras["allBuckets"] = (
            ab.groupBy(*parents).agg(*aggs) if parents else ab.agg(*aggs)
        )
    if spec.get("numBuckets"):
        nb = df.where(F.col(field).isNotNull())
        agg = F.countDistinct(F.col(field)).alias("numBuckets")
        extras["numBuckets"] = (
            nb.groupBy(*parents).agg(agg) if parents else nb.agg(agg)
        )

    buckets = df.where(F.col(field).isNotNull()).groupBy(*parents, field).agg(*aggs)
    if ftype == "range" and mincount == 0:
        # FacetRange emits the FULL bucket spine between start and end —
        # empty buckets appear with count 0 (stats stay null). The spine is
        # a tiny driver-free sequence; nested facets cross it with the
        # observed parent combinations.
        import math

        n_spine = int(math.ceil((end - start) / gap))
        spine = df.sparkSession.range(n_spine).select(
            (F.lit(start) + F.col("id") * F.lit(gap)).cast("double").alias(field)
        )
        if parents:
            spine = df.select(*parents).distinct().crossJoin(F.broadcast(spine))
        buckets = spine.join(buckets, [*parents, field], "left").na.fill(
            {"count": 0}
        )
    elif mincount > 0:
        buckets = buckets.where(F.col("count") >= mincount)

    sort_name, _, sort_dir = sort.partition(" ")
    sort_dir = sort_dir or "desc"
    if sort_name == "index":
        order = [F.col(field).asc() if sort_dir == "asc" else F.col(field).desc()]
    else:
        key = F.col(sort_name)
        order = [key.desc() if sort_dir == "desc" else key.asc(), F.col(field).asc()]

    if parents:
        # per-parent top-N: rank within each parent bucket
        w = Window.partitionBy(*parents).orderBy(*order)
        keep = F.col("_rn") > offset
        if limit is not None:
            keep = keep & (F.col("_rn") <= offset + limit)
        buckets = (
            buckets.withColumn("_rn", F.row_number().over(w))
            .where(keep)
            .drop("_rn")
            .orderBy(*[F.col(p).asc() for p in parents], *order)
        )
    else:
        buckets = buckets.orderBy(*order)
        if offset:
            buckets = buckets.offset(offset)
        if limit is not None:
            buckets = buckets.limit(limit)

    out: dict[str, DataFrame] = {"buckets": buckets, **extras}
    if subs:
        surviving = buckets.select(*parents, field)
        child_base = df.join(F.broadcast(surviving), [*parents, field], "left_semi")
        for name, s in subs.items():
            cb = _child_base(
                s, child_base,
                lambda re: re.join(
                    F.broadcast(surviving), [*parents, field], "left_semi"
                ),
            )
            child = json_facet(cb, _strip_domain(s), _parents=[*parents, field])
            for ck, cv in child.items():
                out[name if ck == "buckets" else f"{name}.{ck}"] = cv
    return out


def unique_agg(df: DataFrame, field: str, by: str | None = None) -> DataFrame:
    """`unique` facet agg — exact distinct count (facet/UniqueAgg.java)."""
    agg = F.countDistinct(F.col(field)).alias("unique")
    return df.agg(agg) if by is None else df.groupBy(by).agg(agg).orderBy(by)


def unique_block_agg(
    children: DataFrame, parent_key: str, by: str | None = None
) -> DataFrame:
    """`uniqueBlock(_root_)` facet agg — number of distinct parent BLOCKS
    the bucket's child docs belong to (facet/UniqueBlockAgg.java; Solr
    counts via the block's root docid, here the parent key column)."""
    agg = F.countDistinct(F.col(parent_key)).alias("unique_block")
    return (
        children.agg(agg) if by is None
        else children.groupBy(by).agg(agg).orderBy(by)
    )


def _relatedness_cols() -> tuple[Column, Column, Column]:
    """relatedness + popularity columns from fg_count/fg_size/bg_count/
    bg_size columns — the EXACT reference math (facet/RelatednessAgg.java:
    696-725): z-score of the bucket's foreground count under the background
    probability, squashed by a 5-sigmoid blend, rounded to 5 digits;
    popularities are counts over the BACKGROUND size (intentional, :489)."""
    bg_prob = F.col("bg_count") / F.col("bg_size")
    num = F.col("fg_count") - F.col("fg_size") * bg_prob
    denom = F.sqrt(F.col("fg_size") * bg_prob * (1 - bg_prob))
    z = num / F.when(denom == 0, F.lit(1e-10)).otherwise(denom)

    def sig(x: Column, offset: float, scale: float) -> Column:
        return (x + offset) / (scale + F.abs(x + offset))

    rel = 0.2 * (
        sig(z, -80, 50) + sig(z, -30, 30) + sig(z, 0, 30)
        + sig(z, 30, 30) + sig(z, 80, 50)
    )
    r5 = lambda c: F.round(c * 1e5) / 1e5  # noqa: E731  roundTo5Digits
    return (
        r5(rel).alias("relatedness"),
        r5(F.col("fg_count") / F.col("bg_size")).alias("foreground_popularity"),
        r5(F.col("bg_count") / F.col("bg_size")).alias("background_popularity"),
    )


def relatedness_facet(
    df: DataFrame,
    field: str,
    fg_filter: Column,
    limit: int = 10,
    min_count: int = 1,
) -> DataFrame:
    """`relatedness(fg, bg)` terms facet (facet/RelatednessAgg.java — the
    Semantic Knowledge Graph agg, Grainger et al. 2016): buckets of
    ``field`` scored by how much more the foreground set (rows matching
    ``fg_filter``) concentrates in the bucket than the background (all
    rows), sorted relatedness desc.

    ONE pass: fg/bg bucket counts are conditional aggregates of the same
    groupBy; fg/bg sizes ride along via grouping-free window-less scalars
    (a tiny 1-row cross join, broadcast)."""
    sizes = F.broadcast(
        df.agg(
            F.count("*").alias("bg_size"),
            F.sum(F.when(fg_filter, 1).otherwise(0)).cast("long").alias("fg_size"),
        )
    )
    counts = df.groupBy(F.col(field).alias("value")).agg(
        F.count("*").alias("bg_count"),
        F.sum(F.when(fg_filter, 1).otherwise(0)).cast("long").alias("fg_count"),
    )
    rel, fpop, bpop = _relatedness_cols()
    return (
        counts.where(F.col("fg_count") >= min_count)
        .crossJoin(sizes)
        .select("value", "fg_count", "bg_count", rel, fpop, bpop)
        .orderBy(F.col("relatedness").desc(), F.col("value").asc())
        .limit(limit)
    )


def hll_agg(df: DataFrame, field: str, by: str | None = None, rsd: float = 0.023) -> DataFrame:
    """`hll` facet agg — approximate distinct via HLL++ (facet/HLLAgg.java
    uses org.apache.solr.util.hll; Spark's approx_count_distinct is the
    HyperLogLog++ equivalent). Not oracle-comparable (different sketch)."""
    agg = F.approx_count_distinct(F.col(field), rsd).alias("hll")
    return df.agg(agg) if by is None else df.groupBy(by).agg(agg).orderBy(by)
