"""Streaming-expression operators (Solr's relational algebra) on DataFrames.

Reference: the decorator TupleStreams under
solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/ (SURVEY.md
§2.3/§2.7). Solr's streams are PULL-based iterators whose physical strategy
is fixed by the expression author (merge join demands pre-sorted inputs;
hashJoin builds an in-memory table). On Spark the same operators are
declarative and Catalyst/AQE choose sort-merge vs broadcast-hash at runtime
— so `innerJoin` and `hashJoin` converge to one `join` call, with an
explicit `broadcast()` hint standing in for the "hashed" side.

Ordering: Solr streams carry a sort contract through every operator because
merge-join/rollup depend on it. DataFrames are unordered multisets; sort is
applied once at the sink. Operators here therefore take/return unordered
frames and expose an explicit `sort` only where semantics require it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_stream(*dfs: DataFrame) -> DataFrame:
    """`merge(a, b, on=...)` — union of N streams (io/stream/MergeStream.java:250).

    The reference k-way merge exists only to preserve a sort order
    pull-side; the relational content is UNION ALL. Sort at the sink.
    """
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def unique_stream(df: DataFrame, over: Sequence[str]) -> DataFrame:
    """`unique(s, over=f)` — dedupe by key (io/stream/UniqueStream.java).

    The reference keeps the FIRST tuple per key in sort order; a plain
    dropDuplicates keeps an arbitrary one, so for determinism this projects
    to the key columns (the reference use-case is key extraction).
    """
    return df.select(*over).distinct()


def intersect_stream(df: DataFrame, other: DataFrame, on: Sequence[str]) -> DataFrame:
    """`intersect(a, b, on=...)` — rows of A whose key appears in B
    (io/stream/IntersectStream.java). Left-semi join."""
    return df.join(other.select(*on).distinct(), on=list(on), how="left_semi")


def complement_stream(df: DataFrame, other: DataFrame, on: Sequence[str]) -> DataFrame:
    """`complement(a, b, on=...)` — rows of A whose key is absent from B
    (io/stream/ComplementStream.java). Left-anti join."""
    return df.join(other.select(*on).distinct(), on=list(on), how="left_anti")


def inner_join_stream(
    df: DataFrame, other: DataFrame, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """`innerJoin`/`leftOuterJoin` — merge join over sorted streams
    (io/stream/InnerJoinStream.java, LeftOuterJoinStream.java). Spark picks
    sort-merge or broadcast itself; semantics are the equi-join."""
    return df.join(other, on=list(on), how=how)


def hash_join_stream(
    df: DataFrame, hashed: DataFrame, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """`hashJoin(a, hashed=b, on=...)` (io/stream/HashJoinStream.java:287) —
    the author asserts b fits in memory; express that as a broadcast hint."""
    return df.join(F.broadcast(hashed), on=list(on), how=how)


def fetch_stream(
    df: DataFrame, source: DataFrame, on: str, fields: Sequence[str]
) -> DataFrame:
    """`fetch(collection, s, on=..., fl=...)` — batched lookup join to
    enrich tuples (io/stream/FetchStream.java). Left join on the key,
    selecting only the requested fields."""
    return df.join(source.select(on, *fields), on=on, how="left")


def cartesian_product(df: DataFrame, field: str, out: str | None = None) -> DataFrame:
    """`cartesianProduct(s, f)` — explode a multivalued field into N tuples
    (io/stream/CartesianProductStream.java; despite the name it's unnest)."""
    return df.withColumn(out or field, F.explode(F.col(field)))


def rollup_stream(
    df: DataFrame, over: Sequence[str], aggs: dict[str, Column]
) -> DataFrame:
    """`rollup(s, over=..., sum(x), ...)` — group-by aggregation
    (io/stream/RollupStream.java:193-216 holds ONE group at a time because
    its input is sorted; Spark's hash aggregate with partial+final combine
    is the unsorted generalization). `hashRollup` is the same operator."""
    return df.groupBy(*over).agg(*[c.alias(n) for n, c in aggs.items()])


hash_rollup = rollup_stream


def top_stream(df: DataFrame, order_by: list[Column], n: int) -> DataFrame:
    """`top(n, s, sort=...)` (io/stream/RankStream.java) — reorder + limit.
    Compiles to TakeOrderedAndProject: per-partition heap + driver merge,
    the same two-phase shape as Solr's distributed top-k merge."""
    return df.orderBy(*order_by).limit(n)


def select_stream(df: DataFrame, mapping: dict[str, Column | str]) -> DataFrame:
    """`select(s, f as g, ...)` — projection/rename (io/stream/SelectStream.java)."""
    cols = [
        (F.col(c) if isinstance(c, str) else c).alias(name)
        for name, c in mapping.items()
    ]
    return df.select(*cols)


def having_stream(df: DataFrame, predicate: Column) -> DataFrame:
    """`having(s, booleanEvaluator)` — keep tuples for which the evaluator
    is true (io/stream/HavingStream.java). The evaluator maps to any
    boolean Column, so comparisons/and/or/not compile to pushable JVM
    predicates instead of per-tuple evaluator objects."""
    return df.where(predicate)


def sort_stream(df: DataFrame, by: list[Column]) -> DataFrame:
    """`sort(s, by=...)` — full re-sort (io/stream/SortStream.java buffers
    the whole stream then quicksorts on one node; here it's a distributed
    range-partitioned sort, the scale-correct shape)."""
    return df.orderBy(*by)


def reduce_stream(
    df: DataFrame, by: Sequence[str], sort: list[Column],
    group_col: str = "group", max_group_size: int | None = None,
) -> DataFrame:
    """`reduce(s, by=..., group(sort=..., n=...))` — gather each key's
    tuples into one grouped tuple (io/stream/ReducerStream.java with
    GroupOperation). One groupBy: tuples are collected as structs, sorted
    inside the group with array_sort on the sort-key prefix, and truncated
    to the group head — never a per-key driver loop. The reference relies
    on input sort order to detect group boundaries; the hash aggregate is
    the unsorted generalization."""
    sort_names = [f"_s{i}" for i in range(len(sort))]
    rest = [c for c in df.columns]
    packed = df.select(
        *by,
        F.struct(
            *[c.alias(n) for c, n in zip(sort, sort_names)],
            F.struct(*rest).alias("_t"),
        ).alias("_p"),
    )
    grouped = packed.groupBy(*by).agg(
        F.array_sort(F.collect_list("_p")).alias("_g")
    )
    g = F.transform(F.col("_g"), lambda s: s["_t"])
    if max_group_size is not None:
        g = F.slice(g, 1, max_group_size)
    return grouped.select(*by, g.alias(group_col))


def outer_hash_join_stream(
    df: DataFrame, hashed: DataFrame, on: Sequence[str]
) -> DataFrame:
    """`outerHashJoin(a, hashed=b, on=...)` — left outer with the hashed
    side broadcast (io/stream/OuterHashJoinStream.java)."""
    return df.join(F.broadcast(hashed), on=list(on), how="left")


def random_stream(
    df: DataFrame, n: int, seed: str = "0", id_col: str = "id"
) -> DataFrame:
    """`random(collection, rows=n)` — pseudo-random sample
    (io/stream/RandomStream.java uses a random-ordering ValueSource).
    Deterministic portable variant: order by md5(seed || id) — a seeded
    uniform permutation both engines compute identically, so samples are
    reproducible and oracle-checkable. TakeOrderedAndProject, not a full
    sort."""
    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    return (
        df.withColumn("_rk", key)
        .orderBy(F.col("_rk").asc(), F.col(id_col).asc())
        .limit(n)
        .drop("_rk")
    )


def stratified_sample_stream(
    df: DataFrame, strata: str, n_per_stratum: int,
    seed: str = "0", id_col: str = "id",
) -> DataFrame:
    """Deterministic stratified sampling: up to ``n_per_stratum`` rows per
    ``strata`` value, chosen by the same seeded md5 permutation as
    random_stream so samples are reproducible and oracle-checkable.

    A training-data pipeline staple (balance languages/sources before
    mixing) the reference has no single operator for — it composes
    `random` per collection query. Scale shape: one window ranked within
    each stratum (shuffle keyed by the strata column; AQE splits skewed
    strata), never a driver loop over strata values.
    """
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def hash_partition_filter(
    df: DataFrame, keys: Sequence[str], workers: int, worker: int
) -> DataFrame:
    """`{!hash workers=N worker=i}` — keep rows whose key-hash lands on this
    worker (search/HashQParserPlugin.java; the shuffle primitive under
    `parallel(...)`). Uses the portable md5-derived hash so results are
    engine-independent; in a pure-Spark pipeline `df.repartition(N, *keys)`
    is the same data movement without materializing the filter."""
    from solr_spark.functions.dedup import content_hash

    h = content_hash(F.concat_ws("\x00", *[F.col(k).cast("string") for k in keys]))
    return df.where(F.pmod(h, F.lit(workers)) == F.lit(worker))


def hash_range_filter(
    df: DataFrame, key: str, lower: int, upper: int
) -> DataFrame:
    """`{!hashRange f=key l=lower u=upper}` — keep rows whose key-hash falls
    in [lower, upper] (search/HashRangeQParserPlugin.java: the filter each
    shard-half applies during an index split). Same portable md5-derived
    hash as `{!hash}`, so split halves are consistent with worker routing."""
    from solr_spark.functions.dedup import content_hash

    h = content_hash(F.col(key).cast("string"))
    return df.where((h >= F.lit(lower)) & (h <= F.lit(upper)))


def timeseries_stream(
    df: DataFrame,
    ts_col: str,
    unit: str,
    aggs: dict[str, Column],
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """`timeseries(...)` — date-range facet over a time column
    (io/stream/TimeSeriesStream.java = a FacetRange on dates). ``unit`` is a
    date_trunc unit (year/quarter/month/week/day/hour).

    With ``start``/``end`` (ISO timestamps), every bucket in the range is
    emitted even when empty — the reference's range facet emits the full
    bucket spine with count 0. The spine is one `sequence()` literal
    exploded from a single row (range/gap buckets, not data rows) and
    broadcast into the left join, so gap-filling adds no shuffle of data.
    """
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    out = df.groupBy(bucket).agg(*[c.alias(n) for n, c in aggs.items()])
    if start is not None and end is not None:
        spark = df.sparkSession
        # interval literals have no QUARTER unit — express it as 3 months
        step = "3 month" if unit.lower() == "quarter" else f"1 {unit}"
        spine = spark.range(1).select(
            F.explode(
                F.expr(
                    f"sequence(timestamp'{start}', timestamp'{end}',"
                    f" interval {step})"
                )
            ).alias("bucket")
        )
        # empty buckets: count-like metrics become 0 (the reference emits
        # count:0 and omits other stats; a columnar row fills 0 for all).
        out = spine.join(out, "bucket", "left").select(
            "bucket",
            *[F.coalesce(F.col(n), F.lit(0)).alias(n) for n in aggs],
        )
    return out.orderBy("bucket")
