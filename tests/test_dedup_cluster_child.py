"""dup_clusters connected components, [child] transformer, diff /
movingMedian evaluators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_dup_clusters_transitive_chain(spark):
    from solr_spark.functions.dedup import dup_clusters

    # a-b-c chain + d-e pair + isolated f-g: components {a,b,c}, {d,e}, {f,g}
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 4), (7, 6)], ["id_a", "id_b"]
    )
    out = dup_clusters(pairs).toPandas()
    got = dict(zip(out["node"], out["cluster"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 6}
    canon = set(out.loc[out["is_canonical"], "node"])
    assert canon == {1, 4, 6}


def test_dup_clusters_long_chain_converges(spark):
    from solr_spark.functions.dedup import dup_clusters

    # a 12-node path: worst case for min-label propagation diameter
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], ["id_a", "id_b"]
    )
    out = dup_clusters(pairs, max_iter=15).toPandas()
    assert (out["cluster"] == 0).all()
    assert set(out["node"]) == set(range(12))


def test_child_transform_filter_and_cap(spark):
    from solr_spark.operators.joins import child_transform

    parents = spark.createDataFrame([(1,), (2,)], ["pk"])
    children = spark.createDataFrame(
        [(1, i, i * 10) for i in range(5)] + [(2, 0, 3), (3, 0, 99)],
        ["pk", "line", "qty"],
    )
    out = child_transform(
        parents, children, "pk",
        child_filter=F.col("qty") >= 10, limit=2, order_by="line",
    ).toPandas()
    # parent 3 absent (not matched); parent 2's only child filtered out
    assert set(out["pk"]) == {1}
    assert sorted(out["line"]) == [1, 2]  # first 2 qualifying lines


def test_child_transform_multicolumn_order_breaks_ties(spark):
    """Duplicate (parent, line) pairs — the synthetic lineitem shape that
    made a single-column cap order an arbitrary pick among tied children
    (found by the sf0.1 oracle sweep). A list-valued order_by must make
    the capped subset the (line, qty)-minimal children, at any
    parallelism."""
    from solr_spark.operators.joins import child_transform

    parents = spark.createDataFrame([(1,)], ["pk"])
    # three children all on line 1 (dup keys), one on line 2
    children = spark.createDataFrame(
        [(1, 1, 30), (1, 1, 10), (1, 1, 20), (1, 2, 5)],
        ["pk", "line", "qty"],
    )
    out = child_transform(
        parents, children.repartition(4), "pk",
        limit=2, order_by=["line", "qty"],
    ).toPandas()
    got = sorted(zip(out["line"], out["qty"]))
    # cap=2 in (line, qty) order -> the two smallest-qty line-1 children
    assert got == [(1, 10), (1, 20)]


def test_diff_and_moving_median(spark):
    from solr_spark.functions.mathstream import diff_series, moving_median

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([3.0, 1.0, 4.0, 1.0, 5.0])],
        ["t", "x"],
    )
    d = diff_series(df, "x", "t").orderBy("t").toPandas()
    assert d["diff"].tolist()[1:] == [-2.0, 3.0, -3.0, 4.0]
    assert d["diff"].isna().tolist()[0]

    m = moving_median(df, "x", "t", window=3).orderBy("t").toPandas()
    # trailing-3 medians: [3], [1,3], [1,3,4], [1,1,4], [1,4,5]
    assert m["moving_median"].tolist() == [3.0, 2.0, 3.0, 1.0, 4.0]
