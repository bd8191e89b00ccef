"""Stream decorators added in round 3: having/sort/reduce/outerHashJoin/random."""

from __future__ import annotations

from pyspark.sql import functions as F

from solr_spark.operators.streams import (
    having_stream,
    outer_hash_join_stream,
    random_stream,
    reduce_stream,
    sort_stream,
)


def _orders(spark):
    return spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 9.0), (1, 12, 9.0), (1, 13, 1.0),
         (2, 20, 3.0)],
        "k long, oid long, price double",
    )


def test_reduce_stream_group_sort_and_truncate(spark):
    out = reduce_stream(
        _orders(spark).select("k", "oid", "price"),
        by=["k"], sort=[-F.col("price"), F.col("oid")], max_group_size=3,
    )
    got = {r.k: [t.oid for t in r.group] for r in out.collect()}
    # price desc, oid asc tiebreak, capped at 3 (order 13 dropped)
    assert got == {1: [11, 12, 10], 2: [20]}


def test_reduce_stream_no_cap_keeps_all(spark):
    out = reduce_stream(
        _orders(spark).select("k", "oid", "price"),
        by=["k"], sort=[F.col("oid")],
    )
    got = {r.k: [t.oid for t in r.group] for r in out.collect()}
    assert got == {1: [10, 11, 12, 13], 2: [20]}


def test_having_and_sort(spark):
    df = _orders(spark)
    rolled = df.groupBy("k").agg(F.sum("price").alias("s"))
    kept = having_stream(rolled, F.col("s") > 4.0)
    assert [r.k for r in sort_stream(kept, [F.col("k").asc()]).collect()] == [1]


def test_outer_hash_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    right = spark.createDataFrame([(1, 100)], "k long, n long")
    out = outer_hash_join_stream(left, right, on=["k"])
    got = {r.k: r.n for r in out.collect()}
    assert got == {1: 100, 2: None, 3: None}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_random_stream_deterministic_and_seed_sensitive(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc")
    a = [r.doc for r in random_stream(df, 10, seed="1", id_col="doc").collect()]
    b = [r.doc for r in random_stream(df, 10, seed="1", id_col="doc").collect()]
    c = [r.doc for r in random_stream(df, 10, seed="2", id_col="doc").collect()]
    assert sorted(a) == sorted(b)
    assert sorted(a) != sorted(c)
    assert len(set(a)) == 10


def test_stratified_sample_quota_and_determinism(spark):
    from solr_spark.operators.streams import stratified_sample_stream

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = stratified_sample_stream(docs, "lang", 2, seed="7", id_col="doc_id")
    pa = a.select("doc_id", "lang").toPandas()
    assert (pa.groupby("lang").size() == 2).all()
    # deterministic: same seed -> same rows; different seed -> (almost
    # surely) different rows
    pb = stratified_sample_stream(docs, "lang", 2, seed="7", id_col="doc_id") \
        .select("doc_id", "lang").toPandas()
    assert sorted(pa.doc_id) == sorted(pb.doc_id)
    pc = stratified_sample_stream(docs, "lang", 2, seed="8", id_col="doc_id") \
        .select("doc_id", "lang").toPandas()
    assert sorted(pa.doc_id) != sorted(pc.doc_id)
    # quota larger than a stratum: returns the whole stratum, no error
    small = docs.limit(3)
    assert stratified_sample_stream(small, "lang", 99, id_col="doc_id").count() == 3
