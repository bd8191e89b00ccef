"""Structured Streaming: topic/daemon/update-stream + incremental indexing.

The flagship assertion: an index built INCREMENTALLY from streamed
micro-batches (one generation per batch, then merged) answers queries
rank-identically to the same corpus indexed in one batch — the streaming
analogue of the distributed-vs-control oracle.
"""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from solr_spark.index.segments import build_index_dir, finalize_index, merge_index
from solr_spark.query.wand import PhysicalIndex
from solr_spark.streaming.topics import (
    daemon_query,
    incremental_index_sink,
    topic_stream,
    windowed_event_counts,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _feed_dir(tmp_path_factory, docs, n_chunks=3):
    """Write the corpus as n_chunks parquet files into a 'topic' dir."""
    d = str(tmp_path_factory.mktemp("stream") / "feed")
    os.makedirs(d, exist_ok=True)
    for i in range(n_chunks):
        chunk = docs.where(F.col("doc_id") % n_chunks == i)
        chunk.coalesce(1).write.mode("append").parquet(d)
    return d


def test_incremental_index_matches_batch(spark, docs, tmp_path_factory):
    feed = _feed_dir(tmp_path_factory, docs)
    inc_dir = str(tmp_path_factory.mktemp("stream") / "inc_idx")
    ckpt = str(tmp_path_factory.mktemp("stream") / "ckpt")

    stream = topic_stream(spark, feed, DOC_SCHEMA).select(
        F.col("doc_id").alias("docid"), F.col("text").alias("content")
    )
    sink = incremental_index_sink(inc_dir, n_partitions=4)
    q = daemon_query(stream, sink, ckpt)  # availableNow: drain + stop
    q.awaitTermination(120)
    finalize_index(spark, inc_dir, "simple")

    batch_dir = str(tmp_path_factory.mktemp("stream") / "batch_idx")
    build_index_dir(docs, batch_dir, n_partitions=4, analyzer="simple",
                    id_col="doc_id", text_col="text")

    inc = PhysicalIndex(spark, inc_dir)
    bat = PhysicalIndex(spark, batch_dir)
    assert inc.stats["n_docs"] == bat.stats["n_docs"] == 500

    def rows(ix, q_):
        return [(r.docid, round(r.score, 9)) for r in ix.topk(q_, k=10).collect()]

    for q_ in ["spark join data", "table"]:
        assert rows(inc, q_) == rows(bat, q_)

    # Merge the streamed generations -> still identical.
    merged_dir = str(tmp_path_factory.mktemp("stream") / "merged")
    merge_index(spark, inc_dir, merged_dir)
    mg = PhysicalIndex(spark, merged_dir)
    for q_ in ["spark join data", "table"]:
        assert rows(mg, q_) == rows(bat, q_)
    shutil.rmtree(feed, ignore_errors=True)


def test_topic_stream_is_incremental(spark, docs, tmp_path_factory):
    """Appending a file after the first drain delivers ONLY the new rows."""
    d = str(tmp_path_factory.mktemp("stream") / "topic")
    os.makedirs(d, exist_ok=True)
    docs.where(F.col("doc_id") < 100).coalesce(1).write.mode("append").parquet(d)
    ckpt = str(tmp_path_factory.mktemp("stream") / "ck2")
    seen: list[int] = []

    def sink(bdf, bid):
        seen.append(bdf.count())

    q = daemon_query(topic_stream(spark, d, DOC_SCHEMA), sink, ckpt)
    q.awaitTermination(60)
    first_total = sum(seen)
    assert first_total == 100

    docs.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 150)).coalesce(
        1
    ).write.mode("append").parquet(d)
    seen.clear()
    q2 = daemon_query(topic_stream(spark, d, DOC_SCHEMA), sink, ckpt)
    q2.awaitTermination(60)
    assert sum(seen) == 50  # only the delta — the checkpoint held


def test_windowed_event_counts_batch_semantics(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_event_counts(events, window="1 day").collect()
    # Totals must reconcile with a plain groupBy (window partitioning is
    # a refinement of the global count).
    assert sum(r.n for r in out) == events.count()
    assert all(r.window_start is not None for r in out)
