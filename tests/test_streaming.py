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


def test_sessionize_batch_oracle(spark):
    """Batch sessionization vs an independent pandas recomputation."""
    from solr_spark.streaming.sessions import sessionize

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = sessionize(events, gap_minutes=30).toPandas()

    pe = events.select("user_id", "ts", "value").toPandas() \
        .sort_values(["user_id", "ts"])
    import pandas as pd
    exp_rows = []
    for uid, g in pe.groupby("user_id"):
        gaps = g["ts"].diff() > pd.Timedelta(minutes=30)
        sid = gaps.cumsum()
        for _, s in g.groupby(sid):
            exp_rows.append((uid, s["ts"].iloc[0], s["ts"].iloc[-1],
                             len(s), s["value"].sum()))
    exp = pd.DataFrame(exp_rows, columns=["user_id", "session_start",
                                          "session_end", "n_events",
                                          "total_value"])
    got = out.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    exp = exp.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["n_events"].values == exp["n_events"].values).all()
    assert abs(got["total_value"].values - exp["total_value"].values).max() < 1e-9


def test_sessionize_stream_stitches_across_batches(spark, tmp_path_factory):
    """applyInPandasWithState: sessions spanning micro-batch boundaries
    must merge via the state store; emitted (closed) sessions must equal
    the batch sessionizer's closed set."""
    from solr_spark.streaming.sessions import SESSION_SCHEMA, sessionize, sessionize_stream

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("user_id", "ts", "value")
    # two time-ordered files => sessions at the cut span batches
    cut = events.selectExpr("percentile_approx(ts, 0.5) p").first()["p"]
    d = str(tmp_path_factory.mktemp("sess") / "feed")
    os.makedirs(d, exist_ok=True)
    events.where(F.col("ts") <= cut).coalesce(1).write.mode("append").parquet(d)
    time.sleep(2)  # distinct mtimes: FileStreamSource feeds oldest first
    events.where(F.col("ts") > cut).coalesce(1).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1).parquet(d)
    )
    out = sessionize_stream(stream, gap_minutes=1440)
    q = (
        out.writeStream.format("memory").queryName("sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sessions").toPandas() \
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)

    full = sessionize(events, gap_minutes=1440).toPandas()
    # closed sessions = all but each user's LAST session (still open in state)
    last_start = full.groupby("user_id")["session_start"].transform("max")
    exp = full[full["session_start"] != last_start] \
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)

    assert len(got) == len(exp) and len(got) > 0
    assert (got["user_id"].values == exp["user_id"].values).all()
    assert (got["n_events"].values == exp["n_events"].values).all()
    assert abs(got["total_value"].values - exp["total_value"].values).max() < 1e-9
    # the cross-batch evidence: at least one emitted session spans the cut
    spanning = got[(got["session_start"] <= cut) & (got["session_end"] > cut)]
    assert len(spanning) > 0


def test_sessionize_stream_late_event_clamps_bounds(spark, tmp_path_factory):
    """A late (out-of-order across batches) event inside the gap must JOIN
    the open session without running its bounds backwards."""
    import pandas as pd

    from solr_spark.streaming.sessions import sessionize_stream

    d = str(tmp_path_factory.mktemp("late") / "feed")
    os.makedirs(d, exist_ok=True)
    t0 = pd.Timestamp("2024-01-01 10:00:00")
    batches = [
        [(1, t0, 1.0)],                                          # open @10:00
        [(1, t0 - pd.Timedelta(minutes=20), 2.0)],               # late 09:40
        [(1, t0 + pd.Timedelta(minutes=20), 4.0)],               # 10:20 joins
        [(1, t0 + pd.Timedelta(hours=3), 8.0)],                  # closes it
    ]
    for i, rows in enumerate(batches):
        pdf = spark.createDataFrame(
            [(u, t.to_pydatetime(), v) for u, t, v in rows],
            "user_id long, ts timestamp, value double",
        )
        pdf.coalesce(1).write.mode("append").parquet(d)
        time.sleep(1.2)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1).parquet(d)
    )
    out = sessionize_stream(stream, gap_minutes=30)
    q = (out.writeStream.format("memory").queryName("late_sessions")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from late_sessions").toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    # one session covering 09:40..10:20 with all 3 events, bounds ordered
    assert r["session_start"] == t0 - pd.Timedelta(minutes=20)
    assert r["session_end"] == t0 + pd.Timedelta(minutes=20)
    assert r["n_events"] == 3 and abs(r["total_value"] - 7.0) < 1e-9
    assert r["session_start"] <= r["session_end"]


# --- streaming curation: gopher filter + minhash dedup vs a stored
# signature store, across micro-batch boundaries (SURVEY §10(c); the
# reference analogue is the update/commit stream contract,
# solrj io/stream/UpdateStream.java: sink a tuple stream into a
# collection with batched commits — here the "collection" is the
# dedup signature store and each micro-batch is one commit).


def _curate_step(batch_df, store_sigs):
    """One curation micro-batch: gopher-repetition keep filter, minhash
    signatures, LSH dedup against the store. Returns (decisions rows,
    fresh signature DataFrame to append to the store). Shared verbatim by
    the streaming sink and the batch-loop oracle so the assertion isolates
    the STREAMING plumbing (store persistence, checkpointing, boundaries).
    """
    from solr_spark.functions.curation import (
        gopher_repetition,
        gopher_repetition_keep,
    )
    from solr_spark.functions.dedup import incremental_lsh_dedup, minhash_signatures

    rep = gopher_repetition(batch_df, "text", "doc_id")
    keep = rep.select("id", gopher_repetition_keep(rep).alias("keep"))
    keep_rows = keep.collect()  # one action: the gopher agg runs once
    kept_ids = {r.id for r in keep_rows if r.keep}
    all_ids = {r.id for r in keep_rows}
    kept = batch_df.where(F.col("doc_id").isin(list(kept_ids)))
    sigs = minhash_signatures(kept, "text", "doc_id")
    if store_sigs is not None:
        dup_ids = {
            r.id for r in incremental_lsh_dedup(sigs, store_sigs).collect()
        }
    else:
        dup_ids = set()
    decisions = [
        (i, "dropped_quality") for i in sorted(all_ids - kept_ids)
    ] + [
        (i, "dropped_dup" if i in dup_ids else "kept")
        for i in sorted(kept_ids)
    ]
    fresh = sigs.where(~F.col("id").isin(list(dup_ids))) if dup_ids else sigs
    return decisions, fresh


def test_streaming_curation_dedup_matches_batch(spark, docs, tmp_path_factory):
    """foreachBatch micro-batches running gopher+minhash against a STORED
    signature store must make the same keep/drop decisions as the same
    steps run as a plain batch loop — including duplicates whose original
    arrived in an EARLIER micro-batch (the store crossing the boundary)."""
    from solr_spark.streaming.topics import topic_stream

    base = docs.where(F.col("doc_id") < 300).select("doc_id", "text")
    recrawl = (
        base.where(F.col("doc_id") < 50)
        .withColumn("doc_id", F.col("doc_id") + 100000)
    )
    chunks = [
        base.where(F.col("doc_id") < 100),
        base.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 200)),
        base.where(F.col("doc_id") >= 200).unionByName(recrawl),
    ]
    feed = str(tmp_path_factory.mktemp("curation") / "feed")
    os.makedirs(feed, exist_ok=True)
    for ch in chunks:
        ch.coalesce(1).write.mode("append").parquet(feed)
        time.sleep(1.2)  # distinct mod-times -> deterministic batch order

    store_dir = str(tmp_path_factory.mktemp("curation") / "sig_store")
    ckpt = str(tmp_path_factory.mktemp("curation") / "ckpt")
    streamed: list[tuple[int, str]] = []
    batch_ids: list[list[int]] = []

    def sink(bdf, bid):
        ss = bdf.sparkSession
        store = (
            ss.read.parquet(store_dir) if os.path.isdir(store_dir) else None
        )
        decisions, fresh = _curate_step(bdf, store)
        streamed.extend(decisions)
        batch_ids.append(sorted(r.doc_id for r in bdf.select("doc_id").collect()))
        fresh.coalesce(1).write.mode("append").parquet(store_dir)

    q = daemon_query(
        topic_stream(spark, feed, "doc_id long, text string",
                     max_files_per_trigger=1),
        sink, ckpt,
    )
    q.awaitTermination(300)

    assert len(batch_ids) >= 2, "needs >1 micro-batch to cross a boundary"
    assert sum(len(b) for b in batch_ids) == 350

    # Batch-loop oracle over the SAME batches in the SAME order, with an
    # in-memory store instead of the streamed parquet one.
    alldf = base.unionByName(recrawl)
    expected: list[tuple[int, str]] = []
    store = None
    for ids in batch_ids:
        bdf = alldf.where(F.col("doc_id").isin(ids))
        decisions, fresh = _curate_step(bdf, store)
        expected.extend(decisions)
        fresh = fresh.localCheckpoint(eager=True)
        store = fresh if store is None else store.unionByName(fresh)

    assert sorted(streamed) == sorted(expected)

    # The boundary was genuinely exercised: every recrawl copy whose
    # original landed a signature in an earlier batch is flagged a dup.
    streamed_map = dict(streamed)
    orig_sig_ids = {
        i for i, s in streamed_map.items() if i < 50 and s == "kept"
    }
    copies_flagged = {
        i - 100000
        for i, s in streamed_map.items()
        if i >= 100000 and s == "dropped_dup"
    }
    assert orig_sig_ids, "no originals survived curation - test data too thin"
    assert orig_sig_ids <= copies_flagged
