"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "index_build_sec": ..., "index_docs_per_sec": ...}

The index build over the documents table is timed separately (it is the
"indexing throughput" half of BASELINE.md); each headline query is then
timed end-to-end (plan + execute + collect). Run
``python tools/bench_scaling.py`` for the N-vs-4N-cores scaling protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from solr_spark.analysis.chain import analyze  # noqa: E402
from solr_spark.index.build import build_index  # noqa: E402
from solr_spark.query.bm25 import bm25_topk  # noqa: E402
from solr_spark.session import get_spark  # noqa: E402

BM25_QUERIES = [
    ("bm25_3term", "spark join data"),
    ("bm25_window", "window batch order"),
    ("bm25_hot", "table"),
    ("bm25_4term", "customer query fast line"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark(
        app_name="solr_spark_bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    # Steady-state warmup (same rationale as tools/bench_scaling.py): the
    # first Spark job of a fresh JVM pays codegen + shuffle-service +
    # Python-worker-pool startup (~7-9 s) that a long-lived cluster never
    # sees per-build. One throwaway pass keeps the timed numbers about the
    # engine, not process boot.
    warm = build_index(docs.limit(200), id_col="doc_id", text_col="text",
                       analyzer="simple")
    warm.postings.count()
    warm.doclens.count()

    t0 = time.perf_counter()
    idx = build_index(docs, id_col="doc_id", text_col="text", analyzer="simple")
    # Force full materialization of the index tables (the persisted analyzed
    # intermediate + postings + doclens), like a real index build would.
    idx.postings = idx.postings.persist()
    idx.doclens = idx.doclens.persist()
    idx.postings.count()
    idx.doclens.count()
    n, avgdl = idx.corpus_stats()
    # Global term stats are part of the build (finalize_index's role —
    # ExactStatsCache); materializing here keeps per-query timings about
    # query work.
    idx.term_stats().count()
    build_sec = time.perf_counter() - t0

    timings: dict[str, float] = {}
    for name, q in BM25_QUERIES:
        t0 = time.perf_counter()
        terms = sorted(set(analyze(q, "simple")))
        bm25_topk(idx, terms, k=10, quantize_norms=False).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    # Positions-OFF control series: same logical build + the same BM25
    # queries over a positions-free index, so the round-1 -> round-2 drift
    # decomposes into the positions tax (postings rows carry position
    # arrays even for term-only queries) vs noise. Reported separately —
    # NOT part of the headline total.
    t0 = time.perf_counter()
    idx_off = build_index(docs, id_col="doc_id", text_col="text",
                          analyzer="simple", positions=False)
    idx_off.postings = idx_off.postings.persist()
    idx_off.doclens = idx_off.doclens.persist()
    idx_off.postings.count()
    idx_off.doclens.count()
    idx_off.corpus_stats()
    idx_off.term_stats().count()
    build_off_sec = time.perf_counter() - t0
    timings_off: dict[str, float] = {}
    for name, q in BM25_QUERIES:
        t0 = time.perf_counter()
        terms = sorted(set(analyze(q, "simple")))
        bm25_topk(idx_off, terms, k=10, quantize_norms=False).collect()
        timings_off[name] = round(time.perf_counter() - t0, 3)
    idx_off.postings.unpersist()
    idx_off.doclens.unpersist()

    # Operator headliners over the same sf_dir.
    from solr_spark.entry_queries import CATALOG, _IDX_CACHE

    _IDX_CACHE[(id(spark), sf_dir)] = (idx, n, avgdl)  # reuse the built index
    for name in [
        "facet_terms_source_matching",
        "collapse_by_source",
        "significant_terms_spark",
        "innerjoin_revenue_by_segment",
        "ann_cosine_top10",
        "terms_dictionary_top20",
        "phrase_adjacency",
        "phrase_slop",
        "edismax_pf",
        "facet_nested_stats",
        "facet_subfacet_top_sources",
    ]:
        t0 = time.perf_counter()
        CATALOG[name].fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    # Training-data pipeline headliners over the FULL documents table
    # (the catalog entries slice to doc_id < 60 for oracle hashing; the
    # bench times the whole-corpus scan shapes).
    from solr_spark.functions.curation import gopher_repetition, pack_concat
    from solr_spark.functions.dedup import minhash_signatures
    from solr_spark.functions.textstats import chunk_tokens

    t0 = time.perf_counter()
    gopher_repetition(docs, "text", "doc_id").agg(
        F.sum("top_frac_2"), F.sum("dup_frac_10")
    ).collect()
    timings["gopher_repetition_full"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    chunks = chunk_tokens(docs, "text", "doc_id", size=64, overlap=0) \
        .withColumn("k", F.col("id") * 1000 + F.col("chunk_id"))
    pack_concat(chunks, "n_tokens", "k", seq_len=2048).agg(
        F.max("last_bin"), F.count("*")
    ).collect()
    timings["pack_chunks_full"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    minhash_signatures(docs, "text", "doc_id", k=32).agg(
        F.count("*")
    ).collect()
    timings["minhash_sigs_full"] = round(time.perf_counter() - t0, 3)

    # Physical path: segment build + block-max WAND queries.
    import shutil

    from solr_spark.index.segments import build_index_dir
    from solr_spark.query.wand import open_index

    phys_dir = f"/tmp/solr_spark_bench_phys_{os.getpid()}"
    shutil.rmtree(phys_dir, ignore_errors=True)
    t0 = time.perf_counter()
    build_index_dir(docs, phys_dir, n_partitions=32, analyzer="simple",
                    id_col="doc_id", text_col="text")
    phys_build_sec = time.perf_counter() - t0
    ix = open_index(spark, phys_dir)
    for name, q in BM25_QUERIES:
        t0 = time.perf_counter()
        ix.topk(q, k=10).collect()
        timings[f"wand_{name}"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    ix.phrase_topk("spark join", k=10).collect()
    timings["wand_phrase"] = round(time.perf_counter() - t0, 3)
    # Hot sloppy-phrase micro-bench pair (VERDICT r2 task #3): the same
    # slop-2 phrase on the physical (numpy two-pointer sweep) and logical
    # (JVM HOF) matchers — the physical one should be within ~2x.
    t0 = time.perf_counter()
    ix.phrase_topk("spark data", k=10, slop=2).collect()
    timings["wand_phrase_slop2"] = round(time.perf_counter() - t0, 3)
    shutil.rmtree(phys_dir, ignore_errors=True)
    from solr_spark.query.phrase import phrase_topk as logical_phrase_topk

    t0 = time.perf_counter()
    logical_phrase_topk(idx, "spark data", k=10, slop=2).collect()
    timings["phrase_slop2_logical"] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_docs": n_docs,
                # Since round 2 both index builds store term positions
                # (Lucene DOCS_AND_FREQS_AND_POSITIONS parity) — build
                # throughput is not comparable to the round-1 positions-off
                # numbers; see BASELINE.md round-2 section.
                "positions": True,
                "index_build_sec": round(build_sec, 3),
                "index_docs_per_sec": round(n_docs / build_sec, 1),
                # control series (see BASELINE.md round-3 attribution)
                "queries_positions_off": timings_off,
                "index_build_sec_positions_off": round(build_off_sec, 3),
                "phys_index_build_sec": round(phys_build_sec, 3),
                "phys_docs_per_sec": round(n_docs / phys_build_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
