"""Logical inverted-index build: corpus -> postings / doclens / docs tables.

This is the DataFrame-level index (SURVEY.md §1.1): the term-major view of
the corpus materialized as plain DataFrames. The physical segmented form
(compressed posting lists + manifests) is built on top by
``solr_spark.index.segments``.

Spark shape (SURVEY.md §3.2): tokenize+doc-local tf combine inside ONE Arrow
UDF pass (so the explode/shuffle carries a row per *distinct* term per doc,
not per token occurrence), then a single shuffle keyed by term produces the
postings. Global stats (df per term, N, avgdl) are exact by construction —
equivalent to single-shard Solr / ExactStatsCache (reference:
solr/core/src/java/org/apache/solr/search/stats/ExactStatsCache.java:150-206,
which Solr needs a two-phase HTTP exchange for; here it's one groupBy).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solr_spark.analysis.chain import analyze_terms_positions_udf, analyze_terms_udf
from solr_spark.index.norms import quantize_doclen


@dataclass
class IndexTables:
    """The logical index: everything BM25 needs.

    postings: (term, docid, tf)        — term-major inverted view
    doclens:  (docid, dl, dl_quant)    — exact + SmallFloat-quantized length
    docs:     (docid, <stored cols>, content_sha256) — forward/stored view
    """

    postings: DataFrame
    doclens: DataFrame
    docs: DataFrame
    analyzer: str
    has_positions: bool = False
    _stats: tuple[int, float] | None = None
    _term_stats: DataFrame | None = None

    def corpus_stats(self) -> tuple[int, float]:
        """(N, avgdl). avgdl = sumTotalTermFreq / docCount (exact dl sum —
        Lucene accumulates exact lengths into sumTotalTermFreq even though
        per-doc norms are quantized). Memoized after the first computation."""
        if self._stats is None:
            row = self.doclens.agg(
                F.count("*").alias("n"), F.sum("dl").alias("ttf")
            ).collect()[0]
            n = row["n"] or 0
            self._stats = (n, (float(row["ttf"]) / n if n else 0.0))
        return self._stats

    def term_stats(self) -> DataFrame:
        """(term, df, ttf) exact global term statistics (persisted on first
        use — every query joins against this small table)."""
        if self._term_stats is None:
            self._term_stats = (
                self.postings.groupBy("term")
                .agg(F.count("*").alias("df"), F.sum("tf").alias("ttf"))
                .persist()
            )
        return self._term_stats


def build_index(
    corpus: DataFrame,
    id_col: str = "docid",
    text_col: str = "content",
    analyzer: str = "text_en",
    stored_cols: tuple[str, ...] | None = None,
    cache: bool = True,
    positions: bool = True,
) -> IndexTables:
    """Tokenize ``corpus`` and derive the logical index tables.

    ``corpus`` must already carry a deterministic ``id_col`` (see
    ``solr_spark.index.docid.with_docid``). ``cache=True`` persists the
    analyzed intermediate: postings AND doclens derive from it, so without
    caching the (expensive) analysis UDF would run once per consumer.

    ``positions=True`` (default — Lucene indexes text fields with
    DOCS_AND_FREQS_AND_POSITIONS) adds a ``positions array<int>`` column to
    the postings, enabling true phrase/slop queries. Term-only workloads can
    opt out to shrink the shuffle: positions roughly double postings bytes
    (Lucene's .prx/.pos files are the same trade).

    The ``simple`` chain compiles to PURE JVM expressions (split + filter +
    posexplode + hash aggregate — zero Python workers); the Lucene-parity
    chains (UAX#29 + Porter) run as Arrow-batched UDFs.
    """
    if analyzer == "simple":
        # JVM path: whole-stage codegen end-to-end. The shuffle still
        # carries one row per DISTINCT (docid, term) — Spark's partial
        # aggregation does the doc-local combine map-side (the explode and
        # the partial agg share a stage).
        from solr_spark.functions.dedup import tokens_col

        toks = corpus.select(
            F.col(id_col).alias("docid"),
            tokens_col(F.col(text_col)).alias("toks"),
        )
        if cache:
            toks = toks.persist()
        exploded = toks.select(
            "docid", F.posexplode("toks").alias("pos", "term")
        )
        pos_aggs = (
            [F.array_sort(F.collect_list("pos")).alias("positions")]
            if positions else []
        )
        postings = exploded.groupBy("term", "docid").agg(
            F.count("*").cast("int").alias("tf"), *pos_aggs
        )
        doclens = toks.select(
            "docid",
            F.greatest(F.size("toks"), F.lit(0)).cast("long").alias("dl"),
        ).withColumn("dl_quant", quantize_doclen("dl"))
        analyzed = toks  # for symmetry below; stored cols come from corpus
    else:
        terms_udf = (
            analyze_terms_positions_udf(analyzer) if positions
            else analyze_terms_udf(analyzer)
        )
        analyzed = corpus.select(
            F.col(id_col).alias("docid"),
            terms_udf(F.col(text_col)).alias("term_freqs"),
        )
        if cache:
            analyzed = analyzed.persist()

        # One row per distinct (term, docid): the doc-local combine already
        # happened inside the Arrow UDF.
        pos_cols = (
            [F.col("tf_entry.positions").alias("positions")] if positions else []
        )
        postings = analyzed.select(
            "docid", F.explode("term_freqs").alias("tf_entry")
        ).select(
            F.col("tf_entry.term").alias("term"),
            "docid",
            F.col("tf_entry.tf").alias("tf"),
            *pos_cols,
        )

        # discountOverlaps=true and no overlap-emitting filters => dl = Σ tf.
        doclens = analyzed.select(
            "docid",
            F.aggregate(
                "term_freqs", F.lit(0), lambda acc, x: acc + x["tf"]
            ).alias("dl"),
        ).withColumn("dl_quant", quantize_doclen("dl"))

    stored = list(stored_cols) if stored_cols is not None else [
        c for c in corpus.columns if c not in (id_col, text_col)
    ]
    docs = corpus.select(
        F.col(id_col).alias("docid"),
        *stored,
        F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias("content_sha256"),
    )

    return IndexTables(
        postings=postings, doclens=doclens, docs=docs, analyzer=analyzer,
        has_positions=positions,
    )


def delete_by_query(index: IndexTables, predicate) -> IndexTables:
    """deleteByQuery (update/DirectUpdateHandler2.java deleteByQuery;
    update/processor chain): drop every doc matching ``predicate`` (a
    Column over the stored-fields view) from the logical index.

    Returns a NEW IndexTables whose three views exclude the deleted docs —
    one semi-join against the surviving docid set, no rewrite of surviving
    rows. Corpus/term statistics are recomputed lazily from the filtered
    views, i.e. the index behaves like the reference AFTER a merge
    expunges its tombstones (Lucene keeps deleted docs in df/docCount
    until segments merge; this models the steady state, which is also
    what a columnar rebuild would produce).
    """
    # NULL predicate values mean "did not match the delete query" (Solr
    # keeps such docs) — coalesce so ~NULL doesn't silently drop them.
    survives = ~F.coalesce(predicate, F.lit(False))
    keep = index.docs.where(survives).select("docid")
    return IndexTables(
        postings=index.postings.join(keep, "docid", "left_semi"),
        doclens=index.doclens.join(keep, "docid", "left_semi"),
        docs=index.docs.where(survives),
        analyzer=index.analyzer,
        has_positions=index.has_positions,
    )
