"""Physical index: per-partition segments, manifests, merge, global stats.

Mirrors the Lucene/Solr indexing lifecycle (SURVEY.md §3.2) Spark-first:

- ``build_segments``: corpus → repartition by hash(docid) → one SEGMENT per
  partition, built inside ``applyInPandas`` (the Arrow-vectorized analogue of
  IndexWriter's flush: analyze, invert, compress posting lists, write files).
  Each segment = postings.parquet + docs.parquet + manifest.json, committed
  by an atomic directory rename; the manifest carries row counts, a docid
  checksum (lineage), sizes and timing (metrics). RESUME = re-running the
  build skips every partition whose manifest already exists — the
  per-partition checkpoint protocol that replaces Solr's tlog replay
  (solr/core/src/java/org/apache/solr/update/UpdateLog.java:912-947).
- ``finalize_index``: global exact term stats (term, df, ttf) via one
  column-pruned groupBy over segment stats columns (= ExactStatsCache,
  search/stats/ExactStatsCache.java:150-206, without the two-phase HTTP
  dance; Spark's partial+final combine makes hot terms a non-issue because
  each task emits at most one partial row per term), plus corpus_stats.json
  (N, sumdl, avgdl).
- ``merge_index``: k-way merge of generations within each partition
  (= TieredMergePolicy's role, index/TieredMergePolicyFactory.java:27):
  re-rank the union of docids, remap ordinals, concatenate+sort postings,
  re-encode. Runs as one Spark job, one task per partition.

Layout:
    index_dir/
      corpus_stats.json
      term_stats.parquet/            (term, df, ttf)
      seg/p=<P>/gen=<G>/             postings.parquet docs.parquet manifest.json

Scale notes: P is chosen so one partition's docs fit an executor (at 10^12
docs → P in the tens of thousands; parquet + manifests shard naturally).
Query-time reads prune on the ``term`` column via parquet row-group stats —
postings are written sorted by term.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solr_spark.analysis.chain import ANALYZERS, ANALYZERS_POS
from solr_spark.index.codec import encode_postings
from solr_spark.index.norms import DECODE_TABLE, norm_byte_array

MANIFEST_SCHEMA = (
    "p int, gen int, n_docs long, n_terms long, n_postings long, "
    "sum_dl long, docid_checksum long, skipped boolean, wall_s double, bytes long"
)

_POSTINGS_COLS = [
    "p", "gen", "term", "df", "ttf", "gaps", "tfs", "norms",
    "block_first_ord", "block_last_ord", "block_gap_off", "block_tf_off",
    "block_max_tf", "block_min_norm", "poss", "block_pos_off",
    "pays", "block_pay_off", "block_max_pay",
]

_WS_RE = re.compile(r"\s+")


def _payload_tokens(
    s: str, delim: str, default: float
) -> list[tuple[str, int, float]]:
    """The ``delimited_payload`` analysis chain: whitespace tokens carrying
    ``term|payload`` (Lucene WhitespaceTokenizer + DelimitedPayloadTokenFilter,
    the reference's ``*_dpf`` field type in
    solr/server/solr/configsets/_default/conf/managed-schema.xml), terms
    lowercased for parity with query/payload.py's logical ingestion.
    Positions are raw whitespace-token indexes — identical to posexplode
    over split(text, r"\\s+") on the logical path."""
    out = []
    for i, tok in enumerate(_WS_RE.split(s)):
        if not tok:
            continue
        parts = tok.split(delim)
        term = parts[0].lower()
        if not term:
            continue
        pay = default
        if len(parts) > 1:
            try:
                pay = float(parts[1])
            except ValueError:
                pay = default
        out.append((term, i, pay))
    return out


def _seg_dir(index_dir: str, p: int, gen: int) -> str:
    return os.path.join(index_dir, "seg", f"p={p:05d}", f"gen={gen}")


def _invert_partition(
    docids: np.ndarray, texts: pd.Series, analyzer: str,
    store_positions: bool = True,
    store_payloads: bool = False,
    payload_delimiter: str = "|",
    default_payload: float = 1.0,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Analyze + invert one partition. Returns (docs_table, postings_table).

    docs_table: (ord, docid, dl, norm) sorted by docid (ord = rank).
    postings_table: one row per term, columns per _POSTINGS_COLS minus p/gen.

    ``store_payloads=True`` switches the analysis to the
    ``delimited_payload`` chain (whitespace ``term|payload`` tokens; the
    ``analyzer`` argument is ignored) and writes the position-aligned
    payload stream — the Lucene .pay-file role.
    """
    from collections import Counter

    if store_payloads and not store_positions:
        raise ValueError("store_payloads requires store_positions")

    order = np.argsort(docids, kind="stable")
    docids = docids[order]
    texts = texts.iloc[order].reset_index(drop=True)

    # Invert doc-at-a-time into per-term (ord, tf[, positions]) builders.
    # Docs arrive in ord order, so each term's ord list is born sorted — no
    # global object-dtype flatten/sort (a pandas groupby over the flattened
    # token stream was the memory-bandwidth hot spot at high concurrency).
    # Positions likewise arrive sorted within each doc (token order).
    term_ords: dict[str, list[int]] = {}
    term_tfs: dict[str, list[int]] = {}
    term_pos: dict[str, list[int]] = {}
    term_pay: dict[str, list[float]] = {}
    dl = np.zeros(len(docids), dtype=np.int64)
    if store_payloads:
        for ord_, s in enumerate(texts):
            doc_pos: dict[str, list[int]] = {}
            doc_pay: dict[str, list[float]] = {}
            ntok = 0
            if s is not None:
                for t, i, pay in _payload_tokens(
                    s, payload_delimiter, default_payload
                ):
                    doc_pos.setdefault(t, []).append(i)
                    doc_pay.setdefault(t, []).append(pay)
                    ntok += 1
            dl[ord_] = ntok
            for t, ps in doc_pos.items():
                if t in term_ords:
                    term_ords[t].append(ord_)
                    term_tfs[t].append(len(ps))
                    term_pos[t].extend(ps)
                    term_pay[t].extend(doc_pay[t])
                else:
                    term_ords[t] = [ord_]
                    term_tfs[t] = [len(ps)]
                    term_pos[t] = list(ps)
                    term_pay[t] = list(doc_pay[t])
    elif store_positions:
        fn_pos = ANALYZERS_POS[analyzer]
        for ord_, s in enumerate(texts):
            doc_pos: dict[str, list[int]] = {}
            ntok = 0
            if s is not None:
                for t, i in fn_pos(s):
                    doc_pos.setdefault(t, []).append(i)
                    ntok += 1
            dl[ord_] = ntok
            for t, ps in doc_pos.items():
                if t in term_ords:
                    term_ords[t].append(ord_)
                    term_tfs[t].append(len(ps))
                    term_pos[t].extend(ps)
                else:
                    term_ords[t] = [ord_]
                    term_tfs[t] = [len(ps)]
                    term_pos[t] = list(ps)
    else:
        fn = ANALYZERS[analyzer]
        for ord_, s in enumerate(texts):
            counts = Counter(fn(s)) if s is not None else {}
            dl[ord_] = sum(counts.values())
            for t, c in counts.items():
                if t in term_ords:
                    term_ords[t].append(ord_)
                    term_tfs[t].append(c)
                else:
                    term_ords[t] = [ord_]
                    term_tfs[t] = [c]
    norms = norm_byte_array(dl)

    rows = []
    for term in sorted(term_ords):
        o = np.asarray(term_ords[term], dtype=np.int64)
        t = np.asarray(term_tfs[term], dtype=np.int64)
        pn = norms[o]
        pos = (
            np.asarray(term_pos[term], dtype=np.int64)
            if store_positions else None
        )
        pay = (
            np.asarray(term_pay[term], dtype=np.float32)
            if store_payloads else None
        )
        enc = encode_postings(o, t, pn, positions=pos, payloads=pay)
        # The norm byte rides WITH the postings (1 byte per posting, like
        # Lucene's impact pairs): scoring then never touches the doc table —
        # the doc table is consulted only to map the winning top-k ords back
        # to docids via a filtered read.
        n_blk = len(enc.block_first_ord)
        rows.append(
            (
                term, enc.df, enc.ttf, enc.gaps, enc.tfs, pn.tobytes(),
                enc.block_first_ord.tolist(), enc.block_last_ord.tolist(),
                enc.block_gap_off.tolist(), enc.block_tf_off.tolist(),
                enc.block_max_tf.tolist(),
                enc.block_min_norm.astype(np.int32).tolist(),
                enc.poss,
                enc.block_pos_off.tolist() if enc.block_pos_off is not None
                else [0] * n_blk,
                enc.pays,
                enc.block_pay_off.tolist() if enc.block_pay_off is not None
                else [0] * n_blk,
                [float(x) for x in enc.block_max_pay]
                if enc.block_max_pay is not None else [0.0] * n_blk,
            )
        )
    postings = pd.DataFrame(
        rows, columns=_POSTINGS_COLS[2:]
    )
    docs = pd.DataFrame(
        {
            "ord": np.arange(len(docids), dtype=np.int64),
            "docid": docids,
            "dl": dl,
            "norm": norms.astype(np.int32),
        }
    )
    return docs, postings


def _write_segment(
    index_dir: str, p: int, gen: int, docs: pd.DataFrame, postings: pd.DataFrame,
    docid_checksum: int, wall_s: float, store_positions: bool = True,
    store_payloads: bool = False,
) -> dict:
    """Atomically commit one segment directory (tmp write + rename)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # Executor-side: one pyarrow thread per task (Spark supplies the
    # parallelism; a per-process all-cores arrow pool oversubscribes).
    pa.set_cpu_count(1)
    final = _seg_dir(index_dir, p, gen)
    tmp = final + ".tmp-" + uuid.uuid4().hex[:8]
    os.makedirs(tmp, exist_ok=True)
    postings = postings.copy()
    postings.insert(0, "gen", np.int32(gen))
    postings.insert(0, "p", np.int32(p))
    docs = docs.copy()
    docs.insert(0, "gen", np.int32(gen))
    docs.insert(0, "p", np.int32(p))
    pq.write_table(pa.Table.from_pandas(postings, preserve_index=False),
                   os.path.join(tmp, "postings.parquet"))
    # Small row groups on the doc table: queries read it only to map top-k
    # ords -> docids with a row-group-pruned filtered read, so row-group
    # granularity IS the read granularity.
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   os.path.join(tmp, "docs.parquet"), row_group_size=16384)
    manifest = {
        "p": p,
        "gen": gen,
        "n_docs": int(len(docs)),
        "n_terms": int(len(postings)),
        "n_postings": int(postings["df"].sum()) if len(postings) else 0,
        "sum_dl": int(docs["dl"].sum()) if len(docs) else 0,
        "docid_checksum": int(docid_checksum),
        "positions": bool(store_positions),
        "payloads": bool(store_payloads),
        "bytes": int(
            postings["gaps"].map(len).sum() + postings["tfs"].map(len).sum()
        ) if len(postings) else 0,
        "wall_s": round(wall_s, 3),
        "committed_at": time.time(),
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    try:
        os.rename(tmp, final)
    except OSError:
        # A concurrent attempt won the rename. Legitimate only when both
        # attempts indexed the SAME rows (speculative re-execution of one
        # task); if the winner saw a different row set, the precondition
        # (each p fully co-located in one task) was violated and adopting
        # the winner would silently drop our rows.
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        with open(os.path.join(final, "manifest.json")) as f:
            winner = json.load(f)
        if (
            winner["n_docs"] != manifest["n_docs"]
            or winner["docid_checksum"] != manifest["docid_checksum"]
        ):
            raise RuntimeError(
                f"segment p={p} gen={gen}: concurrent build committed a "
                f"DIFFERENT row set (n_docs {winner['n_docs']} vs "
                f"{manifest['n_docs']}, checksum mismatch) — rows for this "
                "partition are not co-located; rebuild without "
                "assume_partitioned or fix the input layout"
            )
        manifest = winner
    return manifest


def _manifest_row(m: dict, skipped: bool) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "p": m["p"], "gen": m["gen"], "n_docs": m["n_docs"],
                "n_terms": m["n_terms"], "n_postings": m["n_postings"],
                "sum_dl": m["sum_dl"], "docid_checksum": m["docid_checksum"],
                "skipped": skipped, "wall_s": m["wall_s"], "bytes": m["bytes"],
            }
        ]
    )


def partition_col(id_col: str = "docid", n_partitions: int = 32):
    """The segment-partition assignment (= Iceberg bucket(docid) layout)."""
    return F.pmod(F.xxhash64(id_col), F.lit(n_partitions)).cast("int")


def _build_one(index_dir: str, generation: int, analyzer: str,
               p: int, pdf: pd.DataFrame,
               store_positions: bool = True,
               store_payloads: bool = False) -> pd.DataFrame:
    final = _seg_dir(index_dir, p, generation)
    mpath = os.path.join(final, "manifest.json")
    docids = pdf["docid"].to_numpy(dtype=np.int64)
    checksum = int(np.bitwise_xor.reduce(docids.astype(np.uint64)) or 0)
    if os.path.exists(mpath):
        with open(mpath) as f:
            m = json.load(f)
        # Resume is only valid if the committed segment covers EXACTLY the
        # rows this task holds — a cheap lineage check (no re-analysis) that
        # also catches an assume_partitioned layout violation, where two
        # tasks each hold part of p and the second would otherwise silently
        # drop its rows.
        if m["n_docs"] != len(docids) or m["docid_checksum"] != checksum:
            raise RuntimeError(
                f"segment p={p} gen={generation}: committed manifest covers "
                f"{m['n_docs']} docs (checksum {m['docid_checksum']}) but "
                f"this task holds {len(docids)} (checksum {checksum}) — "
                "input changed since the checkpoint, or rows for this "
                "partition are not co-located (assume_partitioned violated)"
            )
        return _manifest_row(m, skipped=True)
    t0 = time.time()
    docs, postings = _invert_partition(
        docids, pdf["text"], analyzer, store_positions,
        store_payloads=store_payloads,
    )
    m = _write_segment(
        index_dir, p, generation, docs, postings, checksum, time.time() - t0,
        store_positions, store_payloads,
    )
    return _manifest_row(m, skipped=False)


def build_segments(
    corpus: DataFrame,
    index_dir: str,
    n_partitions: int = 32,
    analyzer: str = "simple",
    generation: int = 0,
    id_col: str = "docid",
    text_col: str = "content",
    assume_partitioned: bool = False,
    store_positions: bool = True,
    store_payloads: bool = False,
) -> pd.DataFrame:
    """Build one generation of segments from ``corpus`` (docid must be int64).

    ``store_positions=True`` (Lucene's text-field default,
    DOCS_AND_FREQS_AND_POSITIONS) writes the per-posting positions blob that
    phrase queries need; term-only workloads can disable it to cut segment
    bytes and build cost (Lucene's IndexOptions.DOCS_AND_FREQS equivalent).
    ``store_payloads=True`` additionally writes the position-aligned payload
    stream via the ``delimited_payload`` chain (whitespace ``term|payload``
    tokens — the ``analyzer`` argument is ignored), Lucene's .pay-file role.

    Returns the manifest table (one row per partition; ``skipped=True`` rows
    were already committed by a previous run — the resume path).

    ``assume_partitioned=True`` is the bucketed-input fast path: when the
    corpus is already laid out by ``partition_col`` (an Iceberg table
    bucketed by docid hash, or a caller-side ``repartition(n, "p")``), the
    build runs as mapInPandas with ZERO shuffle — each task groups its
    co-located rows by p locally. The default path shuffles once on p.
    """
    if assume_partitioned:
        df = corpus.select(
            F.col(id_col).cast("long").alias("docid"),
            F.col(text_col).alias("text"),
            F.col("p").cast("int").alias("p"),
        )

        def writer_local(batches):
            parts = list(batches)
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True)
            for p, grp in pdf.groupby("p", sort=True):
                yield _build_one(
                    index_dir, generation, analyzer, int(p), grp,
                    store_positions, store_payloads,
                )

        return df.mapInPandas(writer_local, MANIFEST_SCHEMA).toPandas()

    df = corpus.select(
        F.col(id_col).cast("long").alias("docid"), F.col(text_col).alias("text")
    ).withColumn("p", partition_col("docid", n_partitions))

    def writer(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return _build_one(
            index_dir, generation, analyzer, int(key[0]), pdf,
            store_positions, store_payloads,
        )

    manifests = (
        df.groupBy("p").applyInPandas(writer, MANIFEST_SCHEMA).toPandas()
    )
    return manifests


def finalize_index(
    spark: SparkSession,
    index_dir: str,
    analyzer: str = "simple",
    k1: float = 1.2,
    b: float = 0.75,
) -> dict:
    """Compute global exact stats from committed segments and publish them."""
    postings = spark.read.parquet(f"{index_dir}/seg/*/*/postings.parquet")
    (
        postings.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
        .write.mode("overwrite")
        .parquet(f"{index_dir}/term_stats.parquet")
    )
    import glob

    n_docs = sum_dl = 0
    gens: set[int] = set()
    positions_all = True
    payloads_all = True
    for mp in glob.glob(f"{index_dir}/seg/*/*/manifest.json"):
        with open(mp) as f:
            m = json.load(f)
        n_docs += m["n_docs"]
        sum_dl += m["sum_dl"]
        positions_all = positions_all and m.get("positions", True)
        payloads_all = payloads_all and m.get("payloads", False)
        gens.add(m["gen"])
    stats = {
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "positions": positions_all,
        "payloads": payloads_all,
        "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        "analyzer": analyzer,
        "k1": k1,
        "b": b,
        "generations": sorted(gens),
    }
    with open(f"{index_dir}/corpus_stats.json", "w") as f:
        json.dump(stats, f)
    return stats


def read_corpus_stats(index_dir: str) -> dict:
    with open(f"{index_dir}/corpus_stats.json") as f:
        return json.load(f)


def build_index_dir(
    corpus: DataFrame,
    index_dir: str,
    n_partitions: int = 32,
    analyzer: str = "simple",
    id_col: str = "docid",
    text_col: str = "content",
    k1: float = 1.2,
    b: float = 0.75,
    store_positions: bool = True,
    store_payloads: bool = False,
) -> dict:
    """build_segments + finalize_index in one call. Idempotent/resumable."""
    build_segments(
        corpus, index_dir, n_partitions, analyzer,
        generation=0, id_col=id_col, text_col=text_col,
        store_positions=store_positions, store_payloads=store_payloads,
    )
    return finalize_index(corpus.sparkSession, index_dir, analyzer, k1, b)


# ---------------------------------------------------------------------------
# Segment merge (multi-generation → single generation)
# ---------------------------------------------------------------------------


def merge_index(
    spark: SparkSession, index_dir: str, out_dir: str, analyzer: str | None = None
) -> dict:
    """Merge all generations of every partition into gen=0 under ``out_dir``.

    One Spark task per partition: re-rank the docid union, remap each
    generation's ordinals (order-preserving, so remapped lists stay sorted),
    concatenate + merge per term, re-encode. Equivalent to a full Lucene
    forceMerge(1) per shard.
    """
    import glob as _glob

    from solr_spark.index.codec import (
        decode_payloads,
        decode_positions,
        decode_postings,
    )

    stats = read_corpus_stats(index_dir)
    analyzer = analyzer or stats["analyzer"]
    pdirs = sorted(_glob.glob(f"{index_dir}/seg/p=*"))
    ps = [int(os.path.basename(d).split("=")[1]) for d in pdirs]

    def merge_one(pdf_iter: Iterable[pd.DataFrame]):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pa.set_cpu_count(1)
        for pdf in pdf_iter:
            for p in pdf["p"]:
                p = int(p)
                final = _seg_dir(out_dir, p, 0)
                if os.path.exists(os.path.join(final, "manifest.json")):
                    with open(os.path.join(final, "manifest.json")) as f:
                        yield _manifest_row(json.load(f), skipped=True)
                    continue
                t0 = time.time()
                merged_has_positions = True
                merged_has_payloads = True
                gen_dirs = sorted(_glob.glob(f"{index_dir}/seg/p={p:05d}/gen=*"))
                docs_parts, post_parts = [], []
                for gd in gen_dirs:
                    docs_parts.append(pq.read_table(f"{gd}/docs.parquet").to_pandas())
                    tbl = pq.read_table(f"{gd}/postings.parquet")
                    cols = ["gen", "term", "gaps", "tfs", "poss"]
                    if "pays" in tbl.schema.names:
                        cols.append("pays")
                    part = tbl.select(cols).to_pandas()
                    if "pays" not in part.columns:  # pre-payload segment
                        part["pays"] = b""
                    post_parts.append(part)
                all_docs = pd.concat(docs_parts, ignore_index=True)
                order = np.argsort(all_docs["docid"].to_numpy(), kind="stable")
                all_docs = all_docs.iloc[order].reset_index(drop=True)
                # old (gen, ord) -> new ord
                remap: dict[int, np.ndarray] = {}
                new_ord = np.arange(len(all_docs), dtype=np.int64)
                for g in all_docs["gen"].unique():
                    mask = (all_docs["gen"] == g).to_numpy()
                    old = all_docs["ord"].to_numpy()[mask]
                    m = np.empty(old.max() + 1 if old.size else 0, dtype=np.int64)
                    m[old] = new_ord[mask]
                    remap[int(g)] = m
                norms = all_docs["norm"].to_numpy(dtype=np.uint8)
                dl = all_docs["dl"].to_numpy(dtype=np.int64)

                all_posts = pd.concat(post_parts, ignore_index=True)
                rows = []
                for term, grp in all_posts.groupby("term", sort=True):
                    os_, ts_, flats, seg_starts, pay_flats = [], [], [], [], []
                    pos_off = 0
                    for _, r in grp.iterrows():
                        o, t = decode_postings(r["gaps"], r["tfs"])
                        flat, starts = decode_positions(r["poss"], t)
                        if flat.size == 0 and t.size > 0:
                            flat = None  # this gen stored no positions
                        pay_flat = decode_payloads(r["pays"] or b"", t)[0]
                        if pay_flat.size == 0:
                            pay_flat = None  # this gen stored no payloads
                        os_.append(remap[int(r["gen"])][o])
                        ts_.append(t)
                        flats.append(flat)
                        pay_flats.append(pay_flat)
                        if flat is not None:
                            seg_starts.append(starts + pos_off)
                            pos_off += flat.size
                    if any(f is not None for f in flats) and any(
                        f is None for f in flats
                    ):
                        raise RuntimeError(
                            f"merge p={p} term={term!r}: generations mix "
                            "store_positions=True and False — a merged "
                            "position list would silently misalign; rebuild "
                            "the positionless generation with positions (or "
                            "all without)"
                        )
                    if not any(f is not None for f in flats):
                        merged_has_positions = False
                    if any(f is not None for f in pay_flats) and any(
                        f is None for f in pay_flats
                    ):
                        raise RuntimeError(
                            f"merge p={p} term={term!r}: generations mix "
                            "store_payloads=True and False — a merged "
                            "payload stream would silently misalign; rebuild "
                            "the payload-less generation with payloads (or "
                            "all without)"
                        )
                    if not any(f is not None for f in pay_flats):
                        merged_has_payloads = False
                    pay_flats = [f for f in pay_flats if f is not None]
                    flats = [f for f in flats if f is not None]
                    o = np.concatenate(os_)
                    t = np.concatenate(ts_)
                    so = np.argsort(o, kind="stable")
                    o, t = o[so], t[so]
                    pn = norms[o]
                    # Positions travel with their posting through the merge
                    # reorder: gather each posting's position segment in the
                    # new order, then re-encode.
                    flat_all = np.concatenate(flats) if flats else np.empty(0, np.int64)
                    new_flat = None
                    new_pay = None
                    if flat_all.size:
                        starts_all = np.concatenate(seg_starts)
                        ends_all = starts_all + np.concatenate(ts_)
                        new_flat = np.concatenate(
                            [flat_all[starts_all[j]:ends_all[j]] for j in so]
                        )
                        if pay_flats:
                            # Payloads are position-aligned, so the same
                            # gather order re-sorts them.
                            pay_all = np.concatenate(pay_flats)
                            new_pay = np.concatenate(
                                [pay_all[starts_all[j]:ends_all[j]] for j in so]
                            )
                    enc = encode_postings(
                        o, t, pn, positions=new_flat, payloads=new_pay
                    )
                    n_blk = len(enc.block_first_ord)
                    rows.append(
                        (
                            term, enc.df, enc.ttf, enc.gaps, enc.tfs, pn.tobytes(),
                            enc.block_first_ord.tolist(), enc.block_last_ord.tolist(),
                            enc.block_gap_off.tolist(), enc.block_tf_off.tolist(),
                            enc.block_max_tf.tolist(),
                            enc.block_min_norm.astype(np.int32).tolist(),
                            enc.poss,
                            enc.block_pos_off.tolist()
                            if enc.block_pos_off is not None
                            else [0] * n_blk,
                            enc.pays,
                            enc.block_pay_off.tolist()
                            if enc.block_pay_off is not None
                            else [0] * n_blk,
                            [float(x) for x in enc.block_max_pay]
                            if enc.block_max_pay is not None else [0.0] * n_blk,
                        )
                    )
                postings = pd.DataFrame(rows, columns=_POSTINGS_COLS[2:])
                docs = pd.DataFrame(
                    {
                        "ord": new_ord,
                        "docid": all_docs["docid"].to_numpy(dtype=np.int64),
                        "dl": dl,
                        "norm": norms.astype(np.int32),
                    }
                )
                checksum = int(
                    np.bitwise_xor.reduce(
                        docs["docid"].to_numpy(dtype=np.int64).astype(np.uint64)
                    ) or 0
                )
                m = _write_segment(
                    out_dir, p, 0, docs, postings, checksum, time.time() - t0,
                    store_positions=merged_has_positions,
                    store_payloads=merged_has_payloads,
                )
                yield _manifest_row(m, skipped=False)

    pdf = spark.createDataFrame([(p,) for p in ps], "p int").repartition(
        min(len(ps), spark.sparkContext.defaultParallelism), "p"
    )
    pdf.mapInPandas(merge_one, MANIFEST_SCHEMA).collect()
    return finalize_index(spark, out_dir, analyzer, stats["k1"], stats["b"])
