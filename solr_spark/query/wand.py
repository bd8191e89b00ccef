"""Top-k BM25 over the physical segment index, with block-max pruning.

The per-partition scorer is the batch adaptation of block-max WAND
(reference touch-points: Solr enables Lucene's WAND via minExactCount —
handler/component/QueryComponent.java:424-428, TopScoreDocCollector with a
hits threshold — search/SolrIndexSearcher.java:1508-1525; the block-max
machinery itself is Lucene's, rebuilt here from the published algorithm
[Ding & Suel, SIGIR'11] over our own block metadata):

1. Per query term t and block b, an upper bound of any contribution in b is
   computed WITHOUT decoding: ub(t,b) = w_t · S(max_tf_b, dl(min_norm_b)),
   valid because the BM25 term contribution is increasing in tf and
   decreasing in dl.
2. Threshold seeding: the rarest (fewest-postings-in-partition) query term is
   decoded fully and scored alone; θ = its k-th best single-term score. The
   true k-th best total score is ≥ θ (total ≥ single-term for those docs).
3. A block b of term t is decoded only if ub(t,b) + Σ_{t'≠t} gmax(t') ≥ θ,
   where gmax is the term's best block bound. Any doc all of whose blocks
   are skipped has total upper bound < θ, so it cannot reach the top k; docs
   with partially-skipped blocks accumulate understated scores that are
   still < θ, so they cannot displace the (≥ k) docs scoring ≥ θ. The
   returned top-k is therefore EXACT (proof mirrors WAND's invariant).
4. Accumulation is one np.add.at over decoded ordinals; partition top-k via
   argpartition; the global merge is ORDER BY score DESC, docid ASC LIMIT k
   (TakeOrderedAndProject — Spark's built-in two-phase top-k, the analogue
   of Solr's PURPOSE_GET_TOP_IDS merge, QueryComponent.java:833-1040).

Scores use the SmallFloat-QUANTIZED doc length (Lucene parity). The norm
byte travels INSIDE the posting list (1 byte per posting, like Lucene's
impact data), so scoring touches ONLY the query terms' postings rows —
never the doc table. The doc table is read once per partition at the very
end, with an ord-IN filtered, row-group-pruned parquet read, purely to map
the winning top-k ordinals back to docids: per-query IO is O(query postings
+ k), not O(corpus).

Rank-identity across partition counts holds because scoring is per-doc
exact and the tiebreak (score desc, docid asc) is total.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solr_spark.index.codec import BLOCK_SIZE, decode_blocks, decode_postings
from solr_spark.index.norms import DECODE_TABLE
from solr_spark.query.bm25 import idf


def _contrib(tf, dl, k1: float, b: float, avgdl: float):
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


def _decode_all(r) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    o, t = decode_postings(r["gaps"], r["tfs"])
    norms = np.frombuffer(r["norms"], dtype=np.uint8)
    return o, t, norms


def _lookup_docids(
    index_dir: str, p: int, gen: int, ords: np.ndarray
) -> np.ndarray:
    """Map segment-local ordinals to docids via a filtered parquet read
    (row-group pruned; the doc table is written with small row groups)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # Executor-side: parallelism comes from Spark tasks; pyarrow's own
    # thread pool (defaults to ALL machine cores, PER task process) would
    # oversubscribe the box n_tasks × n_cores-fold.
    pa.set_cpu_count(1)
    path = f"{index_dir}/seg/p={p:05d}/gen={gen}/docs.parquet"
    tbl = pq.read_table(
        path,
        columns=["ord", "docid"],
        filters=[("ord", "in", [int(o) for o in ords])],
        use_threads=False,
    )
    m = dict(zip(tbl["ord"].to_pylist(), tbl["docid"].to_pylist()))
    return np.array([m[int(o)] for o in ords], dtype=np.int64)


def _score_partition(
    postings: pd.DataFrame,
    weights: dict[str, float],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    use_wand: bool,
    index_dir: str,
    p: int,
) -> pd.DataFrame:
    out_docids: list[np.ndarray] = []
    out_scores: list[np.ndarray] = []
    for gen, pg in postings.groupby("gen", sort=True):
        rows = []
        for _, r in pg.iterrows():
            w = weights[r["term"]]
            bmax_tf = np.asarray(r["block_max_tf"], dtype=np.float64)
            bmin_dl = DECODE_TABLE[np.asarray(r["block_min_norm"], dtype=np.int64)]
            ub = w * _contrib(bmax_tf, bmin_dl.astype(np.float64), k1, b, avgdl)
            rows.append((r, w, ub, float(ub.max())))

        if use_wand and len(rows) > 1:
            # Seed θ from the term with the fewest postings in this segment.
            seed_i = min(range(len(rows)), key=lambda i: rows[i][0]["df"])
        else:
            seed_i = None

        theta = -np.inf
        decoded: list[tuple[np.ndarray, np.ndarray, np.ndarray, float]] = []
        if seed_i is not None:
            r, w, _, _ = rows[seed_i]
            o, t, nrm = _decode_all(r)
            s = w * _contrib(
                t.astype(np.float64), DECODE_TABLE[nrm].astype(np.float64),
                k1, b, avgdl,
            )
            if s.size >= k:
                theta = float(np.partition(s, -k)[-k])
            decoded.append((o, t, nrm, w))
            gmax_sum = sum(x[3] for i, x in enumerate(rows) if i != seed_i)

        for i, (r, w, ub, _) in enumerate(rows):
            if i == seed_i:
                continue
            if seed_i is not None and theta > -np.inf:
                others = gmax_sum - rows[i][3] + rows[seed_i][3]
                keep = np.flatnonzero(ub + others >= theta)
            else:
                keep = np.arange(ub.size)
            if keep.size == 0:
                continue
            if keep.size == ub.size:
                o, t, nrm = _decode_all(r)
            else:
                df_ = int(r["df"])
                o, t = decode_blocks(
                    r["gaps"], r["tfs"], keep,
                    np.asarray(r["block_first_ord"], dtype=np.int64),
                    np.asarray(r["block_gap_off"], dtype=np.int64),
                    np.asarray(r["block_tf_off"], dtype=np.int64),
                    df_,
                )
                all_norms = np.frombuffer(r["norms"], dtype=np.uint8)
                nrm = np.concatenate(
                    [
                        all_norms[bi * BLOCK_SIZE : min((bi + 1) * BLOCK_SIZE, df_)]
                        for bi in keep
                    ]
                )
            decoded.append((o, t, nrm, w))

        if not decoded:
            continue
        size = int(max(o.max() for o, _, _, _ in decoded if o.size)) + 1
        acc = np.zeros(size, dtype=np.float64)
        for o, t, nrm, w in decoded:
            acc_contrib = w * _contrib(
                t.astype(np.float64), DECODE_TABLE[nrm].astype(np.float64),
                k1, b, avgdl,
            )
            np.add.at(acc, o, acc_contrib)
        nz = np.flatnonzero(acc > 0)
        if nz.size > k:
            # Keep EVERY doc tied with the k-th best score (argpartition alone
            # picks an arbitrary subset of boundary ties, which could drop a
            # tied doc with a smaller docid before the global
            # (score desc, docid asc) merge — breaking rank-identity).
            kth = np.partition(acc[nz], -k)[-k]
            top = nz[acc[nz] >= kth]
        else:
            top = nz
        if top.size:
            out_docids.append(_lookup_docids(index_dir, p, int(gen), top))
            out_scores.append(acc[top])

    if not out_docids:
        return pd.DataFrame({"docid": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    return pd.DataFrame(
        {"docid": np.concatenate(out_docids), "score": np.concatenate(out_scores)}
    )


def _phrase_count(
    pos_lists: list[np.ndarray],
    offsets: list[int],
    slop: int,
    terms: list[str] | None = None,
) -> float:
    """Phrase freq in one doc. Exact (slop=0): size of the intersection of
    offset-shifted position sets (integer tf, vectorized). Slop>0: Lucene's
    SLOPPY matcher — the shared greedy sweep in query/sloppy.py (float
    freq of 1/(1+matchLength) weights, out-of-order admitted) — identical
    to the logical path's matcher, so the parity suite holds bit-for-bit."""
    if slop == 0:
        acc = pos_lists[0]
        for i in range(1, len(pos_lists)):
            acc = np.intersect1d(
                acc, pos_lists[i] - np.int64(offsets[i]), assume_unique=True
            )
            if acc.size == 0:
                return 0
        return int(acc.size)
    from solr_spark.query.sloppy import sloppy_freq

    return sloppy_freq(pos_lists, offsets, slop, terms)


def _phrase_partition(
    postings: pd.DataFrame,
    terms: list[str],
    offsets: list[int],
    slop: int,
    w: float,
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    index_dir: str,
    p: int,
) -> pd.DataFrame:
    """Per-partition phrase scoring over compressed segments: full decode of
    the phrase terms' postings+positions, ordinal-intersection to get the
    conjunction candidates, then a per-candidate position check. Work is
    O(postings of the phrase terms) — the doc table is touched only for the
    final ord→docid lookup of the (few) winners."""
    from solr_spark.index.codec import decode_positions

    uniq = sorted(set(terms))
    out_docids: list[np.ndarray] = []
    out_scores: list[np.ndarray] = []
    for gen, pg in postings.groupby("gen", sort=True):
        by_term = {r["term"]: r for _, r in pg.iterrows()}
        if any(t not in by_term for t in uniq):
            continue  # a phrase term absent from this segment: no match here
        dec: dict[str, tuple] = {}
        for t in uniq:
            r = by_term[t]
            o, tf = decode_postings(r["gaps"], r["tfs"])
            flat, starts = decode_positions(r["poss"], tf)
            nrm = np.frombuffer(r["norms"], dtype=np.uint8)
            dec[t] = (o, tf, flat, starts, nrm)
        # conjunction: ords present in every phrase term's postings
        common = dec[uniq[0]][0]
        for t in uniq[1:]:
            common = np.intersect1d(common, dec[t][0], assume_unique=True)
        if common.size == 0:
            continue
        o0, _, _, _, nrm0 = dec[uniq[0]]
        idx0 = np.searchsorted(o0, common)
        if slop > 0 and len(uniq) == len(terms):
            # distinct-term sloppy phrase: ONE batched numpy sweep over
            # every conjunction candidate (sloppy_freq_batch) instead of a
            # per-candidate Python heap loop — the 3+-term hot-phrase path.
            from solr_spark.query.sloppy import sloppy_freq_batch

            slots = []
            for i, t in enumerate(terms):
                o, tf, flat, starts, _ = dec[t]
                j = np.searchsorted(o, common)
                slots.append((
                    flat,
                    starts[j].astype(np.int64),
                    tf[j].astype(np.int64),
                    offsets[i],
                ))
            freqs = sloppy_freq_batch(slots, slop)
            msel = freqs > 0
            if not msel.any():
                continue
            tfv = freqs[msel]
            dlv = DECODE_TABLE[nrm0[idx0[msel]]].astype(np.float64)
            acc = w * tfv / (tfv + k1 * (1.0 - b + b * dlv / avgdl))
            ords_arr = common[msel].astype(np.int64)
        else:
            docs_scored: list[int] = []
            scores: list[float] = []
            for ci, ordv in enumerate(common):
                pls = []
                for t in terms:  # phrase order (dupes share the decode)
                    o, tf, flat, starts, _ = dec[t]
                    j = int(np.searchsorted(o, ordv))
                    s = int(starts[j])
                    pls.append(flat[s : s + int(tf[j])])
                tf_p = _phrase_count(pls, offsets, slop, terms)
                if tf_p:
                    dl = float(DECODE_TABLE[nrm0[idx0[ci]]])
                    scores.append(
                        w * tf_p / (tf_p + k1 * (1.0 - b + b * dl / avgdl))
                    )
                    docs_scored.append(int(ordv))
            if not docs_scored:
                continue
            acc = np.asarray(scores)
            ords_arr = np.asarray(docs_scored, dtype=np.int64)
        if acc.size > k:
            kth = np.partition(acc, -k)[-k]
            keep = acc >= kth  # keep boundary ties (rank-identity)
            acc, ords_arr = acc[keep], ords_arr[keep]
        out_docids.append(_lookup_docids(index_dir, p, int(gen), ords_arr))
        out_scores.append(acc)
    if not out_docids:
        return pd.DataFrame({"docid": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    return pd.DataFrame(
        {"docid": np.concatenate(out_docids), "score": np.concatenate(out_scores)}
    )


def _clause_ords(
    decoded: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
    clause: tuple[str, object],
    size: int,
) -> np.ndarray:
    """Boolean mask of ordinals matching a ("terms", [t..]) or
    ("prefix", pref) clause within one segment."""
    kind, val = clause
    m = np.zeros(size, dtype=bool)
    if kind == "terms":
        for t in val:
            if t in decoded:
                o = decoded[t][0]
                m[o[o < size]] = True
    else:  # prefix
        for t, (o, _, _) in decoded.items():
            if t.startswith(val):
                m[o[o < size]] = True
    return m


def _eval_node(
    node: dict,
    decoded: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
    size: int,
    k1: float,
    b: float,
    avgdl: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Recursive per-segment evaluation of a grouped boolean tree: returns
    (scores, match_mask) over segment ordinals. Mirrors the logical
    parser's grouped combination exactly — flat stream (internal musts
    enforced) + boosted child streams summed, must children intersected,
    must_not children and level negatives subtracted — so the parity suite
    holds score-for-score. Segments partition by docid, making the
    ordinal-set algebra globally correct locally."""
    acc = np.zeros(size, dtype=np.float64)
    mask = np.zeros(size, dtype=bool)
    must_masks: list[np.ndarray] = []
    neg_mask = np.zeros(size, dtype=bool)

    if node["has_flat"]:
        facc = np.zeros(size, dtype=np.float64)
        fseen = np.zeros(size, dtype=bool)
        for t, w_bm in node["weights"].items():
            if t not in decoded:
                continue
            o, tf, nrm = decoded[t]
            contrib = w_bm * _contrib(
                tf.astype(np.float64),
                DECODE_TABLE[nrm].astype(np.float64), k1, b, avgdl,
            )
            np.add.at(facc, o, contrib)
            fseen[o] = True
        for pref, boost in node["prefixes"]:
            m = _clause_ords(decoded, ("prefix", pref), size)
            facc[m] += boost
            fseen |= m
        fkeep = fseen
        for clause in node["musts"]:
            fkeep = fkeep & _clause_ords(decoded, clause, size)
        facc[~fkeep] = 0.0
        acc += facc
        mask |= fkeep
        if node["flat_must"]:
            must_masks.append(fkeep)

    for occur, boost, child in node["children"]:
        cacc, cmask = _eval_node(child, decoded, size, k1, b, avgdl)
        if occur == "must_not":
            neg_mask |= cmask
            continue
        acc += cacc * boost
        mask |= cmask
        if occur == "must":
            must_masks.append(cmask)

    for m in must_masks:
        mask &= m
    for clause in node["negs"]:
        mask &= ~_clause_ords(decoded, clause, size)
    mask &= ~neg_mask
    acc[~mask] = 0.0
    return acc, mask


def _tree_partition(
    postings: pd.DataFrame,
    root: dict,
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    index_dir: str,
    p: int,
) -> pd.DataFrame:
    """Per-partition grouped boolean scoring: decode every scanned term once,
    evaluate the tree with ordinal-set algebra, keep the per-segment top-k
    (boundary ties kept for rank-identity)."""
    out_docids: list[np.ndarray] = []
    out_scores: list[np.ndarray] = []
    for gen, pg in postings.groupby("gen", sort=True):
        size = 0
        decoded: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for _, r in pg.iterrows():
            o, tf = decode_postings(r["gaps"], r["tfs"])
            nrm = np.frombuffer(r["norms"], dtype=np.uint8)
            decoded[r["term"]] = (o, tf, nrm)
            size = max(size, int(o[-1]) + 1 if o.size else 0)
        if size == 0:
            continue
        acc, mask = _eval_node(root, decoded, size, k1, b, avgdl)
        cand = np.flatnonzero(mask)
        if cand.size == 0:
            continue
        scores = acc[cand]
        if cand.size > k:
            kth = np.partition(scores, -k)[-k]
            sel = scores >= kth  # keep boundary ties (rank-identity)
            cand, scores = cand[sel], scores[sel]
        out_docids.append(_lookup_docids(index_dir, p, int(gen), cand))
        out_scores.append(scores)
    if not out_docids:
        return pd.DataFrame({"docid": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    return pd.DataFrame(
        {"docid": np.concatenate(out_docids), "score": np.concatenate(out_scores)}
    )


_PAYLOAD_BOUNDED = {"max", "sum", "average", "first"}


def _payload_partition(
    pdf: pd.DataFrame, func: str, k: int, index_dir: str, p: int
) -> pd.DataFrame:
    """Top-k (docid, score) for ONE term's payload postings in one segment
    partition, score = ``func`` over the payloads at the term's positions
    (PayloadScoreQParserPlugin.java, includeSpanScore=false).

    Block-max pruning on the payload stream (no Lucene analogue — payload
    queries there always decode every matching doc): each block's stored
    max payload bounds any doc's score in it (max/first/average <= max_pay;
    sum <= max_tf*max_pay when max_pay >= 0, else <= max_pay). Blocks are
    visited bound-descending and skipped once k candidates beat the bound
    strictly — ``min`` has no upper bound from max metadata and decodes all
    blocks.
    """
    cands_ord: list[np.ndarray] = []
    cands_gen: list[np.ndarray] = []
    cands_score: list[np.ndarray] = []
    kth = -np.inf  # k-th best score seen so far (score-only threshold)
    n_kept = 0

    def _threshold() -> float:
        # exact k-th best among kept candidate scores (kept list is small:
        # it's compacted against the previous threshold)
        allsc = np.concatenate(cands_score)
        if allsc.size < k:
            return -np.inf
        return float(np.partition(allsc, allsc.size - k)[allsc.size - k])

    for _, r in pdf.iterrows():  # one row per generation holding this term
        if len(r["pays"] or b"") == 0:
            raise ValueError(
                "payload query on an index built without store_payloads "
                "(same contract as positions for phrase queries)"
            )
        gen = int(r["gen"])
        pays = np.frombuffer(r["pays"], dtype=np.float32)
        bmp = np.asarray(r["block_max_pay"], dtype=np.float64)
        n_blocks = bmp.size
        if func == "sum":
            bmt = np.asarray(r["block_max_tf"], dtype=np.float64)
            bounds = np.where(bmp >= 0, bmp * bmt, bmp)
        elif func in _PAYLOAD_BOUNDED:
            bounds = bmp
        else:  # min — not boundable by max metadata
            bounds = np.full(n_blocks, np.inf)
        pay_off = np.asarray(r["block_pay_off"], dtype=np.int64)
        pay_end = np.append(pay_off[1:], len(r["pays"]))
        b_first = np.asarray(r["block_first_ord"], dtype=np.int64)
        b_goff = np.asarray(r["block_gap_off"], dtype=np.int64)
        b_toff = np.asarray(r["block_tf_off"], dtype=np.int64)
        for bi in np.argsort(-bounds, kind="stable"):
            if n_kept >= k and bounds[bi] < kth:
                break  # all remaining blocks bound strictly below k-th best
            ords_b, tfs_b = decode_blocks(
                r["gaps"], r["tfs"], np.array([bi]), b_first, b_goff, b_toff,
                int(r["df"]),
            )
            seg = pays[pay_off[bi] // 4 : pay_end[bi] // 4]
            offs = np.zeros(tfs_b.size, dtype=np.int64)
            offs[1:] = np.cumsum(tfs_b)[:-1]
            if func == "max":
                sc = np.maximum.reduceat(seg, offs).astype(np.float64)
            elif func == "min":
                sc = np.minimum.reduceat(seg, offs).astype(np.float64)
            elif func == "sum":
                sc = np.add.reduceat(seg.astype(np.float64), offs)
            elif func == "average":
                sc = np.add.reduceat(seg.astype(np.float64), offs) / tfs_b
            else:  # first
                sc = seg[offs].astype(np.float64)
            cands_ord.append(ords_b)
            cands_gen.append(np.full(ords_b.size, gen, dtype=np.int64))
            cands_score.append(sc)
            n_kept += ords_b.size
            if n_kept >= k:
                kth = _threshold()
                # Compact: only scores >= kth can reach the top k (ties at
                # kth stay — the docid tiebreak is resolved after lookup).
                if len(cands_score) > 8:
                    keep = [s >= kth for s in cands_score]
                    cands_ord = [o[m] for o, m in zip(cands_ord, keep, strict=True)]
                    cands_gen = [g[m] for g, m in zip(cands_gen, keep, strict=True)]
                    cands_score = [
                        s[m] for s, m in zip(cands_score, keep, strict=True)
                    ]

    if not cands_score:
        return pd.DataFrame({"docid": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    ords = np.concatenate(cands_ord)
    gens = np.concatenate(cands_gen)
    scores = np.concatenate(cands_score)
    mask = scores >= (kth if n_kept >= k else -np.inf)
    ords, gens, scores = ords[mask], gens[mask], scores[mask]
    docids = np.empty(ords.size, dtype=np.int64)
    for g in np.unique(gens):
        gm = gens == g
        docids[gm] = _lookup_docids(index_dir, p, int(g), ords[gm])
    order = np.lexsort((docids, -scores))[:k]
    return pd.DataFrame({"docid": docids[order], "score": scores[order]})


class PhysicalIndex:
    """Searcher over a physical index directory.

    Opening is the expensive part (parquet file listing + schema + the
    term-stats cache), exactly like opening a Lucene IndexSearcher — so open
    once and reuse. The opened postings scan DataFrame caches its file index;
    per-query work is just a filtered scan + one applyInPandas stage.
    """

    # Driver-side per-term df cache cap. Query workloads touch a tiny,
    # heavily-reused slice of the dictionary; the cap bounds driver memory
    # INDEPENDENT of dictionary size (a 100 TB corpus has 10^8-10^9 terms —
    # collecting the dictionary on open would OOM the driver).
    TERM_CACHE_MAX = 262_144

    def __init__(self, spark: SparkSession, index_dir: str):
        from solr_spark.index.segments import read_corpus_stats

        self.spark = spark
        self.index_dir = index_dir
        self.commit_token = _commit_token(index_dir)
        self.stats = read_corpus_stats(index_dir)
        self._scan = spark.read.parquet(f"{index_dir}/seg/*/*/postings.parquet")
        self._postings = self._scan.select(
            "p", "gen", "term", "df", "gaps", "tfs", "norms",
            "block_first_ord", "block_gap_off", "block_tf_off",
            "block_max_tf", "block_min_norm",
        )
        self._term_stats = spark.read.parquet(
            f"{index_dir}/term_stats.parquet"
        ).select("term", "df")
        # term -> global df, or None for a term known absent from the corpus
        # (negative caching avoids re-scanning for repeated OOV query terms).
        # Insertion-ordered dict doubles as the LRU eviction order.
        self._term_df_cache: dict[str, int | None] = {}

    def _df_for_terms(self, terms: list[str]) -> dict[str, int]:
        """Global df for ``terms`` via a term-IN filtered (row-group pruned)
        read of term_stats — never a full dictionary collect."""
        missing = [t for t in terms if t not in self._term_df_cache]
        if missing:
            found = {
                r["term"]: r["df"]
                for r in self._term_stats.where(
                    F.col("term").isin(missing)
                ).collect()
            }
            for t in missing:
                self._term_df_cache[t] = found.get(t)
            while len(self._term_df_cache) > self.TERM_CACHE_MAX:
                self._term_df_cache.pop(next(iter(self._term_df_cache)))
        return {
            t: self._term_df_cache[t]
            for t in terms
            if self._term_df_cache.get(t) is not None
        }

    def topk(
        self, query: str | list[str], k: int = 10, use_wand: bool = True
    ) -> DataFrame:
        from solr_spark.analysis.chain import analyze

        stats = self.stats
        k1, b, avgdl, n = stats["k1"], stats["b"], stats["avgdl"], stats["n_docs"]
        terms = (
            sorted(set(analyze(query, stats["analyzer"])))
            if isinstance(query, str)
            else sorted(set(query))
        )
        empty = self.spark.createDataFrame([], "docid long, score double")
        dfs = self._df_for_terms(terms)
        weights = {t: idf(n, df_) for t, df_ in dfs.items()}
        if not weights or n == 0:
            return empty

        postings = self._postings.where(F.col("term").isin(list(weights)))
        index_dir = self.index_dir

        def score(key: tuple, pdf_postings: pd.DataFrame) -> pd.DataFrame:
            return _score_partition(
                pdf_postings, weights, k, k1, b, avgdl, use_wand,
                index_dir, int(key[0]),
            )

        scored = postings.groupBy("p").applyInPandas(score, "docid long, score double")
        return scored.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)

    def _compile_flat(self, parsed, n: int) -> dict:
        """Compile one flat boolean level into the evaluator's node shape:
        weights (term -> summed boost·idf), constant-score prefixes, must /
        must_not clause lists, and whether the flat stream's match set is
        itself required (any positive MUST clause — the logical grouped
        path's flat-must semantics). Fuzzy clauses expand driver-side via
        the bounded capped probe. No early-empty shortcuts: impossibility
        flows through empty ordinal masks, which keeps should-groups with
        unsatisfiable siblings behaving exactly like the logical path."""
        from solr_spark.analysis.chain import analyze
        from solr_spark.query.expand import fuzzy_candidates

        stats = self.stats
        scoring: list[tuple[str, float]] = []
        prefixes: list[tuple[str, float]] = []
        musts: list[tuple[str, object]] = []
        negs: list[tuple[str, object]] = []
        neg_terms: list[str] = []
        flat_must = False
        for c in parsed.clauses:
            if c.kind in ("filter_eq", "filter_range"):
                raise ValueError(
                    "stored-field filters are not available on the physical "
                    "path (segments keep no stored fields)"
                )
            if c.kind == "phrase":
                raise ValueError("use phrase_topk for quoted phrases")
            if c.kind == "prefix":
                pref = analyze(c.text, stats["analyzer"])
                pref_txt = pref[0] if pref else c.text.lower()
                if c.occur == "must_not":
                    negs.append(("prefix", pref_txt))
                    continue
                prefixes.append((pref_txt, c.boost))
                if c.occur == "must":
                    musts.append(("prefix", pref_txt))
                    flat_must = True
                continue
            if c.kind == "fuzzy":
                base = analyze(c.text, stats["analyzer"])
                base_t = base[0] if base else c.text.lower()
                matched = sorted(
                    fuzzy_candidates(self._term_stats, base_t, int(c.lo))
                )
                if c.occur == "must_not":
                    neg_terms.extend(matched)
                    continue
                for t in matched:
                    scoring.append((t, c.boost))
                if c.occur == "must":
                    musts.append(("terms", matched))
                    flat_must = True
                continue
            terms = analyze(c.text, stats["analyzer"])
            if not terms:
                continue
            if c.occur == "must_not":
                neg_terms.extend(terms)
                continue
            for t in terms:
                scoring.append((t, c.boost))
                if c.occur == "must":
                    musts.append(("terms", [t]))
                    flat_must = True
        dfs = self._df_for_terms(
            sorted({t for t, _ in scoring} | set(neg_terms))
        )
        weights: dict[str, float] = {}
        for t, boost in scoring:
            if t not in dfs:
                continue
            weights[t] = weights.get(t, 0.0) + boost * idf(n, dfs[t])
        neg_present = [t for t in neg_terms if t in dfs]
        if neg_present:
            negs.append(("terms", neg_present))
        return {
            "weights": weights,
            "prefixes": prefixes,
            "musts": musts,
            "negs": negs,
            "flat_must": flat_must,
            # Evaluate the flat block whenever POSITIVE clauses were parsed
            # — even if every term is corpus-absent (weights empty): a
            # required absent term must yield an empty flat match set that
            # still gates the level (logical-path parity), not vanish.
            "has_flat": bool(scoring or prefixes),
            "children": [],
        }

    def _search_grouped(self, query: str, k: int) -> DataFrame:
        """Parenthesized boolean groups on the physical path: the SAME
        top-level splitter the logical parser uses builds a tree of flat
        levels; each segment evaluates the tree with ordinal-set algebra
        (_eval_node). Group boost multiplies the child's scores; AND
        adjacency promotes both sides — all inherited from
        parser._split_top_level, so the two paths' grammars agree."""
        from solr_spark.query.parser import _split_top_level, parse_query

        stats = self.stats
        k1, b, avgdl, n = stats["k1"], stats["b"], stats["avgdl"], stats["n_docs"]
        empty = self.spark.createDataFrame([], "docid long, score double")
        if n == 0:
            return empty

        def compile_node(q: str) -> dict:
            if "(" in q:
                flat, groups = _split_top_level(q)
                node = self._compile_flat(parse_query(flat), n)
                for occur, boost, inner in groups:
                    node["children"].append(
                        (occur, float(boost), compile_node(inner))
                    )
                return node
            return self._compile_flat(parse_query(q), n)

        root = compile_node(query)

        scan_terms: set[str] = set()
        scan_prefixes: set[str] = set()

        def gather(nd: dict) -> None:
            scan_terms.update(nd["weights"])
            for kind, val in list(nd["musts"]) + list(nd["negs"]):
                if kind == "terms":
                    scan_terms.update(val)
                else:
                    scan_prefixes.add(val)
            scan_prefixes.update(p for p, _ in nd["prefixes"])
            for _, _, ch in nd["children"]:
                gather(ch)

        gather(root)
        if not scan_terms and not scan_prefixes:
            return empty
        cond = (
            F.col("term").isin(sorted(scan_terms))
            if scan_terms
            else F.lit(False)
        )
        for pref in sorted(scan_prefixes):
            cond = cond | F.col("term").startswith(pref)
        postings = self._postings.where(cond)
        index_dir = self.index_dir

        def score(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            return _tree_partition(
                pdf, root, k, k1, b, avgdl, index_dir, int(key[0])
            )

        scored = postings.groupBy("p").applyInPandas(
            score, "docid long, score double"
        )
        return scored.orderBy(
            F.col("score").desc(), F.col("docid").asc()
        ).limit(k)

    def search(self, query: str, k: int = 10) -> DataFrame:
        """Boolean term queries over the compressed segments: the classic
        parser's term subset — bare terms (SHOULD, summed), ``+``/``AND``
        (MUST), ``-``/``NOT`` (MUST_NOT), ``term^boost``, ``prefix*``
        (constant score per matching doc, no expansion), ``term~N``
        (bounded capped fuzzy), and parenthesized groups with boosts
        nesting arbitrarily. Stored-field filters and quoted phrases are
        not in this path (segments store no stored fields; use phrase_topk
        for phrases).

        One engine for flat AND grouped queries: the query compiles to a
        boolean tree (a flat query is a root node with no children) and
        each segment evaluates it with ordinal-set algebra (_eval_node) —
        decode only the query terms' postings, accumulate BM25 into a
        dense ordinal array, enforce musts by intersection and must_nots
        by subtraction; work is O(query term postings), like topk, plus
        the set ops.
        """
        return self._search_grouped(query, k)

    def phrase_topk(self, phrase: str, k: int = 10, slop: int = 0) -> DataFrame:
        """Top-k phrase matches over the compressed segments (PhraseQuery on
        the physical path). Scoring parity with query/phrase.py: tf = phrase
        freq, weight = Σ member idfs, quantized norms. Query-side stopword
        gaps are preserved in the match pattern."""
        from solr_spark.analysis.chain import analyze_pos

        stats = self.stats
        if not stats.get("positions", True):
            raise ValueError(
                "phrase queries need positions: this index was built with "
                "store_positions=False (same contract as the logical path)"
            )
        k1, b, avgdl, n = stats["k1"], stats["b"], stats["avgdl"], stats["n_docs"]
        empty = self.spark.createDataFrame([], "docid long, score double")
        tp = analyze_pos(phrase, stats["analyzer"])
        if not tp or n == 0:
            return empty
        terms = [t for t, _ in tp]
        offsets = [p - tp[0][1] for _, p in tp]
        dfs = self._df_for_terms(sorted(set(terms)))
        if any(t not in dfs for t in terms):
            return empty
        w = sum(idf(n, dfs[t]) for t in terms)
        # Positions column only on THIS scan — term-query WAND never pays
        # for the .pos bytes (parquet column pruning).
        postings = self._scan.select(
            "p", "gen", "term", "gaps", "tfs", "norms", "poss"
        ).where(F.col("term").isin(sorted(set(terms))))
        index_dir = self.index_dir

        def score(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            return _phrase_partition(
                pdf, terms, offsets, slop, w, k, k1, b, avgdl,
                index_dir, int(key[0]),
            )

        scored = postings.groupBy("p").applyInPandas(score, "docid long, score double")
        return scored.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)

    def payload_topk(self, term: str, func: str = "max", k: int = 10) -> DataFrame:
        """Top-k `{!payload_score}` over the physical payload stream
        (includeSpanScore=false: the payload function value IS the score).
        ``term`` is matched against the delimited_payload chain's terms
        (lowercased whitespace tokens). Payloads are float32 on disk
        (Lucene PayloadHelper float-encoder width) — scores reflect that
        precision, unlike the logical double-precision path."""
        from solr_spark.query.payload import PAYLOAD_FUNCS

        if func not in PAYLOAD_FUNCS:
            raise ValueError(
                f"unknown payload function {func!r}; one of {PAYLOAD_FUNCS}"
            )
        if not self.stats.get("payloads", False):
            raise ValueError(
                "payload query needs payloads: this index was built with "
                "store_payloads=False"
            )
        empty = self.spark.createDataFrame([], "docid long, score double")
        t = term.lower()
        if not t or not self._df_for_terms([t]):
            return empty
        # Payload columns only on THIS scan (parquet column pruning keeps
        # BM25/phrase queries from ever reading the .pay bytes).
        postings = self._scan.select(
            "p", "gen", "term", "df", "gaps", "tfs",
            "block_first_ord", "block_gap_off", "block_tf_off",
            "block_max_tf", "pays", "block_pay_off", "block_max_pay",
        ).where(F.col("term") == t)
        index_dir = self.index_dir

        def score(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            return _payload_partition(pdf, func, k, index_dir, int(key[0]))

        scored = postings.groupBy("p").applyInPandas(score, "docid long, score double")
        return scored.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)


_READER_CACHE: dict[tuple[str, str], PhysicalIndex] = {}


def _commit_token(index_dir: str) -> tuple:
    """Identity of the index's committed state: corpus_stats.json mtime +
    the committed generation list. Changes on every finalize_index/merge, so
    a cached reader can detect staleness without re-listing segments."""
    import os

    st = os.stat(f"{index_dir}/corpus_stats.json")
    from solr_spark.index.segments import read_corpus_stats

    gens = tuple(read_corpus_stats(index_dir).get("generations", ()))
    return (st.st_mtime_ns, st.st_size, gens)


def open_index(spark: SparkSession, index_dir: str) -> PhysicalIndex:
    """Open (or reuse) a searcher. The cache is keyed by Spark application +
    directory and invalidated by commit token: after incremental_index_sink
    adds a generation or merge_index rewrites the directory, the next open
    sees a changed token and reopens (fresh N/avgdl/df + file listing) —
    the analogue of Solr's openSearcher-on-commit."""
    key = (spark.sparkContext.applicationId, index_dir)
    cached = _READER_CACHE.get(key)
    if cached is None or cached.commit_token != _commit_token(index_dir):
        _READER_CACHE[key] = PhysicalIndex(spark, index_dir)
    return _READER_CACHE[key]


def wand_topk(
    spark: SparkSession,
    index_dir: str,
    query: str | list[str],
    k: int = 10,
    use_wand: bool = True,
) -> DataFrame:
    """Top-k (docid, score) from a physical index directory."""
    return open_index(spark, index_dir).topk(query, k=k, use_wand=use_wand)


def wand_phrase_topk(
    spark: SparkSession,
    index_dir: str,
    phrase: str,
    k: int = 10,
    slop: int = 0,
) -> DataFrame:
    """Top-k phrase matches from a physical index directory."""
    return open_index(spark, index_dir).phrase_topk(phrase, k=k, slop=slop)


def wand_payload_topk(
    spark: SparkSession,
    index_dir: str,
    term: str,
    func: str = "max",
    k: int = 10,
) -> DataFrame:
    """Top-k payload_score matches from a physical payload index."""
    return open_index(spark, index_dir).payload_topk(term, func=func, k=k)
