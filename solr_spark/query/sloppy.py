"""Lucene sloppy-phrase matching (SloppyPhraseMatcher semantics).

Reference behavior: a quoted clause with slop — ``"a b"~N`` — is wired by
the classic parser into a PhraseQuery with that slop
(solr/core/src/java/org/apache/solr/parser/SolrQueryParserBase.java,
getFieldQuery + phraseSlop). Lucene's sloppy matcher (public Lucene,
SloppyPhraseMatcher / the classic SloppyPhraseScorer.phraseFreq loop)
differs from a plain in-order window in two ways this module reproduces:

1. OUT-OF-ORDER arrangements match when their displacement fits the slop:
   each phrase term's positions are OFFSET-ADJUSTED (actual position minus
   the term's query offset) and a match is any local alignment whose
   adjusted spread ``matchLength = max - min`` is <= slop. A transposed
   pair ("b a" matching a doc's "a b") has matchLength 2, so it matches at
   slop >= 2 — exactly Lucene.
2. Matches are WEIGHTED, not counted: each match contributes
   ``1 / (1 + matchLength)`` (the sloppy weight BM25Similarity receives),
   so the phrase "tf" fed into the saturation curve is a float — an exact
   adjacent match is worth 1.0, a one-gap match 0.5, a transposition 1/3.

The freq is produced by Lucene's greedy minimization sweep, reimplemented
verbatim (this loop IS the semantics — the DuckDB oracle for the
``phrase_slop*`` catalog entries simulates the identical loop in a
recursive CTE, so engine and oracle agree bit-for-bit):

    advance each term-iterator to its first adjusted position;
    end = max of heads; pop the min head pp;
    matchLength = end - pp.position; next = new min head;
    loop: advance pp (end tracks the max ever seen);
      if pp overshoots next: record a match if matchLength <= slop
        (weight 1/(1+matchLength)), re-seat pp in the queue, pop the new
        min, reset matchLength = end - min;
      else matchLength = min(matchLength, end - pp.position);
    when any iterator exhausts: record a final match if matchLength <= slop.

Ties in the priority queue break by query offset (PhraseQueue.lessThan),
which the heap tuples encode.

Repeated phrase terms: Lucene routes these through a repeat-group
bijection (advanceRpts). This module implements the simplified invariant
— same-term iterators always sit on DISTINCT actual positions (the j-th
duplicate starts on the j-th occurrence; a colliding advance keeps
advancing) — which matches Lucene on the common shapes and is
deterministic everywhere; documented simplification.

Scale shape: the sweep is O(total query-term positions in the doc · log n)
per candidate document, runs inside the per-partition batch (physical
path) or an Arrow-batched pandas UDF (logical path), and only ever touches
docs that already passed the all-terms conjunction join.
"""

from __future__ import annotations

import heapq

import numpy as np


def _sloppy2(adj0: list[int], adj1: list[int], slop: int) -> float:
    """Two-distinct-term specialization of the greedy sweep — no heap,
    two pointers (the overwhelmingly common sloppy-phrase shape; a hot
    bigram can have 10^5 candidate docs per batch, so the constant factor
    matters)."""
    a0, b0 = adj0[0], adj1[0]
    end = a0 if a0 >= b0 else b0
    if a0 <= b0:
        cur, ml, nxt = 0, end - a0, b0
    else:
        cur, ml, nxt = 1, end - b0, a0
    i = j = 0
    freq = 0.0
    n0, n1 = len(adj0), len(adj1)
    while True:
        if cur == 0:
            i += 1
            if i >= n0:
                break
            newpos = adj0[i]
        else:
            j += 1
            if j >= n1:
                break
            newpos = adj1[j]
        if newpos > end:
            end = newpos
        if newpos > nxt:
            if ml <= slop:
                freq += 1.0 / (1.0 + ml)
            cur = 1 - cur
            ml = end - nxt
            nxt = newpos
        else:
            ml2 = end - newpos
            if ml2 < ml:
                ml = ml2
    if ml <= slop:
        freq += 1.0 / (1.0 + ml)
    return freq


def sloppy2_tf_expr(pos0: str, pos1: str, off0: int, off1: int, slop: int) -> str:
    """SQL expression computing the 2-distinct-term sloppy freq PURE JVM —
    the whole-stage-codegen replacement for routing ``_sloppy2`` through a
    pandas UDF (which costs a Python-worker fleet spawn + Arrow transfer of
    every candidate's position arrays; at web scale a hot bigram has 10^5+
    candidates per partition).

    An EXACT transcription of the ``_sloppy2`` two-pointer machine as a
    left fold: ``aggregate(sequence(1, n0+n1), state, step)`` where the
    accumulator carries the full machine state (both pointers ``i``/``j``,
    the active iterator ``c``, end/matchLength/next, freq, done) and each
    step executes one loop iteration. Note the consumption order is NOT a
    sorted merge — on position ties the matcher stays on the current
    iterator — which is why the pointers live in the accumulator instead
    of pre-sorting events. O(n0+n1) steps per doc, each O(1) (positions
    are read by index with try_element_at; no per-step array rebuild).
    Parity with the Python matcher is asserted by a 4k-case randomized
    test (tests/test_phrase.py)."""
    # adjusted position reads, 1-based k (NULL past the end)
    def rd(pos: str, off: int, k: str) -> str:
        return f"(try_element_at({pos}, {k}) - {off})"

    h0 = rd(pos0, off0, "1")
    h1 = rd(pos1, off1, "1")
    # init mirrors _sloppy2: end = max(h0,h1); cur = 0 iff h0 <= h1;
    # ml = end - min; nxt = the non-cur head = max. i/j are the NEXT
    # 0-based indices to read (both 1 after consuming the heads).
    init = (
        f"named_struct("
        f"'i', 1, 'j', 1, "
        f"'c', IF({h0} <= {h1}, 0, 1), "
        f"'e', greatest({h0}, {h1}), "
        f"'m', greatest({h0}, {h1}) - least({h0}, {h1}), "
        f"'x', greatest({h0}, {h1}), "
        f"'f', CAST(0.0 AS DOUBLE), 'd', false)"
    )
    add = (
        f"IF(acc.m <= {slop}, 1.0 / (1.0 + CAST(acc.m AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE))"
    )
    # newpos for the active iterator (NULL <=> that iterator exhausts)
    np_ = (
        f"IF(acc.c = 0, {rd(pos0, off0, 'acc.i + 1')}, "
        f"{rd(pos1, off1, 'acc.j + 1')})"
    )
    ni = "IF(acc.c = 0, acc.i + 1, acc.i)"
    nj = "IF(acc.c = 0, acc.j, acc.j + 1)"
    e2 = f"greatest(acc.e, {np_})"
    step = (
        "(acc, _k) -> CASE "
        "WHEN acc.d THEN acc "
        f"WHEN {np_} IS NULL THEN named_struct("
        f"'i', acc.i, 'j', acc.j, 'c', acc.c, 'e', acc.e, 'm', acc.m, "
        f"'x', acc.x, 'f', acc.f + {add}, 'd', true) "
        f"WHEN {np_} > acc.x THEN named_struct("
        f"'i', {ni}, 'j', {nj}, 'c', 1 - acc.c, "
        f"'e', {e2}, 'm', {e2} - acc.x, 'x', {np_}, "
        f"'f', acc.f + {add}, 'd', false) "
        f"ELSE named_struct("
        f"'i', {ni}, 'j', {nj}, 'c', acc.c, "
        f"'e', acc.e, 'm', least(acc.m, acc.e - {np_}), 'x', acc.x, "
        f"'f', acc.f, 'd', false) END"
    )
    seq = f"sequence(1, size({pos0}) + size({pos1}))"
    return f"aggregate({seq}, {init}, {step}, acc -> acc.f)"


def sloppy_freq(
    pos_lists: list[np.ndarray],
    offsets: list[int],
    slop: int,
    terms: list[str] | None = None,
) -> float:
    """Lucene sloppy phrase freq for ONE document.

    ``pos_lists[i]`` holds the sorted positions of phrase term i;
    ``offsets[i]`` its query-side token position (gaps from dropped
    stopwords preserved); ``terms`` (optional) names each slot so repeated
    terms can be detected — omit it when all slots are distinct. Returns
    Σ 1/(1+matchLength) over the greedy sweep's matches; 0.0 when no
    arrangement fits the slop.
    """
    n = len(pos_lists)
    if any(len(p) == 0 for p in pos_lists):
        return 0.0
    if n == 1:
        # Lucene degrades a 1-term phrase to a TermQuery: every occurrence
        # matches with matchLength 0, so freq == tf.
        return float(len(pos_lists[0]))
    if n == 2 and (terms is None or terms[0] != terms[1]):
        return _sloppy2(
            [int(p) - offsets[0] for p in pos_lists[0]],
            [int(p) - offsets[1] for p in pos_lists[1]],
            slop,
        )
    adj = [
        np.asarray(pos_lists[i], dtype=np.int64) - offsets[i] for i in range(n)
    ]

    # Duplicate-term slots share one position stream: seat the j-th
    # duplicate on the j-th occurrence so same-term iterators start (and
    # stay) on distinct actual positions.
    ident = terms if terms is not None else list(range(n))
    idx = [0] * n
    seen_dups: dict[object, int] = {}
    for i in range(n):
        r = seen_dups.get(ident[i], 0)
        seen_dups[ident[i]] = r + 1
        if r:
            if r >= adj[i].size:
                return 0.0  # more duplicate slots than occurrences
            idx[i] = r
    has_rpts = any(v > 1 for v in seen_dups.values())

    def _actual(i: int) -> int:
        return int(adj[i][idx[i]]) + offsets[i]

    def _collides(i: int) -> bool:
        a = _actual(i)
        return any(
            j != i
            and ident[j] == ident[i]
            and idx[j] < adj[j].size
            and _actual(j) == a
            for j in range(n)
        )

    heads: list[tuple[int, int, int]] = []
    end = -(1 << 62)
    for i in range(n):
        p = int(adj[i][idx[i]])
        if p > end:
            end = p
        heapq.heappush(heads, (p, offsets[i], i))

    freq = 0.0
    p0, _, cur = heapq.heappop(heads)
    match_len = end - p0
    nxt = heads[0][0]

    while True:
        idx[cur] += 1
        if has_rpts:
            while idx[cur] < adj[cur].size and _collides(cur):
                idx[cur] += 1
        if idx[cur] >= adj[cur].size:
            break
        newpos = int(adj[cur][idx[cur]])
        if newpos > end:
            end = newpos
        if newpos > nxt:
            if match_len <= slop:
                freq += 1.0 / (1.0 + match_len)
            heapq.heappush(heads, (newpos, offsets[cur], cur))
            p0, _, cur = heapq.heappop(heads)
            nxt = heads[0][0]
            match_len = end - p0
        else:
            ml2 = end - newpos
            if ml2 < match_len:
                match_len = ml2
    if match_len <= slop:
        freq += 1.0 / (1.0 + match_len)
    return freq


def sloppyn_tf_expr(
    pos_cols: list[str], offsets: list[int], slop: int
) -> str:
    """SQL expression computing the n-DISTINCT-term sloppy freq PURE JVM —
    the generalization of ``sloppy2_tf_expr`` that retires the per-candidate
    Python sweep for 3+-term slop phrases ("new york times"-class hot
    phrases pay no Python worker / Arrow transfer).

    The heap machine becomes a left fold whose accumulator carries every
    iterator's state: ``ix`` (consumed count per iterator), ``h`` (current
    adjusted head per iterator), ``c`` (the popped minimum iterator), plus
    end/matchLength/freq/done. The priority queue is replaced by argmin
    over the heads — ``array_min`` over (position, query-offset, slot)
    structs reproduces PhraseQueue.lessThan's offset tiebreak exactly.
    ``nxt`` (the heap's peek-after-pop) is the min over the OTHER heads,
    computed on the fly; on the tighten branch the current iterator is
    necessarily still the minimum (its new position <= nxt), so ``c`` is
    unchanged — the same invariant the two-pointer version exploits.

    O(sum of position-list sizes) steps per doc, each step O(n) array
    work; requires all phrase slots to be DISTINCT terms (repeated-term
    phrases keep the Python repeat-group path, same rule as the 2-term
    specialization). Parity with ``sloppy_freq`` is asserted by the
    randomized suite in tests/test_phrase.py."""
    n = len(pos_cols)
    if n < 2:
        raise ValueError("sloppyn_tf_expr needs >= 2 position columns")
    offs_arr = "array(" + ", ".join(str(int(o)) for o in offsets) + ")"

    def rd(i: int, k: str) -> str:
        # adjusted 1-based read of iterator i's k-th position, INT-typed
        return (
            f"CAST(try_element_at({pos_cols[i]}, {k}) - {offsets[i]} AS INT)"
        )

    heads = [rd(i, "1") for i in range(n)]
    h0 = "array(" + ", ".join(heads) + ")"
    e0 = "greatest(" + ", ".join(heads) + ")"
    argmin0 = (
        f"array_min(transform({h0}, (v, i) -> named_struct("
        f"'p', v, 'o', element_at({offs_arr}, i + 1), 'ii', i)))"
    )
    init = (
        f"named_struct("
        f"'ix', array({', '.join(['1'] * n)}), "
        f"'h', {h0}, "
        f"'c', {argmin0}.ii, "
        f"'e', {e0}, "
        f"'m', {e0} - {argmin0}.p, "
        f"'f', CAST(0.0 AS DOUBLE), 'd', false)"
    )
    # newpos for the active iterator (NULL <=> it exhausted)
    np_ = (
        "CASE acc.c "
        + " ".join(
            f"WHEN {i} THEN {rd(i, f'element_at(acc.ix, {i + 1}) + 1')}"
            for i in range(n)
        )
        + " END"
    )
    add = (
        f"IF(acc.m <= {slop}, 1.0 / (1.0 + CAST(acc.m AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE))"
    )
    ix2 = "transform(acc.ix, (v, i) -> IF(i = acc.c, v + 1, v))"
    h2 = f"transform(acc.h, (v, i) -> IF(i = acc.c, {np_}, v))"
    e2 = f"greatest(acc.e, {np_})"
    nxt = (
        "array_min(filter(transform(acc.h, (v, i) -> "
        "IF(i = acc.c, CAST(NULL AS INT), v)), x -> x IS NOT NULL))"
    )
    argmin2 = (
        f"array_min(transform({h2}, (v, i) -> named_struct("
        f"'p', v, 'o', element_at({offs_arr}, i + 1), 'ii', i)))"
    )
    step = (
        "(acc, _k) -> CASE "
        "WHEN acc.d THEN acc "
        f"WHEN {np_} IS NULL THEN named_struct("
        f"'ix', acc.ix, 'h', acc.h, 'c', acc.c, 'e', acc.e, 'm', acc.m, "
        f"'f', acc.f + {add}, 'd', true) "
        f"WHEN {np_} > {nxt} THEN named_struct("
        f"'ix', {ix2}, 'h', {h2}, 'c', {argmin2}.ii, "
        f"'e', {e2}, 'm', {e2} - {argmin2}.p, "
        f"'f', acc.f + {add}, 'd', false) "
        f"ELSE named_struct("
        f"'ix', {ix2}, 'h', {h2}, 'c', acc.c, "
        f"'e', acc.e, 'm', least(acc.m, acc.e - {np_}), "
        f"'f', acc.f, 'd', false) END"
    )
    seq = "sequence(1, " + " + ".join(f"size({p})" for p in pos_cols) + ")"
    return f"aggregate({seq}, {init}, {step}, acc -> acc.f)"


def sloppy_freq_batch(
    slots: list[tuple[np.ndarray, np.ndarray, np.ndarray, int]],
    slop: int,
) -> np.ndarray:
    """Lucene sloppy phrase freq for a BATCH of candidate documents at once
    — the physical path's replacement for calling ``sloppy_freq`` in a
    per-candidate Python loop (a hot 3-term phrase has 10^4-10^5
    conjunction candidates per partition; the per-candidate heap sweep
    pays Python bytecode per position, this pays one numpy pass per sweep
    STEP across all still-running candidates).

    ``slots[i] = (flat, starts, lens, offset)`` describes phrase slot i
    over C candidates: candidate c's positions for slot i are
    ``flat[starts[c] : starts[c] + lens[c]]`` (the segment codec's
    flat+starts decode, no per-candidate slicing). Requires DISTINCT-term
    slots (repeated-term phrases keep the per-candidate repeat-group
    path). Returns float64[C] of Σ 1/(1+matchLength) freqs.

    The machine is ``sloppy_freq``'s greedy sweep with every scalar
    promoted to a C-vector and the priority queue replaced by a keyed
    argmin over the n heads (key = position ⊕ query offset ⊕ slot index,
    encoding PhraseQueue.lessThan's tiebreak); each loop iteration
    advances every still-running candidate by exactly one step, so the
    iteration count is max steps over the batch, not the sum."""
    n = len(slots)
    c_n = len(slots[0][1])
    if c_n == 0:
        return np.zeros(0, dtype=np.float64)
    offs = np.asarray([s[3] for s in slots], dtype=np.int64)
    # tiebreak key: (adjusted position, query offset, slot) packed into one
    # int64 — positions dominate, then offset, then slot index
    tie = offs * np.int64(n + 1) + np.arange(n, dtype=np.int64)
    kmul = np.int64(int(tie.max()) + 1)

    h = np.empty((c_n, n), dtype=np.int64)
    lens = np.empty((c_n, n), dtype=np.int64)
    starts = np.empty((c_n, n), dtype=np.int64)
    for i, (flat, st, ln, off) in enumerate(slots):
        starts[:, i] = st
        lens[:, i] = ln
        h[:, i] = flat[st] - off
    ix = np.ones((c_n, n), dtype=np.int64)

    e = h.max(axis=1)
    c = (h * kmul + tie).argmin(axis=1)
    rows_all = np.arange(c_n)
    m = e - h[rows_all, c]
    f = np.zeros(c_n, dtype=np.float64)
    done = (lens == 0).any(axis=1)  # empty slot: no match possible
    f[done] = 0.0

    big = np.iinfo(np.int64).max
    while True:
        rows = np.nonzero(~done)[0]
        if rows.size == 0:
            break
        cc = c[rows]
        exhausted = ix[rows, cc] >= lens[rows, cc]
        ex = rows[exhausted]
        if ex.size:
            mm = m[ex]
            f[ex] += np.where(mm <= slop, 1.0 / (1.0 + mm), 0.0)
            done[ex] = True
        go = rows[~exhausted]
        if go.size == 0:
            continue
        cg = c[go]
        npos = np.empty(go.size, dtype=np.int64)
        for i, (flat, _st, _ln, off) in enumerate(slots):
            sel = cg == i
            if sel.any():
                g = go[sel]
                npos[sel] = flat[starts[g, i] + ix[g, i]] - off
        ix[go, cg] += 1
        # nxt = min position among the OTHER heads (the heap's peek)
        hs = h[go]
        saved = hs[np.arange(go.size), cg]
        hs[np.arange(go.size), cg] = big
        nxt = hs.min(axis=1)
        hs[np.arange(go.size), cg] = saved
        h[go, cg] = npos
        e[go] = np.maximum(e[go], npos)
        reseat = npos > nxt
        tg = go[~reseat]
        if tg.size:
            m[tg] = np.minimum(m[tg], e[tg] - npos[~reseat])
        rs = go[reseat]
        if rs.size:
            mm = m[rs]
            f[rs] += np.where(mm <= slop, 1.0 / (1.0 + mm), 0.0)
            cnew = (h[rs] * kmul + tie).argmin(axis=1)
            c[rs] = cnew
            m[rs] = e[rs] - h[rs, cnew]
    return f
