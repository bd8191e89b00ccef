"""Posting-list codec round-trip + block metadata properties."""

from __future__ import annotations

import numpy as np
import pytest

from solr_spark.index.codec import (
    BLOCK_SIZE,
    decode_blocks,
    decode_postings,
    encode_postings,
    vb_decode,
    vb_encode,
)


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 1000, 4999])
def test_roundtrip(n):
    rng = np.random.default_rng(n)
    ords = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 300, size=n).astype(np.int64)
    norms = rng.integers(0, 256, size=n).astype(np.uint8)
    enc = encode_postings(ords, tfs, norms)
    o2, t2 = decode_postings(enc.gaps, enc.tfs)
    assert np.array_equal(o2, ords)
    assert np.array_equal(t2, tfs)
    assert enc.df == n
    assert enc.ttf == tfs.sum()


def test_partial_block_decode():
    rng = np.random.default_rng(0)
    n = 1500
    ords = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    norms = rng.integers(0, 256, size=n).astype(np.uint8)
    enc = encode_postings(ords, tfs, norms)
    nb = enc.block_first_ord.size
    assert nb == (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    sel = np.array([0, 3, nb - 1])
    o, t = decode_blocks(
        enc.gaps, enc.tfs, sel, enc.block_first_ord,
        enc.block_gap_off, enc.block_tf_off, enc.df,
    )
    expect_o = np.concatenate(
        [ords[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE] for b in sel]
    )
    assert np.array_equal(o, expect_o)
    # Block bounds are what they claim.
    for b in range(nb):
        lo, hi = b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, n)
        assert enc.block_max_tf[b] == tfs[lo:hi].max()
        assert enc.block_min_norm[b] == norms[lo:hi].min()
        assert enc.block_first_ord[b] == ords[lo]
        assert enc.block_last_ord[b] == ords[hi - 1]


def test_varbyte_extremes():
    vals = np.array([0, 1, 127, 128, 2**32, 2**62, 2**63 - 1], dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(vals)), vals)
    assert vb_encode(np.empty(0, dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


def test_positions_roundtrip():
    import numpy as np

    from solr_spark.index.codec import (
        BLOCK_SIZE,
        decode_positions,
        decode_postings,
        encode_postings,
        vb_decode,
    )

    rng = np.random.default_rng(7)
    n = 1000
    ords = np.sort(rng.choice(100000, n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 6, n).astype(np.int64)
    norms = rng.integers(0, 256, n).astype(np.uint8)
    pls = [np.sort(rng.choice(500, int(t), replace=False)).astype(np.int64)
           for t in tfs]
    flat = np.concatenate(pls)
    enc = encode_postings(ords, tfs, norms, positions=flat)
    o2, t2 = decode_postings(enc.gaps, enc.tfs)
    f2, starts = decode_positions(enc.poss, t2)
    assert (f2 == flat).all()
    for i in (0, 1, 57, n - 1):
        assert (f2[starts[i]:starts[i] + tfs[i]] == pls[i]).all()
    # block offsets let a block's positions decode without predecessors
    bi = 3
    s, e = int(enc.block_pos_off[bi]), int(enc.block_pos_off[bi + 1])
    gaps_blk = vb_decode(enc.poss[s:e])
    assert gaps_blk.size == tfs[bi * BLOCK_SIZE:(bi + 1) * BLOCK_SIZE].sum()
    first = np.cumsum(gaps_blk.astype(np.int64))[: int(tfs[bi * BLOCK_SIZE])]
    assert (first == pls[bi * BLOCK_SIZE]).all()
