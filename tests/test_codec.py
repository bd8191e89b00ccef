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


def test_property_full_codec_roundtrip():
    """Hypothesis sweep over the whole encode/decode surface: arbitrary
    posting-list shapes (gap extremes, block-boundary sizes, tf spreads)
    round-trip postings + positions + payloads exactly, and every block's
    impact metadata matches a brute-force recomputation. Complements the
    fixed-seed tests above with generated edge shapes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from solr_spark.index.codec import decode_payloads, decode_positions

    @settings(max_examples=30, deadline=None)
    @given(
        gaps=st.lists(
            st.integers(min_value=1, max_value=2**40), min_size=1, max_size=300
        ),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        max_tf=st.integers(min_value=1, max_value=40),
    )
    def check(gaps, seed, max_tf):
        rng = np.random.default_rng(seed)
        ords = np.cumsum(np.asarray(gaps, dtype=np.int64)) - 1
        n = ords.size
        tfs = rng.integers(1, max_tf + 1, size=n).astype(np.int64)
        norms = rng.integers(0, 256, size=n).astype(np.uint8)
        pls = [
            np.sort(rng.choice(10**6, int(t), replace=False)).astype(np.int64)
            for t in tfs
        ]
        flat_pos = np.concatenate(pls)
        pays = rng.standard_normal(flat_pos.size).astype(np.float32)

        enc = encode_postings(ords, tfs, norms, positions=flat_pos,
                              payloads=pays)
        o2, t2 = decode_postings(enc.gaps, enc.tfs)
        assert np.array_equal(o2, ords) and np.array_equal(t2, tfs)
        assert enc.df == n and enc.ttf == tfs.sum()

        f2, starts = decode_positions(enc.poss, t2)
        assert np.array_equal(f2, flat_pos)
        p2, pstarts = decode_payloads(enc.pays, t2)
        assert np.array_equal(p2, pays) and np.array_equal(pstarts, starts)

        nb = enc.block_first_ord.size
        assert nb == (n + BLOCK_SIZE - 1) // BLOCK_SIZE
        for b in range(nb):
            lo, hi = b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, n)
            assert enc.block_max_tf[b] == tfs[lo:hi].max()
            assert enc.block_min_norm[b] == norms[lo:hi].min()
            assert enc.block_first_ord[b] == ords[lo]
            assert enc.block_last_ord[b] == ords[hi - 1]
        # Every block decodes standalone through its byte offsets.
        sel = np.arange(nb, dtype=np.int64)
        ob, tb = decode_blocks(
            enc.gaps, enc.tfs, sel, enc.block_first_ord,
            enc.block_gap_off, enc.block_tf_off, enc.df,
        )
        assert np.array_equal(ob, ords) and np.array_equal(tb, tfs)

    check()


def test_property_varbyte_roundtrip():
    """Hypothesis sweep of the variable-byte primitive across the full
    uint64 range, including 0, byte-length boundaries, and 2**63+."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        vals=st.lists(
            st.one_of(
                st.integers(min_value=0, max_value=2**64 - 1),
                st.sampled_from(
                    [0, 1, 127, 128, 16383, 16384, 2**32 - 1, 2**32,
                     2**63 - 1, 2**63, 2**64 - 1]
                ),
            ),
            max_size=200,
        )
    )
    def check(vals):
        arr = np.asarray(vals, dtype=np.uint64)
        assert np.array_equal(vb_decode(vb_encode(arr)), arr)

    check()


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
