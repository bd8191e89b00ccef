"""Lucene SmallFloat int4 norm quantization.

Lucene stores the per-document field length as ONE lossy byte
(``SmallFloat.intToByte4`` on write, ``byte4ToInt`` on read — public Lucene
9 source; the BM25 ``dl`` term is the decoded, quantized value). Solr parity
therefore requires scoring with the quantized length, not the exact token
count (SURVEY.md §1.5). Re-implemented here from the public algorithm:
values < (255 - max4) pass through; larger values keep a 4-bit mantissa.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType


def _long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("only non-negative lengths")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    # Keep the 4 MSBs, clear the implicit leading 1, encode the shift
    # (+1: shift code 0 is reserved for subnormal values).
    encoded = (i >> shift) & 0x07
    encoded |= (shift + 1) << 3
    return encoded


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4(2**31 - 1)
_NUM_FREE_VALUES = 255 - _MAX_INT4


def int_to_byte4(i: int) -> int:
    """Encode a length into an unsigned byte 0..255 (Lucene intToByte4)."""
    if i < _NUM_FREE_VALUES:
        return i
    return _NUM_FREE_VALUES + _long_to_int4(i - _NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode the unsigned norm byte back to the quantized length."""
    if b < _NUM_FREE_VALUES:
        return b
    return _NUM_FREE_VALUES + _int4_to_long(b - _NUM_FREE_VALUES)


def quantize_length(i: int) -> int:
    """dl as BM25 sees it: encode + decode round trip."""
    return byte4_to_int(int_to_byte4(i))


# Precomputed decode table: norm byte -> quantized length (256 entries), and
# a vectorized encoder for numpy arrays (used inside Arrow UDFs).
DECODE_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)
_BOUNDARIES = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)


def norm_byte_array(lengths: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4: exact length -> norm byte (uint8)."""
    idx = np.searchsorted(_BOUNDARIES, lengths, side="right") - 1
    return idx.astype(np.uint8)


def quantize_array(lengths: np.ndarray) -> np.ndarray:
    """Vectorized quantize_length over an int array."""
    # intToByte4 is monotone non-decreasing, so searchsorted against the
    # decoded boundaries reproduces encode+decode exactly.
    idx = np.searchsorted(_BOUNDARIES, lengths, side="right") - 1
    return DECODE_TABLE[idx]


def quantize_doclen(colname: str = "dl"):
    """pandas UDF: exact length -> quantized length (int)."""

    @F.pandas_udf(IntegerType())
    def _q(col: pd.Series) -> pd.Series:
        return pd.Series(quantize_array(col.to_numpy(dtype=np.int64)).astype(np.int32))

    return _q(F.col(colname))
