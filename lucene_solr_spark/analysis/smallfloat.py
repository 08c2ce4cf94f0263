"""Bit-exact port of Lucene's SmallFloat 3-bit-mantissa norm quantization.

Reference behavior: lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:78-98
(floatToByte315 / byte315ToFloat) and the BM25 decode table
lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java:135-143.

All functions are vectorized numpy; scalar floats go through np.float32 so the
quantization is identical to Java float semantics (truncating, not rounding).
"""

from __future__ import annotations

import numpy as np

_FZERO = (63 - 15) << 3  # 384


def float_to_byte315(f: np.ndarray) -> np.ndarray:
    """floatToByte315: float32 -> uint8 (3 mantissa bits, zero exp 15, truncating).

    Negative/zero -> 0; underflow -> 1; overflow (incl. +inf) -> 255.
    """
    f32 = np.asarray(f, dtype=np.float32)
    bits = f32.view(np.int32)
    smallfloat = bits >> 21  # 24 - 3 mantissa bits
    out = (smallfloat - _FZERO).astype(np.int32)
    out = np.where(smallfloat <= _FZERO, np.where(bits <= 0, 0, 1), out)
    out = np.where(smallfloat >= _FZERO + 0x100, 255, out)
    return out.astype(np.uint8)


def byte315_to_float(b: np.ndarray) -> np.ndarray:
    """byte315ToFloat: uint8 -> float32. byte 0 -> 0.0f."""
    b = np.asarray(b, dtype=np.uint8)
    bits = (b.astype(np.int32) << 21) + (np.int32((63 - 15)) << 24)
    out = bits.astype(np.int32).view(np.float32)
    return np.where(b == 0, np.float32(0.0), out).astype(np.float32)


def _build_norm_table() -> np.ndarray:
    """BM25Similarity.NORM_TABLE: table[i] = 1/f^2, f = byte315ToFloat(i);
    table[0] = 1/table[255] ('otherwise inf')."""
    idx = np.arange(256, dtype=np.uint8)
    f = byte315_to_float(idx)
    with np.errstate(divide="ignore"):
        table = (np.float32(1.0) / (f * f)).astype(np.float32)
    table[0] = np.float32(1.0) / table[255]
    return table


NORM_TABLE: np.ndarray = _build_norm_table()


def encode_norm(field_len: np.ndarray) -> np.ndarray:
    """BM25Similarity.encodeNormValue(boost=1, fieldLength):
    floatToByte315(1f / (float) Math.sqrt(fieldLength)).

    fieldLength == 0 -> 1/0f = +inf -> byte 255 (matches Java exactly).
    """
    fl = np.asarray(field_len, dtype=np.float64)
    with np.errstate(divide="ignore"):
        v = (np.float32(1.0) / np.sqrt(fl).astype(np.float32)).astype(np.float32)
    return float_to_byte315(v)


#: SweetSpotSimilarity demo parameters (setLengthNormFactors): the
#: plateau of "equally good" field lengths. Recorded in the index
#: manifest under norm='sweetspot'.
SWEETSPOT_LN_MIN = 3
SWEETSPOT_LN_MAX = 10
SWEETSPOT_LN_STEEP = 0.5


def sweetspot_encode_norm(
    field_len: np.ndarray,
    ln_min: int = SWEETSPOT_LN_MIN,
    ln_max: int = SWEETSPOT_LN_MAX,
    steep: float = SWEETSPOT_LN_STEEP,
) -> np.ndarray:
    """SweetSpotSimilarity.computeLengthNorm + encodeNormValue
    (lucene/misc/src/java/org/apache/lucene/misc/SweetSpotSimilarity.java:136-152):
    (float)(1.0f / sqrt(s * (float)(|x-l| + |x-h| - (h-l)) + 1.0f)) — the
    abs sum is INT arithmetic cast to float, the multiply/add are
    float32, the sqrt is double, one final cast to float — then
    floatToByte315 (TFIDFSimilarity.encodeNormValue). Index-time: this
    IS the norm byte written when the writer's similarity is SweetSpot."""
    x = np.asarray(field_len, dtype=np.int64)
    intpart = (np.abs(x - ln_min) + np.abs(x - ln_max) - (ln_max - ln_min)).astype(
        np.float32
    )
    inner = (np.float32(steep) * intpart + np.float32(1.0)).astype(np.float32)
    v = (
        np.float64(1.0) / np.sqrt(inner.astype(np.float64))
    ).astype(np.float32)
    return float_to_byte315(v)


#: IndexWriterConfig.setSimilarity norm plug: similarity name -> the
#: index-time norm-byte encoder (TFIDFSimilarity.computeNorm). 'bm25'
#: doubles for every search-time model that shares the 1/sqrt(len)
#: encoding (classic / LM / DFR / IB / DFI in this reference version).
NORM_ENCODERS = {
    "bm25": encode_norm,
    "sweetspot": sweetspot_encode_norm,
}
