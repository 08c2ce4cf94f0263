"""SmallFloat quantization: bit-exact vs a struct-based scalar port of the
Java code (SmallFloat.java:78-98)."""

import struct

import numpy as np
import pytest

from lucene_solr_spark.analysis.smallfloat import (
    NORM_TABLE,
    byte315_to_float,
    encode_norm,
    float_to_byte315,
)


def java_float_to_byte315(f: float) -> int:
    bits = struct.unpack(">i", struct.pack(">f", f))[0]
    smallfloat = bits >> 21
    if smallfloat <= ((63 - 15) << 3):
        return 0 if bits <= 0 else 1
    if smallfloat >= ((63 - 15) << 3) + 0x100:
        return 255
    return (smallfloat - ((63 - 15) << 3)) & 0xFF


def java_byte315_to_float(b: int) -> float:
    if b == 0:
        return 0.0
    bits = (b & 0xFF) << 21
    bits += (63 - 15) << 24
    return struct.unpack(">f", struct.pack(">i", bits))[0]


def test_roundtrip_table():
    for b in range(256):
        f = java_byte315_to_float(b)
        assert byte315_to_float(np.array([b], dtype=np.uint8))[0] == np.float32(f)


@pytest.mark.parametrize(
    "val",
    [0.0, -1.0, 1e-12, 5.820766e-10, 0.1, 0.5, 1.0, 1.5, 2.0, 100.0, 7.5e9, 1e12, float("inf")],
)
def test_float_to_byte315_scalar(val):
    got = int(float_to_byte315(np.array([val], dtype=np.float32))[0])
    assert got == java_float_to_byte315(np.float32(val))


def test_float_to_byte315_sweep():
    rng = np.random.default_rng(42)
    vals = np.concatenate(
        [
            rng.uniform(0, 2, 1000),
            rng.uniform(0, 1e10, 1000),
            10.0 ** rng.uniform(-12, 11, 1000),
        ]
    ).astype(np.float32)
    got = float_to_byte315(vals)
    for v, g in zip(vals.tolist(), got.tolist()):
        assert g == java_float_to_byte315(v), v


def test_norm_table_matches_java():
    # NORM_TABLE[i] = 1f/(f*f), table[0] = 1/table[255] (BM25Similarity.java:135-143)
    for i in range(1, 256):
        f = np.float32(java_byte315_to_float(i))
        assert NORM_TABLE[i] == np.float32(1.0) / (f * f)
    assert NORM_TABLE[0] == np.float32(1.0) / NORM_TABLE[255]


def test_encode_norm_zero_length_is_255():
    # fieldLen 0 -> 1/sqrt(0) = +inf -> overflow byte 255
    assert encode_norm(np.array([0]))[0] == 255
    # typical lengths
    assert encode_norm(np.array([1]))[0] == java_float_to_byte315(1.0)
    for n in [1, 2, 3, 7, 100, 255, 10000]:
        expect = java_float_to_byte315(np.float32(1.0) / np.float32(np.sqrt(float(n))))
        assert encode_norm(np.array([n]))[0] == expect
