"""Posting codec contract tests (BasePostingsFormatTestCase analog,
FIXTURES.md §5): encode->decode identity across sizes and shapes."""

import numpy as np
import pytest

from lucene_solr_spark.index.codec import (
    decode_doc_block,
    delta_decode,
    delta_encode,
    encode_doc_block,
    vbyte_decode,
    vbyte_encode,
)


@pytest.mark.parametrize("n", [0, 1, 2, 127, 128, 129, 1000])
def test_vbyte_roundtrip_sizes(n):
    rng = np.random.default_rng(n)
    vals = rng.integers(0, 2**32, n, dtype=np.uint64)
    assert np.array_equal(vbyte_decode(vbyte_encode(vals)), vals)


def test_vbyte_large_values():
    vals = np.array([0, 1, 127, 128, 2**14 - 1, 2**14, 2**31, 2**63 - 1, 2**64 - 1], dtype=np.uint64)
    assert np.array_equal(vbyte_decode(vbyte_encode(vals)), vals)


def test_all_equal_block_optimization():
    vals = np.full(128, 7, dtype=np.uint64)
    enc = vbyte_encode(vals)
    assert len(enc) <= 4  # header + vbyte(128) + vbyte(7)
    assert np.array_equal(vbyte_decode(enc), vals)


def test_delta_roundtrip():
    rng = np.random.default_rng(7)
    docs = np.cumsum(rng.integers(1, 50, 500)).astype(np.uint64)
    deltas = delta_encode(docs)
    assert deltas[0] == 0
    assert (deltas[1:] >= 1).all()  # strictly ascending docIDs
    assert np.array_equal(delta_decode(deltas, int(docs[0])), docs)


@pytest.mark.parametrize("seed", range(5))
def test_doc_block_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 300))
    docs = (np.cumsum(rng.integers(1, 100, n)) + 12345).astype(np.uint64)
    buf = encode_doc_block(docs)
    assert np.array_equal(decode_doc_block(buf, int(docs[0])), docs)


def test_singleton_doc():
    docs = np.array([42], dtype=np.uint64)
    assert np.array_equal(decode_doc_block(encode_doc_block(docs), 42), docs)
