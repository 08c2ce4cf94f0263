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


def test_for_encode_roundtrip_and_dispatch():
    """ForUtil-analog fixed-width blocks: roundtrip via both the direct
    decoder and the legacy vbyte_decode/vbyte_decode_batch reader path
    (headers coexist in one index)."""
    import numpy as np

    from lucene_solr_spark.index.codec import (
        block_decode_batch,
        block_encode_batch,
        for_encode,
        vbyte_decode,
        vbyte_decode_batch,
        vbyte_encode_batch,
    )

    rng = np.random.default_rng(11)
    for _ in range(100):
        n = int(rng.integers(1, 300))
        hi = int(rng.choice([2, 16, 2**10, 2**30, 2**62]))
        v = rng.integers(0, hi, size=n).astype(np.uint64)
        assert (vbyte_decode(for_encode(v)) == v).all()

    sizes = [128, 128, 1, 0, 5, 128, 300, 128, 2, 128]
    vals, bounds = [], [0]
    for i, s in enumerate(sizes):
        if s == 128 and i % 3 == 0:
            g = np.full(128, 9, dtype=np.uint64)  # ALLEQ stays smaller
        else:
            g = rng.integers(0, 2 ** int(rng.integers(1, 40)), size=s).astype(np.uint64)
        vals.append(g)
        bounds.append(bounds[-1] + s)
    v = np.concatenate(vals)
    bufs = block_encode_batch(v, np.array(bounds))
    for got in (block_decode_batch(bufs), vbyte_decode_batch(bufs)):
        for g, d in zip(vals, got):
            assert (np.asarray(d) == g).all()

    # full non-equal blocks actually use the FOR header and beat vbyte
    small = rng.integers(1, 128, size=128).astype(np.uint64)
    fo = block_encode_batch(small, np.array([0, 128]))[0]
    vb = vbyte_encode_batch(small, np.array([0, 128]))[0]
    assert fo[0] == 2 and len(fo) < len(vb)


def test_pfor_patches_outlier_blocks():
    """PForDelta exception patching: full blocks whose delta distribution
    has a few huge gaps pack at a small width + patch list, beating both
    plain FoR (644B -> ~131B on a 5-outlier block) and vbyte; uniform
    blocks stay FoR. Every decode path roundtrips all headers."""
    import numpy as np

    from lucene_solr_spark.index.codec import (
        block_decode_batch,
        block_encode_batch,
        for_encode,
        vbyte_decode,
        vbyte_decode_batch,
    )

    rng = np.random.default_rng(3)
    blocks = []
    for _ in range(40):
        b = rng.integers(1, 64, size=128).astype(np.uint64)
        pos = rng.choice(128, size=int(rng.integers(1, 6)), replace=False)
        b[pos] = rng.integers(2**20, 2**40, size=pos.size).astype(np.uint64)
        blocks.append(b)
    blocks.append(rng.integers(1, 64, size=128).astype(np.uint64))  # no outliers
    v = np.concatenate(blocks)
    bounds = np.concatenate(([0], np.cumsum([len(b) for b in blocks])))
    bufs = block_encode_batch(v, bounds)
    assert bufs[0][0] == 3  # outlier block -> PFOR header
    assert len(bufs[0]) < len(for_encode(blocks[0]))
    for dec in (block_decode_batch(bufs), vbyte_decode_batch(bufs),
                [vbyte_decode(b) for b in bufs]):
        for g, d in zip(blocks, dec):
            assert (np.asarray(d) == g).all()
