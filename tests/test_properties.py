"""Property-based tests (LuceneTestCase randomization analog, SURVEY §5):
codec roundtrips, batch/scalar codec equivalence, and analysis-chain
equivalences over arbitrary inputs. Pure-Python/numpy — no Spark session."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.analysis.smallfloat import NORM_TABLE, encode_norm
from lucene_solr_spark.analysis.tokenizer import (
    ENGLISH_STOP_WORDS,
    analyze,
    analyze_with_positions,
    token_table,
    tokenize,
)
from lucene_solr_spark.index.codec import (
    decode_doc_block,
    encode_doc_block,
    vbyte_decode,
    vbyte_decode_batch,
    vbyte_encode,
    vbyte_encode_batch,
)

uints = st.integers(min_value=0, max_value=(1 << 63) - 1)


@given(st.lists(uints, max_size=300))
@settings(max_examples=200, deadline=None)
def test_vbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(vbyte_decode(vbyte_encode(arr)), arr)


@given(st.lists(st.lists(uints, max_size=60), max_size=40))
@settings(max_examples=100, deadline=None)
def test_batch_codec_equals_scalar(groups):
    arrs = [np.array(g, dtype=np.uint64) for g in groups]
    vals = np.concatenate(arrs) if arrs else np.array([], dtype=np.uint64)
    bounds = np.concatenate(([0], np.cumsum([a.size for a in arrs]))).astype(np.int64)
    batch = vbyte_encode_batch(vals, bounds)
    assert batch == [vbyte_encode(a) for a in arrs]
    decoded = vbyte_decode_batch(batch)
    for a, d in zip(arrs, decoded):
        assert np.array_equal(a, d)


@given(st.lists(st.integers(min_value=0, max_value=1 << 40), min_size=1, max_size=200, unique=True))
@settings(max_examples=150, deadline=None)
def test_doc_block_roundtrip(doc_ids):
    d = np.array(sorted(doc_ids), dtype=np.uint64)
    assert np.array_equal(decode_doc_block(encode_doc_block(d), int(d[0])), d.astype(np.uint64))


@given(st.integers(min_value=0, max_value=1 << 30))
@settings(max_examples=300, deadline=None)
def test_norm_decode_monotone(flen):
    """floatToByte315 of 1/sqrt(len): the decoded table value 1/f² is ~len,
    so it is monotone non-decreasing in field length."""
    b = int(encode_norm(np.array([flen]))[0])
    assert 0 <= b <= 255
    if flen > 0:
        b2 = int(encode_norm(np.array([flen + 1]))[0])
        assert NORM_TABLE[b2] >= NORM_TABLE[b] or b == b2


text_strategy = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)), max_size=400
)


@given(text_strategy)
@settings(max_examples=300, deadline=None)
def test_analyze_is_lowered_stop_filtered_tokenize(text):
    toks = analyze(text)
    assert all(t == t.lower() or "İ" in text for t in toks)
    assert all(t not in ENGLISH_STOP_WORDS for t in toks)
    # field_len from positions API == len(analyze)
    pos_map, flen = analyze_with_positions(text)
    assert flen == len(toks)
    assert sorted(p for ps in pos_map.values() for p in ps) == sorted(
        set(p for ps in pos_map.values() for p in ps)
    )  # positions unique


@given(st.lists(text_strategy, max_size=20))
@settings(max_examples=100, deadline=None)
def test_token_table_matches_reference_path(texts):
    """The vectorized batch analyzer is exactly the per-doc chain."""
    table = token_table(texts)
    got = [dict() for _ in texts]
    if table is not None:
        uniq, codes, drep, pos, flens = table
        for c, d, p in zip(codes.tolist(), drep.tolist(), pos.tolist()):
            got[d].setdefault(uniq[c], []).append(p)
    else:
        flens = np.zeros(len(texts), dtype=np.int32)
    for i, t in enumerate(texts):
        exp, fl = analyze_with_positions(t)
        assert int(flens[i]) == fl
        assert {k: sorted(v) for k, v in got[i].items()} == exp
