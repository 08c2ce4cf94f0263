"""Payload family: pay_buf stream through build/merge/compaction, and
PayloadScoreQuery / SpanPayloadCheckQuery rank+float32-score identity
between the Spark engine and the payload control oracle (which
tests/test_lucene_ground_truth.py pins to the compiled reference)."""

import os
import random

import numpy as np
import pytest

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.engine import IndexSearcher
from lucene_solr_spark.search.payloads import (
    PayloadOracleIndex,
    payload_topk,
    span_payload_check_topk,
    span_match_positions,
)

VOCAB = ["a", "b", "c", "d"]
PAYS = [None, 0.25, 0.5, 1.5, 2.0, 4.0, 8.0]


def _random_docs(rng, n_docs):
    docs = []
    for _ in range(n_docs):
        toks = []
        for _ in range(rng.randint(2, 18)):
            t = rng.choice(VOCAB)
            p = rng.choice(PAYS)
            toks.append(t if p is None else f"{t}|{p}")
        docs.append(" ".join(toks))
    return docs


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    rng = random.Random(515151)
    docs = _random_docs(rng, 40)
    d = os.path.join(tmp_root, "idx_payload")
    src = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, content string"
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=16, fingerprint="payload-t1",
        analyzer="wspayload",
    )
    return IndexSearcher(spark, d), PayloadOracleIndex(list(enumerate(docs)))


def _assert_identical(got, expected, ctx):
    exp = [(int(d), np.float32(s)) for d, s in expected]
    assert [(int(d), np.float32(s)) for d, s in got] == exp, (ctx, got, exp)


SCORE_CASES = [
    (["a"], "avg", True, 0, True),
    (["a"], "min", True, 0, True),
    (["a"], "max", False, 0, True),
    (["a", "b"], "avg", True, 0, True),
    (["a", "b"], "avg", True, 2, True),
    (["a", "b"], "max", True, 2, False),
    (["a", "b"], "min", False, 1, False),
    (["a", "b", "c"], "avg", True, 3, True),
    (["a", "a"], "max", True, 4, True),  # repeated clause term
]


@pytest.mark.parametrize(
    "terms,fn,inc,slop,ordered", SCORE_CASES,
    ids=["-".join(c[0]) + f"-{c[1]}-{int(c[2])}-{c[3]}-{int(c[4])}" for c in SCORE_CASES],
)
def test_payload_score_rank_identity(built, terms, fn, inc, slop, ordered):
    searcher, oidx = built
    expected = payload_topk(
        oidx, terms, fn, include_span_score=inc, slop=slop, ordered=ordered
    )
    got = [
        (r["doc_id"], r["score"])
        for r in searcher.topk_payload_score(
            terms, fn, include_span_score=inc, slop=slop, ordered=ordered
        ).collect()
    ]
    _assert_identical(got, expected, (terms, fn, inc, slop, ordered))


CHECK_CASES = [
    (["a"], [0.25], 0),
    (["a"], [None], 0),
    (["a", "b"], [0.5, 1.5], 1),
    (["a", "b"], [0.25, None], 2),
]


@pytest.mark.parametrize("terms,pays,slop", CHECK_CASES)
def test_span_payload_check_rank_identity(built, terms, pays, slop):
    searcher, oidx = built
    expected = span_payload_check_topk(oidx, terms, pays, slop=slop)
    got = [
        (r["doc_id"], r["score"])
        for r in searcher.topk_span_payload_check(terms, pays, slop=slop).collect()
    ]
    _assert_identical(got, expected, (terms, pays, slop))


def test_span_match_positions_agrees_with_span_freqs():
    """The position-yielding walks must compute the same freq as the
    verified span machines (search/spans.py) on random inputs."""
    from lucene_solr_spark.search.spans import (
        span_ordered_freq,
        span_unordered_freq,
    )

    rng = random.Random(90913)
    for _ in range(300):
        n = rng.randint(1, 3)
        plists = [
            sorted(rng.sample(range(0, 30), rng.randint(1, 8))) for _ in range(n)
        ]
        slop = rng.randint(0, 6)
        for ordered, ref in ((True, span_ordered_freq), (False, span_unordered_freq)):
            freq = np.float32(0.0)
            for width, idxs in span_match_positions(plists, slop, ordered):
                assert len(idxs) == n
                # the yielded indices are real positions of each clause
                for i, j in enumerate(idxs):
                    assert 0 <= j < len(plists[i])
                freq = np.float32(freq + np.float32(1.0) / np.float32(width + 1))
            assert freq == ref(plists, slop), (plists, slop, ordered)


def test_payload_stream_survives_compaction(spark, tmp_root, built):
    """compact_index re-merges blocks; payloads must ride the position
    gathers untouched (query results identical pre/post)."""
    from lucene_solr_spark.index.compact import compact_index

    searcher, oidx = built
    before = [
        (r["doc_id"], r["score"])
        for r in searcher.topk_payload_score(["a", "b"], "avg", slop=2).collect()
    ]
    # tiered=False forces every block through the re-merge (a fresh
    # single-generation index would otherwise pass through untouched)
    compact_index(spark, searcher.paths.root, tiered=False)
    s2 = IndexSearcher(spark, searcher.paths.root)
    after = [
        (r["doc_id"], r["score"])
        for r in s2.topk_payload_score(["a", "b"], "avg", slop=2).collect()
    ]
    assert before == after and before


@pytest.mark.parametrize("boost", [0.4, 1.0, 2.5])
def test_payload_boost_identity(spark, built, boost):
    """SpanBoostQuery(PayloadScoreQuery, boost) — the XML
    BoostingTermBuilder shape: boost folds into the span weight
    (weight = idf * boost in f32, BM25Similarity.java:296) and scales
    the span leg only; engine == oracle bit-for-bit, and the raw path
    (verbatim SpanTermQuery term, no analysis) agrees."""
    stale, oidx = built
    # the compaction test above rewrote the postings in place — reopen
    # (a real reader would too; the stale searcher's file listing is
    # from the pre-compaction generation)
    searcher = IndexSearcher(spark, stale.paths.root)
    expected = payload_topk(
        oidx, ["a"], "avg", include_span_score=True, boost=boost
    )
    got = [
        (r["doc_id"], r["score"])
        for r in searcher.topk_payload_score(
            ["a"], "avg", include_span_score=True, boost=boost, raw=True
        ).collect()
    ]
    _assert_identical(got, expected, ("boost", boost))
    # through the XML element end-to-end
    got_xml = [
        (r["doc_id"], r["score"])
        for r in searcher.topk_xml(
            f'<BoostingTermQuery fieldName="content" boost="{boost}">a'
            "</BoostingTermQuery>", content_field="content"
        ).collect()
    ]
    _assert_identical(got_xml, expected, ("boost-xml", boost))
