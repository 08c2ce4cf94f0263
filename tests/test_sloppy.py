"""Lucene-exact sloppy phrase scoring (SloppyPhraseScorer.java:95-133,
PhraseQueue.java:28-40, BM25Similarity.sloppyFreq:77-79).

Three layers:
 1. state-machine unit cases with hand-derived expectations (the
    documented examples from SloppyPhraseScorer's own javadoc);
 2. hypothesis property: the two-term vectorized closed form
    (merged-order adjacent cross-clause pairs) is float32-IDENTICAL to
    the state machine on random position lists;
 3. end-to-end: the Spark engine's sloppy top-k is rank- and
    score-identical to the control oracle on a positions-rich corpus.

No JVM needed for 1-2.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.search.sloppy import sloppy_freq, sloppy_freq_chain2


def f(x):
    return np.float32(x)


class TestStateMachine:
    def test_exact_adjacent(self):
        # "a b" over doc "a b": distance 0 -> 1/(0+1)
        assert sloppy_freq([[0], [1]], [0, 1], 0) == f(1.0)

    def test_reversed_needs_slop_2(self):
        # SloppyPhraseScorer javadoc: "for query 'a b'~2, a document
        # 'x a b a y' can be scored twice: once for 'a b' (distance=0),
        # and once for 'b a' (distance=2)"
        a_pos, b_pos = [1, 3], [2]
        assert sloppy_freq([a_pos, b_pos], [0, 1], 2) == f(1.0 + 1.0 / 3.0)
        # with slop 0 only the exact match counts
        assert sloppy_freq([a_pos, b_pos], [0, 1], 0) == f(1.0)

    def test_reversed_pair_alone(self):
        # doc "b a", query "a b": adjusted a@1, b@-1 -> distance 2
        assert sloppy_freq([[1], [0]], [0, 1], 1) == f(0.0)
        assert sloppy_freq([[1], [0]], [0, 1], 2) == f(1.0 / 3.0)

    def test_gap(self):
        # doc "foo x x baz", query "foo baz": adjusted foo@0, baz@2 -> d=2
        assert sloppy_freq([[0], [3]], [0, 1], 1) == f(0.0)
        assert sloppy_freq([[0], [3]], [0, 1], 2) == f(1.0 / 3.0)

    def test_three_clause(self):
        # doc "a b c": exact order, all adjacent -> one zero-length match
        assert sloppy_freq([[0], [1], [2]], [0, 1, 2], 0) == f(1.0)
        # doc "a c b" (b and c swapped): needs slop 2
        assert sloppy_freq([[0], [2], [1]], [0, 1, 2], 0) == f(0.0)
        assert sloppy_freq([[0], [2], [1]], [0, 1, 2], 2) == f(1.0 / 3.0)

    def test_single_clause(self):
        assert sloppy_freq([[3, 9]], [0], 2) == f(2.0)

    def test_empty(self):
        assert sloppy_freq([[1], []], [0, 1], 3) == f(0.0)


@st.composite
def two_term_case(draw):
    a = draw(st.lists(st.integers(0, 40), min_size=1, max_size=12, unique=True))
    b = draw(st.lists(st.integers(0, 40), min_size=1, max_size=12, unique=True))
    off_a = draw(st.integers(0, 3))
    off_b = draw(st.integers(0, 3).filter(lambda x: x != off_a))
    slop = draw(st.integers(0, 8))
    return sorted(a), sorted(b), off_a, off_b, slop


@settings(max_examples=600, deadline=None)
@given(two_term_case())
def test_two_term_chain_equals_state_machine(case):
    """The leapfrog-chain closed form (= the SQL oracle's recursive CTE
    algorithm) must be float32-identical to the state machine, including
    tie cases where adjusted keys collide."""
    a, b, off_a, off_b, slop = case
    expect = sloppy_freq([a, b], [off_a, off_b], slop)
    got = sloppy_freq_chain2(a, b, off_a, off_b, slop)
    assert isinstance(got, np.float32)
    assert got == expect


def _doc_freq(doc_text: str, query_text: str, slop: int) -> np.float32:
    """checkPhraseQuery harness over sloppy_freq: whitespace tokens
    (MockTokenizer.WHITESPACE), consecutive query positions."""
    positions: dict = {}
    for i, t in enumerate(doc_text.split()):
        positions.setdefault(t, []).append(i)
    qterms = query_text.split()
    plists = [positions.get(t, []) for t in qterms]
    return sloppy_freq(plists, list(range(len(qterms))), slop, terms=qterms)


# the reference's own sloppy corpus (TestSloppyPhraseQuery.java:38-55)
S_1 = "A A A"
S_2 = "A 1 2 3 A 4 5 6 A"
DOC_1 = "X " + S_1 + " Y"
DOC_2 = "X " + S_2 + " Y"
DOC_3 = "X " + S_1 + " A Y"
DOC_1_B = "X " + S_1 + " Y N N N N " + S_1 + " Z"
DOC_2_B = "X " + S_2 + " Y N N N N " + S_2 + " Z"
DOC_3_B = "X " + S_1 + " A Y N N N N " + S_1 + " A Y"
DOC_4 = "A A X A X B A X B B A A X B A A"
DOC_5_3 = "H H H X X X H H H X X X H H H"
DOC_5_4 = "H H H H"


class TestReferenceSloppyCases:
    """Direct ports of TestSloppyPhraseQuery's repeat-heavy expectations
    (hit / no-hit per slop, and the doubled docs must score higher)."""

    def test_doc4_query4_all_slops(self):
        # "QUERY_4 has a fuzzy (len=1) match to DOC_4, so all slop
        # values > 0 should succeed" (testDoc4_Query4, line 61)
        for slop in range(30):
            freq = _doc_freq(DOC_4, "X A A", slop)
            assert (freq > 0) == (slop >= 1), (slop, freq)

    def test_doc1_query1_all_slops(self):
        for slop in range(30):
            f1 = _doc_freq(DOC_1, S_1, slop)
            f2 = _doc_freq(DOC_1_B, S_1, slop)
            assert f1 > 0 and f2 > f1, (slop, f1, f2)

    def test_doc2_query1_slop6_or_more(self):
        # "6 should be the minimum slop to make QUERY_1 match DOC_2"
        for slop in range(30):
            f1 = _doc_freq(DOC_2, S_1, slop)
            assert (f1 > 0) == (slop >= 6), (slop, f1)
            if slop >= 6:
                assert _doc_freq(DOC_2_B, S_1, slop) > f1

    def test_doc2_query2_all_slops(self):
        for slop in range(30):
            f1 = _doc_freq(DOC_2, S_2, slop)
            f2 = _doc_freq(DOC_2_B, S_2, slop)
            assert f1 > 0 and f2 > f1, (slop, f1, f2)

    def test_doc3_query1_all_slops(self):
        for slop in range(30):
            f1 = _doc_freq(DOC_3, S_1, slop)
            f2 = _doc_freq(DOC_3_B, S_1, slop)
            assert f1 > 0 and f2 > f1, (slop, f1, f2)

    def test_doc5_lucene3412_consistency(self):
        # LUCENE-3412: "H H H H" steadily matches DOC_5_4 and steadily
        # does NOT match DOC_5_3 at slops 0..2
        for slop in range(3):
            assert _doc_freq(DOC_5_4, "H H H H", slop) > 0
            assert _doc_freq(DOC_5_3, "H H H H", slop) == 0


def test_engine_repeated_sloppy_end_to_end(spark, tmp_root):
    """Engine vs control oracle on a corpus with repeated-term sloppy
    phrases ("parse parse"~N style)."""
    import os

    import pandas as pd

    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search.engine import BooleanSpec, IndexSearcher
    from lucene_solr_spark.search.oracle import build_oracle_index, oracle_topk_spec

    docs = [
        "alpha beta alpha gamma alpha",
        "alpha alpha beta",
        "beta gamma delta",
        "alpha beta beta alpha",
        "gamma alpha beta alpha beta alpha",
        "alpha",
    ] * 8
    pdf = pd.DataFrame(
        {"doc_id": range(len(docs)), "content": docs, "repo": "r", "path": [str(i) for i in range(len(docs))]}
    )
    out = os.path.join(tmp_root, "idx_rpt_sloppy")
    build_index(
        spark, spark.createDataFrame(pdf), out_dir=out, content_col="content",
        doc_id_col="doc_id", meta_cols=["repo"], range_size=16, fingerprint="rpt48",
    )
    s = IndexSearcher(spark, out)
    oidx = build_oracle_index(list(zip(pdf.doc_id, pdf.content)))
    for phrase, slop in [
        ((("alpha", 0), ("alpha", 1)), 2),
        ((("alpha", 0), ("beta", 1), ("alpha", 2)), 3),
        ((("alpha", 0), ("alpha", 1), ("alpha", 2)), 4),
    ]:
        spec = BooleanSpec(phrase=phrase, slop=slop)
        expected = oracle_topk_spec(oidx, spec, k=10)
        got = [(r["doc_id"], r["score"]) for r in s.topk_spec(spec, k=10).collect()]
        assert len(got) == len(expected), (phrase, slop, got, expected)
        for (gd, gs), (ed, es) in zip(got, expected):
            assert gd == ed and np.float32(gs) == es, (phrase, slop, got, expected)
