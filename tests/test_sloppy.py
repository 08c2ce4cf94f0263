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


def test_repeated_terms_rejected():
    from lucene_solr_spark.search.engine import _sloppy_phrase_freqs

    with pytest.raises(NotImplementedError):
        _sloppy_phrase_freqs({}, (("a", 0), ("a", 1)), np.array([0]), 2)
