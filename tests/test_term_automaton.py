"""TermAutomatonQuery semantics (sandbox/search/TermAutomatonScorer.java):

finish() expands ANY arcs to match EVERY term symbol and determinizes
(TermAutomatonQuery.java:120-185), so countMatches steps each held state
both on the token's term symbol (counting accepts) and on the ANY symbol
(never counting); each route is a separate multiset copy. The property
test checks the engine's forward multiset walk against the oracle's
independent path-enumeration DFS over the same determinized automaton;
the Spark test pins the automaton == PhraseQuery equivalence rank- and
score-identically. Both are pinned to the compiled reference binary in
tests/test_lucene_ground_truth.py."""

import numpy as np
import pytest

from lucene_solr_spark.search.automaton import expand_determinize
from lucene_solr_spark.search.engine import _term_automaton_freqs
from lucene_solr_spark.search.oracle import _automaton_path_freq

SF = "/root/testdata/sf0.001"


def _brute_freq(tokens: dict, trans, accepts, labels):
    """Independent reference: path DFS over the determinized automaton."""
    dfa_trans, dfa_acc = expand_determinize(trans, accepts)
    occ_map = {p: t for p, t in tokens.items() if t in labels}
    return _automaton_path_freq(occ_map, dfa_trans, dfa_acc)


def _per_term_for(doc_id: int, tokens: dict, labels):
    """Synthetic single-doc per_term in the range scorer's layout:
    (docs, tf, norms, pos_deltas) with per-run-first-absolute deltas."""
    out = {}
    for lab in labels:
        pos = sorted(p for p, t in tokens.items() if t == lab)
        if not pos:
            continue
        deltas = [pos[0]] + [b - a for a, b in zip(pos, pos[1:])]
        out[lab] = (
            np.array([doc_id]),
            np.array([len(pos)]),
            np.array([100], dtype=np.uint8),
            np.array(deltas, dtype=np.int64),
        )
    return out


AUTOMATA = [
    # exact 2-term phrase
    ((((0, "a", 1), (1, "b", 2))), (2,)),
    # union of phrases: (a|b) c
    ((((0, "a", 1), (0, "b", 1), (1, "c", 2))), (2,)),
    # ANY gap: a ANY b
    ((((0, "a", 1), (1, "", 2), (2, "b", 3))), (3,)),
    # optional extension: accept at 2 and 3 (a b, a b c)
    ((((0, "a", 1), (1, "b", 2), (2, "c", 3))), (2, 3)),
    # self-loop on ANY: a ANY* b
    ((((0, "a", 1), (1, "", 1), (1, "b", 2))), (2,)),
    # term self-loop: a+ b
    ((((0, "a", 1), (1, "a", 1), (1, "b", 2))), (2,)),
]


@pytest.mark.parametrize("trans,accepts", AUTOMATA)
def test_walk_matches_brute_force_paths(trans, accepts):
    rng = np.random.default_rng(17)
    labels = sorted({lab for _f, lab, _t in trans if lab})
    for trial in range(300):
        n = int(rng.integers(1, 13))
        tokens = {}
        pos = 0
        for _ in range(n):
            if rng.random() < 0.15:
                pos += 1  # stop-word position gap
            tokens[pos] = str(rng.choice(["a", "b", "c", "x", "y"]))
            pos += 1
        want = _brute_freq(tokens, trans, accepts, labels)
        per_term = _per_term_for(5, tokens, labels)
        if not per_term:
            assert want == 0
            continue
        got = int(_term_automaton_freqs(per_term, expand_determinize(trans, accepts),
                                        np.array([5]))[0])
        assert got == want, (trial, tokens)


def test_automaton_equals_phrase_rank_and_score(spark):
    """An automaton encoding an exact phrase is PhraseQuery (the javadoc's
    'generalization of PhraseQuery') — rank AND float32 score identical."""
    from lucene_solr_spark.ops.index_access import searcher_for

    s = searcher_for(spark, SF)
    a = [(r["doc_id"], r["score"]) for r in s.topk_term_automaton(
        [(0, "merge", 1), (1, "sort", 2)], [2], k=10).collect()]
    b = [(r["doc_id"], r["score"]) for r in s.topk_phrase("merge sort", k=10).collect()]
    assert a == b and len(a) == 10
