"""TermAutomatonQuery semantics (sandbox/search/TermAutomatonScorer.java):

freq = number of transition paths that start with a term arc from state 0
at some query-token position and end with a term arc into an accept state
(mid-path accepts count their own prefix; ANY arcs consume one position,
never count, and may not move past the doc's last query token). The
property test checks the engine's multiset position-walk against an
independent brute-force path enumeration; the Spark test pins the
automaton == PhraseQuery equivalence rank- and score-identically.
"""

import numpy as np
import pytest

from lucene_solr_spark.search.engine import _term_automaton_freqs

SF = "/root/testdata/sf0.001"


def _brute_freq(tokens: dict, trans, accepts, labels):
    """Independent reference: DFS over transition paths."""
    qpos = sorted(p for p, t in tokens.items() if t in labels)
    if not qpos:
        return 0
    max_qpos = qpos[-1]
    acc = set(accepts)
    hits = 0

    def dfs(state, pos):
        nonlocal hits
        tok = tokens.get(pos)
        for f, lab, t in trans:
            if f != state:
                continue
            if lab == "":
                if pos < max_qpos:  # ANY may not move past the last query token
                    dfs(t, pos + 1)
            elif tok == lab:
                if t in acc:
                    hits += 1
                dfs(t, pos + 1)

    for p in qpos:
        for f, lab, t in trans:
            if f == 0 and lab == tokens[p]:
                if t in acc:
                    hits += 1
                dfs(t, p + 1)
    return hits


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
        got = int(_term_automaton_freqs(per_term, (tuple(trans), tuple(accepts)),
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
