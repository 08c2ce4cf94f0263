"""FuzzyQuery expansion semantics (search/FuzzyQuery.java +
FuzzyTermsEnum.java).

The reference expands a fuzzy term over the dictionary with a
Levenshtein automaton where adjacent-character TRANSPOSITION is a
primitive edit (FuzzyQuery.defaultTranspositions = true, built from the
Mihov/Schulz parametric tables — LevenshteinAutomata.java). That edit
model is the RESTRICTED transposition distance (optimal string
alignment: a transposed pair can't be edited again), NOT the
unrestricted Lowrance-Wagner Damerau distance — verified against the
compiled reference binary in tests/test_lucene_ground_truth.py: for
query "cax" with maxEdits=2 the reference REJECTS "abcx" (unrestricted
DL=2 via transpose-then-insert-inside, OSA=3) while accepting the plain
transpose+substitute cases at 2.

Acceptance + boost (FuzzyTermsEnum.accept, minSimilarity=0,
scale_factor=1 for the int-maxEdits constructor FuzzyQuery uses):
  ed == 0                      -> boost 1.0 (exact match)
  0 < ed <= maxEdits           -> similarity = 1 - ed/min(|cand|, |query|)
                                  accepted only if similarity > 0,
                                  boost = similarity (float32)
so a candidate with ed == min(len) is REJECTED even within maxEdits.
"""

from __future__ import annotations

import numpy as np


def osa_distance(a: str, b: str) -> int:
    """Optimal-string-alignment distance (restricted Damerau): each
    substring may be edited at most once. This is the distance the
    reference's transposition automaton accepts (see module docstring)."""
    la, lb = len(a), len(b)
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1 and j > 1
                and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]
            ):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        prev2, prev = prev, cur
    return prev[lb]


def dl_distance(a: str, b: str) -> int:
    """True (unrestricted) Damerau-Levenshtein distance, Lowrance-Wagner
    DP — transposed characters may drift apart via later edits
    ("ca" -> "abc" is 2: transpose + insert). Kept for diagnostics; the
    reference automaton is STRICTER (osa_distance above)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    inf = la + lb
    # da[ch] = last row index where ch appeared in a
    da: dict[str, int] = {}
    d = [[inf] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = inf
    for i in range(la + 1):
        d[i + 1][1] = i
        d[i + 1][0] = inf
    for j in range(lb + 1):
        d[1][j + 1] = j
        d[0][j + 1] = inf
    for i in range(1, la + 1):
        db = 0  # last column where b[j] == a[i] in this row
        for j in range(1, lb + 1):
            i1 = da.get(b[j - 1], 0)
            j1 = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitution / match
                d[i + 1][j] + 1,  # insertion
                d[i][j + 1] + 1,  # deletion
                d[i1][j1] + (i - i1 - 1) + 1 + (j - j1 - 1),  # transposition
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def fuzzy_accept(query: str, cand: str, max_edits: int) -> tuple[bool, int]:
    """(accepted, edit distance) under FuzzyTermsEnum's rules."""
    ed = osa_distance(query, cand)
    if ed == 0:
        return True, 0
    if ed > max_edits:
        return False, ed
    sim = 1.0 - float(ed) / float(min(len(cand), len(query)))
    return sim > 0.0, ed


def fuzzy_boost(query: str, cand: str, ed: int) -> np.float32:
    """FuzzyTermsEnum.accept boost: 1.0 exact, else the similarity."""
    if ed == 0:
        return np.float32(1.0)
    return np.float32(
        np.float32(1.0)
        - np.float32(ed) / np.float32(min(len(cand), len(query)))
    )


def fuzzy_expand_vocab(
    query: str, vocab_dfs: list[tuple[str, int]], max_edits: int,
    max_expansions: int = 50,
) -> list[tuple[str, int, np.float32]]:
    """Expand `query` over [(term, df)] exactly as FuzzyQuery's
    TopTermsBlendedFreqScoringRewrite collects terms: accept within
    max_edits with similarity > 0, rank by (boost DESC, term ASC —
    TopTermsRewrite.ScoreTerm keeps the lexicographically smaller term
    on equal boosts), cap at max_expansions (defaultMaxExpansions=50).
    Returns [(term, df, boost)]."""
    out = []
    for t, df in vocab_dfs:
        ok, ed = fuzzy_accept(query, t, max_edits)
        if ok:
            out.append((t, df, fuzzy_boost(query, t, ed)))
    out.sort(key=lambda x: (-float(x[2]), x[0]))
    return out[:max_expansions]
