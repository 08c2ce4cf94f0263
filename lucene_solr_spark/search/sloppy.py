"""Lucene-exact sloppy phrase frequency.

Reference semantics (lucene/core/src/java/org/apache/lucene/search/
SloppyPhraseScorer.java:90-139 phraseFreq + PhraseQueue ordering;
lucene/core/src/java/org/apache/lucene/search/similarities/
BM25Similarity.java:77-79 sloppyFreq): each phrase clause i is a cursor
over its term's positions ADJUSTED by the clause offset (pos - offset);
a priority queue keyed (position, offset) repeatedly advances the lowest
cursor, minimizing the current match window; when the advanced cursor
crosses strictly above the next-lowest, a match is emitted with
matchLength = the minimal (end - lowest) seen in that run, contributing
sloppyFreq(matchLength) = 1/(matchLength+1) when matchLength <= slop.
The weighted frequency is accumulated in float32 exactly as Lucene's
`float freq` is.

Two implementations, verified equivalent by property test
(tests/test_sloppy.py):

* `sloppy_freq` — the per-doc state machine, any number of distinct
  clauses (the engine path; same per-doc sequential cost model as
  Lucene's own scorer).
* `sloppy_freq_chain2` — the TWO-distinct-clause closed form the SQL
  oracle mirrors: the state machine's runs form a LEAPFROG CHAIN of
  "uppers": u0 = max of the two first adjusted keys (tie: the clause
  with the larger offset), u_{k+1} = min(other clause's keys STRICTLY
  greater than u_k); each upper u emits one match of distance
  u - max(other clause's keys <= u), contributing 1/(distance+1) when
  within slop. (A naive "adjacent cross pairs in merged order" model is
  WRONG on ties — an advancing cursor that reaches a key EQUAL to the
  upper keeps minimizing inside the same run; the property test in
  tests/test_sloppy.py checks chain == state machine exhaustively.)

Phrases whose clause terms REPEAT (same term at two phrase positions)
take Lucene's repeats path (SloppyPhraseScorer.advanceRpts), which is
not implemented — sloppy_freq raises for those; exact (slop=0) phrases
with repeats are handled by the engine's aligned-key path.
"""

from __future__ import annotations

import heapq

import numpy as np


def sloppy_freq(plists: list[list[int]], offsets: list[int], slop: int) -> np.float32:
    """Weighted sloppy phrase freq for ONE document.

    plists[i]: ascending absolute positions of clause i's term in the doc
    (all non-empty); offsets[i]: the clause's phrase position. Clause
    terms must be pairwise distinct (no repeats).
    """
    n = len(offsets)
    if any(len(p) == 0 for p in plists):
        return np.float32(0.0)
    if n == 1:
        # single-clause phrase rewrites to a term query: every occurrence
        # is a zero-length match
        return np.float32(len(plists[0]))

    cursors = [0] * n
    heap: list[tuple[int, int, int]] = []
    end = None
    for i in range(n):
        p = plists[i][0] - offsets[i]
        heap.append((p, offsets[i], i))
        end = p if end is None else max(end, p)
    heapq.heapify(heap)

    freq = np.float32(0.0)
    p, _off, i = heapq.heappop(heap)
    match_length = end - p
    next_pos = heap[0][0]
    while True:
        cursors[i] += 1
        if cursors[i] >= len(plists[i]):
            break  # this clause is exhausted -> final emit below
        p = plists[i][cursors[i]] - offsets[i]
        if p > end:
            end = p
        if p > next_pos:  # done minimizing the current match window
            if match_length <= slop:
                freq = np.float32(freq + np.float32(1.0) / np.float32(match_length + 1))
            heapq.heappush(heap, (p, offsets[i], i))
            p, _off, i = heapq.heappop(heap)
            next_pos = heap[0][0]
            match_length = end - p
        else:
            ml2 = end - p
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq = np.float32(freq + np.float32(1.0) / np.float32(match_length + 1))
    return freq


def sloppy_freq_chain2(
    pos_a: list[int], pos_b: list[int], off_a: int, off_b: int, slop: int
) -> np.float32:
    """Two-distinct-clause closed form of `sloppy_freq` (the leapfrog
    chain, see module docstring). This is the exact algorithm the DuckDB
    oracle's recursive CTE runs; property-tested identical to the state
    machine."""
    import bisect

    if not pos_a or not pos_b:
        return np.float32(0.0)
    ka = [p - off_a for p in pos_a]
    kb = [p - off_b for p in pos_b]
    if ka[0] > kb[0]:
        side, u = 0, ka[0]
    elif kb[0] > ka[0]:
        side, u = 1, kb[0]
    else:  # tie: PhraseQueue pops the smaller offset -> upper = larger
        side = 0 if off_a > off_b else 1
        u = ka[0]
    freq = np.float32(0.0)
    while True:
        other = kb if side == 0 else ka
        i = bisect.bisect_right(other, u) - 1  # max(other <= u)
        if i >= 0:
            d = u - other[i]
            if d <= slop:
                freq = np.float32(freq + np.float32(1.0) / np.float32(d + 1))
        j = bisect.bisect_right(other, u)  # min(other > u)
        if j >= len(other):
            return freq
        u = other[j]
        side ^= 1
