"""Span queries over term clauses: SpanNearQuery (ordered / unordered)
and SpanFirstQuery.

Reference semantics (lucene/core/src/java/org/apache/lucene/search/spans/):

* NearSpansOrdered.java:60-120 — for each start position of clause 0,
  advance each later clause's PERSISTENT cursor to the first position
  >= previous clause's end; matchWidth = sum of inter-clause gaps; a
  match is emitted when matchWidth <= slop. Because the cursors only
  move forward and each lands on min(pos > prev_end), the walk equals
  the from-scratch greedy chain t_i = min(pos_i > t_{i-1}) — the closed
  form `span_ordered_freq` implements (and the SQL oracle mirrors).
* NearSpansUnordered.java:150-268 — a priority queue over the clauses'
  current spans ordered by (start, end); matches whenever
  max_end - min_start - totalSpanLength <= slop, emitting width =
  max_start - min_start after every single advance of the min cell.
  For TWO term clauses the visited configurations are exactly the pairs
  (x in A, y in B) with nextA(x) > y and nextB(y) > x (the classic
  merge-walk frontier), giving `span_unordered_freq_2` — property-tested
  against the queue walk `span_unordered_freq`.
* SpanFirstQuery.java:30-44 — accept spans with endPosition <= end; for
  a term clause freq = count of positions with pos+1 <= end (each
  accepted span has width 0).
* SpanScorer.java:84-118 — freq += sloppyFreq(width) = 1/(width+1) per
  match, accumulated in float32; the doc scores through the same BM25
  formula with the span weight (idf summed over the clauses' DISTINCT
  terms — SpanWeight.buildSimWeight uses a term->context map, unlike
  PhraseWeight's per-position array).
"""

from __future__ import annotations

import heapq

import numpy as np


def span_ordered_matches(plists: list[list[int]], slop: int):
    """NearSpansOrdered matches for one doc over term clauses (in query
    order; repeated terms simply reuse the same position list):
    yields (start, end, width) per emitted span."""
    n = len(plists)
    if any(len(p) == 0 for p in plists):
        return
    if n == 1:
        for p in plists[0]:
            yield (p, p + 1, 0)
        return
    cursors = [0] * n
    for p0 in plists[0]:
        prev_end = p0 + 1
        width = 0
        dead = False
        for i in range(1, n):
            pl = plists[i]
            c = cursors[i]
            while c < len(pl) and pl[c] < prev_end:
                c += 1
            cursors[i] = c
            if c >= len(pl):
                dead = True
                break
            width += pl[c] - prev_end
            prev_end = pl[c] + 1
        if dead:
            return  # oneExhaustedInCurrentDoc: no later p0 can complete
        if width <= slop:
            yield (p0, prev_end, width)


def span_ordered_freq(plists: list[list[int]], slop: int) -> np.float32:
    """NearSpansOrdered freq: Σ 1/(width+1) over emitted spans."""
    freq = np.float32(0.0)
    for _s, _e, width in span_ordered_matches(plists, slop):
        freq = np.float32(freq + np.float32(1.0) / np.float32(width + 1))
    return freq


def span_not_freq(
    plists: list[list[int]], slop: int, exclude: list[int]
) -> np.float32:
    """SpanNotQuery (spans/SpanNotQuery.java, pre=post=0) over an ordered
    SpanNear include and a term exclude: accept include spans whose
    [start, end) does not contain an exclude occurrence; freq over the
    accepted spans only (FilterSpans drops rejected spans before the
    scorer sees them)."""
    import bisect

    freq = np.float32(0.0)
    for s, e, width in span_ordered_matches(plists, slop):
        j = bisect.bisect_left(exclude, s)
        if j < len(exclude) and exclude[j] < e:
            continue  # an exclude occurrence overlaps the span
        freq = np.float32(freq + np.float32(1.0) / np.float32(width + 1))
    return freq


def span_containing_freq(
    plists: list[list[int]], slop: int, little: list[int]
) -> np.float32:
    """SpanContainingQuery (spans/SpanContainingQuery.java): BIG spans
    (the ordered near over plists) that CONTAIN an occurrence of the
    little term; each accepted big span scores with its own width
    (ContainSpans emits the big side)."""
    import bisect

    freq = np.float32(0.0)
    for s, e, width in span_ordered_matches(plists, slop):
        j = bisect.bisect_left(little, s)
        if j < len(little) and little[j] < e:
            freq = np.float32(freq + np.float32(1.0) / np.float32(width + 1))
    return freq


def span_within_freq(
    plists: list[list[int]], slop: int, little: list[int]
) -> np.float32:
    """SpanWithinQuery (spans/SpanWithinQuery.java): LITTLE term
    occurrences that lie within some big (ordered near) span; each
    accepted little span has width 0 (ContainSpans emits the little
    side), so freq = count of contained occurrences."""
    spans = list(span_ordered_matches(plists, slop))
    if not spans:
        return np.float32(0.0)
    freq = np.float32(0.0)
    for p in little:
        if any(s <= p < e for s, e, _w in spans):
            freq = np.float32(freq + np.float32(1.0))
    return freq


def span_unordered_freq(plists: list[list[int]], slop: int) -> np.float32:
    """NearSpansUnordered freq for one doc over term clauses (queue walk,
    any clause count). Term spans all have length 1, so
    totalSpanLength == n and width = max_pos - min_pos."""
    n = len(plists)
    if any(len(p) == 0 for p in plists):
        return np.float32(0.0)
    if n == 1:
        return np.float32(len(plists[0]))
    cursors = [1] * n
    heap = [(pl[0], pl[0] + 1, i) for i, pl in enumerate(plists)]
    heapq.heapify(heap)
    max_end = max(h[1] for h in heap)

    def at_match() -> bool:
        return max_end - heap[0][0] - n <= slop

    freq = np.float32(0.0)

    def advance_min() -> bool:
        nonlocal max_end
        _s, _e, i = heap[0]
        c = cursors[i]
        if c >= len(plists[i]):
            return False
        p = plists[i][c]
        cursors[i] = c + 1
        heapq.heapreplace(heap, (p, p + 1, i))
        if p + 1 > max_end:
            max_end = p + 1
        return True

    # two-phase: advance to the first match
    while not at_match():
        if not advance_min():
            return freq
    while True:
        width = (max_end - 1) - heap[0][0]
        freq = np.float32(freq + np.float32(1.0) / np.float32(width + 1))
        while True:
            if not advance_min():
                return freq
            if at_match():
                break


def span_unordered_freq_2(a: list[int], b: list[int], slop: int) -> np.float32:
    """Two-clause closed form of `span_unordered_freq` via the merge-walk
    PREFIX property: after k advances the consumed elements are exactly
    the k smallest of the merged order, so config (a_i, b_j) is visited
    iff a_{i-1} < b_j and b_{j-1} < a_i (own-clause LAGS; missing lag =
    always true). Exactly one config exists per k, and walk termination
    (exhausted min cell) falls out because the next config would need an
    out-of-range cursor. Each visited config with |a_i - b_j| - 1 <= slop
    emits 1/(|a_i - b_j| + 1), accumulated in ascending max(a_i, b_j)
    order (= walk order). This is the algorithm the SQL oracle runs."""
    if not a or not b:
        return np.float32(0.0)
    freq = np.float32(0.0)
    configs = []
    for i, x in enumerate(a):
        prv_a = a[i - 1] if i > 0 else None
        for j, y in enumerate(b):
            prv_b = b[j - 1] if j > 0 else None
            if (prv_a is None or prv_a < y) and (prv_b is None or prv_b < x):
                configs.append((max(x, y), min(x, y)))
    configs.sort()
    for hi, lo in configs:
        width = hi - lo
        if width - 1 <= slop:
            freq = np.float32(freq + np.float32(1.0) / np.float32(width + 1))
    return freq


def span_position_range_freq(plist: list[int], lo: int, hi: int) -> np.float32:
    """SpanPositionRangeQuery over a term clause
    (spans/SpanPositionRangeQuery.java): accept occurrences with
    startPosition >= lo and endPosition (pos+1) <= hi; width 0 each."""
    return np.float32(sum(1 for p in plist if p >= lo and p + 1 <= hi))


def span_first_freq(plist: list[int], end: int) -> np.float32:
    """SpanFirstQuery over a term clause: the lo=0 special case of
    SpanPositionRangeQuery (SpanFirstQuery.java:34 super(match, 0, end))."""
    return span_position_range_freq(plist, 0, end)


def span_not_span_freq(
    inc_plists: list[list[int]],
    inc_slop: int,
    exc_plists: list[list[int]],
    exc_slop: int,
) -> np.float32:
    """SpanNotQuery over TWO ordered SpanNears — the
    ComplexPhraseQueryParser negation shape
    (ComplexPhraseQueryParser.java:318-345: include = the positive
    clauses at slopFactor + numNegatives, exclude = ALL clauses in
    sequence at slopFactor): accept include spans whose [start, end)
    does not OVERLAP any exclude span; freq over accepted spans only."""
    exc = list(span_ordered_matches(exc_plists, exc_slop))
    freq = np.float32(0.0)
    for s, e, width in span_ordered_matches(inc_plists, inc_slop):
        if any(es < e and s < ee for es, ee, _w in exc):
            continue
        freq = np.float32(freq + np.float32(1.0) / np.float32(width + 1))
    return freq
