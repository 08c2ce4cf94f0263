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

Phrases whose clause terms REPEAT (same term at multiple phrase
positions, e.g. "A A A") take the repeats path
(SloppyPhraseScorer.initComplex / advanceRepeatGroups / advanceRpts):
repeat-group members are offset-sorted, the j-th member starts j
positions in (so no two sit on the same occurrence), and whenever an
advance makes two members collide on the same token position (tpPos),
the lesser of the two advances until the group is collision-free.
Pass `terms` to identify which clauses repeat. Lucene's multi-TERM
repeat postings (MultiPhrase-within-sloppy, hasMultiTermRpts) are
covered too: pass a TUPLE of alternatives as a clause's terms entry and
the union of their positions as its plist — repeat groups become
connected components of the clause/term bipartite graph
(gatherRptGroups' bitset union), and init resolves collisions pairwise
(advanceRepeatGroups' multi-term branch). See _sloppy_freq_multiterm.
"""

from __future__ import annotations

import heapq

import numpy as np


class _PP:
    """PhrasePositions: a cursor over one clause's positions."""

    __slots__ = ("plist", "off", "ord", "cursor", "position", "rpt_group", "rpt_ind")

    def __init__(self, plist: list[int], off: int, ord_: int):
        self.plist = plist
        self.off = off
        self.ord = ord_
        self.cursor = 0
        self.position = plist[0] - off
        self.rpt_group = -1
        self.rpt_ind = 0

    def key(self):
        return (self.position, self.off, self.ord)

    def tp_pos(self) -> int:
        return self.position + self.off  # the actual token position

    def advance(self) -> bool:
        self.cursor += 1
        if self.cursor >= len(self.plist):
            return False
        self.position = self.plist[self.cursor] - self.off
        return True


def _sloppy_freq_repeats(
    plists: list[list[int]], offsets: list[int], slop: int, terms: list
) -> np.float32:
    """The repeats state machine (initComplex + advanceRpts), faithful to
    SloppyPhraseScorer.java:147-320 for plain-term clauses. The queue is
    a min-by-(position, offset, ord) selection — equivalent to Lucene's
    PhraseQueue after its collision requeue dance."""
    n = len(offsets)
    pps = [_PP(plists[i], offsets[i], i) for i in range(n)]
    # repeat groups: clauses sharing a term, members in offset order
    by_term: dict = {}
    for pp, t in zip(pps, terms):
        by_term.setdefault(t, []).append(pp)
    rpt_groups = [g for g in by_term.values() if len(g) > 1]
    for gi, g in enumerate(rpt_groups):
        g.sort(key=lambda pp: pp.off)
        for j, pp in enumerate(g):
            pp.rpt_group, pp.rpt_ind = gi, j

    # advanceRepeatGroups (no multi-term repeats): the j-th member starts
    # j occurrences in, so the group begins collision-free
    for g in rpt_groups:
        for j in range(1, len(g)):
            for _ in range(j):
                if not g[j].advance():
                    return np.float32(0.0)  # PPs exhausted -> no match

    return _run_repeats_machine(pps, rpt_groups, slop)


def _run_repeats_machine(
    pps: list, rpt_groups: list, slop: int
) -> np.float32:
    """phraseFreq + advanceRpts over already-initialized (collision-free)
    PPs with assigned repeat groups (SloppyPhraseScorer.java:101-185)."""
    end = max(pp.position for pp in pps)
    queue = list(pps)

    def pop_min() -> _PP:
        m = min(queue, key=_PP.key)
        queue.remove(m)
        return m

    def collide(pp: _PP) -> _PP | None:
        tp = pp.tp_pos()
        for other in rpt_groups[pp.rpt_group]:
            if other is not pp and other.tp_pos() == tp:
                return other
        return None

    freq = np.float32(0.0)
    pp = pop_min()
    match_length = end - pp.position
    next_pos = min(queue, key=_PP.key).position
    while True:
        # advancePP
        if not pp.advance():
            break
        if pp.position > end:
            end = pp.position
        # advanceRpts: resolve (chains of) collisions — the LESSER of the
        # two colliding members advances and becomes the new collision
        # subject (SloppyPhraseScorer.advanceRpts reassigns its local pp)
        if pp.rpt_group >= 0:
            dead = False
            subject = pp
            while (other := collide(subject)) is not None:
                subject = subject if subject.key()[:2] < other.key()[:2] else other
                if not subject.advance():
                    dead = True
                    break
                if subject.position > end:
                    end = subject.position
            if dead:
                break  # pps exhausted -> final emit below
        if pp.position > next_pos:  # done minimizing current match window
            if match_length <= slop:
                freq = np.float32(freq + np.float32(1.0) / np.float32(match_length + 1))
            queue.append(pp)
            pp = pop_min()
            next_pos = min(queue, key=_PP.key).position
            match_length = end - pp.position
        else:
            ml2 = end - pp.position
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq = np.float32(freq + np.float32(1.0) / np.float32(match_length + 1))
    return freq


def _sloppy_freq_multiterm(
    plists: list[list[int]], offsets: list[int], slop: int,
    term_sets: list[tuple],
) -> np.float32:
    """The multi-term-repeats path (hasMultiTermRpts): MultiPhrase-within-
    sloppy where alternative-term sets overlap across phrase positions
    (SloppyPhraseScorer.java initFirstTime:326-354 + gatherRptGroups
    else-branch:377-432 + advanceRepeatGroups multi-term branch:285-305).

    plists[i] is the UNION of clause i's alternatives' positions in the
    doc (UnionPostingsEnum); term_sets[i] the clause's full alternative
    set (query terms, independent of which occur in the doc). Repeat
    groups are connected components of the bipartite clause/term graph
    over REPEATING terms (terms in >=2 clauses), per ppTermsBitSets +
    unionTermGroups + termGroups; members sorted by query offset.
    Collisions (same token position within a group) are resolved exactly
    as in the single-term path — only the init differs: members cannot
    be pre-advanced a fixed count (some may not collide), so collisions
    are resolved pairwise, re-scanning earlier members when one of them
    was moved (the reference's incr=0 redo)."""
    n = len(offsets)
    pps = [_PP(plists[i], offsets[i], i) for i in range(n)]

    # repeatingTerms (:440-453): terms appearing in >= 2 clauses, ordinal
    # assigned in the order each count reaches 2 (LinkedHashMap order)
    tcnt: dict = {}
    tord: dict = {}
    for ts in term_sets:
        for t in ts:
            tcnt[t] = tcnt.get(t, 0) + 1
            if tcnt[t] == 2:
                tord[t] = len(tord)

    # repeatingPPs (:456-468): clauses holding >= 1 repeating term
    rpp = [pp for pp in pps if any(t in tord for t in term_sets[pp.ord])]
    # ppTermsBitSets + unionTermGroups (:471-501): union intersecting
    # term sets until disjoint, revisiting i after any merge
    bb = [
        {tord[t] for t in term_sets[pp.ord] if t in tord} for pp in rpp
    ]
    i = 0
    while i < len(bb) - 1:
        incr = 1
        j = i + 1
        while j < len(bb):
            if bb[i] & bb[j]:
                bb[i] |= bb[j]
                del bb[j]
                incr = 0
            else:
                j += 1
        i += incr
    tg = {}  # term ordinal -> group index (termGroups :504-514)
    for gi, bits in enumerate(bb):
        for o in bits:
            tg[o] = gi
    rpt_groups: list[list] = [[] for _ in bb]
    for pp in rpp:
        gs = {tg[tord[t]] for t in term_sets[pp.ord] if t in tord}
        # by construction of unionTermGroups a pp's repeating terms live
        # in exactly one component (gatherRptGroups asserts this)
        g = gs.pop()
        rpt_groups[g].append(pp)
        pp.rpt_group = g
    # sortRptGroups (:358-374): by query offset (ord tiebreak for
    # determinism; Lucene's MultiPhraseQuery has one pp per offset)
    for g in rpt_groups:
        g.sort(key=lambda pp: (pp.off, pp.ord))
        for j, pp in enumerate(g):
            pp.rpt_ind = j

    def collide_idx(pp, rg) -> int:
        tp = pp.tp_pos()
        for k, other in enumerate(rg):
            if other is not pp and other.tp_pos() == tp:
                return k
        return -1

    # advanceRepeatGroups, multi-term branch (:285-305): resolve pairwise,
    # advancing the lesser; if a member BEFORE i moved, redo index i
    for rg in rpt_groups:
        i = 0
        while i < len(rg):
            incr = 1
            pp = rg[i]
            while True:
                k = collide_idx(pp, rg)
                if k < 0:
                    break
                pp2 = pp if pp.key()[:2] < rg[k].key()[:2] else rg[k]
                if not pp2.advance():
                    return np.float32(0.0)  # PPs exhausted
                if pp2.rpt_ind < i:
                    incr = 0
                    break
            i += incr

    return _run_repeats_machine(pps, rpt_groups, slop)


def sloppy_freq(
    plists: list[list[int]], offsets: list[int], slop: int, terms: list | None = None
) -> np.float32:
    """Weighted sloppy phrase freq for ONE document.

    plists[i]: ascending absolute positions of clause i's term in the doc
    (all non-empty); offsets[i]: the clause's phrase position. `terms`
    identifies clauses of the SAME term (the repeats path); None means
    all clauses are distinct terms. A terms entry may also be a TUPLE of
    alternative terms (a MultiPhraseQuery position; plists[i] is then the
    union of the alternatives' positions): when alternative sets overlap
    across positions the multi-term-repeats path runs
    (_sloppy_freq_multiterm, SloppyPhraseScorer.hasMultiTermRpts).
    """
    n = len(offsets)
    if any(len(p) == 0 for p in plists):
        return np.float32(0.0)
    if n == 1:
        # single-clause phrase rewrites to a term query: every occurrence
        # is a zero-length match
        return np.float32(len(plists[0]))
    if terms is not None:
        term_sets = [
            (t,) if isinstance(t, str) else tuple(t) for t in terms
        ]
        tcnt: dict = {}
        for ts in term_sets:
            for t in ts:
                tcnt[t] = tcnt.get(t, 0) + 1
        rpt = {t for t, c in tcnt.items() if c >= 2}
        if rpt:
            # hasMultiTermRpts: a REPEATING pp with > 1 alternative
            if any(
                len(ts) > 1 and any(t in rpt for t in ts) for ts in term_sets
            ):
                return _sloppy_freq_multiterm(plists, offsets, slop, term_sets)
            return _sloppy_freq_repeats(plists, offsets, slop, list(terms))

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
