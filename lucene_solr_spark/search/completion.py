"""suggest/document completion family — SuggestField / ContextSuggestField
indexing with NRTSuggester lookup semantics (lucene/suggest/src/java/org/
apache/lucene/search/suggest/document/: NRTSuggester.java,
CompletionScorer.java, PrefixCompletionQuery.java, RegexCompletionQuery.java,
FuzzyCompletionQuery.java, ContextQuery.java, TopSuggestDocsCollector.java).
Pinned bit-for-bit vs the compiled module in GT round 79.

The reference intersects a query automaton with the suggestion FST via
FSTUtil.intersectPrefixPaths, which stops at the FIRST accept state along
each branch ("minimal prefix paths") — every suggestion below that node
inherits that path's boost. Scoring (CompletionScorer.score):

    boost == 0 -> weight        (prefix/regex queries boost 0, so the
    weight == 0 -> boost         indexed weight IS the score — and a
    else weight * boost          zero-weight entry scores the boost!)

- PrefixCompletionQuery / RegexCompletionQuery: boost 0.
- FuzzyCompletionQuery: boost = length of the longest common prefix
  between the query string and the MINIMAL ACCEPTED PREFIX of the
  suggestion (FuzzyCompletionWeight.setNextMatch) — so an exact match
  and a match with an edit past the divergence point boost the same.
  The automaton: exact first nonFuzzyPrefix chars, <= maxEdits
  (optionally with transpositions = OSA) on the rest; a query shorter
  than minFuzzyLength (or <= nonFuzzyPrefix) matches exactly only.
- ContextQuery: entries are <context> 0x1D <surface> (one per context);
  boost = contextBoost + innerBoost with the quirk that an UNKNOWN or
  zero-boost context yields boost 0 -> score = plain weight; context
  prefixes (exact=false) resolve to the DEFINED context's boost,
  longest defined context first.
- Collection: TopSuggestDocsCollector's bounded PQ (score DESC, doc ASC
  ties) fed in traversal order (score DESC, then FST input ASC); the
  FIRST rejected insertion terminates the leaf
  (CollectionTerminatedException), so at score ties the input order
  decides which entries were ever seen.
"""

from __future__ import annotations

import re

import numpy as np

CONTEXT_SEP = ""


#: CompletionAnalyzer.SEP_LABEL (= NRTSuggesterBuilder.PAYLOAD_SEP,
#: 0x1F): preserveSep inserts it between analyzed tokens, so a
#: multi-token surface's FST key is tok1 SEP tok2 SEP ...; a context
#: entry is ctx 0x1D SEP key (the ContextQuery automaton's
#: optionalSepLabel models exactly this byte)
SEP_LABEL = "\x1f"


def _key(text: str) -> str:
    """Analyzed FST key of a (whitespace-analyzable) surface or query."""
    return SEP_LABEL.join(t for t in text.split() if t)


def _osa(a: str, b: str) -> int:
    """Optimal-string-alignment distance (LevenshteinAutomata with
    transpositions=true)."""
    n, m = len(a), len(b)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + cost)
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[n][m]


def _lev(a: str, b: str) -> int:
    n, m = len(a), len(b)
    p = list(range(m + 1))
    for i in range(1, n + 1):
        d = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[j] = min(d[j - 1] + 1, p[j] + 1, p[j - 1] + cost)
        p = d
    return p[m]


def _score(weight: float, boost: float) -> np.float32:
    if boost == 0.0:
        return np.float32(weight)
    if weight == 0.0:
        return np.float32(boost)
    return np.float32(np.float32(weight) * np.float32(boost))


def _common_prefix_len(a: str, b: str) -> int:
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def _min_accepted_prefix(s: str, accept) -> str | None:
    for ln in range(len(s) + 1):
        if accept(s[:ln]):
            return s[:ln]
    return None


class _LucenePQ:
    """util.PriorityQueue with SuggestScoreDocPriorityQueue.lessThan,
    replicated array-for-array so equal-(score, doc) entries pop in the
    reference's exact heap order."""

    def __init__(self, max_size: int):
        self.heap: list = [None] * (max_size + 1)
        self.size = 0
        self.max_size = max_size

    @staticmethod
    def _lt(a, b) -> bool:
        if float(a[0]) == float(b[0]):
            return a[2] > b[2]  # prefer smaller doc on ties
        return float(a[0]) < float(b[0])

    def _up(self, i: int) -> None:
        node = self.heap[i]
        while i > 1 and self._lt(node, self.heap[i >> 1]):
            self.heap[i] = self.heap[i >> 1]
            i >>= 1
        self.heap[i] = node

    def _down(self, i: int) -> None:
        node = self.heap[i]
        j = i << 1
        k = j + 1
        if k <= self.size and self._lt(self.heap[k], self.heap[j]):
            j = k
        while j <= self.size and self._lt(self.heap[j], node):
            self.heap[i] = self.heap[j]
            i = j
            j = i << 1
            k = j + 1
            if k <= self.size and self._lt(self.heap[k], self.heap[j]):
                j = k
        self.heap[i] = node

    def insert_with_overflow(self, el):
        if self.size < self.max_size:
            self.size += 1
            self.heap[self.size] = el
            self._up(self.size)
            return None
        if self.size > 0 and not self._lt(el, self.heap[1]):
            ret = self.heap[1]
            self.heap[1] = el
            self._down(1)
            return ret
        return el

    def pop(self):
        res = self.heap[1]
        self.heap[1] = self.heap[self.size]
        self.heap[self.size] = None
        self.size -= 1
        self._down(1)
        return res


def _collect(candidates: list[tuple], num: int) -> list[tuple]:
    """TopSuggestDocsCollector over candidates
    [(score, input_key, doc, surface, context)]: feed in traversal order
    (score DESC, input ASC) into the reference PQ; the first rejected
    insertion terminates (CollectionTerminatedException); results pop
    least-first into descending output (getResults)."""
    order = sorted(candidates, key=lambda c: (-float(c[0]), c[1]))
    pq = _LucenePQ(num)
    for it in order:
        if pq.insert_with_overflow(it) is it:
            break
    out = [pq.pop() for _ in range(pq.size)]
    return out[::-1]


def completion_lookup(
    entries: list[tuple[int, str, int, list[str]]],
    kind: str,
    num: int,
    *,
    prefix: str | None = None,
    regex: str | None = None,
    term: str | None = None,
    max_edits: int = 1,
    transpositions: bool = False,
    non_fuzzy_prefix: int = 1,
    min_fuzzy_length: int = 3,
    contexts: list[tuple[str, float, bool]] | None = None,
    all_contexts: bool = False,
) -> list[tuple[int, str, str | None, np.float32]]:
    """Run one completion query over entries [(doc, surface, weight,
    contexts)] and return [(doc, surface, context|None, float32 score)]
    in the reference collector's order. kind: 'prefix' | 'regex' |
    'fuzzy' (over the plain suggest field) or 'context' (over the
    context field — only entries WITH contexts participate, one
    candidate per (entry, context))."""
    candidates: list[tuple] = []
    if kind in ("prefix", "regex", "fuzzy"):
        if kind == "prefix":
            pkey = _key(prefix)

            def accept(p: str) -> bool:
                return p == pkey
        elif kind == "regex":
            cre = re.compile(regex)

            def accept(p: str) -> bool:
                return cre.fullmatch(p) is not None
        else:
            q = _key(term)
            fuzzy_on = (len(q) > non_fuzzy_prefix
                        and len(q) >= min_fuzzy_length)
            dist = _osa if transpositions else _lev

            def accept(p: str) -> bool:
                if not fuzzy_on:
                    return p == q
                if p[:non_fuzzy_prefix] != q[:non_fuzzy_prefix]:
                    return False
                return dist(p[non_fuzzy_prefix:],
                            q[non_fuzzy_prefix:]) <= max_edits

        for doc, surface, weight, _ctxs in entries:
            skey = _key(surface)
            p = _min_accepted_prefix(skey, accept)
            if p is None:
                continue
            boost = 0.0 if kind != "fuzzy" else float(
                _common_prefix_len(p, _key(term)))
            candidates.append(
                (_score(weight, boost), skey, doc, surface, None))
    else:  # context query wrapping a prefix query
        defined = {c: b for c, b, _e in (contexts or [])}
        # longest DEFINED context first (ContextCompletionWeight's
        # contextLengths walk over the matched path prefix)
        def_order = sorted(defined, key=len, reverse=True)

        def ctx_accepted(ctx: str) -> bool:
            if all_contexts:
                return True
            for c, _b, exact in contexts or []:
                if (ctx == c) if exact else ctx.startswith(c):
                    return True
            return False

        pkey = _key(prefix)
        for doc, surface, weight, ctxs in entries:
            skey = _key(surface)
            if not ctxs or not skey.startswith(pkey):
                continue
            for ctx in ctxs:
                if not ctx_accepted(ctx):
                    continue
                boost = 0.0
                path = ctx + CONTEXT_SEP + SEP_LABEL + pkey
                for c in def_order:
                    if len(c) <= len(path) and path[:len(c)] == c:
                        boost = defined[c]
                        break
                candidates.append((
                    _score(weight, boost),
                    ctx + CONTEXT_SEP + SEP_LABEL + skey,
                    doc, surface, ctx,
                ))
    return [(d, s, c, sc) for sc, _k, d, s, c in _collect(candidates, num)]
