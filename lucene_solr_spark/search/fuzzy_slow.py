"""SlowFuzzyQuery — the sandbox brute-force fuzzy query
(lucene/sandbox/src/java/org/apache/lucene/sandbox/queries/
SlowFuzzyQuery.java, SlowFuzzyTermsEnum.java) which, unlike core
FuzzyQuery, supports edit distances > 2 and deprecated FRACTIONAL
minimum similarities, via linear dictionary enumeration.

`slow_fuzzy_expand` reproduces the whole enumeration machinery over a
sorted term dictionary (the engine feeds it the term_stats metadata
scan — never the corpus), including every quirk the compiled binary
exhibits (pinned bit-for-bit in GT round 76):

- raw mode (minSim >= 1): internal minSimilarity 0, maxEdits =
  (int) minSim; accepts on distance alone, so boosts can be ZERO or
  NEGATIVE when the edit distance exceeds the shorter suffix length
  (calcSimilarity's "this was the formula that was previously used"
  comment) — the rewritten BooleanQuery then carries negative
  BoostQuery clauses.
- fractional mode: maxEdits = (int)((1 - minSim) * termLength),
  accept iff similarity > minSim STRICTLY, boost =
  (sim - minSim) * scale_factor with scale_factor = 1/(1 - minSim),
  each step in float32.
- termLongEnough (SlowFuzzyQuery ctor): a term too short for the
  similarity collapses to an exact SingleTermsEnum match at boost 1.
- TWO different similarity formulas depending on which inner enum is
  live: the LINEAR enum (maxEdits > 2) scores
  1 - d/(realPrefixLength + min(suffix lens)); the AUTOMATON enum
  (maxEdits <= 2) scores exact matches 1.0 and others
  1 - ed/min(FULL term lens) — no prefix adjustment.
- the TopTermsRewrite PQ feedback loop: once the queue holds
  maxExpansions terms, the bottom boost shrinks maxEdits
  (bottomChanged's >= / > termAfter split), which can SWITCH the live
  enum from linear to automaton MID-ENUMERATION — terms accepted after
  the switch use the other formula. The switch lags the PQ update by
  one ACCEPTED term (FuzzyTermsEnum.next()'s queuedBottom).
- the PQ keeps top maxExpansions by (boost DESC, term ASC)
  (ScoreTerm.compareTo: equal boosts prefer the lexicographically
  smaller term) and the final clause list is term-sorted.

The expansion feeds the ordinary boosted-SHOULD scoring path
(BooleanSpec(should=..., boosts=...): BM25 weight = f32(idf * boost),
f32(* (k1+1)), clauses double-summed then cast — the
TopTermsScoringBooleanQueryRewrite addClause shape)."""

from __future__ import annotations

import numpy as np

_FMIN = -np.finfo(np.float32).max  # MaxNonCompetitiveBoostAttribute default


def _lev(a: str, b: str) -> int:
    """Plain Levenshtein (no transpositions) — calcDistance without the
    early aborts (they only skip work, never change the result for
    accepted terms)."""
    n, m = len(a), len(b)
    if n == 0:
        return m
    if m == 0:
        return n
    p = list(range(n + 1))
    for j in range(1, m + 1):
        d = [j] + [0] * n
        cb = b[j - 1]
        for i in range(1, n + 1):
            if cb != a[i - 1]:
                d[i] = min(d[i - 1], p[i], p[i - 1]) + 1
            else:
                d[i] = min(d[i - 1] + 1, p[i] + 1, p[i - 1])
        p = d
    return p[n]


def slow_fuzzy_expand(
    dictionary: list[str],
    text: str,
    min_sim: float,
    prefix_len: int = 0,
    max_expansions: int = 50,
) -> list[tuple[str, np.float32]]:
    """Enumerate the dictionary exactly like SlowFuzzyQuery's rewrite and
    return the final clause list [(term, float32 boost)] in term order.
    `dictionary` must be the sorted unique term list (TermsEnum order)."""
    if min_sim >= 1.0 and min_sim != int(min_sim):
        raise ValueError("fractional edit distances are not allowed")
    if min_sim < 0.0:
        raise ValueError("minimumSimilarity < 0")
    if prefix_len < 0:
        raise ValueError("prefixLength < 0")

    term_length = len(text)
    real_prefix = min(prefix_len, term_length)
    prefix = text[:real_prefix]
    suffix = text[real_prefix:]
    n = len(suffix)

    # the ctor stores minimumSimilarity as FLOAT; initialMaxDistance is
    # the one DOUBLE spot ((1D - minimumSimilarity) * termLen)
    min_sim_f = np.float32(min_sim)
    if min_sim >= 1.0:
        raw, min_s = True, np.float32(0.0)
        max_edits = int(min_sim)
    else:
        raw, min_s = False, min_sim_f
        max_edits = int((1.0 - float(min_sim_f)) * term_length)
    scale = np.float32(np.float32(1.0) / (np.float32(1.0) - min_s))

    long_enough = term_length > 0 and (
        min_sim >= 1.0
        or np.float32(term_length)
        > np.float32(1.0) / (np.float32(1.0) - min_sim_f)
    )
    if not long_enough:
        # SingleTermsEnum: exact term only, default boost 1.0
        return [(text, np.float32(1.0))] if text in set(dictionary) else []

    cands = [t for t in sorted(set(dictionary)) if t.startswith(prefix)]

    def max_boost(n_edits: int) -> np.float32:
        sim = np.float32(
            np.float32(1.0) - np.float32(n_edits) / np.float32(term_length))
        return np.float32((sim - min_s) * scale)

    def accept(t: str, mode: str, cur_max: int):
        """None = rejected; else the float32 boost."""
        tsuf = t[real_prefix:]
        m = len(tsuf)
        if mode == "auto":
            # AutomatonFuzzyTermsEnum: levels are Levenshtein automata
            # over the suffix; ed computed by level walk
            ed = _lev(suffix, tsuf)
            if ed > cur_max:
                return None
            if t == text:
                return np.float32(1.0)
            sim = np.float32(
                np.float32(1.0)
                - np.float32(ed) / np.float32(min(len(t), term_length))
            )
            if sim > min_s:
                return np.float32((sim - min_s) * scale)
            return None
        # LinearFuzzyTermsEnum
        d = _lev(suffix, tsuf)
        if n != 0 and m != 0:
            if raw:
                max_dist = cur_max
            else:
                # calculateMaxDistance: float32 arithmetic then (int)
                max_dist = min(
                    cur_max,
                    int(np.float32(
                        (np.float32(1.0) - min_s)
                        * np.float32(min(n, m) + real_prefix))),
                )
            if max_dist < abs(m - n) or d > max_dist:
                return None
        if raw and d > cur_max:
            return None
        sim = np.float32(
            np.float32(1.0)
            - np.float32(d) / np.float32(real_prefix + min(n, m))
        )
        if raw or sim > min_s:
            return np.float32((sim - min_s) * scale)
        return None

    # ---- TopTermsRewrite collect loop with the bottom feedback ----
    pq: list[tuple[str, np.float32]] = []

    def worst_idx() -> int:
        wi = 0
        for i in range(1, len(pq)):
            ti, bi = pq[i]
            tw, bw = pq[wi]
            # ScoreTerm.compareTo: smaller boost is less; equal boosts:
            # lexicographically LARGER term is less (evicted first)
            if bi < bw or (bi == bw and ti > tw):
                wi = i
        return wi

    cur_max = max_edits
    mode = "auto" if cur_max <= 2 else "linear"
    attr_bottom: tuple[np.float32, str | None] = (np.float32(_FMIN), None)
    cached = attr_bottom
    queued: str | None = None
    i = 0
    while True:
        if queued is not None:
            term_after = cached[1] is None or queued >= cached[1]
            bottom_b = cached[0]
            while cur_max > 0 and (
                bottom_b >= max_boost(cur_max)
                if term_after
                else bottom_b > max_boost(cur_max)
            ):
                cur_max -= 1
            if cur_max <= 2:
                mode = "auto"
            queued = None
        # actualEnum.next(): first accepted candidate under current state
        boost = None
        while i < len(cands):
            boost = accept(cands[i], mode, cur_max)
            i += 1
            if boost is not None:
                break
        if boost is None:
            break
        t = cands[i - 1]
        if attr_bottom != cached:
            cached = attr_bottom
            queued = t
        # TopTermsRewrite.collect
        if len(pq) == max_expansions:
            wt, wb = pq[worst_idx()]
            if boost < wb or (boost == wb and t > wt):
                continue
        pq.append((t, boost))
        if len(pq) > max_expansions:
            pq.pop(worst_idx())
        if len(pq) == max_expansions:
            wt, wb = pq[worst_idx()]
            attr_bottom = (wb, wt)

    return sorted(pq)
