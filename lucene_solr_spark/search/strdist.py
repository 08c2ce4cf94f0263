"""StringDistance family (lucene/suggest/src/java/org/apache/lucene/
search/spell/: JaroWinklerDistance.java, NGramDistance.java,
LevensteinDistance.java, LuceneLevenshteinDistance.java) — the
similarity functions behind Solr's strdist() and the spellchecker
comparators. Pinned bit-for-bit (Float.toString) vs the compiled
classes in GT round 81. Float32 arithmetic replicated step-for-step,
including the quirks:

- JaroWinkler's prefix count compares s1/s2 in ARGUMENT order (not
  min/max), and the bonus is min(0.1, 1/maxLen) * prefix * (1 - j).
- NGramDistance pads the source with n-1 NUL prefix chars and
  discounts prefix matches from the per-gram denominator; DP cells are
  float32 with fractional substitution costs.
- LuceneLevenshteinDistance runs OSA with the TRANSPOSITION cell taking
  d[i-2][j-2] + cost (the current substitution cost, NOT +1) and
  normalizes by the MIN length (so it can go negative);
  LevensteinDistance normalizes plain Levenshtein by the MAX length.
"""

from __future__ import annotations

import numpy as np

_F = np.float32


def jaro_winkler(s1: str, s2: str, threshold: float = 0.7) -> np.float32:
    if len(s1) > len(s2):
        mx, mn = s1, s2
    else:
        mx, mn = s2, s1
    rng = max(len(mx) // 2 - 1, 0)
    match_idx = [-1] * len(mn)
    match_flags = [False] * len(mx)
    matches = 0
    for mi, c1 in enumerate(mn):
        for xi in range(max(mi - rng, 0), min(mi + rng + 1, len(mx))):
            if not match_flags[xi] and c1 == mx[xi]:
                match_idx[mi] = xi
                match_flags[xi] = True
                matches += 1
                break
    ms1 = [mn[i] for i in range(len(mn)) if match_idx[i] != -1]
    ms2 = [mx[i] for i in range(len(mx)) if match_flags[i]]
    transpositions = sum(1 for a, b in zip(ms1, ms2) if a != b)
    prefix = 0
    for mi in range(len(mn)):
        if s1[mi] == s2[mi]:
            prefix += 1
        else:
            break
    m = _F(matches)
    if matches == 0:
        return _F(0.0)
    t = transpositions // 2
    j = _F(
        _F(_F(m / _F(len(s1))) + _F(m / _F(len(s2)))) + _F((m - _F(t)) / m)
    ) / _F(3.0)
    j = _F(j)
    if j < _F(threshold):
        return j
    bonus = _F(
        _F(_F(min(_F(0.1), _F(_F(1.0) / _F(len(mx))))) * _F(prefix))
        * _F(_F(1.0) - j)
    )
    return _F(j + bonus)


def ngram_distance(source: str, target: str, n: int = 2) -> np.float32:
    sl, tl = len(source), len(target)
    if sl == 0 or tl == 0:
        return _F(1.0) if sl == tl else _F(0.0)
    if sl < n or tl < n:
        cost = sum(
            1 for i in range(min(sl, tl)) if source[i] == target[i])
        return _F(_F(cost) / _F(max(sl, tl)))
    sa = ["\x00"] * (n - 1) + list(source)
    p = [_F(i) for i in range(sl + 1)]
    for j in range(1, tl + 1):
        if j < n:
            t_j = ["\x00"] * (n - j) + list(target[: j])
        else:
            t_j = list(target[j - n: j])
        d = [_F(j)] + [_F(0.0)] * sl
        for i in range(1, sl + 1):
            cost = 0
            tn = n
            for ni in range(n):
                if sa[i - 1 + ni] != t_j[ni]:
                    cost += 1
                elif sa[i - 1 + ni] == "\x00":
                    tn -= 1
            ec = _F(_F(cost) / _F(tn))
            d[i] = _F(min(min(_F(d[i - 1] + _F(1.0)), _F(p[i] + _F(1.0))),
                          _F(p[i - 1] + ec)))
        p = d
    return _F(_F(1.0) - _F(p[sl] / _F(max(tl, sl))))


def levenstein_sim(target: str, other: str) -> np.float32:
    """LevensteinDistance.getDistance: 1 - lev/max(len)."""
    n, m = len(target), len(other)
    if n == 0 or m == 0:
        return _F(1.0) if n == m else _F(0.0)
    p = list(range(n + 1))
    for j in range(1, m + 1):
        t_j = other[j - 1]
        d = [j] + [0] * n
        for i in range(1, n + 1):
            cost = 0 if target[i - 1] == t_j else 1
            d[i] = min(d[i - 1] + 1, p[i] + 1, p[i - 1] + cost)
        p = d
    return _F(_F(1.0) - _F(_F(p[n]) / _F(max(n, m))))


def lucene_levenshtein_sim(target: str, other: str) -> np.float32:
    """LuceneLevenshteinDistance: OSA with the transposition cell at
    d[i-2][j-2] + cost, normalized by MIN length (may be negative)."""
    n, m = len(target), len(other)
    if n == 0 or m == 0:
        return _F(0.0) if n == m else _F(max(n, m))
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for j in range(1, m + 1):
        t_j = other[j - 1]
        for i in range(1, n + 1):
            cost = 0 if target[i - 1] == t_j else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + cost)
            if (i > 1 and j > 1 and target[i - 1] == other[j - 2]
                    and target[i - 2] == other[j - 1]):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + cost)
    return _F(_F(1.0) - _F(_F(d[n][m]) / _F(min(m, n))))
