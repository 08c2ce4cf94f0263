"""Snowball Catalan, Basque, Irish and Armenian stemmers — implemented
from the published snowballstem.org algorithm descriptions, as wrapped
by SnowballFilter(lang) (reference:
lucene/analysis/common/src/java/org/tartarus/snowball/ext/
{Catalan,Basque,Irish,Armenian}Stemmer.java, generated code — semantics
re-derived from the public specs; suffix tables extracted as behavior
data into snowball_misc_tables.py; each stemmer pinned bit-for-bit
against the COMPILED reference via tools/snowball_fuzz.py).

Shared semantics: each step finds the LONGEST matching table suffix
over the whole word (or within the RV setlimit where noted), then the
region guard (R1/R2/RV at the match boundary) is switch-level — a guard
failure means the step does nothing (no fallback to a shorter suffix).
"""

from __future__ import annotations

from .snowball_misc_tables import (
    CA_A0, CA_A1, CA_A2, CA_A3, CA_A4,
    EU_A0, EU_A1, EU_A2,
    GA_A0, GA_A1, GA_A2, GA_A3,
    HY_A0, HY_A1, HY_A2, HY_A3,
)


def _std_r1_r2(w: str, vowels) -> tuple[int, int]:
    n = len(w)
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in vowels:
        i += 1
    while i < n and w[i] in vowels:
        i += 1
    if i < n:
        p1 = i + 1
    j = p1
    while j < n and w[j] not in vowels:
        j += 1
    while j < n and w[j] in vowels:
        j += 1
    if j < n:
        p2 = j + 1
    return p1, p2


def _romance_rv(w: str, vowels) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in vowels:
        i = 2
        while i < n and w[i] not in vowels:
            i += 1
        return min(i + 1, n)
    if w[0] in vowels and w[1] in vowels:
        i = 2
        while i < n and w[i] in vowels:
            i += 1
        return min(i + 1, n)
    return 3


def _longest(w: str, table, limit: int = 0):
    """Longest (suffix, var) whose match lies within [limit, len(w))."""
    best = None
    for s, var in table:
        if (s and w.endswith(s) and len(w) - len(s) >= limit
                and (best is None or len(s) > len(best[0]))):
            best = (s, var)
    return best


# --------------------------------------------------------------------
# Catalan
# --------------------------------------------------------------------

_CA_V = frozenset("aeiouàáèéíïòóúü")
_CA_CLEAN = str.maketrans({"à": "a", "á": "a", "è": "e", "é": "e",
                           "ì": "i", "í": "i", "ï": "i", "ò": "o",
                           "ó": "o", "ú": "u", "ü": "u", "·": "."})


def _ca_step(w: str, table, actions, p1: int, p2: int):
    """Returns (new_word, succeeded) — success is distinct from change:
    an idempotent replacement (e.g. 'ic' -> 'ic' in R2) still counts as
    success, which matters for the standard-or-verb alternative."""
    m = _longest(w, table)
    if m is None:
        return w, False
    s, var = m
    stem = len(w) - len(s)
    region, repl = actions[var]
    mark = p1 if region == 1 else p2
    if stem < mark:
        return w, False
    return w[:stem] + repl, True


def catalan_stem(word: str) -> str:
    w = word
    p1, p2 = _std_r1_r2(w, _CA_V)
    w, _ = _ca_step(w, CA_A1, {1: (1, "")}, p1, p2)
    w, ok = _ca_step(w, CA_A2, {1: (1, ""), 2: (2, ""), 3: (2, "log"),
                                4: (2, "ic"), 5: (1, "c")}, p1, p2)
    if not ok:
        w, _ = _ca_step(w, CA_A3, {1: (1, ""), 2: (2, "")}, p1, p2)
    w, _ = _ca_step(w, CA_A4, {1: (1, ""), 2: (1, "ic")}, p1, p2)
    return w.translate(_CA_CLEAN)


# --------------------------------------------------------------------
# Basque
# --------------------------------------------------------------------

_EU_V = frozenset("aeiou")


def _eu_apply(w: str, k: int, table, actions, pv, p1, p2):
    """One among application at cursor k (suffix of w[:k], guards at
    the match boundary). Returns (new_word, new_cursor) or None.
    The cursor lands at the match start — Snowball's repeat carries it
    leftward across iterations AND into the next phase, so replaced
    text is never re-scanned."""
    m = _longest(w[:k], table)
    if m is None:
        return None
    s, var = m
    stem = k - len(s)
    region, repl = actions[var]
    mark = {0: 0, 1: p1, 2: p2, 3: pv}[region]
    if stem < mark:
        return None
    return w[:stem] + repl + w[k:], stem


_EU_ADITZAK = {1: (3, ""), 2: (2, ""), 3: (0, "atseden"),
               4: (0, "arabera"), 5: (0, "baditu")}
_EU_IZENAK = {1: (3, ""), 2: (2, ""), 3: (0, "jok"), 4: (1, ""),
              5: (0, "tra"), 6: (0, "minutu"), 7: (0, "zehar"),
              8: (0, "geldi"), 9: (0, "igaro"), 10: (0, "aurka")}
_EU_ADJ = {1: (3, ""), 2: (0, "z")}


def basque_stem(word: str) -> str:
    w = word
    pv = _romance_rv(w, _EU_V)
    p1, p2 = _std_r1_r2(w, _EU_V)
    k = len(w)
    while True:
        r = _eu_apply(w, k, EU_A0, _EU_ADITZAK, pv, p1, p2)
        if r is None:
            break
        w, k = r
    while True:
        r = _eu_apply(w, k, EU_A1, _EU_IZENAK, pv, p1, p2)
        if r is None:
            break
        w, k = r
    r = _eu_apply(w, k, EU_A2, _EU_ADJ, pv, p1, p2)
    if r is not None:
        w, k = r
    return w


# --------------------------------------------------------------------
# Irish
# --------------------------------------------------------------------

_GA_V = frozenset("aeiouáéíóú")
_GA_MORPH = {1: "", 2: "", 3: "f", 4: "", 5: "s", 6: "b", 7: "c",
             8: "d", 9: "f", 10: "g", 11: "p", 12: "s", 13: "t",
             14: "b", 15: "c", 16: "d", 17: "f", 18: "g", 19: "m",
             20: "p", 21: "t"}


def _ga_prefix(w: str) -> str:
    best = None
    for s, var in GA_A0:
        if w.startswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, var)
    if best is None:
        return w
    s, var = best
    return _GA_MORPH[var] + w[len(s):]


def _ga_marks(w: str) -> tuple[int, int, int]:
    n = len(w)
    pv = n
    i = 0
    while i < n and w[i] not in _GA_V:
        i += 1
    if i < n:
        pv = i + 1
    p1, p2 = _std_r1_r2(w, _GA_V)
    return pv, p1, p2


def _ga_step(w, table, actions, pv, p1, p2):
    m = _longest(w, table)
    if m is None:
        return w
    s, var = m
    stem = len(w) - len(s)
    region, repl = actions[var]
    mark = {0: 0, 1: p1, 2: p2, 3: pv}[region]
    if stem < mark:
        return w
    return w[:stem] + repl


def irish_stem(word: str) -> str:
    w = _ga_prefix(word)
    pv, p1, p2 = _ga_marks(w)
    w = _ga_step(w, GA_A1, {1: (1, ""), 2: (2, "")}, pv, p1, p2)
    w = _ga_step(w, GA_A2, {1: (2, ""), 2: (0, "arc"), 3: (0, "gin"),
                            4: (0, "graf"), 5: (0, "paite"),
                            6: (0, "óid")}, pv, p1, p2)
    w = _ga_step(w, GA_A3, {1: (3, ""), 2: (1, "")}, pv, p1, p2)
    return w


# --------------------------------------------------------------------
# Armenian
# --------------------------------------------------------------------

_HY_V = frozenset("աեէըիուօ")


def _hy_marks(w: str) -> tuple[int, int]:
    n = len(w)
    pv = p2 = n
    i = 0
    while i < n and w[i] not in _HY_V:
        i += 1
    if i >= n:
        return pv, p2
    pv = i + 1
    j = pv
    while j < n and w[j] in _HY_V:
        j += 1
    if j >= n:
        return pv, p2
    j += 1                      # past the consonant
    while j < n and w[j] not in _HY_V:
        j += 1
    if j >= n:
        return pv, p2
    j += 1                      # past the second vowel
    while j < n and w[j] in _HY_V:
        j += 1
    if j >= n:
        return pv, p2
    p2 = j + 1                  # past the second consonant
    return pv, p2


def armenian_stem(word: str) -> str:
    w = word
    pv, p2 = _hy_marks(w)
    if len(w) < pv:
        return w
    m = _longest(w, HY_A3, pv)
    if m is not None and len(w) - len(m[0]) >= p2:
        w = w[:len(w) - len(m[0])]
    for table in (HY_A1, HY_A0, HY_A2):
        m = _longest(w, table, pv)
        if m is not None:
            w = w[:len(w) - len(m[0])]
    return w
