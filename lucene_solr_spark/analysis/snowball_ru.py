"""Snowball Russian stemmer — implemented from the published
snowballstem.org Russian algorithm description, as wrapped by
SnowballFilter("Russian") (reference:
lucene/analysis/common/src/java/org/tartarus/snowball/ext/RussianStemmer.java,
generated code — semantics re-derived from the public spec, then pinned
bit-for-bit against the COMPILED stemmer in tests/test_misc_filters.py,
GT round 85).

All endings are removed inside RV (region after the first vowel); the
group-1 gerund/participle/verb endings require a preceding а/я which is
retained. Steps: 1 (perfective gerund | [reflexive] + adjectival/verb/
noun), 2 (final и), 3 (derivational ость/ост in R2), 4 (нн undouble |
superlative ейш(е) + undouble | final ь)."""

from __future__ import annotations

_VOWELS = frozenset("аеиоуыэюя")


def _mark(w: str) -> tuple[int, int]:
    """(rv, p2) — RV after the first vowel; R2 the standard second
    non-vowel-after-vowel region."""
    n = len(w)
    rv = n
    i = 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    if i < n:
        rv = i + 1
    p1 = p2 = n
    j = rv
    # p1: first non-vowel after a vowel (the scan above ended ON the
    # first vowel, continue from there)
    while j < n and w[j] in _VOWELS:
        j += 1
    if j < n:
        p1 = j + 1
    k = p1
    while k < n and w[k] not in _VOWELS:
        k += 1
    while k < n and w[k] in _VOWELS:
        k += 1
    if k < n:
        p2 = k + 1
    return rv, p2


_GERUND_1 = ("в", "вши", "вшись")
_GERUND_2 = ("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
_ADJECTIVE = (
    "ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой",
    "ем", "им", "ым", "ом", "его", "ого", "ему", "ому", "их", "ых",
    "ую", "юю", "ая", "яя", "ою", "ею",
)
_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")
_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_VERB_1 = (
    "ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но",
    "ет", "ют", "ны", "ть", "ешь", "нно",
)
_VERB_2 = (
    "ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей",
    "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят",
    "ует", "уют", "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю",
)
_NOUN = (
    "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи",
    "ии", "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием",
    "ем", "ам", "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию",
    "ью", "ю", "ия", "ья", "я",
)


def _longest(w: str, sufs, limit: int) -> str | None:
    best = None
    for s in sufs:
        if (w.endswith(s) and len(s) <= len(w) - limit
                and (best is None or len(s) > len(best))):
            best = s
    return best


def _try_grouped(w: str, g1, g2, limit: int) -> str | None:
    """One Snowball among over g1 (requires preceding а/я, retained)
    and g2 (unconditional): longest match wins; a failed g1 condition
    fails the whole among (no fallback to shorter suffixes)."""
    suf = _longest(w, g1 + g2, limit)
    if suf is None:
        return None
    start = len(w) - len(suf)
    if suf in g2:
        return w[:start]
    if start > limit - 0 and start > 0 and w[start - 1] in "ая" \
            and start - 1 >= limit:
        return w[:start]
    return None


def russian_stem(word: str) -> str:
    w = word
    rv, p2 = _mark(w)

    # ---- step 1 ----
    out = _try_grouped(w, _GERUND_1, _GERUND_2, rv)
    if out is not None:
        w = out
    else:
        refl = _longest(w, ("ся", "сь"), rv)
        if refl is not None:
            w = w[: len(w) - len(refl)]
        # adjectival = adjective [+ preceding participle]
        suf = _longest(w, _ADJECTIVE, rv)
        if suf is not None:
            w = w[: len(w) - len(suf)]
            out = _try_grouped(w, _PARTICIPLE_1, _PARTICIPLE_2, rv)
            if out is not None:
                w = out
        else:
            out = _try_grouped(w, _VERB_1, _VERB_2, rv)
            if out is not None:
                w = out
            else:
                suf = _longest(w, _NOUN, rv)
                if suf is not None:
                    w = w[: len(w) - len(suf)]

    # ---- step 2: final и ----
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # ---- step 3: derivational (in R2) ----
    suf = _longest(w, ("ость", "ост"), p2)
    if suf is not None:
        w = w[: len(w) - len(suf)]

    # ---- step 4 ----
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        suf = _longest(w, ("ейше", "ейш"), rv)
        if suf is not None:
            w = w[: len(w) - len(suf)]
            if w.endswith("нн") and len(w) - 1 >= rv:
                w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]

    return w
