"""Snowball Scandinavian stemmers (Norwegian, Danish, Swedish) —
implemented from the published snowballstem.org algorithm descriptions,
as wrapped by SnowballFilter("Norwegian"/"Danish"/"Swedish")
(reference: org/tartarus/snowball/ext/{Norwegian,Danish,Swedish}Stemmer.java,
generated code — semantics re-derived from the public specs, then
pinned bit-for-bit against the COMPILED stemmers in
tests/test_misc_filters.py, GT round 85b).

All three share the shape: R1 (pushed to at least 3 letters), one big
longest-match suffix step with an s-ending condition, a consonant-pair
tidy step, and a small derivational step."""

from __future__ import annotations

_NO_VOWELS = frozenset("aeiouyæåø")
_DA_VOWELS = frozenset("aeiouyæåø")
_SV_VOWELS = frozenset("aeiouyäåö")


def _mark_r1(w: str, vowels) -> int:
    n = len(w)
    p1 = n
    i = 0
    while i < n and w[i] not in vowels:
        i += 1
    while i < n and w[i] in vowels:
        i += 1
    if i < n:
        p1 = i + 1
    if p1 < 3:
        p1 = 3
    return p1


def _longest(w: str, sufs, limit: int) -> str | None:
    best = None
    for s in sufs:
        if (w.endswith(s) and len(s) <= len(w) - limit
                and (best is None or len(s) > len(best))):
            best = s
    return best


# ------------------------------------------------------------ Norwegian

_NO_S1 = (
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
    "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
    "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast",
)
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")


def norwegian_stem(word: str) -> str:
    w = word
    p1 = _mark_r1(w, _NO_VOWELS)
    # step 1 (longest among the deletes, s, erte/ert)
    suf = _longest(w, _NO_S1 + ("s", "erte", "ert"), p1)
    if suf is not None:
        start = len(w) - len(suf)
        if suf in ("erte", "ert"):
            w = w[:start] + "er"
        elif suf == "s":
            # valid s-ending: the listed consonants, or k NOT preceded
            # by a vowel
            prev = w[start - 1] if start > 0 else ""
            prev2 = w[start - 2] if start > 1 else ""
            if prev in _NO_S_END or (
                    prev == "k" and prev2 not in _NO_VOWELS):
                w = w[:start]
        else:
            w = w[:start]
    # step 2: dt/vt entirely in R1 (setlimit) -> drop t
    if len(w) >= 2 and w[-2:] in ("dt", "vt") and len(w) - 2 >= p1:
        w = w[:-1]
    # step 3
    suf = _longest(w, ("leg", "eleg", "ig", "eig", "lig", "elig", "els",
                       "lov", "elov", "slov", "hetslov"), p1)
    if suf is not None:
        w = w[: len(w) - len(suf)]
    return w


# --------------------------------------------------------------- Danish

_DA_S1 = (
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
    "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
    "hedens", "erens", "ers", "ets", "erets", "et", "eret",
)
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")


def danish_stem(word: str) -> str:
    w = word
    p1 = _mark_r1(w, _DA_VOWELS)
    suf = _longest(w, _DA_S1 + ("s",), p1)
    if suf is not None:
        start = len(w) - len(suf)
        if suf == "s":
            if start > 0 and w[start - 1] in _DA_S_END:
                w = w[:start]
        else:
            w = w[:start]
    # step 2: gd dt gt kt entirely in R1 (setlimit) -> drop last letter
    if len(w) >= 2 and w[-2:] in ("gd", "dt", "gt", "kt") \
            and len(w) - 2 >= p1:
        w = w[:-1]
    # step 3: igst -> drop st; then lig/elig/els delete-in-R1 + repeat
    # step 2; løst -> løs
    if _longest(w, ("igst",), p1) is not None:
        w = w[:-2]
    suf = _longest(w, ("ig", "lig", "elig", "els", "løst"), p1)
    if suf is not None:
        start = len(w) - len(suf)
        if suf == "løst":
            w = w[:-1]
        else:
            w = w[:start]
            if len(w) >= 2 and w[-2:] in ("gd", "dt", "gt", "kt") \
                    and len(w) - 2 >= p1:
                w = w[:-1]
    # step 4 (undouble): same consonant twice at the end, in R1
    if (len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _DA_VOWELS
            and len(w) - 1 >= p1):
        w = w[:-1]
    return w


# -------------------------------------------------------------- Swedish

_SV_S1 = (
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern",
    "ar", "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es",
    "ades", "andes", "ens", "arens", "hetens", "erns", "at", "andet",
    "het", "ast",
)
_SV_S_END = frozenset("bcdfghjklmnoprtvy")


def swedish_stem(word: str) -> str:
    w = word
    p1 = _mark_r1(w, _SV_VOWELS)
    suf = _longest(w, _SV_S1 + ("s",), p1)
    if suf is not None:
        start = len(w) - len(suf)
        if suf == "s":
            if start > 0 and w[start - 1] in _SV_S_END:
                w = w[:start]
        else:
            w = w[:start]
    # step 2: dd gd nn dt gt kt tt entirely in R1 -> drop last letter
    if len(w) >= 2 and w[-2:] in ("dd", "gd", "nn", "dt", "gt", "kt",
                                  "tt") and len(w) - 2 >= p1:
        w = w[:-1]
    # step 3
    suf = _longest(w, ("lig", "ig", "els", "löst", "fullt"), p1)
    if suf is not None:
        if suf == "löst":
            w = w[:-1]
        elif suf == "fullt":
            w = w[:-1]
        else:
            w = w[: len(w) - len(suf)]
    return w
