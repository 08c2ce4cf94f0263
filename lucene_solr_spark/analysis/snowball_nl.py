"""Snowball Dutch stemmer — implemented from the published
snowballstem.org Dutch algorithm description, as wrapped by
SnowballFilter("Dutch") (reference:
lucene/analysis/common/src/java/org/tartarus/snowball/ext/DutchStemmer.java,
generated code — semantics re-derived from the public spec, then pinned
bit-for-bit against the COMPILED stemmer in tests/test_misc_filters.py,
GT round 85).

Prelude: strip umlaut/acute accents, then shield initial y, y after a
vowel, and i between vowels as Y/I (consonants thereafter). R1 is
pushed so at least 3 letters precede it.
  step 1: heden→heid (R1); en/ene after a valid en-ending (delete +
          undouble kk/dd/tt); s/se after a valid s-ending
  step 2: final e after a non-vowel in R1 (delete + undouble),
          recording the removal for step 3b's 'bar'
  step 3a: heid in R2 not after c → delete, then the step-1(b) en rule
  step 3b: end/ing (R2; then ig not after e, else undouble), ig (R2,
           not after e), lijk (R2, then step 2 again), baar (R2),
           bar (R2, only if step 2 removed an e)
  step 4: undouble vowel in C-VV-D (D a non-I non-vowel)
  postlude: Y→y, I→i
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyè")

_UNACCENT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _prelude(w: str) -> str:
    w = w.translate(_UNACCENT)
    buf = list(w)
    n = len(buf)
    for i in range(n):
        if buf[i] == "y" and (i == 0 or buf[i - 1] in _VOWELS):
            buf[i] = "Y"
        elif (buf[i] == "i" and 0 < i < n - 1
              and buf[i - 1] in _VOWELS and buf[i + 1] in _VOWELS):
            buf[i] = "I"
    return "".join(buf)


def _mark_r1_r2(w: str) -> tuple[int, int]:
    n = len(w)
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    while i < n and w[i] in _VOWELS:
        i += 1
    if i < n:
        p1 = i + 1
    if p1 < 3:
        p1 = 3
    j = p1 if p1 <= n else n
    # p2 scans from the raw gopast position, not the 3-adjusted p1
    j = i + 1 if i < n else n
    while j < n and w[j] not in _VOWELS:
        j += 1
    while j < n and w[j] in _VOWELS:
        j += 1
    if j < n:
        p2 = j + 1
    return p1, p2


def _undouble(w: str) -> str:
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w


def dutch_stem(word: str) -> str:
    w = _prelude(word)
    p1, p2 = _mark_r1_r2(w)

    def in_r1(start: int) -> bool:
        return start >= p1

    def in_r2(start: int) -> bool:
        return start >= p2

    # ---- step 1 ----
    for suf in ("heden", "ene", "en", "se", "s"):
        if not w.endswith(suf):
            continue
        start = len(w) - len(suf)
        if suf == "heden":
            if in_r1(start):
                w = w[:start] + "heid"
            break
        if suf in ("ene", "en"):
            if (in_r1(start) and start > 0
                    and w[start - 1] not in _VOWELS
                    and w[start - 3:start] != "gem"):
                w = _undouble(w[:start])
            break
        if (in_r1(start) and start > 0
                and w[start - 1] not in _VOWELS and w[start - 1] != "j"):
            w = w[:start]
        break

    # ---- step 2 ----
    e_removed = False
    if (w.endswith("e") and in_r1(len(w) - 1)
            and len(w) >= 2 and w[-2] not in _VOWELS):
        w = _undouble(w[:-1])
        e_removed = True

    # ---- step 3a ----
    if (w.endswith("heid") and in_r2(len(w) - 4)
            and (len(w) < 5 or w[-5] != "c")):
        w = w[:-4]
        if w.endswith("en"):
            start = len(w) - 2
            if (in_r1(start) and start > 0
                    and w[start - 1] not in _VOWELS
                    and w[start - 3:start] != "gem"):
                w = _undouble(w[:start])

    # ---- step 3b (longest of end ing ig lijk baar bar) ----
    for suf in ("baar", "lijk", "end", "ing", "bar", "ig"):
        if not w.endswith(suf):
            continue
        start = len(w) - len(suf)
        if suf in ("end", "ing"):
            if in_r2(start):
                w = w[:start]
                if (w.endswith("ig") and in_r2(len(w) - 2)
                        and (len(w) < 3 or w[-3] != "e")):
                    w = w[:-2]
                else:
                    w = _undouble(w)
            break
        if suf == "ig":
            if in_r2(start) and (start == 0 or w[start - 1] != "e"):
                w = w[:start]
            break
        if suf == "lijk":
            if in_r2(start):
                w = w[:start]
                # repeat step 2
                if (w.endswith("e") and in_r1(len(w) - 1)
                        and len(w) >= 2 and w[-2] not in _VOWELS):
                    w = _undouble(w[:-1])
            break
        if suf == "baar":
            if in_r2(start):
                w = w[:start]
            break
        if suf == "bar":
            if in_r2(start) and e_removed:
                w = w[:start]
            break

    # ---- step 4: undouble vowel ----
    if len(w) >= 4:
        c, v1, v2, d = w[-4], w[-3], w[-2], w[-1]
        if (c not in _VOWELS and d not in _VOWELS and d != "I"
                and v1 == v2 and v1 in "aeou"):
            w = w[:-2] + w[-1]

    return w.replace("Y", "y").replace("I", "i")
