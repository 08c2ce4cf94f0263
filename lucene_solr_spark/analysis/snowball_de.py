"""Snowball German2 stemmer — reference-exact port of
org/tartarus/snowball/ext/German2Stemmer.java (generated from the
published snowballstem.org german2 variant), as wrapped by
SnowballFilter("German2").

Pinned bit-for-bit against the COMPILED stemmer in
tests/test_misc_filters.py (GT round 65).

The algorithm:
  prelude pass 1: u/y between vowels are shielded as U/Y (rescanning
                  from the PRECEDING vowel after each mark)
  prelude pass 2: ß→ss, ae→ä, oe→ö, ue→ü, with 'qu' hopped over so a
                  q-u survives; pass 1 runs FIRST, so a shielded U in
                  'aue' blocks the ue→ü fold
  regions:        standard R1/R2 over vowels a e i o u y ä ö ü, with
                  R1 pushed to at least position 3
  step 1 (R1):    e em en ern er es dropped; s after a valid s-ending
                  (b d f g h k l m n r t)
  step 2 (R1):    en er est dropped; st after a valid st-ending (the
                  s-endings minus r) that has >= 3 chars before it
  step 3 (R2):    end/ung (then a non-e-preceded ig in R2); ig/isch/ik
                  unless preceded by e; lich/heit (then er/en in R1);
                  keit (then ig/lich in R2)
  postlude:       U→u Y→y ä→a ö→o ü→u
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyäöü")
_S_ENDING = frozenset("bdfghklmnrt")
_ST_ENDING = frozenset("bdfghklmnt")


def _prelude(w: str) -> str:
    # pass 1: shield u/y between vowels
    buf = list(w)
    i = 0
    while i < len(buf) - 2:
        if (
            buf[i] in _VOWELS
            and buf[i + 1] in ("u", "y")
            and buf[i + 2] in _VOWELS
        ):
            buf[i + 1] = buf[i + 1].upper()
            # the scanner resumes from the preceding vowel's position
            continue
        i += 1
    # pass 2: umlaut folds with the qu hop
    out: list[str] = []
    s = "".join(buf)
    i = 0
    n = len(s)
    while i < n:
        two = s[i:i + 2]
        if s[i] == "ß":
            out.append("ss")
            i += 1
        elif two == "ae":
            out.append("ä")
            i += 2
        elif two == "oe":
            out.append("ö")
            i += 2
        elif two == "ue":
            out.append("ü")
            i += 2
        elif two == "qu":
            out.append("qu")
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _mark_regions(w: str) -> tuple[int, int]:
    n = len(w)
    p1 = p2 = n
    if n < 3:
        return p1, p2
    i = 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    while i < n and w[i] in _VOWELS:
        i += 1
    if i >= n:
        return p1, p2
    p1 = i + 1
    if p1 < 3:
        p1 = 3
    # p2 continues scanning from where p1's gopast stopped (the raw
    # cursor, NOT the x-adjusted p1)
    j = i + 1
    while j < n and w[j] not in _VOWELS:
        j += 1
    while j < n and w[j] in _VOWELS:
        j += 1
    if j < n:
        p2 = j + 1
    return p1, p2


def german2_stem(word: str) -> str:
    w = _prelude(word)
    p1, p2 = _mark_regions(w)

    def in_r1(start: int) -> bool:
        return start >= p1

    def in_r2(start: int) -> bool:
        return start >= p2

    # ---- step 1 (longest of e em en ern er es / s) ----
    for suf in ("ern", "em", "en", "es", "er", "e", "s"):
        if w.endswith(suf):
            start = len(w) - len(suf)
            if suf == "s":
                if in_r1(start) and start > 0 and w[start - 1] in _S_ENDING:
                    w = w[:start]
            else:
                if in_r1(start):
                    w = w[:start]
            break

    # ---- step 2 (longest of en er est / st) ----
    for suf in ("est", "en", "er", "st"):
        if w.endswith(suf):
            start = len(w) - len(suf)
            if suf == "st":
                if (
                    in_r1(start)
                    and start > 0
                    and w[start - 1] in _ST_ENDING
                    and start - 1 >= 3
                ):
                    w = w[:start]
            else:
                if in_r1(start):
                    w = w[:start]
            break

    # ---- step 3 (derivational, R2) ----
    for suf in ("lich", "isch", "heit", "keit", "end", "ung", "ig", "ik"):
        if not w.endswith(suf):
            continue
        start = len(w) - len(suf)
        if suf in ("end", "ung"):
            if in_r2(start):
                w = w[:start]
                if (
                    w.endswith("ig")
                    and not w.endswith("eig")
                    and in_r2(len(w) - 2)
                ):
                    w = w[:-2]
        elif suf in ("ig", "isch", "ik"):
            if in_r2(start) and not (start > 0 and w[start - 1] == "e"):
                w = w[:start]
        elif suf in ("lich", "heit"):
            if in_r2(start):
                w = w[:start]
                for tail in ("er", "en"):
                    if w.endswith(tail) and in_r1(len(w) - 2):
                        w = w[:-2]
                        break
        elif suf == "keit":
            if in_r2(start):
                w = w[:start]
                for tail in ("lich", "ig"):
                    if w.endswith(tail) and in_r2(len(w) - len(tail)):
                        w = w[: -len(tail)]
                        break
        break

    # ---- postlude ----
    return (
        w.replace("Y", "y").replace("U", "u")
        .replace("ä", "a").replace("ö", "o").replace("ü", "u")
    )
