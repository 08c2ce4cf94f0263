"""Snowball Finnish stemmer — implemented from the published
snowballstem.org Finnish algorithm description, as wrapped by
SnowballFilter("Finnish") (reference:
lucene/analysis/common/src/java/org/tartarus/snowball/ext/FinnishStemmer.java,
generated code — semantics re-derived from the public spec, then pinned
bit-for-bit against the COMPILED stemmer; see tests/test_misc_filters.py
and tools/snowball_fuzz.py).

Region/limit semantics that matter for bit-parity (all verified against
the generated program's control flow):

* Each step's `among` match is limited to its region (R1 for
  particle/possessive/case/i-plural/t-plural part 1, R2 for
  other-endings/t-plural part 2): the MATCHED SUFFIX must lie entirely
  inside the region.
* Among-LEVEL conditions (the ``den/tten/siin`` -> Vi and ``seen`` ->
  long-vowel guards of the case step) run while the limit is still the
  region, so their tested characters must ALSO lie inside R1 — and on
  failure the among FALLS BACK to a shorter entry (``n``).
* Switch-level conditions (everything else: "preceded by ...") run
  after the limit is restored, so they may look before the region
  start — and on failure the whole step does nothing (no fallback).
* The possessive ``ni`` rule deletes FIRST and only then tests for a
  trailing ``kse`` -> ``ksi`` rewrite; when the test fails the deletion
  still stands (Snowball `do` semantics keep the mutation).
* tidy's first four rules are R1-limited (both tested chars), but the
  final undouble-last-consonant rule runs over the whole word.
"""

from __future__ import annotations

_V1 = frozenset("aeiouyäö")          # vowels incl. y
_V2 = frozenset("aeiouäö")           # vowels excl. y
_AEI = frozenset("aeiä")
_PARTICLE_END = _V1 | frozenset("nt")
_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")


def _mark_regions(w: str) -> tuple[int, int]:
    n = len(w)
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in _V1:
        i += 1
    while i < n and w[i] in _V1:
        i += 1
    if i < n:
        p1 = i + 1
        j = p1
        while j < n and w[j] not in _V1:
            j += 1
        while j < n and w[j] in _V1:
            j += 1
        if j < n:
            p2 = j + 1
    return p1, p2


def _longest_in(w: str, sufs, mark: int) -> str | None:
    best = None
    for s in sufs:
        if (w.endswith(s) and len(w) - len(s) >= mark
                and (best is None or len(s) > len(best))):
            best = s
    return best


_A0 = ("kin", "kaan", "kään", "ko", "kö", "han", "hän", "pa", "pä", "sti")
_A4 = ("nsa", "nsä", "mme", "nne", "ni", "si", "an", "en", "än")
_A1 = ("lla", "na", "ssa", "ta", "lta", "sta")
_A2 = ("llä", "nä", "ssä", "tä", "ltä", "stä")
_A3 = ("lle", "ine")
_A6 = ("a", "lla", "na", "ssa", "ta", "lta", "sta", "tta", "lle", "ine",
       "ksi", "n", "han", "den", "seen", "hen", "tten", "hin", "siin",
       "hon", "hän", "hön", "ä", "llä", "nä", "ssä", "tä", "ltä", "stä",
       "ttä")
_A7 = ("eja", "mma", "imma", "mpa", "impa", "mmi", "immi", "mpi", "impi",
       "ejä", "mmä", "immä", "mpä", "impä")
_HX = {"han": "a", "hen": "e", "hin": "i", "hon": "o", "hän": "ä",
       "hön": "ö"}


def _particle_etc(w: str, p1: int, p2: int) -> str:
    s = _longest_in(w, _A0, p1)
    if s is None:
        return w
    stem = len(w) - len(s)
    if s == "sti":
        if stem >= p2:
            return w[:stem]
        return w
    # preceded by n, t or a vowel (limit restored: may look before p1)
    if stem >= 1 and w[stem - 1] in _PARTICLE_END:
        return w[:stem]
    return w


def _possessive(w: str, p1: int) -> str:
    s = _longest_in(w, _A4, p1)
    if s is None:
        return w
    stem = len(w) - len(s)
    if s == "si":
        if stem >= 1 and w[stem - 1] == "k":
            return w
        return w[:stem]
    if s == "ni":
        w = w[:stem]
        if w.endswith("kse"):
            w = w[:-3] + "ksi"
        return w
    if s in ("nsa", "nsä", "mme", "nne"):
        return w[:stem]
    if s == "an":
        if any(w.endswith(t, 0, stem) for t in _A1):
            return w[:stem]
        return w
    if s == "än":
        if any(w.endswith(t, 0, stem) for t in _A2):
            return w[:stem]
        return w
    if s == "en":
        if any(w.endswith(t, 0, stem) for t in _A3):
            return w[:stem]
        return w
    return w


def _vi_ok(w: str, stem: int, p1: int) -> bool:
    # among-level guard: ...Vi immediately before the suffix, both chars
    # inside R1 (the limit is still p1 while the among runs)
    return (stem - 2 >= p1 and w[stem - 1] == "i" and w[stem - 2] in _V2)


def _long_ok(w: str, stem: int, p1: int) -> bool:
    return stem - 2 >= p1 and w[stem - 2:stem] in _LONG


def _case_ending(w: str, p1: int) -> tuple[str, bool]:
    cands = sorted(
        (s for s in _A6 if w.endswith(s) and len(w) - len(s) >= p1),
        key=len, reverse=True)
    s = None
    for c in cands:
        stem = len(w) - len(c)
        if c in ("den", "tten", "siin"):
            if _vi_ok(w, stem, p1):
                s = c
                break
        elif c == "seen":
            if _long_ok(w, stem, p1):
                s = c
                break
        else:
            s = c
            break
    if s is None:
        return w, False
    stem = len(w) - len(s)
    if s in _HX:                      # hXn preceded by X
        if stem >= 1 and w[stem - 1] == _HX[s]:
            return w[:stem], True
        return w, False
    if s in ("a", "ä"):               # preceded by cv
        if (stem >= 2 and w[stem - 1] in _V1 and w[stem - 2] not in _V1):
            return w[:stem], True
        return w, False
    if s in ("tta", "ttä"):           # preceded by e
        if stem >= 1 and w[stem - 1] == "e":
            return w[:stem], True
        return w, False
    if s == "n":
        # delete n; if preceded by LONG or 'ie', also delete one char
        if stem >= 2 and (w[stem - 2:stem] in _LONG
                          or w[stem - 2:stem] == "ie"):
            return w[:stem - 1], True
        return w[:stem], True
    return w[:stem], True             # unconditional forms


def _other_endings(w: str, p2: int) -> str:
    s = _longest_in(w, _A7, p2)
    if s is None:
        return w
    stem = len(w) - len(s)
    if s in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
        if w.endswith("po", 0, stem):
            return w
    return w[:stem]


def _i_plural(w: str, p1: int) -> str:
    if len(w) >= 1 and w[-1] in "ij" and len(w) - 1 >= p1:
        return w[:-1]
    return w


def _t_plural(w: str, p1: int, p2: int) -> str:
    if (len(w) >= 1 and w[-1] == "t" and len(w) - 1 >= p1
            and len(w) - 2 >= p1 and w[-2] in _V1):
        w = w[:-1]
        s = _longest_in(w, ("mma", "imma"), p2)
        if s is not None:
            stem = len(w) - len(s)
            if s == "mma" and w.endswith("po", 0, stem):
                return w
            return w[:stem]
    return w


def _tidy(w: str, p1: int) -> str:
    if len(w) < p1:
        return w
    # (a) ends with a long vowel wholly in R1 -> drop one char
    if len(w) - 2 >= p1 and w[-2:] in _LONG:
        w = w[:-1]
    # (b) a/e/i/ä preceded by a non-vowel, both in R1 -> drop the vowel
    if (len(w) >= 1 and w[-1] in _AEI and len(w) - 1 >= p1
            and len(w) - 2 >= p1 and w[-2] not in _V1):
        w = w[:-1]
    # (c) j preceded by o or u (both chars inside R1 — the limit is
    # still p1 for this rule's eq tests)
    if (len(w) >= 1 and w[-1] == "j" and len(w) - 1 >= p1
            and len(w) - 2 >= p1 and w[-2] in "ou"):
        w = w[:-1]
    # (d) o preceded by j (both chars inside R1)
    if (len(w) >= 1 and w[-1] == "o" and len(w) - 1 >= p1
            and len(w) - 2 >= p1 and w[-2] == "j"):
        w = w[:-1]
    # (e) undouble the last consonant (whole word, not R1-limited):
    # scan back over trailing vowels; if the consonant found is doubled,
    # delete one copy
    i = len(w) - 1
    while i >= 0 and w[i] in _V1:
        i -= 1
    if i >= 1 and w[i] not in _V1 and w[i - 1] == w[i]:
        w = w[:i] + w[i + 1:]
    return w


def finnish_stem(word: str) -> str:
    w = word
    p1, p2 = _mark_regions(w)
    ending_removed = False
    w = _particle_etc(w, p1, p2)
    w = _possessive(w, p1)
    w, ending_removed = _case_ending(w, p1)
    w = _other_endings(w, p2)
    if ending_removed:
        w = _i_plural(w, p1)
    else:
        w = _t_plural(w, p1, p2)
    w = _tidy(w, p1)
    return w
