"""Snowball English stemmer (Porter2) — reference-exact port of
org/tartarus/snowball/ext/EnglishStemmer.java (generated from the
published snowballstem.org english.sbl grammar) as wrapped by
lucene/analysis/common/.../snowball/SnowballFilter.java.

Pinned bit-for-bit against the COMPILED reference stemmer in
tests/test_misc_filters.py (GT round 56): every fuzzed token stems to
the identical string.

The algorithm (public, snowballstem.org "The English (Porter2)
stemming algorithm"):
  prelude:   strip one leading apostrophe; y at start or after a vowel
             becomes consonant-marker Y
  regions:   R1 after gener|commun|arsen prefix, else after the first
             non-vowel that follows a vowel; R2 the same rule inside R1
  step 0:    longest of '  's  's'  removed
  step 1a:   sses->ss | ied/ies->i(or ie when the stem is one letter)
             | s deleted when a vowel precedes the pre-s position
  (stop on exception2: inning outing canning herring earring proceed
   exceed succeed)
  step 1b:   eed/eedly->ee in R1; ed/edly/ing/ingly deleted when the
             stem holds a vowel, then at/bl/iz+e, double-consonant
             undouble, short-word+e
  step 1c:   final y/Y -> i after a non-vowel that is not the first char
  steps 2-4: suffix maps gated on R1/R2 with LONGEST-match-then-test
             semantics (a too-short region match blocks, never falls
             back to a shorter suffix)
  step 5:    final e dropped in R2, or in R1 when not after a short
             syllable; final l dropped in R2 after l
  postlude:  Y -> y

Whole-word exception1 (skis->ski ... plus invariants sky/news/howe/
atlas/cosmos/bias/andes) and the <=2-letter short-circuit happen before
everything.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXCEPTION2 = frozenset({
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
})

_STEP2 = [
    # (suffix, replacement) — longest match wins; None repl = special
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", None), ("li", None),
]

_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", None),
    ("ical", "ic"), ("ness", ""), ("ful", ""),
]

_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
]


def _is_vowel(ch: str) -> bool:
    return ch in _VOWELS


def _mark_regions(w: str) -> tuple[int, int]:
    n = len(w)
    p1 = n
    for pref in ("gener", "commun", "arsen"):
        if w.startswith(pref):
            p1 = len(pref)
            break
    else:
        i = 0
        while i < n and not _is_vowel(w[i]):
            i += 1
        while i < n and _is_vowel(w[i]):
            i += 1
        if i < n:
            p1 = i + 1
    p2 = n
    i = p1
    while i < n and not _is_vowel(w[i]):
        i += 1
    while i < n and _is_vowel(w[i]):
        i += 1
    if i < n:
        p2 = i + 1
    return p1, p2


def _ends_short_syllable(w: str) -> bool:
    n = len(w)
    if n == 2:
        return _is_vowel(w[0]) and not _is_vowel(w[1])
    if n >= 3:
        c1, v, c2 = w[-3], w[-2], w[-1]
        return (
            not _is_vowel(c1)
            and _is_vowel(v)
            and not _is_vowel(c2)
            and c2 not in ("w", "x", "Y")
        )
    return False


def porter2_stem(word: str) -> str:
    """Stem one (already-lowercased) token. Non-ASCII / mixed content
    flows through the same machine, exactly like SnowballProgram."""
    if word in _EXCEPTION1:
        return _EXCEPTION1[word]
    if len(word) <= 2:
        return word

    w = word
    # prelude
    y_found = False
    if w.startswith("'"):
        w = w[1:]
    if w.startswith("y"):
        w = "Y" + w[1:]
        y_found = True
    chars = list(w)
    for i in range(1, len(chars)):
        if chars[i] == "y" and _is_vowel(chars[i - 1]):
            chars[i] = "Y"
            y_found = True
    w = "".join(chars)

    # R1/R2 are marked ONCE on the prelude'd word (snowball sets I_p1 /
    # I_p2 before the backward steps); every later edit touches only the
    # tail, and a region test is "the suffix starts at >= p":
    p1, p2 = _mark_regions(w)

    # step 0
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith("us") or w.endswith("ss"):
        pass
    elif w.endswith("s"):
        if any(_is_vowel(c) for c in w[:-2]):
            w = w[:-1]

    if w in _EXCEPTION2:
        return w

    # step 1b (longest-match order: eedly/ingly 5, edly 4, eed/ing 3, ed 2)
    suf = None
    for s in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if w.endswith(s):
            suf = s
            break
    if suf in ("eed", "eedly"):
        if len(w) - len(suf) >= p1:
            w = w[: -len(suf)] + "ee"
    elif suf is not None:
        stem = w[: -len(suf)]
        if any(_is_vowel(c) for c in stem):
            w = stem
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif w.endswith(_DOUBLES):
                w = w[:-1]
            elif _ends_short_syllable(w) and p1 >= len(w):
                w += "e"

    # step 1c
    if (
        len(w) > 2
        and w[-1] in ("y", "Y")
        and not _is_vowel(w[-2])
    ):
        w = w[:-1] + "i"

    # step 2
    for sfx, repl in _STEP2:
        if w.endswith(sfx):
            if len(w) - len(sfx) >= p1:
                if sfx == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif sfx == "li":
                    if len(w) > 2 and w[-3] in _LI_ENDING:
                        w = w[:-2]
                else:
                    w = w[: -len(sfx)] + repl
            break

    # step 3
    for sfx, repl in _STEP3:
        if w.endswith(sfx):
            if len(w) - len(sfx) >= p1:
                if sfx == "ative":
                    if len(w) - len(sfx) >= p2:
                        w = w[: -len(sfx)]
                else:
                    w = w[: -len(sfx)] + repl
            break

    # step 4
    for sfx in _STEP4:
        if w.endswith(sfx):
            if len(w) - len(sfx) >= p2:
                if sfx == "ion":
                    if len(w) > 3 and w[-4] in ("s", "t"):
                        w = w[:-3]
                else:
                    w = w[: -len(sfx)]
            break

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= p2:
            w = w[:-1]
        elif len(w) - 1 >= p1 and not _ends_short_syllable(w[:-1]):
            w = w[:-1]
    elif w.endswith("l"):
        if len(w) - 1 >= p2 and len(w) > 1 and w[-2] == "l":
            w = w[:-1]

    if y_found:
        w = w.replace("Y", "y")
    return w
