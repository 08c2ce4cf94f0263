"""Snowball French stemmer — implemented from the published
snowballstem.org French algorithm description, as wrapped by
SnowballFilter("French") (reference:
lucene/analysis/common/src/java/org/tartarus/snowball/ext/FrenchStemmer.java,
generated code — semantics re-derived from the public spec, then pinned
bit-for-bit against the COMPILED stemmer in tests/test_misc_filters.py,
GT round 85).

Prelude shields u/i between vowels, y next to a vowel, and u after q as
U/I/Y (consonants thereafter). RV is position 3 after an initial double
vowel or par/col/tap, else after the first non-initial vowel.

Control flow mirrors the Snowball `or` chain: step 1's ment-family
entries alter the word but still FAIL the routine, so the verb steps
(2a, then 2b) run whenever step 1 didn't succeed; step 3 (Y→i / ç→c)
runs after a success, step 4 (residual) otherwise; steps 5 (undouble)
and 6 (un-accent) always run."""

from __future__ import annotations

_VOWELS = frozenset("aeiouyâàëéêèïîôûù")


def _prelude(w: str) -> str:
    buf = list(w)
    n = len(buf)
    i = 0
    while i < n:
        c = buf[i]
        if c in _VOWELS:
            # the trailing vowel is a LOOKAHEAD: the cursor lands on it,
            # so it can lead the next match (pinned: 'jouaient' →
            # joUaIent, the a both closes the U match and opens the I's)
            if i + 2 < n and buf[i + 1] == "u" and buf[i + 2] in _VOWELS:
                buf[i + 1] = "U"
                i += 2
                continue
            if i + 2 < n and buf[i + 1] == "i" and buf[i + 2] in _VOWELS:
                buf[i + 1] = "I"
                i += 2
                continue
            if i + 1 < n and buf[i + 1] == "y":
                buf[i + 1] = "Y"
                i += 2
                continue
        if c == "y" and i + 1 < n and buf[i + 1] in _VOWELS:
            buf[i] = "Y"
            i += 1
            continue
        if c == "q" and i + 1 < n and buf[i + 1] == "u":
            buf[i + 1] = "U"
            i += 2
            continue
        i += 1
    return "".join(buf)


def _mark_rv(w: str) -> int:
    n = len(w)
    if n >= 3 and ((w[0] in _VOWELS and w[1] in _VOWELS)
                   or w[:3] in ("par", "col", "tap")):
        return 3
    i = 1
    while i < n and w[i] not in _VOWELS:
        i += 1
    return min(i + 1, n)


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
    j = p1
    while j < n and w[j] not in _VOWELS:
        j += 1
    while j < n and w[j] in _VOWELS:
        j += 1
    if j < n:
        p2 = j + 1
    return p1, p2


def _longest(w: str, sufs, limit: int = 0) -> str | None:
    best = None
    for s in sufs:
        if (w.endswith(s) and len(s) <= len(w) - limit
                and (best is None or len(s) > len(best))):
            best = s
    return best


_S1_G1 = ("ance", "iqUe", "isme", "able", "iste", "eux", "ances",
          "iqUes", "ismes", "ables", "istes")
_S1_ATEUR = ("atrice", "ateur", "ation", "atrices", "ateurs", "ations")
_S1_EMENT = ("ement", "ements")
_S1_ITE = ("ité", "ités")
_S1_IF = ("if", "ive", "ifs", "ives")
_S1_EUSE = ("euse", "euses")
_S1_ISSEMENT = ("issement", "issements")
_S1_MENT = ("ment", "ments")

_S2A = (
    "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
    "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
    "irions", "irons", "iront", "is", "issaIent", "issais", "issait",
    "issant", "issante", "issantes", "issants", "isse", "issent",
    "isses", "issez", "issiez", "issions", "issons", "it",
)
_S2B_IONS = ("ions",)
_S2B_E = (
    "é", "ée", "ées", "és", "èrent", "er", "era", "erai", "eraIent",
    "erais", "erait", "eras", "erez", "eriez", "erions", "erons",
    "eront", "ez", "iez",
)
_S2B_A = (
    "âmes", "ât", "âtes", "a", "ai", "aIent", "ais", "ait", "ant",
    "ante", "antes", "ants", "as", "asse", "assent", "asses",
    "assiez", "assions",
)


def french_stem(word: str) -> str:
    w = _prelude(word)
    rv = _mark_rv(w)
    p1, p2 = _mark_r1_r2(w)

    def in_r1(start: int) -> bool:
        return start >= p1

    def in_r2(start: int) -> bool:
        return start >= p2

    def in_rv(start: int) -> bool:
        return start >= rv

    # ---- step 1: standard suffixes ----
    success = False      # a non-ment entry matched AND applied
    do_verbs = True      # step1 failed, or a ment-family entry matched
    suf = _longest(w, _S1_G1 + _S1_ATEUR + _S1_EMENT + _S1_ITE + _S1_IF
                   + _S1_EUSE + _S1_ISSEMENT + _S1_MENT
                   + ("logie", "logies", "usion", "ution", "usions",
                      "utions", "ence", "ences", "eaux", "aux",
                      "amment", "emment"))
    if suf is not None:
        start = len(w) - len(suf)
        if suf in _S1_G1:
            if in_r2(start):
                w = w[:start]
                success, do_verbs = True, False
        elif suf in _S1_ATEUR:
            if in_r2(start):
                w = w[:start]
                success, do_verbs = True, False
                if w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif suf in ("logie", "logies"):
            if in_r2(start):
                w = w[:start] + "log"
                success, do_verbs = True, False
        elif suf in ("usion", "ution", "usions", "utions"):
            if in_r2(start):
                w = w[:start] + "u"
                success, do_verbs = True, False
        elif suf in ("ence", "ences"):
            if in_r2(start):
                w = w[:start] + "ent"
                success, do_verbs = True, False
        elif suf in _S1_EMENT:
            if in_rv(start):
                w = w[:start]
                success, do_verbs = True, False
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    if in_r2(len(w) - 3):
                        w = w[:-3]
                    elif in_r1(len(w) - 3):
                        w = w[:-3] + "eux"
                elif (w.endswith("abl") and in_r2(len(w) - 3)) or \
                        (w.endswith("iqU") and in_r2(len(w) - 3)):
                    w = w[:-3]
                elif (w.endswith("ièr") and in_rv(len(w) - 3)) or \
                        (w.endswith("Ièr") and in_rv(len(w) - 3)):
                    w = w[:-3] + "i"
        elif suf in _S1_ITE:
            if in_r2(start):
                w = w[:start]
                success, do_verbs = True, False
                if w.endswith("abil"):
                    if in_r2(len(w) - 4):
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in _S1_IF:
            if in_r2(start):
                w = w[:start]
                success, do_verbs = True, False
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        if in_r2(len(w) - 2):
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif suf == "eaux":
            w = w[:start] + "eau"
            success, do_verbs = True, False
        elif suf == "aux":
            if in_r1(start):
                w = w[:start] + "al"
                success, do_verbs = True, False
        elif suf in _S1_EUSE:
            if in_r2(start):
                w = w[:start]
                success, do_verbs = True, False
            elif in_r1(start):
                w = w[:start] + "eux"
                success, do_verbs = True, False
        elif suf in _S1_ISSEMENT:
            if (in_r1(start) and start > 0
                    and w[start - 1] not in _VOWELS):
                w = w[:start]
                success, do_verbs = True, False
        elif suf == "amment":
            if in_rv(start):
                w = w[:start] + "ant"
            # snowball 'fail' marker: word altered, routine fails
        elif suf == "emment":
            if in_rv(start):
                w = w[:start] + "ent"
        elif suf in _S1_MENT:
            if start > 0 and w[start - 1] in _VOWELS and in_rv(start - 1):
                w = w[:start]

    # ---- steps 2a/2b: verb suffixes ----
    if do_verbs:
        verb_done = False
        suf = _longest(w, _S2A, limit=rv)
        if suf is not None:
            start = len(w) - len(suf)
            if start > 0 and w[start - 1] not in _VOWELS \
                    and in_rv(start - 1):
                w = w[:start]
                verb_done = True
        if not verb_done:
            suf = _longest(w, _S2B_IONS + _S2B_E + _S2B_A, limit=rv)
            if suf is not None:
                start = len(w) - len(suf)
                if suf in _S2B_IONS:
                    if in_r2(start):
                        w = w[:start]
                        verb_done = True
                elif suf in _S2B_E:
                    w = w[:start]
                    verb_done = True
                else:
                    w = w[:start]
                    verb_done = True
                    if w.endswith("e") and in_rv(len(w) - 1):
                        w = w[:-1]
        success = verb_done

    # ---- step 3 (after a success) or step 4 (residual) ----
    if success:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # the s-removal needs a preceding char (pinned: bare 's' stays)
        if w.endswith("s") and len(w) >= 2 and w[-2] not in "aiouès":
            w = w[:-1]
        suf = _longest(w, ("ion", "ier", "ière", "Ier", "Ière", "e", "ë"),
                       limit=rv)
        if suf is not None:
            start = len(w) - len(suf)
            if suf == "ion":
                if in_r2(start) and start > 0 and w[start - 1] in "st" \
                        and in_rv(start - 1):
                    w = w[:start]
            elif suf in ("ier", "ière", "Ier", "Ière"):
                w = w[:start] + "i"
            elif suf == "e":
                w = w[:start]
            else:  # ë
                if w[:start].endswith("gu"):
                    w = w[:start]

    # ---- step 5: undouble ----
    if w.endswith(("enn", "onn", "ett", "ell", "eill")):
        w = w[:-1]

    # ---- step 6: un-accent ----
    i = len(w) - 1
    while i >= 0 and w[i] not in _VOWELS:
        i -= 1
    # at least one non-vowel after the é/è
    if i >= 0 and i < len(w) - 1 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1:]

    return w.replace("I", "i").replace("U", "u").replace("Y", "y")
