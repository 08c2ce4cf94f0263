"""Snowball Italian stemmer — implemented from the published
snowballstem.org Italian algorithm description, as wrapped by
SnowballFilter("Italian") (reference:
lucene/analysis/common/src/java/org/tartarus/snowball/ext/ItalianStemmer.java,
generated code — semantics re-derived from the public spec, then pinned
bit-for-bit against the COMPILED stemmer in tests/test_misc_filters.py,
GT round 85).

Prelude: acute→grave accents, then shield u-after-q and u/i between
vowels as U/I (shielded letters are NOT vowels for region marking).
Steps (Snowball `among` longest-match; RV-limited steps can only match
suffixes lying entirely inside RV):
  step 0: attached pronoun after ando/endo (delete) or ar/er/ir (→e)
  step 1: standard (mostly R2) suffixes
  step 2: verb suffixes in RV (only if step 1 did nothing)
  step 3a: final vowel (then a preceding i) in RV
  step 3b: ch→c / gh→g in RV
  postlude: U→u, I→i
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouàèìòù")

_ACUTE2GRAVE = str.maketrans("áéíóú", "àèìòù")


def _prelude(w: str) -> str:
    w = w.translate(_ACUTE2GRAVE)
    buf = list(w)
    for i in range(1, len(buf)):
        if buf[i] == "u" and buf[i - 1] == "q":
            buf[i] = "U"
    for i in range(1, len(buf) - 1):
        if (buf[i] in ("u", "i") and buf[i - 1] in _VOWELS
                and buf[i + 1] in _VOWELS):
            buf[i] = buf[i].upper()
    return "".join(buf)


def _mark_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _VOWELS:
        i = 2
        while i < n and w[i] not in _VOWELS:
            i += 1
        return min(i + 1, n)
    if w[0] in _VOWELS and w[1] in _VOWELS:
        i = 2
        while i < n and w[i] in _VOWELS:
            i += 1
        return min(i + 1, n)
    return 3


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


_PRONOUNS = (
    "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
    "sene", "gliela", "gliele", "glieli", "glielo", "gliene", "mela",
    "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
    "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
    "veli", "velo", "vene",
)
_P0_A = ("ando", "endo")
_P0_B = ("ar", "er", "ir")

_S1_DELETE_R2 = (
    "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi",
    "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista",
    "iste", "isti", "istà", "istè", "istì", "oso", "osi", "osa",
    "ose", "mente", "atrice", "atrici", "ante", "anti",
)
_S1_AZIONE = ("azione", "azioni", "atore", "atori")
_S1_AMENTO_RV = ("amento", "amenti", "imento", "imenti")
_S1_IVO = ("ivo", "ivi", "iva", "ive")

_S2 = (
    "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
    "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
    "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
    "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
    "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
    "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
    "Yamo", "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
    "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti",
    "irete", "irò", "irono", "isca", "iscano", "isce", "isci",
    "isco", "iscono", "issero", "ita", "ite", "iti", "ito", "iva",
    "ivamo", "ivano", "ivate", "ivi", "ivo", "ono", "uta", "ute",
    "uti", "uto", "ar", "ir",
)
_S3A = ("a", "e", "i", "o", "à", "è", "ì", "ò")


def italian_stem(word: str) -> str:
    w = _prelude(word)
    rv = _mark_rv(w)
    p1, p2 = _mark_r1_r2(w)

    def in_r1(start: int) -> bool:
        return start >= p1

    def in_r2(start: int) -> bool:
        return start >= p2

    def in_rv(start: int) -> bool:
        return start >= rv

    # ---- step 0: attached pronoun ----
    pron = _longest(w, _PRONOUNS, limit=rv)
    if pron is not None:
        base = w[: len(w) - len(pron)]
        lead = _longest(base, _P0_A + _P0_B, limit=rv)
        if lead is not None:
            if lead in _P0_A:
                w = base
            else:
                # ar/er/ir stay; only the pronoun becomes e
                # (accomodarci -> accomodare)
                w = base + "e"

    # ---- step 1: standard suffixes ----
    step1_done = False
    suf = _longest(w, _S1_DELETE_R2 + _S1_AZIONE + _S1_AMENTO_RV
                   + _S1_IVO
                   + ("logia", "logie", "uzione", "uzioni", "usione",
                      "usioni", "enza", "enze", "amente", "ità"))
    if suf is not None:
        start = len(w) - len(suf)
        if suf in _S1_DELETE_R2:
            if in_r2(start):
                w = w[:start]
                step1_done = True
        elif suf in _S1_AZIONE:
            if in_r2(start):
                w = w[:start]
                step1_done = True
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("logia", "logie"):
            if in_r2(start):
                w = w[:start] + "log"
                step1_done = True
        elif suf in ("uzione", "uzioni", "usione", "usioni"):
            if in_r2(start):
                w = w[:start] + "u"
                step1_done = True
        elif suf in ("enza", "enze"):
            if in_r2(start):
                w = w[:start] + "ente"
                step1_done = True
        elif suf in _S1_AMENTO_RV:
            if in_rv(start):
                w = w[:start]
                step1_done = True
        elif suf == "amente":
            if in_r1(start):
                w = w[:start]
                step1_done = True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                else:
                    for pre in ("os", "ic"):
                        if w.endswith(pre) and in_r2(len(w) - 2):
                            w = w[:-2]
                            break
                    else:
                        if w.endswith("abil") and in_r2(len(w) - 4):
                            w = w[:-4]
        elif suf == "ità":
            if in_r2(start):
                w = w[:start]
                step1_done = True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: len(w) - len(pre)]
                        break
        elif suf in _S1_IVO:
            if in_r2(start):
                w = w[:start]
                step1_done = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic") and in_r2(len(w) - 2):
                        w = w[:-2]

    # ---- step 2: verb suffixes (only if step 1 did nothing) ----
    if not step1_done:
        suf = _longest(w, _S2, limit=rv)
        if suf is not None:
            w = w[: len(w) - len(suf)]

    # ---- step 3a: final vowel, then a preceding i ----
    suf = _longest(w, _S3A, limit=rv)
    if suf is not None:
        w = w[:-1]
        if w.endswith("i") and in_rv(len(w) - 1):
            w = w[:-1]

    # ---- step 3b: ch -> c, gh -> g ----
    suf = _longest(w, ("ch", "gh"), limit=rv)
    if suf is not None:
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")
