"""Snowball Spanish stemmer — implemented from the published
snowballstem.org Spanish algorithm description, as wrapped by
SnowballFilter("Spanish") (reference:
lucene/analysis/common/src/java/org/tartarus/snowball/ext/SpanishStemmer.java,
generated code — semantics re-derived from the public spec, then pinned
bit-for-bit against the COMPILED stemmer in tests/test_misc_filters.py,
GT round 85).

Algorithm shape (all suffix matching is Snowball `among` semantics:
LONGEST matching suffix of the step's whole list wins, then that
suffix's rule applies or the step does nothing — no fallback to a
shorter suffix):
  step 0: attached pronoun after a gerund/infinitive ending in RV
  step 1: standard (mostly R2) suffixes
  step 2a: -y verb suffixes preceded by u (only if step 1 did nothing)
  step 2b: other verb suffixes (only if 2a did nothing)
  step 3: residual vowel suffixes in RV
  postlude: strip acute accents
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouáéíóúü")

_UNACCENT = str.maketrans("áéíóú", "aeiou")


def _mark_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _VOWELS:
        # consonant in position 2: after the next following vowel
        i = 2
        while i < n and w[i] not in _VOWELS:
            i += 1
        return min(i + 1, n)
    if w[0] in _VOWELS and w[1] in _VOWELS:
        # two vowels: after the next consonant
        i = 2
        while i < n and w[i] in _VOWELS:
            i += 1
        return min(i + 1, n)
    # consonant-vowel: after the third letter
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
    """Snowball `among` with `setlimit`: the longest suffix that lies
    ENTIRELY within [limit, len(w)) — a longer suffix crossing the limit
    cannot match at all (it is not merely rejected afterwards)."""
    best = None
    for s in sufs:
        if (w.endswith(s) and len(s) <= len(w) - limit
                and (best is None or len(s) > len(best))):
            best = s
    return best


_PRONOUNS = (
    "me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo",
    "las", "les", "los", "nos",
)
_P0_A = ("iéndo", "ándo", "ár", "ér", "ír")
_P0_B = ("ando", "iendo", "ar", "er", "ir")

_S1_DELETE_R2 = (
    "anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
    "osos", "osas", "amiento", "amientos", "imiento", "imientos",
)
_S1_ADOR = (
    "adora", "ador", "ación", "adoras", "adores", "aciones", "ante",
    "antes", "ancia", "ancias",
)
_S1_IDAD = ("idad", "idades")
_S1_IVA = ("iva", "ivo", "ivas", "ivos")

_S2A = (
    "ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó", "yas",
    "yes", "yais", "yamos",
)
_S2B_GU = ("en", "es", "éis", "emos")
_S2B = (
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
    "aríamos", "aremos", "ará", "aré", "erían", "erías", "erán",
    "erás", "eríais", "ería", "eréis", "eríamos", "eremos", "erá",
    "eré", "irían", "irías", "irán", "irás", "iríais", "iría",
    "iréis", "iríamos", "iremos", "irá", "iré", "aba", "ada", "ida",
    "ía", "ara", "iera", "ad", "ed", "id", "ase", "iese", "aste",
    "iste", "an", "aban", "ían", "aran", "ieran", "asen", "iesen",
    "aron", "ieron", "ado", "ido", "ando", "iendo", "ió", "ar", "er",
    "ir", "as", "abas", "adas", "idas", "ías", "aras", "ieras",
    "ases", "ieses", "ís", "áis", "abais", "íais", "arais", "ierais",
    "aseis", "ieseis", "asteis", "isteis", "ados", "idos", "amos",
    "ábamos", "íamos", "imos", "áramos", "iéramos", "iésemos",
    "ásemos",
)
_S3_DEL = ("os", "a", "o", "á", "í", "ó")
_S3_E = ("e", "é")


def spanish_stem(word: str) -> str:
    w = word
    rv = _mark_rv(w)
    p1, p2 = _mark_r1_r2(w)

    def in_rv(start: int) -> bool:
        return start >= rv

    def in_r1(start: int) -> bool:
        return start >= p1

    def in_r2(start: int) -> bool:
        return start >= p2

    # ---- step 0: attached pronoun ----
    pron = _longest(w, _PRONOUNS, limit=rv)
    if pron is not None:
        base = w[: len(w) - len(pron)]
        lead = _longest(base, _P0_A + _P0_B + ("yendo",), limit=rv)
        if lead is not None:
            start = len(base) - len(lead)
            if lead in _P0_A:
                w = base[:start] + lead.translate(_UNACCENT)
            elif lead in _P0_B:
                w = base
            elif (lead == "yendo"
                  and start > 0 and base[start - 1] == "u"):
                # the preceding u may sit OUTSIDE RV
                w = base

    # ---- step 1: standard suffixes ----
    step1_done = False
    suf = _longest(w, _S1_DELETE_R2 + _S1_ADOR + _S1_IDAD + _S1_IVA
                   + ("logía", "logías", "ución", "uciones", "encia",
                      "encias", "amente", "mente"))
    if suf is not None:
        start = len(w) - len(suf)
        if suf in _S1_DELETE_R2:
            if in_r2(start):
                w = w[:start]
                step1_done = True
        elif suf in _S1_ADOR:
            if in_r2(start):
                w = w[:start]
                step1_done = True
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("logía", "logías"):
            if in_r2(start):
                w = w[:start] + "log"
                step1_done = True
        elif suf in ("ución", "uciones"):
            if in_r2(start):
                w = w[:start] + "u"
                step1_done = True
        elif suf in ("encia", "encias"):
            if in_r2(start):
                w = w[:start] + "ente"
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
                    for pre in ("os", "ic", "ad"):
                        if w.endswith(pre) and in_r2(len(w) - 2):
                            w = w[:-2]
                            break
        elif suf == "mente":
            if in_r2(start):
                w = w[:start]
                step1_done = True
                for pre in ("ante", "able", "ible"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: len(w) - len(pre)]
                        break
        elif suf in _S1_IDAD:
            if in_r2(start):
                w = w[:start]
                step1_done = True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: len(w) - len(pre)]
                        break
        elif suf in _S1_IVA:
            if in_r2(start):
                w = w[:start]
                step1_done = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]

    # ---- step 2a / 2b: verb suffixes (only if step 1 did nothing) ----
    if not step1_done:
        step2a_done = False
        suf = _longest(w, _S2A, limit=rv)
        if suf is not None:
            start = len(w) - len(suf)
            # the preceding u may sit OUTSIDE RV (pinned: 'ayuyeron')
            if start > 0 and w[start - 1] == "u":
                w = w[:start]
                step2a_done = True
        if not step2a_done:
            suf = _longest(w, _S2B + _S2B_GU, limit=rv)
            if suf is not None:
                start = len(w) - len(suf)
                w = w[:start]
                if suf in _S2B_GU and w.endswith("gu") \
                        and in_rv(len(w) - 1):
                    w = w[:-1]

    # ---- step 3: residual suffix ----
    suf = _longest(w, _S3_DEL + _S3_E, limit=rv)
    if suf is not None:
        start = len(w) - len(suf)
        w = w[:start]
        if suf in _S3_E and w.endswith("gu") and in_rv(len(w) - 1):
            w = w[:-1]

    return w.translate(_UNACCENT)
