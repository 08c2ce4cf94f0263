"""Snowball Portuguese stemmer — implemented from the published
snowballstem.org Portuguese algorithm description, as wrapped by
SnowballFilter("Portuguese") (reference:
org/tartarus/snowball/ext/PortugueseStemmer.java, generated code —
semantics re-derived from the public spec, then pinned bit-for-bit
against the COMPILED stemmer in tests/test_misc_filters.py, GT round
85b).

Prelude maps the nasal vowels ã/õ to the two-character forms a~/o~
(restored in the postlude), so every suffix list below uses the
transformed spellings. Regions and the among/setlimit semantics follow
the Spanish port (snowball_es.py)."""

from __future__ import annotations

_VOWELS = frozenset("aeiouáéíóúâêô")


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


#: this fork's generated table (PortugueseStemmer.java a_5) is an older
#: snowball variant: logía/ución keep their Spanish spellings, ância and
#: the ador/ante/aça~o rows are PLAIN R2 deletes (no ic follow-up), and
#: ira/iras -> ir needs a preceding e in RV
_S1_DELETE_R2 = (
    "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
    "amento", "amentos", "imento", "imentos",
    "adora", "ador", "aça~o", "adoras", "adores", "aço~es", "ante",
    "antes", "ância",
)
_S1_IDADE = ("idade", "idades")
_S1_IVA = ("iva", "ivo", "ivas", "ivos")

#: exact a_6 table of this fork (120 entries)
_S2 = (
    "ada", "ida", "ia", "aria", "eria", "iria", "ara", "era", "ira",
    "ava", "asse", "esse", "isse", "aste", "este", "iste", "ei",
    "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam",
    "aram", "eram", "iram", "avam", "em", "arem", "erem", "irem",
    "assem", "essem", "issem", "ado", "ido", "ando", "endo", "indo",
    "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as", "adas", "idas",
    "ias", "arias", "erias", "irias", "aras", "eras", "iras", "avas",
    "es", "ardes", "erdes", "irdes", "ares", "eres", "ires", "asses",
    "esses", "isses", "astes", "estes", "istes", "is", "ais", "eis",
    "areis", "ereis", "ireis", "áreis", "éreis", "íreis", "ásseis",
    "ésseis", "ísseis", "áveis", "íeis", "aríeis", "eríeis",
    "iríeis", "ados", "idos", "amos", "áramos", "éramos", "íramos",
    "ávamos", "íamos", "aríamos", "eríamos", "iríamos", "emos",
    "aremos", "eremos", "iremos", "ássemos", "êssemos", "íssemos",
    "imos", "armos", "ermos", "irmos", "ámos", "arás", "erás",
    "irás", "eu", "iu", "ou", "ará", "erá", "irá",
)
_S4 = ("os", "a", "i", "o", "á", "í", "ó")


def portuguese_stem(word: str) -> str:
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv = _mark_rv(w)
    p1, p2 = _mark_r1_r2(w)

    def in_r1(start: int) -> bool:
        return start >= p1

    def in_r2(start: int) -> bool:
        return start >= p2

    def in_rv(start: int) -> bool:
        return start >= rv

    # ---- step 1: standard suffixes ----
    altered = False
    suf = _longest(w, _S1_DELETE_R2 + _S1_IDADE + _S1_IVA
                   + ("logía", "logías", "ución", "uciones", "ência",
                      "ências", "amente", "mente", "ira", "iras"))
    if suf is not None:
        start = len(w) - len(suf)
        if suf in _S1_DELETE_R2:
            if in_r2(start):
                w = w[:start]
                altered = True
        elif suf in ("logía", "logías"):
            if in_r2(start):
                w = w[:start] + "log"
                altered = True
        elif suf in ("ución", "uciones"):
            if in_r2(start):
                w = w[:start] + "u"
                altered = True
        elif suf in ("ência", "ências"):
            if in_r2(start):
                w = w[:start] + "ente"
                altered = True
        elif suf == "amente":
            if in_r1(start):
                w = w[:start]
                altered = True
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
                altered = True
                for pre in ("ante", "avel", "ível"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: len(w) - len(pre)]
                        break
        elif suf in _S1_IDADE:
            if in_r2(start):
                w = w[:start]
                altered = True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: len(w) - len(pre)]
                        break
        elif suf in _S1_IVA:
            if in_r2(start):
                w = w[:start]
                altered = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
        else:  # ira / iras -> ir, if in RV and preceded by e
            if in_rv(start) and start > 0 and w[start - 1] == "e":
                w = w[:start] + "ir"
                altered = True

    # ---- step 2: verb suffixes (if step 1 did nothing) ----
    if not altered:
        suf = _longest(w, _S2, limit=rv)
        if suf is not None:
            w = w[: len(w) - len(suf)]
            altered = True

    # ---- step 3 (if altered) / step 4 (residual) ----
    if altered:
        if w.endswith("i") and in_rv(len(w) - 1) and len(w) >= 2 \
                and w[-2] == "c":
            w = w[:-1]
    else:
        suf = _longest(w, _S4, limit=rv)
        if suf is not None:
            w = w[: len(w) - len(suf)]

    # ---- step 5: final e/é/ê in RV (+ gu/ci collapse), or ç -> c ----
    suf = _longest(w, ("e", "é", "ê"), limit=rv)
    if suf is not None:
        w = w[:-1]
        if (w.endswith("gu") and in_rv(len(w) - 1)) or \
                (w.endswith("ci") and in_rv(len(w) - 1)):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")
