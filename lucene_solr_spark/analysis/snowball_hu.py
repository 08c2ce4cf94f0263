"""Snowball Hungarian stemmer — implemented from the published
snowballstem.org Hungarian algorithm description, as wrapped by
SnowballFilter("Hungarian") (reference:
lucene/analysis/common/src/java/org/tartarus/snowball/ext/HungarianStemmer.java,
generated code — semantics re-derived from the public spec, then pinned
bit-for-bit against the COMPILED stemmer; see tools/snowball_fuzz.py).

Fork notes (pre-2015 Snowball, Latin-1 era): the vowel set uses õ
(U+00F5) and û (U+00FB) where modern Hungarian orthography has ő/ű —
matching the reference's generated tables exactly.

R1 here is Hungarian-specific: if the word starts with a vowel, R1
begins after the first consonant OR consonant digraph (cs/dzs/gy/ly/
ny/sz/ty/zs, longest match at the first consonant position); if it
starts with a consonant, after the first vowel.

Every suffix table is matched longest-first over the WHOLE word; the
R1 / double-consonant guards are switch-level (checked after the match
commits), so a guard failure means the step does nothing — no fallback
to a shorter suffix.
"""

from __future__ import annotations

_V = frozenset("aeiouáéíóöõúüû")
_DIGRAPHS3 = ("dzs",)
_DIGRAPHS2 = ("cs", "gy", "ly", "ny", "sz", "ty", "zs")
_DOUBLES = ("bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
            "pp", "rr", "ccs", "ss", "zzs", "tt", "vv", "ggy", "lly",
            "nny", "tty", "ssz", "zz")

# suffix -> replacement ('' = delete) tables; longest match wins
_CASE = ("ba", "ra", "be", "re", "ig", "nak", "nek", "val", "vel", "ul",
         "nál", "nél", "ból", "ról", "tól", "bõl", "rõl", "tõl", "ül",
         "n", "an", "ban", "en", "ben", "képpen", "on", "ön", "képp",
         "kor", "t", "at", "et", "ként", "anként", "enként", "onként",
         "ot", "ért", "öt", "hez", "hoz", "höz", "vá", "vé")
_CASE_SPECIAL = {"án": "a", "én": "e", "ánként": "a"}
_CASE_OTHER = {"stul": "", "astul": "", "ástul": "a", "stül": "",
               "estül": "", "éstül": "e"}
_PLURAL = {"k": "", "ak": "", "ek": "", "ok": "", "ák": "a", "ék": "e",
           "ök": ""}
_OWNED = {"éi": "", "áéi": "a", "ééi": "e", "é": "", "ké": "", "aké": "",
          "eké": "", "oké": "", "áké": "a", "éké": "e", "öké": "",
          "éé": "e"}
_SING_OWNER = {
    "a": "", "ja": "", "d": "", "ad": "", "ed": "", "od": "", "ád": "a",
    "éd": "e", "öd": "", "e": "", "je": "", "nk": "", "unk": "",
    "ánk": "a", "énk": "e", "ünk": "", "uk": "", "juk": "", "ájuk": "a",
    "ük": "", "jük": "", "éjük": "e", "m": "", "am": "", "em": "",
    "om": "", "ám": "a", "ém": "e", "o": "", "á": "a", "é": "e",
}
_PLUR_OWNER = {
    "id": "", "aid": "", "jaid": "", "eid": "", "jeid": "", "áid": "a",
    "éid": "e", "i": "", "ai": "", "jai": "", "ei": "", "jei": "",
    "ái": "a", "éi": "e", "itek": "", "eitek": "", "jeitek": "",
    "éitek": "e", "ik": "", "aik": "", "jaik": "", "eik": "",
    "jeik": "", "áik": "a", "éik": "e", "ink": "", "aink": "",
    "jaink": "", "eink": "", "jeink": "", "áink": "a", "éink": "e",
    "aitok": "", "jaitok": "", "áitok": "a", "im": "", "aim": "",
    "jaim": "", "eim": "", "jeim": "", "áim": "a", "éim": "e",
}


def _mark_r1(w: str) -> int:
    n = len(w)
    if n == 0:
        return n
    if w[0] in _V:
        i = 0
        while i < n and w[i] in _V:
            i += 1
        if i >= n:
            return n
        for d in _DIGRAPHS3:
            if w.startswith(d, i):
                return min(i + 3, n)
        for d in _DIGRAPHS2:
            if w.startswith(d, i):
                return min(i + 2, n)
        return i + 1
    i = 1
    while i < n and w[i] not in _V:
        i += 1
    if i >= n:
        return n
    return i + 1


def _longest(w: str, sufs) -> str | None:
    best = None
    for s in sufs:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


def _ends_double(stem: str) -> bool:
    return any(stem.endswith(d) for d in _DOUBLES)


def _undouble(w: str) -> str:
    # remove the second-to-last character (Snowball next + hop 1)
    if len(w) < 2:
        return w
    return w[:-2] + w[-1]


def _v_ending(w: str, p1: int) -> str:
    if w.endswith("á") and len(w) - 1 >= p1:
        return w[:-1] + "a"
    if w.endswith("é") and len(w) - 1 >= p1:
        return w[:-1] + "e"
    return w


def _table_step(w: str, p1: int, table: dict) -> str:
    s = _longest(w, table)
    if s is None:
        return w
    stem = len(w) - len(s)
    if stem < p1:
        return w
    return w[:stem] + table[s]


def hungarian_stem(word: str) -> str:
    w = word
    p1 = _mark_r1(w)
    # instrum: al/el in R1, stem ends in a double consonant -> delete +
    # undouble
    s = _longest(w, ("al", "el"))
    if s is not None:
        stem = len(w) - 2
        if stem >= p1 and _ends_double(w[:stem]):
            w = _undouble(w[:stem])
    # case: delete, then á->a / é->e tidy
    s = _longest(w, _CASE)
    if s is not None:
        stem = len(w) - len(s)
        if stem >= p1:
            w = _v_ending(w[:stem], p1)
    w = _table_step(w, p1, _CASE_SPECIAL)
    w = _table_step(w, p1, _CASE_OTHER)
    # factive: á/é in R1, stem ends double -> delete + undouble
    if w and w[-1] in "áé":
        stem = len(w) - 1
        if stem >= p1 and _ends_double(w[:stem]):
            w = _undouble(w[:stem])
    w = _table_step(w, p1, _OWNED)
    w = _table_step(w, p1, _SING_OWNER)
    w = _table_step(w, p1, _PLUR_OWNER)
    w = _table_step(w, p1, _PLURAL)
    return w
