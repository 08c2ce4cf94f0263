"""Snowball Turkish stemmer — implemented from the published
snowballstem.org Turkish algorithm (Evren Kapusuz Çilden), as wrapped by
SnowballFilter("Turkish") (reference:
lucene/analysis/common/src/java/org/tartarus/snowball/ext/TurkishStemmer.java,
generated code — semantics re-derived from the public spec, then pinned
bit-for-bit against the COMPILED stemmer; see tools/snowball_fuzz.py).

Structure:
  * vowel-harmony gate: the word's last vowel must be preceded
    (anywhere further left, skipping consonants AND disharmonic vowels)
    by a vowel of its harmony class — verified against the compiled
    routine via a reflection probe;
  * mark_* routines match one suffix family, several with an optional
    leading consonant (n/s/y) or vowel (U): the optional char is
    consumed only when the char before it is a vowel (resp. consonant);
    when absent, the char TWO positions back must be a vowel (resp.
    consonant) — the spec's documented quirk, kept bit-for-bit;
  * stem_nominal_verb_suffixes / stem_noun_suffixes / the recursive
    ki-chain orchestrate mark+delete with Snowball try/or semantics:
    deletions already performed PERSIST even when a later step of the
    same alternative fails (slice_del is never rolled back) — several
    branches below rely on exactly that;
  * SnowballFilter ignores stem()'s boolean: mutations stick even on
    the early-exit paths (e.g. the -lAr branch clears the
    continue-stemming flag and the postlude is skipped);
  * postlude: words "ad"/"soyad" are reserved (no postlude); stems
    ending d/g get the harmony-matched high vowel appended; final
    b/c/d/ğ devoice to p/ç/t/k.
"""

from __future__ import annotations

_VOW = frozenset("aeıioöuü")
_U = frozenset("ıiuü")
_HARM = {"a": "aouı", "e": "eiöü", "ı": "aı", "i": "ei",
         "o": "ou", "ö": "öü", "u": "ou", "ü": "öü"}

_A0 = ("m", "n", "miz", "niz", "muz", "nuz", "müz", "nüz", "mız", "nız")
_A20 = ("di", "ti", "dik", "tik", "duk", "tuk", "dük", "tük", "dık",
        "tık", "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım",
        "din", "tin", "dun", "tun", "dün", "tün", "dın", "tın", "du",
        "tu", "dü", "tü", "dı", "tı")


def _harmony(w: str, k: int) -> bool:
    i = k - 1
    while i >= 0 and w[i] not in _VOW:
        i -= 1
    if i < 0:
        return False
    allowed = _HARM[w[i]]
    j = i - 1
    while j >= 0:
        if w[j] in allowed:
            return True
        j -= 1
    return False


def _ends(w: str, k: int, sufs) -> str | None:
    best = None
    for s in sufs:
        if k >= len(s) and w[k - len(s):k] == s and (
                best is None or len(s) > len(best)):
            best = s
    return best


def _opt_cons(w: str, k: int, c: str) -> int | None:
    """Optional leading consonant c: returns chars consumed (0/1)."""
    if k >= 1 and w[k - 1] == c:
        if k >= 2 and w[k - 2] in _VOW:
            return 1
        return None
    if k >= 2 and w[k - 2] in _VOW:
        return 0
    return None


def _opt_u(w: str, k: int) -> int | None:
    """Optional leading high vowel U: returns chars consumed (0/1)."""
    if k >= 1 and w[k - 1] in _U:
        if k >= 2 and w[k - 2] not in _VOW:
            return 1
        return None
    if k >= 2 and w[k - 2] not in _VOW:
        return 0
    return None


def _simple_mark(sufs, need_harmony=True):
    def mark(w: str, k: int) -> int | None:
        if need_harmony and not _harmony(w, k):
            return None
        s = _ends(w, k, sufs)
        return None if s is None else k - len(s)
    return mark


def _opt_mark(sufs, c, need_harmony=True):
    def mark(w: str, k: int) -> int | None:
        if need_harmony and not _harmony(w, k):
            return None
        s = _ends(w, k, sufs)
        if s is None:
            return None
        k2 = k - len(s)
        o = (_opt_u(w, k2) if c == "U" else _opt_cons(w, k2, c))
        return None if o is None else k2 - o
    return mark


def _mark_possessives(w, k):
    s = _ends(w, k, _A0)
    if s is None:
        return None
    k2 = k - len(s)
    o = _opt_u(w, k2)
    return None if o is None else k2 - o


def _mark_su(w, k):
    if not _harmony(w, k):
        return None
    if k < 1 or w[k - 1] not in _U:
        return None
    o = _opt_cons(w, k - 1, "s")
    return None if o is None else k - 1 - o


def _mark_yu(w, k):
    if not _harmony(w, k):
        return None
    if k < 1 or w[k - 1] not in _U:
        return None
    o = _opt_cons(w, k - 1, "y")
    return None if o is None else k - 1 - o


def _mark_ki(w, k):
    return k - 2 if k >= 2 and w[k - 2:k] == "ki" else None


def _mark_yken(w, k):
    if k >= 3 and w[k - 3:k] == "ken":
        o = _opt_cons(w, k - 3, "y")
        return None if o is None else k - 3 - o
    return None


_mark_lari = _simple_mark(("leri", "ları"), need_harmony=False)
_mark_nu = _simple_mark(("ni", "nu", "nü", "nı"))
_mark_nun = _opt_mark(("in", "un", "ün", "ın"), "n")
_mark_ya = _opt_mark(("a", "e"), "y")
_mark_na = _simple_mark(("na", "ne"))
_mark_da = _simple_mark(("da", "ta", "de", "te"))
_mark_nda = _simple_mark(("nda", "nde"))
_mark_dan = _simple_mark(("dan", "tan", "den", "ten"))
_mark_ndan = _simple_mark(("ndan", "nden"))
_mark_yla = _opt_mark(("la", "le"), "y")
_mark_nca = _opt_mark(("ca", "ce"), "n")
_mark_yum = _opt_mark(("im", "um", "üm", "ım"), "y")
_mark_sun = _simple_mark(("sin", "sun", "sün", "sın"))
_mark_yuz = _opt_mark(("iz", "uz", "üz", "ız"), "y")
_mark_sunuz = _simple_mark(("siniz", "sunuz", "sünüz", "sınız"),
                           need_harmony=False)
_mark_lar = _simple_mark(("lar", "ler"))
_mark_nuz = _simple_mark(("niz", "nuz", "nüz", "nız"))
_mark_dur = _simple_mark(("dir", "tir", "dur", "tur", "dür", "tür",
                          "dır", "tır"))
_mark_casina = _simple_mark(("casına", "cesine"), need_harmony=False)
_mark_ydu = _opt_mark(_A20, "y")
_mark_ysa = _opt_mark(("sa", "se", "sak", "sek", "sam", "sem", "san",
                       "sen"), "y", need_harmony=False)
_mark_ymus = _opt_mark(("miş", "muş", "müş", "mış"), "y")


def _first(marks, w, k):
    for mk in marks:
        k2 = mk(w, k)
        if k2 is not None:
            return k2
    return None


def _nominal_verb(w: str) -> tuple[str, bool]:
    k = len(w)
    # A: (ymUs_ | yDU | ysA | yken) -> delete
    k2 = _first((_mark_ymus, _mark_ydu, _mark_ysa, _mark_yken), w, k)
    if k2 is not None:
        return w[:k2], True
    # B: cAsInA (sUnUz|lAr|yUm|sUn|yUz|eps) ymUs_ -> delete
    k2 = _mark_casina(w, k)
    if k2 is not None:
        k3 = _first((_mark_sunuz, _mark_lar, _mark_yum, _mark_sun,
                     _mark_yuz), w, k2)
        if k3 is None:
            k3 = k2
        k4 = _mark_ymus(w, k3)
        if k4 is not None:
            return w[:k4], True
    # C: lAr -> delete; try((DUr|yDU|ysA|ymUs_) delete); unset continue
    k2 = _mark_lar(w, k)
    if k2 is not None:
        w = w[:k2]
        k3 = _first((_mark_dur, _mark_ydu, _mark_ysa, _mark_ymus),
                    w, len(w))
        if k3 is not None:
            w = w[:k3]
        return w, False
    # D: nUz (yDU|ysA) -> delete; both inner fail -> branch fails
    k2 = _mark_nuz(w, k)
    if k2 is not None:
        k3 = _first((_mark_ydu, _mark_ysa), w, k2)
        if k3 is not None:
            return w[:k3], True
    # E: (sUnUz|yUz|sUn|yUm) -> delete; try(ymUs_ delete)
    k2 = _first((_mark_sunuz, _mark_yuz, _mark_sun, _mark_yum), w, k)
    if k2 is not None:
        w = w[:k2]
        k3 = _mark_ymus(w, len(w))
        if k3 is not None:
            w = w[:k3]
        return w, True
    # F: DUr -> delete; try((sUnUz|lAr|yUm|sUn|yUz|eps) ymUs_ delete)
    k2 = _mark_dur(w, k)
    if k2 is None:
        return w, True
    w = w[:k2]
    e = len(w)
    k3 = _first((_mark_sunuz, _mark_lar, _mark_yum, _mark_sun,
                 _mark_yuz), w, e)
    if k3 is None:
        k3 = e
    k4 = _mark_ymus(w, k3)
    if k4 is not None:
        w = w[:k4]
    return w, True


def _sscbk(w: str, k: int) -> tuple[str, bool]:
    """stem_suffix_chain_before_ki at cursor k (deleting [x, k) splices
    out a MIDDLE substring when k < len(w) — callers may invoke this
    mid-word after a mark that was never deleted)."""
    k2 = _mark_ki(w, k)
    if k2 is None:
        return w, False
    # branch DA
    k3 = _mark_da(w, k2)
    if k3 is not None:
        w = w[:k3] + w[k:]
        base = k3
        k4 = _mark_lar(w, base)
        if k4 is not None:
            w = w[:k4] + w[base:]
            w, _ = _sscbk(w, k4)
            return w, True
        k4 = _mark_possessives(w, base)
        if k4 is not None:
            w = w[:k4] + w[base:]
            k5 = _mark_lar(w, k4)
            if k5 is not None:
                w = w[:k5] + w[k4:]
                w, _ = _sscbk(w, k5)
        return w, True
    # branch nUn
    k3 = _mark_nun(w, k2)
    if k3 is not None:
        w = w[:k3] + w[k:]
        base = k3
        k4 = _mark_lari(w, base)
        if k4 is not None:
            return w[:k4] + w[base:], True
        k4 = _mark_possessives(w, base)
        if k4 is None:
            k4 = _mark_su(w, base)
        if k4 is not None:
            w = w[:k4] + w[base:]
            k5 = _mark_lar(w, k4)
            if k5 is not None:
                w = w[:k5] + w[k4:]
                w, _ = _sscbk(w, k5)
            return w, True
        w, _ = _sscbk(w, base)
        return w, True
    # branch ndA
    k3 = _mark_nda(w, k2)
    if k3 is None:
        return w, False
    k4 = _mark_lari(w, k3)
    if k4 is not None:
        return w[:k4] + w[k:], True
    k4 = _mark_su(w, k3)
    if k4 is not None:
        w = w[:k4] + w[k:]
        k5 = _mark_lar(w, k4)
        if k5 is not None:
            w = w[:k5] + w[k4:]
            w, _ = _sscbk(w, k5)
        return w, True
    w2, ok = _sscbk(w, k3)
    if ok:
        return w2, True
    return w, False


def _noun_suffixes(w: str) -> str:
    n = len(w)
    # N1: [lAr] delete try(SSCBK)
    k = _mark_lar(w, n)
    if k is not None:
        w = w[:k]
        w, _ = _sscbk(w, len(w))
        return w
    # N2: [ncA] delete try( lArI-del | (poss|sU)-del-try | lAr-del-SSCBK )
    k = _mark_nca(w, n)
    if k is not None:
        w = w[:k]
        e = len(w)
        k2 = _mark_lari(w, e)
        if k2 is not None:
            return w[:k2]
        k2 = _mark_possessives(w, e)
        if k2 is None:
            k2 = _mark_su(w, e)
        if k2 is not None:
            w = w[:k2]
            k3 = _mark_lar(w, len(w))
            if k3 is not None:
                w = w[:k3]
                w, _ = _sscbk(w, len(w))
            return w
        k2 = _mark_lar(w, e)
        if k2 is not None:
            w = w[:k2]
            w, _ = _sscbk(w, len(w))
        return w
    # N3: [(ndA|nA)] ( lArI-del | sU-del-try | SSCBK ); all fail -> next
    k = _mark_nda(w, n)
    if k is None:
        k = _mark_na(w, n)
    if k is not None:
        k2 = _mark_lari(w, k)
        if k2 is not None:
            return w[:k2]
        k2 = _mark_su(w, k)
        if k2 is not None:
            w = w[:k2]
            k3 = _mark_lar(w, len(w))
            if k3 is not None:
                w = w[:k3]
                w, _ = _sscbk(w, len(w))
            return w
        w2, ok = _sscbk(w, k)
        if ok:
            return w2
    # N4: [(ndAn|nU)] ( sU-del-try | lArI(NO delete — spec quirk) )
    k = _mark_ndan(w, n)
    if k is None:
        k = _mark_nu(w, n)
    if k is not None:
        k2 = _mark_su(w, k)
        if k2 is not None:
            w = w[:k2]
            k3 = _mark_lar(w, len(w))
            if k3 is not None:
                w = w[:k3]
                w, _ = _sscbk(w, len(w))
            return w
        if _mark_lari(w, k) is not None:
            return w
    # N5: [DAn] delete try( poss-del-try | lAr-del-try | SSCBK )
    k = _mark_dan(w, n)
    if k is not None:
        w = w[:k]
        e = len(w)
        k2 = _mark_possessives(w, e)
        if k2 is not None:
            w = w[:k2]
            k3 = _mark_lar(w, len(w))
            if k3 is not None:
                w = w[:k3]
                w, _ = _sscbk(w, len(w))
            return w
        k2 = _mark_lar(w, e)
        if k2 is not None:
            w = w[:k2]
            w, _ = _sscbk(w, len(w))
            return w
        w, _ = _sscbk(w, e)
        return w
    # N6: [(nUn|ylA)] delete try( lAr-del-SSCBK(must) | (poss|sU)-del-try
    #     | SSCBK ) — alt1's lAr deletion persists into alt2 on failure
    k = _mark_nun(w, n)
    if k is None:
        k = _mark_yla(w, n)
    if k is not None:
        w = w[:k]
        e = len(w)
        k2 = _mark_lar(w, e)
        if k2 is not None:
            w = w[:k2]
            w, ok = _sscbk(w, len(w))
            if ok:
                return w
        e = len(w)
        k2 = _mark_possessives(w, e)
        if k2 is None:
            k2 = _mark_su(w, e)
        if k2 is not None:
            w = w[:k2]
            k3 = _mark_lar(w, len(w))
            if k3 is not None:
                w = w[:k3]
                w, _ = _sscbk(w, len(w))
            return w
        w, _ = _sscbk(w, len(w))
        return w
    # N7: [lArI] delete
    k = _mark_lari(w, n)
    if k is not None:
        return w[:k]
    # N8: bare SSCBK
    w2, ok = _sscbk(w, n)
    if ok:
        return w2
    # N9: [(DA|yU|yA)] delete try( (poss-del-try-mark-lAr | lAr) del;
    #     SSCBK )
    k = _mark_da(w, n)
    if k is None:
        k = _mark_yu(w, n)
    if k is None:
        k = _mark_ya(w, n)
    if k is not None:
        w = w[:k]
        e = len(w)
        k2 = _mark_possessives(w, e)
        if k2 is not None:
            w = w[:k2]
            e2 = len(w)
            k3 = _mark_lar(w, e2)
            if k3 is not None:
                w = w[:k3]
            w, _ = _sscbk(w, len(w))
            return w
        k2 = _mark_lar(w, e)
        if k2 is not None:
            w = w[:k2]
            w, _ = _sscbk(w, len(w))
            return w
        return w
    # N10: [(poss|sU)] delete try([lAr] delete SSCBK)
    k = _mark_possessives(w, n)
    if k is None:
        k = _mark_su(w, n)
    if k is not None:
        w = w[:k]
        k2 = _mark_lar(w, len(w))
        if k2 is not None:
            w = w[:k2]
            w, _ = _sscbk(w, len(w))
        return w
    return w


def _append_u(w: str) -> str:
    if not w or w[-1] not in "dg":
        return w
    i = len(w) - 1
    while i >= 0 and w[i] not in _VOW:
        i -= 1
    if i < 0:
        return w
    v = w[i]
    if v in "aı":
        return w + "ı"
    if v in "ei":
        return w + "i"
    if v in "ou":
        return w + "u"
    return w + "ü"


_DEVOICE = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


def turkish_stem(word: str) -> str:
    w = word
    if sum(1 for c in w if c in _VOW) < 2:
        return w
    w, cont = _nominal_verb(w)
    if not cont:
        return w
    w = _noun_suffixes(w)
    if w in ("ad", "soyad"):
        return w
    w = _append_u(w)
    if w and w[-1] in _DEVOICE:
        w = w[:-1] + _DEVOICE[w[-1]]
    return w
