"""Snowball Romanian stemmer — implemented from the published
snowballstem.org Romanian algorithm description, as wrapped by
SnowballFilter("Romanian") (reference:
lucene/analysis/common/src/java/org/tartarus/snowball/ext/RomanianStemmer.java,
generated code — semantics re-derived from the public spec, then pinned
bit-for-bit against the COMPILED stemmer; see tools/snowball_fuzz.py).

Shape (Romance family, like Spanish):
  prelude:  u/i between vowels -> U/I markers
  step 0:   plural/article endings in R1
  standard: repeat combo-suffix replacements in R1 ("abilitate"->"abil"
            etc.), then the main suffix among in R2
  verb:     verb suffixes matched entirely within RV (the
            preceded-by-consonant-or-u guard for group 1 is tested
            UNDER the RV limit, so the tested char must be >= pV)
  vowel:    final a/e/ie/i/ă in RV
  postlude: I->i, U->u

This fork uses the pre-cedilla-fix codepoints ş (U+015F) / ţ (U+0163)
— matching the reference tables, not modern ș/ț.
"""

from __future__ import annotations

_V = frozenset("aeiouâîă")


def _mark_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _V:
        i = 2
        while i < n and w[i] not in _V:
            i += 1
        return min(i + 1, n)
    if w[0] in _V and w[1] in _V:
        i = 2
        while i < n and w[i] in _V:
            i += 1
        return min(i + 1, n)
    return 3


def _mark_r1_r2(w: str) -> tuple[int, int]:
    n = len(w)
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in _V:
        i += 1
    while i < n and w[i] in _V:
        i += 1
    if i < n:
        p1 = i + 1
    j = p1
    while j < n and w[j] not in _V:
        j += 1
    while j < n and w[j] in _V:
        j += 1
    if j < n:
        p2 = j + 1
    return p1, p2


def _longest(w: str, sufs, mark: int = 0) -> str | None:
    best = None
    for s in sufs:
        if (w.endswith(s) and len(w) - len(s) >= mark
                and (best is None or len(s) > len(best))):
            best = s
    return best


def _prelude(w: str) -> str:
    out = list(w)
    i = 0
    n = len(out)
    while i < n:
        if (out[i] in _V and i + 2 < n and out[i + 1] in "ui"
                and out[i + 2] in _V):
            out[i + 1] = "U" if out[i + 1] == "u" else "I"
            i += 2
        else:
            i += 1
    return "".join(out)


_STEP0 = {
    "ea": "e", "aţia": "aţi", "aua": "a", "iua": "i", "aţie": "aţi",
    "ele": "e", "ile": "i", "iile": "i", "iei": "i", "atei": "at",
    "ii": "i", "ului": "", "ul": "", "elor": "e", "ilor": "i",
    "iilor": "i",
}

_COMBO = {
    "icala": "ic", "iciva": "ic", "ativa": "at", "itiva": "it",
    "icale": "ic", "aţiune": "at", "iţiune": "it", "atoare": "at",
    "itoare": "it", "ătoare": "at", "icitate": "ic",
    "abilitate": "abil", "ibilitate": "ibil", "ivitate": "iv",
    "icive": "ic", "ative": "at", "itive": "it", "icali": "ic",
    "atori": "at", "icatori": "ic", "itori": "it", "ători": "at",
    "icitati": "ic", "abilitati": "abil", "ivitati": "iv",
    "icivi": "ic", "ativi": "at", "itivi": "it", "icităi": "ic",
    "abilităi": "abil", "ivităi": "iv", "icităţi": "ic",
    "abilităţi": "abil", "ivităţi": "iv", "ical": "ic", "ator": "at",
    "icator": "ic", "itor": "it", "ător": "at", "iciv": "ic",
    "ativ": "at", "itiv": "it", "icală": "ic", "icivă": "ic",
    "ativă": "at", "itivă": "it",
}

# action: 1 = delete, 2 = ţ+suffix -> t, 3 = -> ist
_STD = {
    "ica": 1, "abila": 1, "ibila": 1, "oasa": 1, "ata": 1, "ita": 1,
    "anta": 1, "ista": 3, "uta": 1, "iva": 1, "ic": 1, "ice": 1,
    "abile": 1, "ibile": 1, "isme": 3, "iune": 2, "oase": 1, "ate": 1,
    "itate": 1, "ite": 1, "ante": 1, "iste": 3, "ute": 1, "ive": 1,
    "ici": 1, "abili": 1, "ibili": 1, "iuni": 2, "atori": 1, "osi": 1,
    "ati": 1, "itati": 1, "iti": 1, "anti": 1, "isti": 3, "uti": 1,
    "işti": 3, "ivi": 1, "ităi": 1, "oşi": 1, "ităţi": 1, "abil": 1,
    "ibil": 1, "ism": 3, "ator": 1, "os": 1, "at": 1, "it": 1,
    "ant": 1, "ist": 3, "ut": 1, "iv": 1, "ică": 1, "abilă": 1,
    "ibilă": 1, "oasă": 1, "ată": 1, "ită": 1, "antă": 1, "istă": 3,
    "ută": 1, "ivă": 1,
}

# verb suffixes: group 1 needs preceded-by-consonant-or-u (within RV),
# group 2 deletes unconditionally
_VERB1 = ("ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere", "ire",
          "âre", "ase", "ise", "use", "âse", "eşte", "ăşte", "eze",
          "ai", "eai", "iai", "eşti", "ăşti", "ui", "ezi", "âi", "aşi",
          "aseşi", "iseşi", "useşi", "âseşi", "işi", "uşi", "âşi",
          "eaţi", "iaţi", "arăţi", "aserăţi", "iserăţi", "userăţi",
          "âserăţi", "irăţi", "urăţi", "ârăţi", "am", "eam", "iam",
          "asem", "isem", "usem", "âsem", "arăm", "aserăm", "iserăm",
          "userăm", "âserăm", "irăm", "urăm", "ârăm", "au", "eau",
          "iau", "indu", "ându", "ez", "ească", "ară", "aseră",
          "iseră", "useră", "âseră", "iră", "ură", "âră", "ează")
_VERB2 = ("se", "sese", "sei", "seşi", "seseşi", "aţi", "eţi", "iţi",
          "âţi", "serăţi", "seserăţi", "em", "sesem", "im", "âm", "ăm",
          "serăm", "seserăm", "seră", "seseră")


def _step0(w: str, p1: int) -> str:
    # longest match commits FIRST; the R1 guard is checked after and a
    # failure means the step does nothing (no fallback to shorter)
    s = _longest(w, _STEP0)
    if s is None:
        return w
    stem = len(w) - len(s)
    if stem < p1:
        return w
    if s == "ile" and w.endswith("ab", 0, stem):
        return w
    return w[:stem] + _STEP0[s]


def _standard(w: str, p1: int, p2: int) -> tuple[str, bool]:
    removed = False
    while True:
        s = _longest(w, _COMBO)
        if s is None or len(w) - len(s) < p1:
            break
        w = w[:len(w) - len(s)] + _COMBO[s]
        removed = True
    s = _longest(w, _STD)
    if s is not None and len(w) - len(s) >= p2:
        stem = len(w) - len(s)
        act = _STD[s]
        if act == 1:
            w = w[:stem]
            removed = True
        elif act == 2:
            if stem >= 1 and w[stem - 1] == "ţ":
                w = w[:stem - 1] + "t"
                removed = True
        else:
            w = w[:stem] + "ist"
            removed = True
    return w, removed


def _verb(w: str, pv: int) -> str:
    s = _longest(w, _VERB1 + _VERB2, pv)
    if s is None:
        return w
    stem = len(w) - len(s)
    if s in _VERB2:
        return w[:stem]
    # group 1: preceded by a non-vowel or u, tested within RV
    if stem > pv and (w[stem - 1] not in _V or w[stem - 1] == "u"):
        return w[:stem]
    return w


def _vowel_suffix(w: str, pv: int) -> str:
    s = _longest(w, ("a", "e", "ie", "i", "ă"))
    if s is not None and len(w) - len(s) >= pv:
        return w[:len(w) - len(s)]
    return w


def romanian_stem(word: str) -> str:
    w = _prelude(word)
    pv = _mark_rv(w)
    p1, p2 = _mark_r1_r2(w)
    w = _step0(w, p1)
    w, removed = _standard(w, p1, p2)
    if not removed:
        w = _verb(w, pv)
    w = _vowel_suffix(w, pv)
    return w.replace("I", "i").replace("U", "u")
