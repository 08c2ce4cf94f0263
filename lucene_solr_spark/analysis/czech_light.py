"""CzechAnalyzer chain (analysis/cz/CzechAnalyzer.java):
StandardTokenizer → StandardFilter → LowerCaseFilter →
StopFilter(cz/stopwords.txt) → CzechStemFilter
(cz/CzechStemmer.java: case-ending removal by length class, possessive
ov/in/ův removal, then palatalization normalization — čt→ck, št→sk,
c/č→k, z/ž→h, the e-insertion collapse and ů→o). Pinned bit-for-bit
against the COMPILED CzechAnalyzer in tests/test_misc_filters.py (GT
round 85c)."""

from __future__ import annotations

CZECH_STOP = frozenset((
    "a", "s", "k", "o", "i", "u", "v", "z", "dnes", "cz", "tímto",
    "budeš", "budem", "byli", "jseš", "můj", "svým", "ta", "tomto",
    "tohle", "tuto", "tyto", "jej", "zda", "proč", "máte", "tato",
    "kam", "tohoto", "kdo", "kteří", "mi", "nám", "tom", "tomuto",
    "mít", "nic", "proto", "kterou", "byla", "toho", "protože", "asi",
    "ho", "naši", "napište", "re", "což", "tím", "takže", "svých",
    "její", "svými", "jste", "aj", "tu", "tedy", "teto", "bylo",
    "kde", "ke", "pravé", "ji", "nad", "nejsou", "či", "pod", "téma",
    "mezi", "přes", "ty", "pak", "vám", "ani", "když", "však", "neg",
    "jsem", "tento", "článku", "články", "aby", "jsme", "před", "pta",
    "jejich", "byl", "ještě", "až", "bez", "také", "pouze", "první",
    "vaše", "která", "nás", "nový", "tipy", "pokud", "může", "strana",
    "jeho", "své", "jiné", "zprávy", "nové", "není", "vás", "jen",
    "podle", "zde", "už", "být", "více", "bude", "již", "než",
    "který", "by", "které", "co", "nebo", "ten", "tak", "má", "při",
    "od", "po", "jsou", "jak", "další", "ale", "si", "se", "ve", "to",
    "jako", "za", "zpět", "ze", "do", "pro", "je", "na", "atd", "atp",
    "jakmile", "přičemž", "já", "on", "ona", "ono", "oni", "ony",
    "my", "vy", "jí", "ji", "mě", "mne", "jemu", "tomu", "těm",
    "těmu", "němu", "němuž", "jehož", "jíž", "jelikož", "jež",
    "jakož", "načež",
))


_CASE_5 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte",
           "ete", "ěti", "eti", "ího", "iho", "ími", "ímu", "imu",
           "ách", "ata", "aty", "ých", "ama", "ami", "ové", "ovi",
           "ými")
_CASE_4 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us",
           "ým", "mi", "ou")
_FINAL_VOWELS = set("aeiouůyáéíýě")


def _remove_case(s: str) -> str:
    ln = len(s)
    if ln > 7 and s.endswith("atech"):
        return s[:-5]
    if ln > 6 and s.endswith(("ětem", "etem", "atům")):
        return s[:-4]
    if ln > 5 and s.endswith(_CASE_5):
        return s[:-3]
    if ln > 4 and s.endswith(_CASE_4):
        return s[:-2]
    if ln > 3 and s[-1] in _FINAL_VOWELS:
        return s[:-1]
    return s


def _remove_possessives(s: str) -> str:
    if len(s) > 5 and s.endswith(("ov", "in", "ův")):
        return s[:-2]
    return s


def _normalize(s: str) -> str:
    if s.endswith("čt"):
        return s[:-2] + "ck"
    if s.endswith("št"):
        return s[:-2] + "sk"
    if s[-1] in ("c", "č"):
        return s[:-1] + "k"
    if s[-1] in ("z", "ž"):
        return s[:-1] + "h"
    if len(s) > 1 and s[-2] == "e":
        return s[:-2] + s[-1]
    if len(s) > 2 and s[-2] == "ů":
        return s[:-2] + "o" + s[-1]
    return s


def czech_stem(word: str) -> str:
    s = _remove_possessives(_remove_case(word))
    if s:
        s = _normalize(s)
    return s


def czech_stream(text: str) -> list:
    """The full CzechAnalyzer stream: (term, posInc, start, end)."""
    from .tokenizer import _java_lower, iter_token_spans

    out = []
    pending = 1
    for tok, s, e in iter_token_spans(text):
        t = _java_lower(tok)
        if t in CZECH_STOP:
            pending += 1
            continue
        out.append((czech_stem(t), pending, s, e))
        pending = 1
    return out
