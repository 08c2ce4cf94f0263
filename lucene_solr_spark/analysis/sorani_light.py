"""SoraniAnalyzer chain (analysis/ckb/SoraniAnalyzer.java — Kurdish):
StandardTokenizer → SoraniNormalizationFilter (BEFORE lowercase) →
LowerCaseFilter → DecimalDigitFilter → StopFilter(ckb stopwords) →
SoraniStemFilter.

SoraniNormalizer: yeh forms → farsi yeh, kaf → keheh, ZWNJ deletion
with heh→ae promotion of the preceding char, final heh → ae, teh
marbuta → ae, heh doachashmee → heh, initial reh → rreh, harakat and
every Unicode FORMAT char deleted. SoraniStemmer: the ordered
definite-article/plural/ezafe suffix ladder. Pinned bit-for-bit
against the COMPILED SoraniAnalyzer in tests/test_misc_filters.py (GT
round 85c)."""

from __future__ import annotations

import unicodedata

SORANI_STOP = frozenset((
    "و", "کە", "ی", "کرد", "ئەوەی", "سەر", "دوو", "هەروەها", "لەو",
    "دەکات", "چەند", "هەر", "ئەو", "ئەم", "من", "ئێمە", "تۆ", "ئێوە",
    "ئەو", "ئەوان", "بە", "پێ", "بەبێ", "بەدەم", "بەلای", "بەپێی",
    "بەرلە", "بەرەوی", "بەرەوە", "بەردەم", "بێ", "بێجگە", "بۆ", "دە",
    "تێ", "دەگەڵ", "دوای", "جگە", "لە", "لێ", "لەبەر", "لەبەینی",
    "لەبابەت", "لەبارەی", "لەباتی", "لەبن", "لەبرێتی", "لەدەم",
    "لەگەڵ", "لەلایەن", "لەناو", "لەنێو", "لەپێناوی", "لەرەوی",
    "لەرێ", "لەرێگا", "لەسەر", "لەژێر", "ناو", "نێوان", "پاش", "پێش",
    "وەک",
))


_FARSI_YEH, _KEHEH, _HEH, _AE, _RREH = "ی", "ک", "ه", "ە", "ڕ"
_HARAKAT = set("ـًٌٍَُِّْ")


def sorani_normalize(word: str) -> str:
    s = list(word)
    i = 0
    while i < len(s):
        c = s[i]
        if c in ("ي", "ى"):
            s[i] = _FARSI_YEH
        elif c == "ك":
            s[i] = _KEHEH
        elif c == "‌":
            if i > 0 and s[i - 1] == _HEH:
                s[i - 1] = _AE
            del s[i]
            continue
        elif c == _HEH:
            if i == len(s) - 1:
                s[i] = _AE
        elif c == "ة":
            s[i] = _AE
        elif c == "ھ":
            s[i] = _HEH
        elif c == "ر":
            if i == 0:
                s[i] = _RREH
        elif c == "\u0692":  # rreh above
            s[i] = _RREH
        elif c in _HARAKAT:
            del s[i]
            continue
        elif unicodedata.category(c) == "Cf":
            del s[i]
            continue
        i += 1
    return "".join(s)


def sorani_stem(word: str) -> str:
    s = word
    ln = len(s)

    def ends(suf):
        return ln >= len(suf) and s[ln - len(suf):ln] == suf

    if ln > 5 and ends("دا"):
        ln -= 2
    elif ln > 4 and ends("نا"):
        ln -= 1
    elif ln > 6 and ends("ەوە"):
        ln -= 3
    if ln > 6 and (ends("مان") or ends("یان") or ends("تان")):
        ln -= 3
    if ln > 6 and ends("ێکی"):
        return s[:ln - 3]
    if ln > 7 and ends("یەکی"):
        return s[:ln - 4]
    if ln > 5 and ends("ێک"):
        return s[:ln - 2]
    if ln > 6 and ends("یەک"):
        return s[:ln - 3]
    if ln > 6 and ends("ەکە"):
        return s[:ln - 3]
    if ln > 5 and ends("کە"):
        return s[:ln - 2]
    if ln > 7 and ends("ەکان"):
        return s[:ln - 4]
    if ln > 6 and ends("کان"):
        return s[:ln - 3]
    if ln > 7 and ends("یانی"):
        return s[:ln - 4]
    if ln > 6 and ends("انی"):
        return s[:ln - 3]
    if ln > 6 and ends("یان"):
        return s[:ln - 3]
    if ln > 5 and ends("ان"):
        return s[:ln - 2]
    if ln > 7 and ends("یانە"):
        return s[:ln - 4]
    if ln > 6 and ends("انە"):
        return s[:ln - 3]
    if ln > 5 and (ends("ایە") or ends("ەیە")):
        return s[:ln - 2]
    if ln > 4 and ends("ە"):
        return s[:ln - 1]
    if ln > 4 and ends("ی"):
        return s[:ln - 1]
    return s[:ln]


def sorani_stream(text: str) -> list:
    """The full SoraniAnalyzer stream: (term, posInc, start, end)."""
    from .misc_filters import decimal_digit_filter, keyword_token
    from .tokenizer import _java_lower, iter_token_spans

    out = []
    pending = 1
    for tok, st, e in iter_token_spans(text):
        t = sorani_normalize(tok)
        t = _java_lower(t)
        t = decimal_digit_filter(keyword_token(t))[0][0]
        if t in SORANI_STOP:
            pending += 1
            continue
        out.append((sorani_stem(t), pending, st, e))
        pending = 1
    return out
