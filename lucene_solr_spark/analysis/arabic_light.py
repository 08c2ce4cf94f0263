"""ArabicAnalyzer chain (analysis/ar/ArabicAnalyzer.java):
StandardTokenizer → LowerCaseFilter → DecimalDigitFilter →
StopFilter(ar/stopwords.txt — applied BEFORE normalization; the list is
not normalized, ArabicAnalyzer.java:138) → ArabicNormalizationFilter →
ArabicStemFilter.

ArabicNormalizer: hamza-form alefs → bare alef, dotless yeh → yeh, teh
marbuta → heh, and tatweel/harakat/shadda/sukun deleted.
ArabicStemmer: ONE prefix strip (al- family, wa-; length floors) then
EVERY matching suffix stripped in table order (each needs >= 2 chars
left). Pinned bit-for-bit against the COMPILED ArabicAnalyzer in
tests/test_misc_filters.py (GT round 85c)."""

from __future__ import annotations

ARABIC_STOP = frozenset((
    "من", "ومن", "منها", "منه", "في", "وفي", "فيها", "فيه", "و", "ف",
    "ثم", "او", "أو", "ب", "بها", "به", "ا", "أ", "اى", "اي", "أي",
    "أى", "لا", "ولا", "الا", "ألا", "إلا", "لكن", "ما", "وما", "كما",
    "فما", "عن", "مع", "اذا", "إذا", "ان", "أن", "إن", "انها", "أنها",
    "إنها", "انه", "أنه", "إنه", "بان", "بأن", "فان", "فأن", "وان",
    "وأن", "وإن", "التى", "التي", "الذى", "الذي", "الذين", "الى",
    "الي", "إلى", "إلي", "على", "عليها", "عليه", "اما", "أما", "إما",
    "ايضا", "أيضا", "كل", "وكل", "لم", "ولم", "لن", "ولن", "هى", "هي",
    "هو", "وهى", "وهي", "وهو", "فهى", "فهي", "فهو", "انت", "أنت",
    "لك", "لها", "له", "هذه", "هذا", "تلك", "ذلك", "هناك", "كانت",
    "كان", "يكون", "تكون", "وكانت", "وكان", "غير", "بعض", "قد", "نحو",
    "بين", "بينما", "منذ", "ضمن", "حيث", "الان", "الآن", "خلال",
    "بعد", "قبل", "حتى", "عند", "عندما", "لدى", "جميع",
))


_ALEF, _YEH, _HEH = "ا", "ي", "ه"
_DELETE = set("ـًٌٍَُِّْ")
_TO_ALEF = set("آأإ")

_PREFIXES = ("ال", "وال", "بال",
             "كال", "فال", "لل",
             "و")
_SUFFIXES = ("ها", "ان", "ات",
             "ون", "ين", "يه",
             "ية", "ه", "ة", "ي")


def arabic_normalize(word: str) -> str:
    out = []
    for c in word:
        if c in _DELETE:
            continue
        if c in _TO_ALEF:
            out.append(_ALEF)
        elif c == "ى":
            out.append(_YEH)
        elif c == "ة":
            out.append(_HEH)
        else:
            out.append(c)
    return "".join(out)


def arabic_stem(word: str) -> str:
    """ArabicStemmer.stem: one prefix strip then every matching suffix
    in table order."""
    s = word
    for p in _PREFIXES:
        if len(p) == 1 and len(s) < 4:
            continue
        if len(s) < len(p) + 2:
            continue
        if s.startswith(p):
            s = s[len(p):]
            break
    for suf in _SUFFIXES:
        if len(s) >= len(suf) + 2 and s.endswith(suf):
            s = s[: len(s) - len(suf)]
    return s


def arabic_stream(text: str) -> list:
    """The full ArabicAnalyzer stream: (term, posInc, start, end)."""
    from .misc_filters import decimal_digit_filter, keyword_token
    from .tokenizer import _java_lower, iter_token_spans

    out = []
    pending = 1
    for tok, s, e in iter_token_spans(text):
        t = _java_lower(tok)
        t = decimal_digit_filter(keyword_token(t))[0][0]
        if t in ARABIC_STOP:
            pending += 1
            continue
        out.append((arabic_stem(arabic_normalize(t)), pending, s, e))
        pending = 1
    return out
