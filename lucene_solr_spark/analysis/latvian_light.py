"""LatvianAnalyzer chain (analysis/lv/LatvianAnalyzer.java):
StandardTokenizer → StandardFilter → LowerCaseFilter →
StopFilter(lv stopwords) → LatvianStemFilter
(lv/LatvianStemmer.java: the first matching affix from the ordered
38-entry table fires when the word keeps >= 3 chars AND its vowel
count exceeds the affix's — palatalizing affixes then run the
unpalatalization rewrites, which may peek at the just-removed buffer
character). Pinned bit-for-bit against the COMPILED LatvianAnalyzer in
tests/test_misc_filters.py (GT round 85c)."""

from __future__ import annotations

LATVIAN_STOP = frozenset((
    "aiz", "ap", "ar", "apakš", "ārpus", "augšpus", "bez", "caur",
    "dēļ", "gar", "iekš", "iz", "kopš", "labad", "lejpus", "līdz",
    "no", "otrpus", "pa", "par", "pār", "pēc", "pie", "pirms", "pret",
    "priekš", "starp", "šaipus", "uz", "viņpus", "virs", "virspus",
    "zem", "apakšpus", "un", "bet", "jo", "ja", "ka", "lai", "tomēr",
    "tikko", "turpretī", "arī", "kaut", "gan", "tādēļ", "tā", "ne",
    "tikvien", "vien", "kā", "ir", "te", "vai", "kamēr", "ar",
    "diezin", "droši", "diemžēl", "nebūt", "ik", "it", "taču", "nu",
    "pat", "tiklab", "iekšpus", "nedz", "tik", "nevis", "turpretim",
    "jeb", "iekam", "iekām", "iekāms", "kolīdz", "līdzko", "tiklīdz",
    "jebšu", "tālab", "tāpēc", "nekā", "itin", "jā", "jau", "jel",
    "nē", "nezin", "tad", "tikai", "vis", "tak", "iekams", "vien",
    "būt", "biju", "biji", "bija", "bijām", "bijāt", "esmu", "esi",
    "esam", "esat", "būšu", "būsi", "būs", "būsim", "būsiet", "tikt",
    "tiku", "tiki", "tika", "tikām", "tikāt", "tieku", "tiec", "tiek",
    "tiekam", "tiekat", "tikšu", "tiks", "tiksim", "tiksiet", "tapt",
    "tapi", "tapāt", "topat", "tapšu", "tapsi", "taps", "tapsim",
    "tapsiet", "kļūt", "kļuvu", "kļuvi", "kļuva", "kļuvām", "kļuvāt",
    "kļūstu", "kļūsti", "kļūst", "kļūstam", "kļūstat", "kļūšu",
    "kļūsi", "kļūs", "kļūsim", "kļūsiet", "varēt", "varēju",
    "varējām", "varēšu", "varēsim", "var", "varēji", "varējāt",
    "varēsi", "varēsiet", "varat", "varēja", "varēs",
))


#: (affix, vowel count, palatalizes) — table order is match order
_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True), ("e", 1, False),
    ("ā", 1, False), ("ē", 1, False), ("ī", 1, False),
    ("ū", 1, False), ("o", 1, False), ("s", 0, False),
    ("š", 0, False),
)
_VOWELS = set("aeiouāīēū")


def _unpalatalize(s: list, ln: int) -> int:
    def ends(suf):
        return ln >= len(suf) and "".join(s[ln - len(suf):ln]) == suf

    # s[ln] is the first character of the just-removed affix
    if ln < len(s) and s[ln] == "u":
        if ends("kš"):
            ln += 1
            s[ln - 2] = "s"
            s[ln - 1] = "t"
            return ln
        if ends("ņņ"):
            s[ln - 2] = "n"
            s[ln - 1] = "n"
            return ln
    if ends("pj") or ends("bj") or ends("mj") or ends("vj"):
        return ln - 1
    if ends("šņ"):
        s[ln - 2] = "s"
        s[ln - 1] = "n"
        return ln
    if ends("žņ"):
        s[ln - 2] = "z"
        s[ln - 1] = "n"
        return ln
    if ends("šļ"):
        s[ln - 2] = "s"
        s[ln - 1] = "l"
        return ln
    if ends("žļ"):
        s[ln - 2] = "z"
        s[ln - 1] = "l"
        return ln
    if ends("ļņ"):
        s[ln - 2] = "l"
        s[ln - 1] = "n"
        return ln
    if ends("ļļ"):
        s[ln - 2] = "l"
        s[ln - 1] = "l"
        return ln
    if s[ln - 1] == "č":
        s[ln - 1] = "c"
        return ln
    if s[ln - 1] == "ļ":
        s[ln - 1] = "l"
        return ln
    if s[ln - 1] == "ņ":
        s[ln - 1] = "n"
        return ln
    return ln


def latvian_stem(word: str) -> str:
    s = list(word)
    ln = len(s)
    n_vowels = sum(1 for c in s if c in _VOWELS)
    for affix, vc, pal in _AFFIXES:
        if (n_vowels > vc and ln >= len(affix) + 3
                and "".join(s[ln - len(affix):ln]) == affix):
            ln -= len(affix)
            if pal:
                ln = _unpalatalize(s, ln)
            return "".join(s[:ln])
    return "".join(s[:ln])


def latvian_stream(text: str) -> list:
    """The full LatvianAnalyzer stream: (term, posInc, start, end)."""
    from .tokenizer import _java_lower, iter_token_spans

    out = []
    pending = 1
    for tok, s, e in iter_token_spans(text):
        t = _java_lower(tok)
        if t in LATVIAN_STOP:
            pending += 1
            continue
        out.append((latvian_stem(t), pending, s, e))
        pending = 1
    return out
