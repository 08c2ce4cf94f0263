"""BulgarianAnalyzer chain (analysis/bg/BulgarianAnalyzer.java):
StandardTokenizer → StandardFilter → LowerCaseFilter →
StopFilter(bg stopwords) → BulgarianStemFilter
(bg/BulgarianStemmer.java — the light algorithm from Nakov et al.:
definite-article removal, plural rewrites with palatalization
reversals, final-vowel strips, ен→н and ъN→N collapses; words shorter
than 4 pass through). Pinned bit-for-bit against the COMPILED
BulgarianAnalyzer in tests/test_misc_filters.py (GT round 85c)."""

from __future__ import annotations

BULGARIAN_STOP = frozenset((
    "а", "аз", "ако", "ала", "бе", "без", "беше", "би", "бил", "била",
    "били", "било", "близо", "бъдат", "бъде", "бяха", "в", "вас",
    "ваш", "ваша", "вероятно", "вече", "взема", "ви", "вие", "винаги",
    "все", "всеки", "всички", "всичко", "всяка", "във", "въпреки",
    "върху", "г", "ги", "главно", "го", "д", "да", "дали", "до",
    "докато", "докога", "дори", "досега", "доста", "е", "едва",
    "един", "ето", "за", "зад", "заедно", "заради", "засега",
    "затова", "защо", "защото", "и", "из", "или", "им", "има", "имат",
    "иска", "й", "каза", "как", "каква", "какво", "както", "какъв",
    "като", "кога", "когато", "което", "които", "кой", "който",
    "колко", "която", "къде", "където", "към", "ли", "м", "ме",
    "между", "мен", "ми", "мнозина", "мога", "могат", "може", "моля",
    "момента", "му", "н", "на", "над", "назад", "най", "направи",
    "напред", "например", "нас", "не", "него", "нея", "ни", "ние",
    "никой", "нито", "но", "някои", "някой", "няма", "обаче", "около",
    "освен", "особено", "от", "отгоре", "отново", "още", "пак", "по",
    "повече", "повечето", "под", "поне", "поради", "после", "почти",
    "прави", "пред", "преди", "през", "при", "пък", "първо", "с",
    "са", "само", "се", "сега", "си", "скоро", "след", "сме",
    "според", "сред", "срещу", "сте", "съм", "със", "също", "т",
    "тази", "така", "такива", "такъв", "там", "твой", "те", "тези",
    "ти", "тн", "то", "това", "тогава", "този", "той", "толкова",
    "точно", "трябва", "тук", "тъй", "тя", "тях", "у", "харесва", "ч",
    "че", "често", "чрез", "ще", "щом", "я",
))


def _remove_article(s: list, ln: int) -> int:
    def ends(suf):
        return ln >= len(suf) and "".join(s[ln - len(suf):ln]) == suf

    if ln > 6 and ends("ият"):
        return ln - 3
    if ln > 5 and (ends("ът") or ends("то") or ends("те") or ends("та")
                   or ends("ия")):
        return ln - 2
    if ln > 4 and ends("ят"):
        return ln - 2
    return ln


def _remove_plural(s: list, ln: int) -> int:
    def ends(suf):
        return ln >= len(suf) and "".join(s[ln - len(suf):ln]) == suf

    if ln > 6:
        if ends("овци"):
            return ln - 3
        if ends("ове"):
            return ln - 3
        if ends("еве"):
            s[ln - 3] = "й"
            return ln - 2
    if ln > 5:
        if ends("ища"):
            return ln - 3
        if ends("та"):
            return ln - 2
        if ends("ци"):
            s[ln - 2] = "к"
            return ln - 1
        if ends("зи"):
            s[ln - 2] = "г"
            return ln - 1
        if s[ln - 3] == "е" and s[ln - 1] == "и":
            s[ln - 3] = "я"
            return ln - 1
    if ln > 4:
        if ends("си"):
            s[ln - 2] = "х"
            return ln - 1
        if ends("и"):
            return ln - 1
    return ln


def bulgarian_stem(word: str) -> str:
    if len(word) < 4:
        return word
    s = list(word)
    ln = len(s)

    def ends(suf):
        return ln >= len(suf) and "".join(s[ln - len(suf):ln]) == suf

    if ln > 5 and ends("ища"):
        return "".join(s[:ln - 3])
    ln = _remove_article(s, ln)
    ln = _remove_plural(s, ln)
    if ln > 3:
        if ends("я"):
            ln -= 1
        if ends("а") or ends("о") or ends("е"):
            ln -= 1
    if ln > 4 and ends("ен"):
        s[ln - 2] = "н"
        ln -= 1
    if ln > 5 and s[ln - 2] == "ъ":
        s[ln - 2] = s[ln - 1]
        ln -= 1
    return "".join(s[:ln])


def bulgarian_stream(text: str) -> list:
    """The full BulgarianAnalyzer stream: (term, posInc, start, end)."""
    from .tokenizer import _java_lower, iter_token_spans

    out = []
    pending = 1
    for tok, s, e in iter_token_spans(text):
        t = _java_lower(tok)
        if t in BULGARIAN_STOP:
            pending += 1
            continue
        out.append((bulgarian_stem(t), pending, s, e))
        pending = 1
    return out
