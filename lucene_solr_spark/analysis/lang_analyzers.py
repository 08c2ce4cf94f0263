"""RussianAnalyzer and DutchAnalyzer chains (analysis/ru/
RussianAnalyzer.java, analysis/nl/DutchAnalyzer.java): both are
StandardTokenizer → StandardFilter → LowerCaseFilter → StopFilter →
SnowballFilter with the already-pinned Snowball stemmers
(snowball_ru/snowball_nl); Dutch inserts StemmerOverrideFilter with the
reference's four-entry stem dictionary (matching terms take the dict
value AND become keywords, skipping the stemmer). Pinned bit-for-bit
against the COMPILED analyzers in tests/test_misc_filters.py (GT round
85c)."""

from __future__ import annotations

RUSSIAN_STOP = frozenset((
    "и", "в", "во", "не", "что", "он", "на", "я", "с", "со", "как",
    "а", "то", "все", "она", "так", "его", "но", "да", "ты", "к", "у",
    "же", "вы", "за", "бы", "по", "только", "ее", "мне", "было",
    "вот", "от", "меня", "еще", "нет", "о", "из", "ему", "теперь",
    "когда", "даже", "ну", "вдруг", "ли", "если", "уже", "или", "ни",
    "быть", "был", "него", "до", "вас", "нибудь", "опять", "уж",
    "вам", "сказал", "ведь", "там", "потом", "себя", "ничего", "ей",
    "может", "они", "тут", "где", "есть", "надо", "ней", "для", "мы",
    "тебя", "их", "чем", "была", "сам", "чтоб", "без", "будто",
    "человек", "чего", "раз", "тоже", "себе", "под", "жизнь", "будет",
    "ж", "тогда", "кто", "этот", "говорил", "того", "потому", "этого",
    "какой", "совсем", "ним", "здесь", "этом", "один", "почти", "мой",
    "тем", "чтобы", "нее", "кажется", "сейчас", "были", "куда",
    "зачем", "сказать", "всех", "никогда", "сегодня", "можно", "при",
    "наконец", "два", "об", "другой", "хоть", "после", "над",
    "больше", "тот", "через", "эти", "нас", "про", "всего", "них",
    "какая", "много", "разве", "сказала", "три", "эту", "моя",
    "впрочем", "хорошо", "свою", "этой", "перед", "иногда", "лучше",
    "чуть", "том", "нельзя", "такой", "им", "более", "всегда",
    "конечно", "всю", "между",
))

DUTCH_STOP = frozenset((
    "de", "en", "van", "ik", "te", "dat", "die", "in", "een", "hij",
    "het", "niet", "zijn", "is", "was", "op", "aan", "met", "als",
    "voor", "had", "er", "maar", "om", "hem", "dan", "zou", "of",
    "wat", "mijn", "men", "dit", "zo", "door", "over", "ze", "zich",
    "bij", "ook", "tot", "je", "mij", "uit", "der", "daar", "haar",
    "naar", "heb", "hoe", "heeft", "hebben", "deze", "u", "want",
    "nog", "zal", "me", "zij", "nu", "ge", "geen", "omdat", "iets",
    "worden", "toch", "al", "waren", "veel", "meer", "doen", "toen",
    "moet", "ben", "zonder", "kan", "hun", "dus", "alles", "onder",
    "ja", "eens", "hier", "wie", "werd", "altijd", "doch", "wordt",
    "wezen", "kunnen", "ons", "zelf", "tegen", "na", "reeds", "wil",
    "kon", "niets", "uw", "iemand", "geweest", "andere",
))


#: DutchAnalyzer.DEFAULT_STEM_DICT (DutchAnalyzer.java:80-85)
DUTCH_STEM_OVERRIDES = {
    "fiets": "fiets", "bromfiets": "bromfiets", "ei": "eier",
    "kind": "kinder",
}


def russian_analyzer_stream(text: str) -> list:
    from .snowball_ru import russian_stem
    from .tokenizer import _java_lower, iter_token_spans

    out = []
    pending = 1
    for tok, s, e in iter_token_spans(text):
        t = _java_lower(tok)
        if t in RUSSIAN_STOP:
            pending += 1
            continue
        out.append((russian_stem(t), pending, s, e))
        pending = 1
    return out


def dutch_analyzer_stream(text: str) -> list:
    from .snowball_nl import dutch_stem
    from .tokenizer import _java_lower, iter_token_spans

    out = []
    pending = 1
    for tok, s, e in iter_token_spans(text):
        t = _java_lower(tok)
        if t in DUTCH_STOP:
            pending += 1
            continue
        ov = DUTCH_STEM_OVERRIDES.get(t)
        out.append((ov if ov is not None else dutch_stem(t), pending, s, e))
        pending = 1
    return out
