"""GermanAnalyzer chain (analysis/de/GermanAnalyzer.java):
StandardTokenizer → StandardFilter → LowerCaseFilter →
StopFilter(german_stop.txt) → GermanNormalizationFilter →
GermanLightStemFilter.

GermanNormalizationFilter (de/GermanNormalizationFilter.java): the
three-state N/V/U machine — umlaut fold, ß→ss expansion, and the
'e'-after-U deletion (handles both spellings of umlauted forms).
GermanLightStemmer (de/GermanLightStemmer.java): accent fold + the two
plural/case-ending steps with the st-ending class. Stop set =
german_stop.txt as behavior data. Pinned bit-for-bit against the
COMPILED GermanAnalyzer in tests/test_misc_filters.py (GT round 85c).
"""

from __future__ import annotations

GERMAN_STOP = frozenset((
    "aber", "alle", "allem", "allen", "aller", "alles", "als", "also",
    "am", "an", "ander", "andere", "anderem", "anderen", "anderer",
    "anderes", "anderm", "andern", "anderr", "anders", "auch", "auf",
    "aus", "bei", "bin", "bis", "bist", "da", "damit", "dann", "der",
    "den", "des", "dem", "die", "das", "daß", "derselbe", "derselben",
    "denselben", "desselben", "demselben", "dieselbe", "dieselben",
    "dasselbe", "dazu", "dein", "deine", "deinem", "deinen", "deiner",
    "deines", "denn", "derer", "dessen", "dich", "dir", "du", "dies",
    "diese", "diesem", "diesen", "dieser", "dieses", "doch", "dort",
    "durch", "ein", "eine", "einem", "einen", "einer", "eines",
    "einig", "einige", "einigem", "einigen", "einiger", "einiges",
    "einmal", "er", "ihn", "ihm", "es", "etwas", "euer", "eure",
    "eurem", "euren", "eurer", "eures", "für", "gegen", "gewesen",
    "hab", "habe", "haben", "hat", "hatte", "hatten", "hier", "hin",
    "hinter", "ich", "mich", "mir", "ihr", "ihre", "ihrem", "ihren",
    "ihrer", "ihres", "euch", "im", "in", "indem", "ins", "ist",
    "jede", "jedem", "jeden", "jeder", "jedes", "jene", "jenem",
    "jenen", "jener", "jenes", "jetzt", "kann", "kein", "keine",
    "keinem", "keinen", "keiner", "keines", "können", "könnte",
    "machen", "man", "manche", "manchem", "manchen", "mancher",
    "manches", "mein", "meine", "meinem", "meinen", "meiner",
    "meines", "mit", "muss", "musste", "nach", "nicht", "nichts",
    "noch", "nun", "nur", "ob", "oder", "ohne", "sehr", "sein",
    "seine", "seinem", "seinen", "seiner", "seines", "selbst", "sich",
    "sie", "ihnen", "sind", "so", "solche", "solchem", "solchen",
    "solcher", "solches", "soll", "sollte", "sondern", "sonst",
    "über", "um", "und", "uns", "unse", "unsem", "unsen", "unser",
    "unses", "unter", "viel", "vom", "von", "vor", "während", "war",
    "waren", "warst", "was", "weg", "weil", "weiter", "welche",
    "welchem", "welchen", "welcher", "welches", "wenn", "werde",
    "werden", "wie", "wieder", "will", "wir", "wird", "wirst", "wo",
    "wollen", "wollte", "würde", "würden", "zu", "zum", "zur", "zwar",
    "zwischen",
))


def german_normalize(word: str) -> str:
    """GermanNormalizationFilter state machine (N=0, V=1, U=2)."""
    buf = list(word)
    state = 0
    i = 0
    while i < len(buf):
        c = buf[i]
        if c in ("a", "o"):
            state = 2
        elif c == "u":
            state = 2 if state == 0 else 1
        elif c == "e":
            if state == 2:
                del buf[i]
                i -= 1
            state = 1
        elif c in ("i", "q", "y"):
            state = 1
        elif c == "ä":
            buf[i] = "a"
            state = 1
        elif c == "ö":
            buf[i] = "o"
            state = 1
        elif c == "ü":
            buf[i] = "u"
            state = 1
        elif c == "ß":
            buf[i] = "s"
            buf.insert(i + 1, "s")
            i += 1
            state = 0
        else:
            state = 0
        i += 1
    return "".join(buf)


_FOLD = {
    "ä": "a", "à": "a", "á": "a", "â": "a",
    "ö": "o", "ò": "o", "ó": "o", "ô": "o",
    "ï": "i", "ì": "i", "í": "i", "î": "i",
    "ü": "u", "ù": "u", "ú": "u", "û": "u",
}
_ST_ENDING = frozenset("bdfghklmnt")


def german_light_stem(word: str) -> str:
    """GermanLightStemmer.stem, operation-for-operation."""
    s = [_FOLD.get(c, c) for c in word]
    ln = len(s)
    # step 1
    if ln > 5 and s[ln - 3] == "e" and s[ln - 2] == "r" and s[ln - 1] == "n":
        ln -= 3
    elif ln > 4 and s[ln - 2] == "e" and s[ln - 1] in ("m", "n", "r", "s"):
        ln -= 2
    elif ln > 3 and s[ln - 1] == "e":
        ln -= 1
    elif ln > 3 and s[ln - 1] == "s" and s[ln - 2] in _ST_ENDING:
        ln -= 1
    # step 2
    if ln > 5 and s[ln - 3] == "e" and s[ln - 2] == "s" and s[ln - 1] == "t":
        ln -= 3
    elif ln > 4 and s[ln - 2] == "e" and s[ln - 1] in ("r", "n"):
        ln -= 2
    elif ln > 4 and s[ln - 2] == "s" and s[ln - 1] == "t" \
            and s[ln - 3] in _ST_ENDING:
        ln -= 2
    return "".join(s[:ln])


def german_stream(text: str) -> list:
    """The full GermanAnalyzer stream: (term, posInc, start, end)."""
    from .tokenizer import _java_lower, iter_token_spans

    out = []
    pending = 1
    for tok, s, e in iter_token_spans(text):
        t = _java_lower(tok)
        if t in GERMAN_STOP:
            pending += 1
            continue
        out.append((german_light_stem(german_normalize(t)), pending, s, e))
        pending = 1
    return out


def german_tokens(text: str) -> list[str]:
    return [t for t, _pi, _s, _e in german_stream(text)]


def german_posinc_stream(text: str) -> list[tuple[str, int]]:
    return [(t, pi) for t, pi, _s, _e in german_stream(text)]
