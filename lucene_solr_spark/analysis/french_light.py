"""FrenchAnalyzer chain (analysis/fr/FrenchAnalyzer.java):
StandardTokenizer → StandardFilter → ElisionFilter(DEFAULT_ARTICLES) →
LowerCaseFilter → StopFilter(french_stop.txt) → FrenchLightStemFilter.

ElisionFilter (util/ElisionFilter.java:51-72): strip everything through
the FIRST apostrophe (' or U+2019) when the prefix is one of the
articles (case-insensitive). FrenchLightStemmer
(fr/FrenchLightStemmer.java) re-expressed operation-for-operation from
the reference (char-buffer suffix rules + the norm pass: accent fold at
len>4, adjacent-duplicate collapse, ie/r/e/e/double tail strip).

The stop set is the french_stop.txt snowball resource as behavior data
(same adjudication as the English 33-word set). Pinned bit-for-bit
against the COMPILED FrenchAnalyzer in tests/test_misc_filters.py (GT
round 85c).
"""

from __future__ import annotations

#: FrenchAnalyzer.DEFAULT_ARTICLES (case-insensitive)
FRENCH_ARTICLES = frozenset((
    "l", "m", "t", "qu", "n", "s", "j", "d", "c", "jusqu", "quoiqu",
    "lorsqu", "puisqu",
))

FRENCH_STOP = frozenset((
    "au", "aux", "avec", "ce", "ces", "dans", "de", "des", "du",
    "elle", "en", "et", "eux", "il", "je", "la", "le", "leur", "lui",
    "ma", "mais", "me", "même", "mes", "moi", "mon", "ne", "nos",
    "notre", "nous", "on", "ou", "par", "pas", "pour", "qu", "que",
    "qui", "sa", "se", "ses", "son", "sur", "ta", "te", "tes", "toi",
    "ton", "tu", "un", "une", "vos", "votre", "vous", "c", "d", "j",
    "l", "à", "m", "n", "s", "t", "y", "été", "étée", "étées", "étés",
    "étant", "suis", "es", "est", "sommes", "êtes", "sont", "serai",
    "seras", "sera", "serons", "serez", "seront", "serais", "serait",
    "serions", "seriez", "seraient", "étais", "était", "étions",
    "étiez", "étaient", "fus", "fut", "fûmes", "fûtes", "furent",
    "sois", "soit", "soyons", "soyez", "soient", "fusse", "fusses",
    "fût", "fussions", "fussiez", "fussent", "ayant", "eu", "eue",
    "eues", "eus", "ai", "as", "avons", "avez", "ont", "aurai",
    "auras", "aura", "aurons", "aurez", "auront", "aurais", "aurait",
    "aurions", "auriez", "auraient", "avais", "avait", "avions",
    "aviez", "avaient", "eut", "eûmes", "eûtes", "eurent", "aie",
    "aies", "ait", "ayons", "ayez", "aient", "eusse", "eusses", "eût",
    "eussions", "eussiez", "eussent", "ceci", "cela", "celà", "cet",
    "cette", "ici", "ils", "les", "leurs", "quel", "quels", "quelle",
    "quelles", "sans", "soi",
))


def elide(token: str) -> str:
    """ElisionFilter: find the first ' or U+2019; if the prefix is an
    article (lowercased compare — CharArraySet(ignoreCase=true)), strip
    prefix + apostrophe. No apostrophe or non-article prefix: no-op."""
    for i, ch in enumerate(token):
        if ch in ("'", "’"):
            if token[:i].lower() in FRENCH_ARTICLES:
                return token[i + 1:]
            return token
    return token


def _ends(s: list, length: int, suf: str) -> bool:
    if length < len(suf):
        return False
    return "".join(s[length - len(suf):length]) == suf


_NORM_FOLD = {
    "à": "a", "á": "a", "â": "a", "ô": "o", "è": "e", "é": "e",
    "ê": "e", "ù": "u", "û": "u", "î": "i", "ç": "c",
}


def _norm(s: list, length: int) -> int:
    if length > 4:
        for i in range(length):
            s[i] = _NORM_FOLD.get(s[i], s[i])
        ch = s[0]
        i = 1
        while i < length:
            if s[i] == ch and ch.isalpha():
                del s[i]
                length -= 1
            else:
                ch = s[i]
                i += 1
    if length > 4 and _ends(s, length, "ie"):
        length -= 2
    if length > 4:
        if s[length - 1] == "r":
            length -= 1
        if s[length - 1] == "e":
            length -= 1
        if s[length - 1] == "e":
            length -= 1
        if s[length - 1] == s[length - 2] and s[length - 1].isalpha():
            length -= 1
    return length


def french_light_stem(word: str) -> str:
    """FrenchLightStemmer.stem, operation-for-operation."""
    s = list(word)
    ln = len(s)
    if ln > 5 and s[ln - 1] == "x":
        if s[ln - 3] == "a" and s[ln - 2] == "u" and s[ln - 4] != "e":
            s[ln - 2] = "l"
        ln -= 1
    if ln > 3 and s[ln - 1] == "x":
        ln -= 1
    if ln > 3 and s[ln - 1] == "s":
        ln -= 1
    if ln > 9 and _ends(s, ln, "issement"):
        ln -= 6
        s[ln - 1] = "r"
        return "".join(s[:_norm(s, ln)])
    if ln > 8 and _ends(s, ln, "issant"):
        ln -= 4
        s[ln - 1] = "r"
        return "".join(s[:_norm(s, ln)])
    if ln > 6 and _ends(s, ln, "ement"):
        ln -= 4
        if ln > 3 and _ends(s, ln, "ive"):
            ln -= 1
            s[ln - 1] = "f"
        return "".join(s[:_norm(s, ln)])
    if ln > 11 and _ends(s, ln, "ficatrice"):
        ln -= 5
        s[ln - 2] = "e"
        s[ln - 1] = "r"
        return "".join(s[:_norm(s, ln)])
    if ln > 10 and _ends(s, ln, "ficateur"):
        ln -= 4
        s[ln - 2] = "e"
        s[ln - 1] = "r"
        return "".join(s[:_norm(s, ln)])
    if ln > 9 and _ends(s, ln, "catrice"):
        ln -= 3
        s[ln - 4] = "q"
        s[ln - 3] = "u"
        s[ln - 2] = "e"
        return "".join(s[:_norm(s, ln)])
    if ln > 8 and _ends(s, ln, "cateur"):
        ln -= 2
        s[ln - 4] = "q"
        s[ln - 3] = "u"
        s[ln - 2] = "e"
        s[ln - 1] = "r"
        return "".join(s[:_norm(s, ln)])
    if ln > 8 and _ends(s, ln, "atrice"):
        ln -= 4
        s[ln - 2] = "e"
        s[ln - 1] = "r"
        return "".join(s[:_norm(s, ln)])
    if ln > 7 and _ends(s, ln, "ateur"):
        ln -= 3
        s[ln - 2] = "e"
        s[ln - 1] = "r"
        return "".join(s[:_norm(s, ln)])
    if ln > 6 and _ends(s, ln, "trice"):
        ln -= 1
        s[ln - 3] = "e"
        s[ln - 2] = "u"
        s[ln - 1] = "r"
    if ln > 5 and _ends(s, ln, "ième"):
        return "".join(s[:_norm(s, ln - 4)])
    if ln > 7 and _ends(s, ln, "teuse"):
        ln -= 2
        s[ln - 1] = "r"
        return "".join(s[:_norm(s, ln)])
    if ln > 6 and _ends(s, ln, "teur"):
        ln -= 1
        s[ln - 1] = "r"
        return "".join(s[:_norm(s, ln)])
    if ln > 5 and _ends(s, ln, "euse"):
        return "".join(s[:_norm(s, ln - 2)])
    if ln > 8 and _ends(s, ln, "ère"):
        ln -= 1
        s[ln - 2] = "e"
        return "".join(s[:_norm(s, ln)])
    if ln > 7 and _ends(s, ln, "ive"):
        ln -= 1
        s[ln - 1] = "f"
        return "".join(s[:_norm(s, ln)])
    if ln > 4 and (_ends(s, ln, "folle") or _ends(s, ln, "molle")):
        ln -= 2
        s[ln - 1] = "u"
        return "".join(s[:_norm(s, ln)])
    if ln > 9 and _ends(s, ln, "nnelle"):
        return "".join(s[:_norm(s, ln - 5)])
    if ln > 9 and _ends(s, ln, "nnel"):
        return "".join(s[:_norm(s, ln - 3)])
    if ln > 4 and _ends(s, ln, "ète"):
        ln -= 1
        s[ln - 2] = "e"
    if ln > 8 and _ends(s, ln, "ique"):
        ln -= 4
    if ln > 8 and _ends(s, ln, "esse"):
        return "".join(s[:_norm(s, ln - 3)])
    if ln > 7 and _ends(s, ln, "inage"):
        return "".join(s[:_norm(s, ln - 3)])
    if ln > 9 and _ends(s, ln, "isation"):
        ln -= 7
        if ln > 5 and _ends(s, ln, "ual"):
            s[ln - 2] = "e"
        return "".join(s[:_norm(s, ln)])
    if ln > 9 and _ends(s, ln, "isateur"):
        return "".join(s[:_norm(s, ln - 7)])
    if ln > 8 and _ends(s, ln, "ation"):
        return "".join(s[:_norm(s, ln - 5)])
    if ln > 8 and _ends(s, ln, "ition"):
        return "".join(s[:_norm(s, ln - 5)])
    return "".join(s[:_norm(s, ln)])


def french_stream(text: str) -> list:
    """The full FrenchAnalyzer stream: (term, posInc, start, end) with
    StopFilter position gaps and original-token offsets (elision does
    not move offsets)."""
    from .tokenizer import _java_lower, iter_token_spans

    out = []
    pending = 1
    for tok, s, e in iter_token_spans(text):
        t = _java_lower(elide(tok))
        if t in FRENCH_STOP:
            pending += 1
            continue
        out.append((french_light_stem(t), pending, s, e))
        pending = 1
    return out


def french_tokens(text: str) -> list[str]:
    return [t for t, _pi, _s, _e in french_stream(text)]


def french_posinc_stream(text: str) -> list[tuple[str, int]]:
    return [(t, pi) for t, pi, _s, _e in french_stream(text)]
