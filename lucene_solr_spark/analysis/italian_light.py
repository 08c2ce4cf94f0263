"""ItalianAnalyzer chain (analysis/it/ItalianAnalyzer.java):
StandardTokenizer → StandardFilter → ElisionFilter(the 21-article
Italian set) → LowerCaseFilter → StopFilter(italian_stop.txt) →
ItalianLightStemFilter (accent fold + the final-vowel step with the
i/h digraph guards; words shorter than 6 pass through). Pinned
bit-for-bit against the COMPILED ItalianAnalyzer in
tests/test_misc_filters.py (GT round 85c)."""

from __future__ import annotations

ITALIAN_ARTICLES = frozenset((
    "c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell",
    "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s",
    "v", "d",
))

ITALIAN_STOP = frozenset((
    "ad", "al", "allo", "ai", "agli", "all", "agl", "alla", "alle",
    "con", "col", "coi", "da", "dal", "dallo", "dai", "dagli", "dall",
    "dagl", "dalla", "dalle", "di", "del", "dello", "dei", "degli",
    "dell", "degl", "della", "delle", "in", "nel", "nello", "nei",
    "negli", "nell", "negl", "nella", "nelle", "su", "sul", "sullo",
    "sui", "sugli", "sull", "sugl", "sulla", "sulle", "per", "tra",
    "contro", "io", "tu", "lui", "lei", "noi", "voi", "loro", "mio",
    "mia", "miei", "mie", "tuo", "tua", "tuoi", "tue", "suo", "sua",
    "suoi", "sue", "nostro", "nostra", "nostri", "nostre", "vostro",
    "vostra", "vostri", "vostre", "mi", "ti", "ci", "vi", "lo", "la",
    "li", "le", "gli", "ne", "il", "un", "uno", "una", "ma", "ed",
    "se", "perché", "anche", "come", "dov", "dove", "che", "chi",
    "cui", "non", "più", "quale", "quanto", "quanti", "quanta",
    "quante", "quello", "quelli", "quella", "quelle", "questo",
    "questi", "questa", "queste", "si", "tutto", "tutti", "a", "c",
    "e", "i", "l", "o", "ho", "hai", "ha", "abbiamo", "avete",
    "hanno", "abbia", "abbiate", "abbiano", "avrò", "avrai", "avrà",
    "avremo", "avrete", "avranno", "avrei", "avresti", "avrebbe",
    "avremmo", "avreste", "avrebbero", "avevo", "avevi", "aveva",
    "avevamo", "avevate", "avevano", "ebbi", "avesti", "ebbe",
    "avemmo", "aveste", "ebbero", "avessi", "avesse", "avessimo",
    "avessero", "avendo", "avuto", "avuta", "avuti", "avute", "sono",
    "sei", "è", "siamo", "siete", "sia", "siate", "siano", "sarò",
    "sarai", "sarà", "saremo", "sarete", "saranno", "sarei",
    "saresti", "sarebbe", "saremmo", "sareste", "sarebbero", "ero",
    "eri", "era", "eravamo", "eravate", "erano", "fui", "fosti", "fu",
    "fummo", "foste", "furono", "fossi", "fosse", "fossimo",
    "fossero", "essendo", "faccio", "fai", "facciamo", "fanno",
    "faccia", "facciate", "facciano", "farò", "farai", "farà",
    "faremo", "farete", "faranno", "farei", "faresti", "farebbe",
    "faremmo", "fareste", "farebbero", "facevo", "facevi", "faceva",
    "facevamo", "facevate", "facevano", "feci", "facesti", "fece",
    "facemmo", "faceste", "fecero", "facessi", "facesse", "facessimo",
    "facessero", "facendo", "sto", "stai", "sta", "stiamo", "stanno",
    "stia", "stiate", "stiano", "starò", "starai", "starà", "staremo",
    "starete", "staranno", "starei", "staresti", "starebbe",
    "staremmo", "stareste", "starebbero", "stavo", "stavi", "stava",
    "stavamo", "stavate", "stavano", "stetti", "stesti", "stette",
    "stemmo", "steste", "stettero", "stessi", "stesse", "stessimo",
    "stessero", "stando",
))


def elide_it(token: str) -> str:
    """ElisionFilter over the Italian article set (first ' or U+2019)."""
    for i, ch in enumerate(token):
        if ch in ("'", "’"):
            if token[:i].lower() in ITALIAN_ARTICLES:
                return token[i + 1:]
            return token
    return token


_FOLD = {
    "à": "a", "á": "a", "â": "a", "ä": "a",
    "ò": "o", "ó": "o", "ô": "o", "ö": "o",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
}


def italian_light_stem(word: str) -> str:
    """ItalianLightStemmer.stem, operation-for-operation."""
    if len(word) < 6:
        return word
    s = [_FOLD.get(c, c) for c in word]
    ln = len(s)
    last = s[ln - 1]
    if last == "e":
        return "".join(s[: ln - 2 if s[ln - 2] in ("i", "h") else ln - 1])
    if last == "i":
        return "".join(s[: ln - 2 if s[ln - 2] in ("h", "i") else ln - 1])
    if last == "a":
        return "".join(s[: ln - 2 if s[ln - 2] == "i" else ln - 1])
    if last == "o":
        return "".join(s[: ln - 2 if s[ln - 2] == "i" else ln - 1])
    return "".join(s)


def italian_stream(text: str) -> list:
    """The full ItalianAnalyzer stream: (term, posInc, start, end)."""
    from .tokenizer import _java_lower, iter_token_spans

    out = []
    pending = 1
    for tok, s, e in iter_token_spans(text):
        t = _java_lower(elide_it(tok))
        if t in ITALIAN_STOP:
            pending += 1
            continue
        out.append((italian_light_stem(t), pending, s, e))
        pending = 1
    return out


def italian_tokens(text: str) -> list[str]:
    return [t for t, _pi, _s, _e in italian_stream(text)]


def italian_posinc_stream(text: str) -> list[tuple[str, int]]:
    return [(t, pi) for t, pi, _s, _e in italian_stream(text)]
