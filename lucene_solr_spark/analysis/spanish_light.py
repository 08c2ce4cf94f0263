"""SpanishAnalyzer chain (analysis/es/SpanishAnalyzer.java):
StandardTokenizer → StandardFilter → LowerCaseFilter →
StopFilter(spanish_stop.txt) → SpanishLightStemFilter (accent fold +
final o/a/e strip, -es/-ces(→z)/-os/-as/-es plural step; words shorter
than 5 pass through). Pinned bit-for-bit against the COMPILED
SpanishAnalyzer in tests/test_misc_filters.py (GT round 85c)."""

from __future__ import annotations

SPANISH_STOP = frozenset((
    "de", "la", "que", "el", "en", "y", "a", "los", "del", "se",
    "las", "por", "un", "para", "con", "no", "una", "su", "al", "lo",
    "como", "más", "pero", "sus", "le", "ya", "o", "este", "sí",
    "porque", "esta", "entre", "cuando", "muy", "sin", "sobre",
    "también", "me", "hasta", "hay", "donde", "quien", "desde",
    "todo", "nos", "durante", "todos", "uno", "les", "ni", "contra",
    "otros", "ese", "eso", "ante", "ellos", "e", "esto", "mí",
    "antes", "algunos", "qué", "unos", "yo", "otro", "otras", "otra",
    "él", "tanto", "esa", "estos", "mucho", "quienes", "nada",
    "muchos", "cual", "poco", "ella", "estar", "estas", "algunas",
    "algo", "nosotros", "mi", "mis", "tú", "te", "ti", "tu", "tus",
    "ellas", "nosotras", "vosotros", "vosotras", "os", "mío", "mía",
    "míos", "mías", "tuyo", "tuya", "tuyos", "tuyas", "suyo", "suya",
    "suyos", "suyas", "nuestro", "nuestra", "nuestros", "nuestras",
    "vuestro", "vuestra", "vuestros", "vuestras", "esos", "esas",
    "estoy", "estás", "está", "estamos", "estáis", "están", "esté",
    "estés", "estemos", "estéis", "estén", "estaré", "estarás",
    "estará", "estaremos", "estaréis", "estarán", "estaría",
    "estarías", "estaríamos", "estaríais", "estarían", "estaba",
    "estabas", "estábamos", "estabais", "estaban", "estuve",
    "estuviste", "estuvo", "estuvimos", "estuvisteis", "estuvieron",
    "estuviera", "estuvieras", "estuviéramos", "estuvierais",
    "estuvieran", "estuviese", "estuvieses", "estuviésemos",
    "estuvieseis", "estuviesen", "estando", "estado", "estada",
    "estados", "estadas", "estad", "he", "has", "ha", "hemos",
    "habéis", "han", "haya", "hayas", "hayamos", "hayáis", "hayan",
    "habré", "habrás", "habrá", "habremos", "habréis", "habrán",
    "habría", "habrías", "habríamos", "habríais", "habrían", "había",
    "habías", "habíamos", "habíais", "habían", "hube", "hubiste",
    "hubo", "hubimos", "hubisteis", "hubieron", "hubiera", "hubieras",
    "hubiéramos", "hubierais", "hubieran", "hubiese", "hubieses",
    "hubiésemos", "hubieseis", "hubiesen", "habiendo", "habido",
    "habida", "habidos", "habidas", "soy", "eres", "es", "somos",
    "sois", "son", "sea", "seas", "seamos", "seáis", "sean", "seré",
    "serás", "será", "seremos", "seréis", "serán", "sería", "serías",
    "seríamos", "seríais", "serían", "era", "eras", "éramos", "erais",
    "eran", "fui", "fuiste", "fue", "fuimos", "fuisteis", "fueron",
    "fuera", "fueras", "fuéramos", "fuerais", "fueran", "fuese",
    "fueses", "fuésemos", "fueseis", "fuesen", "siendo", "sido",
    "tengo", "tienes", "tiene", "tenemos", "tenéis", "tienen",
    "tenga", "tengas", "tengamos", "tengáis", "tengan", "tendré",
    "tendrás", "tendrá", "tendremos", "tendréis", "tendrán",
    "tendría", "tendrías", "tendríamos", "tendríais", "tendrían",
    "tenía", "tenías", "teníamos", "teníais", "tenían", "tuve",
    "tuviste", "tuvo", "tuvimos", "tuvisteis", "tuvieron", "tuviera",
    "tuvieras", "tuviéramos", "tuvierais", "tuvieran", "tuviese",
    "tuvieses", "tuviésemos", "tuvieseis", "tuviesen", "teniendo",
    "tenido", "tenida", "tenidos", "tenidas", "tened",
))


_FOLD = {
    "à": "a", "á": "a", "â": "a", "ä": "a",
    "ò": "o", "ó": "o", "ô": "o", "ö": "o",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
}


def spanish_light_stem(word: str) -> str:
    """SpanishLightStemmer.stem, operation-for-operation."""
    if len(word) < 5:
        return word
    s = [_FOLD.get(c, c) for c in word]
    ln = len(s)
    last = s[ln - 1]
    if last in ("o", "a", "e"):
        return "".join(s[: ln - 1])
    if last == "s":
        if s[ln - 2] == "e" and s[ln - 3] == "s" and s[ln - 4] == "e":
            return "".join(s[: ln - 2])
        if s[ln - 2] == "e" and s[ln - 3] == "c":
            s[ln - 3] = "z"
            return "".join(s[: ln - 2])
        if s[ln - 2] in ("o", "a", "e"):
            return "".join(s[: ln - 2])
    return "".join(s)


def spanish_stream(text: str) -> list:
    """The full SpanishAnalyzer stream: (term, posInc, start, end)."""
    from .tokenizer import _java_lower, iter_token_spans

    out = []
    pending = 1
    for tok, s, e in iter_token_spans(text):
        t = _java_lower(tok)
        if t in SPANISH_STOP:
            pending += 1
            continue
        out.append((spanish_light_stem(t), pending, s, e))
        pending = 1
    return out


def spanish_tokens(text: str) -> list[str]:
    return [t for t, _pi, _s, _e in spanish_stream(text)]


def spanish_posinc_stream(text: str) -> list[tuple[str, int]]:
    return [(t, pi) for t, pi, _s, _e in spanish_stream(text)]
