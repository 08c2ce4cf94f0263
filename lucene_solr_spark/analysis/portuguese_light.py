"""PortugueseAnalyzer chain (analysis/pt/PortugueseAnalyzer.java):
StandardTokenizer → StandardFilter → LowerCaseFilter →
StopFilter(portuguese_stop.txt) → PortugueseLightStemFilter
(pt/PortugueseLightStemmer.java: plural/adverb suffix removal with the
ões/ães → ão and is→il rewrites, the feminine normalization step, final
e/a/o strip, accent fold last; words shorter than 4 pass through).
Pinned bit-for-bit against the COMPILED PortugueseAnalyzer in
tests/test_misc_filters.py (GT round 85c)."""

from __future__ import annotations

PORTUGUESE_STOP = frozenset((
    "de", "a", "o", "que", "e", "do", "da", "em", "um", "para", "com",
    "não", "uma", "os", "no", "se", "na", "por", "mais", "as", "dos",
    "como", "mas", "ao", "ele", "das", "à", "seu", "sua", "ou",
    "quando", "muito", "nos", "já", "eu", "também", "só", "pelo",
    "pela", "até", "isso", "ela", "entre", "depois", "sem", "mesmo",
    "aos", "seus", "quem", "nas", "me", "esse", "eles", "você",
    "essa", "num", "nem", "suas", "meu", "às", "minha", "numa",
    "pelos", "elas", "qual", "nós", "lhe", "deles", "essas", "esses",
    "pelas", "este", "dele", "tu", "te", "vocês", "vos", "lhes",
    "meus", "minhas", "teu", "tua", "teus", "tuas", "nosso", "nossa",
    "nossos", "nossas", "dela", "delas", "esta", "estes", "estas",
    "aquele", "aquela", "aqueles", "aquelas", "isto", "aquilo",
    "estou", "está", "estamos", "estão", "estive", "esteve",
    "estivemos", "estiveram", "estava", "estávamos", "estavam",
    "estivera", "estivéramos", "esteja", "estejamos", "estejam",
    "estivesse", "estivéssemos", "estivessem", "estiver",
    "estivermos", "estiverem", "hei", "há", "havemos", "hão", "houve",
    "houvemos", "houveram", "houvera", "houvéramos", "haja",
    "hajamos", "hajam", "houvesse", "houvéssemos", "houvessem",
    "houver", "houvermos", "houverem", "houverei", "houverá",
    "houveremos", "houverão", "houveria", "houveríamos", "houveriam",
    "sou", "somos", "são", "era", "éramos", "eram", "fui", "foi",
    "fomos", "foram", "fora", "fôramos", "seja", "sejamos", "sejam",
    "fosse", "fôssemos", "fossem", "for", "formos", "forem", "serei",
    "será", "seremos", "serão", "seria", "seríamos", "seriam",
    "tenho", "tem", "temos", "tém", "tinha", "tínhamos", "tinham",
    "tive", "teve", "tivemos", "tiveram", "tivera", "tivéramos",
    "tenha", "tenhamos", "tenham", "tivesse", "tivéssemos",
    "tivessem", "tiver", "tivermos", "tiverem", "terei", "terá",
    "teremos", "terão", "teria", "teríamos", "teriam",
))


def _remove_suffix(s: list, ln: int) -> int:
    def ends(suf):
        return ln >= len(suf) and "".join(s[ln - len(suf):ln]) == suf

    if ln > 4 and ends("es") and s[ln - 3] in ("r", "s", "l", "z"):
        return ln - 2
    if ln > 3 and ends("ns"):
        s[ln - 2] = "m"
        return ln - 1
    if ln > 4 and (ends("eis") or ends("éis")):
        s[ln - 3] = "e"
        s[ln - 2] = "l"
        return ln - 1
    if ln > 4 and ends("ais"):
        s[ln - 2] = "l"
        return ln - 1
    if ln > 4 and ends("óis"):
        s[ln - 3] = "o"
        s[ln - 2] = "l"
        return ln - 1
    if ln > 4 and ends("is"):
        s[ln - 1] = "l"
        return ln
    if ln > 3 and (ends("ões") or ends("ães")):
        ln -= 1
        s[ln - 2] = "ã"
        s[ln - 1] = "o"
        return ln
    if ln > 6 and ends("mente"):
        return ln - 5
    if ln > 3 and s[ln - 1] == "s":
        return ln - 1
    return ln


def _norm_feminine(s: list, ln: int) -> int:
    def ends(suf):
        return ln >= len(suf) and "".join(s[ln - len(suf):ln]) == suf

    if ln > 7 and (ends("inha") or ends("iaca") or ends("eira")):
        s[ln - 1] = "o"
        return ln
    if ln > 6:
        if (ends("osa") or ends("ica") or ends("ida") or ends("ada")
                or ends("iva") or ends("ama")):
            s[ln - 1] = "o"
            return ln
        if ends("ona"):
            s[ln - 3] = "ã"
            s[ln - 2] = "o"
            return ln - 1
        if ends("ora"):
            return ln - 1
        if ends("esa"):
            s[ln - 3] = "ê"
            return ln - 1
        if ends("na"):
            s[ln - 1] = "o"
            return ln
    return ln


_FOLD = {
    "à": "a", "á": "a", "â": "a", "ä": "a", "ã": "a",
    "ò": "o", "ó": "o", "ô": "o", "ö": "o", "õ": "o",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ì": "i", "í": "i", "î": "i", "ï": "i", "ç": "c",
}


def portuguese_light_stem(word: str) -> str:
    """PortugueseLightStemmer.stem, operation-for-operation."""
    if len(word) < 4:
        return word
    s = list(word)
    ln = _remove_suffix(s, len(s))
    if ln > 3 and s[ln - 1] == "a":
        ln = _norm_feminine(s, ln)
    if ln > 4 and s[ln - 1] in ("e", "a", "o"):
        ln -= 1
    return "".join(_FOLD.get(c, c) for c in s[:ln])


def portuguese_stream(text: str) -> list:
    """The full PortugueseAnalyzer stream: (term, posInc, start, end)."""
    from .tokenizer import _java_lower, iter_token_spans

    out = []
    pending = 1
    for tok, s, e in iter_token_spans(text):
        t = _java_lower(tok)
        if t in PORTUGUESE_STOP:
            pending += 1
            continue
        out.append((portuguese_light_stem(t), pending, s, e))
        pending = 1
    return out


def portuguese_tokens(text: str) -> list[str]:
    return [t for t, _pi, _s, _e in portuguese_stream(text)]


def portuguese_posinc_stream(text: str) -> list[tuple[str, int]]:
    return [(t, pi) for t, pi, _s, _e in portuguese_stream(text)]
