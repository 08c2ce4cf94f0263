"""CJKWidthFilter + CJKBigramFilter — the standard CJK search chain.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
cjk/CJKWidthFilter.java and CJKBigramFilter.java (CJKAnalyzer.java wires
StandardTokenizer -> CJKWidthFilter -> LowerCaseFilter ->
CJKBigramFilter -> StopFilter).

Pinned bit-for-bit vs the compiled filters (GT round 49):

* CJKWidthFilter: fullwidth ASCII variants (FF01-FF5E) fold to basic
  latin; halfwidth katakana (FF65-FF9F) fold to kana, with the
  halfwidth voice marks FF9E/FF9F COMPOSING into the preceding kana
  when a composed form exists (the KANA_COMBINE tables — the composed
  char replaces both, shortening the term; offsets untouched) and
  falling back to the combining marks 3099/309A otherwise.

* CJKBigramFilter: codepoints of consecutive CJK-typed tokens whose
  offsets are ADJACENT (start == previous end) form one run; a run
  emits sliding bigrams (type <DOUBLE>), a TRUE lone codepoint emits a
  unigram (type <SINGLE>), and the trailing codepoint of a multi-char
  run is emitted only under outputUnigrams — where the emission order
  is A, AB(posInc 0, posLen 2), B, BC(0,2), C.  Runs cross SCRIPTS
  (a katakana token adjacent to a hiragana char keeps one buffer) but
  never cross unaligned offsets or non-CJK tokens, which pass through
  unmodified.  Per-codepoint offsets slice the token span when the
  span length equals the term's UTF-16 length; otherwise (a term
  shortened by width composition) every codepoint keeps the whole
  token's offsets (refill()'s "crazy offsets" branch).

At 100 TB: without bigrams, CJK retrieval is single-character postings
(stopword-scale df for common ideographs); the bigram terms have
phrase-selectivity df at term-query cost — the same trade CommonGrams
makes for stopwords.
"""

from __future__ import annotations

DOUBLE_TYPE = "<DOUBLE>"
SINGLE_TYPE = "<SINGLE>"

#: StandardTokenizer CJK token types (StandardTokenizer.TOKEN_TYPES)
IDEOGRAPHIC = "<IDEOGRAPHIC>"
HIRAGANA = "<HIRAGANA>"
KATAKANA = "<KATAKANA>"
HANGUL = "<HANGUL>"

Token = tuple[str, int, int, int, int, str]

# ---- CJKWidthFilter ------------------------------------------------------

#: halfwidth kana -> kana, indexed FF65..FF9D (CJKWidthFilter.KANA_NORM;
#: FF9E/FF9F fall back to the combining marks 3099/309A when they cannot
#: compose with the preceding char)
_KANA_NORM = [
    0x30FB, 0x30F2, 0x30A1, 0x30A3, 0x30A5, 0x30A7, 0x30A9, 0x30E3, 0x30E5,
    0x30E7, 0x30C3, 0x30FC, 0x30A2, 0x30A4, 0x30A6, 0x30A8, 0x30AA, 0x30AB,
    0x30AD, 0x30AF, 0x30B1, 0x30B3, 0x30B5, 0x30B7, 0x30B9, 0x30BB, 0x30BD,
    0x30BF, 0x30C1, 0x30C4, 0x30C6, 0x30C8, 0x30CA, 0x30CB, 0x30CC, 0x30CD,
    0x30CE, 0x30CF, 0x30D2, 0x30D5, 0x30D8, 0x30DB, 0x30DE, 0x30DF, 0x30E0,
    0x30E1, 0x30E2, 0x30E4, 0x30E6, 0x30E8, 0x30E9, 0x30EA, 0x30EB, 0x30EC,
    0x30ED, 0x30EF, 0x30F3, 0x3099, 0x309A,
]

#: voiced / half-voiced composition deltas, indexed 30A6..30FD
#: (CJKWidthFilter.KANA_COMBINE_VOICED / _HALF_VOICED)
_KANA_COMBINE_VOICED = [
    78, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 0, 0, 1,
    0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1,
]
_KANA_COMBINE_HALF_VOICED = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 2, 0, 0, 2,
    0, 0, 2, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
]


def cjk_width_fold(term: str) -> str:
    """CJKWidthFilter.incrementToken's per-char loop over one term."""
    out: list[int] = []
    for ch in term:
        cp = ord(ch)
        if 0xFF01 <= cp <= 0xFF5E:
            out.append(cp - 0xFEE0)
        elif 0xFF65 <= cp <= 0xFF9F:
            if cp in (0xFF9E, 0xFF9F) and out:
                prev = out[-1]
                if 0x30A6 <= prev <= 0x30FD:
                    d = (
                        _KANA_COMBINE_HALF_VOICED[prev - 0x30A6]
                        if cp == 0xFF9F
                        else _KANA_COMBINE_VOICED[prev - 0x30A6]
                    )
                    if d:
                        out[-1] = prev + d
                        continue
            out.append(_KANA_NORM[cp - 0xFF65])
        else:
            out.append(cp)
    return "".join(map(chr, out))


# ---- StandardTokenizer type classification -------------------------------

def _in_ranges(cp: int, ranges) -> bool:
    return any(lo <= cp <= hi for lo, hi in ranges)


#: script ranges for the four CJK token types the bigram filter reads.
#: The tokenizer (analysis/tokenizer.py) already guarantees the token
#: SHAPES (Han/Hiragana single-char, Katakana runs, Hangul riding \w);
#: this classifier assigns the jflex grammar's TYPE to an emitted token
#: — pinned vs the compiled StandardTokenizer in GT round 49.
_HIRA = [(0x3041, 0x3096), (0x309D, 0x309F), (0x1B001, 0x1B001)]
_HAN = [
    (0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0xF900, 0xFAFF),
    (0x20000, 0x2A6DF), (0x2A700, 0x2B73F), (0x2B740, 0x2B81F),
    (0x2F800, 0x2FA1F), (0x3005, 0x3005), (0x3007, 0x3007),
]
_KATA = [
    (0x30A0, 0x30FF), (0x31F0, 0x31FF), (0x309B, 0x309C),
    (0x32D0, 0x32FE), (0xFF66, 0xFF9D), (0x1B000, 0x1B000),
]
_HANGUL = [
    (0xAC00, 0xD7A3), (0x1100, 0x11FF), (0x3130, 0x318F),
    (0xA960, 0xA97C), (0xD7B0, 0xD7FB), (0xFFA0, 0xFFDC),
]
#: UAX#29 Extend/Format chars ride inside tokens without changing type
import unicodedata as _ud


def _is_extend(ch: str) -> bool:
    cat = _ud.category(ch)
    return cat in ("Mn", "Mc", "Me", "Cf") or ch in "ﾞﾟ"


def standard_token_type(token: str) -> str:
    """The jflex grammar's token type, for the productions the
    CJKBigramFilter cares about: a token is KATAKANA/HANGUL when every
    non-Extend char is in that script (KatakanaEx/HangulEx runs),
    IDEOGRAPHIC/HIRAGANA when it is a single ideograph (single-char
    productions), anything mixed fell through to the complex word rule
    (ALPHANUM).  Pinned vs the compiled tokenizer's TypeAttribute."""
    body = [ch for ch in token if not _is_extend(ch)]
    if not body:
        return "<ALPHANUM>"
    if len(body) == 1:
        cp = ord(body[0])
        if _in_ranges(cp, _HAN):
            return IDEOGRAPHIC
        if _in_ranges(cp, _HIRA):
            return HIRAGANA
    if all(_in_ranges(ord(c), _KATA) for c in body):
        return KATAKANA
    if all(_in_ranges(ord(c), _HANGUL) for c in body):
        return HANGUL
    if all(_in_ranges(ord(c), _HAN) for c in body):
        return IDEOGRAPHIC  # pragma: no cover - single-char by tokenizer
    return "<ALPHANUM>"


# ---- CJKBigramFilter -----------------------------------------------------

def _u16len(s: str) -> int:
    return sum(2 if ord(c) > 0xFFFF else 1 for c in s)


def cjk_bigram_stream(
    tokens,
    han: bool = True,
    hiragana: bool = True,
    katakana: bool = True,
    hangul: bool = True,
    output_unigrams: bool = False,
) -> list[Token]:
    """CJKBigramFilter over (term, posInc, posLen, start, end, type)
    tuples whose offsets are in the SAME units the tokenizer emitted
    (alignment is an equality test, so any monotone unit works).

    Run-based restatement of the reference's incremental machine: the
    buffer only ever grows within an offset-adjacent CJK-typed token
    sequence, so the emitted stream per run is fully determined by the
    run's codepoints — sliding <DOUBLE> bigrams, a <SINGLE> unigram for
    a true lone codepoint, and the unigram-interleaved order under
    outputUnigrams (CJKBigramFilter.java:142-225)."""
    want = set()
    if han:
        want.add(IDEOGRAPHIC)
    if hiragana:
        want.add(HIRAGANA)
    if katakana:
        want.add(KATAKANA)
    if hangul:
        want.add(HANGUL)

    out: list[Token] = []
    run: list[tuple[str, int, int]] = []  # (codepoint char, start, end)
    last_end: int | None = None

    def flush_run() -> None:
        n = len(run)
        if n == 0:
            return
        if n == 1:
            cp, s, e = run[0]
            out.append((cp, 1, 1, s, e, SINGLE_TYPE))
        elif output_unigrams:
            for i, (cp, s, e) in enumerate(run):
                out.append((cp, 1, 1, s, e, SINGLE_TYPE))
                if i + 1 < n:
                    nc, _ns, ne = run[i + 1]
                    out.append((cp + nc, 0, 2, s, ne, DOUBLE_TYPE))
        else:
            for i in range(n - 1):
                cp, s, _e = run[i]
                nc, _ns, ne = run[i + 1]
                out.append((cp + nc, 1, 1, s, ne, DOUBLE_TYPE))
        run.clear()

    for term, pinc, plen, s, e, typ in tokens:
        if typ in want:
            if run and s != last_end:
                # unaligned: the buffered run ends here. A multi-char
                # run has exactly its bigrams; only a TRUE lone
                # codepoint earns a unigram (hasBufferedUnigram)
                flush_run()
            # refill(): per-codepoint offsets — sliced when the token
            # span covers the term exactly (in the caller's offset
            # units: UTF-16 like Java's, or code points like
            # iter_token_spans'), whole-token otherwise (a term
            # shortened by width composition — the "crazy offsets"
            # branch)
            span = e - s
            if span == _u16len(term) and span > 0:
                pos = s
                for cp in term:
                    w = 2 if ord(cp) > 0xFFFF else 1
                    run.append((cp, pos, pos + w))
                    pos += w
            elif span == len(term):
                pos = s
                for cp in term:
                    run.append((cp, pos, pos + 1))
                    pos += 1
            else:
                for cp in term:
                    run.append((cp, s, e))
            last_end = e
        else:
            # the reference keeps its buffer across a pass-through token
            # and would extend it if a LATER CJK token's start offset
            # equaled the remembered end — impossible from a tokenizer
            # (the pass-through token occupies the offsets in between),
            # only reachable from synonym-stacked streams, which this
            # chain never feeds it. We flush instead.
            flush_run()
            last_end = None
            out.append((term, pinc, plen, s, e, typ))
    flush_run()
    return out


# ---- the engine chain ----------------------------------------------------

def cjk_chain_stream(text: str) -> list[tuple[str, int]]:
    """The CJKAnalyzer chain as a POSINC stream: StandardTokenizer
    (iter_token_spans — offsets in code points; alignment is an
    equality test so the units cancel) -> CJKWidthFilter ->
    LowerCaseFilter -> CJKBigramFilter(default flags).  Types come from
    the PRE-fold token exactly like the reference, where the tokenizer
    sets TypeAttribute before any filter runs.  CJKAnalyzer's trailing
    CJK StopFilter is omitted (its list is the English stop set plus a
    handful of particles; compose a stop filter downstream if needed)."""
    from .tokenizer import _java_lower, iter_token_spans

    toks: list[Token] = []
    for t, s, e in iter_token_spans(text):
        typ = standard_token_type(t)
        toks.append((_java_lower(cjk_width_fold(t)), 1, 1, s, e, typ))
    return [(t, pi) for t, pi, _pl, _s, _e, _ty in cjk_bigram_stream(toks)]
