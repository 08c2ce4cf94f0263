"""Miscellaneous token filters (GT round 55) — reference-exact ports of
the analysis/common filter pack:

  TrimFilter, LengthFilter, TruncateTokenFilter, CapitalizationFilter,
  KeepWordFilter, HyphenatedWordsFilter, FingerprintFilter,
  CodepointCountFilter, DecimalDigitFilter,
  ScandinavianNormalizationFilter, ScandinavianFoldingFilter,
  LimitTokenCountFilter, LimitTokenOffsetFilter,
  LimitTokenPositionFilter, UpperCaseFilter, ApostropheFilter

(lucene/analysis/common/src/java/org/apache/lucene/analysis/
 miscellaneous/*.java, core/DecimalDigitFilter.java,
 core/UpperCaseFilter.java, tr/ApostropheFilter.java)

All of these are pinned bit-for-bit against the COMPILED reference
filters in tests/test_misc_filters.py (tools/lucene_ground_truth.py
run_misc). Tokens are (term, posInc, startOffset, endOffset) tuples
with offsets in UTF-16 code units (the Java convention used across
this package); term strings may contain lone surrogates mid-pipeline
(Java setLength can split a pair) and are handled with surrogatepass.

Filters that DROP tokens accumulate the dropped tokens' position
increments onto the next kept token, exactly like the reference's
FilteringTokenFilter (core analysis/FilteringTokenFilter.java).
"""

from __future__ import annotations

import unicodedata

Token = tuple[str, int, int, int]

# ---------------------------------------------------------------------------
# Java character semantics helpers

# Character.isWhitespace: Unicode space (Zs/Zl/Zp) EXCEPT the
# non-breaking ones, plus the ASCII control whitespace set.
_JAVA_WS_CTRL = {0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F}
_JAVA_WS_NONBREAKING = {0x00A0, 0x2007, 0x202F}


def java_is_whitespace(ch: str) -> bool:
    cp = ord(ch)
    if cp in _JAVA_WS_CTRL:
        return True
    if cp in _JAVA_WS_NONBREAKING:
        return False
    return unicodedata.category(ch) in ("Zs", "Zl", "Zp")


def _u16(s: str) -> list[str]:
    """The string as UTF-16 code units (surrogate pairs split)."""
    out: list[str] = []
    for ch in s:
        cp = ord(ch)
        if cp > 0xFFFF:
            cp -= 0x10000
            out.append(chr(0xD800 + (cp >> 10)))
            out.append(chr(0xDC00 + (cp & 0x3FF)))
        else:
            out.append(ch)
    return out


def _from_u16(units: list[str]) -> str:
    """Join code units back into a str (re-pairing surrogates)."""
    return (
        "".join(units)
        .encode("utf-16-be", "surrogatepass")
        .decode("utf-16-be", "surrogatepass")
    )


def u16_len(s: str) -> int:
    return sum(2 if ord(c) > 0xFFFF else 1 for c in s)


def u16_slice(s: str, n: int) -> str:
    """Java CharTermAttribute.setLength(n): cut at n code units (may
    split a surrogate pair — kept as a lone surrogate, like Java)."""
    return _from_u16(_u16(s)[:n])


def java_char_upper(ch: str) -> str:
    """Character.toUpperCase(char): the 1:1 UnicodeData mapping — chars
    whose full uppercase expands (ß→SS, ligatures) map to themselves."""
    u = ch.upper()
    return u if len(u) == 1 else ch


def java_char_lower(ch: str) -> str:
    """Character.toLowerCase(char): 1:1 mapping; İ (U+0130) → i per
    UnicodeData (Python's .lower() gives the two-char special casing)."""
    if ch == "İ":
        return "i"
    lo = ch.lower()
    return lo if len(lo) == 1 else ch


def java_codepoint_upper(ch: str) -> str:
    """Character.toUpperCase(int) via CharacterUtils.toUpperCase —
    still the 1:1 mapping, applied per code point (astral included)."""
    u = ch.upper()
    return u if len(u) == 1 else ch


# ---------------------------------------------------------------------------
# WhitespaceTokenizer (core/WhitespaceTokenizer.java via CharTokenizer):
# runs of non-isWhitespace chars, split at 255 code units (CharTokenizer
# DEFAULT_MAX_WORD_LEN), offsets in code units.

_MAX_WORD_LEN = 255


def whitespace_tokens(text: str) -> list[Token]:
    units = _u16(text)
    out: list[Token] = []
    i, n = 0, len(units)
    while i < n:
        if java_is_whitespace(units[i]):
            i += 1
            continue
        start = i
        while i < n and not java_is_whitespace(units[i]) and i - start < _MAX_WORD_LEN:
            i += 1
        out.append((_from_u16(units[start:i]), 1, start, i))
    return out


def keyword_token(text: str) -> list[Token]:
    """KeywordTokenizer: the whole input as ONE token — including an
    empty token for empty input (incrementToken returns true once)."""
    n = u16_len(text)
    return [(text, 1, 0, n)]


# ---------------------------------------------------------------------------
# FilteringTokenFilter accumulation

def _filtering(toks: list[Token], accept) -> list[Token]:
    out: list[Token] = []
    skipped = 0
    for term, pi, s, e in toks:
        if accept(term, s, e):
            out.append((term, pi + skipped, s, e))
            skipped = 0
        else:
            skipped += pi
    return out


# ---------------------------------------------------------------------------
# The filters

def trim_filter(toks: list[Token]) -> list[Token]:
    """TrimFilter: strip Java-whitespace code units from both ends;
    never drops a token (an all-whitespace term becomes empty);
    offsets are NOT adjusted (the 7.0 no-updateOffsets behavior)."""
    out: list[Token] = []
    for term, pi, s, e in toks:
        units = _u16(term)
        n = len(units)
        if n == 0:
            out.append((term, pi, s, e))
            continue
        start = 0
        while start < n and java_is_whitespace(units[start]):
            start += 1
        end = n
        while end >= start + 1 and java_is_whitespace(units[end - 1]):
            end -= 1
        if start > 0 or end < n:
            term = _from_u16(units[start:end]) if start < end else ""
        out.append((term, pi, s, e))
    return out


def length_filter(toks: list[Token], min_len: int, max_len: int) -> list[Token]:
    """LengthFilter: keep min <= length-in-code-units <= max."""
    return _filtering(toks, lambda t, s, e: min_len <= u16_len(t) <= max_len)


def truncate_filter(
    toks: list[Token], length: int, keywords: frozenset[str] = frozenset()
) -> list[Token]:
    """SetKeywordMarkerFilter(keywords) + TruncateTokenFilter(length)."""
    out: list[Token] = []
    for term, pi, s, e in toks:
        if term not in keywords and u16_len(term) > length:
            term = u16_slice(term, length)
        out.append((term, pi, s, e))
    return out


def capitalization_filter(
    toks: list[Token],
    *,
    only_first_word: bool = True,
    keep: frozenset[str] | None = None,
    force_first_letter: bool = True,
    ok_prefix: list[str] | None = None,
    min_word_length: int = 0,
    max_word_count: int = 0x7FFFFFFF,
    max_token_length: int = 0x7FFFFFFF,
) -> list[Token]:
    """CapitalizationFilter — including the reference's own loop quirk:
    after processing a word the index advances TWICE, so the char after
    a separator is never itself tested as a separator, and a run of
    separators leaves them glued to the FRONT of the next word (which
    then gets its leading space 'uppercased')."""
    prefixes = [_u16(p) for p in (ok_prefix or [])]

    def process(buf: list[str], off: int, length: int, word_count: int) -> None:
        if length < 1:
            return
        if only_first_word and word_count > 0:
            for i in range(length):
                buf[off + i] = java_char_lower(buf[off + i])
            return
        if keep is not None and _from_u16(buf[off:off + length]) in keep:
            if word_count == 0 and force_first_letter:
                buf[off] = java_char_upper(buf[off])
            return
        if length < min_word_length:
            return
        for pref in prefixes:
            if length >= len(pref) and buf[off:off + len(pref)] == pref:
                return
        buf[off] = java_char_upper(buf[off])
        for i in range(1, length):
            buf[off + i] = java_char_lower(buf[off + i])

    out: list[Token] = []
    for term, pi, s, e in toks:
        buf = _u16(term)
        n = len(buf)
        backup = list(buf) if max_word_count < 0x7FFFFFFF else None
        if n < max_token_length:
            word_count = 0
            last_start = 0
            i = 0
            while i < n:
                c = buf[i]
                if c <= " " or c == ".":
                    ln = i - last_start
                    if ln > 0:
                        process(buf, last_start, ln, word_count)
                        word_count += 1
                        last_start = i + 1
                        i += 1
                i += 1
            if last_start < n:
                process(buf, last_start, n - last_start, word_count)
                word_count += 1
            if word_count > max_word_count:
                buf = backup  # type: ignore[assignment]
        out.append((_from_u16(buf), pi, s, e))
    return out


def keep_word_filter(toks: list[Token], words: frozenset[str]) -> list[Token]:
    return _filtering(toks, lambda t, s, e: t in words)


def hyphenated_words_filter(toks: list[Token]) -> list[Token]:
    """HyphenatedWordsFilter: a token ending in '-' opens (or extends) a
    pending hyphenated word; the next non-hyphen-ending token closes it.
    The merged token keeps the FIRST part's posInc/startOffset and the
    LAST consumed token's endOffset; a trailing unclosed part gets its
    hyphen back."""
    out: list[Token] = []
    pending: list[str] = []
    saved: tuple[int, int] | None = None  # (posInc, startOffset)
    last_end = 0
    for term, pi, s, e in toks:
        last_end = e
        if term.endswith("-") and len(term) > 0:
            if saved is None:
                saved = (pi, s)
            pending.append(term[:-1])
        elif saved is None:
            out.append((term, pi, s, e))
        else:
            pending.append(term)
            out.append(("".join(pending), saved[0], saved[1], last_end))
            pending, saved = [], None
    if saved is not None:
        out.append(("".join(pending) + "-", saved[0], saved[1], last_end))
    return out


def fingerprint_filter(
    toks: list[Token],
    input_u16_len: int,
    max_output_token_size: int = 1024,
    separator: str = " ",
) -> list[Token]:
    """FingerprintFilter: ONE output token = the sorted, deduplicated
    input terms joined by `separator` — or none when empty / over the
    size budget. Size counts code units plus one per separator, checked
    BEFORE each input token (so one token may overflow the budget and
    later ones are skipped un-deduped, exactly like the reference)."""
    seen: list[str] = []
    seen_set: set[str] = set()
    size = 0
    for term, _pi, _s, _e in toks:
        if size > max_output_token_size:
            continue
        if term not in seen_set:
            if seen:
                size += 1
            seen.append(term)
            seen_set.add(term)
            size += u16_len(term)
    if not seen or size > max_output_token_size:
        return []
    if len(seen) == 1:
        return [(seen[0], 1, 0, input_u16_len)]
    items = sorted(seen, key=lambda t: [ord(u) for u in _u16(t)])
    return [(separator.join(items), 1, 0, input_u16_len)]


def codepoint_count_filter(
    toks: list[Token], min_cp: int, max_cp: int
) -> list[Token]:
    return _filtering(toks, lambda t, s, e: min_cp <= len(t) <= max_cp)


def decimal_digit_filter(toks: list[Token]) -> list[Token]:
    """DecimalDigitFilter: fold any non-ASCII decimal digit (category
    Nd) to its Basic Latin equivalent; supplementary digits shrink the
    term by one code unit. Ported loop-for-loop: after folding an astral
    digit the reference's `++i` inside the delete skips one more unit,
    so the SECOND of two consecutive astral digits survives unfolded —
    pinned by the compiled binary."""
    out: list[Token] = []
    for term, pi, s, e in toks:
        buf = _u16(term)
        length = len(buf)
        i = 0
        while i < length:
            # Character.codePointAt(buffer, i, length)
            c = buf[i]
            if (
                0xD800 <= ord(c) <= 0xDBFF
                and i + 1 < length
                and 0xDC00 <= ord(buf[i + 1]) <= 0xDFFF
            ):
                cp = 0x10000 + ((ord(c) - 0xD800) << 10) + (ord(buf[i + 1]) - 0xDC00)
            else:
                cp = ord(c)
            ch = chr(cp)
            if cp > 0x7F and unicodedata.category(ch) == "Nd":
                buf[i] = chr(ord("0") + unicodedata.decimal(ch))
                if cp > 0xFFFF:
                    i += 1
                    del buf[i]
                    length -= 1
            i += 1
        out.append((_from_u16(buf[:length]), pi, s, e))
    return out


_SCAN = {
    "AA": "Å", "aa": "å", "AE": "Æ", "ae": "æ",
    "AE_se": "Ä", "ae_se": "ä", "OE": "Ø", "oe": "ø",
    "OE_se": "Ö", "oe_se": "ö",
}


def scandinavian_normalization_filter(toks: list[Token]) -> list[Token]:
    out: list[Token] = []
    for term, pi, s, e in toks:
        buf = _u16(term)
        length = len(buf)
        i = 0
        while i < length:
            c = buf[i]
            if c == _SCAN["ae_se"]:
                buf[i] = _SCAN["ae"]
            elif c == _SCAN["AE_se"]:
                buf[i] = _SCAN["AE"]
            elif c == _SCAN["oe_se"]:
                buf[i] = _SCAN["oe"]
            elif c == _SCAN["OE_se"]:
                buf[i] = _SCAN["OE"]
            elif length - 1 > i:
                nxt = buf[i + 1]
                if c == "a" and nxt in ("a", "o", "A", "O"):
                    del buf[i + 1]
                    length -= 1
                    buf[i] = _SCAN["aa"]
                elif c == "A" and nxt in ("a", "A", "o", "O"):
                    del buf[i + 1]
                    length -= 1
                    buf[i] = _SCAN["AA"]
                elif c == "a" and nxt in ("e", "E"):
                    del buf[i + 1]
                    length -= 1
                    buf[i] = _SCAN["ae"]
                elif c == "A" and nxt in ("e", "E"):
                    del buf[i + 1]
                    length -= 1
                    buf[i] = _SCAN["AE"]
                elif c == "o" and nxt in ("e", "E", "o", "O"):
                    del buf[i + 1]
                    length -= 1
                    buf[i] = _SCAN["oe"]
                elif c == "O" and nxt in ("e", "E", "o", "O"):
                    del buf[i + 1]
                    length -= 1
                    buf[i] = _SCAN["OE"]
            i += 1
        out.append((_from_u16(buf[:length]), pi, s, e))
    return out


def scandinavian_folding_filter(toks: list[Token]) -> list[Token]:
    out: list[Token] = []
    for term, pi, s, e in toks:
        buf = _u16(term)
        length = len(buf)
        i = 0
        while i < length:
            c = buf[i]
            if c in (_SCAN["aa"], _SCAN["ae_se"], _SCAN["ae"]):
                buf[i] = "a"
            elif c in (_SCAN["AA"], _SCAN["AE_se"], _SCAN["AE"]):
                buf[i] = "A"
            elif c in (_SCAN["oe"], _SCAN["oe_se"]):
                buf[i] = "o"
            elif c in (_SCAN["OE"], _SCAN["OE_se"]):
                buf[i] = "O"
            elif length - 1 > i:
                nxt = buf[i + 1]
                if c in ("a", "A") and nxt in ("a", "A", "e", "E", "o", "O"):
                    del buf[i + 1]
                    length -= 1
                elif c in ("o", "O") and nxt in ("e", "E", "o", "O"):
                    del buf[i + 1]
                    length -= 1
            i += 1
        out.append((_from_u16(buf[:length]), pi, s, e))
    return out


def limit_token_count_filter(toks: list[Token], max_count: int) -> list[Token]:
    return toks[:max_count]


def limit_token_position_filter(
    toks: list[Token], max_position: int
) -> list[Token]:
    out: list[Token] = []
    pos = 0
    for term, pi, s, e in toks:
        pos += pi
        if pos > max_position:
            break
        out.append((term, pi, s, e))
    return out


def limit_token_offset_filter(
    toks: list[Token], max_start_offset: int
) -> list[Token]:
    out: list[Token] = []
    for term, pi, s, e in toks:
        if s > max_start_offset:
            break
        out.append((term, pi, s, e))
    return out


def upper_case_filter(toks: list[Token]) -> list[Token]:
    """UpperCaseFilter: Character.toUpperCase per CODE POINT."""
    return [
        ("".join(java_codepoint_upper(c) for c in term), pi, s, e)
        for term, pi, s, e in toks
    ]


def apostrophe_filter(toks: list[Token]) -> list[Token]:
    """ApostropheFilter (tr): cut the term at the first ' or U+2019."""
    out: list[Token] = []
    for term, pi, s, e in toks:
        for i, u in enumerate(_u16(term)):
            if u in ("'", "’"):
                term = u16_slice(term, i)
                break
        out.append((term, pi, s, e))
    return out
