"""StandardAnalyzer-equivalent analysis chain, shared by engine and oracle.

Reference semantics (behavior only; implementation is regex/numpy, not a DFA
port):
  - StandardTokenizer: UAX#29 word-break subset sufficient for source code /
    ASCII-dominant text. ALPHANUM runs (unicode \\w incl. '_' as ExtendNumLet
    joiner), mid-token [.'] between alphanumerics (MidNumLet / Single_Quote,
    WB6/WB7), ',' between digits (MidNum, WB11/WB12).
    lucene/analysis/common/.../standard/StandardTokenizerImpl.jflex:125-163
  - maxTokenLength 255: longer tokens are dropped (never emitted), so they do
    not count toward field length.  StandardAnalyzer.java:39,
    StandardTokenizer.java:173-176.
  - StandardFilter: no-op in this version.
  - LowerCaseFilter: per-codepoint Character.toLowerCase(int);
    U+0130 'İ' maps to a single 'i' (Python str.lower would expand to 2 cp).
  - StopFilter: the 33-word English set, StopAnalyzer.java:42-48; removed
    tokens do not count toward field length (norms).

field_len (for norms) == number of tokens emitted after the full chain,
matching FieldInvertState.length with discountOverlaps (no overlaps here).
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np

# UAX#29 word-break (the reference grammar's Unicode 6.3-era tables,
# pinned EMPIRICALLY against the compiled StandardTokenizer in GT round
# 30 — every class below verified char-by-char):
#   MidLetter  joins ALetter  x ALetter  (WB6/7):  : · ΅ ״ ‧ ︓ ﹕ ：
#   MidNum     joins Numeric  x Numeric  (WB11/12): , ; ٬ ﹐ ﹔ ， ； ;
#   MidNumLet + Single_Quote join BOTH same-type sides: . ' ‘ ’ ․ ﹒ ．
#   mixed sides NEVER join ("ab.12" splits; "a1.2b" joins at 1.2),
#   double joiners split, '_' (ExtendNumLet) rides inside \w runs.
# Han + Hiragana ideographs are SINGLE-char tokens; Katakana forms runs;
# Hangul is ALetter (rides in \w with the joiners).
_MIDL = ":··״‧︓﹕："
_MIDNUM = ",;٬﹐﹔，；;"
_MIDNL = ".'‘’․﹒．"
# Han/Hiragana single-char tokens: BMP blocks + the 6.3-era astral
# ideograph planes (CJK Ext B/C/D + compat supplement, Kana supplement)
# — pinned single-char vs the compiled chain in GT round 30b
# Hiragana splits around U+3099-309C: 3099-309A are combining voicing
# marks (WB Extend), 309B-309C the FULL-width voicing marks (WB
# Katakana! they run: "\u30ab\u309b" joins, "\u309b\u309c" is its own
# token), 309D-309F iteration marks stay single-char. U+1B000 is
# KATAKANA archaic E (runs); U+1B001 HIRAGANA archaic YE (single).
_CJK = (
    "\u4e00-\u9fff\u3400-\u4dbf\uf900-\ufaff\u3041-\u3096\u309d-\u309f"
    "\U00020000-\U0002A6DF\U0002A700-\U0002B73F\U0002B740-\U0002B81F"
    "\U0002F800-\U0002FA1F\U0001B001"
)
# Katakana (WB13 runs; bridged to \w runs by ExtendNumLet '_' per
# WB13a/b): BMP + phonetic extensions + fullwidth voicing marks +
# circled (32D0-32FE) + HALFWIDTH (FF66-FF9D; FF9E-FF9F are Extend) +
# astral archaic E
_KATA = (
    "\u30a0-\u30ff\u31f0-\u31ff\u309b\u309c\u32d0-\u32fe"
    "\uff66-\uff9d\U0001B000"
)
# ExtendNumLet (connector punctuation, WB13a/b): rides inside \w runs
# AND bridges them to Katakana runs in BOTH directions ("\u30ab_ab",
# "ab_\u30ab", "12_\u30ab" are ONE token each; Han/Hiragana do NOT
# bridge) — pinned vs the compiled chain in GT round 30b
_ENL = "_\u203f\u2040\u2054\ufe33\ufe34\ufe4d-\ufe4f\uff3f"
_ENL_CHARS = "_\u203f\u2040\u2054\ufe33\ufe34\ufe4d\ufe4e\ufe4f\uff3f"
# \w minus Han/Hiragana/Katakana. Python \w covers only '_' among the
# connector punctuation; texts carrying the EXOTIC Pc connectors
# (\u203f et al) route to the scanner via _RARE_RE below, keeping this
# hot-path class a single-character-class test.
_W = rf"[^\W{_CJK}{_KATA}]"
_WL = rf"[^\W\d_{_CJK}{_KATA}]"   # letter side for joiner adjacency
_JEXT = (
    rf"(?:(?<={_WL})[{_MIDL}{_MIDNL}](?={_WL}){_W}+"
    rf"|(?<=\d)[{_MIDNUM}{_MIDNL}](?=\d){_W}+)*"
)
TOKEN_RE = re.compile(
    rf"(?:{_W}+{_JEXT}|[{_KATA}]+)"
    rf"(?:(?<=_)[{_KATA}]+|(?<=[{_KATA}])_{_W}*{_JEXT})*"
    rf"|[{_CJK}]",
    re.UNICODE,
)

# UAX#29 WB4: Extend/Format chars (combining marks Mn/Mc/Me + format
# controls Cf - ZWJ/ZWNJ/soft-hyphen/bidi marks) are TRANSPARENT token
# extenders: they attach to the PRECEDING char (riding in the emitted
# token text), never start a token, and the grammar's side classes look
# through them ("ab\u0301:cd" is ONE token; "1,\u03012" joins with the
# mark riding between ',' and '2') - pinned vs the compiled chain in GT
# round 30b. Texts containing any such char leave the fast regex for
# _scan_token_spans; stdlib `re` cannot express the variable-length
# mark-transparent lookbehinds.
from .uax29_ext import EXTEND_FORMAT_CLASS

# + the HALFWIDTH katakana voicing marks FF9E-FF9F (category Lm, but WB
# Extend in the reference tables: "a\uff9e" is ONE token)
_E_CLASS = EXTEND_FORMAT_CLASS + "\uff9e\uff9f"

_E_RE = re.compile(rf"[{_E_CLASS}]")
# rare-path detector: extend/format chars OR the exotic (non-'_')
# connector punctuation the fast regex does not model
_RARE_RE = re.compile(rf"[{_E_CLASS}\u203f\u2040\u2054\ufe33\ufe34"
                      rf"\ufe4d-\ufe4f\uff3f]")
_KATA_ONE = re.compile(rf"[{_KATA}]")
_CJK_ONE = re.compile(rf"[{_CJK}]")
_W_ONE = re.compile(_W)
_WL_ONE = re.compile(_WL)
_D_ONE = re.compile(r"\d")
_J_LETTER = frozenset(_MIDL + _MIDNL)
_J_DIGIT = frozenset(_MIDNUM + _MIDNL)


def _scan_token_spans(text: str) -> list[tuple[str, int, int]]:
    """The UAX#29 walk for texts carrying Extend/Format chars - same
    grammar as TOKEN_RE plus the WB4 transparency rules. Returns
    (token_text, start, end) spans; token_text INCLUDES the riding
    extend/format chars (the reference emits them in the term)."""
    out: list[tuple[str, int, int]] = []
    n = len(text)
    i = 0
    start = -1
    mode = ""   # 'w' | 'kata' | 'cjk'
    eff = ""    # effective joiner side class in w mode: 'L' | 'D' | ''
    last = ""   # last concrete (non-extend) char of the open token

    def close(end: int) -> None:
        nonlocal start, mode
        if start >= 0:
            out.append((text[start:end], start, end))
        start = -1
        mode = ""

    while i < n:
        c = text[i]
        if _E_RE.match(c):
            # extends the open token; an orphan extender (after sot /
            # space / a failed joiner) is dropped
            i += 1
            continue
        if _KATA_ONE.match(c):
            if mode == "w" and last in _ENL_CHARS:
                mode = "kata"   # WB13b: ExtendNumLet x Katakana bridges
            elif mode != "kata":
                close(i)
                start = i
                mode = "kata"
            last = c
            i += 1
            continue
        if _CJK_ONE.match(c):
            close(i)
            start = i
            mode = "cjk"
            last = c
            i += 1
            continue
        if _W_ONE.match(c) or c in _ENL_CHARS:
            # the exotic (non-'_') Pc connectors are not Python \w but
            # ARE ExtendNumLet — word chars for the scanner
            if mode == "kata" and c in _ENL_CHARS:
                mode = "w"      # WB13a: Katakana x ExtendNumLet bridges
            elif mode != "w":
                close(i)
                start = i
                mode = "w"
            eff = "D" if _D_ONE.match(c) else ("L" if _WL_ONE.match(c) else "")
            last = c
            i += 1
            continue
        if mode == "w" and (c in _J_LETTER or c in _J_DIGIT):
            # mid-token joiner: side classes look THROUGH extenders
            j = i + 1
            while j < n and _E_RE.match(text[j]):
                j += 1
            nxt = text[j] if j < n else ""
            ok = bool(nxt) and (
                (eff == "L" and c in _J_LETTER and _WL_ONE.match(nxt))
                or (eff == "D" and c in _J_DIGIT and _D_ONE.match(nxt))
            )
            if ok:
                i = j  # joiner + riding extenders stay inside the token
                continue
            close(i)
            i += 1
            continue
        close(i)
        i += 1
    close(n)
    return out


def _emittable(t: str) -> bool:
    """ALPHANUM/NUM/KATAKANA check for scanner tokens: at least one
    letter/digit or Katakana char (extenders, connector punctuation and
    joiners alone don't make a token; a bare KATAKANA grammar token like
    the double-hyphen or voicing marks IS emitted)."""
    return any(ch.isalnum() for ch in t) or _KATA_ONE.search(t) is not None


def _split_overlong_scan(t: str) -> list[str]:
    """maxTokenLength window split on the scanner path (the extend/
    format-bearing analog of _split_overlong)."""
    out = []
    i, n = 0, len(t)
    while i < n:
        spans = _scan_token_spans(t[i : i + MAX_TOKEN_LENGTH])
        if not spans or spans[0][1] != 0:
            i += 1
            continue
        tok, _s, e = spans[0]
        out.append(tok)
        i += e
    return out


# Tokens must contain at least one letter/digit (a pure '_'/joiner run is not
# an ALPHANUM/NUM segment and is never emitted by StandardTokenizer).
_HAS_ALNUM_RE = re.compile(r"[^\W_]", re.UNICODE)

MAX_TOKEN_LENGTH = 255

# StopAnalyzer.ENGLISH_STOP_WORDS_SET (StopAnalyzer.java:42-48)
ENGLISH_STOP_WORDS = frozenset(
    [
        "a", "an", "and", "are", "as", "at", "be", "but", "by",
        "for", "if", "in", "into", "is", "it",
        "no", "not", "of", "on", "or", "such",
        "that", "the", "their", "then", "there", "these",
        "they", "this", "to", "was", "will", "with",
    ]
)


def _java_lower(text: str) -> str:
    """Per-codepoint lowercase matching Java Character.toLowerCase(int) on the
    cases where Python's str.lower() diverges: dotted capital I expands, and
    str.lower()'s context-sensitive Final_Sigma rule maps a word-final 'Σ' to
    'ς' while Java's per-codepoint map always gives 'σ' (a pre-existing 'ς'
    stays 'ς' under both)."""
    if "İ" in text:
        text = text.replace("İ", "i")
    if "Σ" in text:
        lowered = list(text.lower())
        for i, ch in enumerate(text):
            if ch == "Σ":
                lowered[i] = "σ"
        return "".join(lowered)
    return text.lower()


def _split_overlong(t: str) -> list[str]:
    """A maximal token longer than maxTokenLength: the reference's jflex
    scanner buffer is sized to maxTokenLength (StandardTokenizer.java:
    108-110 setBufferSize), so a longer run is SPLIT — each piece is the
    longest grammar match within a 255-char window, window-leading
    non-starters (a joiner the previous match stopped before) skipped.
    Pinned vs the compiled chain in GT round 30 (256-char runs emit
    255+1, never dropped)."""
    out = []
    i, n = 0, len(t)
    while i < n:
        m = TOKEN_RE.match(t[i:i + MAX_TOKEN_LENGTH])
        if m is None:
            i += 1
            continue
        out.append(m.group(0))
        i += len(m.group(0))
    return out


def _findall_tokens(text: str) -> list[str]:
    if not text.isascii() and _RARE_RE.search(text):
        # rare path: extend/format chars present (WB4 transparency)
        out = []
        for t, _s, _e in _scan_token_spans(text):
            if not _emittable(t):
                continue
            if len(t) <= MAX_TOKEN_LENGTH:
                out.append(t)
            else:
                out.extend(
                    p for p in _split_overlong_scan(t) if _emittable(p)
                )
        return out
    out = []
    for t in TOKEN_RE.findall(text):
        # a pure '_' run is not an ALPHANUM/NUM segment (strip-check is a
        # fast equivalent of searching for a non-underscore \w char)
        if not t.strip(_ENL_CHARS):
            continue
        if len(t) <= MAX_TOKEN_LENGTH:
            out.append(t)
        else:
            out.extend(p for p in _split_overlong(t) if p.strip(_ENL_CHARS))
    return out


def iter_token_spans(text: str) -> list[tuple[str, int, int]]:
    """Tokenizer output WITH original-text offsets: [(token, start,
    end)] — the OffsetAttribute stream (classic highlighter et al).
    Over-long runs split into 255-char-window grammar matches, each
    window piece at its own offset (GT round 30); extend/format-bearing
    texts take the WB4 scanner (GT round 30b)."""
    if not text.isascii() and _RARE_RE.search(text):
        spans: list[tuple[str, int, int]] = []
        for t, s, e in _scan_token_spans(text):
            if not _emittable(t):
                continue
            if len(t) <= MAX_TOKEN_LENGTH:
                spans.append((t, s, e))
                continue
            o = 0
            for p in _split_overlong_scan(t):
                o = t.index(p, o)
                if _emittable(p):
                    spans.append((p, s + o, s + o + len(p)))
                o += len(p)
        return spans
    out: list[tuple[str, int, int]] = []
    for m in TOKEN_RE.finditer(text):
        tok = m.group(0)
        if not tok.strip(_ENL_CHARS):
            continue
        if len(tok) <= MAX_TOKEN_LENGTH:
            out.append((tok, m.start(), m.end()))
            continue
        i, n = 0, len(tok)
        while i < n:
            sub = TOKEN_RE.match(tok[i : i + MAX_TOKEN_LENGTH])
            if sub is None:
                i += 1
                continue
            if sub.group(0).strip(_ENL_CHARS):
                out.append((sub.group(0), m.start() + i,
                            m.start() + i + len(sub.group(0))))
            i += len(sub.group(0))
    return out


def tokenize(text: str) -> list[str]:
    """StandardTokenizer + maxTokenLength buffer-split (pre-filters)."""
    if not text:
        return []
    return _findall_tokens(text)


def _tokenize_lowered(text: str) -> list[str]:
    """tokenize + lowercase in bulk: case never changes \\w token boundaries
    (and 'İ' is pre-substituted), so lowering the whole text first is
    equivalent to per-token _java_lower and much faster."""
    if not text:
        return []
    return _findall_tokens(_java_lower(text))


def analyze(text: str) -> list[str]:
    """Full chain: tokenize -> lowercase -> stop filter. Returns final tokens;
    len(result) is the field length used for norms."""
    stop = ENGLISH_STOP_WORDS
    return [t for t in _tokenize_lowered(text) if t not in stop]


# ------------------------------------------------- analyzer plug point
# The reference's Analyzer abstraction (analysis/common): every analyzer
# is a raw-tokenize function + which of the standard filters apply.
# token_table/analyze_as dispatch on the name, so the index build, the
# query side, and the control oracle share one registry.

import re as _re

_LETTER_RE = _re.compile(r"[^\W\d_]+")  # LetterTokenizer: maximal letter runs


def _ws_tokens(t: str) -> list[str]:
    """WhitespaceTokenizer (analysis/core/WhitespaceTokenizer.java):
    split on whitespace, NO case folding, NO stop filter."""
    return t.split()


def _simple_tokens(t: str) -> list[str]:
    """SimpleAnalyzer = LetterTokenizer + LowerCaseFilter
    (analysis/core/SimpleAnalyzer.java)."""
    return _LETTER_RE.findall(t.lower())


def _keyword_tokens(t: str) -> list[str]:
    """KeywordAnalyzer: the whole input is ONE token
    (analysis/core/KeywordAnalyzer.java)."""
    return [t] if t else []


def _english_raw(t: str) -> list[str]:
    """EnglishAnalyzer pre-stop stream (analysis/en/EnglishAnalyzer.java
    createComponents): StandardTokenizer -> EnglishPossessiveFilter ->
    LowerCaseFilter. The StopFilter + PorterStemFilter tail comes from
    the registry flags (stem runs AFTER stop, as a vocab-level term map)."""
    from lucene_solr_spark.analysis.filters import strip_possessive

    return [strip_possessive(x) for x in _tokenize_lowered(t)]


def _classic_raw(t: str) -> list[str]:
    """ClassicAnalyzer pre-stop stream (standard/ClassicAnalyzer.java
    createComponents): ClassicTokenizer -> ClassicFilter -> LowerCase.
    Emails/hosts/acronyms/serials stay single tokens (GT round 58,
    analysis/classic.py — pinned vs the compiled scanner). The StopFilter
    tail comes from the registry flag."""
    from lucene_solr_spark.analysis.classic import classic_tokens

    return [_java_lower(term) for term, _ty, _pi, _s, _e in classic_tokens(t)]


def _folding_raw(t: str) -> list[str]:
    """standard chain + ASCIIFoldingFilter (analysis/miscellaneous/
    ASCIIFoldingFilter.java) applied after lowercasing."""
    from lucene_solr_spark.analysis.filters import ascii_fold

    return [ascii_fold(x) for x in _tokenize_lowered(t)]


def _shingle_raw(t: str) -> list[str]:
    """standard chain + ShingleFilter(2,2, outputUnigrams=false,
    separator '_') — the reference-EXACT stream machine (pinned GT
    round 44: capped fillers per hole incl. trailing end() holes,
    all-filler grams never emitted), joined by '_' so bigram terms stay
    single index tokens. Positions index the shingle OUTPUT stream."""
    from lucene_solr_spark.analysis.filters import shingle_stream

    toks, gap = [], 0
    for i, tok in enumerate(_tokenize_lowered(t)):
        if tok in ENGLISH_STOP_WORDS:
            gap += 1
            continue
        toks.append((tok, 1 + gap, 0, 0))
        gap = 0
    return [
        term
        for term, _pi, _pl, _s, _e, _ty in shingle_stream(
            toks, 2, 2, output_unigrams=False, sep="_", end_pos_inc=gap
        )
    ]


def _porter_map(term: str) -> str:
    from lucene_solr_spark.analysis.porter import porter_stem

    return porter_stem(term)


def _porter2_map(term: str) -> str:
    from lucene_solr_spark.analysis.snowball_en import porter2_stem

    return porter2_stem(term)


def _german2_map(term: str) -> str:
    from lucene_solr_spark.analysis.snowball_de import german2_stem

    return german2_stem(term)


def _french_map(term: str) -> str:
    from lucene_solr_spark.analysis.snowball_fr import french_stem

    return french_stem(term)


def _spanish_map(term: str) -> str:
    from lucene_solr_spark.analysis.snowball_es import spanish_stem

    return spanish_stem(term)


def _italian_map(term: str) -> str:
    from lucene_solr_spark.analysis.snowball_it import italian_stem

    return italian_stem(term)


def _dutch_map(term: str) -> str:
    from lucene_solr_spark.analysis.snowball_nl import dutch_stem

    return dutch_stem(term)


def _russian_map(term: str) -> str:
    from lucene_solr_spark.analysis.snowball_ru import russian_stem

    return russian_stem(term)


def _french_light_tokens(t: str) -> list[str]:
    from lucene_solr_spark.analysis.french_light import french_tokens

    return french_tokens(t)


def _french_light_posinc(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.french_light import french_posinc_stream

    return french_posinc_stream(t)


def _german_light_tokens(t: str) -> list[str]:
    from lucene_solr_spark.analysis.german_light import german_tokens

    return german_tokens(t)


def _german_light_posinc(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.german_light import german_posinc_stream

    return german_posinc_stream(t)


def _italian_light_tokens(t: str) -> list[str]:
    from lucene_solr_spark.analysis.italian_light import italian_tokens

    return italian_tokens(t)


def _italian_light_posinc(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.italian_light import italian_posinc_stream

    return italian_posinc_stream(t)


def _spanish_light_tokens(t: str) -> list[str]:
    from lucene_solr_spark.analysis.spanish_light import spanish_tokens

    return spanish_tokens(t)


def _spanish_light_posinc(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.spanish_light import spanish_posinc_stream

    return spanish_posinc_stream(t)


def _russian_full_tokens(t: str) -> list[str]:
    from lucene_solr_spark.analysis.lang_analyzers import (
        russian_analyzer_stream,
    )

    return [x for x, _pi, _s, _e in russian_analyzer_stream(t)]


def _russian_full_posinc(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.lang_analyzers import (
        russian_analyzer_stream,
    )

    return [(x, pi) for x, pi, _s, _e in russian_analyzer_stream(t)]


def _dutch_full_tokens(t: str) -> list[str]:
    from lucene_solr_spark.analysis.lang_analyzers import (
        dutch_analyzer_stream,
    )

    return [x for x, _pi, _s, _e in dutch_analyzer_stream(t)]


def _dutch_full_posinc(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.lang_analyzers import (
        dutch_analyzer_stream,
    )

    return [(x, pi) for x, pi, _s, _e in dutch_analyzer_stream(t)]


def _portuguese_light_tokens(t: str) -> list[str]:
    from lucene_solr_spark.analysis.portuguese_light import portuguese_tokens

    return portuguese_tokens(t)


def _portuguese_light_posinc(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.portuguese_light import (
        portuguese_posinc_stream,
    )

    return portuguese_posinc_stream(t)


def _arabic_light_tokens(t: str) -> list[str]:
    from lucene_solr_spark.analysis.arabic_light import arabic_stream

    return [x for x, _pi, _s, _e in arabic_stream(t)]


def _arabic_light_posinc(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.arabic_light import arabic_stream

    return [(x, pi) for x, pi, _s, _e in arabic_stream(t)]


def _czech_light_tokens(t: str) -> list[str]:
    from lucene_solr_spark.analysis.czech_light import czech_stream

    return [x for x, _pi, _s, _e in czech_stream(t)]


def _czech_light_posinc(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.czech_light import czech_stream

    return [(x, pi) for x, pi, _s, _e in czech_stream(t)]


def _persian_light_tokens(t: str) -> list[str]:
    from lucene_solr_spark.analysis.persian_light import persian_stream

    return [x for x, _pi, _s, _e in persian_stream(t)]


def _persian_light_posinc(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.persian_light import persian_stream

    return [(x, pi) for x, pi, _s, _e in persian_stream(t)]


def _greek_light_tokens(t: str) -> list[str]:
    from lucene_solr_spark.analysis.greek_light import greek_stream

    return [x for x, _pi, _s, _e in greek_stream(t)]


def _greek_light_posinc(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.greek_light import greek_stream

    return [(x, pi) for x, pi, _s, _e in greek_stream(t)]


def _hindi_light_tokens(t: str) -> list[str]:
    from lucene_solr_spark.analysis.hindi_light import hindi_stream

    return [x for x, _pi, _s, _e in hindi_stream(t)]


def _hindi_light_posinc(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.hindi_light import hindi_stream

    return [(x, pi) for x, pi, _s, _e in hindi_stream(t)]


def _bulgarian_light_tokens(t: str) -> list[str]:
    from lucene_solr_spark.analysis.bulgarian_light import bulgarian_stream

    return [x for x, _pi, _s, _e in bulgarian_stream(t)]


def _bulgarian_light_posinc(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.bulgarian_light import bulgarian_stream

    return [(x, pi) for x, pi, _s, _e in bulgarian_stream(t)]


def _indonesian_light_tokens(t: str) -> list[str]:
    from lucene_solr_spark.analysis.indonesian_light import (
        indonesian_stream,
    )

    return [x for x, _pi, _s, _e in indonesian_stream(t)]


def _indonesian_light_posinc(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.indonesian_light import (
        indonesian_stream,
    )

    return [(x, pi) for x, pi, _s, _e in indonesian_stream(t)]


def _latvian_light_tokens(t: str) -> list[str]:
    from lucene_solr_spark.analysis.latvian_light import latvian_stream

    return [x for x, _pi, _s, _e in latvian_stream(t)]


def _latvian_light_posinc(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.latvian_light import latvian_stream

    return [(x, pi) for x, pi, _s, _e in latvian_stream(t)]


def _sorani_light_tokens(t: str) -> list[str]:
    from lucene_solr_spark.analysis.sorani_light import sorani_stream

    return [x for x, _pi, _s, _e in sorani_stream(t)]


def _sorani_light_posinc(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.sorani_light import sorani_stream

    return [(x, pi) for x, pi, _s, _e in sorani_stream(t)]


def _portuguese_map(term: str) -> str:
    from lucene_solr_spark.analysis.snowball_pt import portuguese_stem

    return portuguese_stem(term)


def _norwegian_map(term: str) -> str:
    from lucene_solr_spark.analysis.snowball_scand import norwegian_stem

    return norwegian_stem(term)


def _danish_map(term: str) -> str:
    from lucene_solr_spark.analysis.snowball_scand import danish_stem

    return danish_stem(term)


def _swedish_map(term: str) -> str:
    from lucene_solr_spark.analysis.snowball_scand import swedish_stem

    return swedish_stem(term)


#: DelimitedPayloadTokenFilter.DEFAULT_DELIMITER
#: (analysis/payloads/DelimitedPayloadTokenFilter.java:40)
PAYLOAD_DELIMITER = "|"


def _strip_payload(term: str) -> str:
    """DelimitedPayloadTokenFilter term part: characters before the FIRST
    delimiter (the filter scans left-to-right and truncates at the first
    hit — DelimitedPayloadTokenFilter.java:57-63); no delimiter keeps the
    whole token (payload null)."""
    return term.partition(PAYLOAD_DELIMITER)[0]


#: analyzers whose chain contains DelimitedPayloadTokenFilter(FloatEncoder);
#: token_table(with_payloads=True) emits a per-occurrence float32 payload
#: for these (NaN = no delimiter = null payload)
PAYLOAD_ANALYZERS = frozenset({"wspayload"})


def _code_tokens(t: str) -> list[str]:
    from lucene_solr_spark.analysis.word_delimiter import code_tokens

    return code_tokens(t)


def _code_posinc_stream(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.word_delimiter import code_stream

    return code_stream(t)


#: analyzers whose chain emits its OWN position increments (stacked /
#: gapped tokens): name -> fn(text) -> [(token, posInc)]. token_table
#: derives positions from these streams instead of enumeration.
#: Mutable: synonym chains register here (analysis/synonyms.py) — like
#: Lucene, the SynonymMap is an analyzer-side artifact the app supplies
#: to BOTH the writer and the reader; the manifest records only the name
def _english_dual_posinc_stream(t: str) -> list[tuple[str, int]]:
    """whitespace -> lowercase -> KeywordRepeatFilter -> PorterStem ->
    RemoveDuplicates (GT round 51): every word indexes as its ORIGINAL
    form plus, when different, its stem stacked at the same position —
    exact-form queries stay precise while stem queries recall across
    inflections."""
    from lucene_solr_spark.analysis.filters import keyword_repeat_stem_stream
    from lucene_solr_spark.analysis.porter import porter_stem

    return keyword_repeat_stem_stream(
        [(_java_lower(x), 1) for x in _ws_tokens(t)], porter_stem
    )


def _english_dual_tokens(t: str) -> list[str]:
    return [x for x, _pi in _english_dual_posinc_stream(t)]


def _english_dual_query_stream(t: str) -> list[tuple[str, int]]:
    """QUERY side of the dual chain: lowercase only — no repeat, no
    stem. The INDEX holds both forms, so the user's term picks the
    semantics: an exact form ('running') matches only its own postings,
    the stem ('run') meets every inflection (Solr pairs the
    KeywordRepeat index stack with a plain query stack for exactly
    this reason)."""
    return [(_java_lower(x), 1) for x in _ws_tokens(t)]


def _cjk_posinc_stream(t: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis.cjk import cjk_chain_stream

    return cjk_chain_stream(t)


def _cjk_tokens(t: str) -> list[str]:
    return [x for x, _pi in _cjk_posinc_stream(t)]


POSINC_STREAMS: dict = {
    "code": _code_posinc_stream,
    "cjk": _cjk_posinc_stream,
    "french_light": _french_light_posinc,
    "german_light": _german_light_posinc,
    "italian_light": _italian_light_posinc,
    "spanish_light": _spanish_light_posinc,
    "russian_full": _russian_full_posinc,
    "dutch_full": _dutch_full_posinc,
    "portuguese_light": _portuguese_light_posinc,
    "arabic_light": _arabic_light_posinc,
    "czech_light": _czech_light_posinc,
    "persian_light": _persian_light_posinc,
    "greek_light": _greek_light_posinc,
    "hindi_light": _hindi_light_posinc,
    "bulgarian_light": _bulgarian_light_posinc,
    "indonesian_light": _indonesian_light_posinc,
    "latvian_light": _latvian_light_posinc,
    "sorani_light": _sorani_light_posinc,
    "english_dual": _english_dual_posinc_stream,
}
POSINC_ANALYZERS = POSINC_STREAMS.keys()

#: QUERY-side posInc stream overrides: chains whose query analyzer
#: stack differs from the index stack (Solr's separate <analyzer
#: type="index"/"query"> stacks — today the commongrams chain, whose
#: query side runs CommonGramsQueryFilter). analyze_as /
#: analyze_with_positions_as consult this FIRST; absent names use the
#: index chain on both sides, as before.
QUERY_POSINC_STREAMS: dict = {"english_dual": _english_dual_query_stream}


def _code_posinc_batch(texts: list[str]):
    from lucene_solr_spark.analysis.word_delimiter import code_stream_batch

    return code_stream_batch(texts)


#: optional BATCH form of a POSINC stream (fn(texts) -> (token_lists,
#: posinc_lists)): runs the expensive filter once per DISTINCT token
#: (vocabulary level) instead of per occurrence — the build hot path
#: prefers it when present
POSINC_BATCH_STREAMS: dict = {"code": _code_posinc_batch}

#: picklable specs for dynamically registered chains (synonym maps):
#: Spark python workers import this module FRESH, so the index build
#: captures the spec into its UDF closures and re-registers there
#: (ensure_chain) — the engine analog of shipping the Analyzer object
#: to the executors
DYNAMIC_CHAINS: dict = {}


def ensure_chain(name: str, spec) -> None:
    """Re-register a dynamic chain on a Spark worker (no-op when the
    name is already registered, e.g. driver-side)."""
    if name in ANALYZERS or spec is None:
        return
    kind = spec[0]
    if kind == "synonym":
        from lucene_solr_spark.analysis.synonyms import register_synonym_analyzer

        _k, trie, ignore_case, lowercase_after = spec
        register_synonym_analyzer(
            name, trie, ignore_case=ignore_case, lowercase_after=lowercase_after
        )
    elif kind == "commongrams":
        from lucene_solr_spark.analysis.commongrams import (
            register_commongrams_analyzer,
        )

        _k, words, lowercase = spec
        register_commongrams_analyzer(name, words, lowercase=lowercase)
    elif kind == "revwildcard":
        from lucene_solr_spark.analysis.revwildcard import (
            register_reversed_wildcard_analyzer,
        )

        _k, with_original, marker = spec
        register_reversed_wildcard_analyzer(
            name, with_original=with_original, marker=marker
        )
    elif kind == "mapping":
        from lucene_solr_spark.analysis.charfilters import (
            register_mapping_analyzer,
        )

        _k, rules, base = spec
        register_mapping_analyzer(name, rules, base=base)
    elif kind == "edgegram":
        from lucene_solr_spark.analysis.filters import (
            register_edge_ngram_analyzer,
        )

        _k, min_gram, max_gram = spec
        register_edge_ngram_analyzer(name, min_gram, max_gram)
    elif kind == "pattern":
        from lucene_solr_spark.analysis.pattern import register_pattern_analyzer

        _k, pattern, group, lowercase = spec
        register_pattern_analyzer(name, pattern, group, lowercase)
    elif kind == "path":
        from lucene_solr_spark.analysis.path_hierarchy import (
            register_path_analyzer,
        )

        _k, delimiter, replacement, skip, reverse = spec
        register_path_analyzer(name, delimiter, replacement, skip, reverse)
    else:  # pragma: no cover - future chain kinds
        raise ValueError(f"unknown dynamic chain kind {kind!r}")


#: name -> (tokenize_fn, apply_stop_filter, apply_len/alnum_filter,
#:          post-stop per-term map | None)
#: The term map is 1:1 per token (PorterStemFilter shape), so the index
#: build applies it to the factorized VOCABULARY, not per occurrence.
ANALYZERS: dict = {
    "standard": (_tokenize_lowered, True, False, None),  # filters inside
    "whitespace": (_ws_tokens, False, True, None),
    "simple": (_simple_tokens, False, True, None),
    "keyword": (_keyword_tokens, False, False, None),
    # EnglishAnalyzer: possessive+lower inside tok_fn (len/alnum filters
    # applied there too), stop from the flag, Porter stem as the map
    "english": (_english_raw, True, False, _porter_map),
    # EnglishAnalyzer with SnowballFilter(English) instead of the Porter1
    # tail — the SnowballPorterFilterFactory chain Solr schemas name
    # language="English". Porter2 stem pinned vs the compiled
    # org.tartarus.snowball machine (GT round 56, analysis/snowball_en.py)
    "english_snowball": (_english_raw, True, False, _porter2_map),
    # GermanAnalyzer core: standard tokenizer + lowercase + Snowball
    # German2 (GT round 65; the German stop list / normalization filter
    # are separate plug slots) — the multilingual half of the stemmer
    # plug point, pairing with lang_id in the pipeline
    "german_snowball": (_tokenize_lowered, False, False, _german2_map),
    # r4 (VERDICT #4): the Snowball language family through the same
    # stemmer plug slot — French/Spanish/Italian/Dutch/Russian analyzer
    # cores (StandardTokenizer + lowercase + SnowballFilter(lang); the
    # per-language stop lists are separate plug slots like German's).
    # Each stemmer is GT-pinned bit-for-bit vs the compiled
    # org.tartarus.snowball machine (GT round 85, analysis/snowball_*.py)
    "french_snowball": (_tokenize_lowered, False, False, _french_map),
    "spanish_snowball": (_tokenize_lowered, False, False, _spanish_map),
    "italian_snowball": (_tokenize_lowered, False, False, _italian_map),
    "dutch_snowball": (_tokenize_lowered, False, False, _dutch_map),
    "russian_snowball": (_tokenize_lowered, False, False, _russian_map),
    "portuguese_snowball": (_tokenize_lowered, False, False, _portuguese_map),
    "norwegian_snowball": (_tokenize_lowered, False, False, _norwegian_map),
    "danish_snowball": (_tokenize_lowered, False, False, _danish_map),
    "swedish_snowball": (_tokenize_lowered, False, False, _swedish_map),
    # the full FrenchAnalyzer chain (fr/FrenchAnalyzer.java): Standard +
    # Elision + LowerCase + french stop + FrenchLightStem — stops and
    # elision handled inside the stream fn (GT round 85c pin,
    # analysis/french_light.py); posInc gaps via POSINC_STREAMS
    "french_light": (_french_light_tokens, False, False, None),
    # the full GermanAnalyzer chain (de/GermanAnalyzer.java): Standard +
    # LowerCase + german stop + GermanNormalization + GermanLightStem
    # (GT round 85c pin, analysis/german_light.py)
    "german_light": (_german_light_tokens, False, False, None),
    # the full ItalianAnalyzer chain (GT round 85c pin,
    # analysis/italian_light.py)
    "italian_light": (_italian_light_tokens, False, False, None),
    # the full SpanishAnalyzer chain (GT round 85c pin,
    # analysis/spanish_light.py)
    "spanish_light": (_spanish_light_tokens, False, False, None),
    # RussianAnalyzer / DutchAnalyzer full chains (GT round 85c,
    # analysis/lang_analyzers.py — pinned snowball stemmers + real stop
    # gaps; Dutch adds the 4-entry StemmerOverride dict)
    "russian_full": (_russian_full_tokens, False, False, None),
    "dutch_full": (_dutch_full_tokens, False, False, None),
    # PortugueseAnalyzer full chain (GT round 85c,
    # analysis/portuguese_light.py)
    "portuguese_light": (_portuguese_light_tokens, False, False, None),
    # ArabicAnalyzer full chain (GT round 85c, analysis/arabic_light.py)
    "arabic_light": (_arabic_light_tokens, False, False, None),
    # CzechAnalyzer full chain (GT round 85c, analysis/czech_light.py)
    "czech_light": (_czech_light_tokens, False, False, None),
    # PersianAnalyzer full chain (GT round 85c,
    # analysis/persian_light.py — incl. the ZWNJ->space char filter)
    "persian_light": (_persian_light_tokens, False, False, None),
    # GreekAnalyzer full chain (GT round 85c, analysis/greek_light.py)
    "greek_light": (_greek_light_tokens, False, False, None),
    # HindiAnalyzer full chain (GT round 85c, analysis/hindi_light.py)
    "hindi_light": (_hindi_light_tokens, False, False, None),
    # BulgarianAnalyzer full chain (GT round 85c,
    # analysis/bulgarian_light.py)
    "bulgarian_light": (_bulgarian_light_tokens, False, False, None),
    # IndonesianAnalyzer full chain (GT round 85c,
    # analysis/indonesian_light.py)
    "indonesian_light": (_indonesian_light_tokens, False, False, None),
    # LatvianAnalyzer full chain (GT round 85c,
    # analysis/latvian_light.py)
    "latvian_light": (_latvian_light_tokens, False, False, None),
    # SoraniAnalyzer full chain (GT round 85c,
    # analysis/sorani_light.py)
    "sorani_light": (_sorani_light_tokens, False, False, None),
    "folding": (_folding_raw, True, False, None),
    # ClassicAnalyzer: the pre-3.1 grammar keeps emails/hosts/acronyms/
    # serial numbers as single searchable terms (GT round 58)
    "classic": (_classic_raw, True, False, None),
    "shingle": (_shingle_raw, False, False, None),
    # WhitespaceTokenizer + DelimitedPayloadTokenFilter(FloatEncoder):
    # the canonical payload field chain (the filter requires a tokenizer
    # that does not split on the delimiter). Term = before the first
    # '|'; payload handled by token_table(with_payloads=True); this
    # registry row's term map covers the payload-less query side.
    "wspayload": (_ws_tokens, False, True, _strip_payload),
    # source-identifier chain: WhitespaceTokenizer + WordDelimiterFilter
    # (DEFAULT_FLAGS — generate word+number parts, split on case/numeric
    # transitions, stem possessives; WordDelimiterFilter.java:75-82
    # recommends the whitespace tokenizer) + LowerCaseFilter as the
    # vocab-level term map. The filter stream is pinned bit-for-bit vs
    # the compiled reference (GT round 42, analysis/word_delimiter.py);
    # its posInc gaps reach the index via POSINC_ANALYZERS
    "code": (_code_tokens, False, False, _java_lower),
    # CJKAnalyzer chain: StandardTokenizer + CJKWidthFilter + LowerCase
    # + CJKBigramFilter (GT round 49, analysis/cjk.py). CJK runs index
    # as sliding bigrams (phrase-selectivity df at term-query cost);
    # non-CJK tokens pass through; posInc/stacking via POSINC_STREAMS
    "cjk": (_cjk_tokens, False, False, None),
    # KeywordRepeat + PorterStem + RemoveDuplicates dual index (GT
    # round 51): original + stem at the same position
    "english_dual": (_english_dual_tokens, False, False, None),
}


def analyze_as(analyzer: str, text: str) -> list[str]:
    """Query-side analysis through a named analyzer (must match the
    index's build analyzer — IndexWriterConfig carries the Analyzer in
    the reference; the index manifest carries the name here)."""
    tok_fn, stop, lenf, term_map = ANALYZERS[analyzer]
    qstream = QUERY_POSINC_STREAMS.get(analyzer)
    if qstream is not None:
        toks = [t for t, _pi in qstream(text)] if text else []
    else:
        toks = tok_fn(text) if text else []
    if lenf:
        toks = [t for t in toks if len(t) <= MAX_TOKEN_LENGTH]
    if stop:
        toks = [t for t in toks if t not in ENGLISH_STOP_WORDS]
    if term_map is not None:
        toks = [term_map(t) for t in toks]
    return toks


def analyze_with_positions(text: str) -> tuple[dict[str, list[int]], int]:
    """-> (term -> ascending position list, field_len).

    Positions are indices in the post-tokenizer stream (0-based); stop-filter
    removals leave gaps (FilteringTokenFilter.java:50-58 bumps the position
    increment), so phrase adjacency is position+1 over the ORIGINAL stream.
    field_len counts only surviving tokens (norms discount stopwords)."""
    pos: dict[str, list[int]] = {}
    flen = 0
    stop = ENGLISH_STOP_WORDS
    for i, t in enumerate(_tokenize_lowered(text)):
        if t in stop:
            continue
        lst = pos.get(t)
        if lst is None:
            pos[t] = [i]
        else:
            lst.append(i)
        flen += 1
    return pos, flen


def analyze_with_positions_as(analyzer: str, text: str) -> list[tuple[str, int]]:
    """Chain-aware positional analysis for PHRASE queries: (term, pos)
    pairs in stream order, with the same position semantics the index
    build (token_table) writes — len-filtered tokens don't occupy a
    position, stop-filtered tokens leave a gap, POSINC chains (the WDF
    'code' chain) use the filter's own increments, and the per-term map
    (stem / lowercase / payload strip) applies last."""
    if analyzer == "standard":
        pos_map, _ = analyze_with_positions(text)
        return sorted(
            ((t, p) for t, plist in pos_map.items() for p in plist),
            key=lambda x: (x[1], x[0]),
        )
    tok_fn, stop_f, len_f, term_map = ANALYZERS[analyzer]
    out: list[tuple[str, int]] = []
    stream_fn = QUERY_POSINC_STREAMS.get(analyzer) or POSINC_STREAMS.get(analyzer)
    if stream_fn is not None:
        p = -1
        for t, pinc in stream_fn(text) if text else []:
            p += pinc
            out.append((term_map(t) if term_map else t, p))
        return out
    p = -1
    for t in tok_fn(text) if text else []:
        if len_f and len(t) > MAX_TOKEN_LENGTH:
            continue  # not kept by the tokenizer: occupies no position
        p += 1
        if stop_f and t in ENGLISH_STOP_WORDS:
            continue  # stop gap: position advances, no term
        out.append((term_map(t) if term_map else t, p))
    return out


def analyze_to_counts(text: str) -> tuple[dict[str, int], int]:
    """-> (term -> tf map, field_len). One pass, used by build + oracle."""
    toks = analyze(text)
    return dict(Counter(toks)), len(toks)


def analyze_batch(texts) -> tuple[list[dict[str, int]], np.ndarray]:
    """Batch: list of tf-maps + int32 field_len array."""
    counts: list[dict[str, int]] = []
    lens = np.empty(len(texts), dtype=np.int32)
    for i, text in enumerate(texts):
        c, n = analyze_to_counts(text if isinstance(text, str) else "")
        counts.append(c)
        lens[i] = n
    return counts, lens


def token_table(
    texts, analyzer: str = "standard", with_payloads: bool = False
) -> tuple | None:
    """Fully vectorized batch analysis for the index build hot path.

    `analyzer` selects the chain (ANALYZERS registry — the reference's
    IndexWriterConfig(Analyzer) plug point): 'standard' (default) is the
    full tokenize/lowercase/stop chain; 'whitespace'/'simple'/'keyword'
    apply their Lucene semantics (no stop filter, analyzer-specific
    tokenization and case handling).

    Per-token Python (dict/list ops per posting) saturates memory bandwidth
    long before 32 cores; here the ONLY Python loops are the per-doc regex
    findall and three vocabulary-sized comprehensions. Everything per-token
    is factorize/cumsum/bincount (C speed, streaming access).

    Returns (uniq_terms object[], term_code int64[], doc_idx int64[],
    position int64[], field_len int32[]) where the parallel arrays hold one
    entry per SURVIVING token occurrence (maxTokenLength + alnum + stop
    filters applied; positions keep stop-gap semantics), in document scan
    order. None if the batch has no tokens.

    with_payloads=True (requires a PAYLOAD_ANALYZERS chain) appends a
    6th element: float32 payload per surviving occurrence, decoded by
    the DelimitedPayloadTokenFilter(FloatEncoder) split (NaN = token
    carried no delimiter = null payload). The split runs at VOCABULARY
    level (the same shape as the stem term map), so per-token cost stays
    factorize/gather."""
    import pandas as pd

    n_docs = len(texts)
    parts: list[list[str]] = []
    counts = np.empty(n_docs, dtype=np.int64)
    posinc_parts: list[list[int]] | None = (
        [] if analyzer in POSINC_ANALYZERS else None
    )
    if analyzer == "standard":
        raw_fn = None  # inline fast path below
    else:
        raw_fn = ANALYZERS[analyzer][0]
    stream_fn = POSINC_STREAMS.get(analyzer)
    batch_fn = POSINC_BATCH_STREAMS.get(analyzer)
    batch_toks = batch_pincs = None
    if posinc_parts is not None and batch_fn is not None:
        # vocabulary-level fast path: the filter runs once per distinct
        # token across the whole Arrow batch
        batch_toks, batch_pincs = batch_fn(
            [t if (t and isinstance(t, str)) else "" for t in texts]
        )
    for i, t in enumerate(texts):
        if not (t and isinstance(t, str)):
            toks = []
            if posinc_parts is not None:
                posinc_parts.append([])
        elif batch_toks is not None:
            toks = batch_toks[i]
            posinc_parts.append(batch_pincs[i])
        elif posinc_parts is not None:
            stream = stream_fn(t)
            toks = [x[0] for x in stream]
            posinc_parts.append([x[1] for x in stream])
        elif raw_fn is None:
            lt = _java_lower(t)
            if not lt.isascii() and _RARE_RE.search(lt):
                # Extend/Format chars present: the WB4-transparent
                # scanner path (GT round 30b) — the inline fast regex
                # would mis-tokenize (e.g. drop a riding soft hyphen).
                # Tokens come back pre-filtered, which matches keep1
                # semantics (they'd all be kept)
                toks = _findall_tokens(lt)
            else:
                toks = TOKEN_RE.findall(lt)
        else:
            toks = raw_fn(t)
        parts.append(toks)
        counts[i] = len(toks)
    total = int(counts.sum())
    if total == 0:
        return None

    def _flatten(parts_, counts_):
        flat_ = np.empty(int(counts_.sum()), dtype=object)
        o_ = 0
        for toks_ in parts_:
            flat_[o_ : o_ + len(toks_)] = toks_
            o_ += len(toks_)
        c_, u_ = pd.factorize(flat_, sort=False)
        return c_, np.asarray(u_, dtype=object)

    codes, uniq = _flatten(parts, counts)
    if analyzer == "standard" and any(len(u) > MAX_TOKEN_LENGTH for u in uniq):
        # rare path: a >maxTokenLength token SPLITS into 255-char-window
        # grammar matches (GT round 30 — the jflex buffer bound; never
        # dropped), which changes its doc's position stream — redo those
        # docs with the exact per-doc tokenizer
        long_terms = {u for u in uniq if len(u) > MAX_TOKEN_LENGTH}
        for i, toks in enumerate(parts):
            if any(t in long_terms for t in toks):
                parts[i] = _findall_tokens(_java_lower(texts[i]))
                counts[i] = len(parts[i])
        codes, uniq = _flatten(parts, counts)
    # vocabulary-sized attribute vectors (vocab << tokens)
    nv = len(uniq)
    term_map = None
    if analyzer == "standard":
        keep1 = np.fromiter(
            (len(u) <= MAX_TOKEN_LENGTH and bool(u.strip("_")) for u in uniq), bool, nv
        )
        stopm = np.fromiter((u in ENGLISH_STOP_WORDS for u in uniq), bool, nv)
    else:  # registry-flag-driven (tok_fn may pre-apply len/alnum itself)
        _, stop_f, len_f, term_map = ANALYZERS[analyzer]
        if len_f:
            keep1 = np.fromiter((len(u) <= MAX_TOKEN_LENGTH for u in uniq), bool, nv)
        else:
            keep1 = np.ones(nv, dtype=bool)
        if stop_f:
            stopm = np.fromiter((u in ENGLISH_STOP_WORDS for u in uniq), bool, nv)
        else:
            stopm = np.zeros(nv, dtype=bool)
    k1 = keep1[codes]  # token kept by the TOKENIZER (defines positions)
    doc_starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    ck = np.concatenate(([0], np.cumsum(k1)))  # exclusive prefix of kept
    doc_rep = np.repeat(np.arange(n_docs), counts)
    pos = ck[:-1] - ck[doc_starts][doc_rep]  # 0-based position among kept
    if posinc_parts is not None:
        # the chain's OWN position increments (WDF gaps and quirks):
        # position = -1 + running sum of posInc within the document
        flat_pi = np.fromiter(
            (p for lst in posinc_parts for p in lst), np.int64, total
        )
        cum = np.cumsum(flat_pi)
        ds = np.minimum(doc_starts, total - 1)  # empty docs never indexed
        base = cum[ds] - flat_pi[ds]
        pos = cum - 1 - base[doc_rep]
    post = k1 & ~stopm[codes]  # survives the STOP filter too -> a posting
    field_len = np.bincount(doc_rep[post], minlength=n_docs).astype(np.int32)
    pay_occ = None
    if with_payloads:
        if analyzer not in PAYLOAD_ANALYZERS:
            raise ValueError(
                f"analyzer {analyzer!r} has no payload filter in its chain"
            )
        # DelimitedPayloadTokenFilter + FloatEncoder, at vocab level:
        # identical (term|payload) strings share one code, so the split
        # and Float.parseFloat run once per distinct token
        vterm = np.empty(nv, dtype=object)
        vpay = np.full(nv, np.nan, dtype=np.float32)
        for vi, u in enumerate(uniq):
            head, sep, tail = u.partition(PAYLOAD_DELIMITER)
            vterm[vi] = head
            if sep:
                vpay[vi] = np.float32(float(tail))  # invalid float raises,
                # like FloatEncoder's Float.parseFloat
        pay_occ = vpay[codes]
        mcodes, muniq = pd.factorize(vterm, sort=False)
        uniq = np.asarray(muniq, dtype=object)
        codes = mcodes[codes]
        term_map = None  # the split above IS this chain's term map
    if term_map is not None:
        # 1:1 per-term map (PorterStemFilter shape): applied to the
        # VOCABULARY (nv entries), never per occurrence; stems that
        # collide re-factorize to one term code (positions unchanged)
        mapped = np.fromiter((term_map(u) for u in uniq), object, nv)
        mcodes, muniq = pd.factorize(mapped, sort=False)
        uniq = np.asarray(muniq, dtype=object)
        codes = mcodes[codes]
    if pay_occ is not None:
        return uniq, codes[post], doc_rep[post], pos[post], field_len, pay_occ[post]
    return uniq, codes[post], doc_rep[post], pos[post], field_len
