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
_CJK = "一-鿿㐀-䶿豈-﫿぀-ゟ"
_KATA = "゠-ヿㇰ-ㇿ"
_W = rf"[^\W{_CJK}{_KATA}]"        # \w minus Han/Hiragana/Katakana
_WL = rf"[^\W\d_{_CJK}{_KATA}]"    # letter side for joiner adjacency
TOKEN_RE = re.compile(
    rf"[{_KATA}]+"
    rf"|[{_CJK}]"
    rf"|{_W}+(?:(?<={_WL})[{_MIDL}{_MIDNL}](?={_WL}){_W}+"
    rf"|(?<=\d)[{_MIDNUM}{_MIDNL}](?=\d){_W}+)*",
    re.UNICODE,
)

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
    cases where Python's str.lower() diverges (dotted capital I expands)."""
    if "İ" in text:
        text = text.replace("İ", "i")
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
    out = []
    for t in TOKEN_RE.findall(text):
        # a pure '_' run is not an ALPHANUM/NUM segment (strip-check is a
        # fast equivalent of searching for a non-underscore \w char)
        if not t.strip("_"):
            continue
        if len(t) <= MAX_TOKEN_LENGTH:
            out.append(t)
        else:
            out.extend(p for p in _split_overlong(t) if p.strip("_"))
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


def _folding_raw(t: str) -> list[str]:
    """standard chain + ASCIIFoldingFilter (analysis/miscellaneous/
    ASCIIFoldingFilter.java) applied after lowercasing."""
    from lucene_solr_spark.analysis.filters import ascii_fold

    return [ascii_fold(x) for x in _tokenize_lowered(t)]


def _shingle_raw(t: str) -> list[str]:
    """standard chain + ShingleFilter(2,2) (analysis/shingle/
    ShingleFilter.java): stop-filtered positions become the '_' filler
    token, word bigrams are joined by '_', and all-filler shingles are
    not emitted. Positions index the shingle OUTPUT stream."""
    from lucene_solr_spark.analysis.filters import shingles

    stream = [
        tok if tok not in ENGLISH_STOP_WORDS else "_"
        for tok in _tokenize_lowered(t)
    ]
    return [s for s in shingles(stream, 2, 2, "_") if s.strip("_")]


def _porter_map(term: str) -> str:
    from lucene_solr_spark.analysis.porter import porter_stem

    return porter_stem(term)


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
    "folding": (_folding_raw, True, False, None),
    "shingle": (_shingle_raw, False, False, None),
    # WhitespaceTokenizer + DelimitedPayloadTokenFilter(FloatEncoder):
    # the canonical payload field chain (the filter requires a tokenizer
    # that does not split on the delimiter). Term = before the first
    # '|'; payload handled by token_table(with_payloads=True); this
    # registry row's term map covers the payload-less query side.
    "wspayload": (_ws_tokens, False, True, _strip_payload),
}


def analyze_as(analyzer: str, text: str) -> list[str]:
    """Query-side analysis through a named analyzer (must match the
    index's build analyzer — IndexWriterConfig carries the Analyzer in
    the reference; the index manifest carries the name here)."""
    tok_fn, stop, lenf, term_map = ANALYZERS[analyzer]
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
    if analyzer == "standard":
        raw_fn = None  # inline fast path below
    else:
        raw_fn = ANALYZERS[analyzer][0]
    for i, t in enumerate(texts):
        if not (t and isinstance(t, str)):
            toks = []
        elif raw_fn is None:
            toks = TOKEN_RE.findall(_java_lower(t))
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
