"""CommonGramsFilter / CommonGramsQueryFilter — index-time stopword
bigrams (the index-side complement of CommonTermsQuery).

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
commongrams/CommonGramsFilter.java and CommonGramsQueryFilter.java.

Semantics (pinned bit-for-bit vs the compiled filters, GT round 47):

* CommonGramsFilter (INDEX side): every input token is emitted
  unchanged; whenever the previous token was common, or the current
  token is common and a previous token exists, a bigram
  ``prev_current`` (separator '_', type "gram", posLength 2, posInc 0,
  offsets spanning prev.start..current.end) is emitted BEFORE the
  current token — i.e. stacked at the PREVIOUS token's position
  (CommonGramsFilter.java:100-124, gramToken :162-181).  The gram's
  posInc is 0 regardless of the current token's own increment (stop
  gaps upstream ride on the unigram, not the gram).

* CommonGramsQueryFilter (QUERY side): hold-one-back over the
  CommonGramsFilter output.  A held token is emitted when the next
  token is a non-gram (grams get posInc forced to 1); a held UNIGRAM
  is silently replaced (dropped) when the next token is a gram — the
  unigram is "a member of a bigram".  At exhaustion the held token is
  emitted unless the LAST EMITTED token was a gram
  (CommonGramsQueryFilter.java:83-114 — note `previousType` is read
  AFTER restoreState, so it records the type of the token being
  emitted, not the held one; the class javadoc's "spain" example
  contradicts the code, and the code wins — pinned by the harness).

At 100 TB the point of this chain: a phrase query containing
stopword-scale terms ("the fox") executes as a single TERM query on
the bigram's own (far shorter) posting list instead of intersecting a
billion-document stopword posting with positions.
"""

from __future__ import annotations

GRAM_TYPE = "gram"
SEPARATOR = "_"

#: (term, posInc, posLen, startOffset, endOffset, type)
Token = tuple[str, int, int, int, int, str]


def common_grams_stream(tokens, common_words) -> list[Token]:
    """CommonGramsFilter over ``tokens`` — an iterable of
    (term, posInc, posLen, start, end, type) tuples (posLen/type of the
    inputs ride through unchanged on unigrams)."""
    out: list[Token] = []
    prev_term: str | None = None
    last_start = 0
    last_was_common = False
    for term, pinc, plen, s, e, typ in tokens:
        is_common = term in common_words
        if last_was_common or (is_common and prev_term is not None):
            out.append(
                (prev_term + SEPARATOR + term, 0, 2, last_start, e, GRAM_TYPE)
            )
        out.append((term, pinc, plen, s, e, typ))
        prev_term = term
        last_start = s
        last_was_common = is_common
    return out


def common_grams_query_stream(tokens, common_words) -> list[Token]:
    """CommonGramsQueryFilter(CommonGramsFilter(tokens)) — the query-side
    chain: bigrams whenever possible, unigrams only when not a member of
    a bigram."""
    out: list[Token] = []
    held: Token | None = None
    last_emitted_type: str | None = None
    for tok in common_grams_stream(tokens, common_words):
        if held is not None and tok[5] != GRAM_TYPE:
            if held[5] == GRAM_TYPE:
                held = (held[0], 1, held[2], held[3], held[4], held[5])
            out.append(held)
            last_emitted_type = held[5]
        held = tok
    if held is not None and last_emitted_type != GRAM_TYPE:
        if held[5] == GRAM_TYPE:  # pragma: no cover - CGF never ends on a gram
            held = (held[0], 1, held[2], held[3], held[4], held[5])
        out.append(held)
    return out


def _ws_tokens_with_attrs(text: str) -> list[Token]:
    """WhitespaceTokenizer output as attribute tuples (posInc always 1,
    posLen 1, type 'word' — the Lucene defaults)."""
    out: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        while i < n and text[i].isspace():
            i += 1
        if i >= n:
            break
        j = i
        while j < n and not text[j].isspace():
            j += 1
        out.append((text[i:j], 1, 1, i, j, "word"))
        i = j
    return out


def register_commongrams_analyzer(
    name: str, common_words, lowercase: bool = True
) -> None:
    """Register a 'WhitespaceTokenizer -> LowerCaseFilter ->
    CommonGramsFilter(words)' INDEX chain under `name`, with the
    matching CommonGramsQueryFilter QUERY chain (Solr ships the two as
    separate index/query analyzer stacks; the engine keys both off one
    name and picks the query stream at query-analysis time — the
    QUERY_POSINC_STREAMS registry).  LowerCase runs BEFORE the gram
    decision so common-word matching is case-insensitive against a
    lowercase set, the usual Solr stack order.  Like the synonym
    chains, the common-words set is an ANALYZER-side artifact: register
    the same chain in build and search sessions; the manifest records
    only the name."""
    from .tokenizer import (
        ANALYZERS,
        DYNAMIC_CHAINS,
        POSINC_STREAMS,
        QUERY_POSINC_STREAMS,
        _java_lower,
    )

    words = frozenset(common_words)

    def _toks(text: str) -> list[Token]:
        toks = _ws_tokens_with_attrs(text)
        if lowercase:
            toks = [(_java_lower(t), pi, pl, s, e, ty) for t, pi, pl, s, e, ty in toks]
        return toks

    def stream(text: str) -> list[tuple[str, int]]:
        return [
            (t, pi)
            for t, pi, _pl, _s, _e, _ty in common_grams_stream(_toks(text), words)
        ]

    def query_stream(text: str) -> list[tuple[str, int]]:
        return [
            (t, pi)
            for t, pi, _pl, _s, _e, _ty in common_grams_query_stream(
                _toks(text), words
            )
        ]

    def flat(text: str) -> list[str]:
        return [t for t, _pi in stream(text)]

    ANALYZERS[name] = (flat, False, False, None)
    POSINC_STREAMS[name] = stream
    QUERY_POSINC_STREAMS[name] = query_stream
    DYNAMIC_CHAINS[name] = ("commongrams", words, lowercase)
