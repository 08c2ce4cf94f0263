"""FreeTextSuggester — the reference's "type-ahead from an n-gram
language model" lookup (lucene/suggest/src/java/org/apache/lucene/
search/suggest/analyzing/FreeTextSuggester.java), grams=2, stupid
backoff smoothing (Brants et al. 2007; ALPHA=0.4, :129-134).

The reference packs all gram counts into one FST; this model keeps the
equivalent count tables (the Spark gate materializes them as two
map-side-combined aggregations) and reproduces lookup() exactly:

* last-token analysis: the query analyzer's final unigram and bigram
  shingles; a trailing space "upgrades" the tokens — predictions come
  from bigrams of the LAST token only (:527-546).
* model order: highest gram first, each model contributing at most
  `num` results; a last-token already suggested by a higher-order model
  is skipped WITHOUT consuming budget (TopNSearcher.acceptResult with
  queue depth num+seen, :640-663).
* per-model order: count DESC (the FST weight = Long.MAX_VALUE - count
  searched ascending), ties by gram byte order (TieBreakByInputComparator).
* score = (long) (Long.MAX_VALUE * backoff * (double) count /
  contextCount) (:709) — float64 left-to-right, truncated toward zero,
  saturating at Long.MAX_VALUE; contextCount = the context gram's count
  for the bigram model, totTokens (sum of unigram counts) for the
  unigram model; backoff multiplies by ALPHA per consulted level.
* final order: value DESC, key UTF16 ASC (:715-727), truncated to num.

Pinned bit-for-bit against the compiled FreeTextSuggester in
tests/test_lucene_ground_truth.py (ground-truth round 26).
"""

from __future__ import annotations

from collections import Counter

ALPHA = 0.4
SEP = "\x1e"  # DEFAULT_SEPARATOR 0x1e
LONG_MAX = 2**63 - 1
_LONG_MAX_D = float(LONG_MAX)  # == 2.0**63 as an IEEE double, like Java


def build_freetext_model(token_lists):
    """Count tables for grams=2: (unigram Counter, bigram Counter,
    totTokens). Each document's tokens shingle independently — grams
    never span documents, exactly like the reference's one-doc-per-
    input-iterator-entry index."""
    uni: Counter = Counter()
    bi: Counter = Counter()
    for toks in token_lists:
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    tot = sum(uni.values())
    return uni, bi, tot


def _score(count: int, context_count: int, backoff: float) -> int:
    v = _LONG_MAX_D * backoff * float(count) / float(context_count)
    if v >= _LONG_MAX_D:
        return LONG_MAX  # Java's (long) cast saturates
    return int(v)  # truncation toward zero, same as Java


def freetext_lookup(model, key: str, num: int):
    """lookup(key, num) over a grams=2 model built by
    build_freetext_model. Whitespace analysis (the gate corpus's token
    rule). Returns [(key string incl. separator bytes, long score)]."""
    uni, bi, tot = model
    toks = key.split()
    if not toks:
        raise ValueError("no tokens produced by analyzer")
    # lastTokens[0] = last unigram, lastTokens[1] = last bigram shingle
    last0: str | None = toks[-1]
    last1: str | None = SEP.join(toks[-2:]) if len(toks) >= 2 else None
    # trailing whitespace = lastTokenEnded (endOffset() > maxEndOffset):
    # "upgrade" — predict bigram completions of the last token only
    if key != key.rstrip():
        last1 = last0 + SEP
        last0 = ""

    results: list[tuple[str, int]] = []
    seen: set[str] = set()
    backoff = 1.0
    for gram, token in ((1, last1), (0, last0)):
        if token is None or (token == "" and len(key) > 0):
            continue  # not enough input — no backoff multiply (:565-570)
        if gram == 1:
            ctx, _, frag = token.rpartition(SEP)
            cands = [
                (w, c) for (c0, w), c in bi.items()
                if c0 == ctx and w.startswith(frag)
            ]
            context_count = uni.get(ctx, 0)
            prefix = ctx + SEP
        else:
            cands = [(w, c) for w, c in uni.items() if w.startswith(token)]
            context_count = tot
            prefix = ""
        if not cands:
            # prefixOutput == null: this model never saw the prefix
            backoff *= ALPHA
            continue
        taken = 0
        for w, c in sorted(cands, key=lambda x: (-x[1], x[0].encode("utf-8"))):
            if taken == num:
                break
            if w in seen:
                continue  # rejected without consuming queue budget
            seen.add(w)
            taken += 1
            results.append((prefix + w, _score(c, context_count, backoff)))
        backoff *= ALPHA
    results.sort(key=lambda r: (-r[1], r[0]))
    return results[:num]
