"""Pattern package — regex tokenizer and capture-group filter.

References:
  lucene/analysis/common/src/java/org/apache/lucene/analysis/pattern/
    PatternTokenizer.java, PatternCaptureGroupTokenFilter.java

Pinned bit-for-bit vs the compiled classes (GT round 53).  Patterns are
restricted to the Java-regex ∩ Python-regex subset (same restriction as
pii_scrub / PatternReplaceCharFilter).

* PatternTokenizer(group): group >= 0 emits each match's group text
  (zero-length matches skipped); group = -1 is String.split — the
  non-empty segments between matches plus the trailing remainder.

* PatternCaptureGroupTokenFilter: per input token, each pattern is
  matched repeatedly and every capture group becomes a token.  The
  emission order interleaves matchers by the MINIMAL start offset of
  each matcher's CURRENT group frontier (groups iterate in index order
  within a match; an exhausted match advances to the matcher's next
  find).  Zero-length captures are skipped; under preserveOriginal a
  capture spanning the whole token is skipped too.  preserveOriginal
  emits the original token first (its own posInc) with every capture
  stacked at posInc 0; otherwise the FIRST capture replaces the token
  in place (keeping its posInc) and later captures stack at 0 — a
  token with no capture at all passes through unchanged.
"""

from __future__ import annotations

import re


def pattern_tokenize(
    text: str, pattern: str, group: int = -1
) -> list[tuple[str, int, int]]:
    """PatternTokenizer -> [(term, startOffset, endOffset)]."""
    rx = re.compile(pattern)
    out: list[tuple[str, int, int]] = []
    if group >= 0:
        if group > rx.groups:
            raise ValueError(
                f"invalid group specified: pattern only has: {rx.groups} "
                "capturing groups"
            )
        for m in rx.finditer(text):
            s, e = m.span(group)
            if s == e:
                continue
            out.append((text[s:e], s, e))
        return out
    index = 0
    for m in rx.finditer(text):
        if m.start() - index > 0:
            out.append((text[index:m.start()], index, m.start()))
        index = m.end()
    if len(text) - index > 0:
        out.append((text[index:], index, len(text)))
    return out


class _MatcherState:
    __slots__ = ("it", "match", "group", "gcount")

    def __init__(self, rx: re.Pattern, token: str) -> None:
        self.it = rx.finditer(token)
        self.match = None
        self.group = -1
        self.gcount = rx.groups


def _next_capture(states: list[_MatcherState], token: str, preserve: bool):
    """nextCapture (PatternCaptureGroupTokenFilter.java:109-140): the
    (matcher, group) frontier with the minimal start offset."""
    min_off = None
    cur = -1
    i = 0
    while i < len(states):
        st = states[i]
        if st.group == -1:
            st.match = next(st.it, None)
            st.group = 1 if st.match is not None else 0
        if st.group != 0:
            while st.group < st.gcount + 1:
                s, e = st.match.span(st.group)
                if s == e or (preserve and s == 0 and e == len(token)):
                    st.group += 1
                    continue
                if min_off is None or s < min_off:
                    min_off = s
                    cur = i
                break
            if st.group == st.gcount + 1:
                st.group = -1
                continue  # retry this matcher on its next find
        i += 1
    return cur


def pattern_capture_stream(
    tokens, patterns: list[str], preserve_original: bool = False
) -> list[tuple[str, int, int, int]]:
    """PatternCaptureGroupTokenFilter over (term, posInc, start, end)
    tuples -> same shape (captures keep the ORIGINAL token's offsets;
    restoreState preserves them)."""
    rxs = [re.compile(p) for p in patterns]
    out: list[tuple[str, int, int, int]] = []
    for term, pinc, s, e in tokens:
        states = [_MatcherState(rx, term) for rx in rxs]
        if preserve_original:
            out.append((term, pinc, s, e))
        else:
            cur = _next_capture(states, term, False)
            if cur == -1:
                out.append((term, pinc, s, e))  # no capture: pass through
                continue
            st = states[cur]
            cs, ce = st.match.span(st.group)
            out.append((term[cs:ce], pinc, s, e))
            st.group += 1
        while True:
            cur = _next_capture(states, term, preserve_original)
            if cur == -1:
                break
            st = states[cur]
            cs, ce = st.match.span(st.group)
            out.append((term[cs:ce], 0, s, e))
            st.group += 1
    return out


def register_pattern_analyzer(
    name: str, pattern: str, group: int = -1, lowercase: bool = True
) -> None:
    """Register 'PatternTokenizer(pattern, group) -> [LowerCaseFilter]'
    under `name` (Solr's PatternTokenizerFactory field type)."""
    from .tokenizer import ANALYZERS, DYNAMIC_CHAINS, _java_lower

    def tok(text: str) -> list[str]:
        toks = [t for t, _s, _e in pattern_tokenize(text, pattern, group)]
        return [_java_lower(t) for t in toks] if lowercase else toks

    ANALYZERS[name] = (tok, False, False, None)
    DYNAMIC_CHAINS[name] = ("pattern", pattern, group, lowercase)
