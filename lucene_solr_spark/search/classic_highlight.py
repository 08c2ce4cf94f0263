"""The CLASSIC Lucene highlighter chain — Highlighter + QueryScorer +
SimpleFragmenter + SimpleHTMLFormatter (lucene/highlighter
search/highlight/*.java) — as pure engine code, pinned bit-for-bit
against the compiled reference in tests/test_lucene_ground_truth.py
(ground-truth round 31).

The reference flow (Highlighter.java:177-357 getBestTextFragments):
the document's token stream is walked once; each distinct token group
is scored by QueryScorer.getTokenScore (a weighted-span-term lookup:
WeightedSpanTermExtractor.java extracts terms from the query tree,
position-sensitive terms carrying the match spans of the query run
against a MemoryIndex of THIS document), marked up by the formatter,
and SimpleFragmenter cuts fragments every `fragmentSize` chars; the
per-fragment score is the float32 sum of each UNIQUE matched term's
weight (first-encounter order). Fragments go through a bounded
PriorityQueue (score DESC, fragment number ASC —
Highlighter.java:514-529 FragmentQueue), contiguous survivors merge
keeping max(score) (mergeContiguousFragments), and zero-score
fragments are dropped.

Extraction semantics reproduced from WeightedSpanTermExtractor.java:
  - prohibited (MUST_NOT) clauses are skipped; boosts multiply down
    the tree (extract :106-114), BoostQuery steps in float32;
  - TermQuery -> position-INsensitive weighted term (:136, :338-350);
  - PhraseQuery -> SpanNearQuery(slop + positionGaps, inorder =
    slop==0) over the doc's own postings (:115-135); every clause term
    becomes position-SENSITIVE with the spans of the WHOLE span match
    set; a doc with no span match contributes nothing (:305-308);
  - wildcard/prefix/range (MultiTermQuery) expand against the DOC's
    own vocabulary via SCORING_BOOLEAN_REWRITE (:213-217), each
    expanded term insensitive at the clause boost; fuzzy terms carry
    FuzzyTermsEnum's similarity boost (1 - ed/min(len), OSA edits);
  - the PositionCheckingMap (:615-635): a later put REPLACES the
    entry (weight included); if the replaced entry was
    position-insensitive the new one becomes insensitive too; a
    phrase whose term already exists only APPENDS spans (:313-324).
"""

from __future__ import annotations

import re

import numpy as np

from ..analysis.tokenizer import (
    ENGLISH_STOP_WORDS,
    _java_lower,
    analyze,
)
from .fuzzy import fuzzy_accept, fuzzy_boost
from .payloads import span_match_positions
from .queryparser import _collect_clauses, _lex, _resolve_occurs

MAX_DOC_CHARS_TO_ANALYZE = 50 * 1024  # Highlighter.java:35
PRE_TAG, POST_TAG = "<B>", "</B>"  # SimpleHTMLFormatter defaults


def analyze_stream(text: str) -> list[tuple[int, int, int, str]]:
    """StandardAnalyzer chain WITH offsets: [(position, start, end,
    term)] — the original-text offsets the Java chain reports
    (tokenize original, then LowerCaseFilter per token, then StopFilter
    leaving position gaps). Tokenization (incl. the over-long window
    split and WB4 extend/format transparency) is the shared
    iter_token_spans."""
    from ..analysis.tokenizer import iter_token_spans

    out = []
    pos = -1
    for piece, s, e in iter_token_spans(text):
        pos += 1
        lt = _java_lower(piece)
        if lt in ENGLISH_STOP_WORDS:
            continue
        out.append((pos, s, e, lt))
    return out


def _wildcard_re(pattern: str) -> re.Pattern:
    parts = []
    for ch in pattern:
        if ch == "*":
            parts.append(".*")
        elif ch == "?":
            parts.append(".")
        else:
            parts.append(re.escape(ch))
    return re.compile("".join(parts) + r"\Z", re.DOTALL)


class _WST:
    __slots__ = ("w", "sensitive", "spans")

    def __init__(self, w: np.float32, sensitive: bool, spans=None):
        self.w = np.float32(w)
        self.sensitive = sensitive
        self.spans = list(spans or [])

    def check_position(self, position: int) -> bool:
        return any(s <= position <= e for s, e in self.spans)


def extract_weighted_span_terms(
    query: str, positions: dict[str, list[int]],
    dfs: dict[str, int] | None = None, max_doc: int | None = None,
) -> dict[str, _WST]:
    """WeightedSpanTermExtractor.getWeightedSpanTerms (reader == null:
    weights are query boosts) against one document's analyzed term
    positions. `positions`: term -> sorted positions in the doc.
    With dfs/max_doc (QueryScorer's reader mode,
    getWeightedSpanTermsWithScores :528-557): every extracted term's
    weight is multiplied — in float32 — by the CLASSIC idf
    (float)(ln(maxDoc / (docFreq+1)) + 1) from the CORPUS index."""
    terms: dict[str, _WST] = {}
    vocab = sorted(positions)

    def _put(t: str, w: np.float32) -> None:
        # extractWeightedTerms -> PositionCheckingMap.put: replace; a
        # previously-insensitive entry forces the new one insensitive
        # (the new one is already insensitive here)
        terms[t] = _WST(w, False)

    def _walk(resolved, boost: np.float32) -> None:
        for occ, node in resolved:
            if occ == "-":
                continue
            tag, val = node
            if tag == "group":
                _walk(_resolve_occurs(val), boost)
                continue
            kind = val["kind"]
            vb = val.get("boost")
            b = np.float32(boost * np.float32(vb if vb is not None else 1.0))
            if kind == "phrase":
                _extract_phrase(val["text"], val["slop"], b)
            elif kind == "range":
                lo_a = analyze(val["lo"]) if val["lo"] != "*" else []
                hi_a = analyze(val["hi"]) if val["hi"] != "*" else []
                lo = None if val["lo"] == "*" else (lo_a[0] if lo_a else val["lo"])
                hi = None if val["hi"] == "*" else (hi_a[0] if hi_a else val["hi"])
                for t in vocab:
                    if lo is not None and (t < lo or (t == lo and not val["inc_lo"])):
                        continue
                    if hi is not None and (t > hi or (t == hi and not val["inc_hi"])):
                        continue
                    _put(t, b)
            else:
                word = val["text"]
                if "*" in word or "?" in word:
                    rx = _wildcard_re(_java_lower(word))
                    for t in vocab:
                        if rx.match(t):
                            _put(t, b)
                    continue
                fz = re.fullmatch(r"(.+?)~(\d?)", word)
                if fz:
                    base = _java_lower(fz.group(1))
                    max_ed = int(fz.group(2) or 2)
                    for t in vocab:
                        ok, ed = fuzzy_accept(base, t, max_ed)
                        if ok:
                            _put(t, np.float32(b * fuzzy_boost(base, t, ed)))
                    continue
                ts = analyze(word)
                if ts:
                    _put(ts[0], b)

    def _extract_phrase(text: str, slop: int, b: np.float32) -> None:
        pos_map, _fl = _analyze_phrase(text)
        pairs = sorted(
            ((t, p) for t, pl in pos_map.items() for p in pl), key=lambda x: x[1]
        )
        if not pairs:
            return
        if len(pairs) == 1:
            # a 1-term "phrase" parses to a plain TermQuery
            _put(pairs[0][0], b)
            return
        # sum position increments beyond 1 (extract :124-129)
        ppos = [p for _t, p in pairs]
        gaps = max(0, ppos[-1] - ppos[0] - len(ppos) + 1)
        inorder = slop == 0
        plists = [positions.get(t, []) for t, _p in pairs]
        if any(not pl for pl in plists):
            return
        spans = []
        for _w, idxs in span_match_positions(plists, slop + gaps, inorder):
            if inorder:
                start = plists[0][idxs[0]]
                end_incl = plists[-1][idxs[-1]]
            else:
                matched = [pl[i] for pl, i in zip(plists, idxs)]
                start = min(matched)
                end_incl = max(matched)
            spans.append((start, end_incl))
        if not spans:
            return
        for t in {t for t, _p in pairs}:
            existing = terms.get(t)
            if existing is None:
                terms[t] = _WST(b, True, spans)
            else:
                existing.spans.extend(spans)

    _walk(_resolve_occurs(_collect_clauses(iter(_lex(query)))), np.float32(1.0))
    if dfs is not None and max_doc is not None:
        import math

        for t, w in terms.items():
            idf = np.float32(
                math.log(max_doc / float(dfs.get(t, 0) + 1)) + 1.0
            )
            w.w = np.float32(w.w * idf)
    return terms


def _analyze_phrase(text: str):
    from ..analysis.tokenizer import analyze_with_positions

    return analyze_with_positions(text)


class _Frag:
    __slots__ = ("start", "num", "score", "end")

    def __init__(self, start: int, num: int):
        self.start = start
        self.num = num
        self.score = np.float32(0.0)
        self.end = 0


class _SpanFragmenter:
    """SimpleSpanFragmenter (highlight/SimpleSpanFragmenter.java): same
    size thresholds as SimpleFragmenter plus (a) never cut inside a
    position span of the query (waitForPos holds fragmentation until
    span end + 1), and (b) never leave a trailing fragment shorter than
    fragmentSize/2. Faithfully QUIRKY: its position counter advances
    only on isNewFragment() calls — i.e. on group FLUSHES, so it lags
    the scorer's token position by the first token's increment (this is
    the reference's own behavior, pinned in GT round 36)."""

    def __init__(self, wst, fragment_size: int, text_size: int):
        self.wst = wst
        self.size = fragment_size
        self.text_size = text_size
        self.position = -1
        self.wait_for = -1
        self.count = 1

    def is_new_fragment(self, term: str, pos_inc: int, end_offset: int) -> bool:
        self.position += pos_inc
        if self.wait_for <= self.position:
            self.wait_for = -1
        elif self.wait_for != -1:
            return False
        w = self.wst.get(term)
        if w is not None:
            for s, e in w.spans:
                if s == self.position:
                    self.wait_for = e + 1
                    break
        is_new = (
            end_offset >= self.size * self.count
            and (self.text_size - end_offset) >= (self.size >> 1)
        )
        if is_new:
            self.count += 1
        return is_new


def best_text_fragments(
    query: str,
    text: str,
    fragment_size: int = 100,
    max_num_fragments: int = 1,
    fragmenter: str = "simple",
    dfs: dict[str, int] | None = None,
    max_doc: int | None = None,
) -> list[tuple[str, np.float32]]:
    """Highlighter.getBestTextFragments(tokenStream, text, true, n) with
    QueryScorer(query) + SimpleFragmenter(fragment_size) (or
    SimpleSpanFragmenter when fragmenter='span') + SimpleHTMLFormatter —
    returns [(fragment_string, float32 score)] in the reference's order
    (score DESC, fragment number ASC, contiguous survivors merged,
    zero-score dropped)."""
    stream = analyze_stream(text)
    positions: dict[str, list[int]] = {}
    for p, _s, _e, t in stream:
        positions.setdefault(t, []).append(p)
    wst = extract_weighted_span_terms(query, positions, dfs, max_doc)

    pieces: list[str] = []
    ntlen = 0

    def _append(s: str) -> None:
        nonlocal ntlen
        pieces.append(s)
        ntlen += len(s)

    frags: list[_Frag] = []
    cur = _Frag(0, 0)
    frags.append(cur)
    found: set[str] = set()
    total = np.float32(0.0)
    frag_count = 1  # SimpleFragmenter.currentNumFrags
    span_frag = (
        _SpanFragmenter(wst, fragment_size, len(text))
        if fragmenter == "span" else None
    )
    prev_pos = -1
    last_end = 0
    # TokenGroup state (single group at a time)
    g_n = 0
    g_start = g_end = g_mstart = g_mend = 0
    g_tot = np.float32(0.0)

    def _token_score(term: str, position: int) -> np.float32:
        nonlocal total
        w = wst.get(term)
        if w is None:
            return np.float32(0.0)
        if w.sensitive and not w.check_position(position):
            return np.float32(0.0)
        score = w.w
        if term not in found:
            total = np.float32(total + score)
            found.add(term)
        return score

    def _flush_group() -> None:
        nonlocal last_end, g_n, g_tot
        tok_text = text[g_mstart:g_mend]
        marked = (
            f"{PRE_TAG}{tok_text}{POST_TAG}" if g_tot > 0 else tok_text
        )
        if g_mstart > last_end:
            _append(text[last_end:g_mstart])
        _append(marked)
        last_end = max(g_mend, last_end)
        g_n = 0
        g_tot = np.float32(0.0)

    for position, s, e, term in stream:
        if s >= MAX_DOC_CHARS_TO_ANALYZE:
            break
        if g_n > 0 and s >= g_end:  # TokenGroup.isDistinct
            _flush_group()
            # Fragmenter.isNewFragment (current token's attributes)
            if span_frag is not None:
                new_frag = span_frag.is_new_fragment(
                    term, position - prev_pos, e
                )
            else:
                new_frag = e >= fragment_size * frag_count
                if new_frag:
                    frag_count += 1
            if new_frag:
                cur.score = total
                cur.end = ntlen
                cur = _Frag(ntlen, len(frags))
                found = set()
                total = np.float32(0.0)
                frags.append(cur)
        prev_pos = position
        sc = _token_score(term, position)
        # TokenGroup.addToken
        if g_n == 0:
            g_start = g_mstart = s
            g_end = g_mend = e
            g_tot = np.float32(g_tot + sc)
        else:
            g_start = min(g_start, s)
            g_end = max(g_end, e)
            if sc > 0:
                if g_tot == 0:
                    g_mstart, g_mend = s, e
                else:
                    g_mstart = min(g_mstart, s)
                    g_mend = max(g_mend, e)
                g_tot = np.float32(g_tot + sc)
        g_n += 1

    cur.score = total
    if g_n > 0:
        _flush_group()
    if last_end < len(text) and len(text) <= MAX_DOC_CHARS_TO_ANALYZE:
        _append(text[last_end:])
    cur.end = ntlen

    new_text = "".join(pieces)

    # FragmentQueue: bounded PQ, lessThan = score ASC then fragNum DESC;
    # kept set == top-k under (score DESC, fragNum ASC), popped into a
    # descending array (fragNum is unique, so the order is total)
    kept = sorted(frags, key=lambda f: (-float(f.score), f.num))[
        : max(1, max_num_fragments)
    ]
    arr: list[_Frag | None] = list(kept)

    # mergeContiguousFragments (Highlighter.java:366-435)
    if len(arr) > 1:
        merging = True
        while merging:
            merging = False
            for i in range(len(arr)):
                if arr[i] is None:
                    continue
                for x in range(len(arr)):
                    if arr[x] is None:
                        continue
                    if arr[i] is None:
                        break
                    if i == x:
                        continue
                    frag1 = frag2 = None
                    if arr[i].start == arr[x].end:  # frag[i] follows frag[x]
                        frag1, f1n = arr[x], x
                        frag2, f2n = arr[i], i
                    elif arr[x].start == arr[i].end:
                        frag1, f1n = arr[i], i
                        frag2, f2n = arr[x], x
                    if frag1 is not None:
                        if frag1.score > frag2.score:
                            best, worst = f1n, f2n
                        else:
                            best, worst = f2n, f1n
                        frag1.end = frag2.end
                        frag1.score = max(frag1.score, frag2.score)
                        arr[worst] = None
                        merging = True
                        arr[best] = frag1

    out = []
    for f in arr:
        if f is not None and f.score > 0:
            out.append((new_text[f.start : f.end], np.float32(f.score)))
    return out
