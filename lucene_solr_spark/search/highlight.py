"""PostingsHighlighter passage selection, scoring, and formatting
(lucene/highlighter/src/java/org/apache/lucene/search/postingshighlight/
PostingsHighlighter.java highlightDoc :549-655, PassageScorer.java,
DefaultPassageFormatter.java) — pinned against the compiled reference in
tests/test_lucene_ground_truth.py (ground-truth round 16).

The document is segmented into sentences (BreakIterator.getSentence
Instance); hits stream in start-offset order; each (passage, term) batch
adds weight(contentLen, docTf) * tf(passageFreq, passageLen) to the
passage's float32 score, the closed passage is multiplied by
norm(startOffset) and competes in a bounded PriorityQueue (score ASC,
ties evict the EARLIEST startOffset — the reference comparator's
left.start - right.start under a min-heap); survivors sort back into
document order and format with <b>/</b> and "... " ellipses.
"""

from __future__ import annotations

import heapq
import math
import re

import numpy as np

K1 = np.float32(1.2)
B = np.float32(0.75)
PIVOT = np.float32(87.0)

_TOKEN_RE = re.compile(r"[0-9A-Za-z]+")


def token_spans(content: str) -> list[tuple[int, int, str]]:
    """(start, end, token) spans of the StandardTokenizer subset this
    corpus produces (alnum runs; periods/spaces are separators)."""
    return [(m.start(), m.end(), m.group(0).lower())
            for m in _TOKEN_RE.finditer(content)]


def sentence_bounds(content: str) -> list[int]:
    """BreakIterator.getSentenceInstance boundaries for simple
    'Xxx xxx. Yyy.' prose: a boundary at 0, after every '. ' (the
    following sentence starts past the space), and at len(content)."""
    bounds = [0]
    i = content.find(". ")
    while i != -1:
        bounds.append(i + 2)
        i = content.find(". ", i + 2)
    if bounds[-1] != len(content):
        bounds.append(len(content))
    return bounds


def _weight(content_length: int, total_term_freq: int) -> np.float32:
    """PassageScorer.weight:71-76 — approximate numDocs from content
    length, then (k1+1) * (float)log(1 + (numDocs+0.5)/(ttf+0.5))."""
    num_docs = np.float32(1) + np.float32(content_length) / PIVOT
    inner = 1.0 + (float(num_docs) + 0.5) / (float(total_term_freq) + 0.5)
    return np.float32((K1 + np.float32(1)) * np.float32(math.log(inner)))


def _tf(freq: int, passage_len: int) -> np.float32:
    """PassageScorer.tf:86-89."""
    norm = K1 * (
        (np.float32(1) - B) + B * (np.float32(passage_len) / PIVOT)
    )
    return np.float32(np.float32(freq) / (np.float32(freq) + norm))


def _norm(passage_start: int) -> np.float32:
    """PassageScorer.norm:101-103 — 1 + 1/(float)log(pivot + start)."""
    return np.float32(
        np.float32(1)
        + np.float32(1) / np.float32(math.log(float(PIVOT) + passage_start))
    )


class _Passage:
    __slots__ = ("start", "end", "score", "matches")

    def __init__(self):
        self.start = -1
        self.end = -1
        self.score = np.float32(0.0)
        self.matches: list[tuple[int, int]] = []

    def reset(self):
        self.start = -1
        self.end = -1
        self.score = np.float32(0.0)
        self.matches = []


def highlight_doc(
    content: str,
    query_terms: list[str],
    max_passages: int = 1,
) -> tuple[str, np.float32]:
    """Run the full highlightDoc + DefaultPassageFormatter chain over one
    document. Returns (formatted snippet, best passage score) — for a
    no-hit document the reference falls back to the first max_passages
    sentences (getEmptyHighlight, score NaN -> returned here as 0.0)."""
    spans = token_spans(content)
    bounds = sentence_bounds(content)
    qset = set(query_terms)
    # per-term occurrence streams in offset order + per-doc tf
    occ: dict[str, list[tuple[int, int]]] = {}
    for s, e, t in spans:
        if t in qset:
            occ.setdefault(t, []).append((s, e))
    if not occ:
        # getEmptyHighlight: first max_passages sentences, no matches
        passages = []
        for i in range(min(max_passages, len(bounds) - 1)):
            p = _Passage()
            p.start, p.end = bounds[i], bounds[i + 1]
            passages.append(p)
        return _format(passages, content), np.float32(0.0)

    weights = {t: _weight(len(content), len(v)) for t, v in occ.items()}
    # stream of (start, end, term, next_index) — a PQ keyed on start
    # (terms can't share a start offset: one token per position)
    stream: list[tuple[int, int, str, int]] = []
    for t, v in occ.items():
        s, e = v[0]
        heapq.heappush(stream, (s, e, t, 1))
    # sentinel (EMPTY enum at MAX_VALUE) closes the last passage
    sentinel = (len(content) + 10**9, 0, "", 0)
    heapq.heappush(stream, sentinel)

    n = max_passages
    pqueue: list[tuple[np.float32, int, int, _Passage]] = []  # (score, start)
    done: list[_Passage] = []
    current = _Passage()

    def _close_current():
        nonlocal current
        if current.start >= 0:
            current.score = np.float32(current.score * _norm(current.start))
            if len(pqueue) == n and current.score < pqueue[0][0]:
                current.reset()
            else:
                heapq.heappush(
                    pqueue, (current.score, current.start, id(current), current)
                )
                if len(pqueue) > n:
                    _s, _st, _i, evicted = heapq.heappop(pqueue)
                    evicted.reset()
                    current = evicted
                else:
                    current = _Passage()

    while stream:
        start, end, term, nxt = heapq.heappop(stream)
        if start >= sentinel[0]:  # end of hits
            _close_current()
            break
        if start >= current.end:
            _close_current()
            # advance break iterator: preceding(start+1) .. next()
            lo = 0
            for b_ in bounds:
                if b_ <= start:
                    lo = b_
                else:
                    break
            hi = len(content)
            for b_ in bounds:
                if b_ > lo:
                    hi = min(b_, len(content))
                    break
            current.start, current.end = lo, hi
        # consume this term's occurrences inside the passage as one batch
        tf_count = 0
        v = occ[term]
        while True:
            tf_count += 1
            current.matches.append((start, end))
            if nxt == len(v):
                break
            start, end = v[nxt]
            nxt += 1
            if start >= current.end:
                heapq.heappush(stream, (start, end, term, nxt))
                break
        current.score = np.float32(
            current.score
            + weights[term] * _tf(tf_count, current.end - current.start)
        )

    passages = sorted((p for _s, _st, _i, p in pqueue), key=lambda p: p.start)
    for p in passages:
        p.matches.sort()
    best = max((p.score for p in passages), default=np.float32(0.0))
    return _format(passages, content), np.float32(best)


def _format(passages: list[_Passage], content: str,
            pre: str = "<b>", post: str = "</b>",
            ellipsis: str = "... ") -> str:
    """DefaultPassageFormatter.format:60-88 (escape=false)."""
    out = []
    pos = 0
    for p in passages:
        if p.start > pos and pos > 0:
            out.append(ellipsis)
        pos = p.start
        for start, end in p.matches:
            if start > pos:
                out.append(content[pos:start])
            if end > pos:
                out.append(pre)
                out.append(content[max(pos, start):end])
                out.append(post)
                pos = end
        out.append(content[pos:max(pos, p.end)])
        pos = p.end
    return "".join(out)
