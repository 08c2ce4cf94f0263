"""FastVectorHighlighter port (lucene/highlighter/src/java/org/apache/
lucene/search/vectorhighlight/) — the term-vector highlighter family,
completing the trio beside the postings (search/highlight.py) and
classic (search/classic_highlight.py) chains.

Chain reproduced class-for-class:
- FieldQuery (FieldQuery.java): flatten (BooleanQuery non-prohibited
  clauses, DisjunctionMax, Boost products, single-term phrases demote to
  terms, LinkedHashSet dedup), expand() — overlapping same-slop phrases
  concatenate into new phrases BOTH directions, including the
  reference's quirk of wrapping a boosted expansion in BoostQuery(pq,
  1f) so expansions always carry boost 1 (FieldQuery.java:200) — and
  the QueryPhraseMap trie with markTerminal's insertion-order
  termOrPhraseNumber.
- FieldTermStack (FieldTermStack.java): per-doc query-term entries
  (term, startOffset, endOffset, position, weight) where weight =
  (float)(ln(numDocs / (df + 1)) + 1); the TERM-SORTED emission + stable
  position sort makes same-position ties lexical; same-position entries
  chain CIRCULARLY via next and leave the stack.
- FieldPhraseList (FieldPhraseList.java): the greedy trie walk with
  same-position alternatives (ti.getNext() ring), longest-match
  backtrack (pop trailing candidates until searchPhrase validates),
  isValidTermOrPhrase's per-step |gap| <= slop rule, and
  addIfNoOverlap's merge-terms-into-existing on offset overlap.
- WeightedPhraseInfo: adjacent positions extend the last Toffs, gaps
  open a new one.
- BaseFragListBuilder/SimpleFragListBuilder (margin 6, minFragCharSize
  3*margin): the IteratorQueue window walk — discard phrases starting
  before the previous fragment's end, pull phrases while endOffset <=
  spanEnd, acceptPhrase (multi-term matches longer than fragCharSize
  drop), centered re-margin, spanEnd = spanStart + max(matchLen,
  fragCharSize).
- SimpleFieldFragList (score = float32 sum of phrase boosts) and
  WeightedFieldFragList (distinct-term ti.weight * phrase boost sums,
  the length/sqrt(length) norm).
- ScoreOrderFragmentsBuilder + BaseFragmentsBuilder +
  SimpleBoundaryScanner (maxScan 20, boundary chars .,!?space tab nl):
  stable sort by totalBoost DESC, fragment source window with
  boundary-adjusted offsets (tokenized buffer length - 1 for the
  appended separator), per-Toffs <b>..</b> tag splicing.

Pinned fragment-string + float32-score exact against the compiled
FastVectorHighlighter in tests/test_lucene_ground_truth.py (GT round
70). The Spark surface is the `fvh` variant of `q:highlight_snippet`
(ops/relational.py) — one zero-shuffle Arrow stage over stored text.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["FieldQuery", "fvh_fragments"]


class _TermInfo:
    __slots__ = ("text", "start", "end", "pos", "weight", "next")

    def __init__(self, text, start, end, pos, weight):
        self.text = text
        self.start = start
        self.end = end
        self.pos = pos
        self.weight = weight
        self.next = self


class _QueryPhraseMap:
    __slots__ = ("terminal", "slop", "boost", "seqnum", "sub")

    def __init__(self):
        self.terminal = False
        self.slop = 0
        self.boost = 1.0
        self.seqnum = 0
        self.sub: dict[str, _QueryPhraseMap] = {}

    def mark_terminal(self, slop: int, boost: float, seq: int) -> None:
        self.terminal = True
        self.slop = slop
        self.boost = boost
        self.seqnum = seq

    def search_phrase(self, candidate: list[_TermInfo]):
        cur = self
        for ti in candidate:
            cur = cur.sub.get(ti.text)
            if cur is None:
                return None
        return cur if cur.is_valid(candidate) else None

    def is_valid(self, candidate: list[_TermInfo]) -> bool:
        if not self.terminal:
            return False
        if len(candidate) == 1:
            return True
        pos = candidate[0].pos
        for ti in candidate[1:]:
            if abs(ti.pos - pos - 1) > self.slop:
                return False
            pos = ti.pos
        return True


class FieldQuery:
    """Flat queries in: (terms_tuple, slop, boost) — a 1-tuple is a
    TermQuery, longer is a PhraseQuery (the caller already performed
    the trivial flatten of boolean/dismax shells, preserving clause
    ORDER — LinkedHashSet semantics: first occurrence wins)."""

    def __init__(self, flat_queries, phrase_highlight: bool = True):
        # LinkedHashSet dedup on (terms, slop, boost) identity
        seen = []
        for q in flat_queries:
            terms, slop, boost = q
            if len(terms) == 1:
                q = (terms, 0, boost)  # 1-term phrase -> TermQuery
            if q not in seen:
                seen.append(q)
        self.term_set = {t for terms, _s, _b in seen for t in terms}
        expanded = self._expand(seen)
        self.root = _QueryPhraseMap()
        self._seq = 0
        for terms, slop, boost in expanded:
            self._add(terms, slop, boost)
            if not phrase_highlight and len(terms) > 1:
                for t in terms:
                    self._add((t,), 0, boost)

    def _add(self, terms, slop, boost) -> None:
        m = self.root
        for t in terms:
            nxt = m.sub.get(t)
            if nxt is None:
                nxt = _QueryPhraseMap()
                m.sub[t] = nxt
            m = nxt
        m.mark_terminal(slop if len(terms) > 1 else 0, boost, self._seq)
        self._seq += 1

    @staticmethod
    def _expand(flat):
        """expand(): overlapping same-slop phrase pairs concatenate
        (both directions); boosted expansions wrap at boost 1f
        (FieldQuery.checkOverlap's `new BoostQuery(pq, 1f)`)."""
        out = []
        pending = list(flat)
        while pending:
            q = pending.pop(0)
            if q not in out:
                out.append(q)
            terms, slop, boost = q
            if len(terms) < 2:
                continue
            for terms2, slop2, boost2 in pending:
                if len(terms2) < 2 or slop != slop2:
                    continue
                for src, s_boost in ((terms, boost), (terms2, boost2)):
                    dest = terms2 if src is terms else terms
                    for i in range(1, len(src)):
                        overlap = all(
                            src[j] == dest[j - i]
                            for j in range(i, len(src))
                            if j - i < len(dest)
                        )
                        if overlap and len(src) - i < len(dest):
                            merged = src + dest[len(src) - i:]
                            nb = 1.0 if s_boost != 1.0 else 1.0
                            cand = (merged, slop, nb)
                            if cand not in out:
                                out.append(cand)
        return out


def field_term_stack(tokens, term_set, doc_count: int, df_of) -> list:
    """FieldTermStack: tokens = [(term, start_offset, end_offset,
    position)] for ONE doc; entries emitted term-sorted then stable
    position-sorted; same-position runs chain circularly and only the
    first stays. df_of(term) -> docFreq."""
    entries: list[_TermInfo] = []
    by_term: dict[str, list] = {}
    for t, s, e, p in tokens:
        if t in term_set:
            by_term.setdefault(t, []).append((s, e, p))
    for t in sorted(by_term):
        w = np.float32(math.log(doc_count / float(df_of(t) + 1)) + 1.0)
        for s, e, p in by_term[t]:
            entries.append(_TermInfo(t, s, e, p, float(w)))
    entries.sort(key=lambda ti: ti.pos)  # stable: ties keep term order
    stack: list[_TermInfo] = []
    prev = first = None
    cur_pos = -1
    for ti in entries:
        if ti.pos == cur_pos:
            prev.next = ti
            prev = ti
        else:
            if prev is not None:
                prev.next = first
            prev = first = ti
            cur_pos = ti.pos
            stack.append(ti)
    if prev is not None:
        prev.next = first
    return stack


class _WeightedPhraseInfo:
    __slots__ = ("boost", "seqnum", "terms_infos", "toffs")

    def __init__(self, terms: list[_TermInfo], boost: float, seqnum: int):
        self.boost = boost
        self.seqnum = seqnum
        self.terms_infos = list(terms)
        self.toffs = [[terms[0].start, terms[0].end]]
        pos = terms[0].pos
        for ti in terms[1:]:
            if ti.pos - pos == 1:
                self.toffs[-1][1] = ti.end
            else:
                self.toffs.append([ti.start, ti.end])
            pos = ti.pos

    @property
    def start(self):
        return self.toffs[0][0]

    @property
    def end(self):
        return self.toffs[-1][1]

    def text(self):
        # WeightedPhraseInfo.getText: term texts joined (used by SubInfo)
        return "".join(ti.text for ti in self.terms_infos)

    def overlaps(self, other) -> bool:
        # isOffsetOverlap (FieldPhraseList.java): interval overlap of
        # the whole [start, end) covers
        sa, ea = self.start, self.end
        sb, eb = other.start, other.end
        return (sb <= sa < eb) or (sb < ea <= eb) or (sa <= sb < ea) or (sa < eb <= ea)


def field_phrase_list(stack: list, fq: FieldQuery, phrase_limit: int = 1 << 31):
    """FieldPhraseList: greedy trie walk over the term stack with
    same-position rings and the longest-match backtrack."""
    phrase_list: list[_WeightedPhraseInfo] = []
    stack = list(stack)  # consumed via pop(0) / pushback

    def pop():
        return stack.pop(0) if stack else None

    def push(ti):
        stack.insert(0, ti)

    while stack and len(phrase_list) < phrase_limit:
        candidate: list[_TermInfo] = []
        first = ti = pop()
        cur = fq.root.sub.get(ti.text)
        while cur is None and ti.next is not first:
            ti = ti.next
            cur = fq.root.sub.get(ti.text)
        if cur is None:
            continue
        candidate.append(ti)
        while True:
            first = ti = pop()
            nxt = None
            if ti is not None:
                nxt = cur.sub.get(ti.text)
                while nxt is None and ti.next is not first:
                    ti = ti.next
                    nxt = cur.sub.get(ti.text)
            if ti is None or nxt is None:
                if ti is not None:
                    push(ti)
                if cur.is_valid(candidate):
                    _add_if_no_overlap(
                        phrase_list,
                        _WeightedPhraseInfo(candidate, cur.boost, cur.seqnum),
                    )
                else:
                    while len(candidate) > 1:
                        push(candidate.pop())
                        cur2 = fq.root.search_phrase(candidate)
                        if cur2 is not None:
                            _add_if_no_overlap(
                                phrase_list,
                                _WeightedPhraseInfo(
                                    candidate, cur2.boost, cur2.seqnum),
                            )
                            break
                break
            else:
                candidate.append(ti)
                cur = nxt
    return phrase_list


def _add_if_no_overlap(phrase_list, wpi) -> None:
    for existing in phrase_list:
        if existing.overlaps(wpi):
            existing.terms_infos.extend(wpi.terms_infos)
            return
    phrase_list.append(wpi)


class _FragInfo:
    __slots__ = ("start", "end", "sub_infos", "total_boost")

    def __init__(self, start, end, sub_infos, total_boost):
        self.start = start
        self.end = end
        self.sub_infos = sub_infos  # [(text, toffs, seqnum, boost)]
        self.total_boost = total_boost


_MARGIN = 6
_MIN_FRAG_CHAR_SIZE = 3 * _MARGIN


def frag_list(phrase_list, frag_char_size: int, weighted: bool = False):
    """BaseFragListBuilder.createFieldFragList with SimpleFieldFragList
    (score = f32 sum of boosts) or WeightedFieldFragList (distinct-term
    ti.weight * boost, length norm)."""
    if frag_char_size < _MIN_FRAG_CHAR_SIZE:
        raise ValueError(f"fragCharSize({frag_char_size}) is too small")
    frag_infos: list[_FragInfo] = []
    it = iter(phrase_list)
    top = next(it, None)

    def remove_top():
        nonlocal top
        cur = top
        top = next(it, None)
        return cur

    start_offset = 0
    while top is not None:
        phrase_info = top
        if phrase_info.start < start_offset:
            remove_top()
            continue
        wpil = []
        cur_start = phrase_info.start
        cur_end = phrase_info.end
        span_end = max(cur_end, max(cur_start - _MARGIN, start_offset)
                       + frag_char_size)
        if _accept_phrase(remove_top(), cur_end - cur_start, frag_char_size):
            wpil.append(phrase_info)
        while top is not None:
            phrase_info = top
            if phrase_info.end <= span_end:
                cur_end = phrase_info.end
                if _accept_phrase(remove_top(), cur_end - cur_start,
                                  frag_char_size):
                    wpil.append(phrase_info)
            else:
                break
        if not wpil:
            continue
        match_len = cur_end - cur_start
        new_margin = max(0, (frag_char_size - match_len) // 2)
        span_start = cur_start - new_margin
        if span_start < start_offset:
            span_start = start_offset
        span_end = span_start + max(match_len, frag_char_size)
        start_offset = span_end
        frag_infos.append(
            _make_frag_info(span_start, span_end, wpil, weighted))
    return frag_infos


def _accept_phrase(info, match_length, frag_char_size) -> bool:
    return len(info.toffs) <= 1 or match_length <= frag_char_size


def _make_frag_info(start, end, wpil, weighted) -> _FragInfo:
    if not weighted:
        total = np.float32(0.0)
        subs = []
        for pi in wpil:
            subs.append((pi.text(), [list(t) for t in pi.toffs], pi.seqnum,
                         pi.boost))
            total = np.float32(total + np.float32(pi.boost))
        return _FragInfo(start, end, subs, float(total))
    # WeightedFieldFragList.add
    temp = []
    distinct: set[str] = set()
    length = 0
    for pi in wpil:
        ptb = np.float32(0.0)
        for ti in pi.terms_infos:
            if ti.text not in distinct:
                distinct.add(ti.text)
                ptb = np.float32(
                    ptb + np.float32(np.float32(ti.weight)
                                     * np.float32(pi.boost)))
            length += 1
    # note: the reference adds length++ for EVERY terms info, but only
    # distinct ones contribute weight
        temp.append((pi.text(), [list(t) for t in pi.toffs], pi.seqnum,
                     float(ptb)))
    norm = np.float32(length * np.float32(
        1.0 / np.float32(math.sqrt(length)))) if length else np.float32(0.0)
    total = np.float32(0.0)
    subs = []
    for text, toffs, seq, b in temp:
        sb = np.float32(np.float32(b) * norm)
        subs.append((text, toffs, seq, float(sb)))
        total = np.float32(total + sb)
    return _FragInfo(start, end, subs, float(total))


_BOUNDARY_CHARS = {".", ",", "!", "?", " ", "\t", "\n"}
_MAX_SCAN = 20


def _find_start_offset(buf: str, start: int) -> int:
    if start > len(buf) or start < 1:
        return start
    offset = start
    for _ in range(_MAX_SCAN):
        if offset <= 0:
            break
        if buf[offset - 1] in _BOUNDARY_CHARS:
            return offset
        offset -= 1
    if offset == 0:
        return 0
    return start


def _find_end_offset(buf: str, start: int) -> int:
    if start > len(buf) or start < 0:
        return start
    offset = start
    for _ in range(_MAX_SCAN):
        if offset >= len(buf):
            break
        if buf[offset] in _BOUNDARY_CHARS:
            return offset
        offset += 1
    return start


def make_fragments(text: str, frag_infos, max_num: int,
                   pre_tag: str = "<b>", post_tag: str = "</b>",
                   score_order: bool = True):
    """ScoreOrderFragmentsBuilder.createFragments over a single stored
    value: stable boost-DESC sort, then makeFragment's per-Toffs tag
    splice on the boundary-adjusted source window. Returns
    [(fragment_string, total_boost)]."""
    infos = list(frag_infos)
    if score_order:
        infos.sort(key=lambda fi: -fi.total_boost)  # stable, ties keep order
    out = []
    buf = text + " "  # tokenized field: value + separator
    buf_len = len(buf) - 1  # tokenized -> bufferLength--
    for fi in infos[:max_num]:
        eo = buf_len if buf_len < fi.end else _find_end_offset(buf, fi.end)
        mso = _find_start_offset(buf, fi.start)
        src = buf[mso:eo]
        frag = []
        idx = 0
        for _text, toffs, _seq, _b in fi.sub_infos:
            for ts, te in toffs:
                frag.append(src[idx:ts - mso])
                frag.append(pre_tag)
                frag.append(src[ts - mso:te - mso])
                frag.append(post_tag)
                idx = te - mso
        frag.append(src[idx:])
        out.append(("".join(frag), fi.total_boost))
    return out


def fvh_fragments(text: str, tokens, flat_queries, doc_count: int, df_of,
                  frag_char_size: int = 100, max_num: int = 3,
                  weighted: bool = False, phrase_highlight: bool = True,
                  phrase_limit: int = 1 << 31):
    """The whole chain for one doc. tokens = [(term, start, end, pos)]."""
    fq = FieldQuery(flat_queries, phrase_highlight=phrase_highlight)
    stack = field_term_stack(tokens, fq.term_set, doc_count, df_of)
    pl = field_phrase_list(stack, fq, phrase_limit=phrase_limit)
    fil = frag_list(pl, frag_char_size, weighted=weighted)
    return make_fragments(text, fil, max_num)
