"""SynonymFilter — index-time multi-word synonym stacking, reference-exact.

Reproduces lucene/analysis/common's SynonymMap + SynonymFilter
(analysis/synonym/SynonymFilter.java, SynonymMap.java):

- SynonymMap.Builder (SynonymMap.java:139-286): per input phrase the
  output ords accumulate in ADD order, duplicates dropped keeping the
  first occurrence (the dedup=true default), includeOrig OR-merged
  across adds; output ords are first-seen insertion order across ALL
  adds (the shared BytesRefHash). The FST's char-by-char walk with
  U+0000 word separators is replaced by a WORD-level trie — exactly
  equivalent: a token either traverses a word edge completely or the
  parse breaks, and final states are only tested at token boundaries
  (SynonymFilter.java:382-419).
- SynonymFilter.parse() (:316-451): greedy matching — the rule starting
  earliest and consuming the most input tokens wins; lookahead tokens
  are captured into the rolling buffer; a match sets inputSkipCount to
  the matched length.
- addOutput (:453-506): output phrase word i stacks onto input position
  (match start + i); a single-token output takes the match's endOffset
  and posLen = keepOrig ? matchLength : 1; multi-token outputs inherit
  each slot's input endOffset with posLen 1.
- The replay loop (:530-625): at each position the ORIGINAL token goes
  first (kept when keepOrig or unmatched, with its own captured
  posInc), then that position's outputs (posInc 0 after an emitted
  original, else 1 for the first and 0 after — PendingOutputs.pullNext
  :182-191), and outputs that extend past the end of input flush in the
  end case with the LAST input token's offsets (:597-617).

Pinned bit-for-bit — (term, posInc, posLen, startOffset, endOffset,
type) — against the compiled filter in
tests/test_lucene_ground_truth.py (ground-truth round 43).

Like Lucene, the index stores positions but not posLength, and the
filter's stacked output is a flattened (not graph-correct) stream —
the reference's own documented limitation (SynonymFilter.java:64-77).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .tokenizer import _java_lower

WORD_SEPARATOR = "\x00"  # SynonymMap.WORD_SEPARATOR (U+0000)
TYPE_SYNONYM = "SYNONYM"


class SynonymMapBuilder:
    """SynonymMap.Builder analog over a word-level trie."""

    def __init__(self, dedup: bool = True):
        self.dedup = dedup
        self._words: dict[str, int] = {}  # output phrase -> ord (BytesRefHash)
        self._word_list: list[str] = []
        # input phrase (tuple of words) -> [includeOrig, [ords in add order]]
        self._working: dict[tuple[str, ...], list] = {}
        self.max_horizontal_context = 0

    def add(self, input_words: list[str], output_words: list[str],
            include_orig: bool) -> None:
        if not input_words or not output_words:
            raise ValueError("input and output must be non-empty")
        if any(not w for w in input_words) or any(not w for w in output_words):
            raise ValueError("empty words (holes) are not allowed")
        out_phrase = WORD_SEPARATOR.join(output_words)
        ord_ = self._words.get(out_phrase)
        if ord_ is None:
            ord_ = len(self._word_list)
            self._words[out_phrase] = ord_
            self._word_list.append(out_phrase)
        key = tuple(input_words)
        e = self._working.get(key)
        if e is None:
            e = [False, []]
            self._working[key] = e
        e[1].append(ord_)
        e[0] = e[0] or include_orig
        self.max_horizontal_context = max(
            self.max_horizontal_context, len(input_words), len(output_words)
        )

    def build(self) -> "SynonymTrie":
        trie = SynonymTrie(self.max_horizontal_context, self._word_list)
        for key, (include_orig, ords) in self._working.items():
            if self.dedup:
                seen: set[int] = set()
                kept = [o for o in ords if not (o in seen or seen.add(o))]
            else:
                kept = list(ords)
            trie.insert(key, include_orig, kept)
        return trie


class SynonymTrie:
    def __init__(self, max_horizontal_context: int, word_list: list[str]):
        self.root: dict = {}
        self.max_horizontal_context = max_horizontal_context
        self.word_list = word_list

    def insert(self, words: tuple[str, ...], include_orig: bool,
               ords: list[int]) -> None:
        node = self.root
        for w in words:
            node = node.setdefault(w, {})
        node[""] = (include_orig, ords)  # final-state payload


@dataclass
class _PendingInput:
    """SynonymFilter.PendingInput (:137-153)."""

    state: tuple | None = None  # captured (term, posInc, startOff, endOff)
    keep_orig: bool = False
    matched: bool = False
    consumed: bool = True
    start_offset: int = 0
    end_offset: int = 0

    def reset(self) -> None:
        self.state = None
        self.consumed = True
        self.keep_orig = False
        self.matched = False


@dataclass
class _PendingOutputs:
    """SynonymFilter.PendingOutputs (:159-226)."""

    outputs: list[tuple[str, int, int]] = field(default_factory=list)
    # (text, endOffset or -1, posLength)
    upto: int = 0
    pos_incr: int = 1
    last_end_offset: int = 0
    last_pos_length: int = 0

    @property
    def count(self) -> int:
        return len(self.outputs)

    def reset(self) -> None:
        self.outputs = []
        self.upto = 0
        self.pos_incr = 1

    def pull_next(self) -> str:
        text, eo, pl = self.outputs[self.upto]
        self.last_end_offset = eo
        self.last_pos_length = pl
        self.upto += 1
        self.pos_incr = 0
        if self.upto == self.count:
            self.reset()
        return text

    def add(self, text: str, end_offset: int, pos_length: int) -> None:
        self.outputs.append((text, end_offset, pos_length))


def synonym_stream(
    tokens: list[tuple[str, int, int, int]],
    trie: SynonymTrie,
    ignore_case: bool = False,
) -> list[tuple[str, int, int, int, int, str]]:
    """Run the SynonymFilter over a (term, posInc, startOffset,
    endOffset) stream; returns (term, posInc, posLength, startOffset,
    endOffset, type) in the reference's exact order/values."""
    roll = 1 + trie.max_horizontal_context
    future_inputs = [_PendingInput() for _ in range(roll)]
    future_outputs = [_PendingOutputs() for _ in range(roll)]
    next_read = next_write = 0
    input_skip = 0
    finished = False
    last_start_offset = last_end_offset = 0
    it = iter(tokens)
    current: tuple | None = None  # the just-pulled, uncaptured token
    out: list[tuple[str, int, int, int, int, str]] = []

    def roll_incr(x: int) -> int:
        x += 1
        return 0 if x == roll else x

    def fold(word: str) -> str:
        return _java_lower(word) if ignore_case else word

    def add_output(include_orig: bool, ords: list[int],
                   match_len: int, match_end: int) -> None:
        # addOutput (:453-506)
        for o in ords:
            words = trie.word_list[o].split(WORD_SEPARATOR)
            output_upto = next_read
            for wi, w in enumerate(words):
                if len(words) == 1:
                    eo = match_end
                    pl = match_len if include_orig else 1
                else:
                    eo = -1
                    pl = 1
                future_outputs[output_upto].add(w, eo, pl)
                output_upto = roll_incr(output_upto)
        upto = next_read
        for _ in range(match_len):
            future_inputs[upto].keep_orig |= include_orig
            future_inputs[upto].matched = True
            upto = roll_incr(upto)

    def parse() -> None:
        # parse() (:316-451), FST walk replaced by the word trie
        nonlocal next_read, next_write, finished, input_skip
        nonlocal last_start_offset, last_end_offset, current
        cur_next_read = next_read
        match: tuple | None = None  # (include_orig, ords, length, end_off)
        node = trie.root
        token_count = 0
        while True:
            if cur_next_read == next_write:
                if finished:
                    break
                nxt = next(it, None)
                if nxt is None:
                    finished = True
                    break
                current = nxt
                term, _pi, so, eo = nxt
                slot = future_inputs[next_write]
                last_start_offset = slot.start_offset = so
                last_end_offset = slot.end_offset = eo
                input_end_offset = eo
                word = term
                if next_read != next_write:
                    # capture(): store the pulled token's full state
                    slot.state = nxt
                    slot.consumed = False
                    next_write = roll_incr(next_write)
                else:
                    slot.consumed = False
            else:
                term, _pi, so, eo = future_inputs[cur_next_read].state  # type: ignore[misc]
                input_end_offset = future_inputs[cur_next_read].end_offset
                word = term
            token_count += 1
            child = node.get(fold(word))
            if child is None:
                break  # byToken: char walk failed
            node = child
            if "" in node:
                include_orig, ords = node[""]
                match = (include_orig, ords, token_count, input_end_offset)
            # does any key continue with another word?
            if not any(k for k in node if k):  # only the final payload left
                break
            if next_read == next_write:
                # capture the current (uncaptured) pulled token before
                # looking ahead (:424-427)
                slot = future_inputs[next_write]
                slot.state = current
                slot.consumed = False
                next_write = roll_incr(next_write)
            cur_next_read = roll_incr(cur_next_read)
        if next_read == next_write and not finished:
            # the pulled-but-uncaptured token occupies its slot (:432-435)
            next_write = roll_incr(next_write)
        if match is not None:
            include_orig, ords, mlen, mend = match
            input_skip = mlen
            add_output(include_orig, ords, mlen, mend)
        elif next_read != next_write:
            input_skip = 1

    while True:
        progressed = False
        while input_skip != 0:
            progressed = True
            pin = future_inputs[next_read]
            pout = future_outputs[next_read]
            if not pin.consumed and (pin.keep_orig or not pin.matched):
                if pin.state is not None:
                    term, pi, so, eo = pin.state
                else:
                    term, pi, so, eo = current  # type: ignore[misc]
                pin.reset()
                if pout.count > 0:
                    pout.pos_incr = 0
                else:
                    next_read = roll_incr(next_read)
                    input_skip -= 1
                out.append((term, pi, 1, so, eo, "word"))
            elif pout.upto < pout.count:
                pin.reset()
                pos_incr = pout.pos_incr
                text = pout.pull_next()
                eo = pout.last_end_offset
                if eo == -1:
                    eo = pin.end_offset
                tok = (text, pos_incr, pout.last_pos_length,
                       pin.start_offset, eo, TYPE_SYNONYM)
                if pout.count == 0:
                    next_read = roll_incr(next_read)
                    input_skip -= 1
                out.append(tok)
            else:
                pin.reset()
                next_read = roll_incr(next_read)
                input_skip -= 1
        if finished and next_read == next_write:
            pout = future_outputs[next_read]
            if pout.upto < pout.count:
                pos_incr = pout.pos_incr
                text = pout.pull_next()
                future_inputs[next_read].reset()
                if pout.count == 0:
                    next_write = next_read = roll_incr(next_read)
                out.append((text, pos_incr, pout.last_pos_length,
                            last_start_offset, last_end_offset, TYPE_SYNONYM))
                continue
            return out
        parse()
        # parse() making no progress with nothing replayable means the
        # stream is exhausted; the loop above then hits the end case
        _ = progressed


def _ws_offset_tokens(text: str) -> list[tuple[str, int, int, int]]:
    import re

    return [
        (m.group(0), 1, m.start(), m.end())
        for m in re.finditer(r"\S+", text)
    ]


def register_synonym_analyzer(
    name: str,
    trie: SynonymTrie,
    ignore_case: bool = False,
    lowercase_after: bool = True,
) -> None:
    """Register a 'WhitespaceTokenizer -> SynonymFilter(map) ->
    LowerCaseFilter' chain under `name` for build_index(analyzer=name)
    and the searcher. Like Lucene, the SynonymMap is an ANALYZER-side
    artifact: the application must register the same chain in the build
    and search sessions (the index manifest records only the name —
    IndexWriterConfig(Analyzer) semantics). The filter's stacked tokens
    (posInc 0) reach the index through the POSINC_STREAMS path."""
    from .tokenizer import ANALYZERS, POSINC_STREAMS

    def stream(text: str) -> list[tuple[str, int]]:
        return [
            (t, pi)
            for t, pi, _pl, _s, _e, _ty in synonym_stream(
                _ws_offset_tokens(text), trie, ignore_case
            )
        ]

    def flat(text: str) -> list[str]:
        return [t for t, _pi in stream(text)]

    ANALYZERS[name] = (flat, False, False, _java_lower if lowercase_after else None)
    POSINC_STREAMS[name] = stream
    from .tokenizer import DYNAMIC_CHAINS, POSINC_BATCH_STREAMS

    POSINC_BATCH_STREAMS[name] = synonym_batch_fn(trie, ignore_case)
    DYNAMIC_CHAINS[name] = ("synonym", trie, ignore_case, lowercase_after)


def _solr_split(s: str, separator: str) -> list[str]:
    """SolrSynonymParser.split (:138-166): separator scan with
    backslash keeping the escape AND the next char in the piece
    (unescape strips them later)."""
    out: list[str] = []
    sb: list[str] = []
    pos, end = 0, len(s)
    while pos < end:
        if s.startswith(separator, pos):
            if sb:
                out.append("".join(sb))
                sb = []
            pos += len(separator)
            continue
        ch = s[pos]
        pos += 1
        if ch == "\\":
            sb.append(ch)
            if pos >= end:
                break
            ch = s[pos]
            pos += 1
        sb.append(ch)
    if sb:
        out.append("".join(sb))
    return out


def _solr_unescape(s: str) -> str:
    """SolrSynonymParser.unescape (:168-182)."""
    if "\\" not in s:
        return s
    out: list[str] = []
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i < len(s) - 1:
            i += 1
            out.append(s[i])
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def parse_solr_synonyms(
    text: str,
    expand: bool = True,
    dedup: bool = True,
    analyze_fn=None,
) -> SynonymMapBuilder:
    """SolrSynonymParser.addInternal (:80-137): blank/# lines skipped,
    'lhs, lhs => rhs, rhs' explicit mappings (all pairs, never
    preserving the original, >1 '=>' is an error), comma lists under
    the expand flag (all i!=j pairs keeping the original, or everything
    -> first including first -> first, not keeping), entries analyzed
    (default: whitespace split, the Parser's analyzer hook) after
    unescape+trim. Pinned vs the compiled parser in ground-truth round
    45. Returns the filled SynonymMapBuilder (call .build())."""
    if analyze_fn is None:
        analyze_fn = str.split
    b = SynonymMapBuilder(dedup=dedup)

    def entry(s: str) -> list[str]:
        words = analyze_fn(_solr_unescape(s).strip())
        if not words:
            raise ValueError(f"synonym entry analyzed to zero tokens: {s!r}")
        return words

    for line in text.splitlines():
        if not line or line[0] == "#":
            continue
        sides = _solr_split(line, "=>")
        if len(sides) > 1:
            if len(sides) != 2:
                raise ValueError(
                    "more than one explicit mapping specified on the same line"
                )
            inputs = [entry(x) for x in _solr_split(sides[0], ",")]
            outputs = [entry(x) for x in _solr_split(sides[1], ",")]
            for i in inputs:
                for o in outputs:
                    b.add(i, o, False)
        else:
            inputs = [entry(x) for x in _solr_split(line, ",")]
            if expand:
                for i, wi in enumerate(inputs):
                    for j, wj in enumerate(inputs):
                        if i != j:
                            b.add(wi, wj, True)
            else:
                for wi in inputs:
                    b.add(wi, inputs[0], False)
    return b


def parse_wordnet_synonyms(
    text: str,
    expand: bool = True,
    dedup: bool = True,
    analyze_fn=None,
) -> SynonymMapBuilder:
    """WordnetSynonymParser (analysis/synonym/WordnetSynonymParser
    .java): prolog s(synsetId,...,'word',...) lines grouped by the
    synset id at chars [2,11); the quoted word ('' unescapes to ')
    is analyzed; single-entry synsets are skipped; expand=true adds ALL
    i,j pairs INCLUDING i==j (unlike the Solr parser's i!=j), else
    everything -> first — includeOrig always false. Pinned vs the
    compiled parser in ground-truth round 45b."""
    if analyze_fn is None:
        analyze_fn = str.split
    b = SynonymMapBuilder(dedup=dedup)

    def flush(synset: list[list[str]]) -> None:
        if len(synset) <= 1:
            return
        if expand:
            for wi in synset:
                for wj in synset:
                    b.add(wi, wj, False)
        else:
            for wi in synset:
                b.add(wi, synset[0], False)

    synset: list[list[str]] = []
    last_id = ""
    for line in text.splitlines():
        syn_id = line[2:11]
        if syn_id != last_id:
            flush(synset)
            synset = []
        start = line.index("'") + 1
        end = line.rindex("'")
        words = analyze_fn(line[start:end].replace("''", "'"))
        if not words:
            raise ValueError(f"synonym entry analyzed to zero tokens: {line!r}")
        synset.append(words)
        last_id = syn_id
    flush(synset)
    return b


def synonym_batch_fn(trie: SynonymTrie, ignore_case: bool):
    """Build-hot-path batch form (POSINC_BATCH_STREAMS): the stateful
    filter machine only runs on documents that contain at least one
    rule's FIRST word (root-key prefilter, computed at vocabulary level
    over the batch via one factorize + one membership gather); every
    other document is a pure pass-through (each token posInc 1 — the
    machine is an identity there by construction: no root key, no match,
    no drops). A property test pins batch == per-token stream."""
    import numpy as np
    import pandas as pd

    roots = frozenset(k for k in trie.root if k)

    def batch(texts: list[str]) -> tuple[list[list[str]], list[list[int]]]:
        token_lists = [t.split() if t else [] for t in texts]
        counts = np.fromiter((len(x) for x in token_lists), np.int64,
                             len(token_lists))
        total = int(counts.sum())
        out_toks: list[list[str]] = []
        out_pinc: list[list[int]] = []
        if total:
            flat = np.empty(total, dtype=object)
            o = 0
            for toks in token_lists:
                flat[o : o + len(toks)] = toks
                o += len(toks)
            codes, uniq = pd.factorize(flat, sort=False)
            is_root = np.fromiter(
                (( _java_lower(u) if ignore_case else u) in roots for u in uniq),
                bool, len(uniq),
            )
            doc_has_root = np.zeros(len(token_lists), dtype=bool)
            np.logical_or.at(
                doc_has_root,
                np.repeat(np.arange(len(token_lists)), counts),
                is_root[codes],
            )
        else:
            doc_has_root = np.zeros(len(token_lists), dtype=bool)
        for i, toks in enumerate(token_lists):
            if doc_has_root[i]:
                stream = synonym_stream(
                    _ws_offset_tokens(texts[i]), trie, ignore_case
                )
                out_toks.append([t for t, *_ in stream])
                out_pinc.append([p for _t, p, *_ in stream])
            else:
                out_toks.append(toks)
                out_pinc.append([1] * len(toks))
        return out_toks, out_pinc

    return batch
