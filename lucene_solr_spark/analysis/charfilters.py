"""Char filters — the pre-tokenizer analysis stage with offset
correction.

References:
  lucene/analysis/common/src/java/org/apache/lucene/analysis/charfilter/
    BaseCharFilter.java (the offsets/diffs correction tree),
    MappingCharFilter.java, NormalizeCharMap.java
  lucene/analysis/common/src/java/org/apache/lucene/analysis/pattern/
    PatternReplaceCharFilter.java

Pinned bit-for-bit vs the compiled filters (GT round 50): the FILTERED
TEXT and the full correctOffset map (every output offset 0..len).

* BaseCharFilter.correct: binary search over (output offset, cumulative
  diff) entries; an offset before the first entry is unchanged, at or
  past an entry gains that entry's diff (BaseCharFilter.java:42-68).
  addOffCorrectMap overwrites the diff when called twice at one offset.

* MappingCharFilter: greedy longest match of the NormalizeCharMap rules
  at each input position (replacement may be empty).  Shorter
  replacement -> one entry at the post-replacement output offset;
  longer -> one entry per extra char, each stepping the diff back by
  one (MappingCharFilter.java:142-162).

* PatternReplaceCharFilter: whole-input regex replace; shrinking match
  -> one entry after the replacement; growing match -> one entry per
  extra char with decreasing diff; correct() clamps at 0
  (PatternReplaceCharFilter.java:90-137).
"""

from __future__ import annotations

import re


class OffsetMap:
    """BaseCharFilter's offsets/diffs pair: output offset -> input
    offset via the last entry at or before it."""

    def __init__(self) -> None:
        self.offsets: list[int] = []
        self.diffs: list[int] = []

    def add(self, off: int, cumulative_diff: int) -> None:
        if self.offsets and off == self.offsets[-1]:
            self.diffs[-1] = cumulative_diff  # overwrite at same offset
            return
        self.offsets.append(off)
        self.diffs.append(cumulative_diff)

    def last_cumulative_diff(self) -> int:
        return self.diffs[-1] if self.diffs else 0

    def correct(self, off: int) -> int:
        import bisect

        if not self.offsets or off < self.offsets[0]:
            return off
        i = bisect.bisect_right(self.offsets, off) - 1
        return off + self.diffs[i]


class _TrieNode:
    __slots__ = ("children", "replacement")

    def __init__(self) -> None:
        self.children: dict[str, _TrieNode] = {}
        self.replacement: str | None = None


def build_charmap(rules: dict[str, str]) -> _TrieNode:
    """NormalizeCharMap.Builder: match keys must be non-empty and
    unique (the dict argument enforces uniqueness)."""
    root = _TrieNode()
    for match, repl in rules.items():
        if not match:
            raise ValueError("cannot match the empty string")
        node = root
        for ch in match:
            node = node.children.setdefault(ch, _TrieNode())
        node.replacement = repl
    return root


def mapping_char_filter(
    text: str, rules: dict[str, str] | _TrieNode
) -> tuple[str, OffsetMap]:
    """MappingCharFilter.read()'s loop over a whole string: greedy
    longest rule match at each position, pass-through otherwise;
    offset-correction entries exactly as the reference records them."""
    root = rules if isinstance(rules, _TrieNode) else build_charmap(rules)
    out: list[str] = []
    om = OffsetMap()
    i, n = 0, len(text)
    while i < n:
        node = root.children.get(text[i])
        best_len, best_repl = -1, None
        k = i
        while node is not None:
            k += 1
            if node.replacement is not None:
                best_len, best_repl = k - i, node.replacement
            if k >= n:
                break
            node = node.children.get(text[k])
        if best_repl is None:
            out.append(text[i])
            i += 1
            continue
        i += best_len
        diff = best_len - len(best_repl)
        if diff != 0:
            prev = om.last_cumulative_diff()
            if diff > 0:
                om.add(i - diff - prev, prev + diff)
            else:
                output_start = i - prev
                for extra in range(-diff):
                    om.add(output_start + extra, prev - extra - 1)
        out.append(best_repl)
    return "".join(out), om


def pattern_replace_char_filter(
    text: str, pattern: str, replacement: str
) -> tuple[str, OffsetMap]:
    """PatternReplaceCharFilter.processPattern over a whole string.
    `pattern` must stay inside the Java-regex ∩ Python-regex subset;
    `replacement` supports Java's $N group references."""
    py_repl = re.sub(r"\$(\d)", r"\\\1", replacement)
    om = OffsetMap()
    out: list[str] = []
    cumulative = 0
    last_end = 0
    for m in re.finditer(pattern, text):
        group_size = m.end() - m.start()
        out.append(text[last_end:m.start()])
        length_before = sum(len(x) for x in out)
        rep = m.expand(py_repl)
        out.append(rep)
        last_end = m.end()
        if group_size != len(rep):
            if len(rep) < group_size:
                cumulative += group_size - len(rep)
                om.add(length_before + len(rep), cumulative)
            else:
                for i in range(group_size, len(rep)):
                    cumulative -= 1
                    om.add(length_before + i, cumulative)
    out.append(text[last_end:])
    return "".join(out), om


def pattern_replace_correct(om: OffsetMap, off: int) -> int:
    """PatternReplaceCharFilter.correct clamps at 0."""
    return max(0, om.correct(off))


def register_mapping_analyzer(
    name: str, rules: dict[str, str], base: str = "whitespace"
) -> None:
    """Register 'MappingCharFilter(rules) -> <base chain>' under
    `name`.  The char filter runs before tokenization exactly like the
    reference's Analyzer.initReader plug point; token POSITIONS are
    those of the filtered text (offset correction is exposed via
    mapping_char_filter for offset consumers)."""
    from .tokenizer import ANALYZERS, DYNAMIC_CHAINS, POSINC_STREAMS

    root = build_charmap(rules)
    base_entry = ANALYZERS[base]
    base_tok = base_entry[0]
    base_stream = POSINC_STREAMS.get(base)

    def tok(text: str) -> list[str]:
        return base_tok(mapping_char_filter(text, root)[0])

    ANALYZERS[name] = (tok, base_entry[1], base_entry[2], base_entry[3])
    if base_stream is not None:  # pragma: no cover - posinc base chains
        POSINC_STREAMS[name] = lambda t: base_stream(
            mapping_char_filter(t, root)[0]
        )
    DYNAMIC_CHAINS[name] = ("mapping", dict(rules), base)
