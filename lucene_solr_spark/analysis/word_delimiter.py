"""WordDelimiterFilter — identifier-aware subword splitting, reference-exact.

Reproduces lucene/analysis/common's WordDelimiterFilter.java +
WordDelimiterIterator.java (the filter Solr ships for product codes and
source identifiers — camelCase / snake_case / alnum transitions), the
most behavior-rich analysis component in the reference:

- WordDelimiterIterator.java:116-150 — subword scan with the break
  matrix (:198-215: same-type never breaks, UPPER->letter never breaks,
  case/numeric splits gated by flags), bounds-stripped delimiters
  (:235-247) and the trailing-possessive skip (:255-262: `'s` after an
  ALPHA, followed by end-or-delimiter, consumed silently).
- WordDelimiterFilter.java:227-356 — the emission driver: protected /
  delimiter-free words pass through with accumulated position increments
  (:244-250), all-delimiter tokens are dropped with the posInc==1
  accumulation quirk (:253-260), PRESERVE_ORIGINAL emits the original
  first and forces the next token to posInc 0 (:268-273, :532-535),
  CATENATE runs flush on type change unless the run is a single
  already-generated part (:446-454), CATENATE_ALL dedups against the
  last flushed run (:285-293), and buffered subwords re-sort by
  (startOffset asc, posInc desc) before emission with the first-token
  posInc==0 -> 1 fix (:295-307, :378-402).
- position(inject) (:522-540) — the hasOutputToken /
  hasOutputFollowingOriginal / accumPosInc state machine, ported
  branch-for-branch (including the paths that do NOT clear the
  accumulator).

The whole stream is pinned bit-for-bit — (term, posInc, startOffset,
endOffset) per emitted token — against the compiled filter over fuzzed
identifier corpora and the full flags matrix in
tests/test_lucene_ground_truth.py (ground-truth round 42).

Like the reference, the scan runs over UTF-16 code units (surrogates
type as ALPHA|DIGIT so astral chars never split internally).
"""

from __future__ import annotations

import unicodedata

# char classes (WordDelimiterFilter.java:86-93)
LOWER = 0x01
UPPER = 0x02
DIGIT = 0x04
SUBWORD_DELIM = 0x08
ALPHA = 0x03
ALPHANUM = 0x07

# configuration flags (WordDelimiterFilter.java:100-154)
GENERATE_WORD_PARTS = 1
GENERATE_NUMBER_PARTS = 2
CATENATE_WORDS = 4
CATENATE_NUMBERS = 8
CATENATE_ALL = 16
PRESERVE_ORIGINAL = 32
SPLIT_ON_CASE_CHANGE = 64
SPLIT_ON_NUMERICS = 128
STEM_ENGLISH_POSSESSIVE = 256

DEFAULT_FLAGS = (
    GENERATE_WORD_PARTS
    | GENERATE_NUMBER_PARTS
    | SPLIT_ON_CASE_CHANGE
    | SPLIT_ON_NUMERICS
    | STEM_ENGLISH_POSSESSIVE
)

_DONE = -1

# Java Character.getType -> WDF class (WordDelimiterIterator.java:283-325)
_CAT_MAP = {
    "Lu": UPPER,
    "Ll": LOWER,
    "Lt": ALPHA,
    "Lm": ALPHA,
    "Lo": ALPHA,
    "Mn": ALPHA,
    "Me": ALPHA,
    "Mc": ALPHA,
    "Nd": DIGIT,
    "Nl": DIGIT,
    "No": DIGIT,
    "Cs": ALPHA | DIGIT,  # surrogate halves never split internally
}


def _build_default_table() -> list[int]:
    # DEFAULT_WORD_DELIM_TABLE (WordDelimiterIterator.java:75-94):
    # isLowerCase / isUpperCase / isDigit over the first 256 codepoints
    tab = []
    for i in range(256):
        ch = chr(i)
        if ch.islower():
            code = LOWER
        elif ch.isupper():
            code = UPPER
        elif ch.isdigit() and unicodedata.category(ch) == "Nd":
            code = DIGIT
        else:
            code = SUBWORD_DELIM
        tab.append(code)
    return tab


_DEFAULT_TABLE = _build_default_table()


def _char_type(cu: int) -> int:
    if cu < 256:
        return _DEFAULT_TABLE[cu]
    if 0xD800 <= cu <= 0xDFFF:
        return ALPHA | DIGIT
    return _CAT_MAP.get(unicodedata.category(chr(cu)), SUBWORD_DELIM)


def _units(text: str) -> list[int]:
    """UTF-16 code units (the reference iterates char[], so astral chars
    are two surrogate units)."""
    out: list[int] = []
    for ch in text:
        o = ord(ch)
        if o > 0xFFFF:
            o -= 0x10000
            out.append(0xD800 | (o >> 10))
            out.append(0xDC00 | (o & 0x3FF))
        else:
            out.append(o)
    return out


def _decode(units: list[int]) -> str:
    # join surrogate pairs back into astral codepoints
    out = []
    i = 0
    n = len(units)
    while i < n:
        u = units[i]
        if 0xD800 <= u <= 0xDBFF and i + 1 < n and 0xDC00 <= units[i + 1] <= 0xDFFF:
            out.append(chr(0x10000 + ((u - 0xD800) << 10) + (units[i + 1] - 0xDC00)))
            i += 2
        else:
            out.append(chr(u))
            i += 1
    return "".join(out)


class _Iter:
    """WordDelimiterIterator (WordDelimiterIterator.java), ported
    field-for-field."""

    def __init__(self, units: list[int], split_case: bool, split_num: bool,
                 stem_poss: bool):
        self.u = units
        self.types = [_char_type(c) for c in units]
        self.split_case = split_case
        self.split_num = split_num
        self.stem_poss = stem_poss
        self.length = self.end_bounds = len(units)
        self.current = self.start_bounds = self.end = 0
        self.skip_possessive = False
        self.has_final_possessive = False
        self._set_bounds()

    # :198-215
    def _is_break(self, last_type: int, typ: int) -> bool:
        if (typ & last_type) != 0:
            return False
        if not self.split_case and (last_type & ALPHA) and (typ & ALPHA):
            return False
        if (last_type & UPPER) and (typ & ALPHA):
            return False
        if not self.split_num and (
            ((last_type & ALPHA) and (typ & DIGIT))
            or ((last_type & DIGIT) and (typ & ALPHA))
        ):
            return False
        return True

    # :255-262
    def _ends_with_possessive(self, pos: int) -> bool:
        return (
            self.stem_poss
            and pos > 2
            and self.u[pos - 2] == 0x27
            and self.u[pos - 1] in (0x73, 0x53)
            and (self.types[pos - 3] & ALPHA) != 0
            and (pos == self.end_bounds or (self.types[pos] & SUBWORD_DELIM) != 0)
        )

    # :235-247
    def _set_bounds(self) -> None:
        while (
            self.start_bounds < self.length
            and (self.types[self.start_bounds] & SUBWORD_DELIM)
        ):
            self.start_bounds += 1
        while (
            self.end_bounds > self.start_bounds
            and (self.types[self.end_bounds - 1] & SUBWORD_DELIM)
        ):
            self.end_bounds -= 1
        if self._ends_with_possessive(self.end_bounds):
            self.has_final_possessive = True
        self.current = self.start_bounds

    # :116-150
    def next(self) -> int:
        self.current = self.end
        if self.current == _DONE:
            return _DONE
        if self.skip_possessive:
            self.current += 2
            self.skip_possessive = False
        last_type = 0
        while self.current < self.end_bounds:
            last_type = self.types[self.current]
            if not (last_type & SUBWORD_DELIM):
                break
            self.current += 1
        if self.current >= self.end_bounds:
            self.end = _DONE
            return _DONE
        self.end = self.current + 1
        while self.end < self.end_bounds:
            typ = self.types[self.end]
            if self._is_break(last_type, typ):
                break
            last_type = typ
            self.end += 1
        if self.end < self.end_bounds - 1 and self._ends_with_possessive(self.end + 2):
            self.skip_possessive = True
        return self.end

    # :159-173
    def type(self) -> int:
        if self.end == _DONE:
            return 0
        t = self.types[self.current]
        return ALPHA if t in (LOWER, UPPER) else t

    # :222-229
    def is_single_word(self) -> bool:
        if self.has_final_possessive:
            return self.current == self.start_bounds and self.end == self.end_bounds - 2
        return self.current == self.start_bounds and self.end == self.end_bounds


def word_delimiter_stream(
    tokens: list[tuple[str, int, int, int]],
    flags: int = DEFAULT_FLAGS,
    prot_words: frozenset[str] = frozenset(),
) -> list[tuple[str, int, int, int]]:
    """Run the WordDelimiterFilter over a (term, posInc, startOffset,
    endOffset) stream; returns the emitted stream in the reference's
    exact order with its exact posInc/offset values."""

    def has(f: int) -> bool:
        return (flags & f) != 0

    out: list[tuple[str, int, int, int]] = []
    accum = 0  # accumPosInc
    first = True
    has_output_token = False
    has_output_following_original = False

    def position(inject: bool) -> int:
        # WordDelimiterFilter.java:522-540, branch-for-branch (note which
        # paths do NOT clear the accumulator)
        nonlocal accum, has_output_token, has_output_following_original
        pos_inc = accum
        if has_output_token:
            accum = 0
            return 0 if inject else max(1, pos_inc)
        has_output_token = True
        if not has_output_following_original:
            has_output_following_original = True
            return 0
        accum = 0
        return max(1, pos_inc)

    for term, pinc, soff, eoff in tokens:
        accum += pinc
        units = _units(term)
        it = _Iter(
            units,
            has(SPLIT_ON_CASE_CHANGE),
            has(SPLIT_ON_NUMERICS),
            has(STEM_ENGLISH_POSSESSIVE),
        )
        it.next()

        # delimiter-free or protected word: pass through (:244-250)
        if (it.current == 0 and it.end == len(units)) or term in prot_words:
            out.append((term, accum, soff, eoff))
            accum = 0
            first = False
            continue

        # word of only delimiters (:253-260)
        if it.end == _DONE and not has(PRESERVE_ORIGINAL):
            if pinc == 1 and not first:
                accum -= 1
            continue

        has_output_token = False
        has_output_following_original = not has(PRESERVE_ORIGINAL)
        last_concat_count = 0
        # legal offsets iff the term length matches the offset span (:427)
        illegal_offsets = (eoff - soff) != len(units)

        if has(PRESERVE_ORIGINAL):
            out.append((term, accum, soff, eoff))
            accum = 0
            first = False

        # concat state: [text_units, start_off, end_off, type, subword_count]
        concat = ["", 0, 0, 0, 0]
        concat_all = ["", 0, 0, 0, 0]
        buffered: list[list] = []  # [sort_start_off, posInc, term, s, e]

        def part_offsets(cur: int, end: int, single: bool) -> tuple[int, int]:
            start_offset = soff + cur
            end_offset = soff + end
            if illegal_offsets:
                # :501-508 — synonyms keep the original span
                if single and start_offset <= eoff:
                    return start_offset, eoff
                return soff, eoff
            return start_offset, end_offset

        def generate_part(single: bool) -> tuple[str, int, int, int]:
            text = _decode(units[it.current : it.end])
            s, e = part_offsets(it.current, it.end, single)
            return (text, position(False), s, e)

        def concat_write(c: list) -> tuple[str, int, int, int]:
            # WordDelimiterConcatenation.write (:619-638)
            nonlocal accum
            if illegal_offsets:
                s, e = soff, eoff
            else:
                s, e = c[1], c[2]
            tok = (c[0], position(True), s, e)
            accum = 0
            return tok

        def concatenate(c: list) -> None:
            if not c[0]:
                c[1] = soff + it.current
            c[0] += _decode(units[it.current : it.end])
            c[2] = soff + it.end
            c[4] += 1

        def flush_concatenation(c: list) -> bool:
            # :446-454
            nonlocal last_concat_count
            last_concat_count = c[4]
            if c[4] != 1 or not should_generate_parts(c[3]):
                tok = concat_write(c)
                buffered.append([tok[2], tok[1], tok])
                c[:] = ["", 0, 0, 0, 0]
                return True
            c[:] = ["", 0, 0, 0, 0]
            return False

        def should_concatenate(word_type: int) -> bool:
            return (has(CATENATE_WORDS) and (word_type & ALPHA) != 0) or (
                has(CATENATE_NUMBERS) and (word_type & DIGIT) != 0
            )

        def should_generate_parts(word_type: int) -> bool:
            return (has(GENERATE_WORD_PARTS) and (word_type & ALPHA) != 0) or (
                has(GENERATE_NUMBER_PARTS) and (word_type & DIGIT) != 0
            )

        while True:
            if it.end == _DONE:
                if concat[0]:
                    flush_concatenation(concat)
                if concat_all[0]:
                    if concat_all[4] > last_concat_count:
                        tok = concat_write(concat_all)
                        buffered.append([tok[2], tok[1], tok])
                    concat_all[:] = ["", 0, 0, 0, 0]
                break
            if it.is_single_word():
                tok = generate_part(True)
                out.append(tok)
                it.next()
                first = False
                continue
            word_type = it.type()
            if concat[0] and (concat[3] & word_type) == 0:
                if flush_concatenation(concat):
                    has_output_token = False
                    continue  # re-examine the same subword (:326-331)
                has_output_token = False
            if should_concatenate(word_type):
                if not concat[0]:
                    concat[3] = word_type
                concatenate(concat)
            if has(CATENATE_ALL):
                concatenate(concat_all)
            if should_generate_parts(word_type):
                tok = generate_part(False)
                buffered.append([tok[2], tok[1], tok])
            it.next()

        # buffered emission: stable sort by (startOffset asc, posInc desc)
        # (OffsetSorter :378-402), first-token posInc 0 -> 1 fix (:301-304)
        buffered.sort(key=lambda b: (b[0], -b[1]))
        for _, _, tok in buffered:
            text, p, s, e = tok
            if first and p == 0:
                p = 1
            first = False
            out.append((text, p, s, e))
    return out


def whitespace_wdf_tokens(text: str, flags: int = DEFAULT_FLAGS,
                          prot_words: frozenset[str] = frozenset()
                          ) -> list[tuple[str, int, int, int]]:
    """WhitespaceTokenizer -> WordDelimiterFilter over raw text (the
    recommended pairing — StandardTokenizer pre-strips the intra-word
    delimiters WDF exists to handle, WordDelimiterFilter.java:75-82).
    Offsets are UTF-16 code-unit offsets, like the reference."""
    toks: list[tuple[str, int, int, int]] = []
    off = 0  # UTF-16 offset
    i = 0
    n = len(text)
    while i < n:
        while i < n and text[i].isspace():
            off += 2 if ord(text[i]) > 0xFFFF else 1
            i += 1
        j = i
        start = off
        while j < n and not text[j].isspace():
            off += 2 if ord(text[j]) > 0xFFFF else 1
            j += 1
        if j > i:
            toks.append((text[i:j], 1, start, off))
        i = j
    return word_delimiter_stream(toks, flags, prot_words)


def code_stream(text: str) -> list[tuple[str, int]]:
    """The 'code' analyzer chain's positional stream: WhitespaceTokenizer
    -> WordDelimiterFilter(DEFAULT_FLAGS) -> (token, posInc). Lowercasing
    runs AFTER the filter as the registry term map (LowerCaseFilter's
    place in Solr's typical WDF field type) so the case-change splits see
    the original case."""
    return [(t, p) for t, p, _s, _e in whitespace_wdf_tokens(text, DEFAULT_FLAGS)]


def code_tokens(text: str) -> list[str]:
    """Flat token list for the query side (positions come from the
    index; queries only need the analyzed term sequence)."""
    return [t for t, _p, _s, _e in whitespace_wdf_tokens(text, DEFAULT_FLAGS)]


def code_stream_batch(texts: list[str]) -> tuple[list[list[str]], list[list[int]]]:
    """Vocabulary-level 'code' chain for the BUILD hot path: the WDF
    machine runs once per DISTINCT whitespace token; per-occurrence work
    is a dict gather. Returns per doc (tokens, posIncs).

    Exactness argument (DEFAULT_FLAGS only — asserted): with every input
    posInc 1 and no PRESERVE_ORIGINAL, the filter's cross-token state
    reduces to two facts. (1) A dropped all-delimiter token nets ZERO
    accumulated increment once anything was emitted (`accum += 1` then
    the :256-258 `accum -= 1` quirk), but +1 each while `first` is still
    true (nothing emitted yet — the quirk is skipped). (2) Within a
    token, the first emitted posInc is `accum` for a pass-through word
    and max(1, accum) for generated parts (position(False) with
    hasOutputToken=False, hasOutputFollowingOriginal=True) — both equal
    1 + k where k is the number of LEADING dropped tokens of the doc,
    and every later posInc is accum-independent. So: expand each
    distinct token once at accum=1, then add the doc's leading-drop
    count to its first emitted posInc. A property test pins this path
    token-for-token against the per-token stream."""
    token_lists = [t.split() if t else [] for t in texts]
    expansions: dict[str, tuple[list[str], list[int]] | None] = {}
    for toks in token_lists:
        for tok in toks:
            if tok in expansions:
                continue
            stream = word_delimiter_stream(
                [(tok, 1, 0, len(tok))], DEFAULT_FLAGS
            )
            # None == dropped all-delimiter token
            expansions[tok] = (
                ([t for t, _p, _s, _e in stream],
                 [p for _t, p, _s, _e in stream])
                if stream else None
            )
    out_toks: list[list[str]] = []
    out_pinc: list[list[int]] = []
    for toks in token_lists:
        dt: list[str] = []
        dp: list[int] = []
        leading_drops = 0
        for tok in toks:
            exp = expansions[tok]
            if exp is None:
                if not dt:
                    leading_drops += 1
                continue
            start = len(dp)
            dt.extend(exp[0])
            dp.extend(exp[1])
            if start == 0 and leading_drops:
                dp[0] += leading_drops
        out_toks.append(dt)
        out_pinc.append(dp)
    return out_toks, out_pinc
