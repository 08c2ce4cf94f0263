"""PathHierarchyTokenizer / ReversePathHierarchyTokenizer — the field
type behind path faceting and directory drill-down (the natural chain
for the north-star corpus's `path` column).

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
path/PathHierarchyTokenizer.java and ReversePathHierarchyTokenizer.java.

Pinned bit-for-bit vs the compiled tokenizers (GT round 54):

* Forward: '/a/b/c' -> '/a'(posInc 1), '/a/b'(0), '/a/b/c'(0) — every
  ancestor prefix as a term at ONE position, so a directory term query
  matches every file under it without a prefix scan.  `skip` drops the
  first N segments (offsets advance past them); the delimiter maps to
  `replacement` everywhere, including a leading one; a trailing
  delimiter rides into the next token (endDelimiter).  The quirk that
  the FIRST char consumed per token counts toward `skipped` whether or
  not it is a delimiter is reproduced (PathHierarchyTokenizer.java:148).

* Reverse: '/a/b/c' -> '/a/b/c'(1), 'a/b/c'(0), 'b/c'(0), 'c'(0) —
  every suffix, the file-extension / basename drill direction; `skip`
  drops the LAST N segments from every emitted suffix.
"""

from __future__ import annotations


def path_hierarchy_tokenize(
    text: str, delimiter: str = "/", replacement: str | None = None,
    skip: int = 0,
) -> list[tuple[str, int, int, int]]:
    """PathHierarchyTokenizer -> [(term, posInc, start, end)]."""
    if skip < 0:
        raise ValueError("skip cannot be negative")
    repl = delimiter if replacement is None else replacement
    out: list[tuple[str, int, int, int]] = []
    result = ""  # resultToken: the previously emitted (growing) prefix
    start_position = 0
    skipped = 0
    end_delimiter = False
    i, n = 0, len(text)
    while True:
        chars: list[str] = list(result)
        pinc = 1 if not result else 0
        length = 0
        added = False
        if end_delimiter:
            chars.append(repl)
            length += 1
            end_delimiter = False
            added = True
        emitted = False
        while True:
            if i >= n:
                if skipped > skip and added:
                    length += len(result)
                    tok = "".join(chars)
                    out.append((tok, pinc, start_position, start_position + length))
                return out
            c = text[i]
            i += 1
            if not added:
                # the first consumed char per token counts toward
                # `skipped` delimiter-or-not (reference quirk)
                added = True
                skipped += 1
                if skipped > skip:
                    chars.append(repl if c == delimiter else c)
                    length += 1
                else:
                    start_position += 1
            elif c == delimiter:
                if skipped > skip:
                    end_delimiter = True
                    emitted = True
                    break
                skipped += 1
                if skipped > skip:
                    chars.append(repl)
                    length += 1
                else:
                    start_position += 1
            else:
                if skipped > skip:
                    chars.append(c)
                    length += 1
                else:
                    start_position += 1
        if emitted:
            length += len(result)
            tok = "".join(chars)
            out.append((tok, pinc, start_position, start_position + length))
            result = tok


def reverse_path_hierarchy_tokenize(
    text: str, delimiter: str = "/", replacement: str | None = None,
    skip: int = 0,
) -> list[tuple[str, int, int, int]]:
    """ReversePathHierarchyTokenizer -> [(term, posInc, start, end)]."""
    if skip < 0:
        raise ValueError("skip cannot be negative")
    repl = delimiter if replacement is None else replacement
    positions = [0]
    buf: list[str] = []
    for idx, c in enumerate(text):
        if c == delimiter:
            positions.append(idx + 1)
            buf.append(repl)
        else:
            buf.append(c)
    n = len(text)
    count = len(positions)
    if positions[count - 1] < n:
        positions.append(n)
        count += 1
    s = "".join(buf)
    idx = count - 1 - skip
    if idx < 0:
        return []
    end_position = positions[idx]
    out: list[tuple[str, int, int, int]] = []
    for k in range(count - skip - 1):
        start = positions[k]
        out.append((s[start:end_position], 1 if k == 0 else 0, start, end_position))
    return out


def register_path_analyzer(
    name: str, delimiter: str = "/", replacement: str | None = None,
    skip: int = 0, reverse: bool = False,
) -> None:
    """Register the path-hierarchy chain under `name` (Solr's
    PathHierarchyTokenizerFactory field type). All prefixes (or
    suffixes) of a path stack at ONE position, so a directory term
    query matches every file under it."""
    from .tokenizer import ANALYZERS, DYNAMIC_CHAINS, POSINC_STREAMS

    from .tokenizer import QUERY_POSINC_STREAMS

    fn = reverse_path_hierarchy_tokenize if reverse else path_hierarchy_tokenize

    def stream(text: str) -> list[tuple[str, int]]:
        return [(t, pi) for t, pi, _s, _e in fn(text, delimiter, replacement, skip)]

    def query_stream(text: str) -> list[tuple[str, int]]:
        # Solr pairs the hierarchy INDEX side with a KeywordTokenizer
        # QUERY side: the query path is one exact term, and the index's
        # stacked ancestors make a directory term match its subtree
        return [(text, 1)] if text else []

    def flat(text: str) -> list[str]:
        return [t for t, _pi in stream(text)]

    ANALYZERS[name] = (flat, False, False, None)
    POSINC_STREAMS[name] = stream
    QUERY_POSINC_STREAMS[name] = query_stream
    DYNAMIC_CHAINS[name] = ("path", delimiter, replacement, skip, reverse)
