#!/usr/bin/env python3
"""Extract Snowball `Among` tables from a generated Java stemmer into
Python literals (suffix, substring_i, among_var). The tables are
behavior DATA (suffix lists), not code — same category as the folding
tables adjudicated in earlier rounds.

Usage: python tools/extract_among.py <JavaFile> [table_index ...]
Prints one Python tuple-list per a_N table.
"""

from __future__ import annotations

import re
import sys


def parse(path: str) -> dict[int, list[tuple[str, int, int]]]:
    src = open(path, encoding="utf-8").read()
    tables: dict[int, list[tuple[str, int, int]]] = {}
    for m in re.finditer(
            r"a_(\d+)\[\]\s*=\s*\{(.*?)\};", src, re.S):
        idx = int(m.group(1))
        entries = []
        for e in re.finditer(
                r'new Among\s*\(\s*"((?:[^"\\]|\\.)*)"\s*,\s*(-?\d+)\s*,'
                r"\s*(-?\d+)", m.group(2)):
            s = e.group(1).encode().decode("unicode_escape")
            entries.append((s, int(e.group(2)), int(e.group(3))))
        tables[idx] = entries
    return tables


def main() -> None:
    path = sys.argv[1]
    want = [int(x) for x in sys.argv[2:]]
    tables = parse(path)
    for idx in sorted(tables):
        if want and idx not in want:
            continue
        print(f"_A{idx} = (")
        for s, _parent, var in tables[idx]:
            print(f"    ({s!r}, {var}),")
        print(")")


if __name__ == "__main__":
    main()
