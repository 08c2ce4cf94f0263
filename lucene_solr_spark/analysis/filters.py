"""Token filters beyond the standard chain (analysis/common):

  ascii_fold      ASCIIFoldingFilter.java (foldToASCII): fold Latin
                  diacritics/ligatures to their ASCII equivalents.
  strip_possessive EnglishPossessiveFilter.java: drop trailing 's / ’s.
  shingles        ShingleFilter.java: token n-grams joined by a filler.
  edge_ngrams     EdgeNGramTokenFilter.java: leading-edge grams.
  ngrams          NGramTokenFilter.java: all grams of len [lo, hi].

All are pure per-token / per-stream functions so they compose into the
ANALYZERS registry (tokenizer.py) and run inside the index build's
Arrow-batched analysis UDF.
"""

from __future__ import annotations

from .fold_table import FOLD_TABLE


def ascii_fold(token: str) -> str:
    """ASCIIFoldingFilter.foldToASCII — the reference's EXACT per-char
    mapping (fold_table.py, pinned against the compiled filter over
    every BMP codepoint in ground-truth round 40). A previous NFKD-based
    approximation over-folded ~15k chars the reference keeps (ª, ¼,
    fullwidth forms, Greek/Cyrillic decompositions) and missed/diverged
    on ~430 it folds (Ɖ→D, ĸ→q, «»→\"); the switch is behavior, not
    derivable from Unicode properties."""
    if token.isascii():
        return token
    return token.translate(FOLD_TABLE)


def strip_possessive(token: str) -> str:
    """EnglishPossessiveFilter: remove trailing 's (apostrophe variants
    U+0027 / U+2019 / U+FF07), matching the reference's incrementToken."""
    if len(token) >= 2 and token[-1] in "sS" and token[-2] in "'’＇":
        return token[:-2]
    return token


def shingles(
    tokens: list[str], min_n: int = 2, max_n: int = 2, sep: str = "_",
    output_unigrams: bool = False,
) -> list[str]:
    """ShingleFilter: emit word n-grams for n in [min_n, max_n], joined by
    `sep` (tokenSeparator). With output_unigrams the original tokens are
    interleaved first at each position (posInc-0 stacking flattened into
    stream order — position arrays downstream index the OUTPUT stream)."""
    out: list[str] = []
    n_tok = len(tokens)
    for i in range(n_tok):
        if output_unigrams:
            out.append(tokens[i])
        for n in range(min_n, max_n + 1):
            if i + n <= n_tok:
                out.append(sep.join(tokens[i : i + n]))
    return out


def edge_ngrams(token: str, lo: int = 2, hi: int = 5) -> list[str]:
    """EdgeNGramTokenFilter (Side.FRONT): leading grams of len [lo, hi]."""
    return [token[:n] for n in range(lo, min(hi, len(token)) + 1)]


def ngrams(token: str, lo: int = 2, hi: int = 3) -> list[str]:
    """NGramTokenFilter: every gram of len [lo, hi], front-to-back."""
    out = []
    for n in range(lo, hi + 1):
        out.extend(token[i : i + n] for i in range(len(token) - n + 1))
    return out


def s_stem(token: str) -> str:
    """EnglishMinimalStemmer.stem (analysis/en/EnglishMinimalStemmer
    .java:28-45) — Harman's S-stemmer, ported branch-for-branch
    (case-sensitive, like the reference char compares): '-ies' -> '-y'
    unless preceded by a/e, keep '-us'/'-ss' and vowel+'es' forms,
    otherwise strip the final 's'. Pinned vs the compiled stemmer in
    ground-truth round 41."""
    n = len(token)
    if n < 3 or token[-1] != "s":
        return token
    c = token[-2]
    if c in "us":
        return token
    if c == "e":
        if n > 3 and token[-3] == "i" and token[-4] not in "ae":
            return token[:-3] + "y"
        if token[-3] in "iaoe":
            return token
    return token[:-1]
