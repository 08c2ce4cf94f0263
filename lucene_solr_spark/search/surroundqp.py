"""Surround query language parser (queryparser/surround) — the FULL
grammar, replacing the round-24 prefix-form subset.

Grammar (surround/parser/QueryParser.jj): infix precedence chain
OrQuery > AndQuery > NotQuery > NQuery > WQuery > PrimaryQuery, all
left-associative; prefix forms OR(...)/AND(...)/W(...)/N(...) with
comma-separated args; distance operators take an optional 2-99 prefix
(`3W`, `10n`) and rewrite to SpanNearQuery(clauses, dist - 1, ordered)
(surround/query/DistanceQuery.java:97); `^number` weights compose
left-associatively and multiply (OptionalWeights: `a^2^3` == `a^6`,
weight <= 0 or unparseable -> ParseException); terms are matched
VERBATIM against the index (no analysis); `pre*` is a prefix query
(>= 3 chars), `tr?nc*` a truncated query (>= 3 normal chars) whose
suffix compiles to the reference's RAW regex (`*` -> `.*`, `?` -> `.`,
other chars appended unescaped — SrndTruncQuery.appendRegExpForChar),
`"quoted"` terms keep their inner text raw (QueryParser.jj's
SimpleTerm: no unescaping), `"pre"*` is a quoted prefix; `field:`
prefixes select fields (FieldsQuery — multiple prefixes OR the query
across fields).

Rewrite semantics (surround/query/*.java):
- Boolean context: SimpleTerm expands over the matching index terms ->
  MatchNoDocs / single TermQuery / BooleanQuery SHOULD
  (SimpleTermRewriteQuery.rewrite); AndQuery -> all MUST; OrQuery ->
  all SHOULD; NotQuery -> first MUST + rest MUST_NOT; weights wrap
  BoostQuery at any level (SrndQuery.makeLuceneQueryField).
- Distance context: each subquery fills a SpanNearClauseFactory —
  SimpleTerm adds one SpanTermQuery per matching index term, OrQuery
  FLATTENS its members into the same factory, nested DistanceQuery adds
  its own SpanNearQuery (an empty nested near is a MatchNoDocsQuery and
  is SKIPPED — SpanNearClauseFactory.addSpanQuery); an empty factory
  makes the whole distance op MatchNoDocs, but the remaining subqueries
  are still visited for their side effects
  (DistanceQuery.getSpanNearQuery's error-message loop still counts
  basic queries). Span-context weights only wrap SpanBoostQuery, whose
  sub-weights are built with needsScores=false (SpanNearQuery.java:182,
  SpanOrQuery.java:74) — score-INERT, so the engine drops them.
- Every TermQuery / SpanTermQuery creation ticks BasicQueryFactory's
  counter; exceeding maxBasicQueries (default 1024) raises
  (TooManyBasicQueries).

Validation (parse time): distance subqueries must be SimpleTerm /
OrQuery / DistanceQuery (checkDistanceSubQueries — AndQuery, NotQuery
and field-prefixed args raise ParseException).

Ground-truth-pinned in tests/test_lucene_ground_truth.py (round 66)
against the compiled surround parser + IndexSearcher.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "SurroundParseError",
    "SurroundTooManyBasicQueries",
    "parse_surround",
    "surround_to_tree",
]


class SurroundParseError(ValueError):
    """ParseException / TokenMgrError parity."""


class SurroundTooManyBasicQueries(ValueError):
    """TooManyBasicQueries parity (BasicQueryFactory.checkMax)."""


# ---------------------------------------------------------------------------
# lexer — QueryParser.jj token section, longest match with declaration-
# order tie-break (OR AND NOT W N before TERM; TRUNCQUOTED before QUOTED
# before SUFFIXTERM before TRUNCTERM before TERM)

_TERM_CHAR = r'[^ \t\n\r,?*():^"]'
_TOKEN_SPECS = (
    # (kind, regex) in declaration order
    ("OR", r"OR|or"),
    ("AND", r"AND|and"),
    ("NOT", r"NOT|not"),
    ("W", r"(?:[2-9][0-9]?|1[0-9])?[Ww]"),
    ("N", r"(?:[2-9][0-9]?|1[0-9])?[Nn]"),
    ("LPAREN", r"\("),
    ("RPAREN", r"\)"),
    ("COMMA", r","),
    ("COLON", r":"),
    ("CARAT", r"\^"),
    ("TRUNCQUOTED", r'"[^"]+"\*'),
    ("QUOTED", r'"(?:[^"\\]|\\\\|\\")+"'),
    ("SUFFIXTERM", _TERM_CHAR + r"+\*"),
    ("TRUNCTERM", _TERM_CHAR + r"+[*?]+(?:" + _TERM_CHAR + r"|[*?])*"),
    ("TERM", _TERM_CHAR + r"+"),
)
_TOKEN_RES = [(k, re.compile(rx)) for k, rx in _TOKEN_SPECS]
_NUMBER_RE = re.compile(r"[0-9]+(?:\.[0-9]+)?")
_WS_RE = re.compile(r"[ \t\n\r]+")


def _lex(q: str) -> list[tuple[str, str]]:
    """-> [(kind, image)] + ("EOF", ""). The CARAT token switches to the
    Boost lexer state where only NUMBER matches (then back to DEFAULT) —
    QueryParser.jj's <Boost> TOKEN section."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(q)
    boost_state = False
    while i < n:
        m = _WS_RE.match(q, i)
        if m:
            i = m.end()
            continue
        if boost_state:
            m = _NUMBER_RE.match(q, i)
            if not m:
                raise SurroundParseError(
                    f"lexical error in boost at {i}: {q[i:i+10]!r}")
            out.append(("NUMBER", m.group()))
            i = m.end()
            boost_state = False
            continue
        best = None  # (length, declaration_idx, kind, image)
        for di, (kind, rx) in enumerate(_TOKEN_RES):
            m = rx.match(q, i)
            if m:
                ln = m.end() - i
                if best is None or ln > best[0]:
                    best = (ln, di, kind, m.group())
        if best is None:
            raise SurroundParseError(f"lexical error at {i}: {q[i:i+10]!r}")
        _ln, _di, kind, image = best
        out.append((kind, image))
        if kind == "CARAT":
            boost_state = True
        i += _ln
    out.append(("EOF", ""))
    return out


# ---------------------------------------------------------------------------
# parser — AST nodes are dicts:
#   {"k": "term"|"prefix"|"trunc", "text": str, "quoted": bool, "w": float|None}
#   {"k": "and"|"or", "subs": [...], "w": ...}
#   {"k": "not", "subs": [...], "w": ...}
#   {"k": "near", "subs": [...], "dist": int, "ordered": bool, "w": ...}
#   {"k": "fields", "sub": node, "fields": [str], "w": ...}

_MIN_PREFIX = 3  # minimumPrefixLength
_MIN_TRUNC = 3  # minimumCharsInTrunc


class _P:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self, ahead: int = 0) -> str:
        return self.toks[self.i + ahead][0]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str) -> str:
        k, img = self.next()
        if k != kind:
            raise SurroundParseError(f"expected {kind}, got {k} {img!r}")
        return img


def _op_distance(image: str) -> int:
    return 1 if len(image) == 1 else int(image[:-1])


def _mk_distance(subs: list, image: str, ordered: bool) -> dict:
    q = {"k": "near", "subs": subs, "dist": _op_distance(image),
         "ordered": ordered, "w": None}
    _check_distance_subqueries(q, image)
    return q


def _check_distance_subqueries(dq: dict, op_name: str) -> None:
    """checkDistanceSubQueries: every sub must be a DistanceSubQuery
    (SimpleTerm / OrQuery / DistanceQuery), recursively through OrQuery
    members (OrQuery.distanceSubQueryNotAllowed)."""

    def not_allowed(sub: dict) -> str | None:
        k = sub["k"]
        if k in ("term", "prefix", "trunc", "near"):
            return None
        if k == "or":
            for m in sub["subs"]:
                msg = not_allowed(m)
                if msg is not None:
                    return msg
            return None
        return f"subquery not allowed: {k}"

    for sub in dq["subs"]:
        msg = not_allowed(sub)
        if msg is not None:
            raise SurroundParseError(f"Operator {op_name}: {msg}")


def parse_surround(query: str) -> dict:
    """QueryParser.parse: TopSrndQuery = FieldsQuery EOF."""
    p = _P(_lex(query))
    q = _fields_query(p)
    if p.peek() != "EOF":
        k, img = p.next()
        raise SurroundParseError(f"unexpected {k} {img!r}")
    return q


def _fields_query(p: _P) -> dict:
    fields: list[str] = []
    # OptionalFields: LOOKAHEAD(2) to the colon
    while p.peek() == "TERM" and p.peek(1) == "COLON":
        fields.append(p.next()[1])
        p.next()
    q = _or_query(p)
    if fields:
        return {"k": "fields", "sub": q, "fields": fields, "w": None}
    return q


def _infix_chain(p: _P, sub_fn, op_kind: str, mk) -> dict:
    q = sub_fn(p)
    subs = None
    while p.peek() == op_kind:
        p.next()
        if subs is None:
            subs = [q]
        subs.append(sub_fn(p))
    return q if subs is None else mk(subs)


def _or_query(p: _P) -> dict:
    return _infix_chain(p, _and_query, "OR",
                        lambda subs: {"k": "or", "subs": subs, "w": None})


def _and_query(p: _P) -> dict:
    return _infix_chain(p, _not_query, "AND",
                        lambda subs: {"k": "and", "subs": subs, "w": None})


def _not_query(p: _P) -> dict:
    return _infix_chain(p, _n_query, "NOT",
                        lambda subs: {"k": "not", "subs": subs, "w": None})


def _n_query(p: _P) -> dict:
    # left associative: each step pairs the accumulated query with the
    # next WQuery (NQuery production)
    q = _w_query(p)
    while p.peek() == "N":
        _k, img = p.next()
        q = _mk_distance([q, _w_query(p)], img, ordered=False)
    return q


def _w_query(p: _P) -> dict:
    q = _primary_query(p)
    while p.peek() == "W":
        _k, img = p.next()
        q = _mk_distance([q, _primary_query(p)], img, ordered=True)
    return q


def _primary_query(p: _P) -> dict:
    k = p.peek()
    if k == "LPAREN":
        p.next()
        q = _fields_query(p)
        p.expect("RPAREN")
    elif k in ("OR", "AND", "N", "W"):
        q = _prefix_operator_query(p)
    else:
        q = _simple_term(p)
    _optional_weights(p, q)
    return q


def _prefix_operator_query(p: _P) -> dict:
    k, img = p.next()
    subs = _fields_query_list(p)
    if k == "OR":
        return {"k": "or", "subs": subs, "w": None}
    if k == "AND":
        return {"k": "and", "subs": subs, "w": None}
    return _mk_distance(subs, img, ordered=(k == "W"))


def _fields_query_list(p: _P) -> list:
    p.expect("LPAREN")
    subs = [_fields_query(p)]
    p.expect("COMMA")  # (<COMMA> q)+ — at least two args
    subs.append(_fields_query(p))
    while p.peek() == "COMMA":
        p.next()
        subs.append(_fields_query(p))
    p.expect("RPAREN")
    return subs


def _simple_term(p: _P) -> dict:
    k, img = p.next()
    if k == "TERM":
        return {"k": "term", "text": img, "quoted": False, "w": None}
    if k == "QUOTED":
        # inner text RAW — the grammar does NOT unescape (SimpleTerm())
        return {"k": "term", "text": img[1:-1], "quoted": True, "w": None}
    if k == "SUFFIXTERM":
        if len(img) - 1 < _MIN_PREFIX:
            raise SurroundParseError(f"Too unrestrictive truncation: {img}")
        return {"k": "prefix", "text": img[:-1], "quoted": False, "w": None}
    if k == "TRUNCTERM":
        n_normal = sum(1 for c in img if c not in "*?")
        if n_normal < _MIN_TRUNC:
            raise SurroundParseError(f"Too unrestrictive truncation: {img}")
        return {"k": "trunc", "text": img, "w": None}
    if k == "TRUNCQUOTED":
        if len(img) - 3 < _MIN_PREFIX:
            raise SurroundParseError(f"Too unrestrictive truncation: {img}")
        return {"k": "prefix", "text": img[1:-2], "quoted": True, "w": None}
    raise SurroundParseError(f"unexpected {k} {img!r}")


def _optional_weights(p: _P, q: dict) -> None:
    while p.peek() == "CARAT":
        p.next()
        img = p.expect("NUMBER")
        try:
            f = float(img)
        except ValueError as exc:  # pragma: no cover — NUMBER is \d(.\d)?
            raise SurroundParseError(f"Cannot handle boost value: {img}") from exc
        if f <= 0.0:
            raise SurroundParseError(f"Cannot handle boost value: {img}")
        # left associative float32 product (setWeight(f * getWeight()))
        prev = q["w"] if q["w"] is not None else 1.0
        q["w"] = float(np.float32(np.float32(f) * np.float32(prev)))


# ---------------------------------------------------------------------------
# rewrite: AST -> resolved eval_tree nodes over a term dictionary

_NOMATCH = ("bool", ())  # MatchNoDocsQuery


class _Counter:
    """BasicQueryFactory: every TermQuery / SpanTermQuery ticks; the
    1025th raises (checkMax)."""

    def __init__(self, cap: int):
        self.cap = cap
        self.n = 0

    def tick(self) -> None:
        if self.n >= self.cap:
            raise SurroundTooManyBasicQueries(
                f"Exceeded maximum of {self.cap} basic queries.")
        self.n += 1


def surround_to_tree(query: str, dict_like, field: str,
                     max_basic_queries: int = 1024):
    """parse + SrndQuery.makeLuceneQueryField(field, BasicQueryFactory)
    as a resolved eval_tree. `dict_like` needs expand_terms(prefix=,
    lower=/upper=, max_terms=None) over the single indexed field named
    `field` — terms under any OTHER field name expand empty (an absent
    field has no Terms; MultiFields.getTerms -> null)."""
    ast = parse_surround(query)
    counter = _Counter(max_basic_queries)
    return _bool_tree(ast, dict_like, field, field, counter)


def _expand_simple(ast: dict, dict_like, field: str, index_field: str) -> list:
    """visitMatchingTerms: the matching index terms, dictionary order."""
    if field != index_field:
        return []
    k = ast["k"]
    text = ast["text"]
    if k == "term":
        hit = dict_like.expand_terms(lower=text, upper=text,
                                     include_lower=True, include_upper=True,
                                     max_terms=None)
        return [text] if hit else []
    if k == "prefix":
        return list(dict_like.expand_terms(prefix=text, max_terms=None))
    # trunc: leading normal chars = literal prefix; the remainder
    # compiles RAW (`*`->`.*`, `?`->`.`, other chars unescaped) and must
    # fully match the candidate's suffix (SrndTruncQuery)
    i = 0
    while i < len(text) and text[i] not in "*?":
        i += 1
    prefix, rest = text[:i], text[i:]
    pat = "".join(".*" if c == "*" else "." if c == "?" else c for c in rest)
    rx = re.compile(pat)
    return [t for t in dict_like.expand_terms(prefix=prefix, max_terms=None)
            if rx.fullmatch(t[len(prefix):])]


def _apply_weight(ast: dict, node):
    if ast["w"] is not None and node is not None:
        return ("boosted", float(np.float32(ast["w"])), node)
    return node


def _bool_tree(ast: dict, dict_like, field: str, index_field: str,
               counter: _Counter):
    """makeLuceneQueryField (boolean context)."""
    return _apply_weight(
        ast, _bool_tree_noboost(ast, dict_like, field, index_field, counter))


def _bool_tree_noboost(ast, dict_like, field, index_field, counter):
    k = ast["k"]
    if k in ("term", "prefix", "trunc"):
        terms = _expand_simple(ast, dict_like, field, index_field)
        for _t in terms:
            counter.tick()
        if not terms:
            return _NOMATCH
        if len(terms) == 1:
            return ("term", terms[0])
        return ("bool", tuple(("", ("term", t)) for t in terms))
    if k == "fields":
        # FieldsQuery.makeLuceneQueryNoBoost: single field swaps the
        # field; several OR the per-field clones (infix OrQuery)
        names = ast["fields"]
        if len(names) == 1:
            return _bool_tree_noboost(ast["sub"], dict_like, names[0],
                                      index_field, counter)
        return ("bool", tuple(
            ("", _bool_tree(ast["sub"], dict_like, f, index_field, counter))
            for f in names))
    if k == "and":
        return ("bool", tuple(
            ("+", _bool_tree(s, dict_like, field, index_field, counter))
            for s in ast["subs"]))
    if k == "or":
        return ("bool", tuple(
            ("", _bool_tree(s, dict_like, field, index_field, counter))
            for s in ast["subs"]))
    if k == "not":
        subs = ast["subs"]
        first = _bool_tree(subs[0], dict_like, field, index_field, counter)
        rest = tuple(
            ("-", _bool_tree(s, dict_like, field, index_field, counter))
            for s in subs[1:])
        return ("bool", (("+", first),) + rest)
    # distance operator
    snode = _near_snode(ast, dict_like, field, index_field, counter)
    if snode is None:
        return _NOMATCH
    return ("gspan", snode)


def _near_snode(ast, dict_like, field, index_field, counter):
    """DistanceQuery.getSpanNearQuery: one SpanNearClauseFactory per
    subquery; empty factory -> MatchNoDocs (None) after still visiting
    the remaining subqueries for their basic-query ticks."""
    clauses = []
    subs = ast["subs"]
    for i, sub in enumerate(subs):
        entries: list = []
        _collect_spans(sub, entries, dict_like, field, index_field, counter)
        if not entries:
            for rest in subs[i + 1:]:
                scratch: list = []
                _collect_spans(rest, scratch, dict_like, field, index_field,
                               counter)
            return None
        if len(entries) == 1:
            clauses.append(entries[0])
        else:
            clauses.append(("or", tuple(entries)))
    return ("near", tuple(clauses), ast["dist"] - 1, bool(ast["ordered"]))


def _collect_spans(ast, entries: list, dict_like, field, index_field,
                   counter) -> None:
    """addSpanQueries into one factory. Duplicate span queries merge
    (the factory's HashMap keys — their weights accumulate into a
    score-inert SpanBoostQuery, dropped here)."""
    k = ast["k"]
    if k in ("term", "prefix", "trunc"):
        for t in _expand_simple(ast, dict_like, field, index_field):
            counter.tick()
            leaf = ("t", t)
            if leaf not in entries:
                entries.append(leaf)
    elif k == "or":
        for m in ast["subs"]:
            _collect_spans(m, entries, dict_like, field, index_field, counter)
    elif k == "near":
        snode = _near_snode(ast, dict_like, field, index_field, counter)
        # an empty nested near is MatchNoDocsQuery — skipped by
        # SpanNearClauseFactory.addSpanQuery
        if snode is not None and snode not in entries:
            entries.append(snode)
    else:  # pragma: no cover — rejected at parse time
        raise SurroundParseError(f"subquery not allowed in distance op: {k}")
