"""The FLEXIBLE query parser (lucene/queryparser flexible/standard —
StandardQueryParser) as a query-string -> tree front end for the shared
tree evaluator (search/simpleqp.py), pinned bit-for-bit against the
compiled reference in tests/test_lucene_ground_truth.py (ground-truth
round 32).

Grammar (StandardSyntaxParser.jj:180-260):
    Query     ::= DisjQuery ( DisjQuery )*        -> BooleanQueryNode
    DisjQuery ::= ConjQuery ( OR ConjQuery )*     -> OrQueryNode
    ConjQuery ::= ModClause ( AND ModClause )*    -> AndQueryNode
    ModClause ::= [ + | - | NOT ] Clause
    Clause    ::= Term | '(' Query ')' [^boost -> BoostQueryNode,
                                        then GroupQueryNode]
    Term      ::= TERM [~fms] [^boost [~fms]]     (fuzzy either side)
                | REGEXPTERM /re/ [~fms] [^boost]
                | [a TO b] / {a TO b} [^boost]    ('*' bound = open)
                | "quoted" [~slop] [^boost]
A single pure-negation clause is re-wrapped in a BooleanQueryNode
(Query :203-210); a bare top-level '+' modifier is meaningless outside
a boolean context (ModifierQueryNodeBuilder returns the child).

The processor pipeline's observable semantics
(StandardQueryNodeProcessorPipeline.java):
  - BooleanQuery2ModifierNodeProcessor: precedence is DELIBERATELY
    dropped — any Or/And/BooleanQueryNode whose parent is also one is
    flattened into the parent, and every direct non-modified child of
    an AndQueryNode becomes MUST ("A AND B OR C AND D" == "+A +B +C
    +D"); paren groups block flattening (GroupQueryNode is not a
    BooleanQueryNode).
  - fuzzy: numEdits = FuzzyQuery.floatToEdits(similarity, codepoints)
    (FuzzyQuery.java:230-239 — >=1 is an edit count capped at 2,
    fractions are a minimum similarity: (int)((1-sim)*len) capped at
    2); default similarity = FuzzyQuery.defaultMinSimilarity = 2.
  - wildcard/range/regexp rewrite CONSTANT_SCORE
    (MultiTermRewriteMethodProcessor + the config default); fuzzy keeps
    FuzzyQuery's TopTermsBlendedFreqScoringRewrite(50) — both already
    in the shared resolve_tree.
  - '*:*' -> MatchAllDocsQuery (MatchAllDocsQueryNodeProcessor).
"""

from __future__ import annotations

import re

import numpy as np

#: lexer over the StandardSyntaxParser token set (fielded terms, escape
#: sequences and comparison operators are out of scope — ParseError)
_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<and>AND\b|&&) | (?P<or>OR\b|\|\|) | (?P<not>NOT\b|!)
  | (?P<plus>\+) | (?P<minus>-)
  | (?P<lparen>\() | (?P<rparen>\))
  | (?P<carat>\^(?P<boost>\d+(?:\.\d+)?))
  | (?P<fslop>~(?P<fnum>\d+(?:\.\d+)?)?)
  | (?P<quoted>"(?P<qtext>[^"]*)")
  | (?P<regexp>/(?P<rtext>(?:\\/|[^/])*)/)
  | (?P<range>(?P<lb>[\[{])\s*(?P<lo>[^\s\]}]+)\s+TO\s+(?P<hi>[^\s\]}]+)\s*
      (?P<rb>[\]}]))
  | (?P<matchall>\*:\*)
  | (?P<term>[^\s^~()\[\]{}"/+\-!][^\s^~()\[\]{}"/]*)
    """,
    re.VERBOSE,
)


class FlexibleParseError(ValueError):
    pass


def _lex(query: str):
    out = []
    i = 0
    n = len(query)
    while i < n:
        m = _TOKEN.match(query, i)
        if m is None:
            raise FlexibleParseError(f"cannot lex at {query[i:]!r}")
        i = m.end()
        if m.group("ws"):
            continue
        out.append(m)
    return out


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def kind(self):
        m = self.peek()
        if m is None:
            return None
        for k in ("and", "or", "not", "plus", "minus", "lparen", "rparen",
                  "carat", "fslop", "quoted", "regexp", "range", "matchall",
                  "term"):
            if m.group(k):
                return k
        return None

    def take(self):
        m = self.peek()
        self.i += 1
        return m


#: FuzzyQuery.defaultMinSimilarity (grammar's default when '~' is bare)
_DEFAULT_MIN_SIM = 2.0
_MAX_EDITS = 2  # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE


def _float_to_edits(fms: float, term_len: int) -> int:
    if fms >= 1.0:
        return int(min(fms, _MAX_EDITS))
    if fms == 0.0:
        return 0
    return min(int((1.0 - fms) * term_len), _MAX_EDITS)


def parse_flexible(query: str, analyze_fn, default_operator: str = "or"):
    """StandardQueryParser.parse(query, default_field) -> the shared
    tree-evaluator node vocabulary (resolve with resolve_tree before
    eval). Returns None for a query that builds no clauses.
    default_operator='and' sets ConfigurationKeys.DEFAULT_OPERATOR =
    Operator.AND: BooleanQuery2ModifierNodeProcessor then promotes
    every unmodified child of a PLAIN BooleanQueryNode (not Or/And) to
    MUST (GT round 38)."""
    using_and = default_operator.lower() == "and"
    p = _P(_lex(query))
    tree = _query(p, analyze_fn, using_and=using_and)
    if p.peek() is not None:
        raise FlexibleParseError(f"garbage after query: {p.peek().group(0)!r}")
    return tree


def _query(p: _P, analyze_fn, depth: int = 0, using_and: bool = False):
    clauses = []
    while True:
        k = p.kind()
        if k is None or k == "rparen":
            break
        c = _disj_query(p, analyze_fn, depth, using_and)
        if c is not None:
            clauses.append(c)
    if not clauses:
        return None
    if len(clauses) == 1:
        first = clauses[0]
        # a single pure-negation clause keeps its boolean wrapper
        # (Query :203-210); a bare REQ modifier builds as its child
        if first[0] == "mod" and first[1] == "-":
            return _b2m(("bq", [first]), using_and)
        return _b2m(first, using_and)
    return _b2m(("bq", clauses), using_and)


def _disj_query(p: _P, analyze_fn, depth: int, using_and: bool = False):
    clauses = [_conj_query(p, analyze_fn, depth, using_and)]
    while p.kind() == "or":
        p.take()
        clauses.append(_conj_query(p, analyze_fn, depth, using_and))
    clauses = [c for c in clauses if c is not None]
    if not clauses:
        return None
    return clauses[0] if len(clauses) == 1 else ("or", clauses)


def _conj_query(p: _P, analyze_fn, depth: int, using_and: bool = False):
    clauses = [_mod_clause(p, analyze_fn, depth, using_and)]
    while p.kind() == "and":
        p.take()
        clauses.append(_mod_clause(p, analyze_fn, depth, using_and))
    clauses = [c for c in clauses if c is not None]
    if not clauses:
        return None
    return clauses[0] if len(clauses) == 1 else ("and", clauses)


def _mod_clause(p: _P, analyze_fn, depth: int, using_and: bool = False):
    k = p.kind()
    mod = ""
    if k == "plus":
        p.take()
        mod = "+"
    elif k in ("minus", "not"):
        p.take()
        mod = "-"
    c = _clause(p, analyze_fn, depth, using_and)
    if c is None:
        return None
    return ("mod", mod, c) if mod else c


def _clause(p: _P, analyze_fn, depth: int, using_and: bool = False):
    k = p.kind()
    if k is None:
        raise FlexibleParseError("unexpected end of query")
    if k == "lparen":
        p.take()
        q = _query(p, analyze_fn, depth + 1, using_and)
        if p.kind() != "rparen":
            raise FlexibleParseError("unbalanced '('")
        p.take()
        boost = None
        if p.kind() == "carat":
            boost = float(p.take().group("boost"))
        if q is None:
            return None
        if boost is not None:
            q = ("boosted", np.float32(boost), q)
        # GroupQueryNode wraps — transparent at build time, but it
        # blocks the boolean flatten (handled by _b2m's group marker)
        return ("group", q)
    return _term(p, analyze_fn)


def _term(p: _P, analyze_fn):
    k = p.kind()
    if k == "matchall":
        p.take()
        return ("matchall",)
    if k == "range":
        m = p.take()
        lo = None if m.group("lo") == "*" else m.group("lo")
        hi = None if m.group("hi") == "*" else m.group("hi")
        node = ("term_range", (lo, hi, m.group("lb") == "[",
                               m.group("rb") == "]"))
        return _opt_boost(p, node)
    if k == "quoted":
        text = p.take().group("qtext")
        slop = 0
        if p.kind() == "fslop":
            fm = p.take()
            if fm.group("fnum"):
                slop = int(float(fm.group("fnum")))
        node = _phrase_node(text, slop, analyze_fn)
        return _opt_boost(p, node)
    if k == "regexp":
        rtext = p.take().group("rtext").replace("\\/", "/")
        node: tuple | None = ("regexp", rtext)
        fuzzy = False
        if p.kind() == "fslop":
            p.take()
            fuzzy = True  # grammar allows it; fuzzy wins over regexp? No —
            # the production sets fuzzy=true and builds a FuzzyQueryNode
            # from the RAW token image only for TERM/NUMBER; for
            # REGEXPTERM+fslop the `fuzzy` branch fires FIRST in the
            # semantic action, fuzzying the literal "/re/" text
        if fuzzy:
            raise FlexibleParseError("fuzzy regexp is out of scope")
        return _opt_boost(p, node)
    if k == "term":
        text = p.take().group("term")
        fms = None
        if p.kind() == "fslop":
            fm = p.take()
            fms = float(fm.group("fnum")) if fm.group("fnum") else _DEFAULT_MIN_SIM
        boost = None
        if p.kind() == "carat":
            boost = float(p.take().group("boost"))
            if p.kind() == "fslop":
                fm = p.take()
                fms = (
                    float(fm.group("fnum")) if fm.group("fnum")
                    else _DEFAULT_MIN_SIM
                )
        if fms is not None:
            if fms < 0.0 or (fms >= 1.0 and fms != int(fms)):
                raise FlexibleParseError(f"invalid fuzzy slop {fms}")
            ed = _float_to_edits(fms, len(text))
            node = ("fuzzy", text, ed)
        elif "*" in text or "?" in text:
            # AllowLeadingWildcardProcessor: allowLeadingWildcard defaults
            # to false — a leading '*' or '?' throws (except "*:*",
            # already handled as MatchAllDocs)
            if text[0] in "*?":
                raise FlexibleParseError(f"leading wildcard: {text!r}")
            node = ("wildcard", text)
        else:
            toks = analyze_fn(text)
            if not toks:
                return None
            node = ("term", toks[0][0])
        if boost is not None:
            node = ("boosted", np.float32(boost), node)
        return node
    raise FlexibleParseError(f"unexpected token {p.peek().group(0)!r}")


def _opt_boost(p: _P, node):
    if node is not None and p.kind() == "carat":
        return ("boosted", np.float32(float(p.take().group("boost"))), node)
    return node


def _phrase_node(text: str, slop: int, analyze_fn):
    toks = analyze_fn(text)
    if not toks:
        return None
    base = toks[0][1]
    pairs = tuple((t, pos - base) for t, pos in toks)
    if len(pairs) == 1:
        # single-token quoted text builds a TermQuery
        # (AnalyzerQueryNodeProcessor emits a FieldQueryNode)
        return ("term", pairs[0][0])
    return ("phrase", pairs, slop)


# ---------------------------------------------------------------------------
# BooleanQuery2ModifierNodeProcessor: flatten + AND-child promotion


def _is_boolish(node) -> bool:
    return node is not None and node[0] in ("or", "and", "bq")


def _b2m(node, using_and: bool = False):
    """Apply the flatten + modifier semantics bottom-up and map to the
    eval-tree vocabulary. Group wrappers become transparent AFTER
    blocking the flatten; single-child booleans collapse
    (BooleanSingleChildOptimizationQueryNodeProcessor) unless the child
    is a modifier."""
    if node is None:
        return None
    kind = node[0]
    if kind == "group":
        return _b2m(node[1], using_and)
    if kind == "boosted":
        return ("boosted", node[1], _b2m(node[2], using_and))
    if kind == "mod":
        # a modifier OUTSIDE a boolean context builds its child
        return _b2m(node[2], using_and)
    if not _is_boolish(node):
        return node
    # boolean root: collect children through nested booleans
    clauses: list[tuple[str, tuple]] = []

    def collect(n, parent_kind):
        for child in n[1]:
            if child is None:
                continue
            if _is_boolish(child):
                collect(child, child[0])  # TAG_REMOVE: flatten
                continue
            occ = ""
            sub = child
            if child[0] == "mod":
                occ = child[1]
                sub = child[2]
            if occ == "" and (
                parent_kind == "and" or (using_and and parent_kind == "bq")
            ):
                occ = "+"
            mapped = _b2m(sub, using_and)
            if mapped is not None:
                clauses.append((occ, mapped))

    collect(node, kind)
    if not clauses:
        return None
    if len(clauses) == 1 and clauses[0][0] == "":
        return clauses[0][1]
    return ("bool", tuple(clauses))
