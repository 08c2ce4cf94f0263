"""TermAutomatonQuery.finish() analog: ANY expansion + determinization.

The reference (sandbox/search/TermAutomatonQuery.java:120-185) does NOT
run the user's automaton directly: finish() first rewrites every ANY
transition to match ALL term symbols (min=0..termCount-1 — including the
ANY symbol itself and every real query term), then determinizes. The
scorer (TermAutomatonScorer.countMatches:226-345) walks the DETERMINIZED
automaton, stepping held states BOTH on the current token's term symbol
(counting accepts) and — separately, via the ANY-advance loop — on the
ANY symbol (never counting accepts). Because the expansion gives an ANY
arc an explicit term arc for every symbol, a query-term token under an
ANY arc fires twice: once as a scoring term step and once as a
non-scoring ANY step, each adding its own copy to the next position's
multiset (PosState.add never dedups). Reproducing that requires walking
the same expanded DFA — this module builds it.

Validation mirrors finish(): an automaton may not lead with an ANY
transition out of the start state, nor end with an ANY transition into
an accept state (TermAutomatonQuery.java:133-151).
"""

from __future__ import annotations

_ANY = ""  # ANY arc label convention shared with BooleanSpec.term_automaton


def expand_determinize(
    transitions, accepts
) -> tuple[tuple[tuple[int, str, int], ...], tuple[int, ...]]:
    """Expand ANY arcs to every symbol and subset-construct the DFA.

    Input/output share one shape: transitions = ((from, label, to), ...)
    with label '' as the ANY arc and state 0 the start state; accepts =
    accept state ids. Output state ids are dense, 0 = start subset.
    """
    transitions = tuple((int(f), str(l), int(t)) for f, l, t in transitions)
    acc_in = set(int(a) for a in accepts)
    labels = sorted({lab for _f, lab, _t in transitions if lab})
    has_any = any(lab == _ANY for _f, lab, _t in transitions)

    # finish()'s leading/trailing ANY validation
    for f, lab, t in transitions:
        if lab == _ANY and f == 0:
            raise ValueError("automaton cannot lead with an ANY transition")
        if lab == _ANY and t in acc_in:
            raise ValueError("automaton cannot end with an ANY transition")

    # NFA arcs after ANY expansion: symbol alphabet = labels + ANY; an
    # ANY arc matches every symbol (TermAutomatonQuery.java:155-177)
    symbols = list(labels) + ([_ANY] if has_any else [])
    nfa: dict[tuple[int, str], set[int]] = {}
    for f, lab, t in transitions:
        syms = symbols if lab == _ANY else [lab]
        for s in syms:
            nfa.setdefault((f, s), set()).add(t)

    # subset construction (Operations.determinize analog; dead-state
    # removal is implicit — only reachable subsets are emitted)
    start = frozenset({0})
    ids: dict[frozenset, int] = {start: 0}
    order = [start]
    dfa_arcs: list[tuple[int, str, int]] = []
    dfa_acc: set[int] = set()
    if acc_in & start:
        dfa_acc.add(0)
    qi = 0
    while qi < len(order):
        cur = order[qi]
        cid = ids[cur]
        qi += 1
        for sym in symbols:
            tgt = set()
            for st in cur:
                tgt |= nfa.get((st, sym), set())
            if not tgt:
                continue
            key = frozenset(tgt)
            if key not in ids:
                ids[key] = len(order)
                order.append(key)
                if acc_in & key:
                    dfa_acc.add(ids[key])
            dfa_arcs.append((cid, sym, ids[key]))
    return tuple(dfa_arcs), tuple(sorted(dfa_acc))
