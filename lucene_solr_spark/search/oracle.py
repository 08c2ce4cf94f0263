"""Pure-Python/numpy Lucene-faithful control oracle.

Plays the role of the single-node "control" in the reference's
distributed-vs-control test pattern
(solr/test-framework/.../BaseDistributedSearchTestCase.java:91,223,328):
index the same corpus with plain Python, score with the same bit-exact
float32 BM25, and assert the Spark engine's top-k is rank- and
score-identical.

Tie-breaks: score DESC, then docID ASC (TopScoreDocCollector.java:63-80,
HitQueue.java:76-81; cross-partition merge order TopDocs.java:199-243 reduces
to docID ASC because our docIDs are globally dense and partition-ordered).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..analysis.smallfloat import encode_norm
from ..analysis.tokenizer import analyze, analyze_to_counts, analyze_with_positions
from .bm25 import K1, avgdl_f32, combine_scores, idf_f32, idf_sum_f32, make_term_weight


@dataclass
class OracleIndex:
    doc_count: int = 0
    sum_ttf: int = 0
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {doc: tf}
    positions: dict[str, dict[int, list[int]]] = field(default_factory=dict)
    norm_bytes: dict[int, int] = field(default_factory=dict)  # doc -> norm byte
    field_len: dict[int, int] = field(default_factory=dict)

    @property
    def avgdl(self) -> np.float32:
        return avgdl_f32(self.sum_ttf, self.doc_count)


def build_oracle_index(docs: list[tuple[int, str]], norm: str = "bm25") -> OracleIndex:
    """docs: [(doc_id, content)] with deterministic, dense-ish doc_ids.
    `norm` picks the index-time norm encoder (setSimilarity's computeNorm
    half): 'bm25' 1/sqrt(len) or 'sweetspot' plateau lengthNorm."""
    from ..analysis.smallfloat import NORM_ENCODERS

    encoder = NORM_ENCODERS[norm]
    idx = OracleIndex()
    for doc_id, content in docs:
        pos_map, flen = analyze_with_positions(content or "")
        idx.doc_count += 1
        idx.sum_ttf += flen
        idx.field_len[doc_id] = flen
        idx.norm_bytes[doc_id] = int(encoder(np.array([flen]))[0])
        for term, plist in pos_map.items():
            idx.postings.setdefault(term, {})[doc_id] = len(plist)
            idx.positions.setdefault(term, {})[doc_id] = plist
    return idx


def oracle_topk(
    idx: OracleIndex,
    query: str,
    k: int = 10,
    mode: str = "or",
) -> list[tuple[int, np.float32]]:
    """Top-k (doc_id, float32 score), Lucene BooleanQuery SHOULD ('or') or
    MUST ('and') over the analyzed query terms. Duplicate query terms score
    as duplicate clauses (Lucene keeps duplicate SHOULD clauses)."""
    terms = analyze(query)
    if not terms:
        return []
    weights = {
        t: make_term_weight(t, len(idx.postings.get(t, {})), idx.doc_count, idx.avgdl)
        for t in set(terms)
    }
    # candidate docs
    doc_sets = [set(idx.postings.get(t, {})) for t in set(terms)]
    if mode == "and":
        cand = set.intersection(*doc_sets) if doc_sets else set()
    else:
        cand = set.union(*doc_sets) if doc_sets else set()
    if not cand:
        return []
    docs = np.array(sorted(cand), dtype=np.int64)
    norm = np.array([idx.norm_bytes[d] for d in docs], dtype=np.uint8)
    per_term = []
    for t in terms:  # duplicates = duplicate clauses
        post = idx.postings.get(t, {})
        tf = np.array([post.get(int(d), 0) for d in docs], dtype=np.float32)
        s = weights[t].score(tf, norm)
        s[tf == 0] = np.float32(0.0)
        per_term.append(s)
    scores = combine_scores(per_term)
    order = np.lexsort((docs, -scores.astype(np.float64)))
    top = order[:k]
    return [(int(docs[i]), np.float32(scores[i])) for i in top]


def oracle_lm_topk(
    idx: OracleIndex,
    query: str,
    similarity: str,
    k: int = 10,
) -> list[tuple[int, np.float32]]:
    """Control for the SimilarityBase models (LMDirichletSimilarity /
    LMJelinekMercerSimilarity / DFR InL2 / IB LL / DFI ×3 independence
    measures): SHOULD-sum over analyzed clauses, each clause scored by
    the model's formula over (tf, norm byte, collection stats)."""
    from .bm25 import (
        DFR_IB_SCORERS,
        collection_probability_f32,
        dfi_scores,
        lm_dirichlet_scores,
        lm_jelinek_mercer_scores,
        simbase_avgdl_f32,
    )

    terms = analyze(query)
    if not terms:
        return []
    cand = set.union(*[set(idx.postings.get(t, {})) for t in set(terms)])
    if not cand:
        return []
    docs = np.array(sorted(cand), dtype=np.int64)
    norm = np.array([idx.norm_bytes[d] for d in docs], dtype=np.uint8)
    av32 = simbase_avgdl_f32(idx.sum_ttf, idx.doc_count)
    per_term = []
    for t in terms:  # duplicates = duplicate clauses
        post = idx.postings.get(t, {})
        tf = np.array([post.get(int(d), 0) for d in docs], dtype=np.float32)
        if similarity in DFR_IB_SCORERS:
            fn, mode = DFR_IB_SCORERS[similarity]
            if mode == "ttf":
                s = fn(tf, norm, len(post), sum(post.values()),
                       idx.doc_count, av32)
            elif mode == "ttf_sum":
                s = fn(tf, norm, len(post), sum(post.values()),
                       idx.sum_ttf, idx.doc_count, av32)
            else:
                s = fn(tf, norm, len(post), idx.doc_count, av32)
        elif similarity == "multi_bm25_classic":
            # MultiSimilarity CombSUM: float32 running sum of BM25 and
            # Classic(queryNorm=1) sub-scores, BM25 norms (sims[0])
            from .bm25 import CLASSIC_DECODE, classic_weight_value, norm_cache

            tw = make_term_weight(t, len(post), idx.doc_count, idx.avgdl)
            cache = norm_cache(np.float32(idx.avgdl))
            s1 = (
                np.float32(tw.weight_value) * tf / (tf + cache[norm])
            ).astype(np.float32)
            cwv = classic_weight_value(
                len(post), idx.doc_count, query_norm=1.0
            )
            s2 = (np.sqrt(tf) * cwv * CLASSIC_DECODE[norm]).astype(np.float32)
            s = (s1 + s2).astype(np.float32)
        elif similarity.startswith("dfi_"):
            s = dfi_scores(
                tf, norm, sum(post.values()), idx.sum_ttf,
                measure=similarity[len("dfi_"):],
            )
        else:
            lm_fn = (
                lm_dirichlet_scores
                if similarity == "lm_dirichlet"
                else lm_jelinek_mercer_scores
            )
            ttf = sum(post.values())
            p = collection_probability_f32(ttf, idx.sum_ttf)
            s = lm_fn(tf, norm, p)
        s[tf == 0] = np.float32(0.0)
        per_term.append(s)
    scores = combine_scores(per_term)
    order = np.lexsort((docs, -scores.astype(np.float64)))
    top = order[:k]
    return [(int(docs[i]), np.float32(scores[i])) for i in top]


def oracle_sweetspot_topk(
    idx: OracleIndex, query: str, k: int = 10
) -> list[tuple[int, np.float32]]:
    """Control for SweetSpotSimilarity (lucene/misc/SweetSpotSimilarity.java):
    ClassicSimilarity scoring — queryNorm * boost * idf^2 weights, coord —
    with baselineTf in place of sqrt(tf) and norm bytes that were WRITTEN
    by the sweetspot plateau lengthNorm (build_oracle_index(norm=
    'sweetspot')); duplicate query terms = duplicate clauses."""
    from .bm25 import (
        CLASSIC_DECODE,
        classic_idf_f32,
        classic_query_norm,
        classic_weight_value,
        sweetspot_baseline_tf,
    )

    terms = analyze(query)
    if not terms:
        return []
    cand = set.union(*[set(idx.postings.get(t, {})) for t in set(terms)])
    if not cand:
        return []
    docs = np.array(sorted(cand), dtype=np.int64)
    nb = np.array([idx.norm_bytes[d] for d in docs], dtype=np.uint8)
    qn = classic_query_norm(
        (classic_idf_f32(len(idx.postings.get(t, {})), idx.doc_count), 1.0)
        for t in terms
    )
    per_clause = []
    overlap = np.zeros(docs.size, dtype=np.int32)
    for t in terms:
        post = idx.postings.get(t, {})
        tf = np.array([post.get(int(d), 0) for d in docs], dtype=np.float32)
        wv = classic_weight_value(
            len(post), idx.doc_count, query_norm=float(qn)
        )
        s = (sweetspot_baseline_tf(tf) * wv * CLASSIC_DECODE[nb]).astype(np.float32)
        s[tf == 0] = np.float32(0.0)
        overlap += (tf > 0).astype(np.int32)
        per_clause.append(s)
    scores = combine_scores(per_clause)
    if len(terms) > 1:
        coords = (
            np.arange(len(terms) + 1, dtype=np.float32) / np.float32(len(terms))
        ).astype(np.float32)
        scores = (scores * coords[overlap]).astype(np.float32)
    order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
    return [(int(docs[i]), np.float32(scores[i])) for i in order]


def _automaton_path_freq(occ_map: dict[int, str], dfa_trans, dfa_accepts) -> int:
    """Independent TermAutomatonScorer.countMatches reference (sandbox/
    search/TermAutomatonScorer.java:226-345) by path enumeration over the
    DETERMINIZED automaton: every held state steps BOTH on the current
    token's term symbol (counting accepts) and on the ANY symbol (never
    counting — and never past the doc's last query token); each route is
    its own path because PosState.add never dedups. Structurally
    different from the engine's forward multiset walk."""
    qpos = sorted(occ_map)
    if not qpos:
        return 0
    max_qpos = qpos[-1]
    acc = set(dfa_accepts)
    dstep: dict[tuple[int, str], int] = {}
    astep: dict[int, int] = {}
    for f, lab, t in dfa_trans:
        if lab == "":
            astep[f] = t
        else:
            dstep[(f, lab)] = t
    hits = 0

    def dfs(state: int, pos: int) -> None:
        nonlocal hits
        if pos > max_qpos:
            return
        t = occ_map.get(pos)
        if t is not None:
            nxt = dstep.get((state, t))
            if nxt is not None:
                if nxt in acc:
                    hits += 1
                dfs(nxt, pos + 1)
        if pos < max_qpos:
            nxt = astep.get(state)
            if nxt is not None:
                dfs(nxt, pos + 1)

    for p in qpos:
        st = dstep.get((0, occ_map[p]))
        if st is not None:
            if st in acc:
                hits += 1
            dfs(st, p + 1)
    return hits


def oracle_term_automaton_topk(
    idx: OracleIndex, transitions, accepts, k: int = 10
) -> list[tuple[int, np.float32]]:
    """Control for TermAutomatonQuery (sandbox/search/TermAutomatonQuery
    .java): candidates are docs holding ANY automaton term (the scorer's
    DocIDQueue union), freq = countMatches via independent path
    enumeration over the finish()-determinized automaton, weight = BM25
    with idf summed float32 over every term label's stats
    (TermAutomatonWeight gathers TermContext per term; absent terms
    contribute idf(df=0))."""
    from .automaton import expand_determinize
    from .bm25 import norm_cache

    dfa_trans, dfa_accepts = expand_determinize(transitions, accepts)
    labels = sorted({lab for _f, lab, _t in transitions if lab})
    cand: set[int] = set()
    for t in labels:
        cand |= set(idx.postings.get(t, {}))
    if not cand:
        return []
    idf_sum = idf_sum_f32(
        idf_f32(len(idx.postings.get(t, {})), idx.doc_count) for t in labels
    )
    wv = np.float32(idf_sum * (K1 + np.float32(1.0)))
    cache = norm_cache(idx.avgdl)
    scored: list[tuple[int, np.float32]] = []
    for d in sorted(cand):
        occ_map: dict[int, str] = {}
        for t in labels:
            for p in idx.positions.get(t, {}).get(d, []):
                occ_map[p] = t
        f = _automaton_path_freq(occ_map, dfa_trans, dfa_accepts)
        if f <= 0:
            continue
        pf = np.float32(f)
        s = np.float32(wv * pf / (pf + cache[idx.norm_bytes[d]]))
        scored.append((d, s))
    scored.sort(key=lambda x: (-float(x[1]), x[0]))
    return scored[:k]


def oracle_topk_spec(idx: OracleIndex, spec, k: int = 10) -> list[tuple[int, np.float32]]:
    """Control for BooleanSpec queries (engine.BooleanSpec): MUST/SHOULD/
    MUST_NOT/minShouldMatch, DisjunctionMax, exact/sloppy PhraseQuery,
    MultiPhraseQuery, SpanNear (ordered/unordered), SpanFirst."""
    should = [t for t in spec.should if t in idx.postings]
    must = list(spec.must)
    # 0..N PhraseQuery clauses [(pairs, slop, occur, boost)]
    phrase_clauses = [tuple(pc) for pc in (getattr(spec, "phrase_clauses", ()) or ())]
    groups = [
        (occ, tuple(t for t in ts if t in idx.postings))
        for occ, ts in (getattr(spec, "groups", ()) or ())
    ]
    if any(occ == "+" and not ts for occ, ts in groups):
        return []
    groups = [(occ, ts) for occ, ts in groups if ts]
    # constant-score clauses (MultiTermQueryConstantScoreWrapper) and
    # blended-weight groups (FuzzyQuery's TopTermsBlendedFreqScoring
    # Rewrite) — same shapes as engine.BooleanSpec
    const_clauses = [
        (occ, np.float32(b), tuple(t for t in ts if t in idx.postings))
        for occ, b, ts in (getattr(spec, "const_clauses", ()) or ())
    ]
    if any(occ == "+" and not ts for occ, _b, ts in const_clauses):
        return []
    const_clauses = [(o, b, ts) for o, b, ts in const_clauses if ts]
    weighted_groups = [
        (occ, tuple((t, np.float32(wv)) for t, wv in ms if t in idx.postings))
        for occ, ms in (getattr(spec, "weighted_groups", ()) or ())
    ]
    if any(occ == "+" and not ms for occ, ms in weighted_groups):
        return []
    weighted_groups = [(o, ms) for o, ms in weighted_groups if ms]
    # mixed groups (typed members: scored term / const wrapper / blended)
    mixed_groups = []
    mx_dead_plus = False
    for occ, members in (getattr(spec, "mixed_groups", ()) or ()):
        live = []
        for m in members:
            if m[0] == "t":
                if m[1] in idx.postings:
                    live.append(m)
            elif m[0] == "c":
                ts = tuple(t for t in m[2] if t in idx.postings)
                if ts:
                    live.append(("c", np.float32(m[1]), ts))
            else:
                ws = tuple((t, np.float32(wv)) for t, wv in m[1] if t in idx.postings)
                if ws:
                    live.append(("w", ws))
        if occ == "+" and not live:
            mx_dead_plus = True
        if live:
            mixed_groups.append((occ, tuple(live)))
    if mx_dead_plus:
        return []

    def _mx_terms(members):
        out = []
        for m in members:
            if m[0] == "t":
                out.append(m[1])
            elif m[0] == "c":
                out.extend(m[2])
            else:
                out.extend(t for t, _wv in m[1])
        return out
    all_phrase_terms = {t for pairs, _s, _o, _b in phrase_clauses for t, _ in pairs}
    req_pc_terms = {
        t for pairs, _s, occ, _b in phrase_clauses if occ == "+" for t, _ in pairs
    }
    opt_pc = [pc for pc in phrase_clauses if pc[2] == ""]
    multi_phrase = list(getattr(spec, "multi_phrase", ()) or ())
    raw_span = tuple(getattr(spec, "span", ()) or ())
    # span clauses may be alternative TUPLES (SpanOr of term spans —
    # ComplexPhraseQueryParser elements); normalize for the walks
    span_clauses = tuple(
        (c,) if isinstance(c, str) else tuple(c) for c in raw_span
    )
    span = tuple(t for c in span_clauses for t in c)
    span_first = getattr(spec, "span_first", None)
    positional = bool(phrase_clauses or multi_phrase or span or span_first)
    required = sorted(set(must)
                      | req_pc_terms
                      | {c[0] for c in span_clauses if len(c) == 1}
                      | ({span_first[0]} if span_first else set()))
    if any(t not in idx.postings for t in required):
        return []
    if any(all(t not in idx.postings for t in alts) for _off, alts in multi_phrase):
        return []
    # a SpanOr clause needs >= 1 live alternative
    if any(all(t not in idx.postings for t in c) for c in span_clauses):
        return []
    pos_terms = all_phrase_terms | set(span) | (
        {span_first[0]} if span_first else set()
    ) | {t for _off, alts in multi_phrase for t in alts}
    group_terms = {t for _occ, ts in groups for t in ts}
    group_terms |= {
        m[1] for _occ, ms in mixed_groups for m in ms if m[0] == "t"
    }
    boost_map = dict(getattr(spec, "boosts", ()) or ())
    weights = {
        t: make_term_weight(
            t, len(idx.postings.get(t, {})), idx.doc_count, idx.avgdl,
            boost=float(boost_map.get(t, 1.0)),
        )
        for t in set(should) | set(must) | pos_terms | group_terms
    }

    def _gdocs(ts):
        return set.union(*[set(idx.postings.get(t, {})) for t in ts]) if ts else set()

    # candidates
    pos_group_docs = [_gdocs(ts) for occ, ts in groups if occ != "-"]
    pos_group_docs += [
        _gdocs(ts) for occ, _b, ts in const_clauses if occ != "-"
    ]
    pos_group_docs += [
        _gdocs([t for t, _wv in ms]) for occ, ms in weighted_groups if occ != "-"
    ]
    pos_group_docs += [
        _gdocs(_mx_terms(ms)) for occ, ms in mixed_groups if occ != "-"
    ]
    alt_span = [c for c in span_clauses if len(c) > 1]
    if required:
        cand = set.intersection(*[set(idx.postings[t]) for t in required])
    elif alt_span:
        cand = set.intersection(*[
            set.union(*[set(idx.postings.get(t, {})) for t in c])
            for c in alt_span
        ])
    elif multi_phrase:
        cand = set.intersection(*[
            set.union(*[set(idx.postings.get(t, {})) for t in alts])
            for _off, alts in multi_phrase
        ])
    else:
        cand = set()
        if should:
            cand |= set.union(*[set(idx.postings[t]) for t in set(should)])
        for gd in pos_group_docs:
            cand |= gd
        for pairs, _s, _occ, _b in opt_pc:
            pt = sorted({t for t, _ in pairs})
            if pt and all(t in idx.postings for t in pt):
                cand |= set.intersection(*[set(idx.postings[t]) for t in pt])
    if multi_phrase and required:
        for _off, alts in multi_phrase:
            cand &= set.union(*[set(idx.postings.get(t, {})) for t in alts])
    if alt_span and (required or multi_phrase):
        for c in alt_span:
            cand &= set.union(*[set(idx.postings.get(t, {})) for t in c])
    for occ, ts in groups:
        if occ == "+":
            cand &= _gdocs(ts)
        elif occ == "-":
            cand -= _gdocs(ts)
    for occ, _b, ts in const_clauses:
        if occ == "+":
            cand &= _gdocs(ts)
        elif occ == "-":
            cand -= _gdocs(ts)
    for occ, ms in weighted_groups:
        if occ == "+":
            cand &= _gdocs([t for t, _wv in ms])
        elif occ == "-":
            cand -= _gdocs([t for t, _wv in ms])
    for occ, ms in mixed_groups:
        if occ == "+":
            cand &= _gdocs(_mx_terms(ms))
        elif occ == "-":
            cand -= _gdocs(_mx_terms(ms))
    for t in set(spec.must_not):
        cand -= set(idx.postings.get(t, {}))
    n_plus_groups = (
        sum(1 for occ, _ts in groups if occ == "+")
        + sum(1 for occ, _b, _ts in const_clauses if occ == "+")
        + sum(1 for occ, _ms in weighted_groups if occ == "+")
        + sum(1 for occ, _ms in mixed_groups if occ == "+")
    )
    required_positional = (
        bool(multi_phrase or span or span_first) or bool(req_pc_terms)
    )
    msm = max(spec.min_should_match,
              0 if (required or required_positional or n_plus_groups) else 1)

    def _phrase_pf(pairs, slop, docs):
        """pf per doc for one PhraseQuery clause over `docs`."""
        pterms = sorted({t for t, _ in pairs})
        out: dict = {}
        if any(t not in idx.positions for t in pterms):
            return out
        if slop > 0:
            # Lucene-exact SloppyPhraseScorer semantics (search/sloppy.py)
            from .sloppy import sloppy_freq

            for d in sorted(docs):
                plists = [idx.positions[t].get(d, []) for t, _ in pairs]
                if any(not p for p in plists):
                    continue
                f = sloppy_freq(
                    plists, [off for _, off in pairs], slop,
                    terms=[t for t, _ in pairs],
                )
                if f > 0:
                    out[d] = f
        else:
            for d in sorted(docs):
                base_t, base_off = pairs[0]
                match = [p - base_off for p in idx.positions[base_t].get(d, [])]
                for t, off in pairs[1:]:
                    pset = {p - off for p in idx.positions[t].get(d, [])}
                    match = [p for p in match if p in pset]
                    if not match:
                        break
                if match:
                    out[d] = len(match)
        return out

    pc_maps = []
    if phrase_clauses:
        for pairs, slop, occ, _b in phrase_clauses:
            m = _phrase_pf(pairs, slop, cand)
            pc_maps.append(m)
            if occ == "+":
                cand = set(m)
    if multi_phrase:
        mp_slop = int(getattr(spec, "multi_phrase_slop", 0) or 0)
        pf_map = {}
        if mp_slop > 0:
            # SloppyPhraseScorer over per-position union postings,
            # incl. multi-term repeats (search/sloppy.py)
            from .sloppy import sloppy_freq

            term_sets = [tuple(alts) for _off, alts in multi_phrase]
            for d in sorted(cand):
                plists, offs = [], []
                ok = True
                for off, alts in multi_phrase:
                    merged = sorted(
                        p
                        for t in alts
                        for p in idx.positions.get(t, {}).get(d, [])
                    )
                    if not merged:
                        ok = False
                        break
                    plists.append(merged)
                    offs.append(off)
                if ok:
                    fq = sloppy_freq(plists, offs, mp_slop, terms=term_sets)
                    if fq > 0:
                        pf_map[d] = fq
        else:
            for d in sorted(cand):
                base_off = multi_phrase[0][0]
                match = {
                    p - base_off
                    for t in multi_phrase[0][1]
                    for p in idx.positions.get(t, {}).get(d, [])
                }
                for off, alts in multi_phrase[1:]:
                    pset = {
                        p - off for t in alts for p in idx.positions.get(t, {}).get(d, [])
                    }
                    match &= pset
                    if not match:
                        break
                if match:
                    pf_map[d] = len(match)
        cand = set(pf_map)
    elif span:
        from .spans import (
            span_containing_freq,
            span_not_freq,
            span_ordered_freq,
            span_unordered_freq,
            span_within_freq,
        )

        span_not = tuple(getattr(spec, "span_not", ()) or ())
        span_contain = tuple(getattr(spec, "span_contain", ()) or ())
        span_within = tuple(getattr(spec, "span_within", ()) or ())
        not_near = tuple(
            (c,) if isinstance(c, str) else tuple(c)
            for c in (getattr(spec, "span_not_near", ()) or ())
        )
        not_near_slop = int(getattr(spec, "span_not_near_slop", 0) or 0)
        slop = getattr(spec, "span_slop", 0)
        ordered = getattr(spec, "span_ordered", True)

        def _aux(terms, d):
            return sorted(
                p for t in set(terms) for p in idx.positions.get(t, {}).get(d, [])
            )

        pf_map = {}
        for d in sorted(cand):
            plists = [
                sorted(
                    p for t in c for p in idx.positions.get(t, {}).get(d, [])
                )
                for c in span_clauses
            ]
            if any(not pl for pl in plists):
                continue
            if not_near:
                from .spans import span_not_span_freq

                exc_plists = [
                    sorted(
                        p for t in c for p in idx.positions.get(t, {}).get(d, [])
                    )
                    for c in not_near
                ]
                if any(not pl for pl in exc_plists):
                    f = (
                        span_ordered_freq(plists, slop)
                        if ordered
                        else span_unordered_freq(plists, slop)
                    )
                else:
                    f = span_not_span_freq(
                        plists, slop, exc_plists, not_near_slop,
                        ordered=ordered,
                    )
            elif span_not:
                f = span_not_freq(plists, slop, _aux(span_not, d))
            elif span_contain:
                f = span_containing_freq(plists, slop, _aux(span_contain, d))
            elif span_within:
                f = span_within_freq(plists, slop, _aux(span_within, d))
            elif ordered:
                f = span_ordered_freq(plists, slop)
            else:
                f = span_unordered_freq(plists, slop)
            if f > 0:
                pf_map[d] = f
        cand = set(pf_map)
    elif span_first:
        from .spans import span_first_freq

        t0, end0 = span_first
        pf_map = {}
        for d in sorted(cand):
            f = span_first_freq(idx.positions[t0].get(d, []), end0)
            if f > 0:
                pf_map[d] = f
        cand = set(pf_map)
    if msm > 0:
        def _should_hits(d):
            h = sum(1 for t in set(should) if d in idx.postings.get(t, {}))
            h += sum(
                1 for occ, ts in groups
                if occ == "" and any(d in idx.postings.get(t, {}) for t in ts)
            )
            h += sum(
                1 for occ, _b, ts in const_clauses
                if occ == "" and any(d in idx.postings.get(t, {}) for t in ts)
            )
            h += sum(
                1 for occ, ms in weighted_groups
                if occ == ""
                and any(d in idx.postings.get(t, {}) for t, _wv in ms)
            )
            h += sum(
                1 for occ, ms in mixed_groups
                if occ == ""
                and any(d in idx.postings.get(t, {}) for t in _mx_terms(ms))
            )
            for pc, m in zip(phrase_clauses, pc_maps):
                if pc[2] == "" and d in m:
                    h += 1
            return h
        cand = {d for d in cand if _should_hits(d) >= msm}
    if not cand:
        return []
    docs = np.array(sorted(cand), dtype=np.int64)
    norm = np.array([idx.norm_bytes[d] for d in docs], dtype=np.uint8)
    # Boolean2ScorerSupplier tree: required clauses double-sum inside
    # ConjunctionScorer -> float32; optional clauses double-sum inside
    # DisjunctionSumScorer -> float32; ReqOptSumScorer adds the two
    # float32 sub-scores in FLOAT (pinned vs the compiled reference)
    per_clause = []   # optional side
    req_clause = []   # required side
    for is_must, t in [(False, t) for t in spec.should] + [(True, t) for t in spec.must]:
        if t not in weights:
            continue
        post = idx.postings.get(t, {})
        tf = np.array([post.get(int(d), 0) for d in docs], dtype=np.float32)
        s = weights[t].score(tf, norm)
        s[tf == 0] = np.float32(0.0)
        (req_clause if is_must else per_clause).append(s)
    for occ, ts in groups:
        if occ == "-":
            continue
        # nested BooleanQuery: members double-sum, CAST TO FLOAT32, and
        # the outer sum sees one float sub-score (Scorer.score contract)
        gacc = np.zeros(docs.size, dtype=np.float64)
        for t in ts:
            post = idx.postings.get(t, {})
            tf = np.array([post.get(int(d), 0) for d in docs], dtype=np.float32)
            s = weights[t].score(tf, norm)
            s[tf == 0] = np.float32(0.0)
            gacc += s.astype(np.float64)
        (req_clause if occ == "+" else per_clause).append(gacc.astype(np.float32))
    for occ, b32, ts in const_clauses:
        if occ == "-":
            continue
        # constant-score clause: one float32 sub-score == the boost for
        # any doc matching >=1 member (MultiTermQueryConstantScoreWrapper)
        hit = np.array(
            [any(int(d) in idx.postings.get(t, {}) for t in ts) for d in docs]
        )
        arr = np.where(hit, b32, np.float32(0.0)).astype(np.float32)
        (req_clause if occ == "+" else per_clause).append(arr)
    for occ, ms in weighted_groups:
        if occ == "-":
            continue
        # blended group: members score BM25 with their OWN weightValue
        # (df adjusted to the blend max x fuzzy boost); double-sum then
        # one float32 sub-score (BlendedTermQuery.BOOLEAN_REWRITE)
        from .bm25 import norm_cache

        cache = norm_cache(idx.avgdl)
        gacc = np.zeros(docs.size, dtype=np.float64)
        for t, wv in ms:
            post = idx.postings.get(t, {})
            tf = np.array([post.get(int(d), 0) for d in docs], dtype=np.float32)
            s = (np.float32(wv) * tf / (tf + cache[norm])).astype(np.float32)
            s[tf == 0] = np.float32(0.0)
            gacc += s.astype(np.float64)
        (req_clause if occ == "+" else per_clause).append(gacc.astype(np.float32))
    for occ, ms in mixed_groups:
        if occ == "-":
            continue
        # mixed nested BooleanQuery: scored terms use the GLOBAL weight,
        # 'c' members add their constant boost when any member term hits,
        # 'w' members are blended sub-sums cast f32 at their boundary;
        # the group double sum casts to f32 before the outer sum
        from .bm25 import norm_cache

        cache = norm_cache(idx.avgdl)
        gacc = np.zeros(docs.size, dtype=np.float64)
        for m in ms:
            if m[0] == "t":
                t = m[1]
                post = idx.postings.get(t, {})
                tf = np.array([post.get(int(d), 0) for d in docs], dtype=np.float32)
                s = weights[t].score(tf, norm)
                s[tf == 0] = np.float32(0.0)
                gacc += s.astype(np.float64)
            elif m[0] == "c":
                hit = np.array(
                    [any(int(d) in idx.postings.get(t, {}) for t in m[2]) for d in docs]
                )
                gacc += np.where(hit, np.float64(np.float32(m[1])), 0.0)
            else:
                wacc = np.zeros(docs.size, dtype=np.float64)
                for t, wv in m[1]:
                    post = idx.postings.get(t, {})
                    tf = np.array(
                        [post.get(int(d), 0) for d in docs], dtype=np.float32
                    )
                    s = (np.float32(wv) * tf / (tf + cache[norm])).astype(np.float32)
                    s[tf == 0] = np.float32(0.0)
                    wacc += s.astype(np.float64)
                gacc += wacc.astype(np.float32).astype(np.float64)
        (req_clause if occ == "+" else per_clause).append(gacc.astype(np.float32))
    # phrase clauses: one score array each (float32 order identical to
    # _make_range_scorer: wv = f32(f32(idf_sum*(k1+1)) * f32(boost)))
    if phrase_clauses and (pos_terms & set(idx.postings)):
        cache = weights[sorted(pos_terms & set(idx.postings))[0]].cache
        for (pairs, _s, _occ, boost), m in zip(phrase_clauses, pc_maps):
            pterms = sorted({t for t, _ in pairs})
            if any(t not in idx.postings for t in pterms):
                continue
            # PhraseWeight: one idf per clause occurrence (repeats again)
            idf_sum = idf_sum_f32(
                idf_f32(len(idx.postings[t]), idx.doc_count) for t, _ in pairs
            )
            # boost multiplies the idf sum BEFORE (k1+1) (BM25Stats.normalize)
            w = np.float32(idf_sum * np.float32(boost))
            wv = np.float32(w * (K1 + np.float32(1.0)))
            pf = np.array([m.get(int(d), 0) for d in docs], dtype=np.float32)
            ps = (wv * pf / (pf + cache[norm])).astype(np.float32)
            ps[pf == 0] = np.float32(0.0)
            (req_clause if _occ == "+" else per_clause).append(ps)
    if positional and not phrase_clauses and (pos_terms & set(idx.postings)):
        if multi_phrase:
            idf_sum = idf_sum_f32(
                idf_f32(len(idx.postings.get(t, {})), idx.doc_count)
                for _off, alts in multi_phrase
                for t in alts
            )
        elif span:
            # SpanNot/Containing/Within maps include both sides' contexts
            sn = (
                set(getattr(spec, "span_not", ()) or ())
                | set(getattr(spec, "span_contain", ()) or ())
                | set(getattr(spec, "span_within", ()) or ())
                | {
                    t
                    for c in (getattr(spec, "span_not_near", ()) or ())
                    for t in ((c,) if isinstance(c, str) else tuple(c))
                }
            )
            idf_sum = idf_sum_f32(
                idf_f32(len(idx.postings.get(t, {})), idx.doc_count)
                for t in sorted(set(span) | sn)
            )
        else:
            idf_sum = np.float32(idf_f32(len(idx.postings[span_first[0]]), idx.doc_count))
        wv = np.float32(idf_sum * (K1 + np.float32(1.0)))
        cache = weights[sorted(pos_terms & set(idx.postings))[0]].cache
        pf = np.array([pf_map.get(int(d), 0) for d in docs], dtype=np.float32)
        ps = (wv * pf / (pf + cache[norm])).astype(np.float32)
        ps[pf == 0] = np.float32(0.0)
        req_clause.append(ps)
    if not per_clause and not req_clause:
        return []
    if spec.dismax:
        # DisjunctionMaxScorer.java:50-59: float32 scoreSum accumulation,
        # then scoreMax + (scoreSum - scoreMax) * tie in float32 ops
        stack = np.stack(per_clause)
        mx = stack.max(axis=0).astype(np.float32)
        tot = np.zeros_like(stack[0], dtype=np.float32)
        for row in stack:
            tot = (tot + row).astype(np.float32)
        scores = (mx + (tot - mx) * np.float32(spec.tiebreak)).astype(np.float32)
    elif req_clause and per_clause:
        req32 = combine_scores(req_clause)
        opt32 = combine_scores(per_clause)
        # ReqOptSumScorer: float add; opt contributes only where matched
        scores = np.where(opt32 > 0, (req32 + opt32).astype(np.float32), req32)
    elif req_clause:
        scores = combine_scores(req_clause)
    else:
        scores = combine_scores(per_clause)
    order = np.lexsort((docs, -scores.astype(np.float64)))
    return [(int(docs[i]), np.float32(scores[i])) for i in order[:k]]
