"""FuzzyLikeThisQuery — the reference-exact selection machinery
(lucene/sandbox/src/java/org/apache/lucene/sandbox/queries/
FuzzyLikeThisQuery.java), pinned bit-for-bit vs the compiled binary in
tests/test_lucene_ground_truth.py (GT round 29c).

Per source term (analyzed, first occurrence only — processedTerms):
a fresh SlowFuzzyTermsEnum walks the dictionary; every enumerated
variant's similarity boost feeds a per-term ScoreTermQueue capped at
MAX_VARIANTS_PER_TERM=50 with the `size < MAX || score > minScore`
guard (FuzzyLikeThisQuery.java:234-238), and the queue's minScore is
pushed back into the enum as MaxNonCompetitiveBoost EVERY iteration
(:240) — the same bottomChanged machinery search/fuzzy_slow.py pins for
TopTermsRewrite, but with a null competitiveTerm (FLT never sets one,
so the >= branch always applies) and no TopTermsRewrite term
tie-break on insert. The enum-side formulas (linear vs automaton
similarity, the mid-enumeration mode switch, the one-accepted-term
attribute lag) are identical to the GT-round-76-pinned SlowFuzzyQuery
machinery and are re-stated here against FLT's call sites.

After a term's enumeration (:243-258): avgDf = totalVariantDocFreqs /
numVariants over ALL enumerated variants (int division); the SOURCE
term's df substitutes avgDf only when 0; each queued variant re-scores
as float32 (boost * boost) * ClassicSimilarity.idf(df, numDocs) and
pops (ascending) into the global ScoreTermQueue(maxNumTerms) whose
lessThan ties on (score asc, term DESC) — FuzzyLikeThisQuery.java:370.

rewrite (:288-345): the global queue pops ascending into per-source
groups; a single-variant group becomes BoostQuery(TermQuery, score)
with an ARTIFICIAL TermContext giving df = ttf = 1 (:268-283 — the
variant scores with idf(df=1) regardless of its real docFreq!), a
multi-variant group a coord-less SHOULD BooleanQuery of the same;
ignoreTF swaps the TermQuery for ConstantScoreQuery(TermQuery) (score
is just the boost). All groups join an outer SHOULD BooleanQuery.
"""

from __future__ import annotations

import math

import numpy as np

from .fuzzy_slow import _lev

MAX_VARIANTS_PER_TERM = 50


def _classic_idf(df: int, num_docs: int) -> np.float32:
    # ClassicSimilarity.idf: (float)(log((docCount+1)/(docFreq+1)) + 1.0)
    return np.float32(math.log((num_docs + 1.0) / float(df + 1)) + 1.0)


class ScoreTermQueue:
    """PriorityQueue<ScoreTerm> with FLT's lessThan
    (FuzzyLikeThisQuery.java:370-375): a is less when a.score < b.score,
    ties when a.term compares LARGER. Linear implementation — caps are
    <= 50 / maxNumTerms."""

    def __init__(self, cap: int):
        self.cap = cap
        self.items: list[tuple[np.float32, str, str]] = []  # (score, term, src)

    @staticmethod
    def _less(a, b) -> bool:
        if a[0] == b[0]:
            return a[1] > b[1]
        return a[0] < b[0]

    def _top_idx(self) -> int:
        wi = 0
        for i in range(1, len(self.items)):
            if self._less(self.items[i], self.items[wi]):
                wi = i
        return wi

    def top(self):
        return self.items[self._top_idx()]

    def insert_with_overflow(self, st) -> None:
        # util/PriorityQueue.insertWithOverflow: add when under cap,
        # else replace top iff lessThan(top, st)
        if len(self.items) < self.cap:
            self.items.append(st)
        elif self._less(self.top(), st):
            self.items[self._top_idx()] = st

    def pop_all_ascending(self) -> list:
        out = []
        while self.items:
            out.append(self.items.pop(self._top_idx()))
        return out


def flt_enum_variants(cands: list[tuple[str, int]], text: str,
                      min_sim: float, prefix_len: int):
    """Replay addTerms' enumeration for ONE source term.

    cands: [(term, df)] — a term-ascending SUPERSET of the acceptable
    variants: every accepted variant satisfies prefix match AND
    suffix-Levenshtein <= the INITIAL maxEdits (see the bound derivation
    in engine.topk_fuzzy_like_this_ref), so replaying over this set is
    exact. Returns (queued [(boost_f32, term)] pop-ascending,
    num_variants, total_variant_dfs)."""
    term_length = len(text)
    real_prefix = min(prefix_len, term_length)
    prefix = text[:real_prefix]
    suffix = text[real_prefix:]
    n = len(suffix)

    min_sim_f = np.float32(min_sim)
    if min_sim >= 1.0:
        raw, min_s = True, np.float32(0.0)
        max_edits = int(min_sim)
    else:
        raw, min_s = False, min_sim_f
        max_edits = int((1.0 - float(min_sim_f)) * term_length)
    scale = np.float32(np.float32(1.0) / (np.float32(1.0) - min_s))

    def max_boost(n_edits: int) -> np.float32:
        sim = np.float32(
            np.float32(1.0) - np.float32(n_edits) / np.float32(term_length))
        return np.float32((sim - min_s) * scale)

    def accept(t: str, mode: str, cur_max: int):
        # identical formulas to fuzzy_slow.slow_fuzzy_expand's accept
        # (GT round 76); restated for FLT's direct-enum call site
        tsuf = t[real_prefix:]
        m = len(tsuf)
        if mode == "auto":
            ed = _lev(suffix, tsuf)
            if ed > cur_max:
                return None
            if t == text:
                return np.float32(1.0)
            sim = np.float32(
                np.float32(1.0)
                - np.float32(ed) / np.float32(min(len(t), term_length))
            )
            if sim > min_s:
                return np.float32((sim - min_s) * scale)
            return None
        d = _lev(suffix, tsuf)
        if n != 0 and m != 0:
            if raw:
                max_dist = cur_max
            else:
                max_dist = min(
                    cur_max,
                    int(np.float32(
                        (np.float32(1.0) - min_s)
                        * np.float32(min(n, m) + real_prefix))),
                )
            if max_dist < abs(m - n) or d > max_dist:
                return None
        if raw and d > cur_max:
            return None
        sim = np.float32(
            np.float32(1.0)
            - np.float32(d) / np.float32(real_prefix + min(n, m))
        )
        if raw or sim > min_s:
            return np.float32((sim - min_s) * scale)
        return None

    df_of = dict(cands)
    # the enum seeks to the prefix and stops past it — candidates may be
    # a superset, so enforce the prefix here
    ordered = [t for t, _d in sorted(cands) if t.startswith(prefix)]

    variants_q = ScoreTermQueue(MAX_VARIANTS_PER_TERM)
    min_score = np.float32(0.0)
    num_variants = 0
    total_dfs = 0

    cur_max = max_edits
    mode = "auto" if cur_max <= 2 else "linear"
    NEG_INF = np.float32(-np.inf)
    attr_bottom = NEG_INF  # competitiveTerm stays null in FLT
    cached = attr_bottom
    queued_lag = False
    i = 0
    while True:
        if queued_lag:
            # bottomChanged with a null competitive term: >= branch
            bottom_b = cached
            while cur_max > 0 and bottom_b >= max_boost(cur_max):
                cur_max -= 1
            if cur_max <= 2:
                mode = "auto"
            queued_lag = False
        boost = None
        while i < len(ordered):
            boost = accept(ordered[i], mode, cur_max)
            i += 1
            if boost is not None:
                break
        if boost is None:
            break
        t = ordered[i - 1]
        if attr_bottom != cached:
            cached = attr_bottom
            queued_lag = True
        # the FLT caller (FuzzyLikeThisQuery.java:230-240)
        num_variants += 1
        total_dfs += int(df_of[t])
        if len(variants_q.items) < MAX_VARIANTS_PER_TERM or boost > min_score:
            variants_q.insert_with_overflow((np.float32(boost), t, text))
            min_score = variants_q.top()[0]
        attr_bottom = (
            min_score if len(variants_q.items) >= MAX_VARIANTS_PER_TERM
            else NEG_INF
        )

    return variants_q.pop_all_ascending(), num_variants, total_dfs


def flt_select(sources, cand_map, src_dfs, doc_count: int,
               max_num_terms: int):
    """rewrite()'s term-selection half: run every source term's
    enumeration, idf-rescore, rank in the global queue, group by source.

    sources: [(term, min_sim, prefix_len)] in token-stream first-
    occurrence order; cand_map[(term, min_sim, prefix_len)] =
    [(variant, df)]; src_dfs[term] =
    the source term's own docFreq. Returns an insertion-ordered dict
    source_term -> [(variant_term, score_f32)] in global-pop (ascending)
    order — the exact ArrayList build order of rewrite() step 1."""
    q = ScoreTermQueue(max_num_terms)
    for src, min_sim, prefix_len in sources:
        popped, num_v, total_dfs = flt_enum_variants(
            cand_map[(src, min_sim, prefix_len)], src, min_sim, prefix_len)
        if num_v == 0:
            continue
        avg_df = total_dfs // num_v
        df = src_dfs.get(src, 0)
        if df == 0:
            df = avg_df
        idf = _classic_idf(df, doc_count)
        for boost, term, src_t in popped:
            score = np.float32(np.float32(boost * boost) * idf)
            q.insert_with_overflow((score, term, src_t))
    groups: dict[str, list[tuple[str, np.float32]]] = {}
    for score, term, src_t in q.pop_all_ascending():
        groups.setdefault(src_t, []).append((term, score))
    return groups
