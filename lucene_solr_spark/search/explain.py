"""IndexSearcher.explain — the score-decomposition tree
(search/TermQuery.java TermWeight.explain, search/BooleanWeight.java
:137-199, similarities/BM25Similarity.java explainScore/explainTFNorm,
search/PhraseWeight via SloppyPhraseScorer/ExactPhraseScorer freqs) —
pinned node-by-node (match flag, float32 value, child count, pre-order)
against the compiled reference in tests/test_lucene_ground_truth.py
(ground-truth round 37).

Every node value is computed at the reference's float32 cast points:
    tfNorm = (freq*(k1+1)) / (freq + k1*(1-b + b*doclen/avgdl))
evaluated stepwise in float32, score = boost * idf * tfNorm (boost node
omitted at 1.0), BooleanWeight's sum accumulated in float32 in CLAUSE
order. Explanation trees are plain dicts:
    {"match": bool, "value": float, "description": str,
     "details": [...]}  — serialize with explain_nodes() for tests.
"""

from __future__ import annotations

import numpy as np

from ..analysis.smallfloat import byte315_to_float
from .bm25 import B, K1, idf_f32, idf_sum_f32


def _decode_doclen(norm_byte: int) -> np.float32:
    """BM25Similarity.decodeNormValue: NORM_TABLE[b] = 1/(f*f) where
    f = SmallFloat.byte315ToFloat(b) — the QUANTIZED field length."""
    f = np.float32(byte315_to_float(np.array([norm_byte], dtype=np.uint8))[0])
    return np.float32(np.float32(1.0) / np.float32(f * f))


def _node(match: bool, value, description: str, details=()) -> dict:
    return {
        "match": bool(match),
        "value": float(np.float32(value)),
        "description": description,
        "details": list(details),
    }


def _tf_norm(freq: np.float32, doclen: np.float32, avgdl: np.float32) -> dict:
    """BM25Similarity.explainTFNorm (norms present)."""
    # Java left-associativity: 1 - b + b * doclen / avgdl
    # == (1 - b) + ((b * doclen) / avgdl), each step float32
    t = np.float32(B * doclen)
    t = np.float32(t / avgdl)
    t = np.float32(np.float32(np.float32(1.0) - B) + t)
    t = np.float32(K1 * t)
    denom = np.float32(freq + t)
    num = np.float32(freq * (K1 + np.float32(1.0)))
    val = np.float32(num / denom)
    return _node(
        True, val, "tfNorm, computed from:",
        [
            _node(True, freq, f"termFreq={float(freq)}"),
            _node(True, K1, "parameter k1"),
            _node(True, B, "parameter b"),
            _node(True, avgdl, "avgFieldLength"),
            _node(True, doclen, "fieldLength"),
        ],
    )


def _bm25_score_node(
    freq_node: dict, idf_node: dict, boost: np.float32,
    doclen: np.float32, avgdl: np.float32, doc: int,
) -> dict:
    """BM25Similarity.explainScore: boost (node only when != 1) * idf *
    tfNorm, each multiply in float32."""
    tf_node = _tf_norm(np.float32(freq_node["value"]), doclen, avgdl)
    subs = []
    if boost != np.float32(1.0):
        subs.append(_node(True, boost, "boost"))
    subs.append(idf_node)
    # the tfNorm node's freq child IS the scorer's freq explanation
    tf_node["details"][0] = freq_node
    subs.append(tf_node)
    val = np.float32(
        np.float32(boost * np.float32(idf_node["value"]))
        * np.float32(tf_node["value"])
    )
    return _node(
        True, val,
        f"score(doc={doc},freq={freq_node['value']}), product of:", subs,
    )


def explain_term(
    term: str, doc: int, tf: float, df: int, doc_count: int,
    norm_byte: int, avgdl: np.float32, boost: float = 1.0,
) -> dict:
    """TermWeight.explain: the weight wrapper around the BM25 score node
    (or noMatch when the term is absent from the doc)."""
    if tf <= 0 or df <= 0:
        return _node(False, 0.0, "no matching term")
    idf = idf_f32(df, doc_count)
    idf_node = _node(True, idf, f"idf(docFreq={df}, docCount={doc_count})")
    freq_node = _node(True, np.float32(tf), f"termFreq={float(tf)}")
    doclen = _decode_doclen(norm_byte)
    score = _bm25_score_node(
        freq_node, idf_node, np.float32(boost), doclen, avgdl, doc
    )
    return _node(
        True, score["value"],
        f"weight(body:{term} in {doc}) [BM25Similarity], result of:",
        [score],
    )


def explain_phrase(
    terms_in_order: list[str], doc: int, phrase_freq: float,
    dfs: dict[str, int], doc_count: int, norm_byte: int,
    avgdl: np.float32, boost: float = 1.0, exact: bool = True,
) -> dict:
    """PhraseWeight.explain: phraseFreq (exact count or float32 sloppy
    freq) under a summed-idf stats node — one idf per clause OCCURRENCE
    (PhraseWeight builds TermStatistics per clause, GT round 1), each a
    child of the 'idf(), sum of:' node."""
    if phrase_freq <= 0:
        return _node(False, 0.0, "no matching term")
    idf_children = [
        _node(
            True, idf_f32(dfs[t], doc_count),
            f"idf(docFreq={dfs[t]}, docCount={doc_count})",
        )
        for t in terms_in_order
    ]
    if len(idf_children) == 1:
        idf_node = idf_children[0]
    else:
        idf_sum = idf_sum_f32(np.float32(c["value"]) for c in idf_children)
        idf_node = _node(True, idf_sum, "idf(), sum of:", idf_children)
    label = "phraseFreq" if exact else "phraseFreq"
    pf = np.float32(phrase_freq)
    freq_node = _node(True, pf, f"{label}={float(pf)}")
    doclen = _decode_doclen(norm_byte)
    score = _bm25_score_node(
        freq_node, idf_node, np.float32(boost), doclen, avgdl, doc
    )
    return _node(
        True, score["value"],
        f"weight(body:\"{' '.join(terms_in_order)}\" in {doc}) "
        "[BM25Similarity], result of:",
        [score],
    )


def explain_boolean(
    clauses: list[tuple[str, dict]], min_should_match: int = 0
) -> dict:
    """BooleanWeight.explain (:137-199): float32 running sum over the
    matching SCORING clauses in CLAUSE order; prohibited matches and
    missing required clauses fail the whole doc; fewer than
    minimumNumberShouldMatch optional matches is a noMatch. clauses:
    [(occur '' | '+' | '-', sub_tree)] in the query's ADD order."""
    subs = []
    total = np.float32(0.0)
    fail = False
    match_count = 0
    should_match = 0
    for occur, e in clauses:
        if e["match"]:
            if occur in ("", "+"):  # scoring clauses
                subs.append(e)
                total = np.float32(total + np.float32(e["value"]))
            elif occur == "-":
                # prohibited clauses are built with needsScores=false
                # (BooleanWeight ctor): their inner explanation is the
                # non-scoring constant product 1.0 * 1.0 (pinned vs the
                # binary — invariant across tf/doclen/term)
                subs.append(
                    _node(False, 0.0, "match on prohibited clause", [
                        _node(True, 1.0, "non-scoring match, product of:", [
                            _node(True, 1.0, "boost"),
                            _node(True, 1.0, "docScore"),
                        ]),
                    ])
                )
                fail = True
            if occur != "-":
                match_count += 1
            if occur == "":
                should_match += 1
        elif occur == "+":
            subs.append(_node(False, 0.0, "no match on required clause", [e]))
            fail = True
    if fail:
        return _node(
            False, 0.0,
            "Failure to meet condition(s) of required/prohibited clause(s)",
            subs,
        )
    if match_count == 0:
        return _node(False, 0.0, "No matching clauses", subs)
    if should_match < min_should_match:
        return _node(
            False, 0.0,
            "Failure to match minimum number of optional clauses: "
            f"{min_should_match}", subs,
        )
    return _node(True, total, "sum of:", subs)


def explain_nodes(tree: dict) -> list[tuple[bool, str, int]]:
    """Pre-order (match, Float.toString(value), n_children) — the GT
    harness serialization (Java Float.toString semantics via repr of
    the float32-exact double when it is the shortest round-trip; the
    tests compare float32 VALUES, so string formatting differences
    cannot hide a real mismatch)."""
    out = []

    def walk(n):
        out.append((n["match"], np.float32(n["value"]), len(n["details"])))
        for d in n["details"]:
            walk(d)

    walk(tree)
    return out
