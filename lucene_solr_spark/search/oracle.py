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
from ..analysis.tokenizer import analyze, analyze_to_counts
from .bm25 import avgdl_f32, combine_scores, make_term_weight


@dataclass
class OracleIndex:
    doc_count: int = 0
    sum_ttf: int = 0
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {doc: tf}
    norm_bytes: dict[int, int] = field(default_factory=dict)  # doc -> norm byte
    field_len: dict[int, int] = field(default_factory=dict)

    @property
    def avgdl(self) -> np.float32:
        return avgdl_f32(self.sum_ttf, self.doc_count)


def build_oracle_index(docs: list[tuple[int, str]]) -> OracleIndex:
    """docs: [(doc_id, content)] with deterministic, dense-ish doc_ids."""
    idx = OracleIndex()
    for doc_id, content in docs:
        counts, flen = analyze_to_counts(content or "")
        idx.doc_count += 1
        idx.sum_ttf += flen
        idx.field_len[doc_id] = flen
        idx.norm_bytes[doc_id] = int(encode_norm(np.array([flen]))[0])
        for term, tf in counts.items():
            idx.postings.setdefault(term, {})[doc_id] = tf
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
