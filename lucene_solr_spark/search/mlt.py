"""MoreLikeThis term selection (lucene/queries/src/java/org/apache/
lucene/queries/mlt/MoreLikeThis.java).

Reference semantics (createQueue, :740-790): every term of the seed
doc's analyzed field is a candidate unless
  * tf < minTermFreq (DEFAULT_MIN_TERM_FREQ = 2),
  * docFreq < minDocFreq (DEFAULT_MIN_DOC_FREQ = 5),
  * docFreq > maxDocFreq, or docFreq == 0;
each scores tf * idf with the CLASSIC idf
(TFIDFSimilarity.idf: (float)(log(numDocs / (docFreq + 1)) + 1)) —
regardless of the searcher's similarity — and the top maxQueryTerms by
score become unboosted SHOULD TermQuery clauses (DEFAULT_BOOST = false,
createQuery). The query then scores under the searcher's similarity
(BM25 here). Pinned vs the compiled MoreLikeThis in
tests/test_lucene_ground_truth.py (ground-truth round 9).

Tie order at the selection cutoff is NOT defined by the reference (the
min-heap keeps the incumbent on equal scores, and candidate order is
HashMap iteration order); this implementation resolves ties by term ASC
and the ground-truth cases avoid cutoff ties.
"""

from __future__ import annotations

import math

import numpy as np


def classic_idf_f32(df: int, num_docs: int) -> np.float32:
    """ClassicSimilarity.idf (similarities/ClassicSimilarity.java:138):
    (float)(log((docCount+1)/(docFreq+1)) + 1.0). MoreLikeThis(ir)
    defaults its idf source to `new ClassicSimilarity()`
    (MoreLikeThis.java:315-317) — NOT the TFIDFSimilarity javadoc's
    log(numDocs/(docFreq+1))+1, which ranks the same under a fixed tf
    but yields different SCORES; the difference is invisible to
    round 9's selection-order pinning and was exposed by ground-truth
    round 14b's boosted KNN queries (setBoost(true) divides scores)."""
    return np.float32(math.log((num_docs + 1.0) / float(df + 1)) + 1.0)


def mlt_select_terms(
    doc_tf: dict[str, int],
    df: dict[str, int],
    num_docs: int,
    *,
    max_query_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    max_doc_freq: int | None = None,
) -> list[str]:
    """The interesting-terms selection, in descending-score order."""
    cands: list[tuple[np.float32, str]] = []
    for t, tf in doc_tf.items():
        if min_term_freq > 0 and tf < min_term_freq:
            continue
        d = int(df.get(t, 0))
        if min_doc_freq > 0 and d < min_doc_freq:
            continue
        if max_doc_freq is not None and d > max_doc_freq:
            continue
        if d == 0:
            continue
        score = np.float32(np.float32(tf) * classic_idf_f32(d, num_docs))
        cands.append((score, t))
    cands.sort(key=lambda x: (-float(x[0]), x[1]))
    return [t for _s, t in cands[:max_query_terms]]
