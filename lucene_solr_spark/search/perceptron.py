"""BooleanPerceptronClassifier (lucene/classification/src/java/org/
apache/lucene/classification/BooleanPerceptronClassifier.java) — the
module's third classifier: an online perceptron over term weights.

Pinned against the COMPILED classifier in tests/test_misc_filters.py
(GT round 62): trained weight tables and per-text (class, score)
results match exactly, including the reference's quirks —

  * weights initialize to each term's corpus totalTermFreq
  * the QUERYABLE snapshot (the FST) only refreshes when
    batchCount % batchSize == 0 AT A MISCLASSIFICATION, so assignments
    inside a batch run on stale weights
  * an update READS the stale snapshot and writes prev + modifier*tf
    (modifier = correctClass.compareTo(assignedClass) — ±1), then
    TRUNCATES toward zero at snapshot-build time (Double.longValue)
  * training order is docid order (the class-wildcard search is
    constant-scoring, so TopDocs ties break by docid)
  * classify: sum the snapshot weights of the ANALYZED tokens
    (duplicates add twice); class = sum >= threshold; score =
    1 - exp(-|threshold - sum| / threshold); default threshold =
    sumDocFreq(field) / 2

Training is inherently sequential (each update depends on the previous
assignment) — it runs driver-side over a bounded sample, exactly like
the reference's in-memory loop; CLASSIFICATION is distributed
(classify_df broadcasts the weight table into one Arrow stage).
"""

from __future__ import annotations

import math


class BooleanPerceptron:
    def __init__(self, weights: dict[str, int], threshold: float):
        self.weights = dict(weights)
        self.threshold = float(threshold)

    def assign(self, tokens: list[str]) -> tuple[bool, float]:
        output = 0
        for t in tokens:
            d = self.weights.get(t)
            if d is not None:
                output += d
        score = 1 - math.exp(
            -abs(self.threshold - float(output)) / self.threshold)
        return output >= self.threshold, score


def train_boolean_perceptron(
    docs: list[tuple[list[str], bool]],
    batch_size: int = 1,
    threshold: float | None = None,
) -> BooleanPerceptron:
    """`docs`: (analyzed tokens, boolean class) in DOCID order. Token
    lists serve as both the stored text's analysis and the term vector
    (tf = occurrence count, iterated in sorted term order)."""
    ttf: dict[str, int] = {}
    dfs: dict[str, int] = {}
    for toks, _cls in docs:
        seen = set()
        for t in toks:
            ttf[t] = ttf.get(t, 0) + 1
            if t not in seen:
                dfs[t] = dfs.get(t, 0) + 1
                seen.add(t)
    if threshold is None or threshold == 0.0:
        threshold = sum(dfs.values()) / 2.0
    weights: dict[str, float] = {t: float(v) for t, v in ttf.items()}
    fst: dict[str, int] = {t: int(v) for t, v in weights.items()}
    clf = BooleanPerceptron(fst, threshold)
    batch_count = 0
    for toks, correct in docs:
        assigned, _score = clf.assign(toks)
        modifier = (1 if correct else 0) - (1 if assigned else 0)
        if modifier != 0:
            tf: dict[str, int] = {}
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            for t in sorted(tf):
                prev = clf.weights.get(t)
                weights[t] = (
                    0.0 if prev is None else prev + modifier * tf[t])
            if batch_count % batch_size == 0:
                # Double.longValue: truncation toward zero
                fst = {t: int(v) for t, v in weights.items()}
                clf = BooleanPerceptron(fst, threshold)
        batch_count += 1
    return clf


def classify_df(spark_df, clf: BooleanPerceptron, analyze_fn):
    """Distributed classification: broadcast the trained weight table
    into one Arrow stage over (doc_id, text) rows."""
    import pandas as pd

    weights = clf.weights
    threshold = clf.threshold

    def run(it):
        local = BooleanPerceptron(weights, threshold)
        for pdf in it:
            cls, score = [], []
            for text in pdf["text"]:
                c, s = local.assign(analyze_fn(text))
                cls.append(bool(c))
                score.append(float(s))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "assigned": cls,
                "p_score": score,
            })

    return spark_df.mapInPandas(
        run, "doc_id long, assigned boolean, p_score double")
