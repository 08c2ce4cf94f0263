"""Search-quality evaluation (lucene/benchmark/src/java/org/apache/
lucene/benchmark/quality/): QualityStats, TrecJudge, and the
QualityBenchmark flow — precision@N, average precision, MRR, and recall
over judged query results.

Pinned against the COMPILED QualityBenchmark + TrecJudge + QualityStats
in tests/test_misc_filters.py (GT round 60): the reference runs its own
classic-parser queries through its own IndexSearcher and judges against
TREC-format qrels; our mirror ranks with the (already rank-identical)
control oracle and must reproduce every stats field bit-for-bit,
including the quirky ones:

  * MRR counts only a FIRST relevant hit at rank <= 5
  * getPrecisionAt(n) beyond the retrieved list extrapolates
    (numPoints * p@numPoints) / n
  * average() aggregates only queries with maxGoodPoints > 0 and takes
    p@N through getPrecisionAt (so the extrapolation bleeds into the
    average), then restores pReleventSum = avgp * avg-maxGoodPoints

This is the engine's evaluation harness: rank with IndexSearcher.topk
(or any queries() entry), judge against a relevance table, and report
the TREC metrics a relevance-tuning loop optimizes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

MAX_POINTS = 20


@dataclass
class QualityStats:
    """Port of QualityStats.java (field-for-field)."""

    max_good_points: float
    recall: float = 0.0
    p_at: list[float] = field(default_factory=lambda: [0.0] * (MAX_POINTS + 1))
    p_relevant_sum: float = 0.0
    num_points: float = 0.0
    num_good_points: float = 0.0
    mrr: float = 0.0
    _first_relevant_seen: bool = False

    def add_result(self, n: int, is_relevant: bool) -> None:
        if abs(self.num_points + 1 - n) > 1e-6:
            raise ValueError(f"point {n} illegal after {self.num_points}")
        if is_relevant:
            self.num_good_points += 1
            if not self._first_relevant_seen and n <= 5:
                self.mrr = 1.0 / n
            self._first_relevant_seen = True
        self.num_points = n
        p = self.num_good_points / self.num_points
        if is_relevant:
            self.p_relevant_sum += p
        if n < len(self.p_at):
            self.p_at[n] = p
        self.recall = (
            p if self.max_good_points <= 0
            else self.num_good_points / self.max_good_points
        )

    def precision_at(self, n: int) -> float:
        if n < 1 or n > MAX_POINTS:
            raise ValueError(f"n={n} out of [1,{MAX_POINTS}]")
        if n > self.num_points:
            return (self.num_points * self.p_at[int(self.num_points)]) / n
        return self.p_at[n]

    def avp(self) -> float:
        return (
            0.0 if self.max_good_points == 0
            else self.p_relevant_sum / self.max_good_points
        )

    def get_mrr(self) -> float:
        return self.mrr


def average(stats: list[QualityStats]) -> QualityStats:
    """QualityStats.average: measures averaged over queries WITH
    positive judgments only; p@N aggregated through precision_at (the
    extrapolation rule applies inside the average)."""
    avg = QualityStats(0.0)
    if not stats:
        return avg
    m = 0
    for st in stats:
        if st.max_good_points > 0:
            m += 1
            avg.num_good_points += st.num_good_points
            avg.num_points += st.num_points
            avg.p_relevant_sum += st.avp()
            avg.recall += st.recall
            avg.mrr += st.get_mrr()
            avg.max_good_points += st.max_good_points
            for j in range(1, len(avg.p_at)):
                avg.p_at[j] += st.precision_at(j)
    if m == 0:
        raise ValueError('no "good" queries')
    avg.num_good_points /= m
    avg.num_points /= m
    avg.recall /= m
    avg.mrr /= m
    avg.max_good_points /= m
    for j in range(1, len(avg.p_at)):
        avg.p_at[j] /= m
    avg.p_relevant_sum /= m
    avg.p_relevant_sum *= avg.max_good_points
    return avg


def parse_trec_qrels(lines) -> dict[str, set[str]]:
    """TrecJudge's qrel reader: 'queryID 0 docName rel' — only relevant
    (non-'0') rows are kept; blank/# lines skipped."""
    out: dict[str, set[str]] = {}
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        qid, _zero, doc, rel = parts[0], parts[1], parts[2], parts[3]
        if rel != "0":
            out.setdefault(qid, set()).add(doc)
    return out


def judge_results(
    ranked_doc_names: list[str],
    relevant: set[str],
) -> QualityStats:
    """analyzeQueryResults: walk the ranked list, judging each name."""
    st = QualityStats(float(len(relevant)))
    for i, name in enumerate(ranked_doc_names):
        st.add_result(i + 1, name in relevant)
    return st


def quality_benchmark(
    topk_fn,
    queries: list[tuple[str, str]],
    qrels: dict[str, set[str]],
    max_results: int = 20,
) -> tuple[list[QualityStats], QualityStats]:
    """The QualityBenchmark.execute flow: `topk_fn(query_text,
    max_results) -> ranked doc names`; returns (per-query stats,
    averaged stats)."""
    per_q = []
    for qid, text in queries:
        names = topk_fn(text, max_results)
        per_q.append(judge_results(names, qrels.get(qid, set())))
    return per_q, average(per_q)


# ---------------------------------------------------------------------------
# ConfusionMatrixGenerator (lucene/classification/src/java/org/apache/
# lucene/classification/utils/ConfusionMatrixGenerator.java) — pinned vs
# the compiled generator evaluating the compiled SimpleNaiveBayes
# classifier in GT round 63 (tests/test_misc_filters.py).


class ConfusionMatrix:
    """Port of ConfusionMatrixGenerator.ConfusionMatrix — including the
    reference's own aggregate definitions (per-class fp counts INCLUDE
    the true positives column-wide, tn counts class-absent rows)."""

    def __init__(self, counts: dict[str, dict[str, int]]):
        self.counts = {k: dict(v) for k, v in counts.items()}

    def precision(self, klass: str) -> float:
        cl = self.counts.get(klass)
        tp = fp = 0.0
        if cl is not None:
            for assigned, n in cl.items():
                if assigned == klass:
                    tp += n
            for values in self.counts.values():
                if klass in values:
                    fp += values[klass]
        return tp / (tp + fp) if tp > 0 else 0.0

    def recall(self, klass: str) -> float:
        cl = self.counts.get(klass)
        tp = fn = 0.0
        if cl is not None:
            for assigned, n in cl.items():
                if assigned == klass:
                    tp += n
                else:
                    fn += n
        return tp / (tp + fn) if tp + fn > 0 else 0.0

    def f1(self, klass: str) -> float:
        r, p = self.recall(klass), self.precision(klass)
        return 2 * p * r / (p + r) if p > 0 and r > 0 else 0.0

    def accuracy(self) -> float:
        tp = tn = fp = fn = 0.0
        for klass, row in self.counts.items():
            for assigned, n in row.items():
                if assigned == klass:
                    tp += n
                else:
                    fn += n
            for values in self.counts.values():
                if klass in values:
                    fp += values[klass]
                else:
                    tn += 1
        return (tp + tn) / (fp + fn + tp + tn)

    def total_precision(self) -> float:
        tp = fp = 0.0
        for klass, row in self.counts.items():
            for assigned, n in row.items():
                if assigned == klass:
                    tp += n
            for values in self.counts.values():
                if klass in values:
                    fp += values[klass]
        return tp / (tp + fp) if tp > 0 else 0.0

    def total_recall(self) -> float:
        tp = fn = 0.0
        for klass, row in self.counts.items():
            for assigned, n in row.items():
                if assigned == klass:
                    tp += n
                else:
                    fn += n
        return tp / (tp + fn) if tp + fn > 0 else 0.0

    def total_f1(self) -> float:
        r, p = self.total_recall(), self.total_precision()
        return 2 * p * r / (p + r) if p > 0 and r > 0 else 0.0


def confusion_matrix(
    results: list[tuple[list[str], str]],
) -> ConfusionMatrix:
    """getConfusionMatrix's counting rule over (sorted correctAnswers,
    classified) pairs: the 'correct' row is the classified label itself
    when it appears among the answers, else the lexicographically first
    answer."""
    counts: dict[str, dict[str, int]] = {}
    for answers, classified in results:
        answers = sorted(answers)
        correct = classified if classified in answers else answers[0]
        row = counts.setdefault(correct, {})
        row[classified] = row.get(classified, 0) + 1
    return ConfusionMatrix(counts)
