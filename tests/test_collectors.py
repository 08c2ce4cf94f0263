"""EarlyTerminatingSortingCollector + TimeLimitingCollector analogs.

Reference semantics:
- EarlyTerminatingSortingCollector (lucene/core/src/java/org/apache/lucene/
  search/EarlyTerminatingSortingCollector.java): when segments are sorted
  by the index sort (IndexWriterConfig.setIndexSort), top-n by that sort
  needs only each sorted leaf's first n docs.
- TimeLimitingCollector (lucene/core/src/java/org/apache/lucene/search/
  TimeLimitingCollector.java): stop collecting at the wall-clock budget,
  TimeExceededException carries the partial hits.
"""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import make_corpus
from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.engine import (
    BooleanSpec,
    IndexSearcher,
    _segment_heads_fn,
)

N_DOCS = 400


@pytest.fixture(scope="module")
def sorted_idx(spark, tmp_root):
    pdf = make_corpus(N_DOCS, seed=7)
    src = spark.createDataFrame(pdf)
    out = os.path.join(tmp_root, "idx_sorted_collectors")
    build_index(
        spark,
        src,
        out_dir=out,
        content_col="content",
        order_cols=["repo", "path", "commit"],
        meta_cols=["repo", "path", "commit", "lang"],
        range_size=64,
        fingerprint="collectors400v1",
    )
    return IndexSearcher(spark, out)


# ---------------- unit: run detection on crafted batches ----------------


def _batch(rows):
    return pd.DataFrame(rows, columns=["_seg", "doc_id", "k1", "k2"])


def _collect(fn, batches):
    out = [b for b in fn(iter(batches))]
    return pd.concat(out, ignore_index=True) if out else _batch([])


def test_heads_takes_first_n_of_each_run():
    # one file, three sorted runs (layout buckets): [a b c] [a b] [b c]
    b = _batch(
        [
            ("f1", 0, "a", "x"),
            ("f1", 1, "b", "x"),
            ("f1", 2, "c", "x"),
            ("f1", 3, "a", "x"),  # descent c->a: new run
            ("f1", 4, "b", "x"),
            ("f1", 5, "b", "x"),  # equal key: same run, past n -> dropped
            ("f1", 6, "a", "x"),  # descent: new run
            ("f1", 7, "c", "x"),
        ]
    )
    got = _collect(_segment_heads_fn(["k1"], 2, None), [b])
    assert got["doc_id"].tolist() == [0, 1, 3, 4, 6, 7]


def test_heads_second_sort_col_breaks_ties():
    # equal k1, descending k2 -> descent detected on the second column
    b = _batch(
        [
            ("f1", 0, "a", "p"),
            ("f1", 1, "a", "q"),
            ("f1", 2, "a", "p"),  # (a,p) < (a,q): new run
            ("f1", 3, "a", "z"),
        ]
    )
    got = _collect(_segment_heads_fn(["k1", "k2"], 1, None), [b])
    assert got["doc_id"].tolist() == [0, 2]


def test_heads_state_survives_batch_split_mid_run():
    b1 = _batch([("f1", 0, "a", "x"), ("f1", 1, "b", "x")])
    b2 = _batch([("f1", 2, "c", "x"), ("f1", 3, "a", "x"), ("f1", 4, "b", "x")])
    got = _collect(_segment_heads_fn(["k1"], 2, None), [b1, b2])
    # run 1 = docs 0,1,2 (first 2 kept), run 2 starts at doc 3 across the split
    assert got["doc_id"].tolist() == [0, 1, 3, 4]


def test_heads_descent_at_batch_boundary_starts_new_run():
    b1 = _batch([("f1", 0, "m", "x"), ("f1", 1, "z", "x")])
    b2 = _batch([("f1", 2, "a", "x")])  # z -> a at the boundary
    got = _collect(_segment_heads_fn(["k1"], 1, None), [b1, b2])
    assert got["doc_id"].tolist() == [0, 2]


def test_heads_per_file_state_is_independent():
    b = _batch(
        [
            ("f1", 0, "a", "x"),
            ("f2", 10, "z", "x"),
            ("f1", 1, "b", "x"),
            ("f2", 11, "a", "x"),  # f2 descent; f1 unaffected
        ]
    )
    got = _collect(_segment_heads_fn(["k1"], 1, None), [b])
    assert sorted(got["doc_id"].tolist()) == [0, 10, 11]


def test_heads_deleted_rows_skipped_before_counting():
    b = _batch([("f1", 0, "a", "x"), ("f1", 1, "b", "x"), ("f1", 2, "c", "x")])
    got = _collect(_segment_heads_fn(["k1"], 2, np.array([0])), [b])
    assert got["doc_id"].tolist() == [1, 2]


# ---------------- end-to-end: early termination ----------------


def test_early_topn_identical_to_full_sort(spark, sorted_idx):
    docs = spark.read.parquet(sorted_idx.paths.docs)
    for n in (1, 7, 25):
        full = (
            docs.orderBy("repo", "path", "commit", "doc_id")
            .limit(n)
            .select("doc_id")
            .collect()
        )
        early = sorted_idx.early_terminating_topn(n).select("doc_id").collect()
        assert [r["doc_id"] for r in early] == [r["doc_id"] for r in full]


def test_early_topn_prefix_sort(spark, sorted_idx):
    docs = spark.read.parquet(sorted_idx.paths.docs)
    full = docs.orderBy("repo", "doc_id").limit(10).select("doc_id").collect()
    early = (
        sorted_idx.early_terminating_topn(10, ["repo"]).select("doc_id").collect()
    )
    assert [r["doc_id"] for r in early] == [r["doc_id"] for r in full]


def test_early_candidates_are_exactly_run_heads(spark, sorted_idx):
    """n=1 must emit exactly one row per sorted run — the collection
    bound is runs*n, independent of corpus size."""
    docs = (
        spark.read.parquet(sorted_idx.paths.docs)
        .withColumn("_seg", F.input_file_name())
        .select("_seg", "repo", "path", "commit")
        .toPandas()
    )
    # expected run count: descents per file, computed independently
    runs = 0
    for _, sub in docs.groupby("_seg", sort=False):
        keys = list(zip(sub["repo"], sub["path"], sub["commit"]))
        runs += 1 + sum(keys[i] < keys[i - 1] for i in range(1, len(keys)))
    got = sorted_idx._early_candidates(1, ["repo", "path", "commit"]).count()
    assert got == runs
    assert got < N_DOCS  # strictly fewer rows than the corpus reach the merge


def test_early_candidate_scan_prunes_to_sort_cols(sorted_idx):
    """The candidate pass must column-prune the docs scan to
    (sort cols, doc_id): stored fields (content sha, lang, ...) are read
    only for the n winners via the final semi-join."""
    plan = (
        sorted_idx._early_candidates(5, ["repo", "path", "commit"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    read = plan.split("ReadSchema")[-1]
    assert "sha256" not in read and "lang" not in read
    assert "repo" in read and "doc_id" in read


def test_early_termination_requires_index_sort(spark, tmp_root):
    pdf = make_corpus(60, seed=9)
    pdf = pdf.assign(doc_id=range(len(pdf)))
    src = spark.createDataFrame(pdf)
    out = os.path.join(tmp_root, "idx_unsorted_collectors")
    build_index(
        spark,
        src,
        out_dir=out,
        content_col="content",
        doc_id_col="doc_id",
        range_size=64,
        fingerprint="collectors60v1",
    )
    s = IndexSearcher(spark, out)
    assert s.index_sort == []
    with pytest.raises(ValueError, match="index sort"):
        s.early_terminating_topn(5, ["repo"])


def test_early_termination_rejects_non_prefix_sort(sorted_idx):
    with pytest.raises(ValueError, match="prefix"):
        sorted_idx.early_terminating_topn(5, ["path"])


# ---------------- end-to-end: time-limited collection ----------------


def test_time_limited_full_budget_matches_topk(sorted_idx):
    full = sorted_idx.topk("parse index merge", k=10).collect()
    got, timed_out, visited = sorted_idx.topk_time_limited(
        "parse index merge", k=10, budget_s=1e9
    )
    assert not timed_out
    n_ranges = -(-sorted_idx.doc_count // sorted_idx._range_size)
    assert visited == n_ranges
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == [
        (r["doc_id"], r["score"]) for r in full
    ]


def test_time_limited_zero_budget_times_out(sorted_idx):
    got, timed_out, visited = sorted_idx.topk_time_limited(
        "parse index merge", k=10, budget_s=0.0
    )
    assert timed_out
    assert visited == 0
    assert got.count() == 0


def test_range_slice_scores_bit_identical_to_full_run(sorted_idx):
    """Partial results carry the same float32 scores as the same docs in
    an unrestricted run (scores use global stats, not per-slice)."""
    spec = BooleanSpec(should=tuple(sorted_idx._analyze("parse index merge")))
    full = sorted_idx.topk_spec(spec, k=N_DOCS).collect()
    rs = sorted_idx._range_size
    subset = {0, 2}
    part = sorted_idx.topk_spec(spec, k=N_DOCS, range_ids=sorted(subset)).collect()
    expect = [r for r in full if (r["doc_id"] // rs) in subset]
    assert [(r["doc_id"], r["score"]) for r in part] == [
        (r["doc_id"], r["score"]) for r in expect
    ]
