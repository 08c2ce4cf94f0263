"""Index splitting (index/split.py — PKIndexSplitter /
MultiPassIndexSplitter analogs; assignment rules pinned vs the compiled
classes in GT round 80): each part is rank + float32-score identical to
a FRESH index over its subset (the addIndexes-applies-liveDocs
semantics: stats shrink), passes CheckIndex, and the tombstone path
never materializes ids on the driver (delete_docs_df)."""

import os

import numpy as np
import pytest

from lucene_solr_spark.corpus import make_corpus
from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.index.check import verify_index
from lucene_solr_spark.index.split import multipass_split, pk_split
from lucene_solr_spark.search.engine import IndexSearcher
from lucene_solr_spark.search.oracle import build_oracle_index, oracle_topk

QUERIES = [("parse", "or"), ("parse index", "and"), ("hotcommon", "or")]


@pytest.fixture(scope="module")
def source(spark, tmp_root):
    pdf = make_corpus(150, seed=80).reset_index(drop=True)
    pdf["doc_id"] = pdf.index.astype("int64")
    src_dir = os.path.join(tmp_root, "split_src")
    build_index(spark, spark.createDataFrame(pdf), out_dir=src_dir,
                content_col="content", doc_id_col="doc_id",
                meta_cols=["repo", "path"], range_size=32,
                fingerprint="split_src")
    return src_dir, pdf


def _assert_part(spark, part_dir, sub_pdf):
    """Part == fresh build over the subset: same doc set, rank+score
    identical searches vs the subset control oracle, CheckIndex green."""
    searcher = IndexSearcher(spark, part_dir)
    got_ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(searcher.paths.docs).collect()
    )
    assert got_ids == sorted(sub_pdf["doc_id"].tolist())
    oidx = build_oracle_index(
        list(zip(sub_pdf["doc_id"], sub_pdf["content"])))
    assert searcher.doc_count == oidx.doc_count
    assert searcher.sum_ttf == oidx.sum_ttf
    for q, mode in QUERIES:
        exp = oracle_topk(oidx, q, k=10, mode=mode)
        got = [(r["doc_id"], np.float32(r["score"]))
               for r in searcher.topk(q, k=10, mode=mode).collect()]
        assert [d for d, _ in got] == [d for d, _ in exp], (q, mode, got, exp)
        for (gd, gs), (_ed, es) in zip(got, exp):
            assert gs == es, (q, mode, gd, gs, es)
    report = verify_index(spark, part_dir)  # raises on violations
    assert report


def test_pk_split(spark, tmp_root, source):
    src_dir, pdf = source
    mid = sorted(pdf["path"])[len(pdf) // 2]
    o1 = os.path.join(tmp_root, "split_pk1")
    o2 = os.path.join(tmp_root, "split_pk2")
    pk_split(spark, src_dir, o1, o2, "path", mid)
    _assert_part(spark, o1, pdf[pdf["path"] < mid])
    _assert_part(spark, o2, pdf[pdf["path"] >= mid])


def test_multipass_split_seq(spark, tmp_root, source):
    src_dir, pdf = source
    outs = [os.path.join(tmp_root, f"split_seq{i}") for i in range(3)]
    multipass_split(spark, src_dir, outs, seq=True)
    n, k = len(pdf), 3
    plen = n // k
    for i, d in enumerate(outs):
        lo = plen * i
        hi = lo + plen if i < k - 1 else n
        _assert_part(spark, d, pdf.iloc[lo:hi])


def test_multipass_split_round_robin(spark, tmp_root, source):
    src_dir, pdf = source
    outs = [os.path.join(tmp_root, f"split_rr{i}") for i in range(2)]
    multipass_split(spark, src_dir, outs, seq=False)
    for i, d in enumerate(outs):
        _assert_part(spark, d, pdf[pdf["doc_id"] % 2 == i])


def test_pk_split_ordering_is_utf8_byte_order(spark):
    """pk_split parity invariant (ADVICE r3): the reference compares PK
    terms as UTF-8 bytes (BytesRef.compareTo); Spark's default
    UTF8_BINARY collation must order strings identically — including
    supplementary-plane keys where Java String.compareTo's UTF-16
    code-unit order would diverge (U+FFFD vs U+10400)."""
    from pyspark.sql import functions as F

    keys = ["a", "z�", "z\U00010400", "", "\U0001f600", "Z"]
    df = spark.createDataFrame([(k,) for k in keys], "pk string")
    for mid in keys:
        got = sorted(
            r["pk"] for r in df.filter(F.col("pk") < mid).collect())
        want = sorted(k for k in keys if k.encode() < mid.encode())
        assert got == want, (mid, got, want)
