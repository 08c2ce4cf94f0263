"""IndexWriter.addIndexes(Directory...) analog (index/add_indexes.py):
appending two foreign indexes == building one index over the renumbered
union — rank+float32-score identical searches, green CheckIndex, and
byte-identical posting buffers (the copy-segments contract: only block
metadata shifts)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import make_corpus
from lucene_solr_spark.index.add_indexes import add_indexes
from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.index.check import verify_index
from lucene_solr_spark.search.engine import IndexSearcher


@pytest.fixture(scope="module")
def merged_and_reference(spark, tmp_root):
    pdf = make_corpus(230, seed=23).reset_index(drop=True)
    pdf["doc_id"] = pdf.index.astype("int64")
    half = 115
    a_pdf = pdf.iloc[:half].copy()
    b_pdf = pdf.iloc[half:].copy()
    b_pdf["doc_id"] = (b_pdf["doc_id"] - half).astype("int64")

    range_size = 64
    a_dir = os.path.join(tmp_root, "addx_a")
    b_dir = os.path.join(tmp_root, "addx_b")
    build_index(spark, spark.createDataFrame(a_pdf), out_dir=a_dir,
                content_col="content", doc_id_col="doc_id",
                meta_cols=["repo", "path"], range_size=range_size,
                fingerprint="addx_a")
    build_index(spark, spark.createDataFrame(b_pdf), out_dir=b_dir,
                content_col="content", doc_id_col="doc_id",
                meta_cols=["repo", "path"], range_size=range_size,
                fingerprint="addx_b")

    merged_dir = os.path.join(tmp_root, "addx_merged")
    add_indexes(spark, merged_dir, [a_dir, b_dir], fingerprint="addx_m")

    # reference: one build over the union with B renumbered to the same
    # cumulative range-aligned doc base the append used
    base_b = -(-(half) // range_size) * range_size  # 115 -> 128
    ref_pdf = pdf.copy()
    ref_pdf.loc[ref_pdf.index >= half, "doc_id"] = (
        ref_pdf.loc[ref_pdf.index >= half, "doc_id"] - half + base_b
    )
    ref_dir = os.path.join(tmp_root, "addx_ref")
    build_index(spark, spark.createDataFrame(ref_pdf), out_dir=ref_dir,
                content_col="content", doc_id_col="doc_id",
                meta_cols=["repo", "path"], range_size=range_size,
                fingerprint="addx_ref")
    return merged_dir, ref_dir


def test_check_index_green(spark, merged_and_reference):
    merged_dir, _ref = merged_and_reference
    report = verify_index(spark, merged_dir)  # raises on violations
    assert report


def test_search_identical_to_union_build(spark, merged_and_reference):
    merged_dir, ref_dir = merged_and_reference
    sm = IndexSearcher(spark, merged_dir)
    sr = IndexSearcher(spark, ref_dir)
    assert sm.doc_count == sr.doc_count

    def rows(df):
        return [(r["doc_id"], np.float32(r["score"])) for r in df.collect()]

    for q, mode in [("parse index", "or"), ("merge sort", "and"),
                    ("token", "or")]:
        assert rows(sm.topk(q, k=20, mode=mode)) == \
            rows(sr.topk(q, k=20, mode=mode)), (q, mode)
    assert rows(sm.topk_phrase("fast sort", k=15, slop=2)) == \
        rows(sr.topk_phrase("fast sort", k=15, slop=2))


def test_buffers_copied_not_rewritten(spark, merged_and_reference):
    """The Directory-copy contract: every merged posting buffer is the
    SOURCE buffer byte-for-byte; only first/last_doc and range_id
    shifted (by the range-aligned doc base)."""
    merged_dir, _ref = merged_and_reference
    merged = spark.read.parquet(
        os.path.join(merged_dir, "postings")
    ).select("term", "first_doc", "docs_buf").orderBy("term", "first_doc")
    a = spark.read.parquet(os.path.join(os.path.dirname(merged_dir),
                                        "addx_a", "postings"))
    b = spark.read.parquet(os.path.join(os.path.dirname(merged_dir),
                                        "addx_b", "postings"))
    n_src = a.count() + b.count()
    assert merged.count() == n_src
    # every source buffer appears verbatim in the merged set
    src_bufs = set(
        bytes(r["docs_buf"]) for r in a.select("docs_buf").collect()
    ) | set(bytes(r["docs_buf"]) for r in b.select("docs_buf").collect())
    merged_bufs = set(
        bytes(r["docs_buf"]) for r in merged.select("docs_buf").collect()
    )
    assert merged_bufs == src_bufs


def test_incompatible_sources_refused(spark, tmp_root, merged_and_reference):
    merged_dir, _ref = merged_and_reference
    a_dir = os.path.join(tmp_root, "addx_a")
    ws_dir = os.path.join(tmp_root, "addx_ws")
    pdf = make_corpus(40, seed=5).reset_index(drop=True)
    pdf["doc_id"] = pdf.index.astype("int64")
    build_index(spark, spark.createDataFrame(pdf), out_dir=ws_dir,
                content_col="content", doc_id_col="doc_id",
                meta_cols=["repo", "path"], range_size=64,
                fingerprint="addx_ws", analyzer="whitespace")
    with pytest.raises(ValueError, match="disagree on analyzer"):
        add_indexes(spark, os.path.join(tmp_root, "addx_bad"),
                    [a_dir, ws_dir], fingerprint="bad")
