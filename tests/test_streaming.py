"""Streaming surface: TopicStream checkpointed pull, DaemonStream loop,
incremental segment generations, and Structured Streaming foreachBatch
indexing. Core invariant: incremental build == full rebuild (same stats,
same top-k, rank- and score-identical)."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import make_corpus
from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.engine import IndexSearcher
from lucene_solr_spark.streaming.indexer import (
    apply_increment,
    index_stream,
    init_empty_index,
)
from lucene_solr_spark.streaming.topic import DaemonStream, TopicStream

N_DOCS = 240


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = make_corpus(N_DOCS, seed=9)
    pdf = pdf.reset_index(drop=True)
    pdf["doc_id"] = pdf.index.astype("int64")
    return pdf


QUERIES = [("parse index", "or"), ("hotcommon", "or"), ("parse index", "and")]


def _topk_all(searcher):
    return {
        (q, m): [(r["doc_id"], r["score"]) for r in searcher.topk(q, k=10, mode=m).collect()]
        for q, m in QUERIES
    }


def test_incremental_equals_full_rebuild(spark, tmp_root, corpus):
    full_dir = os.path.join(tmp_root, "idx_full")
    inc_dir = os.path.join(tmp_root, "idx_inc")
    src = spark.createDataFrame(corpus)
    build_index(
        spark, src, out_dir=full_dir, content_col="content", doc_id_col="doc_id",
        meta_cols=["repo", "path"], range_size=64, fingerprint="full240",
    )
    init_empty_index(spark, inc_dir, meta_cols=["repo", "path"], range_size=64)
    for lo, hi in [(0, 100), (100, 101), (101, 240)]:  # uneven generations
        batch = spark.createDataFrame(corpus[(corpus.doc_id >= lo) & (corpus.doc_id < hi)])
        out = apply_increment(
            spark, inc_dir, batch, content_col="content", doc_id_col="doc_id",
            meta_cols=["repo", "path"], batch_id=f"{lo}-{hi}",
        )
        assert out["rows"] == hi - lo

    s_full = IndexSearcher(spark, full_dir)
    s_inc = IndexSearcher(spark, inc_dir)
    assert s_inc.doc_count == s_full.doc_count == N_DOCS
    assert s_inc.sum_ttf == s_full.sum_ttf
    assert _topk_all(s_inc) == _topk_all(s_full)
    # phrase queries exercise appended position streams
    a = [(r["doc_id"], r["score"]) for r in s_full.topk_phrase("parse index", k=10).collect()]
    b = [(r["doc_id"], r["score"]) for r in s_inc.topk_phrase("parse index", k=10).collect()]
    assert a == b


def test_increment_idempotent_and_monotone(spark, tmp_root, corpus):
    d = os.path.join(tmp_root, "idx_idem")
    init_empty_index(spark, d, meta_cols=["repo", "path"], range_size=64)
    batch = spark.createDataFrame(corpus[corpus.doc_id < 50])
    kw = dict(content_col="content", doc_id_col="doc_id", meta_cols=["repo", "path"])
    r1 = apply_increment(spark, d, batch, batch_id="b0", **kw)
    assert r1["rows"] == 50
    r2 = apply_increment(spark, d, batch, batch_id="b0", **kw)  # replay
    assert r2.get("skipped")
    with pytest.raises(ValueError, match="watermark"):
        apply_increment(spark, d, batch, batch_id="b1", **kw)  # non-monotone
    assert IndexSearcher(spark, d).doc_count == 50


def test_increment_crash_resume(spark, tmp_root, corpus):
    """Two-phase commit: a crash between staging and the marker must be
    resumable with no duplicate docs/postings (ADVICE: the old watermark-
    only check re-appended everything on retry)."""
    import glob
    import json

    d = os.path.join(tmp_root, "idx_crash")
    init_empty_index(spark, d, meta_cols=["repo", "path"], range_size=64)
    kw = dict(content_col="content", doc_id_col="doc_id", meta_cols=["repo", "path"])
    apply_increment(spark, d, spark.createDataFrame(corpus[corpus.doc_id < 60]),
                    batch_id="g0", **kw)

    # simulate: batch g1 staged + PARTIALLY committed, then crashed before
    # the marker was written. Build the staging state by hand: run the
    # increment fully, then undo the marker and move ONE live postings file
    # back into staging (as if the commit stopped mid-rename).
    batch = spark.createDataFrame(corpus[(corpus.doc_id >= 60) & (corpus.doc_id < 120)])
    apply_increment(spark, d, batch, batch_id="g1", **kw)
    marker = os.path.join(d, "_manifest", "increments", "batch_g1.json")
    os.remove(marker)
    stage_root = os.path.join(d, "_staging", "batch_g1")
    st_postings = os.path.join(stage_root, "postings")
    live_files = sorted(glob.glob(os.path.join(d, "postings", "bucket=*", "inc_g1_*")))
    assert live_files
    moved_back = live_files[0]
    rel_bucket = os.path.basename(os.path.dirname(moved_back))
    os.makedirs(os.path.join(st_postings, rel_bucket), exist_ok=True)
    os.replace(
        moved_back,
        os.path.join(st_postings, rel_bucket,
                     os.path.basename(moved_back).removeprefix("inc_g1_")),
    )
    with open(os.path.join(stage_root, "staged.json"), "w") as f:
        json.dump({"batch_id": "g1", "rows": 60, "lo": 60, "watermark": 119,
                   "sum_field_len": 0}, f)

    # retry: must move the remaining file back in, recompute stats, and
    # converge to the same index as a clean build
    out = apply_increment(spark, d, batch, batch_id="g1", **kw)
    assert out["watermark"] == 119
    assert os.path.exists(marker)
    s = IndexSearcher(spark, d)
    assert s.doc_count == 120

    full_dir = os.path.join(tmp_root, "idx_crash_full")
    build_index(
        spark, spark.createDataFrame(corpus[corpus.doc_id < 120]), out_dir=full_dir,
        content_col="content", doc_id_col="doc_id", meta_cols=["repo", "path"],
        range_size=64, fingerprint="crashfull",
    )
    s_full = IndexSearcher(spark, full_dir)
    assert s.sum_ttf == s_full.sum_ttf
    assert _topk_all(s) == _topk_all(s_full)
    # full CheckIndex: the resumed commit left no stats drift, duplicate
    # postings, or broken blocks
    from lucene_solr_spark.index.check import verify_index

    verify_index(spark, d)


def test_incremental_stats_reads_only_increment(spark, tmp_root, corpus):
    """The per-increment stats job must read O(increment) postings input —
    the staged blocks, never the live postings dir (VERDICT 'stats fully
    recomputed per increment')."""
    from unittest.mock import patch

    from lucene_solr_spark.streaming import indexer as ix

    d = os.path.join(tmp_root, "idx_statsinc")
    init_empty_index(spark, d, meta_cols=["repo", "path"], range_size=64)
    kw = dict(content_col="content", doc_id_col="doc_id", meta_cols=["repo", "path"])
    apply_increment(spark, d, spark.createDataFrame(corpus[corpus.doc_id < 100]),
                    batch_id="s0", **kw)

    calls = []
    real = ix._merge_stats_incremental

    def spy(spark_, paths_, staged_postings, n_new, sum_flen):
        calls.append(staged_postings)
        return real(spark_, paths_, staged_postings, n_new, sum_flen)

    with patch.object(ix, "_merge_stats_incremental", side_effect=spy), \
         patch.object(ix, "_write_stats", side_effect=AssertionError("full recompute on clean path")):
        apply_increment(
            spark, d, spark.createDataFrame(corpus[(corpus.doc_id >= 100) & (corpus.doc_id < 140)]),
            batch_id="s1", **kw,
        )
    assert len(calls) == 1 and "_staging" in calls[0]
    s = IndexSearcher(spark, d)
    assert s.doc_count == 140


def test_compaction_crash_recovery(spark, tmp_root, corpus):
    """A crash between renaming live postings aside and moving the
    compacted output in leaves postings__old; the next reader heals it."""
    import shutil

    from lucene_solr_spark.index.builder import IndexPaths
    from lucene_solr_spark.index.compact import recover_postings

    d = os.path.join(tmp_root, "idx_crashswap")
    init_empty_index(spark, d, meta_cols=["repo", "path"], range_size=64)
    kw = dict(content_col="content", doc_id_col="doc_id", meta_cols=["repo", "path"])
    apply_increment(spark, d, spark.createDataFrame(corpus[corpus.doc_id < 40]),
                    batch_id="x0", **kw)
    paths = IndexPaths(d)
    before = _topk_all(IndexSearcher(spark, d))
    shutil.move(paths.postings, paths.postings + "__old")  # simulated crash window
    assert recover_postings(paths)
    assert _topk_all(IndexSearcher(spark, d)) == before


def test_topic_and_daemon_stream(spark, tmp_root, corpus):
    table_dir = os.path.join(tmp_root, "topic_src")
    ckpt = os.path.join(tmp_root, "topic_ckpt")
    spark.createDataFrame(corpus[corpus.doc_id < 80]).write.mode("overwrite").parquet(table_dir)

    seen = []
    topic = TopicStream(
        spark, lambda s: s.read.parquet(table_dir), "doc_id", ckpt
    )
    assert topic.pull(lambda df: seen.append(df.count())) == 80
    assert topic.pull(lambda df: seen.append(df.count())) == 0  # caught up
    # new rows arrive -> only the delta is pulled; checkpoint survives a new instance
    spark.createDataFrame(corpus[(corpus.doc_id >= 80) & (corpus.doc_id < 120)]).write.mode(
        "append"
    ).parquet(table_dir)
    topic2 = TopicStream(spark, lambda s: s.read.parquet(table_dir), "doc_id", ckpt)
    daemon = DaemonStream(topic2)
    out = daemon.run(lambda df: seen.append(df.count()), max_runs=5, idle_stop=1)
    assert out["rows"] == 40
    assert seen == [80, 40]
    assert topic2.watermark == 119


def test_compaction_preserves_results(spark, tmp_root, corpus):
    """TieredMergePolicy analog: many small generations -> compact ->
    fewer blocks, identical stats and top-k, CheckIndex green."""
    from lucene_solr_spark.index.check import verify_index
    from lucene_solr_spark.index.compact import compact_index

    d = os.path.join(tmp_root, "idx_compact")
    init_empty_index(spark, d, meta_cols=["repo", "path"], range_size=64)
    kw = dict(content_col="content", doc_id_col="doc_id", meta_cols=["repo", "path"])
    for lo, hi in [(0, 30), (30, 90), (90, 150), (150, 240)]:
        apply_increment(
            spark, d, spark.createDataFrame(corpus[(corpus.doc_id >= lo) & (corpus.doc_id < hi)]),
            batch_id=f"c{lo}", **kw,
        )
    before = _topk_all(IndexSearcher(spark, d))
    out = compact_index(spark, d)
    assert out["blocks_after"] < out["blocks_before"]
    s2 = IndexSearcher(spark, d)
    assert _topk_all(s2) == before
    assert s2.doc_count == N_DOCS
    verify_index(spark, d)
    # tiered selection: an immediate re-compaction finds no fragmented
    # groups and rewrites nothing (TieredMergePolicy steady state)
    out2 = compact_index(spark, d)
    assert out2["blocks_rewritten"] == 0
    assert out2["blocks_after"] == out["blocks_after"]
    s3 = IndexSearcher(spark, d)
    assert _topk_all(s3) == before


def test_index_stream_foreachbatch(spark, tmp_root, corpus):
    src_dir = os.path.join(tmp_root, "stream_src")
    idx_dir = os.path.join(tmp_root, "idx_stream")
    ckpt = os.path.join(tmp_root, "stream_ckpt")
    os.makedirs(src_dir, exist_ok=True)
    init_empty_index(spark, idx_dir, meta_cols=["repo", "path"], range_size=64)
    schema = spark.createDataFrame(corpus).schema

    # drop 1: first 120 docs
    spark.createDataFrame(corpus[corpus.doc_id < 120]).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    q = index_stream(
        spark, src_dir, idx_dir, schema, content_col="content", doc_id_col="doc_id",
        meta_cols=["repo", "path"], checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)
    # drop 2: the rest; a new availableNow query resumes from the checkpoint
    spark.createDataFrame(corpus[corpus.doc_id >= 120]).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    q2 = index_stream(
        spark, src_dir, idx_dir, schema, content_col="content", doc_id_col="doc_id",
        meta_cols=["repo", "path"], checkpoint_dir=ckpt,
    )
    q2.awaitTermination(120)

    s = IndexSearcher(spark, idx_dir)
    assert s.doc_count == N_DOCS
    # equivalence with a batch rebuild
    full_dir = os.path.join(tmp_root, "idx_stream_full")
    build_index(
        spark, spark.createDataFrame(corpus), out_dir=full_dir, content_col="content",
        doc_id_col="doc_id", meta_cols=["repo", "path"], range_size=64,
        fingerprint="streamfull",
    )
    s_full = IndexSearcher(spark, full_dir)
    assert _topk_all(s) == _topk_all(s_full)


def test_realtime_get_sees_staged_uncommitted(spark, tmp_root, corpus):
    """RealTimeGetComponent semantics: get-by-id consults the 'tlog'
    (sealed-but-uncommitted staging) — searches keep segment-reopen
    visibility until the commit lands."""
    from lucene_solr_spark.streaming.indexer import realtime_get

    d = os.path.join(tmp_root, "idx_rtg")
    init_empty_index(spark, d, meta_cols=["repo", "path"], range_size=64)
    kw = dict(content_col="content", doc_id_col="doc_id", meta_cols=["repo", "path"])
    first = spark.createDataFrame(corpus.iloc[:100])
    apply_increment(spark, d, first, batch_id="g1", **kw)

    second = spark.createDataFrame(corpus.iloc[100:140])
    r = apply_increment(spark, d, second, batch_id="g2", stage_only=True, **kw)
    assert r["staged"]

    # realtime get: committed id AND staged id both resolve
    got = {row["doc_id"] for row in realtime_get(spark, d, [5, 110]).collect()}
    assert got == {5, 110}
    # search does NOT see the staged generation yet
    s = IndexSearcher(spark, d)
    assert s.doc_count == 100
    # committing the same batch_id resumes phase 2; search now sees it
    apply_increment(spark, d, second, batch_id="g2", **kw)
    s2 = IndexSearcher(spark, d)
    assert s2.doc_count == 140
    assert {row["doc_id"] for row in realtime_get(spark, d, [110]).collect()} == {110}


def test_update_documents_delete_then_add(spark, tmp_root, corpus):
    """IndexWriter.updateDocument: atomic delete-by-key + add — the old
    version vanishes from results immediately (stale stats), the new
    version is searchable under fresh monotone ids, and realtime_get
    stops serving the tombstoned id."""
    from lucene_solr_spark.streaming.indexer import realtime_get, update_documents

    d = os.path.join(tmp_root, "idx_upd")
    init_empty_index(spark, d, meta_cols=["repo", "path"], range_size=64)
    kw = dict(content_col="content", doc_id_col="doc_id", meta_cols=["repo", "path"])
    base = corpus.iloc[:120].copy()
    apply_increment(spark, d, spark.createDataFrame(base), batch_id="u0", **kw)

    victim = base.iloc[7]
    updated = base.iloc[[7]].copy()
    updated["doc_id"] = 500  # fresh id above the watermark
    updated["content"] = "zzupdated marker content only here"
    res = update_documents(
        spark, d, spark.createDataFrame(updated),
        key_cols=["repo", "path"], batch_id="u1", **kw,
    )
    assert res["updated"] == 1

    s = IndexSearcher(spark, d)
    # the new content finds ONLY the new version
    hits = [r["doc_id"] for r in s.topk("zzupdated", k=10).collect()]
    assert hits == [500]
    # the old internal id is masked everywhere
    old_id = int(victim["doc_id"])
    all_ids = {r["doc_id"] for r in s.topk("parse index", k=200, mode="or").collect()}
    assert old_id not in all_ids
    assert {r["doc_id"] for r in realtime_get(spark, d, [old_id, 500]).collect()} == {500}


def test_signature_update_processor_overwrites_fuzzy_dups(spark, tmp_root):
    """SignatureUpdateProcessorFactory semantics (solr/core/.../update/
    processor/SignatureUpdateProcessorFactory.java): documents are keyed
    by their TextProfileSignature, so a later near-copy (same quantized
    term profile) OVERWRITES the original instead of duplicating it,
    while a genuinely different doc coexists."""
    import os

    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.ops.pipeline import text_profile_signatures
    from lucene_solr_spark.streaming.indexer import update_documents

    idx = os.path.join(tmp_root, "idx_sig_urp")
    base = "merge sort spark " * 4
    d0 = base.strip()
    # same quantized profile as d0: every word freq 4 (identical multiset, reordered)
    d0_shuffled = " ".join(reversed(d0.split(" ")))
    other = "parse index vector column " * 4

    first = spark.createDataFrame(
        [(0, d0, "en", "s0"), (1, other.strip(), "en", "s0")],
        "doc_id long, text string, lang string, source string",
    )
    sig1 = text_profile_signatures(first).orderBy("doc_id")
    first_sig = first.join(sig1, "doc_id")
    build_index(
        spark, first_sig, out_dir=idx, content_col="text", doc_id_col="doc_id",
        meta_cols=["lang", "source", "signature"], range_size=64, fingerprint="sig-urp",
    )

    second = spark.createDataFrame(
        [(2, d0_shuffled, "en", "s1")],
        "doc_id long, text string, lang string, source string",
    )
    second_sig = second.join(text_profile_signatures(second), "doc_id")
    # the fuzzy dup carries doc 0's signature -> update, not insert
    s0 = sig1.filter(F.col("doc_id") == 0).collect()[0]["signature"]
    assert second_sig.collect()[0]["signature"] == s0

    update_documents(
        spark, idx, second_sig, key_cols=["signature"], content_col="text",
        doc_id_col="doc_id", meta_cols=["lang", "source", "signature"], batch_id="sig1",
    )

    from lucene_solr_spark.search.engine import IndexSearcher

    s = IndexSearcher(spark, idx)
    hits = {int(r["doc_id"]) for r in s.topk("merge sort spark parse", k=10).collect()}
    assert 0 not in hits  # overwritten by its fuzzy dup
    assert {1, 2} <= hits  # the distinct doc and the new version both live
