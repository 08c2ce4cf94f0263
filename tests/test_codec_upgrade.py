"""Cross-codec upgrade path: a pre-FoR index (VByte-only blocks, the r1/r2
on-disk format) must stay readable, and increments + compaction over it mix
codecs freely — Lucene's situation when a 7.x index contains segments
written by older codec versions (SegmentMerger reads any, writes current).

The legacy index is produced by downgrading every posting buffer in place
(decode -> re-encode through the plain vbyte form), then verified to be
rank- AND score-identical before new-codec generations land on top."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from lucene_solr_spark.corpus import make_corpus
from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.index.codec import vbyte_decode, vbyte_encode
from lucene_solr_spark.index.compact import compact_index
from lucene_solr_spark.search.engine import IndexSearcher
from lucene_solr_spark.streaming.indexer import apply_increment

N_DOCS = 240
QUERIES = [("parse index", "or"), ("hotcommon", "or"), ("parse index", "and")]


@pytest.fixture(scope="module")
def corpus():
    pdf = make_corpus(N_DOCS, seed=9)
    pdf = pdf.reset_index(drop=True)
    pdf["doc_id"] = pdf.index.astype("int64")
    return pdf


def _topk_all(searcher):
    return {
        (q, m): [(r["doc_id"], r["score"]) for r in searcher.topk(q, k=10, mode=m).collect()]
        for q, m in QUERIES
    }


def _downgrade_to_vbyte(index_dir: str) -> tuple[set, set]:
    """Rewrite every posting buffer through the plain vbyte encoder in
    place -> (headers before, headers after)."""
    before, after = set(), set()
    files = glob.glob(os.path.join(index_dir, "postings", "**", "*.parquet"), recursive=True)
    assert files
    for f in files:
        t = pq.read_table(f)
        cols = {}
        for name in ("docs_buf", "tfs_buf", "pos_buf"):
            bufs = t.column(name).to_pylist()
            out = []
            for b in bufs:
                if b:
                    before.add(b[0])
                    b = vbyte_encode(vbyte_decode(b))
                    after.add(b[0])
                out.append(b)
            cols[name] = out
        for name, vals in cols.items():
            i = t.schema.get_field_index(name)
            import pyarrow as pa

            t = t.set_column(i, t.schema.field(i), pa.array(vals, type=t.schema.field(i).type))
        pq.write_table(t, f)
        # the in-place rewrite invalidates Hadoop's .crc sidecar
        crc = os.path.join(os.path.dirname(f), "." + os.path.basename(f) + ".crc")
        if os.path.exists(crc):
            os.remove(crc)
    return before, after


def test_legacy_vbyte_index_reads_and_upgrades(spark, tmp_root, corpus):
    idx = os.path.join(tmp_root, "idx_upgrade")
    full = os.path.join(tmp_root, "idx_upgrade_full")
    src = spark.createDataFrame(corpus)
    first, second = corpus[corpus.doc_id < 180], corpus[corpus.doc_id >= 180]

    build_index(
        spark, spark.createDataFrame(first), out_dir=idx, content_col="content",
        doc_id_col="doc_id", meta_cols=["repo", "path"], range_size=256,
        fingerprint="upg180",
    )
    want_first = _topk_all(IndexSearcher(spark, idx))

    before, after = _downgrade_to_vbyte(idx)
    assert 2 in before or 3 in before  # the build really wrote packed blocks
    assert after <= {0, 1}  # downgraded files are pure vbyte/alleq

    # 1) legacy-format index is rank- and score-identical
    assert _topk_all(IndexSearcher(spark, idx)) == want_first

    # 2) a new-codec increment lands on top -> mixed-codec index == full rebuild
    apply_increment(
        spark, idx, spark.createDataFrame(second), content_col="content",
        doc_id_col="doc_id", meta_cols=["repo", "path"], batch_id="tail",
    )
    build_index(
        spark, src, out_dir=full, content_col="content", doc_id_col="doc_id",
        meta_cols=["repo", "path"], range_size=256, fingerprint="upg240",
    )
    want_full = _topk_all(IndexSearcher(spark, full))
    assert _topk_all(IndexSearcher(spark, idx)) == want_full

    # 3) compaction over the mixed-codec generations preserves results
    compact_index(spark, idx)
    assert _topk_all(IndexSearcher(spark, idx)) == want_full

    # phrase path exercises the pos stream through all three states
    a = [(r["doc_id"], r["score"]) for r in IndexSearcher(spark, full).topk_phrase("parse index", k=10).collect()]
    b = [(r["doc_id"], r["score"]) for r in IndexSearcher(spark, idx).topk_phrase("parse index", k=10).collect()]
    assert a == b
