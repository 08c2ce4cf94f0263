"""Compaction: re-merge accumulated segment generations into full blocks.

TieredMergePolicy analog (index/TieredMergePolicy.java:75-86): incremental
appends (streaming/indexer.py) leave under-filled posting blocks per
(term, range); compaction replays every block through the same k-way merge
used at build time, producing one maximally-packed block sequence per
group — a single shuffle + vectorized merge + atomic directory swap, no
source re-tokenization. df/ttf are invariant, so term/corpus stats are
untouched; queries before/after are identical (tested)."""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .builder import (
    BLOCK_SCHEMA,
    IndexPaths,
    _merge_fragments_stream_fn,
    _write_manifest,
)


def recover_postings(paths: IndexPaths) -> bool:
    """Crash recovery for directory swaps (compaction / incremental stats):
    if a crash happened between renaming a live dir aside and moving the
    new one in, restore the old generation. Returns True if any recovery
    was performed."""
    recovered = False
    for live in (paths.postings, paths.term_stats, paths.corpus_stats, paths.docs):
        old = live + "__old"
        if not os.path.exists(live) and os.path.exists(old):
            os.replace(old, live)
            recovered = True
    return recovered


def compact_index(
    spark: SparkSession, index_dir: str, tiered: bool = True,
    purge_deletes: bool = True,
) -> dict:
    """tiered=True (TieredMergePolicy selection): only FRAGMENTED
    (term, range) groups — more than one under-filled block, i.e. blocks
    from multiple appended generations — are re-merged; maximally-packed
    groups pass through byte-identical without decode/re-encode. A
    second compaction right after a first is therefore a near-no-op, and
    steady-state cost tracks the increment volume, not the index size
    (TieredMergePolicy.java:75-86 merges only the under-sized tier).
    tiered=False re-merges everything (the r1 behavior).

    purge_deletes=True reclaims tombstones (index/deletes.py): groups
    containing a deleted doc join the re-merge set with the tombstones
    dropped inside the merge, the docs table is filtered, stats are
    recomputed (df/ttf finally shrink — the Lucene merge-reclaims-
    deletes semantics), and the tombstone table is cleared."""
    import numpy as np

    from .deletes import load_deleted

    paths = IndexPaths(index_dir)
    recover_postings(paths)
    with open(paths.manifest("postings")) as f:
        pm = json.load(f)
    n_term_buckets = int(pm["n_term_buckets"])

    postings_schema = T.StructType(
        list(BLOCK_SCHEMA.fields) + [T.StructField("bucket", T.IntegerType(), True)]
    )
    blocks = spark.read.schema(postings_schema).parquet(paths.postings)
    n_before = blocks.count()

    # compaction rewrites the affected blocks anyway, so the tombstone
    # set is force-collected here regardless of size (the query-path
    # cogroup mode in deletes.py is the no-driver-materialization path)
    deleted = (
        load_deleted(spark, paths, max_driver=1 << 62)[0]
        if purge_deletes
        else np.array([], dtype=np.int64)
    )

    if tiered:
        from .builder import BLOCK_SIZE

        frag_keys = (
            blocks.groupBy("term", "range_id")
            .agg(
                F.sum((F.col("n_docs") < BLOCK_SIZE).cast("int")).alias("n_partial")
            )
            .filter(F.col("n_partial") > 1)
            .select("term", "range_id")
        )
        if deleted.size:
            del_df = spark.createDataFrame([(int(d),) for d in deleted], "doc_id long")
            del_keys = (
                blocks.join(
                    F.broadcast(del_df),
                    (F.col("doc_id") >= F.col("first_doc"))
                    & (F.col("doc_id") <= F.col("last_doc")),
                )
                .select("term", "range_id")
                .distinct()
            )
            frag_keys = frag_keys.unionByName(del_keys).distinct()
        to_merge = blocks.join(frag_keys, ["term", "range_id"], "left_semi")
        packed = blocks.join(frag_keys, ["term", "range_id"], "left_anti")
        n_rewritten = to_merge.count()
    else:
        to_merge, packed = blocks, None
        n_rewritten = n_before

    # a block row has the exact shape the merge expects of a fragment
    frag_like = to_merge.select(
        "term", "range_id", "first_doc", "last_doc", "n_docs", "sum_tf",
        "max_tf", "max_norm", "docs_buf", "tfs_buf", "norms_buf", "pos_buf",
        "pay_buf",
    )
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    merged = frag_like.repartition(n_shuffle, "term", "range_id").mapInPandas(
        _merge_fragments_stream_fn(drop_docs=deleted if deleted.size else None),
        schema=BLOCK_SCHEMA,
    )
    if packed is not None:
        merged = merged.unionByName(packed.drop("bucket"))
    tmp_out = paths.postings + "__compact"
    (
        merged.withColumn(
            "bucket",
            F.pmod(F.crc32(F.encode(F.col("term"), "utf-8")), F.lit(n_term_buckets)).cast("int"),
        )
        .repartition("bucket")
        .sortWithinPartitions("term", "range_id", "block_no")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(tmp_out)
    )
    n_after = spark.read.schema(postings_schema).parquet(tmp_out).count()

    # crash-safe swap: rename the live generation ASIDE first, move the
    # compacted output in, only then delete the old one. A crash in any
    # window leaves either the old or the new postings recoverable
    # (recover_postings above; readers resolve files at planning time —
    # open a new IndexSearcher after compaction).
    old = paths.postings + "__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.replace(paths.postings, old)
    os.replace(tmp_out, paths.postings)
    shutil.rmtree(old)

    n_purged = 0
    if deleted.size:
        # docs table drops the tombstoned rows; stats recomputed from the
        # purged blocks (df/ttf shrink NOW — merge reclaimed the deletes)
        from ..streaming.indexer import _swap_dir, _write_stats

        del_df = spark.createDataFrame([(int(d),) for d in deleted], "doc_id long")
        docs = spark.read.parquet(paths.docs)
        docs.join(F.broadcast(del_df), "doc_id", "left_anti").write.mode(
            "overwrite"
        ).parquet(paths.docs + "_next")
        _swap_dir(paths.docs, paths.docs + "_next")
        _write_stats(spark, paths)
        shutil.rmtree(paths.deletes, ignore_errors=True)
        n_purged = int(deleted.size)

    pm.update({"compacted_at": int(time.time() * 1000), "fingerprint": pm.get("fingerprint", "")})
    _write_manifest(paths, "postings", {k: v for k, v in pm.items() if k not in ("stage", "schema", "generation")})
    return {
        "blocks_before": n_before,
        "blocks_after": n_after,
        "blocks_rewritten": n_rewritten,
        "docs_purged": n_purged,
    }
