"""Deletes / liveDocs (IndexWriter.deleteDocuments + Lucene's liveDocs
bitset semantics, lucene/core/.../index/SegmentReader liveDocs):

* delete_docs() appends tombstone doc_ids (write-once parquet parts —
  the .del-generation analog).
* The query engine masks tombstoned docs at scoring time while keeping
  CORPUS AND TERM STATS STALE — faithful to the reference, where
  deleted docs still count toward docFreq until their segment is
  merged.
* compact_index(purge_deletes=True) reclaims them: postings rewritten
  without the docs, the docs table filtered, stats fully recomputed,
  tombstones cleared — the merge-reclaims-deletes behavior.
"""

from __future__ import annotations

import os
from collections.abc import Iterable

import numpy as np
from pyspark.sql import SparkSession

from .builder import IndexPaths


def delete_docs(spark: SparkSession, index_dir: str, doc_ids: Iterable[int]) -> dict:
    """Append tombstones for doc_ids (idempotent under re-delete: the
    reader dedupes). No index data is touched — O(deletes) work only."""
    ids = sorted({int(d) for d in doc_ids})
    if not ids:
        return {"deleted": 0}
    paths = IndexPaths(index_dir)
    spark.createDataFrame([(d,) for d in ids], "doc_id long").coalesce(1).write.mode(
        "append"
    ).parquet(paths.deletes)
    return {"deleted": len(ids)}


def load_deleted(spark: SparkSession, paths: IndexPaths) -> np.ndarray:
    """Sorted tombstoned doc_ids (empty if none). Collected driver-side
    and shipped inside the scorer closures — the in-memory liveDocs
    bitset analog; a corpus-scale delete set would instead stay a table
    and anti-join, but per-segment bitsets are exactly what the
    reference holds in RAM too."""
    if not os.path.exists(paths.deletes):
        return np.array([], dtype=np.int64)
    rows = spark.read.parquet(paths.deletes).select("doc_id").distinct().collect()
    return np.array(sorted(int(r["doc_id"]) for r in rows), dtype=np.int64)
