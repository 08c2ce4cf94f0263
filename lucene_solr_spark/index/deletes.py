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


#: delete sets up to this size ride in scorer closures as a sorted array
#: (the reference's in-RAM per-segment liveDocs bitset analog); beyond it
#: the set stays a DataFrame and reaches each doc-range scorer through a
#: range_id COGROUP — never materialized on the driver.
DELETES_DRIVER_MAX = 100_000


def load_deleted(
    spark: SparkSession, paths: IndexPaths, max_driver: int | None = None
):
    """-> (sorted np.ndarray | None, DataFrame | None): exactly one is
    non-None (array for small sets, distributed frame for corpus-scale
    sets); (empty array, None) when there are no tombstones."""
    if max_driver is None:
        max_driver = DELETES_DRIVER_MAX
    if not os.path.exists(paths.deletes):
        return np.array([], dtype=np.int64), None
    df = spark.read.parquet(paths.deletes).select("doc_id").distinct()
    n = df.count()
    if n <= max_driver:
        rows = df.collect()
        return (
            np.array(sorted(int(r["doc_id"]) for r in rows), dtype=np.int64),
            None,
        )
    return None, df


def delete_docs_df(spark: SparkSession, index_dir: str, ids_df) -> None:
    """`delete_docs` for corpus-scale delete sets: the ids stay a
    DataFrame end-to-end (no driver materialization — the splitters
    tombstone half the corpus, which must never collect)."""
    paths = IndexPaths(index_dir)
    (
        ids_df.selectExpr("CAST(doc_id AS LONG) AS doc_id")
        .distinct()
        .write.mode("append")
        .parquet(paths.deletes)
    )
