"""IndexWriter.addIndexes(Directory...) analog (lucene/core/src/java/
org/apache/lucene/index/IndexWriter.java:2418): append whole foreign
indexes into a new one WITHOUT re-analysis — the reference copies
segments verbatim and renumbers docBase; here every posting buffer is
delta-encoded from its block's first_doc, so a constant doc-id shift
rewrites ONLY the block metadata (first_doc/last_doc/range_id) and
never touches an encoded byte. The whole merge is a metadata-column
union: one pass over each source's parquet, no decode, no shuffle
beyond the term-bucket repartition of the final write.

Constraints mirrored from the reference:
- sources must agree on analyzer / norm (same-Similarity-at-writer
  rule), range_size / n_term_buckets / block_size (the codec-
  compatibility constraint — addIndexes refuses foreign formats);
- sources with live tombstones are refused (run purge_deletes first —
  the Directory variant of addIndexes has no deletes to carry because
  segments are copied with their liveDocs; a table engine either
  applies them or refuses, and refusing is the honest analog);
- doc ids renumber by cumulative offsets rounded UP to a range_size
  multiple so range membership (doc_id // range_size) shifts uniformly
  and block payloads stay byte-identical.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession, functions as F

from .builder import IndexPaths, _write_manifest


def _read_manifest(paths: IndexPaths, stage: str) -> dict:
    with open(paths.manifest(stage)) as f:
        return json.load(f)


def add_indexes(spark: SparkSession, out_dir: str, src_dirs: list[str],
                fingerprint: str) -> IndexPaths:
    if not src_dirs:
        raise ValueError("add_indexes needs at least one source index")
    if not fingerprint:
        raise ValueError("add_indexes requires a non-empty fingerprint")
    t0 = time.time()
    srcs = [IndexPaths(d) for d in src_dirs]
    manifests = [_read_manifest(p, "postings") for p in srcs]
    for key in ("analyzer", "norm", "range_size", "n_term_buckets",
                "block_size"):
        vals = {m.get(key) for m in manifests}
        if len(vals) > 1:
            raise ValueError(
                f"add_indexes: sources disagree on {key}: {sorted(map(str, vals))}"
            )
    for p in srcs:
        if os.path.exists(p.deletes):
            n_del = spark.read.parquet(p.deletes).count()
            if n_del:
                raise ValueError(
                    f"add_indexes: {p.root} carries {n_del} tombstones — "
                    "purge deletes before appending (the Directory-copy "
                    "path has no merge step to reclaim them)"
                )
    range_size = int(manifests[0]["range_size"])

    # cumulative offsets, each rounded UP to a range boundary so
    # range_id = doc_id // range_size shifts by a constant per source
    offsets: list[int] = []
    next_base = 0
    for p in srcs:
        offsets.append(next_base)
        mx = spark.read.parquet(p.docs).agg(
            F.max("doc_id").alias("m")).collect()[0]["m"]
        next_base += int(mx) + 1
        next_base = -(-next_base // range_size) * range_size

    out = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    # ---- docs ----
    t = time.time()
    docs = None
    for p, off in zip(srcs, offsets):
        d = spark.read.parquet(p.docs).withColumn(
            "doc_id", (F.col("doc_id") + F.lit(off)).cast("long"))
        docs = d if docs is None else docs.unionByName(d)
    docs.write.mode("overwrite").parquet(out.docs)
    n_docs = spark.read.parquet(out.docs).count()
    _write_manifest(out, "docs", {"fingerprint": fingerprint, "rows": n_docs,
                                  "wall_s": time.time() - t})

    # ---- postings: metadata-shift union, buffers untouched ----
    t = time.time()
    blocks = None
    for p, off in zip(srcs, offsets):
        b = (
            spark.read.parquet(p.postings)
            .withColumn("first_doc",
                        (F.col("first_doc") + F.lit(off)).cast("long"))
            .withColumn("last_doc",
                        (F.col("last_doc") + F.lit(off)).cast("long"))
            .withColumn("range_id",
                        (F.col("range_id")
                         + F.lit(off // range_size)).cast("long"))
        )
        blocks = b if blocks is None else blocks.unionByName(b)
    (
        blocks.repartition("bucket")
        .sortWithinPartitions("term", "range_id", "block_no")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out.postings)
    )
    pm = dict(manifests[0])
    pm.update({"fingerprint": fingerprint, "wall_s": time.time() - t,
               # appended sources interleave: the merged index has no
               # single index sort (IndexWriter.addIndexes drops the
               # sort guarantee unless every source shares it AND doc
               # bases align — conservatively none)
               "index_sort": []})
    _write_manifest(out, "postings", pm)

    # ---- stats ----
    t = time.time()
    merged = spark.read.parquet(out.postings)
    (
        merged.groupBy("term", "bucket")
        .agg(F.sum("n_docs").alias("df"), F.sum("sum_tf").alias("ttf"))
        .repartition("bucket")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out.term_stats)
    )
    (
        spark.read.parquet(out.docs)
        .agg(F.count("*").alias("doc_count"),
             F.sum("field_len").cast("long").alias("sum_ttf"))
        .write.mode("overwrite")
        .parquet(out.corpus_stats)
    )
    _write_manifest(out, "stats", {"fingerprint": fingerprint,
                                   "wall_s": time.time() - t})

    _write_manifest(out, "lineage", {
        "fingerprint": fingerprint,
        "doc_count": n_docs,
        "total_wall_s": time.time() - t0,
        "files_per_sec": n_docs / max(time.time() - t0, 1e-9),
        "sources": [p.root for p in srcs],
        "doc_bases": offsets,
    })
    return out
