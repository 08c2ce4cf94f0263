"""Incremental index updates: new segment generations + Structured Streaming.

Lucene analog: each increment is a new write-once segment published by a
commit (IndexWriter.commit -> new segments_N generation, SegmentInfos.java:
54-66). Appended posting blocks reuse block numbers but always cover HIGHER
doc ids than every prior generation, so the query engine just orders blocks
by first_doc (SURVEY.md §2.2 SegmentMerger; engine._decode_group).

Two consumption styles:
  * apply_increment(): batch append of new docs — idempotent per batch_id
    (a commit marker written AFTER all writes makes retries skip; the
    Solr UpdateLog replay pattern, UpdateLog.java:815-839).
  * index_stream(): Structured Streaming foreachBatch over a file source
    with a checkpointLocation — Spark's batchId feeds the idempotency
    marker, giving effectively-once indexing of a growing directory
    (TopicStream checkpoints at cluster scale).

Compaction note: at 10^12 files many small generations would accumulate;
rerunning the normal build (or a per-(term,range) re-merge of blocks, the
TieredMergePolicy analog) compacts them. Queries are correct either way.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.builder import (
    BLOCK_SCHEMA,
    DEFAULT_RANGE_SIZE,
    DEFAULT_TERM_BUCKETS,
    FRAGMENT_SCHEMA,
    INDEX_SCHEMA_VERSION,
    IndexPaths,
    _make_fragments_fn,
    _merge_fragments_stream_fn,
    build_docs_table,
)


def _read_manifest(paths: IndexPaths, stage: str) -> dict:
    with open(paths.manifest(stage)) as f:
        return json.load(f)


def init_empty_index(
    spark: SparkSession,
    out_dir: str,
    *,
    meta_cols: list[str],
    range_size: int = DEFAULT_RANGE_SIZE,
    n_term_buckets: int = DEFAULT_TERM_BUCKETS,
) -> IndexPaths:
    """Generation-0 empty index (so a stream can build it from nothing)."""
    paths = IndexPaths(out_dir)
    os.makedirs(paths.manifest_dir, exist_ok=True)
    docs_schema = ", ".join(
        ["doc_id long"]
        + [f"{c} string" for c in meta_cols]
        + ["sha256 string", "field_len int", "norm_byte int"]
    )
    spark.createDataFrame([], docs_schema).write.mode("overwrite").parquet(paths.docs)
    empty_blocks = spark.createDataFrame([], BLOCK_SCHEMA).withColumn(
        "bucket", F.lit(0).cast("int")
    )
    empty_blocks.write.mode("overwrite").partitionBy("bucket").parquet(paths.postings)
    spark.createDataFrame([], "term string, df long, ttf long, bucket int").write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(paths.term_stats)
    _write_stats(spark, paths)
    for stage, payload in [
        ("postings", {"range_size": range_size, "n_term_buckets": n_term_buckets}),
        ("lineage", {"generation_no": 0, "watermark": -1}),
    ]:
        payload = dict(payload)
        payload.update({"stage": stage, "schema": INDEX_SCHEMA_VERSION,
                        "generation": int(time.time() * 1000), "fingerprint": "stream-gen0"})
        with open(paths.manifest(stage), "w") as f:
            json.dump(payload, f, indent=2)
    return paths


def _write_stats(spark: SparkSession, paths: IndexPaths) -> None:
    """Recompute term/corpus stats from block METADATA (column-pruned scan
    of n_docs/sum_tf — never touches the binary posting payloads)."""
    from pyspark.sql import types as T

    postings_schema = T.StructType(
        list(BLOCK_SCHEMA.fields) + [T.StructField("bucket", T.IntegerType(), True)]
    )
    blocks = spark.read.schema(postings_schema).parquet(paths.postings)
    (
        blocks.groupBy("term", "bucket")
        .agg(F.sum("n_docs").alias("df"), F.sum("sum_tf").alias("ttf"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(paths.term_stats + "_next")
    )
    docs = spark.read.parquet(paths.docs)
    (
        docs.agg(
            F.count("*").alias("doc_count"),
            F.coalesce(F.sum("field_len"), F.lit(0)).cast("long").alias("sum_ttf"),
        )
        .write.mode("overwrite")
        .parquet(paths.corpus_stats + "_next")
    )
    # atomic-ish swap (readers resolve the directory at query planning time)
    for p in (paths.term_stats, paths.corpus_stats):
        import shutil

        if os.path.exists(p):
            shutil.rmtree(p)
        os.replace(p + "_next", p)


def apply_increment(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    *,
    content_col: str,
    doc_id_col: str,
    meta_cols: list[str],
    batch_id: int | str = None,
) -> dict:
    """Append one segment generation for `new_docs`. Idempotent per
    batch_id; enforces the monotone doc-id invariant (new ids must exceed
    the committed watermark)."""
    paths = IndexPaths(index_dir)
    pm = _read_manifest(paths, "postings")
    lineage = _read_manifest(paths, "lineage")
    range_size = int(pm["range_size"])
    n_term_buckets = int(pm["n_term_buckets"])

    marker_dir = os.path.join(paths.manifest_dir, "increments")
    os.makedirs(marker_dir, exist_ok=True)
    marker = os.path.join(marker_dir, f"batch_{batch_id}.json")
    if batch_id is not None and os.path.exists(marker):
        return {"skipped": True, "batch_id": batch_id}

    base = new_docs.withColumn("doc_id", F.col(doc_id_col).cast("long"))
    stats = base.agg(
        F.count("*").alias("n"), F.min("doc_id").alias("lo"), F.max("doc_id").alias("mx")
    ).collect()[0]
    n_new = int(stats["n"])
    if n_new == 0:
        return {"skipped": True, "reason": "empty"}
    watermark = int(lineage.get("watermark", -1))
    if int(stats["lo"]) <= watermark:
        raise ValueError(
            f"increment doc_ids must exceed committed watermark {watermark}; got {stats['lo']}"
        )

    mc = [c for c in meta_cols if c != doc_id_col]
    build_docs_table(base, content_col, mc).write.mode("append").parquet(paths.docs)

    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    fragments = base.select("doc_id", content_col).mapInPandas(
        _make_fragments_fn(content_col, range_size), schema=FRAGMENT_SCHEMA
    )
    blocks = fragments.repartition(n_shuffle, "term", "range_id").mapInPandas(
        _merge_fragments_stream_fn(), schema=BLOCK_SCHEMA
    )
    (
        blocks.withColumn(
            "bucket",
            F.pmod(F.crc32(F.encode(F.col("term"), "utf-8")), F.lit(n_term_buckets)).cast("int"),
        )
        .repartition("bucket")
        .sortWithinPartitions("term", "range_id", "block_no")
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(paths.postings)
    )
    _write_stats(spark, paths)

    gen_no = int(lineage.get("generation_no", 0)) + 1
    lineage.update(
        {
            "generation_no": gen_no,
            "generation": int(time.time() * 1000),
            "watermark": int(stats["mx"]),
            "doc_count": int(lineage.get("doc_count", 0)) + n_new,
        }
    )
    with open(paths.manifest("lineage"), "w") as f:
        json.dump(lineage, f, indent=2, default=str)
    if batch_id is not None:
        with open(marker, "w") as f:
            json.dump({"batch_id": str(batch_id), "rows": n_new, "watermark": int(stats["mx"])}, f)
    return {"generation_no": gen_no, "rows": n_new, "watermark": int(stats["mx"])}


def index_stream(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    schema,
    *,
    content_col: str,
    doc_id_col: str,
    meta_cols: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Structured Streaming: watch a directory of parquet drops and index
    each micro-batch as a new segment generation. Returns the
    StreamingQuery (availableNow drains the backlog then stops)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        apply_increment(
            spark,
            index_dir,
            batch_df,
            content_col=content_col,
            doc_id_col=doc_id_col,
            meta_cols=meta_cols,
            batch_id=batch_id,
        )

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
