"""Distributed inverted-index build: the reference's write path, Spark-first.

Pipeline (each arrow is one Spark stage; reference analogs in parens):

  source table
    -> deterministic dense doc_id assignment        (segment ordinals + docBase,
       via fixed hash-bucket layout + cumulative offsets; no global sort)
    -> docs table: sha256, field_len, norm_byte     (stored fields + norms,
       NormValuesWriter / BM25Similarity.computeNorm)
    -> per-partition segment fragments, mapInPandas (DocumentsWriterPerThread:
       each Spark partition builds a private in-memory postings map, then
       flushes sorted (term, doc-range) fragments — DWPT flush)
    -> salted merge: groupBy(term, range_id)        (SegmentMerger k-way merge;
       the doc-range id IS the salt: stopword-scale terms split into
       bounded-size groups, cf. CompositeIdRouter skew routing)
    -> 128-doc VByte blocks with skip/block-max     (Lucene50PostingsWriter
       metadata                                      FoR blocks + skip lists;
                                                     block-max is our extension)
    -> term_stats / corpus_stats                    (TermContext.build /
                                                     ExactStatsCache global df)
    -> _manifest generation markers                 (segments_N commits)

Scale notes (10^12-file posture):
  * no per-doc data is ever collected to the driver; only per-layout-bucket
    counts (N_LAYOUT_BUCKETS values) and stage manifests.
  * shuffle volume of the merge = compressed fragments, not raw tokens.
  * group size in the merge is bounded by range_size postings regardless of
    term df — skew-proof by construction.
  * final postings are written partitioned by a term hash bucket so a query
    touches only matching files, with rows sorted by term for row-group
    min/max pruning (the FST/terms-dict analog).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..analysis.smallfloat import encode_norm
from ..analysis.tokenizer import analyze_batch
from .codec import delta_encode, vbyte_encode

BLOCK_SIZE = 128  # Lucene50PostingsFormat.BLOCK_SIZE analog
DEFAULT_RANGE_SIZE = 8192  # docs per range bucket (merge salt + query partition)
DEFAULT_TERM_BUCKETS = 16  # output file partitions by term hash
N_LAYOUT_BUCKETS = 64  # fixed layout constant for doc_id assignment
INDEX_SCHEMA_VERSION = 2  # v2: positions stream (DOCS_AND_FREQS_AND_POSITIONS)


FRAGMENT_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("range_id", T.LongType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("sum_tf", T.LongType(), False),
        T.StructField("max_tf", T.IntegerType(), False),
        T.StructField("max_norm", T.IntegerType(), False),
        T.StructField("docs_buf", T.BinaryType(), False),
        T.StructField("tfs_buf", T.BinaryType(), False),
        T.StructField("norms_buf", T.BinaryType(), False),
        T.StructField("pos_buf", T.BinaryType(), False),
        T.StructField("seg_id", T.IntegerType(), False),
    ]
)

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("range_id", T.LongType(), False),
        T.StructField("block_no", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("sum_tf", T.LongType(), False),
        T.StructField("max_tf", T.IntegerType(), False),
        T.StructField("max_norm", T.IntegerType(), False),
        T.StructField("docs_buf", T.BinaryType(), False),
        T.StructField("tfs_buf", T.BinaryType(), False),
        T.StructField("norms_buf", T.BinaryType(), False),
        T.StructField("pos_buf", T.BinaryType(), False),
    ]
)


@dataclass
class IndexPaths:
    root: str

    @property
    def docs(self) -> str:
        return os.path.join(self.root, "docs")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def term_stats(self) -> str:
        return os.path.join(self.root, "term_stats")

    @property
    def corpus_stats(self) -> str:
        return os.path.join(self.root, "corpus_stats")

    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.root, "_manifest")

    def manifest(self, stage: str) -> str:
        return os.path.join(self.manifest_dir, f"{stage}.json")


def _write_manifest(paths: IndexPaths, stage: str, payload: dict) -> None:
    os.makedirs(paths.manifest_dir, exist_ok=True)
    payload = dict(payload)
    payload["stage"] = stage
    payload["schema"] = INDEX_SCHEMA_VERSION
    payload["generation"] = int(time.time() * 1000)
    with open(paths.manifest(stage), "w") as f:
        json.dump(payload, f, indent=2, default=str)


def _stage_done(paths: IndexPaths, stage: str, fingerprint: str) -> bool:
    """Checkpoint-resume: a stage is skipped iff its manifest exists and was
    written for the same input fingerprint (segments_N generation analog)
    AND the same index schema version (format migrations force rebuild)."""
    p = paths.manifest(stage)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            m = json.load(f)
        return (
            m.get("fingerprint") == fingerprint
            and m.get("schema") == INDEX_SCHEMA_VERSION
        )
    except (json.JSONDecodeError, OSError):
        return False


def assign_doc_ids(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int = N_LAYOUT_BUCKETS,
) -> DataFrame:
    """Deterministic dense doc_id without a global sort.

    Layout: bucket = pmod(xxhash64(order_cols), n_buckets) — a FIXED layout
    constant independent of cluster size (like Lucene's insertion order being
    a property of the writer, not the hardware). Within a bucket, rows are
    sorted by order_cols; global doc_id = bucket_offset + local rank.
    Only n_buckets counts are collected to the driver.
    """
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(n_buckets)).cast("int")
    dfb = df.withColumn("_bucket", bucket)
    counts = {r["_bucket"]: r["cnt"] for r in dfb.groupBy("_bucket").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    offs_items = sorted(offsets.items())
    offset_expr = F.element_at(
        F.array(*[F.lit(v) for _, v in offs_items]), F.col("_bucket") + 1
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_bucket").orderBy(*[F.col(c) for c in order_cols])
    return (
        dfb.repartition(n_buckets, "_bucket")
        .withColumn("doc_id", (F.row_number().over(w) - 1 + offset_expr).cast("long"))
        .drop("_bucket")
    )


def _field_len_udf():
    @F.pandas_udf(T.IntegerType())
    def field_len(content: pd.Series) -> pd.Series:
        _, lens = analyze_batch(content.fillna("").tolist())
        return pd.Series(lens)

    return field_len


def _norm_byte_udf():
    @F.pandas_udf(T.IntegerType())
    def norm_byte(field_len: pd.Series) -> pd.Series:
        return pd.Series(encode_norm(field_len.to_numpy()).astype(np.int32))

    return norm_byte


def build_docs_table(
    df: DataFrame, content_col: str, meta_cols: list[str]
) -> DataFrame:
    """docs: (doc_id, *meta, sha256, field_len, norm_byte).

    sha256 stays JVM-side (F.sha2, whole-stage codegen); field_len/norm are
    the analysis pandas UDF (the one unavoidable Python hot path)."""
    return (
        df.select("doc_id", *meta_cols, F.col(content_col).alias("_content"))
        .withColumn("sha256", F.sha2(F.col("_content"), 256))
        .withColumn("field_len", _field_len_udf()(F.col("_content")))
        .withColumn("norm_byte", _norm_byte_udf()(F.col("field_len")))
        .drop("_content")
    )


def _make_fragments_fn(content_col: str, range_size: int):
    def fragments(iterator):
        """DWPT analog: accumulate the whole Spark partition's postings in
        memory (the partition is the RAM budget, cf. FlushByRamOrCountsPolicy),
        then flush sorted fragments split at doc-range boundaries.

        Positions stream: per (term, doc) the ascending token positions are
        delta-encoded (first absolute) and concatenated in doc order; tf is
        the per-doc run length, so the stream splits losslessly at any doc
        boundary (Lucene .pos file analog, Lucene50PostingsWriter.java:323)."""
        from pyspark import TaskContext

        from ..analysis.tokenizer import analyze_with_positions

        seg_id = TaskContext.get().partitionId() if TaskContext.get() else -1
        acc: dict[str, list[list]] = {}
        for pdf in iterator:
            texts = pdf[content_col].fillna("").tolist()
            doc_ids = pdf["doc_id"].to_numpy()
            flens = np.empty(len(texts), dtype=np.int32)
            pos_maps = []
            for i, text in enumerate(texts):
                pm, fl = analyze_with_positions(text if isinstance(text, str) else "")
                pos_maps.append(pm)
                flens[i] = fl
            norms = encode_norm(flens)
            for i, pm in enumerate(pos_maps):
                d = int(doc_ids[i])
                nb = int(norms[i])
                for term, plist in pm.items():
                    lst = acc.get(term)
                    if lst is None:
                        lst = acc[term] = [[], [], [], []]
                    lst[0].append(d)
                    lst[1].append(len(plist))
                    lst[2].append(nb)
                    lst[3].append(plist)
        rows = []
        for term, (ds, tfs, nbs, poss) in acc.items():
            d = np.asarray(ds, dtype=np.int64)
            order = np.argsort(d, kind="mergesort")
            d = d[order]
            tf = np.asarray(tfs, dtype=np.int64)[order]
            nb = np.asarray(nbs, dtype=np.uint8)[order]
            pos_sorted = [poss[j] for j in order]
            ranges = d // range_size
            # contiguous runs per range (d is sorted)
            cut = np.flatnonzero(np.diff(ranges)) + 1
            bounds = np.concatenate(([0], cut, [d.size]))
            for bi in range(len(bounds) - 1):
                lo, hi = int(bounds[bi]), int(bounds[bi + 1])
                part_d, part_tf, part_nb = d[lo:hi], tf[lo:hi], nb[lo:hi]
                # per-doc deltas with the FIRST position absolute (unlike doc
                # deltas, there is no per-doc metadata slot to carry it)
                pos_vals = np.concatenate(
                    [
                        np.diff(np.asarray(p, dtype=np.uint64), prepend=np.uint64(0))
                        for p in pos_sorted[lo:hi]
                    ]
                )
                rows.append(
                    (
                        term,
                        int(ranges[lo]),
                        int(part_d[0]),
                        int(part_d[-1]),
                        int(part_d.size),
                        int(part_tf.sum()),
                        int(part_tf.max()),
                        int(part_nb.max()),
                        vbyte_encode(delta_encode(part_d.astype(np.uint64))),
                        vbyte_encode(part_tf.astype(np.uint64)),
                        part_nb.tobytes(),
                        vbyte_encode(pos_vals),
                        seg_id,
                    )
                )
        if rows:
            yield pd.DataFrame(rows, columns=[f.name for f in FRAGMENT_SCHEMA.fields])

    return fragments


def _merge_fragments_fn():
    from .codec import vbyte_decode, delta_decode

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        """SegmentMerger analog for one (term, range_id) group: segments cover
        disjoint doc ranges, so the k-way merge is sort-by-first_doc + concat;
        re-blocked to BLOCK_SIZE with per-block skip/block-max metadata."""
        term, range_id = key
        pdf = pdf.sort_values("first_doc", kind="mergesort")
        docs_parts, tf_parts, nb_parts = [], [], []
        for _, row in pdf.iterrows():
            deltas = vbyte_decode(row["docs_buf"])
            docs_parts.append(delta_decode(deltas, int(row["first_doc"])))
            tf_parts.append(vbyte_decode(row["tfs_buf"]))
            nb_parts.append(np.frombuffer(row["norms_buf"], dtype=np.uint8))
        d = np.concatenate(docs_parts).astype(np.int64)
        tf = np.concatenate(tf_parts).astype(np.int64)
        nb = np.concatenate(nb_parts)
        # positions: per-doc delta runs are doc-local, so the merged stream is
        # just the fragment streams concatenated in the same doc order
        pos_vals = np.concatenate([vbyte_decode(b) for b in pdf["pos_buf"]])
        pos_bounds = np.concatenate(([0], np.cumsum(tf)))
        out = []
        for b0 in range(0, d.size, BLOCK_SIZE):
            b1 = min(b0 + BLOCK_SIZE, d.size)
            bd = d[b0:b1]
            btf = tf[b0:b1]
            bnb = nb[b0:b1]
            bpos = pos_vals[pos_bounds[b0] : pos_bounds[b1]]
            out.append(
                (
                    term,
                    int(range_id),
                    b0 // BLOCK_SIZE,
                    int(bd[0]),
                    int(bd[-1]),
                    int(bd.size),
                    int(btf.sum()),
                    int(btf.max()),
                    int(bnb.max()),
                    vbyte_encode(delta_encode(bd.astype(np.uint64))),
                    vbyte_encode(btf.astype(np.uint64)),
                    bnb.tobytes(),
                    vbyte_encode(bpos.astype(np.uint64)),
                )
            )
        return pd.DataFrame(out, columns=[f.name for f in BLOCK_SCHEMA.fields])

    return merge


def build_index(
    spark: SparkSession,
    source: DataFrame,
    *,
    out_dir: str,
    content_col: str = "content",
    doc_id_col: str | None = None,
    order_cols: list[str] | None = None,
    meta_cols: list[str] | None = None,
    range_size: int = DEFAULT_RANGE_SIZE,
    n_term_buckets: int = DEFAULT_TERM_BUCKETS,
    fingerprint: str = "",
    overwrite: bool = False,
) -> IndexPaths:
    """Build the full index. Resumable: completed stages (matching manifest
    fingerprint) are skipped — kill the job at any stage boundary and re-run."""
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    meta_cols = list(meta_cols or [])
    t0 = time.time()

    if doc_id_col:
        base = source.withColumn("doc_id", F.col(doc_id_col).cast("long"))
        if doc_id_col in meta_cols:
            meta_cols.remove(doc_id_col)
    else:
        base = assign_doc_ids(source, order_cols or ["repo", "path", "commit"])

    # ---- stage: docs (stored fields + norms) ----
    if overwrite or not _stage_done(paths, "docs", fingerprint):
        t = time.time()
        docs = build_docs_table(base, content_col, meta_cols)
        docs.repartitionByRange(max(1, spark.sparkContext.defaultParallelism // 2), "doc_id").write.mode(
            "overwrite"
        ).parquet(paths.docs)
        n_docs = spark.read.parquet(paths.docs).count()
        _write_manifest(
            paths, "docs", {"fingerprint": fingerprint, "rows": n_docs, "wall_s": time.time() - t}
        )

    # ---- stage: postings (fragments -> salted merge -> blocks) ----
    if overwrite or not _stage_done(paths, "postings", fingerprint):
        t = time.time()
        fragments = base.select("doc_id", content_col).mapInPandas(
            _make_fragments_fn(content_col, range_size), schema=FRAGMENT_SCHEMA
        )
        blocks = fragments.groupBy("term", "range_id").applyInPandas(
            _merge_fragments_fn(), schema=BLOCK_SCHEMA
        )
        (
            blocks.withColumn(
                "bucket", F.pmod(F.xxhash64("term"), F.lit(n_term_buckets)).cast("int")
            )
            .repartition("bucket")
            .sortWithinPartitions("term", "range_id", "block_no")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(paths.postings)
        )
        _write_manifest(
            paths,
            "postings",
            {"fingerprint": fingerprint, "wall_s": time.time() - t, "range_size": range_size,
             "n_term_buckets": n_term_buckets, "block_size": BLOCK_SIZE},
        )

    # ---- stage: stats (ExactStatsCache analog: global df/ttf) ----
    if overwrite or not _stage_done(paths, "stats", fingerprint):
        t = time.time()
        blocks = spark.read.parquet(paths.postings)
        (
            blocks.groupBy("term")
            .agg(F.sum("n_docs").alias("df"), F.sum("sum_tf").alias("ttf"))
            .repartition(max(1, n_term_buckets // 4))
            .write.mode("overwrite")
            .parquet(paths.term_stats)
        )
        docs = spark.read.parquet(paths.docs)
        (
            docs.agg(
                F.count("*").alias("doc_count"),
                F.sum("field_len").cast("long").alias("sum_ttf"),
            )
            .write.mode("overwrite")
            .parquet(paths.corpus_stats)
        )
        _write_manifest(paths, "stats", {"fingerprint": fingerprint, "wall_s": time.time() - t})

    # ---- stage: lineage (per-segment metrics, UpdateLog/CheckIndex-lite) ----
    if overwrite or not _stage_done(paths, "lineage", fingerprint):
        docs = spark.read.parquet(paths.docs)
        n_docs = docs.count()
        _write_manifest(
            paths,
            "lineage",
            {
                "fingerprint": fingerprint,
                "doc_count": n_docs,
                "total_wall_s": time.time() - t0,
                "files_per_sec": n_docs / max(time.time() - t0, 1e-9),
            },
        )
    return paths
