"""Index splitting — PKIndexSplitter / MultiPassIndexSplitter
(lucene/misc/src/java/org/apache/lucene/index/PKIndexSplitter.java,
MultiPassIndexSplitter.java), the inverse of addIndexes (round 73): the
shard-rebalancing operation at 100 TB (split a hot shard in place, no
re-analysis of the corpus).

Assignment rules pinned vs the compiled classes (GT round 80):
- pk_split: docs with pk IN [null, mid) go to part 1 — mid itself goes
  to part 2 (TermRangeQuery(field, null, mid, includeLower=true,
  includeUpper=FALSE)).
- multipass_split seq: equal docid ranges, the LAST part absorbing the
  integer-division remainder; round-robin: doc j -> part j % numParts.

Each part = replicate (hard-link copy, O(files)) + tombstone the
complement (a DataFrame end-to-end — half the corpus must never hit the
driver) + compact with purge_deletes (the addIndexes-applies-liveDocs
semantics: postings dropped, df/docCount/avgdl recomputed, docs table
filtered). GT round 80 pins that the reference's parts equal FRESH
indexes over the subsets, which is exactly what the purge compaction
produces (post-purge rank+score identity is already pinned in
tests/test_deletes.py); tests assert the engine halves are rank+f32-
score identical to the subset control oracle and pass CheckIndex."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .builder import IndexPaths
from .compact import compact_index
from .deletes import delete_docs_df
from .replicate import replicate_index


def _carve(spark: SparkSession, index_dir: str, out_dir: str, keep_pred) -> dict:
    """Copy the index and reduce it to the docs satisfying keep_pred
    (a Column over the docs table)."""
    replicate_index(index_dir, out_dir)
    paths = IndexPaths(out_dir)
    docs = spark.read.parquet(paths.docs)
    delete_docs_df(
        spark, out_dir, docs.filter(~keep_pred).select("doc_id"))
    stats = compact_index(spark, out_dir, tiered=False, purge_deletes=True)
    return stats


def pk_split(
    spark: SparkSession,
    index_dir: str,
    out1: str,
    out2: str,
    pk_col: str,
    mid: str,
) -> dict:
    """PKIndexSplitter: rows with docs-table pk_col < mid -> out1, the
    rest (including mid) -> out2.

    Ordering parity (ADVICE r3, investigated): the reference's
    TermRangeQuery compares term BYTES (UTF-8 unsigned lexicographic,
    BytesRef.compareTo). Spark's string `<` under the default
    UTF8_BINARY collation compares the underlying UTF8String bytes —
    the SAME order, including supplementary-plane keys (verified:
    U+FFFD sorts below U+10400 in both, unlike Java String.compareTo's
    UTF-16 code-unit order which Spark does not use). A plain column
    comparison is therefore parity-correct AND stays pushdown-friendly;
    do not wrap in encode()."""
    s1 = _carve(spark, index_dir, out1, F.col(pk_col) < mid)
    s2 = _carve(spark, index_dir, out2, F.col(pk_col) >= mid)
    return {"part1": s1, "part2": s2}


def multipass_split(
    spark: SparkSession,
    index_dir: str,
    out_dirs: list[str],
    seq: bool = True,
) -> list[dict]:
    """MultiPassIndexSplitter over the docid (position) order: doc rank
    j (dense, doc_id ASC) goes to range part (seq) or part j % n
    (round-robin)."""
    if len(out_dirs) < 2:
        raise ValueError("Invalid number of outputs.")
    paths = IndexPaths(index_dir)
    n_docs = spark.read.parquet(paths.docs).count()
    if n_docs < 2:
        raise ValueError("Not enough documents for splitting")
    n = len(out_dirs)
    # positions must be the doc_ids themselves so the split predicates
    # stay pure projections (no global window / no rank shuffle): a
    # fresh build assigns dense ascending ids; an index whose bases were
    # shifted by addIndexes is refused, like the foreign-codec refusals
    bounds = spark.read.parquet(paths.docs).agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).collect()[0]
    if int(bounds["lo"]) != 0 or int(bounds["hi"]) != n_docs - 1:
        raise ValueError(
            "multipass_split needs dense doc ids 0..n-1 "
            f"(got [{bounds['lo']}, {bounds['hi']}] over {n_docs} docs); "
            "compact or rebuild first")
    pos = F.col("doc_id")
    out = []
    for i, out_dir in enumerate(out_dirs):
        if seq:
            plen = n_docs // n
            lo = plen * i
            hi = lo + plen if i < n - 1 else n_docs
            pred = (pos >= lo) & (pos < hi)
        else:
            pred = pos % n == i
        out.append(_carve(spark, index_dir, out_dir, pred))
    return out
