"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: build (or reuse) the inverted index over
sf0.001 documents and run a BM25 top-k search through the full engine
(posting blocks, WAND pruning, sha256 verification join).

`queries()` — one entry per implemented operator (SURVEY.md §2).
`oracle_sql()` — DuckDB-equivalent SQL for each query.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.ops.bm25_sql import (
    bm25_boolean_sql,
    bm25_boosted_sql,
    bm25_dismax_sql,
    bm25_mlt_sql,
    bm25_phrase_sql,
    bm25_rescore_sql,
    bm25_synonym_sql,
    bm25_topk_sql,
)
from lucene_solr_spark.ops.pipeline import OPS as PIPELINE_OPS
from lucene_solr_spark.ops.relational import OPS as RELATIONAL_OPS
from lucene_solr_spark.search.engine import IndexSearcher

_SEARCHERS: dict[str, IndexSearcher] = {}

# (name, query string, mode)
BM25_QUERIES = [
    ("bm25_term", "spark", "or"),
    ("bm25_or", "fast merge sort", "or"),
    ("bm25_and", "dup merge", "and"),
    ("bm25_rare_hot", "dup join", "or"),  # rare + stopword-scale term (WAND stressor)
    ("bm25_dup_clause", "spark spark vector", "or"),  # duplicate SHOULD clauses
]

# name -> kwargs for IndexSearcher.topk_boolean / bm25_boolean_sql
BOOL_QUERIES = {
    "bm25_must_not": dict(must="merge sort", must_not="dup"),
    "bm25_msm": dict(should="spark vector dup", min_should_match=2),
    "bm25_must_should": dict(must="merge", should="fast sort"),
}
DISMAX_QUERIES = {"bm25_dismax": ("fast merge sort", 0.1)}
PHRASE_QUERIES = {
    "bm25_phrase": ("fast merge", 0),
    "bm25_phrase_gap": ("merge the sort", 0),  # stop-filter position gap preserved
    "bm25_phrase_sloppy": ("fast sort", 3),  # simplified SloppyPhrase match
}
SYNONYM_QUERIES = {"bm25_synonym": "fast quick rapid"}
RESCORE_QUERIES = {"bm25_rescore": ("merge sort", "spark", 50, 2.0)}
MLT_QUERIES = {"bm25_mlt": (0, 5)}  # (seed_doc_id, n_query_terms)
BOOST_QUERIES = {"bm25_boost": {"spark": 2.0, "merge": 0.5, "vector": 1.0}}


def _searcher(spark: SparkSession, sf_dir: str) -> IndexSearcher:
    """Build-or-reuse the index for a testdata dir (manifest-fingerprint
    resume makes repeat calls a metadata no-op)."""
    key = os.path.abspath(sf_dir)
    if key in _SEARCHERS:
        return _SEARCHERS[key]
    idx_dir = os.path.join(
        os.environ.get("SPARK_GRAFT_INDEX_DIR", "/tmp/lss_index"),
        hashlib.md5(key.encode()).hexdigest()[:12],
    )
    src = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    build_index(
        spark,
        src,
        out_dir=idx_dir,
        content_col="text",
        doc_id_col="doc_id",
        meta_cols=["lang", "source"],
        range_size=512,
        fingerprint=key,
    )
    s = IndexSearcher(spark, idx_dir)
    _SEARCHERS[key] = s
    return s


def _ranked(hits: DataFrame) -> DataFrame:
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return hits.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "doc_id", "rank"
    )


def _bm25_query_fn(query: str, mode: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk(query, k=10, mode=mode))

    return run


def _bool_query_fn(kwargs: dict) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk_boolean(k=10, **kwargs))

    return run


def _dismax_query_fn(query: str, tiebreak: float) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk_dismax(query, k=10, tiebreak=tiebreak))

    return run


def _phrase_query_fn(query: str, slop: int) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk_phrase(query, k=10, slop=slop))

    return run


def _synonym_query_fn(query: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk_synonym(query, k=10))

    return run


def _boost_query_fn(boosts: dict) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk_boosted(boosts, k=10))

    return run


def _mlt_query_fn(seed: int, n_terms: int):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        """MoreLikeThis: seed doc's top-n terms by tf*idf as a SHOULD query,
        seed excluded from the hits (MoreLikeThis.java:141)."""
        import math

        from lucene_solr_spark.analysis.tokenizer import analyze_to_counts

        s = _searcher(spark, sf_dir)
        text = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .filter(F.col("doc_id") == seed)
            .select("text")
            .collect()[0][0]
        )
        counts, _ = analyze_to_counts(text)
        weights = s.term_weights(list(counts))
        ranked = sorted(
            counts.items(),
            key=lambda kv: (-kv[1] * math.log(s.doc_count / weights[kv[0]]["df"]), kv[0]),
        )
        terms = tuple(t for t, _ in ranked[:n_terms])
        hits = s.topk(" ".join(terms), k=11).filter(F.col("doc_id") != seed).limit(10)
        return _ranked(hits)

    return run


def _rescore_query_fn(q1: str, q2: str, first_n: int, weight: float):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        """QueryRescorer: re-rank the top first_n of q1 by adding
        weight * score(q2). q2 is scored over all its matches here (small
        SFs); at scale the candidate set is pushed into the q2 block scan."""
        s = _searcher(spark, sf_dir)
        first = s.topk(q1, k=first_n).select("doc_id", F.col("score").alias("s1"))
        second = s.topk(q2, k=1_000_000, prune=False).select(
            "doc_id", F.col("score").alias("s2")
        )
        combined = (
            first.join(second, "doc_id", "left")
            .withColumn("final", F.col("s1") + F.lit(weight) * F.coalesce("s2", F.lit(0.0)))
        )
        w = Window.orderBy(F.col("final").desc(), F.col("doc_id").asc())
        return combined.withColumn("rank", F.row_number().over(w).cast("int")).select(
            "doc_id", "rank"
        ).limit(10)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    s = _searcher(spark, "/root/testdata/sf0.001")
    return s.search("spark join", k=10).select(
        "doc_id", "score", "lang", "source", "sha256", "field_len"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q, mode in BM25_QUERIES:
        out[name] = _bm25_query_fn(q, mode)
    for name, kwargs in BOOL_QUERIES.items():
        out[name] = _bool_query_fn(kwargs)
    for name, (q, tb) in DISMAX_QUERIES.items():
        out[name] = _dismax_query_fn(q, tb)
    for name, (q, slop) in PHRASE_QUERIES.items():
        out[name] = _phrase_query_fn(q, slop)
    for name, q in SYNONYM_QUERIES.items():
        out[name] = _synonym_query_fn(q)
    for name, (q1, q2, n, w) in RESCORE_QUERIES.items():
        out[name] = _rescore_query_fn(q1, q2, n, w)
    for name, (seed, nt) in MLT_QUERIES.items():
        out[name] = _mlt_query_fn(seed, nt)
    for name, boosts in BOOST_QUERIES.items():
        out[name] = _boost_query_fn(boosts)
    for name, (fn, _sql) in {**RELATIONAL_OPS, **PIPELINE_OPS}.items():
        out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, q, mode in BM25_QUERIES:
        out[name] = bm25_topk_sql(q, k=10, mode=mode)
    for name, kwargs in BOOL_QUERIES.items():
        out[name] = bm25_boolean_sql(k=10, **kwargs)
    for name, (q, tb) in DISMAX_QUERIES.items():
        out[name] = bm25_dismax_sql(q, k=10, tiebreak=tb)
    for name, (q, slop) in PHRASE_QUERIES.items():
        out[name] = bm25_phrase_sql(q, k=10, slop=slop)
    for name, q in SYNONYM_QUERIES.items():
        out[name] = bm25_synonym_sql(q, k=10)
    for name, (q1, q2, n, w) in RESCORE_QUERIES.items():
        out[name] = bm25_rescore_sql(q1, q2, first_n=n, weight=w, k=10)
    for name, (seed, nt) in MLT_QUERIES.items():
        out[name] = bm25_mlt_sql(seed_doc_id=seed, n_terms=nt, k=10)
    for name, boosts in BOOST_QUERIES.items():
        out[name] = bm25_boosted_sql(boosts, k=10)
    for name, (_fn, sql) in {**RELATIONAL_OPS, **PIPELINE_OPS}.items():
        if sql is not None:
            out[name] = sql
    return out
