"""Distributed BM25 top-k query execution.

Query lifecycle (mirrors IndexSearcher.search -> createNormalizedWeight ->
per-leaf scorer -> TopScoreDocCollector -> TopDocs.merge; SURVEY.md §3.1):

 1. analyze(query) with the SAME chain as indexing (QueryParser analog).
 2. collect global term stats for the query's terms only (TermContext.build /
    ExactStatsCache: exact global df, never shard-local).
 3. scan posting blocks pruned to (term bucket files) x (term row-group
    min/max) — the terms-dict/FST pruning analog, done by Parquet stats.
 4. groupBy(range_id): each doc-range partition scores like one Lucene
    segment — decode blocks, dense-accumulate per-doc scores in double
    (BooleanScorer's 2048-doc bulk window, scaled to the range), cast to
    float32, local bounded top-k.
 5. global merge: ORDER BY score DESC, doc_id ASC LIMIT k (TopDocs.merge
    tie-break; docIDs are globally dense so partition order == docID order).

Block-max pruning (our extension; results MUST be identical):
  * AND: a range lacking any required term short-circuits to empty; within a
    range, blocks that don't overlap the rarest term's doc span are skipped
    before decode (ConjunctionDISI cost-ordered leapfrog analog).
  * single-term/OR: per-range upper bound = sum over terms of the best block
    bound (score increases in tf and norm_byte, so weightValue *
    max_tf/(max_tf + k1*(1-b)) over-estimates every posting). A first wave
    over the best-bounded ranges establishes the global threshold theta (one
    scalar to the driver); ranges bounded <= theta are never scored
    (block-max WAND at range granularity).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..analysis.tokenizer import analyze
from ..index.builder import DEFAULT_TERM_BUCKETS, IndexPaths
from ..index.codec import delta_decode, vbyte_decode
from .bm25 import B, K1, avgdl_f32, make_term_weight, norm_cache

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.FloatType(), False),
    ]
)

_EMPTY = pd.DataFrame(
    {"doc_id": pd.Series([], dtype="int64"), "score": pd.Series([], dtype="float32")}
)


class IndexSearcher:
    def __init__(self, spark: SparkSession, index_dir: str, n_term_buckets: int | None = None):
        self.spark = spark
        self.paths = IndexPaths(index_dir)
        row = spark.read.parquet(self.paths.corpus_stats).collect()[0]
        self.doc_count = int(row["doc_count"])
        self.sum_ttf = int(row["sum_ttf"])
        self.avgdl = avgdl_f32(self.sum_ttf, self.doc_count)
        if n_term_buckets is None:
            with open(self.paths.manifest("postings")) as f:
                n_term_buckets = int(json.load(f).get("n_term_buckets", DEFAULT_TERM_BUCKETS))
        self.n_term_buckets = n_term_buckets
        self._postings = spark.read.parquet(self.paths.postings)
        self._term_stats = spark.read.parquet(self.paths.term_stats)

    # ---------------- Weight stage ----------------

    def term_weights(self, terms: list[str]) -> dict[str, dict]:
        """Global-exact per-term stats + float32 weightValue (idf*boost*(k1+1))."""
        uniq = sorted(set(terms))
        rows = self._term_stats.filter(F.col("term").isin(uniq)).select("term", "df").collect()
        stats = {r["term"]: int(r["df"]) for r in rows}
        out = {}
        for t in uniq:
            df_ = stats.get(t, 0)
            tw = make_term_weight(t, df_, self.doc_count, self.avgdl)
            out[t] = {"df": df_, "weight_value": float(tw.weight_value)}
        return out

    # ---------------- pruned posting scan ----------------

    def _blocks_for(self, terms: list[str]) -> DataFrame:
        uniq = sorted(set(terms))
        # literal bucket ids -> parquet partition pruning; term isin -> row-group stats
        bucket_rows = (
            self.spark.createDataFrame([(t,) for t in uniq], "term string")
            .select(F.pmod(F.xxhash64("term"), F.lit(self.n_term_buckets)).cast("int").alias("b"))
            .distinct()
            .collect()
        )
        bucket_ids = [r["b"] for r in bucket_rows]
        return self._postings.filter(F.col("bucket").isin(bucket_ids) & F.col("term").isin(uniq))

    # ---------------- top-k ----------------

    def topk(
        self,
        query: str,
        k: int = 10,
        mode: str = "or",
        prune: bool = True,
        first_wave_ranges: int = 8,
    ) -> DataFrame:
        """-> DataFrame(doc_id long, score float): k best rows ordered
        score DESC, doc_id ASC (HitQueue/TopDocs.merge tie-break)."""
        terms = analyze(query)
        if not terms:
            return self.spark.createDataFrame([], TOPK_SCHEMA)
        weights = self.term_weights(terms)
        if mode == "and" and any(weights[t]["df"] == 0 for t in set(terms)):
            return self.spark.createDataFrame([], TOPK_SCHEMA)
        present = [t for t in terms if weights[t]["df"] > 0]
        if not present:
            return self.spark.createDataFrame([], TOPK_SCHEMA)

        blocks = self._blocks_for(present)
        score_fn = _make_range_scorer(
            terms=present, weights=weights, avgdl=float(self.avgdl), mode=mode, k=k
        )

        if prune and mode != "and":
            result = self._wand_pruned(blocks, score_fn, weights, k, first_wave_ranges)
        else:
            result = blocks.groupBy("range_id").applyInPandas(score_fn, schema=TOPK_SCHEMA)

        return result.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)

    def search(self, query: str, k: int = 10, mode: str = "or", prune: bool = True) -> DataFrame:
        """topk + join back to docs for metadata & the sha256 row invariant
        (phase 2 GET_FIELDS of the distributed search, QueryComponent.java:767)."""
        hits = self.topk(query, k=k, mode=mode, prune=prune)
        docs = self.spark.read.parquet(self.paths.docs)
        return (
            hits.join(docs, "doc_id", "inner")
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        )

    def _wand_pruned(
        self, blocks: DataFrame, score_fn, weights: dict, k: int, first_wave_ranges: int
    ) -> DataFrame:
        wv_map = F.create_map(
            *[x for t, w in weights.items() for x in (F.lit(t), F.lit(w["weight_value"]))]
        )
        # per-block bound: wv * max_tf/(max_tf + k1*(1-b)) + epsilon (must only over-estimate)
        kb = float(K1) * (1.0 - float(B))
        ub = wv_map[F.col("term")] * F.col("max_tf") / (F.col("max_tf") + F.lit(kb)) + F.lit(1e-5)
        bounds = (
            blocks.withColumn("_ub", ub)
            .groupBy("range_id", "term")
            .agg(F.max("_ub").alias("tub"))
            .groupBy("range_id")
            .agg(F.sum("tub").alias("bound"))
        )
        wave1_ids = [
            int(r["range_id"])
            for r in bounds.orderBy(F.col("bound").desc()).limit(first_wave_ranges).collect()
        ]
        if not wave1_ids:
            return self.spark.createDataFrame([], TOPK_SCHEMA)
        wave1_top = (
            blocks.filter(F.col("range_id").isin(wave1_ids))
            .groupBy("range_id")
            .applyInPandas(score_fn, schema=TOPK_SCHEMA)
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
            .collect()
        )
        wave1_df = self.spark.createDataFrame(
            [(int(r["doc_id"]), float(r["score"])) for r in wave1_top], TOPK_SCHEMA
        )
        if len(wave1_top) < k:
            # not enough hits for a threshold: score the rest unpruned
            rest = blocks.filter(~F.col("range_id").isin(wave1_ids))
            wave2 = rest.groupBy("range_id").applyInPandas(score_fn, schema=TOPK_SCHEMA)
            return wave1_df.unionByName(wave2)
        theta = float(wave1_top[-1]["score"])
        surviving = bounds.filter(
            (~F.col("range_id").isin(wave1_ids)) & (F.col("bound") > F.lit(theta))
        )
        wave2 = (
            blocks.join(F.broadcast(surviving.select("range_id")), "range_id", "left_semi")
            .groupBy("range_id")
            .applyInPandas(score_fn, schema=TOPK_SCHEMA)
        )
        return wave1_df.unionByName(wave2)


def _make_range_scorer(terms: list[str], weights: dict, avgdl: float, mode: str, k: int):
    """Per-(doc-range) scorer for applyInPandas. One group == one 'segment'."""
    uniq_terms = sorted(set(terms))
    clause_count = {t: terms.count(t) for t in uniq_terms}
    dfs = {t: weights[t]["df"] for t in uniq_terms}
    wvs = {t: np.float32(weights[t]["weight_value"]) for t in uniq_terms}
    cache = norm_cache(np.float32(avgdl))  # identical to the global 256-float cache

    def score_range(key, pdf: pd.DataFrame) -> pd.DataFrame:
        present = set(pdf["term"])
        if mode == "and" and len(present) < len(uniq_terms):
            return _EMPTY

        groups = {t: g for t, g in pdf.groupby("term", sort=False)}

        lead_span = None
        if mode == "and":
            lead = min(uniq_terms, key=lambda t: dfs[t])
            g = groups[lead]
            lead_span = (int(g["first_doc"].min()), int(g["last_doc"].max()))

        per_term: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for t in uniq_terms:
            g = groups.get(t)
            if g is None:
                continue
            g = g.sort_values("block_no", kind="mergesort")
            if lead_span is not None:
                m = (g["last_doc"] >= lead_span[0]) & (g["first_doc"] <= lead_span[1])
                g = g[m]
                if g.empty:
                    return _EMPTY
            docs_l, tf_l, nb_l = [], [], []
            for fd, db, tb, nb_ in zip(g["first_doc"], g["docs_buf"], g["tfs_buf"], g["norms_buf"]):
                docs_l.append(delta_decode(vbyte_decode(db), int(fd)))
                tf_l.append(vbyte_decode(tb))
                nb_l.append(np.frombuffer(nb_, dtype=np.uint8))
            per_term[t] = (
                np.concatenate(docs_l).astype(np.int64),
                np.concatenate(tf_l).astype(np.int64),
                np.concatenate(nb_l),
            )

        if not per_term:
            return _EMPTY

        base = min(int(d[0][0]) for d in per_term.values())
        top = max(int(d[0][-1]) for d in per_term.values())
        width = top - base + 1
        acc = np.zeros(width, dtype=np.float64)  # double clause sum (DisjunctionSumScorer)
        hit_count = np.zeros(width, dtype=np.int32)
        for t, (d, tf, nb) in per_term.items():
            freq = tf.astype(np.float32)
            s = (wvs[t] * freq / (freq + cache[nb])).astype(np.float32)
            idxs = d - base
            acc[idxs] += s.astype(np.float64) * clause_count[t]
            hit_count[idxs] += 1

        mask = hit_count >= len(uniq_terms) if mode == "and" else hit_count > 0
        idx = np.flatnonzero(mask)
        if idx.size == 0:
            return _EMPTY
        sc = acc[idx].astype(np.float32)
        docs_out = idx + base
        order = np.lexsort((docs_out, -sc.astype(np.float64)))[:k]
        return pd.DataFrame(
            {"doc_id": docs_out[order].astype(np.int64), "score": sc[order]}
        )

    return score_range
