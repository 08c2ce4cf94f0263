"""Analyzer plug point (IndexWriterConfig(Analyzer) analog): the builder
takes a named analyzer from the ANALYZERS registry, the manifest records
it, and the reader analyzes query strings with the SAME chain."""

import os

import pytest

from lucene_solr_spark.analysis.tokenizer import analyze, analyze_as
from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.engine import IndexSearcher

DOCS = [
    (0, "The Quick BROWN fox"),
    (1, "the quick brown fox"),
    (2, "Fox! and-hyphen under_score the"),
    (3, "Exact Match Line"),
]


def _build(spark, tmp_root, analyzer):
    d = os.path.join(tmp_root, f"idx_{analyzer}")
    src = spark.createDataFrame(
        [(i, t) for i, t in DOCS], "doc_id long, content string"
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint=f"an-{analyzer}",
        analyzer=analyzer,
    )
    return IndexSearcher(spark, d)


def test_analyze_as_semantics():
    # whitespace: no case folding, no stop filter, punctuation kept
    assert analyze_as("whitespace", "The Quick fox!") == ["The", "Quick", "fox!"]
    # simple: letter runs, lowercased ('and-hyphen' splits, digits drop)
    assert analyze_as("simple", "and-hyphen B2B the") == ["and", "hyphen", "b", "b", "the"]
    # keyword: the whole string is one token
    assert analyze_as("keyword", "Exact Match Line") == ["Exact Match Line"]
    # standard: matches the default chain
    assert analyze_as("standard", "The Quick fox!") == analyze("The Quick fox!")


def test_whitespace_index_is_case_sensitive(spark, tmp_root):
    s = _build(spark, tmp_root, "whitespace")
    assert s.analyzer == "whitespace"
    terms = {r["term"] for r in s._term_stats.select("term").collect()}
    # case preserved, stopwords indexed
    assert {"The", "the", "BROWN", "brown"} <= terms
    assert "The" != "the"
    hits = [r["doc_id"] for r in s.topk("BROWN", k=10).collect()]
    assert hits == [0]  # only the upper-case doc
    hits = [r["doc_id"] for r in s.topk("the", k=10).collect()]
    assert set(hits) == {1, 2}  # 'the' is a real term under whitespace


def test_keyword_index_whole_value_term(spark, tmp_root):
    s = _build(spark, tmp_root, "keyword")
    assert s.analyzer == "keyword"
    terms = {r["term"] for r in s._term_stats.select("term").collect()}
    assert "Exact Match Line" in terms
    hits = [r["doc_id"] for r in s.topk("Exact Match Line", k=10).collect()]
    assert hits == [3]


def test_standard_index_unchanged(spark, tmp_root):
    s = _build(spark, tmp_root, "standard")
    hits = [r["doc_id"] for r in s.topk("BROWN", k=10).collect()]
    assert set(hits) == {0, 1}  # lowercased: both brown docs, either case
