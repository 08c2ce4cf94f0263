"""MemoryIndex (single-doc RAM index) + distributed percolation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.engine import BooleanSpec, phrase_spec
from lucene_solr_spark.search.memory import MemoryIndex, percolate


def test_search_scores_single_doc_stats():
    """MemoryIndex.search uses the 1-doc corpus stats: score equals the
    bit-exact BM25 formula with docCount=1, df=1, avgdl=fieldLen."""
    from lucene_solr_spark.analysis.smallfloat import encode_norm
    from lucene_solr_spark.search.bm25 import avgdl_f32, make_term_weight

    mi = MemoryIndex("spark merge spark index")
    tw = make_term_weight("spark", 1, 1, avgdl_f32(4, 1))
    nb = np.array([int(encode_norm(np.array([4]))[0])], dtype=np.uint8)
    expect = tw.score(np.array([2.0], dtype=np.float32), nb)[0]
    assert np.float32(mi.search("spark")) == expect


def test_match_semantics():
    mi = MemoryIndex("fast merge sort algorithm")
    assert mi.search("merge") > 0.0
    assert mi.search("zebra") == 0.0
    assert mi.search("merge zebra", mode="and") == 0.0
    assert mi.search("merge sort", mode="and") > 0.0
    # MUST_NOT
    assert mi.score(BooleanSpec(should=("merge",), must_not=("sort",))) == 0.0
    # minShouldMatch 2-of-3
    assert mi.score(
        BooleanSpec(should=("fast", "zebra", "sort"), min_should_match=2)
    ) > 0.0
    assert mi.score(
        BooleanSpec(should=("fast", "zebra", "lion"), min_should_match=2)
    ) == 0.0


def test_phrase_percolation():
    mi = MemoryIndex("the quick brown fox jumps")
    assert mi.score(phrase_spec("quick brown")) > 0.0
    assert mi.score(phrase_spec("brown quick")) == 0.0
    assert mi.score(phrase_spec("quick fox", slop=1)) > 0.0


def test_registered_query_percolation():
    specs = {
        "q_merge": BooleanSpec(should=("merge",)),
        "q_phrase": phrase_spec("merge sort"),
        "q_not": BooleanSpec(should=("fast",), must_not=("merge",)),
    }
    hits = MemoryIndex("fast merge sort").percolate(specs)
    assert set(hits) == {"q_merge", "q_phrase"}
    hits2 = MemoryIndex("fast car").percolate(specs)
    assert set(hits2) == {"q_not"}


def test_distributed_percolate_matches_local(spark):
    texts = [
        (0, "fast merge sort"),
        (1, "spark joins the index"),
        (2, "fast car goes"),
        (3, "merge sort merge sort"),
        (4, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    specs = {
        "q_merge": BooleanSpec(should=("merge",)),
        "q_phrase": phrase_spec("merge sort"),
        "q_not": BooleanSpec(should=("fast",), must_not=("merge",)),
    }
    got = {
        (r["doc_id"], r["query"], np.float32(r["score"]))
        for r in percolate(df, specs).collect()
    }
    expect = {
        (did, name, np.float32(score))
        for did, txt in texts
        for name, score in MemoryIndex(txt).percolate(specs).items()
    }
    assert got == expect
    # zero shuffle: the percolation plan contains no Exchange
    plan = percolate(df, specs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
