"""SimpleQueryParser (lucene/queryparser/simple/SimpleQueryParser.java)
on the Spark engine: parse-tree structure, and rank+float32-score
identity between spark_topk_simple and the GT-round-28-pinned control
oracle (tests/test_lucene_ground_truth.py pins the control to the
compiled reference binary; this file pins the engine to the control)."""

import os
import random

import numpy as np
import pytest

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.engine import IndexSearcher
from lucene_solr_spark.search.simpleqp import (
    build_ws_oracle_index,
    parse_simple,
    simple_topk,
    spark_topk_simple,
)

VOCAB = ["aa", "ab", "abc", "bb", "bc", "cc", "cd", "dd", "-aa", "a*b"]


def test_tree_shapes():
    # flat same-operation growth
    assert parse_simple("a b c") == (
        "bool", (("", ("term", "a")), ("", ("term", "b")), ("", ("term", "c")))
    )
    # alternation wraps the current tree (right-to-left precedence)
    assert parse_simple("a | b + c") == (
        "bool", (
            ("+", ("bool", (("", ("term", "a")), ("", ("term", "b"))))),
            ("+", ("term", "c")),
        )
    )
    # negation = BQ(MUST_NOT x, SHOULD MatchAllDocs); double negation cancels
    assert parse_simple("-a") == (
        "bool", (("-", ("term", "a")), ("", ("matchall",)))
    )
    assert parse_simple("--a") == ("term", "a")
    # phrase slop, fuzzy clamp, junk fuzziness
    assert parse_simple('"a b"~3') == ("phrase", (("a", 0), ("b", 1)), 3)
    assert parse_simple("ab~9") == ("fuzzy", "ab", 2)
    assert parse_simple("ab~x") == ("term", "ab")
    # trailing-star prefix; escaped star stays a term char
    assert parse_simple("ab*") == ("prefix", "ab")
    assert parse_simple("ab\\*") == ("term", "ab*")
    # MUST default operator
    assert parse_simple("a b", default_operator="+") == (
        "bool", (("+", ("term", "a")), ("+", ("term", "b")))
    )
    # empty / whitespace-only -> MatchNoDocs
    assert parse_simple("") is None
    assert parse_simple("   ") is None


@pytest.fixture(scope="module")
def ws_corpus():
    rng = random.Random(90909)
    docs = [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 12))))
        for i in range(40)
    ]
    return docs


@pytest.fixture(scope="module")
def ws_searcher(spark, tmp_root, ws_corpus):
    d = os.path.join(tmp_root, "idx_simpleqp")
    src = spark.createDataFrame(ws_corpus, "doc_id long, content string")
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=16, fingerprint="simpleqp",
        analyzer="whitespace",
    )
    return IndexSearcher(spark, d)


def _assert_identical(got_df, exp, ctx):
    got = [(int(r["doc_id"]), np.float32(r["score"])) for r in got_df.collect()]
    expect = [(d, np.float32(s)) for d, s in exp]
    assert got == expect, (ctx, got, expect)


QUERIES = [
    "aa bb",
    "aa + bb",
    "aa | bb + cc",
    "aa -bb",
    "-bb",                       # pure negation: complement pass, all 1.0
    '"bb cc"',
    '"aa bb"~2',
    "a*",
    "ab~1",
    "aa + (bb | dd) cc",
    'aa + ""~2 bb',              # null branch keeps '+' pending
    "\\-aa",                     # escaped '-': matches the literal term
    "a\\*b",
    "aa + bb | cc + dd",
    '-"bb cc" dd',
    "-(bb | dd) aa",
    "zz -aa",                    # absent term + negation
    "zz~1 aa",
]


def test_engine_matches_control_oracle(spark, ws_searcher, ws_corpus):
    idx = build_ws_oracle_index(ws_corpus)
    for q in QUERIES:
        for op in ("", "+"):
            exp = simple_topk(idx, q, k=10, default_operator=op)
            got = spark_topk_simple(ws_searcher, q, k=10, default_operator=op)
            _assert_identical(got, exp, (q, op))


def test_engine_matches_control_randomized(spark, ws_searcher, ws_corpus):
    idx = build_ws_oracle_index(ws_corpus)
    rng = random.Random(2828)
    for _ in range(25):
        parts = []
        for _i in range(rng.randint(1, 4)):
            glue = rng.choice(["", "", "+", "|", "-", "+ ", "| "])
            r = rng.random()
            if r < 0.5:
                unit = rng.choice(VOCAB)
                if rng.random() < 0.2:
                    unit += "*" if rng.random() < 0.5 else "~1"
            elif r < 0.8:
                toks = [rng.choice(VOCAB) for _ in range(rng.randint(2, 3))]
                unit = '"' + " ".join(toks) + '"'
                if rng.random() < 0.4:
                    unit += "~" + rng.choice(["1", "2"])
            else:
                unit = "(" + " ".join(
                    rng.choice(VOCAB) for _ in range(rng.randint(1, 3))
                ) + ")"
            parts.append(glue + unit)
        q = " ".join(parts)
        op = rng.choice(["", "+"])
        exp = simple_topk(idx, q, k=10, default_operator=op)
        got = spark_topk_simple(ws_searcher, q, k=10, default_operator=op)
        _assert_identical(got, exp, (q, op))


def test_standard_chain_stopword_null_branch(spark, tmp_root):
    """Under the standard chain an all-stopword token analyzes to NULL and
    the pending '+' transfers to the NEXT token (the reference quirk);
    control mirrors the engine's analyzer."""
    from lucene_solr_spark.search.oracle import build_oracle_index
    from lucene_solr_spark.search.simpleqp import _analyzer_with_positions

    docs = [
        (0, "spark joins the shuffle"),
        (1, "spark spark sort"),
        (2, "merge sort shuffle"),
        (3, "the a an"),
    ]
    d = os.path.join(tmp_root, "idx_simpleqp_std")
    src = spark.createDataFrame(docs, "doc_id long, content string")
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=16, fingerprint="simpleqp-std",
    )
    s = IndexSearcher(spark, d)
    idx = build_oracle_index(docs)
    afn = _analyzer_with_positions("standard")
    for q, op in [
        ("spark + the sort", ""),   # 'the' -> null branch, '+' hits sort
        ('"spark joins"', ""),
        ("spark -sort", ""),
        ("-the spark", ""),         # negated null branch: plain term query
        ("spark shuffle", "+"),
    ]:
        exp = simple_topk(idx, q, k=10, default_operator=op, analyze_fn=afn)
        got = spark_topk_simple(s, q, k=10, default_operator=op)
        _assert_identical(got, exp, (q, op))
