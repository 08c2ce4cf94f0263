"""XML query parser (queryparser/xml/CoreParser.java) on the Spark
engine: rank+float32-score identity between topk_xml and the
GT-round-29-pinned control oracle (tests/test_lucene_ground_truth.py
pins the control to the compiled CoreParser; this file pins the engine
to the control)."""

import os
import random

import numpy as np
import pytest

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.engine import IndexSearcher
from lucene_solr_spark.search.simpleqp import (
    _ws_analyze,
    build_ws_oracle_index,
    oracle_topk_tree,
)
from lucene_solr_spark.search.xmlqp import XmlParserError, parse_xml_query

VOCAB = ["aa", "ab", "abc", "bb", "bc", "cc", "cd", "dd", "ee"]


@pytest.fixture(scope="module")
def ws_corpus():
    rng = random.Random(77707)
    return [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 12))))
        for i in range(40)
    ]


@pytest.fixture(scope="module")
def ws_searcher(spark, tmp_root, ws_corpus):
    d = os.path.join(tmp_root, "idx_xmlqp")
    src = spark.createDataFrame(ws_corpus, "doc_id long, content string")
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=16, fingerprint="xmlqp",
        analyzer="whitespace",
    )
    return IndexSearcher(spark, d)


QUERIES = [
    '<TermQuery fieldName="body">aa</TermQuery>',
    '<TermQuery fieldName="body" boost="2.5">aa</TermQuery>',
    '<TermsQuery fieldName="body" minimumNumberShouldMatch="2">aa bb dd</TermsQuery>',
    '<BooleanQuery fieldName="body">'
    '<Clause occurs="must"><TermQuery>aa</TermQuery></Clause>'
    '<Clause occurs="should"><TermQuery>bb</TermQuery></Clause>'
    '<Clause occurs="mustNot"><TermQuery>ee</TermQuery></Clause>'
    "</BooleanQuery>",
    # FILTER: required, unscored
    '<BooleanQuery fieldName="body">'
    '<Clause occurs="filter"><TermQuery>dd</TermQuery></Clause>'
    '<Clause occurs="should"><TermQuery>aa</TermQuery></Clause>'
    "</BooleanQuery>",
    # negation + MatchAllDocs: term-free docs match (complement pass)
    '<BooleanQuery fieldName="body">'
    '<Clause occurs="mustNot"><TermQuery>aa</TermQuery></Clause>'
    '<Clause occurs="should"><MatchAllDocsQuery/></Clause>'
    "</BooleanQuery>",
    # nested bool with boost threading
    '<BooleanQuery fieldName="body" boost="0.5">'
    '<Clause occurs="must"><BooleanQuery>'
    '<Clause occurs="should"><TermQuery>aa</TermQuery></Clause>'
    '<Clause occurs="should"><TermQuery boost="3">cc</TermQuery></Clause>'
    "</BooleanQuery></Clause>"
    '<Clause occurs="must"><TermQuery>dd</TermQuery></Clause>'
    "</BooleanQuery>",
    '<RangeQuery fieldName="body" lowerTerm="ab" upperTerm="cc"/>',
    '<DisjunctionMaxQuery fieldName="body" tieBreaker="0.3">'
    "<TermQuery>aa</TermQuery><TermQuery>cc</TermQuery>"
    "</DisjunctionMaxQuery>",
    '<ConstantScoreQuery boost="3"><BooleanQuery fieldName="body">'
    '<Clause occurs="must"><TermQuery>aa</TermQuery></Clause>'
    "</BooleanQuery></ConstantScoreQuery>",
    '<UserQuery fieldName="body">aa AND dd</UserQuery>',
    '<UserQuery fieldName="body" boost="2">aa dd^3 -ee</UserQuery>',
    '<UserQuery fieldName="body">bb bb^2 cc</UserQuery>',
    '<SpanNear fieldName="body" slop="1" inOrder="true">'
    "<SpanTerm>aa</SpanTerm><SpanTerm>bb</SpanTerm></SpanNear>",
    '<SpanNear fieldName="body" slop="2">'
    "<SpanOrTerms>aa cc</SpanOrTerms><SpanTerm>dd</SpanTerm></SpanNear>",
    '<SpanFirst fieldName="body" end="2"><SpanTerm>aa</SpanTerm></SpanFirst>',
    '<SpanNot fieldName="body"><Include>'
    '<SpanNear slop="3" inOrder="true"><SpanTerm>aa</SpanTerm>'
    "<SpanTerm>dd</SpanTerm></SpanNear></Include>"
    "<Exclude><SpanTerm>cc</SpanTerm></Exclude></SpanNot>",
    '<SpanOrTerms fieldName="body" boost="2">aa ee</SpanOrTerms>',
]


def test_engine_matches_control_oracle(spark, ws_searcher, ws_corpus):
    idx = build_ws_oracle_index(ws_corpus)
    for xmlq in QUERIES:
        tree = parse_xml_query(xmlq, _ws_analyze)
        exp = [(d, np.float32(s)) for d, s in oracle_topk_tree(idx, tree, k=10)]
        got_df = ws_searcher.topk_xml(xmlq, k=10, content_field="body")
        got = [(int(r["doc_id"]), np.float32(r["score"]))
               for r in got_df.collect()]
        assert got == exp, (xmlq, got, exp)


def test_parser_errors():
    with pytest.raises(XmlParserError):  # missing occurs throws
        parse_xml_query(
            '<BooleanQuery fieldName="body"><Clause>'
            "<TermQuery>aa</TermQuery></Clause></BooleanQuery>", _ws_analyze)
    with pytest.raises(XmlParserError):  # SpanNear slop is required
        parse_xml_query(
            '<SpanNear fieldName="body"><SpanTerm>aa</SpanTerm>'
            "<SpanTerm>bb</SpanTerm></SpanNear>", _ws_analyze)
    with pytest.raises(XmlParserError):  # unmapped element
        parse_xml_query(
            '<FuzzyLikeThisQuery fieldName="body">aa</FuzzyLikeThisQuery>',
            _ws_analyze)
    with pytest.raises(NotImplementedError):  # nested SpanNear clause
        parse_xml_query(
            '<SpanNear fieldName="body" slop="1">'
            '<SpanNear slop="0"><SpanTerm>aa</SpanTerm>'
            "<SpanTerm>bb</SpanTerm></SpanNear>"
            "<SpanTerm>cc</SpanTerm></SpanNear>", _ws_analyze)
