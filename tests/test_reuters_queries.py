"""The reference benchmark query set (ReutersQueryMaker.java:42-55)
end-to-end: parse -> BooleanSpec -> engine top-k, rank- AND score-
identical (float32) to the control oracle, on a synthetic corpus that
actually contains the Reuters vocabulary."""

import os
import random

import numpy as np
import pytest

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.engine import IndexSearcher
from lucene_solr_spark.search.oracle import build_oracle_index, oracle_topk_spec
from lucene_solr_spark.search.queryparser import parse, to_spec

VOCAB = (
    "salomon comex night trading japan sony food needs world bank nigeria "
    "ford credit airline europe canada destination long term pressure "
    "trade ministers necessary current uruguay round talks general "
    "agreement tariffs gatt succeed market price rates oil gold"
).split()

REUTERS_QUERIES = [
    "Salomon", "Comex", "night trading", "Japan Sony",
    '"Sony Japan"', '"food needs"~3',
    '"World Bank"^2 AND Nigeria', '"World Bank" -Nigeria',
    '"Ford Credit"~5',
    "airline Europe Canada destination",
    "Long term pressure by trade ministers is necessary if the current "
    "Uruguay round of talks on the General Agreement on Trade and Tariffs "
    "(GATT) is to succeed",
]


@pytest.fixture(scope="module")
def reuters_built(spark, tmp_root):
    rng = random.Random(42)
    docs = []
    for i in range(200):
        words = [VOCAB[rng.randrange(len(VOCAB))] for _ in range(rng.randrange(8, 40))]
        # seed multi-word sequences so the phrase queries have real hits
        if i % 7 == 0:
            words[2:2] = ["world", "bank"]
        if i % 9 == 0:
            words[1:1] = ["sony", "japan"]
        if i % 11 == 0:
            words[3:3] = ["food", "for", "needs"]  # sloppy-phrase gap
        if i % 13 == 0:
            words[0:0] = ["ford", "the", "credit"]
        docs.append((i, " ".join(words)))
    d = os.path.join(tmp_root, "idx_reuters")
    src = spark.createDataFrame(docs, "doc_id long, content string")
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="reuters200",
    )
    return IndexSearcher(spark, d), build_oracle_index(docs)


@pytest.mark.parametrize("q", REUTERS_QUERIES, ids=[q[:25] for q in REUTERS_QUERIES])
def test_reuters_query_rank_and_score_identity(reuters_built, q):
    searcher, oidx = reuters_built
    spec = to_spec(searcher, parse(q))
    expected = oracle_topk_spec(oidx, spec, k=10)
    got = [(r["doc_id"], r["score"]) for r in searcher.topk_spec(spec, k=10).collect()]
    assert len(got) == len(expected), (q, got, expected)
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gd == ed, (q, got, expected)
        assert np.float32(gs) == es, (q, gd, gs, es)
    # the query set must actually exercise the corpus (no silent empties
    # except queries whose vocabulary we did not seed)
    if q not in ("Comex",):
        assert got, q
