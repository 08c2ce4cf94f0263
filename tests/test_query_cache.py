"""LRUQueryCache analog: FILTER doc-set caching with the usage-tracking
policy (search/LRUQueryCache.java, UsageTrackingQueryCachingPolicy.java).
"""

import os

import numpy as np
import pytest

from lucene_solr_spark.analysis.tokenizer import analyze
from lucene_solr_spark.corpus import make_corpus
from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.engine import FilterCache, IndexSearcher

N_DOCS = 200


@pytest.fixture(scope="module")
def cache_idx(spark, tmp_root):
    pdf = make_corpus(N_DOCS, seed=23).assign(doc_id=range(N_DOCS))
    src = spark.createDataFrame(pdf)
    out = os.path.join(tmp_root, "idx_qcache")
    build_index(
        spark,
        src,
        out_dir=out,
        content_col="content",
        doc_id_col="doc_id",
        range_size=64,
        fingerprint="qcache200v1",
    )
    return IndexSearcher(spark, out), pdf


def _docs_with(pdf, term):
    return {int(r.doc_id) for r in pdf.itertuples() if term in analyze(r.content)}


# ---------------- filter semantics vs brute force ----------------


def test_filter_must_is_intersection(cache_idx):
    s, pdf = cache_idx
    got = set(s.filter_docs(must="parse index").tolist())
    assert got == _docs_with(pdf, "parse") & _docs_with(pdf, "index")


def test_filter_should_is_union(cache_idx):
    s, pdf = cache_idx
    got = set(s.filter_docs(should="parse index").tolist())
    assert got == _docs_with(pdf, "parse") | _docs_with(pdf, "index")


def test_filter_must_not_excludes(cache_idx):
    s, pdf = cache_idx
    got = set(s.filter_docs(must="parse", must_not="merge").tolist())
    assert got == _docs_with(pdf, "parse") - _docs_with(pdf, "merge")


def test_filter_missing_must_term_matches_nothing(cache_idx):
    s, _ = cache_idx
    assert s.filter_docs(must="parse zzz_absent").size == 0


# ---------------- caching policy (unit) ----------------


def test_policy_caches_only_after_min_frequency():
    c = FilterCache(min_frequency=2)
    key = (("a",), (), ())
    assert c.get(key) is None  # 1st sighting
    assert not c.put(key, np.arange(3))  # freq 1 < 2: not cached
    assert c.get(key) is None  # 2nd sighting
    assert c.put(key, np.arange(3))  # now cached
    assert c.get(key) is not None
    assert (c.misses, c.hits) == (2, 1)


def test_lru_eviction_order():
    c = FilterCache(max_entries=2, min_frequency=1)
    k1, k2, k3 = ((("x",), (), ()), (("y",), (), ()), (("z",), (), ()))
    for k in (k1, k2):
        c.get(k)
        assert c.put(k, np.arange(1))
    c.get(k1)  # touch k1 -> k2 becomes LRU
    c.get(k3)
    c.put(k3, np.arange(1))
    assert c.evictions == 1
    assert c.get(k2) is None  # evicted
    assert c.get(k1) is not None


def test_huge_doc_sets_are_never_pinned():
    c = FilterCache(min_frequency=1, max_docs=10)
    key = (("big",), (), ())
    c.get(key)
    assert not c.put(key, np.arange(11))


# ---------------- end-to-end: cache engaged + scored filter query ----------------


def test_repeated_filter_hits_cache(cache_idx):
    s, _ = cache_idx
    s.query_cache = FilterCache()  # fresh stats
    a = s.filter_docs(must="merge")  # miss, not yet cached
    b = s.filter_docs(must="merge")  # miss, cached now
    c = s.filter_docs(must="merge")  # hit
    assert (s.query_cache.misses, s.query_cache.hits) == (2, 1)
    assert a.tolist() == b.tolist() == c.tolist()


def test_topk_filtered_equals_brute_force(cache_idx):
    s, pdf = cache_idx
    from lucene_solr_spark.search.engine import BooleanSpec

    full = s.topk_spec(
        BooleanSpec(should=tuple(s._analyze("parse"))), k=N_DOCS
    ).collect()
    allowed = _docs_with(pdf, "index") & _docs_with(pdf, "merge")
    expect = [
        (r["doc_id"], r["score"]) for r in full if r["doc_id"] in allowed
    ][:10]
    got = s.topk_filtered("parse", k=10, must="index merge")
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == expect
