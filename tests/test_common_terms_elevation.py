"""CommonTermsQuery + QueryElevationComponent semantics.

References:
  lucene/queries/src/java/org/apache/lucene/queries/CommonTermsQuery.java:178
  solr/core/src/java/org/apache/solr/handler/component/QueryElevationComponent.java
"""

import pandas as pd

import __spark_entry__ as e
from lucene_solr_spark.ops.index_access import searcher_for
from lucene_solr_spark.search.oracle import build_oracle_index

SF = "/root/testdata/sf0.001"


def _oracle_index():
    pdf = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return build_oracle_index(list(zip(pdf.doc_id, pdf.text)))


def test_common_terms_requires_a_low_freq_match(spark):
    idx = _oracle_index()
    s = searcher_for(spark, SF)
    hits = s.topk_common_terms("dup table value", max_term_frequency=0.4, k=10).collect()
    assert len(hits) == 10
    dup_docs = set(idx.postings["dup"])
    for r in hits:
        assert r.doc_id in dup_docs  # low-freq group is REQUIRED
    # high-freq terms still contribute score: a doc with dup+table+value
    # must outrank a dup-only doc of comparable stats -> compare against
    # plain must=dup ranking: orderings differ
    plain = [r.doc_id for r in s.topk("dup", k=10).collect()]
    assert [r.doc_id for r in hits] != plain


def test_common_terms_all_high_rewrites_to_conjunction(spark):
    s = searcher_for(spark, SF)
    got = [(r.doc_id, r.score) for r in
           s.topk_common_terms("table value", max_term_frequency=0.4, k=10).collect()]
    want = [(r.doc_id, r.score) for r in s.topk("table value", k=10, mode="and").collect()]
    assert got == want


def test_common_terms_split_tracks_cutoff(spark):
    s = searcher_for(spark, SF)
    # with maxTermFrequency=1.0 nothing is "common": equals default OR+group
    # where the whole query is the required group (all terms low)
    hits_all_low = [r.doc_id for r in
                    s.topk_common_terms("dup table", max_term_frequency=1.0, k=10).collect()]
    # one of {dup, table} must match = plain OR query
    hits_or = [r.doc_id for r in s.topk("dup table", k=10, mode="or").collect()]
    assert hits_all_low == hits_or


def test_elevation_pins_config_order_then_organic(spark):
    fn = e._elevation_query_fn("merge sort", [42, 7])
    rows = fn(spark, SF).collect()
    assert [(r.doc_id, r.rank) for r in rows[:2]] == [(42, 1), (7, 2)]
    organic = [r.doc_id for r in
               e._ranked(searcher_for(spark, SF).topk("merge sort", k=12)).collect()]
    expect_tail = [d for d in organic if d not in (42, 7)][:8]
    assert [r.doc_id for r in rows[2:]] == expect_tail
    assert [r.rank for r in rows] == list(range(1, 11))
