"""Classic query parser: grammar unit tests (no JVM) + spec mapping +
end-to-end expansion through the engine."""

from lucene_solr_spark.search.queryparser import parse


def test_bare_terms_are_should():
    p = parse("fast merge sort")
    assert p.should == ["fast", "merge", "sort"]
    assert not p.must and not p.must_not


def test_must_and_not():
    p = parse("+merge fast -dup")
    assert p.must == ["merge"]
    assert p.should == ["fast"]
    assert p.must_not == ["dup"]


def test_phrase_with_slop():
    p = parse('"fast sort"~3 spark')
    assert p.slop == 3
    assert [t for t, _ in p.phrase] == ["fast", "sort"]
    assert p.should == ["spark"]


def test_phrase_keeps_stop_gap():
    p = parse('"merge the sort"')
    assert p.phrase == (("merge", 0), ("sort", 2))  # stop word leaves a gap


def test_boost():
    p = parse("spark^2 merge^0.5 vector")
    assert p.boosts == {"spark": 2.0, "merge": 0.5}
    assert p.should == ["spark", "merge", "vector"]


def test_wildcard_and_fuzzy_deferred():
    p = parse("mer* grean~1 exact")
    assert ("wildcard", "mer*", "") in p.expansions
    assert ("fuzzy", "grean:1", "") in p.expansions
    assert p.should == ["exact"]


def test_fuzzy_default_edits():
    p = parse("grean~")
    assert p.expansions == [("fuzzy", "grean:2", "")]


def test_field_prefix_stripped():
    p = parse("text:spark +body:merge")
    assert p.should == ["spark"]
    assert p.must == ["merge"]


def test_analysis_applied():
    p = parse("The SPARK")  # stopword dropped, lowercased
    assert p.should == ["spark"]


def test_parser_expansions_end_to_end(spark):
    """String -> wildcard/fuzzy term-dict expansion -> engine must equal
    the hand-built expansion (QueryParser rewrite fidelity)."""
    from lucene_solr_spark.ops.index_access import searcher_for
    from lucene_solr_spark.search.engine import BooleanSpec
    from lucene_solr_spark.search.queryparser import parse_and_search

    s = searcher_for(spark, "/root/testdata/sf0.001")

    got = [(r["doc_id"], r["score"]) for r in parse_and_search(s, "mer*", k=10).collect()]
    manual_terms = tuple(sorted(set(s.expand_terms(like="mer%", max_terms=16))))
    assert manual_terms  # the corpus has mer* terms
    want = [
        (r["doc_id"], r["score"])
        for r in s.topk_spec(BooleanSpec(should=manual_terms), k=10).collect()
    ]
    assert got == want

    got_f = [(r["doc_id"], r["score"]) for r in parse_and_search(s, "spork~1", k=10).collect()]
    fz = tuple(sorted(set(s.expand_terms(fuzzy="spork", max_edits=1, max_terms=16))))
    want_f = [
        (r["doc_id"], r["score"])
        for r in s.topk_spec(BooleanSpec(should=fz), k=10).collect()
    ] if fz else []
    assert got_f == want_f
