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


def test_english_index_stems_match_across_inflections(spark, tmp_root):
    """EnglishAnalyzer (analysis/en/EnglishAnalyzer.java): 'running',
    'runs' and a query for 'run' all meet at the stem."""
    d = os.path.join(tmp_root, "idx_english")
    src = spark.createDataFrame(
        [
            (0, "the dogs were running fast"),
            (1, "he runs a marathon"),
            (2, "a run in the park"),
            (3, "nothing related here"),
        ],
        "doc_id long, content string",
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-english",
        analyzer="english",
    )
    s = IndexSearcher(spark, d)
    assert s.analyzer == "english"
    terms = {r["term"] for r in s._term_stats.select("term").collect()}
    assert "run" in terms and "running" not in terms and "runs" not in terms
    for q in ("run", "running", "runs"):
        hits = {r["doc_id"] for r in s.topk(q, k=10).collect()}
        assert hits == {0, 1, 2}, q


def test_english_index_stem_collision_tf(spark, tmp_root):
    """Two surface forms in ONE doc merge into a single posting whose tf
    is the sum (ttf check through term stats)."""
    d = os.path.join(tmp_root, "idx_english_tf")
    src = spark.createDataFrame(
        [(0, "running runs runner"), (1, "walked walking")],
        "doc_id long, content string",
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-english-tf",
        analyzer="english",
    )
    s = IndexSearcher(spark, d)
    stats = {r["term"]: (r["df"], r["ttf"]) for r in s._term_stats.collect()}
    assert stats["run"] == (1, 2)  # running+runs merged, one doc
    assert stats["walk"] == (1, 2)


def test_folding_index_matches_unaccented_query(spark, tmp_root):
    d = os.path.join(tmp_root, "idx_folding")
    src = spark.createDataFrame(
        [(0, "crème brûlée recipe"), (1, "creme brulee recipe"), (2, "unrelated")],
        "doc_id long, content string",
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-folding",
        analyzer="folding",
    )
    s = IndexSearcher(spark, d)
    hits = {r["doc_id"] for r in s.topk("creme", k=10).collect()}
    assert hits == {0, 1}


def test_shingle_index_bigram_terms(spark, tmp_root):
    d = os.path.join(tmp_root, "idx_shingle")
    src = spark.createDataFrame(
        [(0, "quick brown fox"), (1, "brown quick fox"), (2, "quick red fox")],
        "doc_id long, content string",
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-shingle",
        analyzer="shingle",
    )
    s = IndexSearcher(spark, d)
    terms = {r["term"] for r in s._term_stats.select("term").collect()}
    assert "quick_brown" in terms and "brown_fox" in terms
    # a shingled query is adjacency-sensitive: only doc 0 has the bigram
    hits = [r["doc_id"] for r in s.topk("quick brown", k=10).collect()]
    assert hits == [0]


def test_code_index_splits_identifiers(spark, tmp_root):
    """'code' chain: WhitespaceTokenizer + WordDelimiterFilter (pinned,
    GT round 42) + lowercase term map. Identifier subwords are
    position-adjacent (phrase across camelCase parts matches), the
    filter's posInc GAPS reach the index (a dropped leading
    all-delimiter token shifts positions), and the manifest round-trips
    the chain so query analysis splits the same way."""
    d = os.path.join(tmp_root, "idx_code")
    src = spark.createDataFrame(
        [
            (0, "getHTTPResponse PowerShot-2000"),
            (1, "--- PowerShot wifi"),
            (2, "power shot assembled_elsewhere"),
            (3, "unrelated token stream"),
        ],
        "doc_id long, content string",
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-code", analyzer="code",
    )
    s = IndexSearcher(spark, d)
    assert s.analyzer == "code"
    # query analysis uses the same chain: camelCase query splits
    assert s._analyze("PowerShot") == ["power", "shot"]
    # phrase across subwords: docs 0,1,2 all contain adjacent power,shot
    rows = s.topk_phrase("PowerShot", k=10).collect()
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 2]
    # the UPPER-run rule: HTTPResponse stays one (lowered) term
    rows = s.topk("httpresponse", k=10).collect()
    assert [r["doc_id"] for r in rows] == [0]
    # snake_case parts searchable individually
    rows = s.topk("elsewhere", k=10).collect()
    assert [r["doc_id"] for r in rows] == [2]
    # posInc gap: doc 1's 'power' sits at position 1 (dropped leading
    # '---'), so its first TWO stream slots are (gap, power) — exact
    # phrase "power shot" must still match via adjacency at (1, 2)
    from lucene_solr_spark.analysis.word_delimiter import code_stream

    assert code_stream("--- PowerShot wifi")[0] == ("Power", 2)


def test_synonym_index_stacks_outputs(spark, tmp_root):
    """Registered synonym chain (analysis/synonyms.py, pinned GT round
    43): index-time SynonymFilter stacks outputs at the match position
    (posInc 0 -> same index position), multi-word outputs interleave
    across the following positions (the reference's documented
    flattened-graph behavior), and the searcher — with the same chain
    registered, IndexWriterConfig(Analyzer) semantics — analyzes
    queries identically."""
    from lucene_solr_spark.analysis.synonyms import (
        SynonymMapBuilder,
        register_synonym_analyzer,
    )

    b = SynonymMapBuilder()
    b.add(["wi", "fi"], ["wifi"], True)
    b.add(["dns"], ["domain", "name", "service"], True)
    register_synonym_analyzer("syn_e2e", b.build(), ignore_case=True)

    d = os.path.join(tmp_root, "idx_syn")
    src = spark.createDataFrame(
        [
            (0, "wi fi is fast"),
            (1, "WiFi everywhere"),
            (2, "dns lookup tables"),
            (3, "plain words"),
        ],
        "doc_id long, content string",
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-syn", analyzer="syn_e2e",
    )
    s = IndexSearcher(spark, d)
    # 'wifi' matches both the stacked synonym (doc 0) and the literal
    # (doc 1, lowercased)
    assert sorted(r["doc_id"] for r in s.topk("wifi", k=10).collect()) == [0, 1]
    # single-word rule with multi-word output: every output word indexed
    assert [r["doc_id"] for r in s.topk("service", k=10).collect()] == [2]
    # phrase across the original tokens still exact
    assert [r["doc_id"] for r in s.topk_phrase("wi fi", k=10).collect()] == [0]
    # stacked token shares its position: phrase "wifi fi" ALSO matches
    # doc 0 (the flattened-stream behavior Lucene documents)
    assert [r["doc_id"] for r in s.topk_phrase("wifi fi", k=10).collect()] == [0]


def test_code_batch_path_equals_per_token_stream():
    """The build hot path's vocabulary-level WDF (code_stream_batch —
    filter once per DISTINCT token + the leading-drop posInc
    adjustment) is token-for-token identical to the pinned per-token
    stream, including dropped all-delimiter tokens at stream start and
    mid-stream, repeated tokens, and empty docs."""
    import random

    from lucene_solr_spark.analysis.word_delimiter import (
        code_stream,
        code_stream_batch,
    )

    rng = random.Random(77)
    frags = ["PowerShot", "XL500", "wi-fi", "O'Neil's", "--", "...", "'",
             "getHTTPResponse2", "snake_case", "a", "''", "x9y", "_", "A"]
    docs = ["", "--- --- ---"] + [
        " ".join(rng.choice(frags) for _ in range(rng.randint(0, 9)))
        for _ in range(1500)
    ]
    bt, bp = code_stream_batch(docs)
    for d, t, p in zip(docs, bt, bp):
        ref = code_stream(d)
        assert (t, p) == ([x for x, _ in ref], [x for _, x in ref]), d


def test_synonym_batch_path_equals_per_doc_stream():
    """The synonym chain's build batch path (root-key prefilter: the
    stateful machine only runs on docs containing a rule's first word;
    the rest pass through) is token-for-token identical to the per-doc
    stream — incl. ignoreCase folding of the prefilter itself."""
    import random

    from lucene_solr_spark.analysis.synonyms import (
        SynonymMapBuilder,
        _ws_offset_tokens,
        synonym_batch_fn,
        synonym_stream,
    )

    b = SynonymMapBuilder()
    b.add(["wi", "fi"], ["wifi"], True)
    b.add(["dns"], ["domain", "name", "service"], True)
    b.add(["big", "apple"], ["nyc"], False)
    trie = b.build()
    rng = random.Random(99)
    vocab = ["wi", "fi", "dns", "big", "apple", "WI", "DNS", "plain",
             "words", "x"]
    docs = ["", "plain words only"] + [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 9)))
        for _ in range(800)
    ]
    for ignore_case in (False, True):
        batch = synonym_batch_fn(trie, ignore_case)
        bt, bp = batch(docs)
        for d, t, p in zip(docs, bt, bp):
            ref = synonym_stream(_ws_offset_tokens(d), trie, ignore_case)
            assert t == [x for x, *_ in ref], (ignore_case, d)
            assert p == [x for _x, x, *_ in ref], (ignore_case, d)


def test_commongrams_index_and_query_chain(spark, tmp_root):
    """commongrams chain (GT round 47, analysis/commongrams): the INDEX
    stack (whitespace -> lowercase -> CommonGramsFilter) writes unigrams
    plus stacked '_'-bigrams at the previous token's position; the QUERY
    stack (CommonGramsQueryFilter) turns a phrase containing a common
    word into the bigram TERM — so "the fox" executes against the
    bigram's own short posting list, never the stopword-scale 'the'
    posting (the index-side complement of CommonTermsQuery)."""
    from lucene_solr_spark.analysis.commongrams import (
        register_commongrams_analyzer,
    )
    from lucene_solr_spark.analysis.tokenizer import (
        analyze_as,
        analyze_with_positions_as,
    )

    register_commongrams_analyzer("cgtest", {"the", "a", "of"})
    d = os.path.join(tmp_root, "idx_commongrams")
    src = spark.createDataFrame(
        [
            (0, "The fox jumped"),
            (1, "a fox and the hound"),
            (2, "fox of the year"),
            (3, "unrelated words here"),
        ],
        "doc_id long, content string",
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-commongrams",
        analyzer="cgtest",
    )
    s = IndexSearcher(spark, d)
    assert s.analyzer == "cgtest"
    terms = {r["term"] for r in s._term_stats.select("term").collect()}
    # unigrams AND stacked bigrams, lowercased before the gram decision
    assert {"the", "fox", "the_fox", "a_fox", "fox_of", "of_the", "the_year"} <= terms
    # query-side analysis: bag and phrase both rewrite to the bigram
    assert analyze_as("cgtest", "The fox") == ["the_fox"]
    assert analyze_with_positions_as("cgtest", "The fox") == [("the_fox", 0)]
    # the bigram term query hits only docs with the adjacency
    hits = {r["doc_id"] for r in s.topk("The fox", k=10).collect()}
    assert hits == {0}
    # phrase path: "fox of the year" -> fox_of(0) of_the(1) the_year(2)
    pairs = analyze_with_positions_as("cgtest", "fox of the year")
    assert pairs == [("fox_of", 0), ("of_the", 1), ("the_year", 2)]
    hits = [r["doc_id"] for r in s.topk_phrase("fox of the year", k=10).collect()]
    assert hits == [2]
    # a trailing common word still resolves to one bigram term
    assert analyze_with_positions_as("cgtest", "the hound") == [("the_hound", 0)]
    hits = [r["doc_id"] for r in s.topk_phrase("the hound", k=10).collect()]
    assert hits == [1]
    # mixed bigram+unigram phrase rides the STACKED index positions
    # (gram at the first word's position): a_fox@0 fox@1 and@2 in doc 1
    pairs = analyze_with_positions_as("cgtest", "a fox and")
    assert pairs == [("a_fox", 0), ("fox", 1), ("and", 2)]
    hits = [r["doc_id"] for r in s.topk_phrase("a fox and", k=10).collect()]
    assert hits == [1]


def test_reversed_wildcard_index_and_leading_query(spark, tmp_root):
    """Reversed-wildcard chain (GT round 48, solr ReversedWildcardFilter):
    the index holds each token twice (original + marker-reversed at the
    same position); a leading wildcard answers from the reversed terms
    via a PREFIX-sargable term-dictionary scan, and a non-reversed
    pattern subtracts the marker-prefixed reversed twins."""
    from lucene_solr_spark.analysis.revwildcard import (
        MARKER,
        expand_leading_wildcard,
        leading_wildcard_topk,
        register_reversed_wildcard_analyzer,
        should_reverse,
    )

    register_reversed_wildcard_analyzer("rwtest")
    d = os.path.join(tmp_root, "idx_revwild")
    src = spark.createDataFrame(
        [
            (0, "running jumping"),
            (1, "Sing a song"),
            (2, "nothing here moves"),
            (3, "plain words only"),
        ],
        "doc_id long, content string",
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-revwild",
        analyzer="rwtest",
    )
    s = IndexSearcher(spark, d)
    terms = {r["term"] for r in s._term_stats.select("term").collect()}
    assert "running" in terms and MARKER + "gninnur" in terms
    # '*ing' reverses to a prefix scan on marker+'gni'
    assert should_reverse("*ing")
    cands, used_rev = expand_leading_wildcard(s, "*ing")
    assert used_rev
    assert set(cands) == {MARKER + "gninnur", MARKER + "gnipmuj",
                          MARKER + "gnis", MARKER + "gnihton"}
    hits = {r["doc_id"] for r in leading_wildcard_topk(s, "*ing", k=10).collect()}
    assert hits == {0, 1, 2}
    # UPPER-case query: lowercased like the chain
    hits2 = {r["doc_id"] for r in leading_wildcard_topk(s, "*ING", k=10).collect()}
    assert hits2 == hits
    # trailing wildcard is NOT reversed and excludes the reversed twins
    cands, used_rev = expand_leading_wildcard(s, "run*")
    assert not used_rev and cands == ["running"]
    # a non-reversed pattern that COULD match marker terms subtracts them:
    # with minTrailing=3, '?ing' stays unreversed; '?' must not match the
    # marker char of reversed twins like MARKER+'gnis'
    cands, used_rev = expand_leading_wildcard(s, "?ing", min_trailing=5)
    assert not used_rev and cands == ["sing"]
    # scale posture: the reversed expansion pushes a sargable StartsWith
    # into the term-stats scan (parquet min/max pruning); the naive
    # leading-LIKE scan has no pushable prefix
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.revwildcard import (
        concrete_prefix,
        rewrite_reversed_pattern,
    )

    pat = rewrite_reversed_pattern("*ing")
    pruned = s._term_stats.select("term").filter(
        F.col("term").startswith(concrete_prefix(pat))
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "StringStartsWith" in plan


def test_cjk_index_bigram_retrieval(spark, tmp_root):
    """'cjk' chain (GT round 49, analysis/cjk): CJK runs index as
    sliding bigrams — a two-ideograph query is ONE bigram term whose df
    has phrase selectivity, lone CJK chars index as unigrams, width
    variants fold (fullwidth ASCII, halfwidth kana + voice-mark
    composition), and non-CJK text retrieves unchanged."""
    from lucene_solr_spark.analysis.tokenizer import analyze_as

    # chain semantics before the index round-trip
    assert analyze_as("cjk", "漢字の話") == ["漢字", "字の", "の話"]
    assert analyze_as("cjk", "一") == ["一"]
    assert analyze_as("cjk", "ＡＢＣ ｶﾞキ") == ["abc", "ガキ"]
    assert analyze_as("cjk", "merge 漢字 sort") == ["merge", "漢字", "sort"]

    d = os.path.join(tmp_root, "idx_cjk")
    src = spark.createDataFrame(
        [
            (0, "漢字の勉強 merge"),
            (1, "字の話"),
            (2, "漢 字"),            # space-broken: unigrams only
            (3, "ガキ sort"),
            (4, "ｶﾞキ plain"),     # halfwidth folds to the same bigram
            (5, "unrelated text"),
        ],
        "doc_id long, content string",
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-cjk", analyzer="cjk",
    )
    s = IndexSearcher(spark, d)
    terms = {r["term"] for r in s._term_stats.select("term").collect()}
    assert {"漢字", "字の", "の話", "ガキ", "漢", "字"} <= terms
    # the bigram query hits only true adjacencies, not the space-broken doc
    hits = {r["doc_id"] for r in s.topk("漢字", k=10).collect()}
    assert hits == {0}
    # width variants meet at the folded bigram
    hits = {r["doc_id"] for r in s.topk("ｶﾞキ", k=10).collect()}
    assert hits == {3, 4}
    # unigram query hits the lone chars (doc 2), not inside-run chars
    hits = {r["doc_id"] for r in s.topk("漢", k=10).collect()}
    assert hits == {2}
    # phrase across the bigram positions: 漢字+字の adjacent in doc 0
    hits = [r["doc_id"] for r in s.topk_phrase("漢字の", k=10).collect()]
    assert hits == [0]


def test_mapping_charfilter_chain(spark, tmp_root):
    """Mapping char-filter chain (GT round 50): the pre-tokenizer
    stage rewrites the CHARACTER stream, so replacements that contain
    separators create real tokens ('&' -> ' and ') and grapheme
    normalizations merge variants ('ph' -> 'f') before the tokenizer
    ever runs — Analyzer.initReader semantics. The same registration
    analyzes queries, and the chain spec rides to Spark workers like
    the synonym chains."""
    from lucene_solr_spark.analysis.charfilters import (
        mapping_char_filter,
        register_mapping_analyzer,
    )

    register_mapping_analyzer(
        "maptest", {"&": " and ", "ph": "f"}, base="simple"
    )
    d = os.path.join(tmp_root, "idx_mapping")
    src = spark.createDataFrame(
        [
            (0, "salt & pepper"),
            (1, "salt and pepper"),
            (2, "phantom loophole"),
            (3, "fantom loofole"),
            (4, "unrelated"),
        ],
        "doc_id long, content string",
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-mapping",
        analyzer="maptest",
    )
    s = IndexSearcher(spark, d)
    assert s.analyzer == "maptest"
    hits = {r["doc_id"] for r in s.topk("and", k=10).collect()}
    assert hits == {0, 1}
    hits = {r["doc_id"] for r in s.topk("phantom", k=10).collect()}
    assert hits == {2, 3}  # both sides meet at 'fantom'
    hits = {r["doc_id"] for r in s.topk("loofole", k=10).collect()}
    assert hits == {2, 3}
    # offset correction maps filtered offsets back to original text
    out, om = mapping_char_filter("salt & pepper", {"&": " and "})
    assert out == "salt  and  pepper"
    start = out.index("and")
    assert om.correct(start) <= 5 <= om.correct(start + 3)


def test_english_dual_index_exact_and_stemmed(spark, tmp_root):
    """'english_dual' chain (GT round 51): every word indexes as its
    original form plus its stem at the same position, so exact-form
    queries stay precise while the stem meets across inflections —
    Lucene's KeywordRepeatFilter + stemmer + RemoveDuplicates idiom."""
    from lucene_solr_spark.analysis.tokenizer import analyze_with_positions_as

    d = os.path.join(tmp_root, "idx_english_dual")
    src = spark.createDataFrame(
        [
            (0, "the dogs were running fast"),
            (1, "he runs a marathon"),
            (2, "a run in the park"),
            (3, "nothing related here"),
        ],
        "doc_id long, content string",
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-english-dual",
        analyzer="english_dual",
    )
    s = IndexSearcher(spark, d)
    terms = {r["term"] for r in s._term_stats.select("term").collect()}
    # originals AND stems coexist
    assert {"running", "runs", "run", "dogs", "dog"} <= terms
    # the stem meets across inflections
    hits = {r["doc_id"] for r in s.topk("run", k=10).collect()}
    assert hits == {0, 1, 2}
    # the exact form stays precise
    hits = {r["doc_id"] for r in s.topk("running", k=10).collect()}
    assert hits == {0}
    hits = {r["doc_id"] for r in s.topk("runs", k=10).collect()}
    assert hits == {1}
    # the QUERY side is the plain lowercase stack (no repeat/stem):
    # the user's form picks the semantics
    assert analyze_with_positions_as("english_dual", "Running fast") == [
        ("running", 0), ("fast", 1),
    ]
    # stacked index positions: a stem phrase crosses the inflection
    hits = [r["doc_id"] for r in s.topk_phrase("run fast", k=10).collect()]
    assert hits == [0]


def test_edge_ngram_prefix_as_term(spark, tmp_root):
    """edge-gram chain (GT round 52): prefixes of length min..max index
    as their own terms, so a prefix query is ONE term lookup on the
    gram's posting list — no term-dictionary range scan. Results match
    the standard index's expand-then-score prefix path on doc sets."""
    from lucene_solr_spark.analysis.filters import register_edge_ngram_analyzer

    register_edge_ngram_analyzer("egtest", 1, 6)
    d = os.path.join(tmp_root, "idx_edgegram")
    src = spark.createDataFrame(
        [
            (0, "merge sort fast"),
            (1, "merged table row"),
            (2, "mercury rising"),
            (3, "unrelated words"),
        ],
        "doc_id long, content string",
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-edgegram",
        analyzer="egtest",
    )
    s = IndexSearcher(spark, d)
    terms = {r["term"] for r in s._term_stats.select("term").collect()}
    assert {"m", "me", "mer", "merge", "merged", "mercur"} <= terms
    # a prefix query IS a term query on the gram
    hits = {r["doc_id"] for r in s.topk("mer", k=10).collect()}
    assert hits == {0, 1, 2}
    hits = {r["doc_id"] for r in s.topk("merge", k=10).collect()}
    assert hits == {0, 1}  # 'merge' is a prefix of 'merged' too
    hits = {r["doc_id"] for r in s.topk("mercu", k=10).collect()}
    assert hits == {2}
    # grams stack at the word's position: phrase 'mer sort' aligns with
    # 'merge sort' (prefix gram at the same position as its word)
    hits = [r["doc_id"] for r in s.topk_phrase("mer sort", k=10).collect()]
    assert hits == [0]


def test_pattern_tokenizer_chain(spark, tmp_root):
    """'pattern' chain (GT round 53): Solr's PatternTokenizerFactory
    field type — a regex split tokenizer (here on CSV separators)."""
    from lucene_solr_spark.analysis.pattern import register_pattern_analyzer

    register_pattern_analyzer("csvtest", r"[,;\s]+")
    d = os.path.join(tmp_root, "idx_pattern")
    src = spark.createDataFrame(
        [(0, "Alpha,beta;;GAMMA delta"), (1, "beta,epsilon"), (2, "unrelated")],
        "doc_id long, content string",
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-pattern",
        analyzer="csvtest",
    )
    s = IndexSearcher(spark, d)
    hits = {r["doc_id"] for r in s.topk("beta", k=10).collect()}
    assert hits == {0, 1}
    hits = {r["doc_id"] for r in s.topk("gamma", k=10).collect()}
    assert hits == {0}


def test_path_hierarchy_chain_directory_drilldown(spark, tmp_root):
    """'path' chain (GT round 54): every ancestor prefix indexes as a
    term at one position, so a DIRECTORY term query matches every file
    under it — no prefix scan, just a posting-list read (the natural
    field type for the source-code corpus's `path` column)."""
    from lucene_solr_spark.analysis.path_hierarchy import register_path_analyzer

    register_path_analyzer("pathtest")
    register_path_analyzer("extest", reverse=True)
    d = os.path.join(tmp_root, "idx_path")
    src = spark.createDataFrame(
        [
            (0, "/src/main/app.py"),
            (1, "/src/main/util.py"),
            (2, "/src/test/test_app.py"),
            (3, "/docs/index.md"),
        ],
        "doc_id long, content string",
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-path",
        analyzer="pathtest",
    )
    s = IndexSearcher(spark, d)
    hits = {r["doc_id"] for r in s.topk("/src/main", k=10).collect()}
    assert hits == {0, 1}
    hits = {r["doc_id"] for r in s.topk("/src", k=10).collect()}
    assert hits == {0, 1, 2}
    hits = {r["doc_id"] for r in s.topk("/src/main/app.py", k=10).collect()}
    assert hits == {0}
    # reverse chain: suffix terms (extension drill direction)
    d2 = os.path.join(tmp_root, "idx_path_rev")
    build_index(
        spark, src, out_dir=d2, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-path-rev",
        analyzer="extest",
    )
    s2 = IndexSearcher(spark, d2)
    hits = {r["doc_id"] for r in s2.topk("app.py", k=10).collect()}
    assert hits == {0}
    hits = {r["doc_id"] for r in s2.topk("index.md", k=10).collect()}
    assert hits == {3}


def test_english_snowball_index_stems_meet(spark, tmp_root):
    """'english_snowball' chain (GT round 56): EnglishAnalyzer shape with
    the Snowball English (Porter2) tail — stems meet across inflections
    where Porter1 and Porter2 AGREE, and the Porter2-specific forms
    (exception list, short-word e-restore) index as pinned."""
    from lucene_solr_spark.analysis.snowball_en import porter2_stem
    from lucene_solr_spark.analysis.tokenizer import analyze_as

    d = os.path.join(tmp_root, "idx_english_snowball")
    src = spark.createDataFrame(
        [
            (0, "the dogs were running fast"),
            (1, "he runs a marathon hoping to win"),
            (2, "a run in the park while hopping"),
            (3, "dying flies lying around"),
        ],
        "doc_id long, content string",
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-english-snowball",
        analyzer="english_snowball",
    )
    s = IndexSearcher(spark, d)
    terms = {r["term"] for r in s._term_stats.select("term").collect()}
    # Porter2 specifics: hoping->hope (e restored), hopping->hop
    # (undoubled), dying->die (exception1), flies->fli, lying->lie
    assert {"hope", "hop", "die", "fli", "lie", "run", "dog"} <= terms
    assert "hoping" not in terms and "dying" not in terms
    # the stem meets across inflections end-to-end
    hits = {r["doc_id"] for r in s.topk("run", k=10).collect()}
    assert hits == {0, 1, 2}
    hits = {r["doc_id"] for r in s.topk("dies", k=10).collect()}
    assert hits == {3}
    # query side runs the same chain
    assert analyze_as("english_snowball", "Hoping to Die") == ["hope", "die"]
    # gener- R1-prefix rule: generalization keeps the gener stem region
    assert porter2_stem("generalization") == "general"


def test_classic_index_keeps_emails_and_hosts(spark, tmp_root):
    """'classic' chain (GT round 58): the pre-3.1 grammar indexes
    emails, hostnames, acronyms (dots stripped), and serial numbers as
    SINGLE terms, so they are searchable exactly — the reason this
    analyzer survives in identifier-heavy corpora."""
    from lucene_solr_spark.analysis.tokenizer import analyze_as

    d = os.path.join(tmp_root, "idx_classic")
    src = spark.createDataFrame(
        [
            (0, "contact Dev@Example.COM about the U.S.A. release"),
            (1, "host www.example.com runs build X99-12/34"),
            (2, "plain words only here"),
        ],
        "doc_id long, content string",
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-classic",
        analyzer="classic",
    )
    s = IndexSearcher(spark, d)
    terms = {r["term"] for r in s._term_stats.select("term").collect()}
    assert {"dev@example.com", "usa", "www.example.com", "x99-12/34"} <= terms
    hits = {r["doc_id"] for r in s.topk("dev@example.com", k=10).collect()}
    assert hits == {0}
    hits = {r["doc_id"] for r in s.topk("x99-12/34", k=10).collect()}
    assert hits == {1}
    # query side runs the same chain (stopwords removed by the tail)
    assert analyze_as("classic", "The U.S.A. Dev@Example.COM") == [
        "usa", "dev@example.com",
    ]


def test_auto_stop_words_from_index_stats(spark, tmp_root):
    """IndexSearcher.auto_stop_words (GT round 59): the stop set derives
    from the index's OWN term_stats df column with the reference's
    strict-> threshold; analyze_auto_stop drops them with StopFilter
    position gaps."""
    d = os.path.join(tmp_root, "idx_autostop")
    rows = [(i, ("common " if i % 2 == 0 else "") + f"uniq{i} filler")
            for i in range(10)]
    src = spark.createDataFrame(rows, "doc_id long, content string")
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-autostop",
    )
    s = IndexSearcher(spark, d)
    # df: filler=10, common=5, uniq*=1 each; numDocs=10
    assert s.auto_stop_words(0.4) == {"filler", "common"}
    assert s.auto_stop_words(0.5) == {"filler"}  # 5 > 5 is false
    assert s.auto_stop_words(max_doc_freq=0) == (
        {"filler", "common"} | {f"uniq{i}" for i in range(10)}
    )
    # gaps accumulate across dropped stopwords
    assert s.analyze_auto_stop("common filler uniq3", 0.4) == [("uniq3", 3)]


def test_quality_benchmark_over_engine(spark, tmp_root):
    """search/quality.py over the REAL engine: IndexSearcher.topk ranks,
    TREC qrels judge, QualityStats metrics come out — the relevance-
    tuning loop's evaluation harness end-to-end."""
    from lucene_solr_spark.search.quality import (
        parse_trec_qrels,
        quality_benchmark,
    )

    d = os.path.join(tmp_root, "idx_quality")
    src = spark.createDataFrame(
        [
            (0, "merge sort fast"),
            (1, "merge join slow"),
            (2, "vector search fast"),
            (3, "unrelated words"),
        ],
        "doc_id long, content string",
    )
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=64, fingerprint="an-quality",
    )
    s = IndexSearcher(spark, d)
    qrels = parse_trec_qrels([
        "q1 0 d0 1", "q1 0 d1 1", "q2 0 d2 1", "q2 0 d0 0",
    ])

    def topk_names(text, k):
        return [f"d{r['doc_id']}" for r in s.topk(text, k=k).collect()]

    per_q, avg = quality_benchmark(
        topk_names, [("q1", "merge"), ("q2", "fast")], qrels, max_results=4)
    assert per_q[0].recall == 1.0 and per_q[0].num_good_points == 2
    assert per_q[0].get_mrr() == 1.0
    assert per_q[1].max_good_points == 1.0 and per_q[1].recall == 1.0
    assert 0.0 < avg.avp() <= 1.0


def test_multifield_searcher_matches_control_oracle(spark, tmp_root):
    """MultiFieldSearcher (GT round 61) end-to-end: two per-field Spark
    indexes over the same doc ids (title built over docs that HAVE a
    title — Lucene's per-field docCount), MultiFieldQueryParser scoring,
    rank + float32 score identical to the binary-pinned control oracle,
    with and without per-field boosts."""
    import random as _random

    import numpy as np
    from pyspark.sql import functions as F

    from lucene_solr_spark.search.multifield import (
        MultiFieldSearcher,
        oracle_topk_multifield,
    )
    from lucene_solr_spark.search.oracle import build_oracle_index

    rng = _random.Random(616161)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    rows = []
    for i in range(40):
        title = " ".join(
            rng.choice(vocab) for _ in range(rng.randint(0, 3)))
        body = " ".join(
            rng.choice(vocab) for _ in range(rng.randint(1, 12)))
        rows.append((i, title, body))
    src = spark.createDataFrame(rows, "doc_id long, title string, body string")

    dirs = {}
    for fld in ("title", "body"):
        d = os.path.join(tmp_root, f"idx_mf_{fld}")
        build_index(
            spark, src.filter(F.length(fld) > 0), out_dir=d,
            content_col=fld, doc_id_col="doc_id", meta_cols=[],
            range_size=16, fingerprint=f"mf-{fld}",
        )
        dirs[fld] = d
    mfs = MultiFieldSearcher(
        spark, {f: IndexSearcher(spark, d) for f, d in dirs.items()})

    ti = build_oracle_index([(i, t) for i, t, _b in rows if t])
    bi = build_oracle_index([(i, b) for i, _t, b in rows])
    for boosts, tie, msm in [
        (None, None, 0), ({"title": 2.0, "body": 0.5}, None, 0),
        (None, 0.3, 0), ({"title": 3.0, "body": 0.2}, 0.5, 2),
    ]:
        for q in ["aa", "aa bb", "cc dd ee", "aa aa", "bb zz"]:
            exp = oracle_topk_multifield(
                {"title": ti, "body": bi}, q.split(), boosts, k=10,
                dismax_tie=tie, msm=msm)
            got = [
                (r["doc_id"], np.float32(r["score"]))
                for r in mfs.topk(
                    q, k=10, boosts=boosts, dismax_tie=tie, msm=msm,
                ).collect()
            ]
            assert [d for d, _ in got] == [d for d, _ in exp], (
                boosts, tie, msm, q, got, exp)
            for (gd, gs), (ed, es) in zip(got, exp):
                assert gs == es, (boosts, tie, msm, q, gd, gs, es)


def test_span_masked_engine_matches_pinned_oracle(spark, tmp_root):
    """FieldMaskingSpanQuery end-to-end (GT round 75): cross-field
    SpanNear/SpanFirst over two per-field Spark indexes, rank + float32
    score identical to `oracle_topk_span_masked` (itself pinned
    bit-for-bit vs the compiled binary). Includes docs with an empty
    annotation field so the per-field docCounts differ."""
    import random as _random

    import numpy as np
    from pyspark.sql import functions as F

    from lucene_solr_spark.search.multifield import (
        MultiFieldSearcher,
        oracle_topk_span_masked,
    )
    from lucene_solr_spark.search.oracle import build_oracle_index

    rng = _random.Random(757575)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    alt_vocab = ["nn", "vb", "jj"]
    rows = []
    for i in range(36):
        n = rng.randint(1, 10)
        body = " ".join(rng.choice(vocab) for _ in range(n))
        m = n if rng.random() < 0.6 else rng.choice([0, rng.randint(1, 10)])
        alt = " ".join(rng.choice(alt_vocab) for _ in range(m))
        rows.append((i, body, alt))
    src = spark.createDataFrame(rows, "doc_id long, body string, alt string")

    dirs = {}
    for fld in ("body", "alt"):
        d = os.path.join(tmp_root, f"idx_mask_{fld}")
        build_index(
            spark, src.filter(F.length(fld) > 0), out_dir=d,
            content_col=fld, doc_id_col="doc_id", meta_cols=[],
            range_size=16, fingerprint=f"mask-{fld}",
        )
        dirs[fld] = d
    mfs = MultiFieldSearcher(
        spark, {f: IndexSearcher(spark, d) for f, d in dirs.items()})

    bi = build_oracle_index([(i, b) for i, b, _a in rows])
    ai = build_oracle_index([(i, a) for i, _b, a in rows if a])
    of = {"body": bi, "alt": ai}

    for _ in range(10):
        nc = rng.randint(2, 3)
        clauses = [("body", rng.choice(vocab))]
        for _ci in range(nc - 1):
            if rng.random() < 0.7:
                clauses.append(("alt", rng.choice(alt_vocab)))
            else:
                clauses.append(("body", rng.choice(vocab)))
        rng.shuffle(clauses)
        slop = rng.randint(0, 3)
        in_order = rng.random() < 0.5
        exp = oracle_topk_span_masked(
            of, clauses, slop=slop, in_order=in_order, k=10,
            mask_to="body")
        got = [
            (r["doc_id"], np.float32(r["score"]))
            for r in mfs.topk_span_masked(
                clauses, slop=slop, in_order=in_order, k=10,
                mask_to="body",
            ).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in exp], (
            clauses, slop, in_order, got, exp)
        for (gd, gs), (_ed, es) in zip(got, exp):
            assert gs == es, (clauses, slop, in_order, gd, gs, es)


def test_language_chain_index_end_to_end(spark, tmp_root):
    """A language analyzer chain through the REAL index build+search
    path (r4): build with analyzer='french_light' over a French corpus,
    assert the term dictionary equals the pinned chain's stemmed
    output (elision + stop + light stem applied at index time), and a
    stemmed-form query matches docs whose surface forms differ."""
    from lucene_solr_spark.analysis.french_light import french_tokens

    docs = [
        (0, "les nations nationales l'information"),
        (1, "nous informons la nation"),
        (2, "d'autres continuations sans rapport"),
    ]
    d = os.path.join(tmp_root, "idx_frlight")
    src = spark.createDataFrame(docs, "doc_id long, content string")
    build_index(
        spark, src, out_dir=d, content_col="content", doc_id_col="doc_id",
        meta_cols=[], range_size=16, fingerprint="an-frlight",
        analyzer="french_light",
    )
    s = IndexSearcher(spark, d)
    terms = {r["term"] for r in s._term_stats.select("term").collect()}
    want = {t for _i, txt in docs for t in french_tokens(txt)}
    assert terms == want, (terms, want)
    # expected hits derived from the SAME pinned chain: a query matches
    # every doc sharing its stemmed form (surface forms differ)
    for q in ("nation", "nations", "l'information", "informons",
              "continuation"):
        want_hits = {
            i for i, txt in docs
            if set(french_tokens(q)) & set(french_tokens(txt))
        }
        hits = {r["doc_id"] for r in s.topk(q, k=10).collect()}
        assert hits == want_hits, (q, hits, want_hits)
    # and at least one conflation across distinct surface forms exists
    assert {r["doc_id"] for r in s.topk("nations", k=10).collect()} == {0, 1}
