"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: build (or reuse) the inverted index over
sf0.001 documents and run a BM25 top-k search through the full engine
(posting blocks, WAND pruning, sha256 verification join).

`queries()` — one entry per implemented operator (SURVEY.md §2).
`oracle_sql()` — DuckDB-equivalent SQL for each query.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from lucene_solr_spark.ops.bm25_sql import (
    bm25_boolean_sql,
    bm25_boosted_sql,
    bm25_compound_sql,
    bm25_dismax_sql,
    bm25_boosting_sql,
    bm25_filter_clause_sql,
    bm25_mlt_sql,
    bm25_mlt_text_sql,
    bm25_numeric_filter_sql as _bm25_numeric_filter_sql,
    numeric_range_root_sql as _numeric_range_root_sql,
    bm25_multi_phrase_sql,
    bm25_phrase_sql,
    bm25_regexp_sql,
    bm25_rescore_sql,
    bm25_simple_negation_sql,
    bm25_span_first_sql,
    bm25_span_near_sql,
    bm25_span_containing_sql,
    bm25_span_not_sql,
    bm25_span_position_range_sql,
    bm25_span_or_sql,
    bm25_span_within_sql,
    bm25_synonym_sql,
    bm25_topk_sql,
    classic_tfidf_sql,
)
from lucene_solr_spark.ops.index_access import payload_searcher_for as _payload_searcher
from lucene_solr_spark.ops.index_access import searcher_for as _searcher
from lucene_solr_spark.ops.pipeline import OPS as PIPELINE_OPS
from lucene_solr_spark.ops.relational import OPS as RELATIONAL_OPS
from lucene_solr_spark.search.queryparser import parse_and_search

# (name, query string, mode)
BM25_QUERIES = [
    ("bm25_term", "spark", "or"),
    ("bm25_or", "fast merge sort", "or"),
    ("bm25_and", "dup merge", "and"),
    ("bm25_rare_hot", "dup join", "or"),  # rare + stopword-scale term (WAND stressor)
    ("bm25_dup_clause", "spark spark vector", "or"),  # duplicate SHOULD clauses
]

# name -> kwargs for IndexSearcher.topk_boolean / bm25_boolean_sql
BOOL_QUERIES = {
    "bm25_must_not": dict(must="merge sort", must_not="dup"),
    "bm25_msm": dict(should="spark vector dup", min_should_match=2),
    "bm25_must_should": dict(must="merge", should="fast sort"),
}
DISMAX_QUERIES = {"bm25_dismax": ("fast merge sort", 0.1)}
PHRASE_QUERIES = {
    "bm25_phrase": ("fast merge", 0),
    "bm25_phrase_gap": ("merge the sort", 0),  # stop-filter position gap preserved
    "bm25_phrase_sloppy": ("fast sort", 3),  # simplified SloppyPhrase match
}
SYNONYM_QUERIES = {"bm25_synonym": "fast quick rapid"}
RESCORE_QUERIES = {"bm25_rescore": ("merge sort", "spark", 50, 2.0)}
# QueryElevationComponent (solr/core/.../component/QueryElevationComponent
# .java): editorially elevated doc ids are forced to the top IN CONFIG
# ORDER (forceElevation semantics), organic hits follow re-ranked.
ELEVATION_QUERIES = {"bm25_elevation": ("merge sort", [42, 7])}
MLT_QUERIES = {"bm25_mlt": (0, 5)}  # (seed_doc_id, n_query_terms)
BOOST_QUERIES = {"bm25_boost": {"spark": 2.0, "merge": 0.5, "vector": 1.0}}
# name -> (clause terms, slop, in_order)
SPAN_QUERIES = {
    "bm25_span_near": (["fast", "merge"], 2, True),
    "bm25_span_unordered": (["sort", "merge"], 3, False),
}
# ComplexPhraseQueryParser quoted phrases (pinned vs the compiled parser
# in ground-truth round 23): the raw phrase string and the clause SPECS
# the SQL oracle re-derives independently ('terms' literal sets; 'like'
# patterns expand over the corpus dictionary IN SQL)
COMPLEX_PHRASE_QUERIES = {
    "span_complex_phrase": (
        '"(fast merge) sort"', 1,
        [("terms", ["fast", "merge"]), ("terms", ["sort"])],
    ),
    "span_complex_wildcard": (
        '"s* merge"', 2,
        [("like", "s%"), ("terms", ["merge"])],
    ),
}
# surround-language distance operator (GT round 24): 3W(mer*, sort) ->
# SpanNear([SpanOr(mer-prefix terms), sort], 2, ordered); the SQL oracle
# expands the prefix itself
SURROUND_QUERIES = {
    "span_surround": (
        "3W(mer*, sort)", [("like", "mer%"), ("terms", ["sort"])], 2,
    ),
}
# unordered distance operator with OVERLAPPING alternative sets —
# NearSpansUnordered's same-position repeats machinery (GT round 25):
# the DuckDB oracle replays the reference PriorityQueue walk as a
# recursive CTE. name -> (surround string, clause 0 alts, clause 1
# alts, slop)
SURROUND_UNORDERED_QUERIES = {
    "span_surround_overlap": (
        "4N(or(fast, merge), or(merge, sort))",
        ["fast", "merge"], ["merge", "sort"], 3,
    ),
}
# in-phrase negation: '"fast -big sort"~1' — include (fast, sort) at
# slop 1+1, exclude (fast, big, sort) at slop 1, overlapping drops
COMPLEX_PHRASE_NOT_QUERIES = {
    "span_complex_negation": (
        '"fast -big sort"', 1,
        [("terms", ["fast"]), ("terms", ["big"]), ("terms", ["sort"])],
        [False, True, False],
    ),
}
SPAN_FIRST_QUERIES = {"bm25_span_first": ("spark", 6)}  # (term, end)
# commongrams chain (GT round 47): phrase strings and their
# CommonGramsQueryFilter rewrites written out LITERALLY — the oracle
# (bm25_commongrams_phrase_sql) re-derives the index-side gram stream
# itself, so an engine rewrite bug cannot cancel out. cg_bigram_term:
# a common-word phrase collapses to ONE bigram term (the posting-list
# shortcut that is this chain's reason to exist at 100 TB);
# cg_mixed_phrase: bigram + unigrams aligned by stacked positions.
COMMONGRAMS_QUERIES = {
    "cg_bigram_term": ("the fast", [("the_fast", 0)]),
    "cg_mixed_phrase": (
        "a fast merge", [("a_fast", 0), ("fast", 1), ("merge", 2)],
    ),
}
# PayloadScoreQuery / SpanPayloadCheckQuery over the payload FIELD (the
# documents text annotated 'tok|w' by the deterministic rule in
# ops/index_access.payload_searcher_for and re-derived independently by
# the DuckDB oracle). name -> (terms, function, include_span, slop)
PAYLOAD_SCORE_QUERIES = {
    "payload_term_avg": (["value"], "avg", True, 0),
    "payload_term_max_raw": (["table"], "max", False, 0),
    "payload_near_min": (["table", "value"], "min", True, 3),
    "payload_near_avg": (["fast", "merge"], "avg", True, 4),
}
# name -> (terms, expected payloads, slop)
PAYLOAD_CHECK_QUERIES = {
    "payload_check_pair": (["fast", "merge"], [0.25, 0.5], 8),
    "payload_check_null": (["value"], [None], 0),
}
SPAN_POSRANGE_QUERIES = {"bm25_span_posrange": ("merge", 3, 20)}  # (term, lo, hi)
SPAN_OR_QUERIES = {"bm25_span_or": ["fast", "quick", "rapid"]}
# name -> (include terms, exclude term, slop)
SPAN_NOT_QUERIES = {"bm25_span_not": (["merge", "sort"], "dup", 3)}
# name -> (big terms, little term, slop, mode)
SPAN_CONTAIN_QUERIES = {
    "bm25_span_containing": (["merge", "sort"], "fast", 4, "containing"),
    "bm25_span_within": (["merge", "sort"], "fast", 4, "within"),
}
MULTI_PHRASE_QUERIES = {
    "bm25_multi_phrase": [["fast", "quick"], ["merge", "sort"]],
}
# MultiPhraseQuery.Builder.setSlop: sloppy alignment over union postings.
# The SQL oracle covers two DISJOINT positions (leapfrog-chain closed
# form); overlapping alt-sets (multi-term repeats) are pytest-gated via
# the SloppyPhraseScorer transliteration (tests/test_sloppy.py).
MULTI_PHRASE_SLOPPY_QUERIES = {
    "bm25_multi_phrase_sloppy": ([["fast", "quick"], ["sort", "merge"]], 2),
}
# NGramPhraseQuery.rewrite demo: 4-gram chain, n=2 keeps terms 0,2,3
NGRAM_PHRASE_QUERIES = {"bm25_ngram_phrase": ("line window group group", 2)}
REGEXP_QUERIES = {"bm25_regexp": ("^(?:mer[a-z]*)$", 16)}  # (anchored, cap)
# BoostingQuery: (match, context, demotion boost) — context matches keep
# matching but score *= boost (GT round 35 pins the semantics)
BOOSTING_QUERIES = {"bm25_boosting": ("spark merge", "dup", 0.3)}
# Query-time scored join (JoinUtil.createJoinQuery, GT round 68):
# fromField == toField == source; every doc matching the query scores,
# scores aggregate per source (the TermsWithScoreCollector fold), every
# doc of a collected source ranks by its source's aggregate.
# name -> (query, score_mode)
JOIN_UTIL_QUERIES = {
    "join_util_total": ("spark join merge", "total"),
    "join_util_max": ("spark join merge", "max"),
}
# Solr's q.op=AND (GT round 38): "spark merge OR fast" = +spark with
# merge retroactively demoted by the OR — must=[spark],
# should=[merge, fast]
ANDOP_QUERIES = {
    "parser_and_op": ("spark merge OR fast", lambda: bm25_compound_sql(
        must=["spark"], should=["merge", "fast"], k=10)),
}
# (typo'd query, max_edits, max_variants) — FuzzyLikeThisQuery rewrite
FUZZY_LIKE_QUERIES = {"bm25_fuzzy_like_this": ("sprk merg", 1, 3)}
# TermAutomatonQuery: (transitions ((from, label, to); '' = ANY), accepts)
TERM_AUTOMATON_QUERIES = {
    # (fast|merge) sort — the union-of-phrases automaton
    "span_automaton_union": (((0, "fast", 1), (0, "merge", 1), (1, "sort", 2)), (2,)),
    # merge ANY sort — one arbitrary token (or stop gap) between
    "span_automaton_any": (((0, "merge", 1), (1, "", 2), (2, "sort", 3)), (3,)),
    # synonym graph with unequal path lengths (the SynonymGraphFilter use
    # case the reference javadoc targets): "mergesort" (df=0 here, still
    # contributes idf(0)) | "merge sort"
    "span_automaton_syngraph": (
        ((0, "mergesort", 2), (0, "merge", 1), (1, "sort", 2)), (2,),
    ),
}
# leading wildcard over the reversed-wildcard secondary index (GT
# round 48 — solr ReversedWildcardFilter): shouldReverse routes '*up'
# to a PREFIX-sargable scan of the reversed term dictionary; constant
# score per matching doc (the parser's CONSTANT_SCORE_REWRITE, GT
# round 6). The oracle recomputes membership from raw text by LIKE.
REVWILD_QUERIES = {"revwild_leading": ("*up", "%up")}
# second Similarity through the same scorer (setSimilarity plug point)
CLASSIC_QUERIES = {"classic_tfidf": "spark merge vector"}
# SweetSpotSimilarity (lucene/misc): BOTH halves of setSimilarity — the
# index-time plateau lengthNorm (its own secondary index) + baselineTf
SWEETSPOT_QUERIES = {"sweetspot_tfidf": "spark merge vector"}
# SimilarityBase LM models through the same plug point: collection-
# probability stats (ttf/sumTotalTermFreq) + SimilarityBase norm decode
LM_QUERIES = {
    "lm_dirichlet": ("spark merge vector", "lm_dirichlet"),
    "lm_jelinek_mercer": ("spark merge vector", "lm_jelinek_mercer"),
    # DFR InL2 and IB LL through the same plug (DFRSimilarity.java /
    # IBSimilarity.java with NormalizationH2): per-term df + the
    # SimilarityBase float32 avgFieldLength
    "dfr_inl2": ("spark merge vector", "dfr_inl2"),
    "ib_ll": ("spark merge vector", "ib_ll"),
    # r4: the remaining DFR/IB grid cells (VERDICT #3) — BasicModel
    # G/IF/Ine × AfterEffectB and Distribution SPL × LambdaTTF, all
    # NormalizationH2, all GT-pinned bit-exact vs the compiled binary
    "dfr_gb2": ("spark merge vector", "dfr_gb2"),
    "dfr_ifb2": ("spark merge vector", "dfr_ifb2"),
    "dfr_ineb2": ("spark merge vector", "dfr_ineb2"),
    "ib_spl_ttf": ("spark merge vector", "ib_spl_ttf"),
    # the remaining normalization axis (H1/H3/Z with In-L)
    "dfr_inl1": ("spark merge vector", "dfr_inl1"),
    "dfr_inl3": ("spark merge vector", "dfr_inl3"),
    "dfr_inlz": ("spark merge vector", "dfr_inlz"),
    # DFI (DFISimilarity.java, chi-squared independence): the 7th scoring
    # model through the plug point — needs per-term ttf + sum_ttf
    "dfi_chi_squared": ("spark merge vector", "dfi_chi_squared"),
    # r5: BasicModel BE/P/D x AfterEffect B/L over H2 (incl. the
    # classic PL2) — closes the DFR BasicModel axis (VERDICT r4 #4)
    "dfr_beb2": ("spark merge vector", "dfr_beb2"),
    "dfr_bel2": ("spark merge vector", "dfr_bel2"),
    "dfr_pb2": ("spark merge vector", "dfr_pb2"),
    "dfr_pl2": ("spark merge vector", "dfr_pl2"),
    "dfr_db2": ("spark merge vector", "dfr_db2"),
    "dfr_dl2": ("spark merge vector", "dfr_dl2"),
    # MultiSimilarity (CombSUM over [BM25, Classic]) — the composite plug
    "multi_similarity": ("spark merge vector", "multi_bm25_classic"),
}
# BlendedTermQuery: max-df stat blending + DisjunctionMaxRewrite
BLENDED_QUERIES = {"bm25_blended": ("spark vector rapid", 0.01)}
# CommonTermsQuery (lucene/queries/.../CommonTermsQuery.java): df-split
# rewrite. The corpus's bimodal df distribution (29-word vocab: 'dup'
# df=25, everything else df≈390/500) makes the split scale-stable, so
# the oracle can classify terms once. Second entry exercises the
# all-high-freq conjunction rewrite (:213).
COMMON_TERMS_QUERIES = {
    "bm25_common_terms": ("dup table value", 0.4),
    "bm25_common_terms_conj": ("table value", 0.4),
}
# query strings through the classic parser (QueryParserBase.parse); the
# oracle renders the equivalent hand-built query
PARSER_QUERIES = {
    "parser_boolean": ("+merge fast -dup", lambda: bm25_boolean_sql(
        should="fast", must="merge", must_not="dup", k=10)),
    "parser_phrase": ('"fast sort"~3', lambda: bm25_phrase_sql("fast sort", k=10, slop=3)),
    "parser_boost": ("spark^2 merge^0.5 vector", lambda: bm25_boosted_sql(
        {"spark": 2.0, "merge": 0.5, "vector": 1.0}, k=10)),
    # infix operators / parens / ranges (QueryParser.jj grammar; the
    # oracle hand-builds the equivalent query so a parser bug cannot
    # cancel out against itself)
    "parser_infix_and": ("spark AND merge", lambda: bm25_compound_sql(
        must=["spark", "merge"], k=10)),
    "parser_infix_or_not": ("spark OR merge NOT dup", lambda: bm25_compound_sql(
        should=["spark", "merge"], must_not=["dup"], k=10)),
    "parser_group_and": ("(spark OR vector) AND merge", lambda: bm25_compound_sql(
        must=["merge"], groups=[("+", ["spark", "vector"])], k=10)),
    "parser_group_neg": ("merge -(dup vector)", lambda: bm25_compound_sql(
        should=["merge"], groups=[("-", ["dup", "vector"])], k=10)),
    # '"World Bank"^2 AND Nigeria' shape (ReutersQueryMaker.java:47)
    "parser_phrase_boost_and": ('"fast sort"^2 AND spark', lambda: bm25_compound_sql(
        must=["spark"], phrase="fast sort", phrase_boost=2.0, k=10)),
    # optional SHOULD phrase ('"World Bank" Nigeria' default-OR shape)
    "parser_optional_phrase": ('"fast sort" spark', lambda: bm25_compound_sql(
        should=["spark"], phrase="fast sort", phrase_required=False, k=10)),
    # '"World Bank" -Nigeria' shape (ReutersQueryMaker.java:48)
    "parser_phrase_not": ('"fast sort" -spark', lambda: bm25_compound_sql(
        phrase="fast sort", phrase_required=False, must_not=["spark"], k=10)),
    # CONSTANT_SCORE_REWRITE family (the reference parser's default for
    # range/wildcard — QueryParserBase.java:67; score == boost for any
    # doc with >=1 matching dictionary term, pinned vs the compiled
    # binary in tests/test_lucene_ground_truth.py)
    "parser_range": ("[mer TO met] fast", lambda: bm25_compound_sql(
        term_range=("mer", "met", True, True), should=["fast"], k=10)),
    "parser_wildcard": ("mer*^2 fast", lambda: bm25_compound_sql(
        wildcards=[("", 2.0, "mer%")], should=["fast"], k=10)),
    # FuzzyQuery -> TopTermsBlendedFreqScoringRewrite (blended max-df,
    # similarity boosts; the oracle recomputes the expansion in SQL)
    "parser_fuzzy": ("merge~1 AND fast", lambda: bm25_compound_sql(
        fuzzies=[("+", 1.0, "merge", 1)], must=["fast"], k=10)),
    # wildcard INSIDE a paren group: the nested BooleanQuery keeps the
    # constant-score rewrite on its wildcard member (mixed_groups)
    "parser_group_wild": ("(mer* fast) AND spark", lambda: bm25_compound_sql(
        must=["spark"], mixed_groups=[("+", ["fast"], [(1.0, "mer%")])], k=10)),
    "parser_group_wild_neg": ("spark -(wind* dup)", lambda: bm25_compound_sql(
        should=["spark"], mixed_groups=[("-", ["dup"], [(1.0, "wind%")])], k=10)),
    # multiple phrase clauses in one BooleanQuery (both AND-promoted)
    "parser_two_phrases": ('"fast sort" AND "merge sort" spark', lambda: bm25_compound_sql(
        phrase="fast sort", phrases=[("merge sort", 0, 1.0, True)],
        should=["spark"], k=10)),
    # two OPTIONAL phrases (one sloppy+boosted) + a should term
    "parser_opt_phrases": ('"fast sort" "merge sort"~2^2 spark', lambda: bm25_compound_sql(
        phrase="fast sort", phrase_required=False,
        phrases=[("merge sort", 2, 2.0, False)], should=["spark"], k=10)),
}
# query strings through SimpleQueryParser (queryparser/simple — the
# never-erroring human syntax; GT round 28 pins parse + scoring to the
# compiled reference). The oracle hand-builds the equivalent query.
SIMPLE_QUERIES = {
    # one alternation: `a | b + c` == BQ(MUST BQ(S a, S b), MUST c)
    "simple_alternation": ("spark | merge + vector", lambda: bm25_compound_sql(
        must=["vector"], groups=[("+", ["spark", "merge"])], k=10)),
    # trailing-star prefix under '+': constant-score AND'd with a term
    "simple_prefix_and": ("mer* + vector", lambda: bm25_compound_sql(
        must=["vector"], wildcards=[("+", 1.0, "mer%")], k=10)),
    # `-tok` = BQ(MUST_NOT tok, SHOULD MatchAllDocs): docs lacking the
    # token earn +1.0; term-free docs still match (complement pass)
    "simple_negation": ("merge -dup", lambda: bm25_simple_negation_sql(
        "merge", "dup", k=10)),
}
# query strings through the FLEXIBLE StandardQueryParser
# (queryparser/flexible; GT round 32 pins parse + scoring to the
# compiled reference). The oracle hand-builds the equivalent query.
FLEXIBLE_QUERIES = {
    # BooleanQuery2ModifierNodeProcessor drops precedence: the And
    # children flatten into the root as MUST beside the bare SHOULD
    "flex_flatten": ("spark AND merge OR fast", lambda: bm25_compound_sql(
        must=["spark", "merge"], should=["fast"], k=10)),
    # fractional fuzzy: ~0.5 on a 5-codepoint term = floatToEdits ->
    # (1-0.5)*5 = 2 edits (the classic parser surface only takes ints)
    "flex_fuzzy_frac": ("merge~0.5 AND fast", lambda: bm25_compound_sql(
        fuzzies=[("+", 1.0, "merge", 2)], must=["fast"], k=10)),
    # regexp term under CONSTANT_SCORE_REWRITE; /m.rge/ == LIKE 'm_rge'
    # so the oracle reuses the wildcard (LIKE) expansion
    "flex_regexp": ("/m.rge/ fast", lambda: bm25_compound_sql(
        wildcards=[("", 1.0, "m_rge")], should=["fast"], k=10)),
}
# XML query documents through CoreParser's element set (queryparser/xml;
# GT round 29 pins the mapping to the compiled reference)
XML_QUERIES = {
    "xml_dismax": (
        '<DisjunctionMaxQuery fieldName="text" tieBreaker="0.2">'
        "<TermQuery>spark</TermQuery><TermQuery>merge</TermQuery>"
        "<TermQuery>vector</TermQuery></DisjunctionMaxQuery>",
        lambda: bm25_dismax_sql("spark merge vector", k=10, tiebreak=0.2),
    ),
    # FILTER occur: required for matching, contributes nothing to score
    "xml_bool_filter": (
        '<BooleanQuery fieldName="text">'
        '<Clause occurs="filter"><TermQuery>fast</TermQuery></Clause>'
        '<Clause occurs="should"><TermQuery>spark</TermQuery></Clause>'
        '<Clause occurs="should"><TermQuery>merge</TermQuery></Clause>'
        "</BooleanQuery>",
        lambda: bm25_filter_clause_sql("fast", "spark merge", k=10),
    ),
    "xml_span_near": (
        '<SpanNear fieldName="text" slop="2" inOrder="true">'
        "<SpanTerm>fast</SpanTerm><SpanTerm>sort</SpanTerm></SpanNear>",
        lambda: bm25_span_near_sql(["fast", "sort"], slop=2, ordered=True, k=10),
    ),
    # Numeric elements (xml/builders/PointRangeQueryBuilder.java /
    # LegacyNumericRangeQueryBuilder.java) over the index's stored
    # per-doc token-count field (field_len): root = constant score in
    # doc order; as a FILTER clause the range splits out as a liveDocs
    # mask over the scorer (engine._exec_xml_tree)
    "xml_point_filter": (
        '<BooleanQuery fieldName="text">'
        '<Clause occurs="filter"><PointRangeQuery fieldName="field_len"'
        ' lowerTerm="40" upperTerm="90" type="int"/></Clause>'
        '<Clause occurs="should"><TermQuery>spark</TermQuery></Clause>'
        '<Clause occurs="should"><TermQuery>merge</TermQuery></Clause>'
        "</BooleanQuery>",
        lambda: _bm25_numeric_filter_sql(40, 90, "spark merge", k=10),
    ),
    "xml_legacy_numeric": (
        '<LegacyNumericRangeQuery fieldName="field_len" lowerTerm="40"'
        ' upperTerm="90" includeUpper="false" type="long"/>',
        lambda: _numeric_range_root_sql(40, 90, k=10, hi_inc=False),
    ),
    # CorePlusQueries elements (xml/CorePlusQueriesParser.java):
    # BoostingQuery -> the engine's GT-35 "boosting" node; LikeThisQuery
    # -> MoreLikeThisQuery term selection against index stats
    "xml_boosting_query": (
        '<BoostingQuery fieldName="text"><Query><BooleanQuery>'
        '<Clause occurs="should"><TermQuery>fast</TermQuery></Clause>'
        '<Clause occurs="should"><TermQuery>sort</TermQuery></Clause>'
        "</BooleanQuery></Query>"
        '<BoostQuery boost="0.25"><TermQuery>merge</TermQuery></BoostQuery>'
        "</BoostingQuery>",
        lambda: bm25_boosting_sql("fast sort", "merge", 0.25, k=10),
    ),
    # likeText exercises a tf=2 candidate ('spark') and a df=0 drop
    # ('index'); ranked under BM25 f32 — text chosen tie-free at both
    # gate SFs (the f32-vs-double oracle boundary)
    "xml_like_this": (
        '<LikeThisQuery fieldNames="text" maxQueryTerms="8">'
        "spark spark merge fast vector index table</LikeThisQuery>",
        lambda: bm25_mlt_text_sql(
            "spark spark merge fast vector index table", max_q=8, k=10
        ),
    ),
}


def _ranked(hits: DataFrame) -> DataFrame:
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return hits.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "doc_id", "rank"
    )


def _bm25_query_fn(query: str, mode: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk(query, k=10, mode=mode))

    return run


def _bool_query_fn(kwargs: dict) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk_boolean(k=10, **kwargs))

    return run


def _dismax_query_fn(query: str, tiebreak: float) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk_dismax(query, k=10, tiebreak=tiebreak))

    return run


def _phrase_query_fn(query: str, slop: int) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk_phrase(query, k=10, slop=slop))

    return run


def _commongrams_phrase_fn(query: str) -> Callable[[SparkSession, str], DataFrame]:
    """Phrase through the commongrams secondary index: the query string
    analyzes through CommonGramsQueryFilter (bigrams whenever possible),
    so common-word positions ride the gram posting lists."""
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from lucene_solr_spark.ops.index_access import commongrams_searcher_for

        return _ranked(
            commongrams_searcher_for(spark, sf_dir).topk_phrase(query, k=10)
        )

    return run


def _synonym_query_fn(query: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk_synonym(query, k=10))

    return run


def _revwild_query_fn(pattern: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from lucene_solr_spark.analysis.revwildcard import leading_wildcard_topk
        from lucene_solr_spark.ops.index_access import revwildcard_searcher_for

        s = revwildcard_searcher_for(spark, sf_dir)
        return _ranked(leading_wildcard_topk(s, pattern, k=10))

    return run


def _boost_query_fn(boosts: dict) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk_boosted(boosts, k=10))

    return run


def _span_query_fn(terms: list, slop: int, in_order: bool):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(
            _searcher(spark, sf_dir).topk_span_near(terms, slop=slop, in_order=in_order, k=10)
        )

    return run


def _span_first_query_fn(term: str, end: int):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk_span_first(term, end, k=10))

    return run


def _span_or_query_fn(terms: list):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk_span_or(terms, k=10))

    return run


def _span_not_query_fn(include: list, exclude: str, slop: int):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(
            _searcher(spark, sf_dir).topk_span_not(include, exclude, slop=slop, k=10)
        )

    return run


def _span_contain_query_fn(big: list, little: str, slop: int, mode: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        s = _searcher(spark, sf_dir)
        if mode == "containing":
            return _ranked(s.topk_span_containing(big, little, slop=slop, k=10))
        return _ranked(s.topk_span_within(big, little, slop=slop, k=10))

    return run


def _multi_phrase_query_fn(positions: list, slop: int = 0):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(
            _searcher(spark, sf_dir).topk_multi_phrase(positions, k=10, slop=slop)
        )

    return run


def _regexp_query_fn(pattern: str, cap: int):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk_regexp(pattern, max_terms=cap, k=10))

    return run


def _ngram_phrase_query_fn(query: str, n: int):
    """NGramPhraseQuery: rewrite the exact phrase to every-n-th-term +
    last (search/NGramPhraseQuery.java) and execute the REWRITTEN
    phrase — ~1/n of the postings touched."""
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from lucene_solr_spark.search.engine import (
            BooleanSpec,
            ngram_phrase_rewrite,
            phrase_spec,
        )

        s = _searcher(spark, sf_dir)
        pairs = ngram_phrase_rewrite(phrase_spec(query).phrase, n)
        return _ranked(s.topk_spec(BooleanSpec(phrase=pairs), k=10))

    return run


def _blended_query_fn(query: str, tiebreak: float):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk_blended(query, k=10, tiebreak=tiebreak))

    return run


def _elevation_query_fn(query: str, elevated: list[int]):
    """QueryElevationComponent (solr/core/src/java/org/apache/solr/handler/
    component/QueryElevationComponent.java, forceElevation): the editorial
    map pins `elevated` to ranks 1..n in config order whether or not they
    match; organic hits (minus the pinned set) follow. The pinned list is
    a tiny literal — at scale it rides the driver->executor closure, never
    a join."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        n = len(elevated)
        organic = _ranked(_searcher(spark, sf_dir).topk(query, k=10 + n))
        org = (
            organic.filter(~F.col("doc_id").isin(elevated))
            .withColumn("rank", (F.row_number().over(Window.orderBy("rank")) + n).cast("int"))
        )
        elev = spark.createDataFrame(
            [(int(d), i + 1) for i, d in enumerate(elevated)], "doc_id long, rank int"
        )
        return elev.unionByName(org).orderBy("rank").limit(10)

    return run


def _elevation_sql(query: str, elevated: list[int]) -> str:
    n = len(elevated)
    vals = ",".join(f"(CAST({d} AS BIGINT), CAST({i + 1} AS INTEGER))"
                    for i, d in enumerate(elevated))
    ids = ",".join(str(d) for d in elevated)
    return f"""
WITH organic AS ({bm25_topk_sql(query, k=10 + n)}),
org2 AS (
  SELECT doc_id, CAST(row_number() OVER (ORDER BY rank) + {n} AS INTEGER) AS rank
  FROM organic WHERE doc_id NOT IN ({ids})
)
SELECT doc_id, rank FROM (
  SELECT * FROM (VALUES {vals}) e(doc_id, rank)
  UNION ALL SELECT doc_id, rank FROM org2
) ORDER BY rank LIMIT 10
"""


def _common_terms_query_fn(query: str, max_tf: float):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(
            _searcher(spark, sf_dir).topk_common_terms(query, max_term_frequency=max_tf, k=10)
        )

    return run


def _common_terms_oracle_split(query: str, max_tf: float) -> tuple[list, list]:
    """Oracle-side replay of CommonTermsQuery's df classification: same
    analyzer, df from the Lucene-faithful control index over the gate
    corpus (env SPARK_GRAFT_ORACLE_SF_DIR, default sf0.01). The engine
    classifies independently from ITS index — if the two splits ever
    disagreed, the value gate would catch it."""
    import math

    import pandas as pd

    from lucene_solr_spark.analysis.tokenizer import analyze
    from lucene_solr_spark.search.oracle import build_oracle_index

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    idx = build_oracle_index(list(zip(pdf.doc_id, pdf.text)))
    cutoff = math.ceil(max_tf * idx.doc_count)
    terms = analyze(query)
    low = [t for t in terms if len(idx.postings.get(t, {})) <= cutoff]
    high = [t for t in terms if len(idx.postings.get(t, {})) > cutoff]
    return low, high


def _sweetspot_query_fn(query: str):
    """SweetSpotSimilarity end-to-end: the query runs against the
    secondary index whose norms the plateau lengthNorm wrote (index-time
    half), scored with baselineTf/idf^2/coord (search-time half)."""
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from lucene_solr_spark.analysis.tokenizer import analyze
        from lucene_solr_spark.ops.index_access import sweetspot_searcher_for
        from lucene_solr_spark.search.engine import BooleanSpec

        s = sweetspot_searcher_for(spark, sf_dir)
        spec = BooleanSpec(should=tuple(analyze(query)), similarity="sweetspot")
        return _ranked(s.topk_spec(spec, k=10))

    return run


def _classic_query_fn(query: str, similarity: str = "classic"):
    """A non-default Similarity through the SAME scorer path — the
    IndexSearcher.setSimilarity plug point (§2.10): ClassicSimilarity
    (TF-IDF), LMDirichletSimilarity, or LMJelinekMercerSimilarity."""
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from lucene_solr_spark.analysis.tokenizer import analyze
        from lucene_solr_spark.search.engine import BooleanSpec

        s = _searcher(spark, sf_dir)
        spec = BooleanSpec(should=tuple(analyze(query)), similarity=similarity)
        return _ranked(s.topk_spec(spec, k=10))

    return run


def _parser_query_fn(qstr: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(parse_and_search(_searcher(spark, sf_dir), qstr, k=10))

    return run


def _simple_query_fn(qstr: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk_simple(qstr, k=10))

    return run


def _xml_query_fn(xmlq: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk_xml(xmlq, k=10))

    return run


def _flexible_query_fn(qstr: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ranked(_searcher(spark, sf_dir).topk_flexible(qstr, k=10))

    return run


def _mlt_query_fn(seed: int, n_terms: int, min_tf: int = 2, min_df: int = 5):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        """MoreLikeThis (queries/mlt/MoreLikeThis.java): interesting
        terms = the seed doc's top maxQueryTerms by tf x classic idf
        (log(n/(df+1))+1) after the minTermFreq/minDocFreq filters,
        run as unboosted SHOULD TermQueries under BM25 — the selection
        is pinned vs the compiled MoreLikeThis in
        tests/test_lucene_ground_truth.py (round 9). Seed excluded from
        the hits (the Solr MLT handler behavior)."""
        from lucene_solr_spark.analysis.tokenizer import analyze_to_counts
        from lucene_solr_spark.search.mlt import mlt_select_terms

        s = _searcher(spark, sf_dir)
        text = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .filter(F.col("doc_id") == seed)
            .select("text")
            .collect()[0][0]
        )
        counts, _ = analyze_to_counts(text)
        weights = s.term_weights(list(counts))
        terms = tuple(mlt_select_terms(
            counts, {t: w["df"] for t, w in weights.items()}, s.doc_count,
            max_query_terms=n_terms, min_term_freq=min_tf, min_doc_freq=min_df,
        ))
        hits = s.topk(" ".join(terms), k=11).filter(F.col("doc_id") != seed).limit(10)
        return _ranked(hits)

    return run


def _rescore_query_fn(q1: str, q2: str, first_n: int, weight: float):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        """QueryRescorer (search/QueryRescorer.java:60-80): re-rank the top
        first_n of q1 by adding weight * score(q2). The q1 candidate set is
        PUSHED INTO the q2 scan (block ranges pruned + scorer doc mask) —
        the rescorer only ever scores first_n docs, never q2's full match
        set (a stopword-scale q2 stays O(candidates) instead of a
        full-corpus sort)."""
        from lucene_solr_spark.analysis.tokenizer import analyze
        from lucene_solr_spark.search.engine import BooleanSpec

        s = _searcher(spark, sf_dir)
        rows = s.topk(q1, k=first_n).collect()  # the cursor the client holds
        cand_ids = [int(r["doc_id"]) for r in rows]
        first = spark.createDataFrame(
            [(int(r["doc_id"]), float(r["score"])) for r in rows], "doc_id long, s1 double"
        )
        second = s.topk_spec(
            BooleanSpec(should=tuple(analyze(q2))), k=first_n, candidates=cand_ids
        ).select("doc_id", F.col("score").alias("s2"))
        combined = (
            first.join(second, "doc_id", "left")
            .withColumn("final", F.col("s1") + F.lit(weight) * F.coalesce("s2", F.lit(0.0)))
        )
        w = Window.orderBy(F.col("final").desc(), F.col("doc_id").asc())
        return combined.withColumn("rank", F.row_number().over(w).cast("int")).select(
            "doc_id", "rank"
        ).limit(10)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    s = _searcher(spark, "/root/testdata/sf0.001")
    return s.search("spark join", k=10).select(
        "doc_id", "score", "lang", "source", "sha256", "field_len"
    )


# ---- gate consolidation -------------------------------------------------
# The driver records CORRECTNESS rows for the first 50 queries() entries.
# Every bm25-family query returns the same (doc_id, rank) schema, so the
# families are gated as THREE tagged unions — the driver still
# value-checks every sub-operator (each variant's rows carry its tag),
# and the whole surface (3 + 29 relational + 17 pipeline = 49 entries)
# fits inside the cap. Individual callables remain available above.

def _variant_union(parts: list) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from functools import reduce

        dfs = [
            fn(spark, sf_dir).select(F.lit(v).alias("variant"), "doc_id", "rank")
            for v, fn, _sql in parts
        ]
        return reduce(DataFrame.unionByName, dfs).orderBy("variant", "rank")

    return run


def _variant_union_sql(parts: list) -> str:
    inner = "\nUNION ALL\n".join(
        f"SELECT '{v}' AS variant, doc_id, rank FROM ({sql})" for v, _fn, sql in parts
    )
    return f"SELECT * FROM (\n{inner}\n) ORDER BY variant, rank"


def _bm25_groups() -> dict[str, list]:
    """group -> [(variant, spark_fn, oracle_sql)]"""
    scoring, positional, derived = [], [], []
    for name, q, mode in BM25_QUERIES:
        scoring.append((name, _bm25_query_fn(q, mode), bm25_topk_sql(q, k=10, mode=mode)))
    for name, kwargs in BOOL_QUERIES.items():
        scoring.append((name, _bool_query_fn(kwargs), bm25_boolean_sql(k=10, **kwargs)))
    for name, (q, tb) in DISMAX_QUERIES.items():
        scoring.append((name, _dismax_query_fn(q, tb), bm25_dismax_sql(q, k=10, tiebreak=tb)))
    for name, q in SYNONYM_QUERIES.items():
        scoring.append((name, _synonym_query_fn(q), bm25_synonym_sql(q, k=10)))
    for name, boosts in BOOST_QUERIES.items():
        scoring.append((name, _boost_query_fn(boosts), bm25_boosted_sql(boosts, k=10)))
    for name, q in CLASSIC_QUERIES.items():
        scoring.append((name, _classic_query_fn(q), classic_tfidf_sql(q, k=10)))
    for name, q in SWEETSPOT_QUERIES.items():
        from lucene_solr_spark.ops.bm25_sql import sweetspot_tfidf_sql

        scoring.append((name, _sweetspot_query_fn(q), sweetspot_tfidf_sql(q, k=10)))
    for name, (q, sim) in LM_QUERIES.items():
        from lucene_solr_spark.ops.bm25_sql import (
            dfi_sql,
            dfr_beb2_sql,
            dfr_bel2_sql,
            dfr_db2_sql,
            dfr_dl2_sql,
            dfr_gb2_sql,
            dfr_inl1_sql,
            dfr_inl3_sql,
            dfr_inlz_sql,
            dfr_ifb2_sql,
            dfr_ineb2_sql,
            dfr_inl2_sql,
            dfr_pb2_sql,
            dfr_pl2_sql,
            ib_ll_sql,
            ib_spl_ttf_sql,
            lm_dirichlet_sql,
            lm_jelinek_mercer_sql,
            multi_bm25_classic_sql,
        )

        sim_sql = {
            "lm_dirichlet": lm_dirichlet_sql,
            "lm_jelinek_mercer": lm_jelinek_mercer_sql,
            "dfr_inl2": dfr_inl2_sql,
            "ib_ll": ib_ll_sql,
            "dfr_gb2": dfr_gb2_sql,
            "dfr_inl1": dfr_inl1_sql,
            "dfr_inl3": dfr_inl3_sql,
            "dfr_inlz": dfr_inlz_sql,
            "dfr_ifb2": dfr_ifb2_sql,
            "dfr_ineb2": dfr_ineb2_sql,
            "ib_spl_ttf": ib_spl_ttf_sql,
            "dfr_beb2": dfr_beb2_sql,
            "dfr_bel2": dfr_bel2_sql,
            "dfr_pb2": dfr_pb2_sql,
            "dfr_pl2": dfr_pl2_sql,
            "dfr_db2": dfr_db2_sql,
            "dfr_dl2": dfr_dl2_sql,
            "dfi_chi_squared": dfi_sql,
            "multi_bm25_classic": multi_bm25_classic_sql,
        }[sim]
        scoring.append((name, _classic_query_fn(q, sim), sim_sql(q, k=10)))
    for name, (q, tb) in BLENDED_QUERIES.items():
        from lucene_solr_spark.ops.bm25_sql import blended_term_sql

        scoring.append((name, _blended_query_fn(q, tb), blended_term_sql(q, k=10, tiebreak=tb)))
    for name, (q, mtf) in COMMON_TERMS_QUERIES.items():
        low, high = _common_terms_oracle_split(q, mtf)
        if not low:
            sql = bm25_compound_sql(must=high, k=10)  # conjunction rewrite
        elif not high:
            sql = bm25_compound_sql(groups=[("+", low)], k=10)
        else:
            sql = bm25_compound_sql(should=high, groups=[("+", low)], k=10)
        scoring.append((name, _common_terms_query_fn(q, mtf), sql))
    for name, (q, slop) in PHRASE_QUERIES.items():
        positional.append((name, _phrase_query_fn(q, slop), bm25_phrase_sql(q, k=10, slop=slop)))
    for name, (q, rewritten) in COMMONGRAMS_QUERIES.items():
        from lucene_solr_spark.ops.bm25_sql import bm25_commongrams_phrase_sql
        from lucene_solr_spark.ops.index_access import COMMONGRAMS_GATE_WORDS

        positional.append((
            name,
            _commongrams_phrase_fn(q),
            bm25_commongrams_phrase_sql(
                rewritten, list(COMMONGRAMS_GATE_WORDS), k=10
            ),
        ))
    for name, (terms, slop, in_order) in SPAN_QUERIES.items():
        positional.append(
            (name, _span_query_fn(terms, slop, in_order), bm25_span_near_sql(terms, slop, in_order, k=10))
        )
    for name, (term, end) in SPAN_FIRST_QUERIES.items():
        positional.append((name, _span_first_query_fn(term, end), bm25_span_first_sql(term, end, k=10)))
    for name, (phrase, slop, specs) in COMPLEX_PHRASE_QUERIES.items():
        from lucene_solr_spark.ops.bm25_sql import bm25_complex_phrase_sql

        positional.append((
            name,
            lambda spark, sf_dir, p=phrase, sl=slop: _ranked(
                _searcher(spark, sf_dir).topk_complex_phrase(
                    p.strip('"'), slop=sl, k=10
                )
            ),
            bm25_complex_phrase_sql(specs, slop, k=10),
        ))
    for name, (sq, specs, slop) in SURROUND_QUERIES.items():
        from lucene_solr_spark.ops.bm25_sql import bm25_complex_phrase_sql

        positional.append((
            name,
            lambda spark, sf_dir, q=sq: _ranked(
                _searcher(spark, sf_dir).topk_surround(q, k=10)
            ),
            bm25_complex_phrase_sql(specs, slop, k=10),
        ))
    for name, (sq, alts_a, alts_b, slop) in SURROUND_UNORDERED_QUERIES.items():
        from lucene_solr_spark.ops.bm25_sql import bm25_span_unordered_cells_sql

        positional.append((
            name,
            lambda spark, sf_dir, q=sq: _ranked(
                _searcher(spark, sf_dir).topk_surround(q, k=10)
            ),
            bm25_span_unordered_cells_sql(alts_a, alts_b, slop, k=10),
        ))
    for name, (phrase, slop, specs, negs) in COMPLEX_PHRASE_NOT_QUERIES.items():
        from lucene_solr_spark.ops.bm25_sql import bm25_complex_phrase_not_sql

        positional.append((
            name,
            lambda spark, sf_dir, p=phrase, sl=slop: _ranked(
                _searcher(spark, sf_dir).topk_complex_phrase(
                    p.strip('"'), slop=sl, k=10
                )
            ),
            bm25_complex_phrase_not_sql(specs, negs, slop, k=10),
        ))
    for name, (pterms, pfn, pinc, pslop) in PAYLOAD_SCORE_QUERIES.items():
        from lucene_solr_spark.ops.bm25_sql import payload_score_sql

        positional.append((
            name,
            lambda spark, sf_dir, t=pterms, f=pfn, i=pinc, sl=pslop: _ranked(
                _payload_searcher(spark, sf_dir).topk_payload_score(
                    t, f, include_span_score=i, slop=sl, k=10
                )
            ),
            payload_score_sql(pterms, pfn, include_span_score=pinc, slop=pslop, k=10),
        ))
    for name, (pterms, pwant, pslop) in PAYLOAD_CHECK_QUERIES.items():
        from lucene_solr_spark.ops.bm25_sql import span_payload_check_sql

        positional.append((
            name,
            lambda spark, sf_dir, t=pterms, w=pwant, sl=pslop: _ranked(
                _payload_searcher(spark, sf_dir).topk_span_payload_check(
                    t, w, slop=sl, k=10
                )
            ),
            span_payload_check_sql(pterms, pwant, slop=pslop, k=10),
        ))
    for name, (term, lo, hi) in SPAN_POSRANGE_QUERIES.items():
        positional.append(
            (
                name,
                lambda spark, sf_dir, t=term, l=lo, h=hi: _ranked(
                    _searcher(spark, sf_dir).topk_span_position_range(t, l, h, k=10)
                ),
                bm25_span_position_range_sql(term, lo, hi, k=10),
            )
        )
    for name, terms in SPAN_OR_QUERIES.items():
        positional.append((name, _span_or_query_fn(terms), bm25_span_or_sql(terms, k=10)))
    for name, (inc, exc, slop) in SPAN_NOT_QUERIES.items():
        positional.append(
            (name, _span_not_query_fn(inc, exc, slop), bm25_span_not_sql(inc, exc, slop, k=10))
        )
    for name, (big, little, slop, mode) in SPAN_CONTAIN_QUERIES.items():
        sql_fn = bm25_span_containing_sql if mode == "containing" else bm25_span_within_sql
        positional.append(
            (name, _span_contain_query_fn(big, little, slop, mode), sql_fn(big, little, slop, k=10))
        )
    for name, positions in MULTI_PHRASE_QUERIES.items():
        positional.append(
            (name, _multi_phrase_query_fn(positions), bm25_multi_phrase_sql(positions, k=10))
        )
    for name, (positions, mp_slop) in MULTI_PHRASE_SLOPPY_QUERIES.items():
        from lucene_solr_spark.ops.bm25_sql import bm25_multi_phrase_sloppy_sql

        positional.append((
            name,
            _multi_phrase_query_fn(positions, slop=mp_slop),
            bm25_multi_phrase_sloppy_sql(positions, mp_slop, k=10),
        ))
    for name, (q, n) in NGRAM_PHRASE_QUERIES.items():
        from lucene_solr_spark.ops.bm25_sql import bm25_phrase_pairs_sql
        from lucene_solr_spark.search.engine import ngram_phrase_rewrite, phrase_spec

        pairs = ngram_phrase_rewrite(phrase_spec(q).phrase, n)
        positional.append(
            (name, _ngram_phrase_query_fn(q, n), bm25_phrase_pairs_sql(pairs, k=10))
        )
    for name, (trans, acc) in TERM_AUTOMATON_QUERIES.items():
        from lucene_solr_spark.ops.bm25_sql import bm25_term_automaton_sql

        positional.append((
            name,
            lambda spark, sf_dir, tr=trans, ac=acc: _ranked(
                _searcher(spark, sf_dir).topk_term_automaton(tr, ac, k=10)
            ),
            bm25_term_automaton_sql(trans, acc, k=10),
        ))
    for name, (q1, q2, n, w) in RESCORE_QUERIES.items():
        derived.append(
            (name, _rescore_query_fn(q1, q2, n, w), bm25_rescore_sql(q1, q2, first_n=n, weight=w, k=10))
        )
    for name, (seed, nt) in MLT_QUERIES.items():
        derived.append((name, _mlt_query_fn(seed, nt), bm25_mlt_sql(seed_doc_id=seed, n_terms=nt, k=10)))
    for name, (q, elev) in ELEVATION_QUERIES.items():
        derived.append((name, _elevation_query_fn(q, elev), _elevation_sql(q, elev)))
    for name, (pat, cap) in REGEXP_QUERIES.items():
        derived.append((name, _regexp_query_fn(pat, cap), bm25_regexp_sql(pat, max_terms=cap, k=10)))
    for name, (q, me, mv) in FUZZY_LIKE_QUERIES.items():
        from lucene_solr_spark.ops.bm25_sql import fuzzy_like_this_sql

        derived.append((
            name,
            lambda spark, sf_dir, q=q, me=me, mv=mv: _ranked(
                _searcher(spark, sf_dir).topk_fuzzy_like_this(q, max_edits=me, max_variants=mv, k=10)
            ),
            fuzzy_like_this_sql(q, max_edits=me, max_variants=mv, k=10),
        ))
    for name, (mq, cq, bst) in BOOSTING_QUERIES.items():
        from lucene_solr_spark.ops.bm25_sql import bm25_boosting_sql

        derived.append((
            name,
            lambda spark, sf_dir, mq=mq, cq=cq, bst=bst: _ranked(
                _searcher(spark, sf_dir).topk_boosting(mq, cq, bst, k=10)
            ),
            bm25_boosting_sql(mq, cq, bst, k=10),
        ))
    for name, (jq, jmode) in JOIN_UTIL_QUERIES.items():
        from lucene_solr_spark.ops.bm25_sql import join_util_sql

        def _join_util_fn(spark, sf_dir, jq=jq, jmode=jmode):
            keys = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
                "doc_id", "source"
            )
            return _ranked(
                _searcher(spark, sf_dir).topk_join_util(jq, keys, mode=jmode, k=10)
            )

        derived.append((name, _join_util_fn, join_util_sql(jq, jmode, k=10)))
    # r4 (VERDICT #8): the multi-field surface as a default gate path —
    # DisMax qf over a TWO-field build (body text + derived title),
    # per-field stats recomputed from scratch by the oracle
    from lucene_solr_spark.ops.bm25_sql import bm25_dismax_qf_sql

    _DMQF_Q, _DMQF_TB, _DMQF_BOOSTS = "spark merge vector", 0.3, {
        "text": 1.0, "title": 2.0}

    def _dismax_qf_fn(spark, sf_dir):
        from lucene_solr_spark.ops.index_access import multifield_searcher_for

        mfs = multifield_searcher_for(spark, sf_dir)
        return _ranked(mfs.topk(
            _DMQF_Q, k=10, boosts=_DMQF_BOOSTS, dismax_tie=_DMQF_TB))

    derived.append((
        "dismax_qf",
        _dismax_qf_fn,
        bm25_dismax_qf_sql(_DMQF_Q, k=10, tiebreak=_DMQF_TB,
                           boosts=_DMQF_BOOSTS),
    ))
    for name, (qstr, sql_fn) in PARSER_QUERIES.items():
        derived.append((name, _parser_query_fn(qstr), sql_fn()))
    for name, (qstr, sql_fn) in ANDOP_QUERIES.items():
        derived.append((
            name,
            lambda spark, sf_dir, qstr=qstr: _ranked(parse_and_search(
                _searcher(spark, sf_dir), qstr, k=10, default_operator="and"
            )),
            sql_fn(),
        ))
    for name, (qstr, sql_fn) in SIMPLE_QUERIES.items():
        derived.append((name, _simple_query_fn(qstr), sql_fn()))
    for name, (xmlq, sql_fn) in XML_QUERIES.items():
        derived.append((name, _xml_query_fn(xmlq), sql_fn()))
    # BoostingTermQuery (xml/builders/BoostingTermBuilder.java):
    # PayloadScoreQuery(SpanTermQuery raw, AveragePayloadFunction, true)
    # in SpanBoostQuery(2.5) — runs on the payload-field index; the
    # uniform span-leg boost preserves ranks (rank contract; the f32
    # score scaling itself is pinned in tests/test_xmlqp.py)
    from lucene_solr_spark.ops.bm25_sql import payload_score_sql

    derived.append((
        "xml_boosting_term",
        lambda spark, sf_dir: _ranked(_payload_searcher(spark, sf_dir).topk_xml(
            '<BoostingTermQuery fieldName="text" boost="2.5">merge'
            "</BoostingTermQuery>", k=10)),
        payload_score_sql(["merge"], "avg", include_span_score=True,
                          slop=0, k=10),
    ))
    for name, (qstr, sql_fn) in FLEXIBLE_QUERIES.items():
        derived.append((name, _flexible_query_fn(qstr), sql_fn()))
    for name, (pattern, like_pat) in REVWILD_QUERIES.items():
        from lucene_solr_spark.ops.bm25_sql import constant_wildcard_sql

        derived.append((
            name,
            _revwild_query_fn(pattern),
            constant_wildcard_sql(like_pat, k=10),
        ))
    return {
        "bm25_scoring": scoring,
        "bm25_positional": positional,
        "bm25_derived": derived,
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for group, parts in _bm25_groups().items():
        out[group] = _variant_union(parts)
    for name, (fn, _sql) in {**RELATIONAL_OPS, **PIPELINE_OPS}.items():
        out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for group, parts in _bm25_groups().items():
        out[group] = _variant_union_sql(parts)
    for name, (_fn, sql) in {**RELATIONAL_OPS, **PIPELINE_OPS}.items():
        if callable(sql):
            # lazy oracle: SQL embeds data-dependent literals (e.g. the
            # deterministic k-means centroids), resolved against the
            # gate's sf dir (SPARK_GRAFT_ORACLE_SF_DIR, default sf0.01)
            sql = sql()
        if sql is not None:
            out[name] = sql
    return out
