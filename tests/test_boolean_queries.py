"""Boolean/dismax/phrase query engine vs the pure-Python control oracle
(BaseDistributedSearchTestCase pattern), on the synthetic corpus."""

import os

import numpy as np
import pytest

from lucene_solr_spark.corpus import make_corpus
from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.engine import BooleanSpec, IndexSearcher, phrase_spec
from lucene_solr_spark.search.oracle import build_oracle_index, oracle_topk_spec

N_DOCS = 300


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    pdf = make_corpus(N_DOCS, seed=7)
    src = spark.createDataFrame(pdf)
    out = os.path.join(tmp_root, "idx_bool")
    paths = build_index(
        spark, src, out_dir=out, content_col="content",
        order_cols=["repo", "path", "commit"], meta_cols=["repo", "path"],
        range_size=64, fingerprint="bool300v1",
    )
    searcher = IndexSearcher(spark, out)
    docs = spark.read.parquet(paths.docs).select("doc_id", "repo", "path").collect()
    key_to_id = {(r["repo"], r["path"]): r["doc_id"] for r in docs}
    oidx = build_oracle_index(
        [(key_to_id[(row.repo, row.path)], row.content) for row in pdf.itertuples()]
    )
    return searcher, oidx


def _assert_identical(got, expected, ctx):
    assert len(got) == len(expected), (ctx, got, expected)
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gd == ed, (ctx, got, expected)
        assert np.float32(gs) == es, (ctx, gd, gs, es)


BOOL_CASES = [
    BooleanSpec(must=("parse", "index"), must_not=("hotcommon",)),
    BooleanSpec(should=("parse", "merge", "token"), min_should_match=2),
    BooleanSpec(must=("parse",), should=("index", "merge")),
    BooleanSpec(should=("hotcommon", "parse_30"), must_not=("merge",)),
    BooleanSpec(must=("parse",), must_not=("parse",)),  # self-contradiction -> empty
    BooleanSpec(should=("parse", "zzz_missing"), min_should_match=2),  # absent term
]


@pytest.mark.parametrize("spec", BOOL_CASES, ids=[str(i) for i in range(len(BOOL_CASES))])
def test_boolean_rank_identity(built, spec):
    searcher, oidx = built
    expected = oracle_topk_spec(oidx, spec, k=10)
    got = [(r["doc_id"], r["score"]) for r in searcher.topk_spec(spec, k=10).collect()]
    _assert_identical(got, expected, spec)


@pytest.mark.parametrize("tiebreak", [0.0, 0.3])
def test_dismax_rank_identity(built, tiebreak):
    searcher, oidx = built
    spec = BooleanSpec(should=("parse", "index", "merge"), dismax=True, tiebreak=tiebreak)
    expected = oracle_topk_spec(oidx, spec, k=10)
    got = [(r["doc_id"], r["score"]) for r in searcher.topk_dismax(
        "parse index merge", k=10, tiebreak=tiebreak).collect()]
    _assert_identical(got, expected, ("dismax", tiebreak))


PHRASES = ["parse index", "index merge", "the parse index", "def class"]


@pytest.mark.parametrize("q", PHRASES)
def test_phrase_rank_identity(built, q):
    searcher, oidx = built
    expected = oracle_topk_spec(oidx, phrase_spec(q), k=10)
    got = [(r["doc_id"], r["score"]) for r in searcher.topk_phrase(q, k=10).collect()]
    _assert_identical(got, expected, ("phrase", q))


@pytest.mark.parametrize("slop", [1, 3])
def test_sloppy_phrase_rank_identity(built, slop):
    searcher, oidx = built
    spec = phrase_spec("parse merge", slop=slop)
    expected = oracle_topk_spec(oidx, spec, k=10)
    got = [
        (r["doc_id"], r["score"])
        for r in searcher.topk_phrase("parse merge", k=10, slop=slop).collect()
    ]
    _assert_identical(got, expected, ("sloppy", slop))
    # sloppy is a superset of exact matches
    exact = oracle_topk_spec(oidx, phrase_spec("parse merge"), k=1000)
    assert {d for d, _ in exact} <= {d for d, _ in oracle_topk_spec(oidx, spec, k=1000)}


def test_phrase_with_filter(built):
    """Mixed spec: phrase + MUST_NOT (two-phase + exclusion compose)."""
    searcher, oidx = built
    spec = phrase_spec("parse index")
    spec = BooleanSpec(phrase=spec.phrase, must_not=("hotcommon",))
    expected = oracle_topk_spec(oidx, spec, k=10)
    got = [(r["doc_id"], r["score"]) for r in searcher.topk_spec(spec, k=10).collect()]
    _assert_identical(got, expected, "phrase+not")


GROUP_CASES = [
    # (a OR b) AND c
    BooleanSpec(must=("parse",), groups=(("+", ("index", "merge")),)),
    # should-group + should term, msm via either
    BooleanSpec(should=("token",), groups=(("", ("parse", "merge")),)),
    # negative group
    BooleanSpec(should=("parse",), groups=(("-", ("hotcommon",)),)),
    # two groups, one required one optional
    BooleanSpec(groups=(("+", ("parse", "index")), ("", ("merge", "token")))),
    # group with an absent member
    BooleanSpec(groups=(("+", ("parse", "zzz_missing")),)),
    # required group entirely absent -> empty
    BooleanSpec(should=("parse",), groups=(("+", ("zzz_missing",)),)),
]


@pytest.mark.parametrize("spec", GROUP_CASES, ids=[str(i) for i in range(len(GROUP_CASES))])
def test_group_rank_identity(built, spec):
    """Nested SHOULD-group clauses (classic parser parens): engine ==
    control oracle rank+score."""
    searcher, oidx = built
    expected = oracle_topk_spec(oidx, spec, k=10)
    got = [(r["doc_id"], r["score"]) for r in searcher.topk_spec(spec, k=10).collect()]
    _assert_identical(got, expected, ("group", spec))


OPTIONAL_PHRASE_CASES = [
    # optional phrase + should term: docs matching either clause match
    ("parse index", 0, 1.0, ("merge",)),
    # optional sloppy phrase + should term
    ("parse merge", 2, 1.0, ("token",)),
    # boosted optional phrase
    ("index merge", 0, 2.5, ("parse",)),
]


@pytest.mark.parametrize("q,slop,boost,should", OPTIONAL_PHRASE_CASES)
def test_optional_phrase_rank_identity(built, q, slop, boost, should):
    """phrase_occur='': the phrase is one SHOULD clause among others
    (BooleanQuery default-OR), not a filter."""
    searcher, oidx = built
    base = phrase_spec(q, slop=slop)
    spec = BooleanSpec(
        phrase=base.phrase, slop=base.slop, phrase_occur="",
        phrase_boost=boost, should=should,
    )
    expected = oracle_topk_spec(oidx, spec, k=10)
    got = [(r["doc_id"], r["score"]) for r in searcher.topk_spec(spec, k=10).collect()]
    _assert_identical(got, expected, ("opt-phrase", q, slop, boost))
    # the optional phrase must be a strict superset of the required one
    req = BooleanSpec(phrase=base.phrase, slop=base.slop, should=should)
    req_docs = {d for d, _ in oracle_topk_spec(oidx, req, k=1000)}
    opt_docs = {d for d, _ in oracle_topk_spec(oidx, spec, k=1000)}
    assert req_docs <= opt_docs


def test_phrase_boost_rank_identity(built):
    """'"..."^2' (BoostQuery around PhraseQuery): boosted weightValue,
    float32-identical to the control oracle."""
    searcher, oidx = built
    base = phrase_spec("parse index")
    spec = BooleanSpec(phrase=base.phrase, phrase_boost=2.0)
    expected = oracle_topk_spec(oidx, spec, k=10)
    got = [(r["doc_id"], r["score"]) for r in searcher.topk_spec(spec, k=10).collect()]
    _assert_identical(got, expected, "phrase-boost")
    # boost must not change the matched set, only scores
    plain = oracle_topk_spec(oidx, phrase_spec("parse index"), k=1000)
    assert {d for d, _ in expected} <= {d for d, _ in plain}


def test_ngram_phrase_rewrite_rule():
    """NGramPhraseQuery.rewrite: every n-th term + last, positions kept;
    non-optimizable shapes (slop, <3 terms, gaps, n<2) unchanged."""
    from lucene_solr_spark.search.engine import ngram_phrase_rewrite

    p4 = (("ab", 0), ("bc", 1), ("cd", 2), ("de", 3))
    assert ngram_phrase_rewrite(p4, 2) == (("ab", 0), ("cd", 2), ("de", 3))
    assert ngram_phrase_rewrite(p4, 3) == (("ab", 0), ("de", 3))
    # < 3 terms: unchanged
    assert ngram_phrase_rewrite(p4[:2], 2) == p4[:2]
    # position gap (stopword hole): unchanged
    gap = (("ab", 0), ("bc", 2), ("cd", 3))
    assert ngram_phrase_rewrite(gap, 2) == gap
    # n < 2: unchanged
    assert ngram_phrase_rewrite(p4, 1) == p4


def test_ngram_phrase_rewrite_superset(built):
    """The rewritten phrase relaxes the middle constraints, so its match
    set must contain every original match (equal on true n-gram fields)."""
    from lucene_solr_spark.search.engine import ngram_phrase_rewrite

    full = phrase_spec("parse index merge").phrase
    if len(full) < 3:
        return
    red = ngram_phrase_rewrite(full, 2)
    searcher, oidx = built
    full_docs = {d for d, _ in oracle_topk_spec(oidx, BooleanSpec(phrase=full), k=1000)}
    got = {
        r["doc_id"]
        for r in searcher.topk_spec(BooleanSpec(phrase=red), k=1000).collect()
    }
    assert full_docs <= got


def test_blended_term_rank_identity(built):
    """BlendedTermQuery: every clause scores with the MAX df across the
    blended terms, combined as DisjunctionMax(tiebreak=0.01)."""
    import numpy as np

    from lucene_solr_spark.search.bm25 import K1, idf_f32, make_term_weight

    searcher, oidx = built
    terms = ("parse", "token")
    got = [
        (r["doc_id"], r["score"])
        for r in searcher.topk_blended("parse token", k=10, tiebreak=0.01).collect()
    ]
    # control: rebuild the blended weights by hand over the oracle index
    max_df = max(len(oidx.postings.get(t, {})) for t in terms)
    wv = np.float32(idf_f32(max_df, oidx.doc_count) * (K1 + np.float32(1.0)))
    docs = sorted(set().union(*[set(oidx.postings.get(t, {})) for t in terms]))
    rows = []
    for d in docs:
        nb = oidx.norm_bytes[d]
        ss = []
        for t in terms:
            tf = oidx.postings.get(t, {}).get(d, 0)
            if tf:
                w = make_term_weight(t, max_df, oidx.doc_count, oidx.avgdl)
                s = w.score(np.array([tf], dtype=np.float32), np.array([nb], dtype=np.uint8))[0]
                ss.append(np.float64(s))
        if ss:
            mx = max(ss)
            rows.append((d, np.float32(mx + 0.01 * (sum(ss) - mx))))
    rows.sort(key=lambda x: (-np.float64(x[1]), x[0]))
    _assert_identical(got, rows[:10], "blended")


MULTI_CLAUSE_PHRASES = [
    # two required phrases
    ((("parse index", 0, "+", 1.0), ("index merge", 0, "+", 1.0)), ()),
    # required + optional (sloppy, boosted)
    ((("parse index", 0, "+", 1.0), ("parse merge", 2, "", 2.0)), ()),
    # two optional phrases + a should term (msm via any clause)
    ((("parse index", 0, "", 1.0), ("index merge", 0, "", 1.0)), ("token",)),
]


@pytest.mark.parametrize("pcs,should", MULTI_CLAUSE_PHRASES)
def test_multi_phrase_clauses_rank_identity(built, pcs, should):
    """A BooleanQuery with SEVERAL PhraseQuery clauses: engine == control
    oracle rank+score (each clause keeps its own slop/boost/occur)."""
    searcher, oidx = built
    first_text, first_slop, first_occ, first_boost = pcs[0]
    base = phrase_spec(first_text, slop=first_slop)
    extra = tuple(
        (phrase_spec(t, slop=s).phrase, s, occ, b) for t, s, occ, b in pcs[1:]
    )
    spec = BooleanSpec(
        phrase=base.phrase, slop=base.slop, phrase_occur=first_occ,
        phrase_boost=first_boost, phrases=extra, should=should,
    )
    expected = oracle_topk_spec(oidx, spec, k=10)
    got = [(r["doc_id"], r["score"]) for r in searcher.topk_spec(spec, k=10).collect()]
    _assert_identical(got, expected, ("multi-phrase", pcs))
    # two required phrases: result set == intersection of the singles
    if all(occ == "+" for _t, _s, occ, _b in pcs) and not should:
        singles = []
        for t, s, _occ, b in pcs:
            ps = phrase_spec(t, slop=s)
            singles.append({
                d for d, _ in oracle_topk_spec(
                    oidx, BooleanSpec(phrase=ps.phrase, slop=ps.slop, phrase_boost=b), k=1000)
            })
        assert {d for d, _ in oracle_topk_spec(oidx, spec, k=1000)} == set.intersection(*singles)


@pytest.mark.parametrize(
    "similarity", ["lm_dirichlet", "lm_jelinek_mercer", "dfr_inl2", "ib_ll",
                   "dfr_gb2", "dfr_ifb2", "dfr_ineb2", "ib_spl_ttf",
                   "dfr_inl1", "dfr_inl3", "dfr_inlz",
                   "dfr_beb2", "dfr_bel2", "dfr_pb2", "dfr_pl2",
                   "dfr_db2", "dfr_dl2",
                   "dfi_chi_squared", "dfi_standardized", "dfi_saturated",
                   "multi_bm25_classic"]
)
@pytest.mark.parametrize("query", ["parse index", "merge token parse", "hotcommon parse_30 parse_30"])
def test_lm_similarity_rank_identity(built, similarity, query):
    """SimilarityBase models through the setSimilarity plug point:
    engine == control oracle rank+score (LMDirichletSimilarity.java:66-70,
    LMJelinekMercerSimilarity.java:54-59, DFRSimilarity InL2,
    IBSimilarity LL; duplicate terms = duplicate clauses)."""
    from lucene_solr_spark.analysis.tokenizer import analyze
    from lucene_solr_spark.search.oracle import oracle_lm_topk

    searcher, oidx = built
    spec = BooleanSpec(should=tuple(analyze(query)), similarity=similarity)
    expected = oracle_lm_topk(oidx, query, similarity, k=10)
    got = [(r["doc_id"], r["score"]) for r in searcher.topk_spec(spec, k=10).collect()]
    _assert_identical(got, expected, (similarity, query))


def test_lm_dirichlet_clamps_at_zero():
    """A term occurring LESS often in the doc than the collection model
    predicts scores 0, not negative (LMDirichletSimilarity javadoc +
    the `score > 0.0f ? score : 0.0f` clamp)."""
    from lucene_solr_spark.analysis.smallfloat import encode_norm
    from lucene_solr_spark.search.bm25 import (
        collection_probability_f32,
        lm_dirichlet_scores,
    )

    # hot term: appears everywhere (p near 1), tf=1 in a long doc -> clamped
    nb = np.array([int(encode_norm(np.array([1000]))[0])], dtype=np.uint8)
    p = collection_probability_f32(900, 1000)
    s = lm_dirichlet_scores(np.array([1.0], dtype=np.float32), nb, p)
    assert s[0] == np.float32(0.0)
    # rare term in a short doc scores positive
    nb2 = np.array([int(encode_norm(np.array([10]))[0])], dtype=np.uint8)
    p2 = collection_probability_f32(3, 1000)
    s2 = lm_dirichlet_scores(np.array([2.0], dtype=np.float32), nb2, p2)
    assert s2[0] > np.float32(0.0)


# ------------------------------------------------------- constant score

CONST_CASES = [
    # optional const clause + scored term (ReqOpt over DisjunctionSum)
    BooleanSpec(should=("merge",), const_clauses=(("", 1.0, ("parse", "index")),)),
    # pure const query (BooleanQuery rewrites to the wrapper itself)
    BooleanSpec(const_clauses=(("", 2.5, ("parse", "index")),)),
    # required const clause (ConjunctionScorer includes the constant)
    BooleanSpec(should=("merge",), const_clauses=(("+", 1.0, ("parse",)),)),
    # prohibited const clause (pure exclusion)
    BooleanSpec(should=("merge",), const_clauses=(("-", 1.0, ("parse", "index")),)),
    # dead member mixed with a live one; MUST term alongside
    BooleanSpec(must=("merge",), const_clauses=(("", 0.3, ("zzz_missing", "parse")),)),
    # two const clauses + minShouldMatch counting them as SHOULD hits
    BooleanSpec(
        const_clauses=(("", 1.0, ("parse",)), ("", 2.0, ("index", "merge"))),
        min_should_match=2,
    ),
    # all-dead required const clause -> MatchNoDocs
    BooleanSpec(should=("merge",), const_clauses=(("+", 1.0, ("zzz_missing",)),)),
]


@pytest.mark.parametrize(
    "spec", CONST_CASES, ids=[str(i) for i in range(len(CONST_CASES))]
)
def test_const_clause_rank_identity(built, spec):
    """MultiTermQueryConstantScoreWrapper clauses (the classic parser's
    default wildcard/range rewrite — pinned vs the compiled reference in
    tests/test_lucene_ground_truth.py): engine == control oracle,
    rank AND float32 score."""
    searcher, oidx = built
    expected = oracle_topk_spec(oidx, spec, k=10)
    got = [(r["doc_id"], r["score"]) for r in searcher.topk_spec(spec, k=10).collect()]
    _assert_identical(got, expected, spec)


WG_MEMBERS = (("parse", 3.25), ("index", 1.5), ("merge_0", 0.75))

WG_CASES = [
    BooleanSpec(weighted_groups=(("", WG_MEMBERS),)),
    BooleanSpec(should=("token",), weighted_groups=(("", WG_MEMBERS),)),
    BooleanSpec(must=("token",), weighted_groups=(("", WG_MEMBERS),)),
    BooleanSpec(weighted_groups=(("+", WG_MEMBERS),), should=("token",)),
    BooleanSpec(weighted_groups=(("-", WG_MEMBERS),), should=("token", "merge")),
    BooleanSpec(
        weighted_groups=(("", (("zzz_missing", 2.0), ("parse", 1.25))),),
        should=("token",),
    ),
]


@pytest.mark.parametrize("spec", WG_CASES, ids=[str(i) for i in range(len(WG_CASES))])
def test_weighted_group_rank_identity(built, spec):
    """Blended-weight nested groups (FuzzyQuery's TopTermsBlendedFreq
    ScoringRewrite shape — per-member explicit weightValue): engine ==
    control oracle, rank AND float32 score."""
    searcher, oidx = built
    expected = oracle_topk_spec(oidx, spec, k=10)
    got = [(r["doc_id"], r["score"]) for r in searcher.topk_spec(spec, k=10).collect()]
    _assert_identical(got, expected, spec)


PARSER_EXPANSION_QUERIES = [
    "par*",
    "par* merge",
    "+par* merge",
    "merge AND par*",
    "par*^2.5 merge",
    "-par* merge token",
    "[parse TO parse_2] merge",
    "parse~1",
    "parse~2 merge",
    "parse~1^2 AND merge",
    "tokem~1",
]


@pytest.mark.parametrize("q", PARSER_EXPANSION_QUERIES)
def test_parser_expansion_engine_oracle_identity(built, q):
    """Raw query strings with wildcard/range/fuzzy through the classic
    parser: the SPARK engine's top-10 must be rank+score identical to
    the control oracle evaluating the same BooleanSpec (the oracle side
    is pinned to the compiled reference in test_lucene_ground_truth)."""
    from lucene_solr_spark.search.queryparser import parse, parse_and_search, to_spec

    searcher, oidx = built
    spec = to_spec(searcher, parse(q))
    expected = oracle_topk_spec(oidx, spec, k=10)
    got = [
        (r["doc_id"], r["score"])
        for r in parse_and_search(searcher, q, k=10).collect()
    ]
    _assert_identical(got, expected, q)


# -------------------------------------------------------- mixed groups

MX = lambda *ms: tuple(ms)  # noqa: E731

MIXED_CASES = [
    # scored term + const wildcard member inside one group
    BooleanSpec(mixed_groups=(("", (("t", "merge"), ("c", 1.0, ("parse", "index")))),),
                should=("token",)),
    # required mixed group + outer must
    BooleanSpec(mixed_groups=(("+", (("t", "merge"), ("c", 2.5, ("parse",)))),),
                must=("token",)),
    # prohibited mixed group
    BooleanSpec(mixed_groups=(("-", (("t", "merge"), ("c", 1.0, ("parse",)))),),
                should=("token", "index")),
    # const-only group (pure wildcard parens)
    BooleanSpec(mixed_groups=(("", (("c", 1.5, ("parse", "index")),)),),
                should=("merge",)),
    # blended member next to a scored term
    BooleanSpec(mixed_groups=(
        ("", (("t", "token"), ("w", (("parse", 3.25), ("index", 1.5))))),)),
    # dead members mixed with live ones
    BooleanSpec(mixed_groups=(
        ("+", (("t", "zzz_missing"), ("c", 0.5, ("zzz_also", "merge")))),),
        should=("token",)),
    # two mixed groups, msm counts each as one SHOULD clause
    BooleanSpec(mixed_groups=(
        ("", (("t", "merge"), ("c", 1.0, ("parse",)))),
        ("", (("c", 2.0, ("index", "token")),)),
    ), min_should_match=2),
]


@pytest.mark.parametrize(
    "spec", MIXED_CASES, ids=[str(i) for i in range(len(MIXED_CASES))]
)
def test_mixed_group_rank_identity(built, spec):
    """Mixed paren groups (scored terms + constant-score multi-term
    members + blended fuzzy members in one nested BooleanQuery — the
    classic parser's group shape, pinned vs the compiled reference in
    tests/test_lucene_ground_truth.py): engine == control oracle, rank
    AND float32 score."""
    searcher, oidx = built
    expected = oracle_topk_spec(oidx, spec, k=10)
    got = [(r["doc_id"], r["score"]) for r in searcher.topk_spec(spec, k=10).collect()]
    _assert_identical(got, expected, spec)


def test_join_util_engine_matches_control(built):
    """GT round 68 engine leg: topk_join_util's per-key float32 folds
    (Catalyst aggregate() over doc-ordered score lists — no UDF) equal
    the pinned TermsWithScoreCollector control for every ScoreMode, on
    the self-join (fromField == toField == key) setup."""
    import numpy as np
    from pyspark.sql import functions as F

    from lucene_solr_spark.search.simpleqp import _OracleCtx, eval_tree

    searcher, oidx = built
    spark = searcher.spark
    # derive a deterministic join key per doc from doc_id
    keys_df = spark.range(0, oidx.doc_count).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("k"), (F.col("id") % 7).cast("string")).alias("source"),
    )
    docs = np.array(sorted(oidx.norm_bytes), dtype=np.int64)
    from_keys = {int(d): f"k{int(d) % 7}" for d in docs}

    for mode in ["none", "min", "max", "total", "avg"]:
        for q in ["parse index", "merge sort fast", "token"]:
            terms = searcher._analyze(q)
            tree = ("bool", tuple(("", ("term", t)) for t in terms))
            m, s = eval_tree(tree, _OracleCtx(oidx, docs))
            state, counts = {}, {}
            for i in np.nonzero(m)[0]:
                key = from_keys[int(docs[i])]
                cur = np.float32(s[i])
                if mode == "none":
                    state[key] = np.float32(1.0)
                    continue
                init = {"min": np.float32(np.inf),
                        "max": np.float32(-np.inf)}.get(mode, np.float32(0.0))
                existing = state.get(key, init)
                if existing == np.float32(0.0):
                    state[key] = cur
                    counts[key] = 1
                elif mode in ("total", "avg"):
                    state[key] = np.float32(existing + cur)
                    counts[key] = counts.get(key, 0) + 1
                elif (mode == "min" and cur < existing) or (
                        mode == "max" and cur > existing):
                    state[key] = cur
            if mode == "avg":
                state = {k: np.float32(v / np.float32(counts[k]))
                         for k, v in state.items()}
            want = sorted(
                ((int(d), state[from_keys[int(d)]])
                 for d in docs if from_keys[int(d)] in state),
                key=lambda h: (-float(h[1]), h[0]),
            )[:10]
            got = [
                (r["doc_id"], np.float32(r["score"]))
                for r in searcher.topk_join_util(q, keys_df, mode=mode,
                                                 k=10).collect()
            ]
            assert got == want, (mode, q, got, want)
