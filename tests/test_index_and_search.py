"""End-to-end: build the index on Spark, assert rank- and score-identity vs
the pure-Python control oracle (BaseDistributedSearchTestCase pattern), index
invariants (CheckIndex analog), and determinism across parallelism."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import make_corpus
from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.engine import IndexSearcher
from lucene_solr_spark.search.oracle import build_oracle_index, oracle_topk

N_DOCS = 400

QUERIES = [
    ("hotcommon", "or"),            # stopword-scale df (skew)
    ("parse", "or"),                # common term
    ("parse_30", "or"),             # rare term
    ("parse index merge", "or"),
    ("parse index", "and"),
    ("hotcommon parse_30", "or"),   # rare + hot (WAND stressor)
    ("hotcommon parse_30", "and"),
    ("def class return", "or"),
    ("DupLicated content", "or"),   # exact-dup docs -> ties
    ("the and of", "or"),           # all stopwords -> empty
    ("zzz_missing", "or"),          # absent term -> empty
    ("PARSE Index", "or"),          # query analysis = lowercase
    ("token score", "and"),
]


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    pdf = make_corpus(N_DOCS, seed=42)
    src = spark.createDataFrame(pdf)
    out = os.path.join(tmp_root, "idx_corpus")
    paths = build_index(
        spark,
        src,
        out_dir=out,
        content_col="content",
        order_cols=["repo", "path", "commit"],
        meta_cols=["repo", "path", "lang"],
        range_size=64,  # small ranges so the tiny corpus exercises multi-range merge
        fingerprint="corpus400v1",
    )
    searcher = IndexSearcher(spark, out)
    # oracle over the SAME doc_id assignment
    docs = spark.read.parquet(paths.docs).select("doc_id", "repo", "path").collect()
    key_to_id = {(r["repo"], r["path"]): r["doc_id"] for r in docs}
    oracle_docs = [
        (key_to_id[(row.repo, row.path)], row.content) for row in pdf.itertuples()
    ]
    oidx = build_oracle_index(oracle_docs)
    return paths, searcher, oidx


def test_corpus_stats_match_oracle(built):
    _, searcher, oidx = built
    assert searcher.doc_count == oidx.doc_count == N_DOCS
    assert searcher.sum_ttf == oidx.sum_ttf
    assert searcher.avgdl == oidx.avgdl


@pytest.mark.parametrize("query,mode", QUERIES, ids=[f"{q}:{m}" for q, m in QUERIES])
def test_rank_identity(built, query, mode):
    _, searcher, oidx = built
    expected = oracle_topk(oidx, query, k=10, mode=mode)
    got = [(r["doc_id"], r["score"]) for r in searcher.topk(query, k=10, mode=mode).collect()]
    assert len(got) == len(expected)
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gd == ed, (query, mode, got, expected)
        assert np.float32(gs) == es, (query, gd, gs, es)


def test_prune_does_not_change_results(built):
    _, searcher, oidx = built
    for q in ["hotcommon", "parse index merge", "hotcommon parse_30"]:
        pruned = [(r["doc_id"], r["score"]) for r in searcher.topk(q, k=10, prune=True).collect()]
        full = [(r["doc_id"], r["score"]) for r in searcher.topk(q, k=10, prune=False).collect()]
        assert pruned == full


def test_index_invariants(built, spark):
    """CheckIndex analog (CheckIndex.java:80-212; FIXTURES.md §6)."""
    paths, searcher, oidx = built
    blocks = spark.read.parquet(paths.postings)
    docs = spark.read.parquet(paths.docs)
    term_stats = spark.read.parquet(paths.term_stats)

    # df == total posting entries; sum tf == ttf — engine vs oracle
    ts = {r["term"]: (r["df"], r["ttf"]) for r in term_stats.collect()}
    for term, post in oidx.postings.items():
        assert ts[term][0] == len(post), term
        assert ts[term][1] == sum(post.values()), term
    assert len(ts) == len(oidx.postings)

    # block metadata consistent
    bad = blocks.filter(
        (F.col("first_doc") > F.col("last_doc"))
        | (F.col("n_docs") <= 0)
        | (F.col("max_tf") <= 0)
    ).count()
    assert bad == 0

    # every posting doc exists in docs; norms match oracle
    norm_map = {r["doc_id"]: r["norm_byte"] for r in docs.select("doc_id", "norm_byte").collect()}
    assert norm_map.keys() == oidx.norm_bytes.keys()
    for d, nb in oidx.norm_bytes.items():
        assert norm_map[d] == nb

    # sha256 invariant vs source content recomputed
    import hashlib

    pdf = make_corpus(N_DOCS, seed=42)
    sha_by_key = {
        (row.repo, row.path): hashlib.sha256(row.content.encode()).hexdigest()
        for row in pdf.itertuples()
    }
    for r in docs.select("repo", "path", "sha256").collect():
        assert sha_by_key[(r["repo"], r["path"])] == r["sha256"]


def test_determinism_across_parallelism(built, spark, tmp_root):
    """Same input at different partition counts -> identical stats + top-k
    (FIXTURES.md §6 final invariant)."""
    paths, searcher, _ = built
    pdf = make_corpus(N_DOCS, seed=42)
    src = spark.createDataFrame(pdf).repartition(13)  # different input layout
    out2 = os.path.join(tmp_root, "idx_corpus_p13")
    build_index(
        spark, src, out_dir=out2, content_col="content",
        order_cols=["repo", "path", "commit"], meta_cols=["repo", "path", "lang"],
        range_size=64, fingerprint="corpus400v1p13",
    )
    s2 = IndexSearcher(spark, out2)
    assert s2.doc_count == searcher.doc_count
    assert s2.sum_ttf == searcher.sum_ttf
    for q, m in [("hotcommon parse_30", "or"), ("parse index", "and"), ("def class return", "or")]:
        a = [(r["doc_id"], r["score"]) for r in searcher.topk(q, k=10, mode=m).collect()]
        b = [(r["doc_id"], r["score"]) for r in s2.topk(q, k=10, mode=m).collect()]
        assert a == b


def test_resume_skips_completed_stages(built, spark, tmp_root):
    """Checkpoint-resume: re-running build with same fingerprint is a no-op."""
    paths, _, _ = built
    import json, time

    with open(paths.manifest("postings")) as f:
        gen_before = json.load(f)["generation"]
    pdf = make_corpus(N_DOCS, seed=42)
    src = spark.createDataFrame(pdf)
    t = time.time()
    build_index(
        spark, src, out_dir=paths.root, content_col="content",
        order_cols=["repo", "path", "commit"], meta_cols=["repo", "path", "lang"],
        range_size=64, fingerprint="corpus400v1",
    )
    with open(paths.manifest("postings")) as f:
        assert json.load(f)["generation"] == gen_before  # stage skipped


def test_explain_matches_topk_scores(built):
    """IndexSearcher.explain (GT round 37 pins the node values vs the
    compiled reference): the tree's ROOT value must equal the doc's
    topk score bit-for-bit, matching docs only, and the tfNorm leaves
    must carry the doc's true quantized field length."""
    _, searcher, _ = built
    for query, mode in [("parse index merge", "or"), ("parse index", "and"),
                        ("hotcommon", "or")]:
        hits = [(r["doc_id"], r["score"])
                for r in searcher.topk(query, k=5, mode=mode).collect()]
        assert hits
        for doc_id, score in hits:
            tree = searcher.explain(query, doc_id, mode=mode)
            assert tree["match"] is True
            # the REFERENCE's own explain differs from its scorer by
            # design (both faithfully reproduced here, each pinned vs
            # the binary on its own side): explainTFNorm recomputes
            # (1-b) + (b*doclen)/avgdl while the scorer reads the
            # k1*(1-b+b*decode/avgdl) norm CACHE (different float32
            # association), and BooleanWeight.explain sums clause
            # values in float32 while DisjunctionSumScorer accumulates
            # in double — so explain sits within a rounding step of
            # the hit score, not necessarily ON it
            g, e = np.float32(tree["value"]), np.float32(score)
            ulp = np.float32(np.spacing(e))
            assert abs(float(g) - float(e)) <= 2.0 * float(ulp), (
                query, doc_id, float(g), float(e))
        # a doc that does NOT match: explain must say so
        all_ids = {d for d, _ in hits}
        miss = searcher.explain("zzz_missing", hits[0][0])
        assert miss["match"] is False and miss["value"] == 0.0


def test_slow_fuzzy_engine_matches_oracle(built):
    """SlowFuzzyQuery end-to-end (GT round 76): the pinned
    `slow_fuzzy_expand` runs over the ENGINE's term dictionary
    (term_stats metadata scan), and the rewritten boosted-SHOULD query
    scores rank+float32 identical to the control oracle, including a
    raw distance-3 case core FuzzyQuery cannot express."""
    import numpy as np

    from lucene_solr_spark.search.engine import BooleanSpec
    from lucene_solr_spark.search.fuzzy_slow import slow_fuzzy_expand
    from lucene_solr_spark.search.oracle import oracle_topk_spec

    _, searcher, oidx = built
    dictionary = sorted(oidx.postings)  # == the index term dict (stats
    # equality asserted in test_corpus_stats_match_oracle)
    for text, ms, pl, me in [
        ("parse", 3.0, 1, 50),     # raw, beyond-FuzzyQuery distance
        ("parze", 2.0, 0, 5),      # raw, capped expansion
        ("indexx", 0.5, 1, 50),    # fractional similarity
        ("clas", 1.0, 0, 3),
    ]:
        exp = slow_fuzzy_expand(dictionary, text, ms, pl, me)
        if not exp:
            continue
        spec = BooleanSpec(
            should=tuple(t for t, _b in exp),
            boosts=tuple((t, float(b)) for t, b in exp),
        )
        expected = oracle_topk_spec(oidx, spec, k=10)
        got = [
            (r["doc_id"], np.float32(r["score"]))
            for r in searcher.topk_spec(spec, k=10).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in expected], (
            text, ms, pl, me, exp, got, expected)
        for (gd, gs), (_ed, es) in zip(got, expected):
            assert gs == es, (text, ms, pl, me, gd, gs, es)
