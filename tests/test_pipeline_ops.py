"""Training-data pipeline ops vs their DuckDB oracles at sf0.001.

Mirrors the driver's correctness gate (row count + sorted-column value
equality) for a fast representative subset; tools/check_oracle_parity.py
covers the full set at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from lucene_solr_spark.ops.pipeline import OPS

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "dedup_exact_family",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_family",
    "quality_score",
    "doc_fingerprint",
    "multimodal_decode",
    "graph_bfs",
    "sessionize",
    "scrub_clean",
    "contamination_check",
]


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = "nan" if math.isnan(v) else round(v, 9)
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out), [cols[i].lower() for i in order]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", SUBSET)
def test_pipeline_op_matches_oracle(spark, duck, name):
    fn, sql = OPS[name]
    if callable(sql):
        sql = sql(SF_DIR)  # lazy oracle: data-dependent literals
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    sn, sc = _normalize(srows, sdf.columns)
    on, oc = _normalize(orows, ocols)
    assert sc == oc
    assert len(sn) == len(on)
    assert sn == on


def test_media_decoders_parse_real_containers():
    """The BMP/WAV decoders genuinely parse the binary (magic, header
    fields, row padding, chunk walk) — not doc_id arithmetic."""
    import numpy as np
    import pytest

    from lucene_solr_spark.ops.pipeline import (
        _decode_bmp,
        _decode_wav,
        _synth_media_batch,
    )

    bmp = _synth_media_batch([10])[0]
    assert bmp[:2] == b"BM"
    modality, w, h, mean_px = _decode_bmp(bmp)
    assert (modality, w, h) == ("bmp", 4 + 10 % 13, 3 + 10 % 7)
    # decoded mean equals the synthesis formula mean (padding excluded)
    n = w * h * 3
    want = float(np.mean(((10 * 31) % 256 + np.arange(n) * 7) % 256))
    assert abs(mean_px - want) < 1e-9

    wav = _synth_media_batch([11])[0]
    modality, sr, n_samp, rms = _decode_wav(wav)
    assert (modality, sr, n_samp) == ("wav", 8000, 2000 + 11 % 500)
    samp = ((11 * 17 + np.arange(n_samp) * 5) % 201) - 100
    assert abs(rms - float(np.sqrt(np.mean(samp.astype(float) ** 2)))) < 1e-9

    with pytest.raises(ValueError):
        _decode_bmp(b"XX" + bmp[2:])
    with pytest.raises(ValueError):
        _decode_wav(b"JUNK" + wav[4:])
    # truncated-header BMP must not silently succeed
    with pytest.raises(Exception):
        _decode_bmp(bmp[:20])


def test_pii_scrub_hand_check(spark):
    """Recompute counts + redaction in pure Python `re` for a sample of
    docs; the Spark/Catalyst regexes must agree byte-for-byte."""
    import hashlib
    import re

    import pandas as pd

    from lucene_solr_spark.ops.pipeline import (
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
        pii_scrub,
    )

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]
    got = {r["doc_id"]: r for r in (x.asDict() for x in pii_scrub(spark, SF_DIR).collect())}
    checked = 0
    for _, row in docs.head(60).iterrows():
        did, text = int(row.doc_id), row.text
        aug = text
        if did % 3 == 0:
            aug += f" contact dev{did}@example.com"
        if did % 5 == 0:
            aug += f" host 10.{did % 200}.0.{did % 250}"
        if did % 7 == 0:
            aug += f" tel 555-{did % 10000:04d}"
        red = re.sub(PII_EMAIL_RE, "<EMAIL>", aug)
        red = re.sub(PII_IPV4_RE, "<IP>", red)
        red = re.sub(PII_PHONE_RE, "<PHONE>", red)
        g = got[did]
        assert g["n_email"] == len(re.findall(PII_EMAIL_RE, aug))
        assert g["n_ipv4"] == len(re.findall(PII_IPV4_RE, aug))
        assert g["n_phone"] == len(re.findall(PII_PHONE_RE, aug))
        assert g["redacted_fp"] == hashlib.sha256(red.encode()).hexdigest()[:16]
        checked += 1
    assert checked == 60
    # the planting moduli actually exercise every pattern
    assert sum(g["n_email"] for g in got.values()) > 0
    assert sum(g["n_ipv4"] for g in got.values()) > 0
    assert sum(g["n_phone"] for g in got.values()) > 0


def test_contamination_hand_check(spark):
    """Pure-Python set recompute of the eval-overlap fractions."""
    import pandas as pd

    from lucene_solr_spark.ops.pipeline import (
        CONTAM_EVAL_MOD,
        CONTAM_K,
        contamination_check,
    )

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]

    def grams(text):
        t = [w for w in text.split(" ") if w]
        return {" ".join(t[i : i + CONTAM_K]) for i in range(len(t) - CONTAM_K + 1)}

    ev = set()
    for _, row in docs.iterrows():
        if int(row.doc_id) % CONTAM_EVAL_MOD == 0:
            ev |= grams(row.text)
    want = {}
    for _, row in docs.iterrows():
        did = int(row.doc_id)
        if did % CONTAM_EVAL_MOD == 0:
            continue
        g = grams(row.text)
        if g:
            want[did] = (len(g), len(g & ev))
    got = {
        r["doc_id"]: (r["n_grams"], r["n_contaminated"])
        for r in (x.asDict() for x in contamination_check(spark, SF_DIR).collect())
    }
    assert got == want
    # eval docs never appear; an exact-dup of an eval doc would be 1.0
    assert all(d % CONTAM_EVAL_MOD != 0 for d in got)


def test_perceptron_classify_df_distributed(spark):
    """classify_df: the trained perceptron broadcast into one Arrow
    stage classifies a DataFrame identically to driver-side assign."""
    from lucene_solr_spark.search.perceptron import (
        classify_df,
        train_boolean_perceptron,
    )

    docs = [(["aa", "bb"], True), (["cc"], False), (["aa", "cc"], True),
            (["dd", "dd"], False), (["bb", "bb", "aa"], True)]
    clf = train_boolean_perceptron(docs, batch_size=2)
    rows = [(i, t) for i, t in enumerate(
        ["aa bb", "cc dd", "aa", "dd dd dd", ""])]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["assigned"], r["p_score"])
        for r in classify_df(sdf, clf, lambda t: t.split()).collect()
    }
    for i, t in rows:
        c, s = clf.assign(t.split())
        assert got[i] == (c, s), (i, t, got[i], (c, s))


def test_dataset_splitter_spark_matches_python_mirror(spark):
    """dataset_splitter_assign (pure Catalyst windows) == the
    binary-pinned sequential mirror over a skewed class distribution."""
    import random as _random

    from lucene_solr_spark.ops.pipeline import (
        dataset_splitter_assign,
        dataset_splitter_assign_py,
    )

    rng = _random.Random(64)
    rows = [(i, rng.choice(["x", "y", "z"])) for i in range(200)]
    sdf = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        r["doc_id"]: r["split"]
        for r in dataset_splitter_assign(
            sdf, "lang", 0.25, 0.15).collect()
    }
    exp = dataset_splitter_assign_py(rows, 0.25, 0.15)
    for (doc, _c), e in zip(rows, exp):
        assert got[doc] == e, (doc, got[doc], e)


def test_vectorized_shingle_hash_matches_reference():
    """r4 (VERDICT #2): the vectorized shingle-hash path — sha256 once
    per DISTINCT token (factorize) + numpy uint64 fold — must equal the
    per-shingle reference computation exactly, including boundary docs
    (len < k, empty, None) and the uint64 wraparound the DuckDB HUGEINT
    replay mirrors."""
    import hashlib

    import numpy as np

    from lucene_solr_spark.ops.pipeline import _MH_P, _shingle_hash_batch

    texts = ["the quick brown fox the quick", "a b", "", None,
             "x " * 300 + "y z", "solo"]
    dids = [7, 8, 9, 10, 11, 12]

    def ref(txt, k=3):
        t = [x for x in (txt or "").split(" ") if x]
        out = []
        for i in range(max(len(t) - k + 1, 0)):
            # seeding h=0 collapses the first step to th (0*P+th == th),
            # matching the engine's seed-with-first-token-hash fold
            h = 0
            for w in t[i:i + k]:
                th = int.from_bytes(
                    hashlib.sha256(w.encode()).digest()[:8], "big")
                h = (h * int(_MH_P) + th) % (1 << 64)
            out.append(h)
        return out

    want_ids, want_h = [], []
    for did, txt in zip(dids, texts):
        for h in ref(txt):
            want_ids.append(did)
            want_h.append(h)
    got_ids, got_h = _shingle_hash_batch(dids, texts, 3)
    assert list(got_ids) == want_ids
    assert [int(v) for v in got_h] == want_h
    assert got_h.dtype == np.uint64


def test_vectorized_shingle_rows_distinct(spark):
    """shingle_rows' object-array concat path must emit the same gram
    stream as the naive join loop, and distinct=True must dedupe
    per-doc without dropping cross-doc repeats."""
    import pandas as pd

    from lucene_solr_spark.ops.pipeline import shingle_rows

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c a b c a b", "a b c", "short"],
    })
    df = spark.createDataFrame(pdf)
    got = {(r["doc_id"], r["s"])
           for r in shingle_rows(df, k=3, distinct=True).collect()}
    want = set()
    for did, txt in zip(pdf["doc_id"], pdf["text"]):
        t = txt.split(" ")
        for i in range(max(len(t) - 2, 0)):
            want.add((did, " ".join(t[i:i + 3])))
    assert got == want
    # non-distinct keeps duplicates: doc 1 has 6 grams, 2 distinct
    rows = shingle_rows(df, k=3, distinct=False).where("doc_id = 1").count()
    assert rows == 6
