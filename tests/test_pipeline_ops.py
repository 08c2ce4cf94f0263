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
