"""verify_index (CheckIndex analog): healthy index passes all invariant
passes incl. the sha256-vs-source row check; corruption is detected."""

import os

import pytest

from lucene_solr_spark.corpus import make_corpus
from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.index.check import CheckIndexError, verify_index


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    pdf = make_corpus(200, seed=21)
    src = spark.createDataFrame(pdf)
    out = os.path.join(tmp_root, "idx_check")
    build_index(
        spark, src, out_dir=out, content_col="content",
        order_cols=["repo", "path", "commit"], meta_cols=["repo", "path"],
        range_size=64, fingerprint="check200",
    )
    return out, src


def test_healthy_index_passes(spark, built):
    out, src = built
    res = verify_index(spark, out, source=src, content_col="content")
    assert res["blocks_checked"] > 0
    assert all(v == 0 for k, v in res.items() if k.endswith("violations"))


def test_detects_source_mismatch(spark, built):
    out, src = built
    from pyspark.sql import functions as F

    tampered = src.withColumn(
        "content",
        F.when(F.col("path").contains("0"), F.concat(F.col("content"), F.lit(" EVIL")))
        .otherwise(F.col("content")),
    )
    with pytest.raises(CheckIndexError, match="sha256"):
        verify_index(spark, out, source=tampered, content_col="content")
