"""JDBCStream == spark.read.jdbc, demoed against embedded Apache Derby
(the Derby driver ships in Spark's JVM — no external RDBMS needed).

Reference: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
JDBCStream.java:75 (open() executes the SQL and walks the ResultSet).
"""

import os

from pyspark.sql import functions as F

from lucene_solr_spark.ops.relational import jdbc_load, jdbc_stream

SF = "/root/testdata/sf0.001"


def test_jdbc_roundtrip_matches_parquet(spark, tmp_path):
    url = jdbc_load(spark, SF, os.path.join(str(tmp_path), "derbydb"))
    via_jdbc = (
        jdbc_stream(spark, url, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
        .collect()
    )
    direct = (
        spark.read.parquet(f"{SF}/nation.parquet")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
        .collect()
    )
    assert [tuple(r) for r in via_jdbc] == [tuple(r) for r in direct]


def test_jdbc_partitioned_read_and_pushdown(spark, tmp_path):
    url = jdbc_load(spark, SF, os.path.join(str(tmp_path), "derbydb2"))
    df = jdbc_stream(
        spark,
        url,
        "nation",
        partition_column="n_nationkey",
        num_partitions=4,
        bounds=(0, 24),
    ).filter(F.col("n_regionkey") == 1)
    # the scale path: 4 range-predicated connections, not one serial scan
    assert df.rdd.getNumPartitions() == 4
    # the filter reaches the remote SQL, not a post-scan Filter node
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "N_REGIONKEY" in plan.upper()
    expected = (
        spark.read.parquet(f"{SF}/nation.parquet")
        .filter(F.col("n_regionkey") == 1)
        .count()
    )
    assert df.count() == expected
