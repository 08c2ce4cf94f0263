"""SparkSession factory with scale-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "lucene_solr_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = int(shuffle_partitions or os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE skew-join split: stopword-scale join keys get split at
        # runtime on a real cluster (build-side skew is already handled
        # structurally by the doc-range salt)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 128 MB scan splits: at 100 TB this yields ~800k input tasks —
        # >= 4 waves on a 1000-executor/8-core cluster, bounding
        # straggler cost; spills stay bounded per task
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
