"""Structured Streaming analytics: watermarked windowed aggregation and
the applyInPandasWithState sessionizer must converge to their BATCH
counterparts after draining time-ordered drops (availableNow)."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.streaming.aggregates import (
    sessionize_stream,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_drops(spark, tmp_root):
    """The events table split into two event-time-ordered parquet drops."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    cut = ev.agg(F.expr("percentile(unix_micros(CAST(ts AS timestamp)), 0.5)")).collect()[0][0]
    src = os.path.join(tmp_root, "ev_stream_src")
    os.makedirs(src, exist_ok=True)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev.filter(us <= cut).coalesce(1).write.mode("append").parquet(src)
    ev.filter(us > cut).coalesce(1).write.mode("append").parquet(src)
    return src, ev.schema, ev


def test_windowed_counts_match_batch(spark, tmp_root, event_drops):
    src, schema, ev = event_drops
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmp_root, "ckpt_win"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode re-emits a key when it changes; counts are monotone, so
    # the LAST (= max) row per key is the final state
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql(
            """SELECT window_start, event_type, max(n_events) AS n_events,
                      max(sum_value) AS sum_value
               FROM win_counts GROUP BY 1, 2"""
        ).collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in (
            ev.withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
        ).collect()
    }
    assert got == batch


def test_stateful_sessionize_matches_batch(spark, tmp_root, event_drops):
    src, schema, ev = event_drops
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmp_root, "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in spark.sql(
            """SELECT user_id, max(n_sessions) AS n_sessions, max(n_events) AS n_events
               FROM sess_stream GROUP BY user_id"""
        ).collect()
    }
    from lucene_solr_spark.ops.pipeline import sessionize

    batch = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in sessionize(spark, SF).collect()
    }
    assert got == batch
