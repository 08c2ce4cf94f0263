"""Structured Streaming analytics over the events stream.

The task brief's streaming prescription: `readStream -> transformations
-> writeStream; watermarks + windowed aggs for late data;
applyInPandasWithState for custom stateful operators`. This module
provides both, as the streaming counterparts of the batch ops:

* windowed_event_counts — event-time tumbling-window facet counts with
  a watermark bounding late-data state (the streaming analog of
  `ops.relational.facets` / RangeFacetProcessor over time).
* sessionize_stream — custom stateful sessionization with
  applyInPandasWithState (the streaming analog of
  `ops.pipeline.sessionize`'s lag/cumsum idiom): per-user state carries
  (last event time, session count, event count) across micro-batches.

Scale posture: state is partitioned by the group key (user_id) exactly
like the batch window's partitionBy; the watermark bounds the state
store; both run identically on a 1000-executor cluster because all
state transitions are per-key.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_GAP_MIN = 30


def windowed_event_counts(
    stream_df: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows with late-data watermark: per
    (window, event_type) event counts and value sums. TIMESTAMP_NTZ
    sources are cast to TIMESTAMP (watermarks require an instant)."""
    return (
        stream_df.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)
_SESSION_STATE = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _session_fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """Fold a user's micro-batch events into session state: a new
    session starts after a > SESSION_GAP_MIN gap (same rule as the
    batch op). Assumes micro-batches arrive in event-time order per
    user (file-drop sources; an out-of-order source would buffer by
    watermark first)."""
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    if state.exists:
        last_us, n_sessions, n_events = state.get
    else:
        last_us, n_sessions, n_events = None, 0, 0
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        s = pd.to_datetime(pdf["ts"])
        vals = s.astype("int64")
        if str(s.dtype).startswith("datetime64[ns"):
            vals = vals // 1000  # ns -> us
        for ts in vals:
            if last_us is None or ts - last_us > gap_us:
                n_sessions += 1
            last_us = int(ts)
            n_events += 1
    state.update((last_us, n_sessions, n_events))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
    )


def sessionize_stream(stream_df: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: cumulative
    per-user session/event counts, emitted each micro-batch (Update
    mode)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream_df.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=_SESSION_OUTPUT,
            stateStructType=_SESSION_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
