"""TopicStream / DaemonStream analogs: checkpointed incremental pull.

Reference semantics (solr/solrj/.../io/stream/TopicStream.java:76-104):
a topic stream remembers a per-shard `_version_` watermark in a checkpoint
collection and each open() returns only tuples newer than the watermark;
DaemonStream (DaemonStream.java) re-runs an inner stream forever in the
background. The reference has NO watermark/window semantics — its
"streaming" is exactly this incremental batch pattern.

Spark mapping: the watermark is a monotonically increasing column (here a
doc/event id or version); each pull() filters `col > watermark`, hands the
increment to a callback, and durably advances the checkpoint AFTER the
callback succeeds (at-least-once, like the reference's checkpointEvery)."""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TopicStream:
    """Incremental pull over a table with a monotonically increasing
    version column, with a durable JSON checkpoint."""

    def __init__(
        self,
        spark: SparkSession,
        source: Callable[[SparkSession], DataFrame],
        version_col: str,
        checkpoint_dir: str,
    ):
        self.spark = spark
        self.source = source
        self.version_col = version_col
        self.checkpoint_dir = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)
        self._ckpt = os.path.join(checkpoint_dir, "topic_checkpoint.json")

    @property
    def watermark(self) -> int:
        if not os.path.exists(self._ckpt):
            return -1
        with open(self._ckpt) as f:
            return int(json.load(f)["watermark"])

    def _commit(self, watermark: int, n_rows: int) -> None:
        tmp = self._ckpt + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"watermark": int(watermark), "rows": int(n_rows), "ts": time.time()}, f
            )
        os.replace(tmp, self._ckpt)  # atomic (checkpointEvery durability)

    def pull(self, process: Callable[[DataFrame], None] | None = None) -> int:
        """One incremental read: rows with version > watermark. Runs
        `process(increment)`, then advances the checkpoint to the max
        version seen. Returns the number of new rows (0 = caught up)."""
        wm = self.watermark
        inc = self.source(self.spark).filter(F.col(self.version_col) > F.lit(wm))
        stats = inc.agg(
            F.count("*").alias("n"), F.max(self.version_col).alias("mx")
        ).collect()[0]
        n = int(stats["n"])
        if n == 0:
            return 0
        if process is not None:
            process(inc)
        self._commit(int(stats["mx"]), n)
        return n


class DaemonStream:
    """Runs an inner TopicStream repeatedly (DaemonStream.java:341 — a
    background continuous query). `max_runs`/`idle_stop` bound the loop for
    batch environments; on a cluster this would be a long-lived driver."""

    def __init__(self, topic: TopicStream, interval_s: float = 0.0):
        self.topic = topic
        self.interval_s = interval_s
        self.runs = 0
        self.rows = 0

    def run(
        self,
        process: Callable[[DataFrame], None] | None = None,
        max_runs: int = 10,
        idle_stop: int = 1,
    ) -> dict:
        idle = 0
        while self.runs < max_runs and idle < idle_stop:
            n = self.topic.pull(process)
            self.runs += 1
            self.rows += n
            idle = idle + 1 if n == 0 else 0
            if self.interval_s and idle < idle_stop:
                time.sleep(self.interval_s)
        return {"runs": self.runs, "rows": self.rows}
