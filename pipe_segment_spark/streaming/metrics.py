"""Per-partition lineage + metrics (north_rule requirement).

Lineage: every emitted row's ids are pure functions of (key, first event
time, intra-day counter) — the reference's deterministic id scheme
(SURVEY.md §1.3) — so a replayed partition reproduces identical ids. This
module adds run-level observability around that:

- ``record_progress(query, metrics_dir)``: drains
  ``StreamingQuery.recentProgress`` into an append-only JSON metrics table
  (one row per microbatch: batch id, input rows, rows/sec, watermark,
  state-store size) — the streaming analog of the Dataflow job metrics the
  reference relies on. Idempotent per (run_id, batch_id) filename, so
  repeated calls / replays don't duplicate.
- ``StreamMetricsListener``: the same rows via StreamingQueryListener for
  long-running queries. (Note: python progress callbacks are unreliable in
  this pyspark build — verified by tests/test_metrics.py::
  test_stream_listener_delivery, which registers the listener, runs a
  query, and observes zero callback deliveries after a 20 s drain window;
  record_progress is the tested, recorded contract. The listener is kept
  because real multi-node deployments DO deliver these callbacks, and the
  test asserts well-formedness + agreement with record_progress whenever
  delivery occurs.)
- ``with_lineage``: stamps rows with their physical input partition id for
  partition-level audit of any output row.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pyspark >= 3.4 location
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    from pyspark.sql.streaming.listener import StreamingQueryListener


def with_lineage(df: DataFrame) -> DataFrame:
    """Stamp rows with their physical input partition — joins every output
    row back to the exact task that produced it on replay audits."""
    return df.withColumn("lineage_partition", F.spark_partition_id())


def _progress_row(p) -> dict:
    if not isinstance(p, dict):  # StreamingQueryProgress object (pyspark 4)
        p = json.loads(p.json)
    state_ops = p.get("stateOperators") or []
    return {
        "query_id": str(p.get("id")),
        "run_id": str(p.get("runId")),
        "batch_id": p.get("batchId"),
        "timestamp": p.get("timestamp"),
        "num_input_rows": p.get("numInputRows"),
        "processed_rows_per_second": p.get("processedRowsPerSecond"),
        "watermark": (p.get("eventTime") or {}).get("watermark"),
        "state_rows_total": sum(s.get("numRowsTotal", 0) for s in state_ops),
        "state_memory_bytes": sum(s.get("memoryUsedBytes", 0) for s in state_ops),
    }


def record_progress(query, metrics_dir: str) -> int:
    """Write every recentProgress entry of a (running or finished) streaming
    query to the metrics table. Returns number of rows written."""
    os.makedirs(metrics_dir, exist_ok=True)
    n = 0
    for p in query.recentProgress:
        row = _progress_row(p)
        path = os.path.join(
            metrics_dir, f"progress-{row['run_id']}-{row['batch_id']}.json"
        )
        with open(path, "w") as f:  # idempotent: same name on replay
            f.write(json.dumps(row))
        n += 1
    return n


class StreamMetricsListener(StreamingQueryListener):
    """Listener variant for long-running queries."""

    def __init__(self, spark: SparkSession, metrics_dir: str):
        self.spark = spark
        self.metrics_dir = metrics_dir
        os.makedirs(metrics_dir, exist_ok=True)

    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        row = _progress_row(json.loads(p.json))
        path = os.path.join(
            self.metrics_dir,
            f"progress-{row['run_id']}-{row['batch_id']}-{uuid.uuid4().hex[:6]}.json",
        )
        with open(path, "w") as f:
            f.write(json.dumps(row))

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def onQueryIdle(self, event):  # noqa: N802
        pass


def read_metrics(spark: SparkSession, metrics_dir: str) -> DataFrame:
    return spark.read.json(metrics_dir)
