"""Structured Streaming wrappers over the incremental engine (SURVEY §2.7)."""

from qvarn_mr_spark.streaming.stateful import (
    dedup_stream,
    latest_per_key_stream,
    sessionize_stream,
    windowed_counts,
)
from qvarn_mr_spark.streaming.maintainer import (
    NOTIFICATION_SCHEMA,
    StreamingMaintainer,
    read_change_feed,
)
from qvarn_mr_spark.streaming.lease import (
    BusyWorkerError,
    WorkerLease,
)

__all__ = ["BusyWorkerError", "NOTIFICATION_SCHEMA", "StreamingMaintainer",
           "WorkerLease", "dedup_stream", "latest_per_key_stream",
           "read_change_feed",
           "sessionize_stream", "windowed_counts"]
