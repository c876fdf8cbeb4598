"""Structured Streaming wrappers over the incremental engine (SURVEY §2.7)."""

from qvarn_mr_spark.streaming.stateful import (
    sessionize_stream,
    windowed_counts,
)
from qvarn_mr_spark.streaming.maintainer import (
    NOTIFICATION_SCHEMA,
    StreamingMaintainer,
    read_change_feed,
)

__all__ = ["NOTIFICATION_SCHEMA", "StreamingMaintainer", "read_change_feed",
           "sessionize_stream", "windowed_counts"]
