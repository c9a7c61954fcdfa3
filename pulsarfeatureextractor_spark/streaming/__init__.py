"""Structured Streaming mirror of the batch operators (SURVEY.md §2B X1–X4)."""

from pulsarfeatureextractor_spark.streaming.mirror import (  # noqa: F401
    stream_events_from_table,
    streaming_ffill_state,
    streaming_lyon_features,
    streaming_session_windows,
    streaming_tumbling_counts,
)
