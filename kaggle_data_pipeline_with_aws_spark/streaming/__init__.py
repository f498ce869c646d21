"""Structured Streaming form of the incremental pipeline (SURVEY §2.9)."""

from .incremental import (
    dedup_within_watermark,
    read_match_stream,
    run_stream_to_memory,
    stream_extract,
    windowed_event_counts,
)
from .stateful import running_user_stats

__all__ = [
    "dedup_within_watermark",
    "read_match_stream",
    "run_stream_to_memory",
    "stream_extract",
    "windowed_event_counts",
    "running_user_stats",
]
