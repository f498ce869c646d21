"""Structured Streaming form of the incremental pipeline (SURVEY §2.9)."""

from .incremental import (
    dedup_within_watermark,
    read_match_stream,
    run_stream_to_memory,
    segment_windowed_counts,
    stream_extract,
    windowed_event_counts,
    windowed_hll_registers,
    windowed_kmv_distinct,
)
from .stateful import running_user_stats

__all__ = [
    "dedup_within_watermark",
    "read_match_stream",
    "run_stream_to_memory",
    "segment_windowed_counts",
    "stream_extract",
    "windowed_event_counts",
    "windowed_hll_registers",
    "windowed_kmv_distinct",
    "running_user_stats",
]
