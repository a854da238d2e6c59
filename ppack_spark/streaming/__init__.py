from .ops import (
    EVENTS_SCHEMA,
    read_events_stream,
    run_to_memory,
    streaming_dedup,
    streaming_sessionize,
    streaming_window_agg,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "run_to_memory",
    "streaming_dedup",
    "streaming_sessionize",
    "streaming_window_agg",
]
