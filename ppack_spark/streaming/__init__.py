from .ops import (
    EVENTS_SCHEMA,
    index_corpus_bands,
    read_events_stream,
    run_to_memory,
    streaming_asof_enrich,
    streaming_corpus_ingest,
    streaming_quota_sample,
    streaming_dedup,
    streaming_near_dup_candidates,
    streaming_sessionize,
    streaming_window_agg,
)

__all__ = [
    "EVENTS_SCHEMA",
    "index_corpus_bands",
    "read_events_stream",
    "run_to_memory",
    "streaming_asof_enrich",
    "streaming_corpus_ingest",
    "streaming_quota_sample",
    "streaming_dedup",
    "streaming_near_dup_candidates",
    "streaming_sessionize",
    "streaming_window_agg",
]
