"""Structured Streaming surface of the pipeline.

The batch operators (parsers, transformers, enrich, route) are pure
projections / broadcast joins, so they apply unchanged to streaming
DataFrames. This package adds the pieces that only make sense on a
stream: watermarked windowed counts (the interval-processor semantics),
session-window recombine (``force_flush_timeout`` semantics that have
no batch meaning, SURVEY.md 7.3 hard-part 3), and per-sink streaming
writes.
"""

from .pipeline import (
    session_recombine,
    read_rollup,
    streaming_dedup_exact,
    streaming_ingest_dedup,
    streaming_rollup,
    streaming_pipeline,
    windowed_counts,
    write_routed_stream,
)
from .metrics import (
    streaming_interval_last,
    streaming_servicegraph_pairs,
    streaming_spanmetrics,
)
from .source import file_stream, rate_transcripts, socket_stream
from .stateful import (
    stateful_cumulative_to_delta,
    stateful_delta_to_cumulative,
    streaming_tail_sampling,
)

__all__ = [
    "file_stream",
    "rate_transcripts",
    "socket_stream",
    "stateful_cumulative_to_delta",
    "stateful_delta_to_cumulative",
    "streaming_tail_sampling",
    "streaming_interval_last",
    "streaming_spanmetrics",
    "streaming_servicegraph_pairs",
    "session_recombine",
    "read_rollup",
    "streaming_dedup_exact",
    "streaming_ingest_dedup",
    "streaming_rollup",
    "streaming_pipeline",
    "windowed_counts",
    "write_routed_stream",
]
