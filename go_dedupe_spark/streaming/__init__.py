"""Structured Streaming ingest for the dedupe pipeline."""

from go_dedupe_spark.streaming.ingest import (  # noqa: F401
    hourly_event_rollup_stream,
    streaming_exact_dedupe,
    stream_normalize,
    streaming_ingest_to_checkpoint,
)
