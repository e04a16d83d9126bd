"""Structured Streaming surface: incremental event ingestion with
watermarked windowed aggregation and custom stateful sessionization."""
