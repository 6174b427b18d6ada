"""Structured Streaming pipelines: the reference's two ingest modes
(synthetic ticker, Kafka CDC) re-expressed as streaming DataFrames,
plus sinks and pipeline metrics."""
