"""Structured Streaming surface (SURVEY.md §2.11).

The reference is batch-only; this package provides the engine's streaming
story for continuous doc ingest: tumbling/sliding windowed aggregations with
event-time watermarks, in-watermark dedup, and the streaming twin of the
block time-average operator.
"""
