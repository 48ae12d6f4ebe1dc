"""Structured Streaming layer: the event-time window operators from
pot_spark.queries.streaming_windows executed as real streams."""

from pot_spark.streaming.runner import run_streaming_query

__all__ = ["run_streaming_query"]
