"""Structured Streaming encode path."""

from xml2arrow_spark.streaming.encode_stream import encode_stream, run_stream_once

__all__ = ["encode_stream", "run_stream_once"]
