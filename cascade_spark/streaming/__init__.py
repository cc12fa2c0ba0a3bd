"""Structured Streaming surface (ingest pipeline, windowed analytics)."""

from cascade_spark.streaming import pipeline, sinks, stateful  # noqa: F401
