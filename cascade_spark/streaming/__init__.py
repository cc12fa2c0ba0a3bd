"""Structured Streaming surface (ingest pipeline, windowed analytics)."""

from cascade_spark.streaming import pipeline  # noqa: F401
