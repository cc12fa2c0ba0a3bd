"""Structured Streaming surface (ingest pipeline, windowed analytics)."""

from cascade_spark.streaming import joins, pipeline, ratesource, sinks, state_reader, stateful  # noqa: F401
