"""Structured Streaming surface (ingest pipeline, windowed analytics)."""
