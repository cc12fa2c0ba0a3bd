"""Batch sources & sinks (parquet/csv/json scans, partitioned writes)."""
