"""cascade_spark — a PySpark-native analytics engine with the
capabilities of stevenewald/cascade (event-stream ingestion, offset
addressed consumption, topic metadata) extended with a full batch
analytics surface and LLM-data-pipeline operators.

Architecture (Spark-first, see SURVEY.md):
- ``session``    — SparkSession factory (UTC, AQE, tuned shuffle).
- ``tables``     — fixture/table loading helpers.
- ``plans``      — declared-query registry + DuckDB-oracle canonicalization.
- ``operators``  — relational + extension operators (each registers
  declared queries).
- ``sources``    — batch scan/sink helpers (parquet/csv/json).
- ``functions``  — scalar function surface (string/date/math/array/json).
- ``streaming``  — Structured Streaming ingest + windowed analytics.

Every operator is expressed with the DataFrame/SQL API so Catalyst
keeps predicate pushdown, column pruning, broadcast selection, and
whole-stage codegen; Python-side compute (pandas UDFs) is used only
where built-ins cannot express the semantics (see operators/similarity,
operators/multimodal).
"""

from cascade_spark.session import get_spark
from cascade_spark.plans.registry import REGISTRY, register

__all__ = ["get_spark", "REGISTRY", "register"]
