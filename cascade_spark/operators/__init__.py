"""Operator modules — importing this package registers every declared
query (see cascade_spark.plans.registry.load_all)."""

from cascade_spark.operators import (  # noqa: F401
    aggregations,
    analytics,
    asof,
    bucketing,
    consume,
    curation,
    dedup,
    filters,
    grouping,
    incremental,
    ingest,
    joins,
    multimodal,
    profiling,
    roundtrip,
    scd,
    setops,
    similarity,
    sorts,
    text,
    windows,
)
