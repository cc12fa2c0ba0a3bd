from cascade_spark.plans.registry import REGISTRY, Query, register

__all__ = ["REGISTRY", "Query", "register"]
