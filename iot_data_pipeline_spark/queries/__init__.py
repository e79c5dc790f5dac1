"""Declared-query registry (SURVEY.md section 2.3): importing this package
populates REGISTRY with every oracle-checked query."""

from iot_data_pipeline_spark.queries import (  # noqa: F401
    extras,
    functions_q,
    ingest_q,
    llm,
    modern,
    pipeline_q,
    relational,
    sampling,
    timeseries,
    tpch_extra,
    windows,
)
from iot_data_pipeline_spark.queries.registry import REGISTRY, DeclaredQuery

__all__ = ["REGISTRY", "DeclaredQuery"]
