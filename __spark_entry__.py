"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). The queries live in ``iot_data_pipeline_spark.queries``
(one module per SURVEY.md section 2 area); this file is just the wiring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def _registry():
    from iot_data_pipeline_spark.queries import REGISTRY

    return REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q5-shaped revenue-per-nation star join) on
    sf0.001; the driver checks rows > 0 and a stable schema."""
    from iot_data_pipeline_spark.queries.relational import q05_revenue_per_nation
    from iot_data_pipeline_spark.session import apply_engine_conf

    apply_engine_conf(spark)
    return q05_revenue_per_nation(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            from iot_data_pipeline_spark.session import apply_engine_conf

            apply_engine_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(dq.fn) for name, dq in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted entries -> rows-only check)."""
    return {
        name: dq.oracle for name, dq in _registry().items() if dq.oracle is not None
    }
