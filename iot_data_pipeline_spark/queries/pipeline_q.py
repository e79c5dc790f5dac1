"""Q1-Q4: the reference pipeline's semantics as oracle-checked queries.

These re-express the reference worker's per-record loop (app/app.py:33-60)
and its README-declared stages over the deterministic sensor derivation
(queries.base): projection (Q1), threshold filter (Q2, README.md:40),
NULL-guarded Celsius->Fahrenheit (Q3, app/app.py:15-17,51-56), and the
broadcast enrichment left-join (Q4, README.md:13,42).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_data_pipeline_spark.queries.base import (
    DIM_CTE,
    SENSOR_CTE,
    dim_device_location,
    sensor_frame,
)
from iot_data_pipeline_spark.queries.registry import declared


@declared(
    "q01_ingest_project",
    oracle=f"""
    WITH {SENSOR_CTE}
    SELECT device_id, temperature, humidity
    FROM sensor WHERE event_id % 7 = 0
    ORDER BY device_id, temperature, humidity
    """,
)
def q01_ingest_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest + column projection (reference A1-A4, A10; Spark prunes the
    scan to exactly these columns -- the reference parses every field even
    when unused, app/app.py:40). Audited on a deterministic 1-in-7 sample
    so the oracle compare stays linear in output size, not corpus size."""
    return (
        sensor_frame(spark, sf_dir)
        .filter(F.col("event_id") % 7 == 0)
        .select("device_id", "temperature", "humidity")
        .orderBy("device_id", "temperature", "humidity")
    )


@declared(
    "q02_threshold_filter",
    oracle=f"""
    WITH {SENSOR_CTE}
    SELECT device_id, temperature
    FROM sensor WHERE temperature > 10.0
    ORDER BY device_id, temperature
    """,
)
def q02_threshold_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README-declared threshold filter (reference README.md:40, A18).
    NULL temperature fails the predicate in both engines (SQL 3VL)."""
    return (
        sensor_frame(spark, sf_dir)
        .filter(F.col("temperature") > 10.0)
        .select("device_id", "temperature")
        .orderBy("device_id", "temperature")
    )


@declared(
    "q03_celsius_to_fahrenheit",
    oracle=f"""
    WITH {SENSOR_CTE}
    SELECT device_id, temperature,
           CASE WHEN temperature IS NOT NULL
                THEN ROUND(temperature * 9 / 5 + 32, 2) END AS temp_fahrenheit
    FROM sensor WHERE event_id % 7 = 0
    ORDER BY device_id, temperature NULLS FIRST
    """,
)
def q03_celsius_to_fahrenheit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's one scalar transform, exactly c*9/5+32
    (app/app.py:15-17), applied only when a numeric temperature exists
    (app/app.py:51-56) -- pure column arithmetic, no UDF. 1-in-7 sampled
    output (same rationale as q01)."""
    return (
        sensor_frame(spark, sf_dir)
        .filter(F.col("event_id") % 7 == 0)
        .select(
            "device_id",
            "temperature",
            F.when(
                F.col("temperature").isNotNull(),
                F.round(F.col("temperature") * 9 / 5 + 32, 2),
            ).alias("temp_fahrenheit"),
        )
        .orderBy("device_id", F.col("temperature").asc_nulls_first())
    )


@declared(
    "q04_enrichment_join",
    oracle=f"""
    WITH {SENSOR_CTE}, {DIM_CTE}
    SELECT s.device_id, COUNT(*) AS n_readings,
           MIN(d.location_id) AS location_id
    FROM sensor s LEFT JOIN dim_device_location d ON s.device_id = d.device_id
    GROUP BY s.device_id
    ORDER BY s.device_id
    """,
)
def q04_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README-declared device->location enrichment (README.md:13,42) as a
    broadcast left join: the dim is <=100 rows (FIXTURES.md section 2), so the
    fact side never shuffles -- the only plan that survives 100 TB. Unmatched
    devices keep NULL location_id (devices 15-24 here)."""
    sensor = sensor_frame(spark, sf_dir)
    dim = dim_device_location(spark)
    return (
        sensor.join(F.broadcast(dim), "device_id", "left")
        .groupBy("device_id")
        .agg(
            F.count(F.lit(1)).alias("n_readings"),
            F.min("location_id").alias("location_id"),
        )
        .orderBy("device_id")
    )
