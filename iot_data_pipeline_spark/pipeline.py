"""The reference ETL pipeline re-expressed as one declarative Spark job.

Reference semantics being reproduced (SURVEY.md section 2.1, Tier A):

- JSONL scan, line-at-a-time JSON parse, malformed lines logged-and-dropped
  to an error channel (app/app.py:29-45,62-65)  -> PERMISSIVE read + corrupt
  split (sources.readers).
- ``processed_timestamp`` = current UTC time (app/app.py:48) -> injectable
  clock column so tests are deterministic.
- ``temp_fahrenheit = temperature * 9/5 + 32`` only when a numeric
  temperature exists (app/app.py:15-17,51-56) -> NULL-guarded column
  arithmetic; a record with no/non-numeric temperature passes through with
  temp_fahrenheit NULL (the typed reader put non-numeric raw text in the
  corrupt column, preserving "keep raw value" via the dead letter).
- README-declared threshold filter ">10 degC" (README.md:40) and
  device->location_id enrichment (README.md:13,42) -> optional filter stage
  and broadcast left join.
- JSONL out, empty output legal (app/app.py:68-80).

Everything is built-in column expressions -- zero Python UDFs -- so the whole
transform compiles to one WholeStageCodegen span over the scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_data_pipeline_spark.sources.readers import (
    SENSOR_SCHEMA,
    read_jsonl,
    split_corrupt,
)
from iot_data_pipeline_spark.sources.sinks import (
    write_dead_letter,
    write_jsonl,
)


@dataclass(frozen=True)
class PipelineConfig:
    """Knobs for the sensor pipeline; defaults = reference behavior."""

    temperature_threshold: float | None = None  # README.md:40 declares 10.0
    fixed_clock: str | None = None  # ISO-8601; None -> current_timestamp()
    dead_letter_path: str | None = None


def transform_sensor(
    df: DataFrame,
    config: PipelineConfig = PipelineConfig(),
    dim_location: DataFrame | None = None,
) -> DataFrame:
    """Core record transform (reference app/app.py:33-60 as column exprs)."""
    clock = (
        F.to_timestamp(F.lit(config.fixed_clock))
        if config.fixed_clock
        else F.current_timestamp()
    )
    out = df.withColumn("processed_timestamp", clock).withColumn(
        "temp_fahrenheit",
        F.when(
            F.col("temperature").isNotNull(),
            F.round(F.col("temperature") * 9 / 5 + 32, 2),
        ),
    )
    if config.temperature_threshold is not None:
        out = out.filter(F.col("temperature") > F.lit(config.temperature_threshold))
    if dim_location is not None:
        # Dim tables are small by construction (<=100 rows, FIXTURES.md
        # section 2): broadcast so the enrichment join never shuffles the
        # fact stream -- the 100 TB-safe plan for a lookup join.
        out = out.join(F.broadcast(dim_location), "device_id", "left")
    return out


def run_batch_pipeline(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    config: PipelineConfig = PipelineConfig(),
    dim_location: DataFrame | None = None,
) -> tuple[int, int]:
    """File-in, file-out batch run (reference entry point, app/app.py:19-89).

    Returns (good_count, bad_count). Unlike the reference -- which buffers
    the whole file in a Python list (app/app.py:24,60) -- nothing here
    materializes on the driver; counts come from Spark aggregations.
    """
    from pyspark.sql import Observation

    raw = read_jsonl(spark, in_path, SENSOR_SCHEMA)
    good, bad = split_corrupt(raw)
    processed = transform_sensor(good, config, dim_location)

    # Piggyback row/quality metrics on the write pass itself (df.observe):
    # counts come from the sink action, not extra full scans -- the
    # reference logs equivalent counters from its loop (app/app.py:74-79).
    obs = Observation("sensor_pipeline")
    processed = processed.observe(
        obs,
        F.count(F.lit(1)).alias("n_good"),
        F.count("temp_fahrenheit").alias("n_converted"),
        F.min("temperature").alias("min_temp"),
        F.max("temperature").alias("max_temp"),
    )
    write_jsonl(processed, out_path)
    n_good = obs.get["n_good"]

    if config.dead_letter_path is not None:
        bad_obs = Observation("sensor_pipeline_dlq")
        bad = bad.observe(bad_obs, F.count(F.lit(1)).alias("n_bad"))
        write_dead_letter(bad, config.dead_letter_path)
        n_bad = bad_obs.get["n_bad"]
    else:
        n_bad = bad.count()
    return n_good, n_bad
