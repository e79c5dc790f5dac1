"""Arrow-optimized scalar UDF (Spark 4 useArrow=True) parity."""

from pyspark.sql import functions as F

def test_arrow_scalar_udf_matches_builtin(spark, sf_dir):
    from iot_data_pipeline_spark.functions.udfs import (
        celsius_to_fahrenheit_arrow_scalar,
        fahrenheit_builtin,
    )
    from iot_data_pipeline_spark.queries.base import sensor_frame

    df = sensor_frame(spark, sf_dir).limit(500)
    got = df.select(
        F.round(celsius_to_fahrenheit_arrow_scalar("temperature"), 6).alias("u"),
        F.round(fahrenheit_builtin(F.col("temperature")), 6).alias("b"),
    )
    assert got.filter(
        ~(F.col("u").eqNullSafe(F.col("b")))
    ).count() == 0
