from iot_data_pipeline_spark.sources.custom import register_sensor_source
from iot_data_pipeline_spark.sources.readers import (
    TABLES,
    load_tables,
    read_binary_files,
    read_csv,
    read_jsonl,
    read_table,
    register_views,
)
from iot_data_pipeline_spark.sources.sinks import write_jsonl, write_parquet

__all__ = [
    "TABLES",
    "load_tables",
    "read_binary_files",
    "read_csv",
    "read_jsonl",
    "read_table",
    "register_sensor_source",
    "register_views",
    "write_jsonl",
    "write_parquet",
]
