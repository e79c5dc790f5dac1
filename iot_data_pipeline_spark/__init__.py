"""PySpark-native analytics engine with the query and data-processing
capabilities of the ``7003078589/iot-data-pipeline`` reference.

The reference (surveyed in SURVEY.md) is an event-driven IoT ETL pipeline:
JSONL ingest from object storage, per-record validation with a log-and-drop
error channel, Celsius->Fahrenheit conversion, README-declared threshold
filtering and device->location enrichment, and per-file micro-batch
orchestration (reference: app/app.py:19-89, lambda/s3_event_handler.py:21-70).

This package re-expresses that surface -- plus the generalized relational /
streaming / LLM-data-pipeline operator inventory of SURVEY.md section 2 -- as
idiomatic Spark: DataFrame/SQL on Catalyst, Structured Streaming file sources,
and built-in column expressions (no row-at-a-time Python in the hot path).
"""

from iot_data_pipeline_spark.engine import Engine
from iot_data_pipeline_spark.session import build_session, get_session

__all__ = ["Engine", "build_session", "get_session"]
