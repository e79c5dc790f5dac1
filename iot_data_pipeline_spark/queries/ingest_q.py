"""Q13/Q14: dirty-ingest routing and streaming-ingest parity as oracle
queries (SURVEY.md section 2.3).

The driver's DuckDB oracle can only see the ten pre-registered parquet
views, so both queries *derive their fixture files deterministically from
the events table* (same modular rules on both sides), run the real file
surface (PERMISSIVE JSONL read / checkpointed streaming ingest), and return
aggregates the oracle recomputes straight from ``events``.

Q13 line classes, keyed on ``event_id % 13`` (reference app/app.py:103-109,
FIXTURES.md section 1a):

- ``0`` -> non-JSON garbage line          -> corrupt channel
- ``1`` -> JSON non-object (bare string)  -> corrupt channel (app/app.py:43-45)
- ``2`` -> non-numeric temperature        -> corrupt channel (typed read;
  the raw line is preserved in the dead letter, SURVEY.md section 4.3)
- ``3`` -> object missing ``temperature`` -> kept, NULL temperature
  (app/app.py:108 semantics)
- ``4`` -> blank line                     -> silently dropped (app/app.py:35-37)
- else  -> valid object                   -> kept

Fixture files are written to a fresh ``mkdtemp`` (fixture generation is
driver-side by design; the operators under test stay distributed).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_data_pipeline_spark.pipeline import PipelineConfig
from iot_data_pipeline_spark.queries.registry import declared
from iot_data_pipeline_spark.sources.readers import (
    read_jsonl,
    read_table,
    split_corrupt,
)
from iot_data_pipeline_spark.streaming.ingest import run_ingest_available_now

Q14_CLOCK = "2026-01-01 00:00:00"


def _dirty_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One text line per event, classed by ``event_id % 13`` (see module doc).

    Valid lines are built with ``to_json`` (null fields omitted, matching
    "missing key" semantics on re-read). Line construction is pure column
    expressions -- the write is the only materialization.
    """
    ev = read_table(spark, sf_dir, "events")
    cls = F.col("event_id") % 13
    device = F.concat(F.lit("device-"), (F.col("user_id") % 25).cast("string"))
    temp = F.col("value") / 10 - 5
    valid = F.to_json(
        F.struct(
            device.alias("device_id"),
            F.when(cls != 3, temp).alias("temperature"),
            F.col("value").alias("humidity"),
        )
    )
    bad_nonjson = F.concat(F.lit("this is a bad line "), F.col("event_id").cast("string"))
    bad_nonobject = F.lit('"just a string"')
    bad_nonnumeric = F.concat(
        F.lit('{"device_id": "'), device, F.lit('", "temperature": "abc"}')
    )
    line = (
        F.when(cls == 0, bad_nonjson)
        .when(cls == 1, bad_nonobject)
        .when(cls == 2, bad_nonnumeric)
        .when(cls == 4, F.lit(""))
        .otherwise(valid)
    )
    return ev.select(line.alias("value"))


@declared(
    "q13_corrupt_routing",
    oracle="""
    SELECT COUNT(*) FILTER (WHERE event_id % 13 NOT IN (0, 1, 2, 4)) AS good_rows,
           COUNT(*) FILTER (WHERE event_id % 13 IN (0, 1, 2)) AS bad_rows,
           COUNT(*) FILTER (WHERE event_id % 13 = 3) AS null_temp_rows,
           ROUND(SUM(CASE WHEN event_id % 13 NOT IN (0, 1, 2, 3, 4)
                          THEN value / 10 - 5 END), 2) AS sum_temperature
    FROM events
    """,
)
def q13_corrupt_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record routing through the real PERMISSIVE file surface
    (reference A5/A8/A13/A20): dirty JSONL derived from events is written
    out, read back typed, split into good/bad channels, and summarized.
    The oracle recomputes every count from the modular line classes."""
    fixture_dir = tempfile.mkdtemp(prefix="idp_q13_")
    _dirty_lines(spark, sf_dir).write.mode("overwrite").text(fixture_dir)
    good, bad = split_corrupt(read_jsonl(spark, fixture_dir))
    summary = good.agg(
        F.count(F.lit(1)).alias("good_rows"),
        F.count(F.when(F.col("temperature").isNull(), 1)).alias("null_temp_rows"),
        F.round(F.sum("temperature"), 2).alias("sum_temperature"),
    ).crossJoin(bad.agg(F.count(F.lit(1)).alias("bad_rows")))
    return summary.select("good_rows", "bad_rows", "null_temp_rows", "sum_temperature")


def _write_sensor_files(spark: SparkSession, sf_dir: str, raw_dir: str) -> None:
    """Materialize the Q14 fixture: every 20th event as a sensor record,
    routed to one of three ``.jsonl`` files by ``user_id % 3``. Driver-side
    on purpose -- this simulates the *external producer* (the reference's
    S3 uploader), not an engine operator."""
    ev = read_table(spark, sf_dir, "events")
    rows = (
        ev.filter(F.col("event_id") % 20 == 0)
        .select(
            (F.col("user_id") % 3).alias("file_no"),
            F.concat(F.lit("device-"), (F.col("user_id") % 25).cast("string")).alias(
                "device_id"
            ),
            F.when(F.col("event_id") % 17 != 0, F.col("value") / 10 - 5).alias(
                "temperature"
            ),
            F.col("value").alias("humidity"),
            F.col("event_id"),
        )
        .orderBy("event_id")
        .collect()
    )
    files = {}
    for r in rows:
        rec = {"device_id": r["device_id"], "humidity": r["humidity"]}
        if r["temperature"] is not None:
            rec["temperature"] = r["temperature"]
        files.setdefault(r["file_no"], []).append(json.dumps(rec))
    for k in range(3):
        with open(os.path.join(raw_dir, f"sensors-{k}.jsonl"), "w") as f:
            f.write("\n".join(files.get(k, [])) + "\n")


@declared(
    "q14_streaming_ingest",
    oracle="""
    SELECT 'sensors-' || CAST(user_id % 3 AS VARCHAR) || '.jsonl' AS source_file,
           COUNT(*) AS n_rows,
           ROUND(SUM(CASE WHEN event_id % 17 <> 0
                          THEN ROUND((value / 10 - 5) * 9 / 5 + 32, 2) END), 2)
               AS sum_temp_f
    FROM events WHERE event_id % 20 = 0
    GROUP BY 1 ORDER BY 1
    """,
)
def q14_streaming_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-ingest parity (reference A15/A16 -> B37): N sensor files
    processed by the checkpointed ``Trigger.AvailableNow`` stream must equal
    the batch oracle over the same derived records, including the per-file
    ``processed/<basename>`` routing rule (lambda/s3_event_handler.py:65)."""
    work = tempfile.mkdtemp(prefix="idp_q14_")
    raw = os.path.join(work, "raw")
    os.makedirs(raw)
    _write_sensor_files(spark, sf_dir, raw)
    out = os.path.join(work, "out")
    run_ingest_available_now(
        spark,
        raw,
        out,
        os.path.join(work, "ckpt"),
        config=PipelineConfig(fixed_clock=Q14_CLOCK),
    )
    return (
        spark.read.parquet(out)
        .groupBy("source_file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("temp_fahrenheit"), 2).alias("sum_temp_f"),
        )
        .orderBy("source_file")
    )
