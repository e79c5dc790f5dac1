"""Event-driven per-file micro-batch ingest (reference A15/A16 -> B37).

The reference wires S3 ``ObjectCreated`` notifications with a ``.jsonl``
suffix filter to a Lambda that launches one Fargate task per file
(reference lambda/s3_event_handler.py:21-70, terraform/main.tf:463-468).
Spark's file-source Structured Streaming subsumes that whole control plane:
the checkpointed file listing is the notification + dedup, micro-batches are
the per-arrival tasks, and ``Trigger.AvailableNow`` gives "process what has
arrived, then stop" (one driver invocation per burst -- the same operational
contract, minus two process boundaries).

Scale notes:
- ``maxFilesPerTrigger`` bounds micro-batch size so a 10k-file backlog does
  not become one giant batch (at 100 TB the raw zone arrives in bursts).
- ``pathGlobFilter='*.jsonl'`` reproduces the suffix filter at the source.
- The CHECKPOINT and the SINK are one consistency unit (round-12 probe,
  measured): with the native file sink, losing the checkpoint but
  reusing the sink dir is SILENT LOSS -- the fresh query restarts at
  batch 0, finds batch 0 already committed in the sink's
  ``_spark_metadata`` log, and skips its own output (pinned:
  tests/test_streaming_windows.py::
  test_checkpoint_loss_with_reused_file_sink_loses_batches). With this
  module's ``foreachBatch`` + plain append the same mistake DUPLICATES
  instead. Either way: on checkpoint loss, start a fresh sink dir (or
  reprocess into a new zone and atomically swap, sources/matview.py).
- output is partitioned by source file basename, reproducing the
  ``processed/<basename>`` routing rule (lambda/s3_event_handler.py:65)
  while keeping one parquet dir per input file for downstream pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from iot_data_pipeline_spark.pipeline import PipelineConfig, transform_sensor
from iot_data_pipeline_spark.sources.readers import (
    CORRUPT_COL,
    SENSOR_SCHEMA,
    split_corrupt,
)


def read_sensor_stream(
    spark: SparkSession,
    raw_dir: str,
    schema: T.StructType = SENSOR_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming JSONL scan over a raw directory with corrupt capture."""
    full = T.StructType(
        schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    reader = (
        spark.readStream.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("pathGlobFilter", "*.jsonl")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    # input_file_name() returns the file's URI, whose path segments are
    # percent-encoded (a raw file "data file.jsonl" surfaces as
    # "data%20file.jsonl"), so the basename is decoded back to the real
    # file name before it becomes the routing key (round-11 probe).
    # try_url_decode: a non-URI name can never reach here (Hadoop always
    # encodes, a literal '%' arrives as %25), but a malformed escape
    # must degrade to the raw segment, not fail the stream. url_decode
    # is FORM decoding (java.net.URLDecoder): it also turns '+' into a
    # space, but URI paths keep a literal '+' raw -- so '+' is
    # re-escaped to %2B first, making the composition percent-decoding
    # only (probe: "a+b ü.jsonl" must round-trip, not become "a b").
    # Reference divergence, beneficial: the reference passes the S3
    # event key UNDECODED into get_object
    # (lambda/s3_event_handler.py:38,63), so any key with a space or
    # non-ASCII character 404s (NoSuchKey) and the file is never
    # processed at all.
    segment = F.element_at(F.split(F.input_file_name(), "/"), -1)
    plus_safe = F.regexp_replace(segment, r"\+", "%2B")
    return reader.json(raw_dir).withColumn(
        "_source_file", F.coalesce(F.try_url_decode(plus_safe), segment)
    )


def start_sensor_ingest(
    spark: SparkSession,
    raw_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    config: PipelineConfig = PipelineConfig(),
    dim_location: DataFrame | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the streaming sensor pipeline; returns the StreamingQuery.

    Each micro-batch applies the exact batch transform (same code path as
    ``run_batch_pipeline`` -- streaming/batch parity by construction) and
    writes parquet partitioned by source file; corrupt rows go to
    ``<out_dir>/_dead_letter`` keyed the same way. When ``dim_location``
    is given, every micro-batch broadcast-joins the static dim (stream-
    static enrichment, reference README.md:13): the dim never shuffles
    the stream, and each batch sees the dim as of its own execution.
    """
    stream = read_sensor_stream(
        spark, raw_dir, max_files_per_trigger=max_files_per_trigger
    )

    # Seed the processed zone's schema before the first micro-batch: a
    # drained-empty stream (no raw files, or all-corrupt input) would
    # otherwise leave an unreadable zone -- partitioned writes of 0 rows
    # emit no files -- and every downstream read_parquet(out_dir) dies on
    # schema inference. The seed is the exact transform output schema
    # computed on a 0-row frame (no data touched).
    from iot_data_pipeline_spark.sources.sinks import seed_zone_schema

    empty_good = spark.createDataFrame(
        [],
        T.StructType(
            SENSOR_SCHEMA.fields
            + [T.StructField("source_file", T.StringType())]
        ),
    )
    seed_zone_schema(
        transform_sensor(empty_good, config, dim_location),
        out_dir,
        "source_file",
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Like sources.readers.split_corrupt, but keeping the per-file
        # routing column on both channels.
        source = F.col("_source_file")
        parent = batch_df.cache()
        data_cols = [c for c in parent.columns if c not in (CORRUPT_COL, "_source_file")]
        all_null = F.lit(True)
        for c in data_cols:
            all_null = all_null & F.col(c).isNull()
        good = parent.filter(F.col(CORRUPT_COL).isNull() & ~all_null).select(
            *data_cols, source.alias("source_file")
        )
        bad = parent.filter(F.col(CORRUPT_COL).isNotNull()).select(
            F.col(CORRUPT_COL).alias("raw_line"), source.alias("source_file")
        )
        processed = transform_sensor(good, config, dim_location)
        (
            processed.write.mode("append")
            .partitionBy("source_file")
            .parquet(out_dir)
        )
        if bad.limit(1).count() > 0:
            (
                bad.withColumn("_ingest_ts", F.current_timestamp())
                .write.mode("append")
                .partitionBy("source_file")
                .parquet(f"{out_dir}/_dead_letter")
            )
        parent.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_ingest_available_now(
    spark: SparkSession,
    raw_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    config: PipelineConfig = PipelineConfig(),
    timeout_s: int = 300,
    dim_location: DataFrame | None = None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Process-everything-then-stop convenience (the per-burst batch mode)."""
    q = start_sensor_ingest(
        spark,
        raw_dir,
        out_dir,
        checkpoint_dir,
        config,
        dim_location=dim_location,
        available_now=True,
        max_files_per_trigger=max_files_per_trigger,
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"ingest did not drain within {timeout_s}s")


# ---------------------------------------------------------------- control plane


class MalformedEventError(ValueError):
    """Raised for control-plane trigger payloads that fail validation --
    the engine twin of the reference Lambda's HTTP 400 response
    (lambda/s3_event_handler.py:28-33): reject bad input explicitly,
    never crash the worker and never silently process garbage."""


def validate_file_event(event: object) -> list[tuple[str, str]]:
    """Validate an S3-notification-shaped trigger payload and extract the
    ``(bucket, key)`` pairs it announces.

    Mirrors the reference handler's parse-then-400 contract
    (lambda/s3_event_handler.py:21-43): the payload must be a dict with a
    ``Records`` list, each record carrying ``s3.bucket.name`` and
    ``s3.object.key``. Raises :class:`MalformedEventError` with a precise
    reason otherwise. Spark's file source makes this path unnecessary for
    normal operation (the checkpointed listing IS the notification), but
    deployments fed by an external event bus still need the reject-bad-
    input surface, so it is exposed and tested explicitly.
    """
    if not isinstance(event, dict):
        raise MalformedEventError(f"event must be an object, got {type(event).__name__}")
    records = event.get("Records")
    if not isinstance(records, list) or not records:
        raise MalformedEventError("event.Records must be a non-empty list")
    out: list[tuple[str, str]] = []
    for i, rec in enumerate(records):
        if not isinstance(rec, dict):
            raise MalformedEventError(f"Records[{i}] must be an object")
        s3 = rec.get("s3")
        bucket = s3.get("bucket", {}).get("name") if isinstance(s3, dict) else None
        key = s3.get("object", {}).get("key") if isinstance(s3, dict) else None
        if not isinstance(bucket, str) or not bucket:
            raise MalformedEventError(f"Records[{i}].s3.bucket.name missing")
        if not isinstance(key, str) or not key:
            raise MalformedEventError(f"Records[{i}].s3.object.key missing")
        out.append((bucket, key))
    return out
