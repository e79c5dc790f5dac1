"""Incremental rollup maintenance: a streaming materialized aggregate.

The pattern a 100 TB pipeline uses for always-fresh dashboards: instead of
re-aggregating history per query, each micro-batch appends its PARTIAL
aggregates (mergeable: count/sum/min/max) and the read side folds
partials into current totals. Properties that make this the scale shape:

- **No read-modify-write.** A batch writes only its own partials -- never
  rewrites the running table -- so writes stay O(batch), contention-free,
  regardless of history size.
- **Exactly-once without a transactional table format.** Partials land in
  a ``batch_id=N`` partition via DYNAMIC partition overwrite: a replayed
  micro-batch (checkpoint recovery re-runs the last batch) overwrites its
  own partition instead of appending duplicates -- idempotent by layout.
- **Bounded read cost.** ``read_rollup`` folds one row per (key, batch);
  ``compact_rollup`` periodically folds history into a single partition so
  the partial count stays proportional to batches-since-compaction, not
  stream lifetime.

The same decomposition Spark itself uses inside partial+final hash
aggregation, lifted to the storage layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

#: merge-able aggregate spec: output column -> (input column, fn)
ROLLUP_FNS = ("count", "sum", "min", "max")


def _partials(df: DataFrame, keys: list[str], values: list[str]) -> DataFrame:
    aggs = []
    for v in values:
        aggs += [
            F.count(v).alias(f"{v}_count"),
            F.sum(v).alias(f"{v}_sum"),
            F.min(v).alias(f"{v}_min"),
            F.max(v).alias(f"{v}_max"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def write_batch_partials(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    keys: list[str],
    values: list[str],
) -> None:
    """One micro-batch -> its own ``batch_id`` partition of partials.
    Dynamic partition overwrite makes replays idempotent."""
    (
        _partials(batch_df, keys, values)
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def start_incremental_rollup(
    stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    keys: list[str],
    values: list[str],
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain the rollup zone from a stream via foreachBatch."""
    # Seed the zone's schema before the first batch: a stream that drains
    # zero rows writes no partial partitions (partitioned writes of 0 rows
    # emit no files), leaving read_rollup unable to infer a schema. The
    # seed partition (batch_id=-2, 0 rows) carries the partial-agg schema
    # and folds away to nothing in every read.
    from iot_data_pipeline_spark.sources.matview import ensure_plain_zone
    from iot_data_pipeline_spark.sources.sinks import seed_zone_schema

    spark = stream.sparkSession
    ensure_plain_zone(spark, path, "start_incremental_rollup")
    empty = spark.createDataFrame([], stream.schema)
    seed_zone_schema(
        _partials(empty, keys, values).withColumn("batch_id", F.lit(-2)),
        path,
        "batch_id",
        seed_value=-2,
    )
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, bid: write_batch_partials(df, bid, path, keys, values)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(
    spark: SparkSession, path: str, keys: list[str], values: list[str]
) -> DataFrame:
    """Fold partials -> current totals (count/sum/min/max + derived avg)."""
    df = spark.read.parquet(path)
    aggs = []
    for v in values:
        cnt = F.sum(f"{v}_count")
        total = F.sum(f"{v}_sum")
        aggs += [
            cnt.alias(f"{v}_count"),
            total.alias(f"{v}_sum"),
            F.min(f"{v}_min").alias(f"{v}_min"),
            F.max(f"{v}_max").alias(f"{v}_max"),
            (total / cnt).alias(f"{v}_avg"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def compact_rollup(
    spark: SparkSession, path: str, keys: list[str], values: list[str]
) -> None:
    """Fold all partial partitions into one, preserving mergeability:
    count/sum re-sum, min/max re-min/max. Run periodically so read cost
    stays bounded; the folded row set lands as ``batch_id=-1`` and every
    historical partition is removed by the STATIC overwrite (set
    explicitly below: under a session-level dynamic partitionOverwriteMode
    the write would touch only ``batch_id=-1`` and leave history behind
    to double-count). Run only with the stream quiesced: a checkpoint
    replay racing the compaction could re-append a batch whose rows the
    fold already absorbed (q167's flow stops the stream first)."""
    from iot_data_pipeline_spark.sources.matview import ensure_plain_zone

    ensure_plain_zone(spark, path, "compact_rollup")
    df = spark.read.parquet(path)
    aggs = []
    for v in values:
        aggs += [
            F.sum(f"{v}_count").alias(f"{v}_count"),
            F.sum(f"{v}_sum").alias(f"{v}_sum"),
            F.min(f"{v}_min").alias(f"{v}_min"),
            F.max(f"{v}_max").alias(f"{v}_max"),
        ]
    folded = (
        df.groupBy(*keys).agg(*aggs).withColumn("batch_id", F.lit(-1))
    ).localCheckpoint(eager=True)
    if not folded.take(1):
        # nothing to compact (zone holds only the schema seed): the static
        # overwrite below would write no files -- partitioned writes of 0
        # rows emit nothing -- while still deleting the seed, leaving the
        # zone unreadable
        return
    (
        folded.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("batch_id")
        .parquet(path)
    )
