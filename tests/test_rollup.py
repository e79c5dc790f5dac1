"""Incremental rollup: stream-maintained totals == batch aggregation,
replayed batches are idempotent, and compaction preserves the fold."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from iot_data_pipeline_spark.sources.readers import SENSOR_SCHEMA
from iot_data_pipeline_spark.streaming.rollup import (
    compact_rollup,
    read_rollup,
    start_incremental_rollup,
    write_batch_partials,
)

RECS = [
    {"device_id": "a", "temperature": 1.0, "timestamp": "2026-01-01T10:00:00Z"},
    {"device_id": "a", "temperature": 3.0, "timestamp": "2026-01-01T12:00:00Z"},
    {"device_id": "b", "temperature": 9.0, "timestamp": "2026-01-01T10:00:00Z"},
    {"device_id": "a", "temperature": 2.0, "timestamp": "2026-01-01T11:00:00Z"},
    {"device_id": "b", "temperature": 8.0, "timestamp": "2026-01-01T13:00:00Z"},
    {"device_id": "c", "temperature": None, "timestamp": "2026-01-01T13:00:00Z"},
]


def _want(spark):
    batch = spark.createDataFrame(
        [(r["device_id"], r["temperature"]) for r in RECS],
        "device_id string, temperature double",
    )
    return {
        r["device_id"]: r
        for r in batch.groupBy("device_id")
        .agg(
            F.count("temperature").alias("n"),
            F.sum("temperature").alias("s"),
            F.min("temperature").alias("lo"),
            F.max("temperature").alias("hi"),
        )
        .collect()
    }


def _assert_matches(spark, zone):
    got = {
        r["device_id"]: r
        for r in read_rollup(
            spark, zone, ["device_id"], ["temperature"]
        ).collect()
    }
    want = _want(spark)
    assert set(got) == set(want)
    for k in want:
        assert got[k]["temperature_count"] == want[k]["n"]
        assert got[k]["temperature_sum"] == want[k]["s"]
        assert got[k]["temperature_min"] == want[k]["lo"]
        assert got[k]["temperature_max"] == want[k]["hi"]


def test_incremental_rollup_stream_equals_batch(spark, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    for fname, chunk in (("f1.jsonl", RECS[:3]), ("f2.jsonl", RECS[3:])):
        with open(raw / fname, "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")

    zone = str(tmp_path / "rollup")
    stream = (
        spark.readStream.schema(SENSOR_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(raw))
        .select("device_id", "temperature")
    )
    q = start_incremental_rollup(
        stream, zone, str(tmp_path / "ckpt"), ["device_id"], ["temperature"]
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
        raise TimeoutError("rollup stream did not drain")
    _assert_matches(spark, zone)

    # replay batch 0 (checkpoint-recovery scenario): dynamic partition
    # overwrite must leave totals unchanged, not double-count.
    replay = spark.read.schema(SENSOR_SCHEMA).json(str(raw / "f1.jsonl")).select(
        "device_id", "temperature"
    )
    write_batch_partials(replay, 0, zone, ["device_id"], ["temperature"])
    _assert_matches(spark, zone)

    # compaction folds history into one partition, totals still identical
    compact_rollup(spark, zone, ["device_id"], ["temperature"])
    _assert_matches(spark, zone)
    batches = {
        r["batch_id"]
        for r in spark.read.parquet(zone).select("batch_id").distinct().collect()
    }
    assert batches == {-1}


def test_compact_is_static_overwrite_under_dynamic_session_conf(spark, tmp_path):
    """Compaction must remove historical partitions even when the SESSION
    default partitionOverwriteMode is dynamic: under dynamic the
    overwrite would touch only batch_id=-1 and leave every historical
    partition behind to double-count on the next read (round-6 audit)."""
    from iot_data_pipeline_spark.streaming.rollup import (
        compact_rollup,
        read_rollup,
        write_batch_partials,
    )

    d = str(tmp_path / "zone")
    for bid in range(2):
        write_batch_partials(
            spark.range(bid * 10, bid * 10 + 10).selectExpr(
                "id % 2 AS k", "CAST(id AS DOUBLE) AS v"
            ),
            bid,
            d,
            keys=["k"],
            values=["v"],
        )
    before = {
        (r["k"], r["v_count"], r["v_sum"])
        for r in read_rollup(spark, d, ["k"], ["v"]).collect()
    }
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        compact_rollup(spark, d, keys=["k"], values=["v"])
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    after = {
        (r["k"], r["v_count"], r["v_sum"])
        for r in read_rollup(spark, d, ["k"], ["v"]).collect()
    }
    assert after == before  # fold(partials) unchanged -- no double count
    parts = {
        r["batch_id"]
        for r in spark.read.parquet(d).select("batch_id").distinct().collect()
    }
    assert parts == {-1}  # history actually removed
