"""Python DataSource connector (Spark 4 API): partition-count invariance,
determinism, and micro-batch streaming with exact offset replay."""

from __future__ import annotations

from iot_data_pipeline_spark.sources.custom import register_sensor_source


def _load(spark, **opts):
    r = spark.read.format("sensor_synthetic")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_partition_invariance(spark):
    register_sensor_source(spark)
    a = _load(spark, rows=500, partitions=1).orderBy("ts").collect()
    b = _load(spark, rows=500, partitions=7).orderBy("ts").collect()
    assert len(a) == len(b) == 500
    assert a == b  # value function is per-row-index, not per-partition


def test_batch_parallelism_and_values(spark):
    register_sensor_source(spark)
    df = _load(spark, rows=100, partitions=4, devices=5)
    assert df.rdd.getNumPartitions() == 4
    rows = {r["device_id"] for r in df.collect()}
    assert rows == {f"device-{i}" for i in range(5)}
    first = df.orderBy("ts").first()
    assert first["device_id"] == "device-0"
    assert -10.0 <= first["temperature"] <= 40.0


def test_stream_reader_replays_deterministically(spark, tmp_path):
    register_sensor_source(spark)
    stream = (
        spark.readStream.format("sensor_synthetic")
        .option("rowsPerBatch", 50)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sensor_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM sensor_stream").first()["c"] >= 100:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.sql(
        "SELECT * FROM sensor_stream ORDER BY ts LIMIT 100"
    ).collect()
    assert len(got) == 100
    # stream rows must equal the batch source's first 100 rows: the offset
    # ranges replay the same pure value function.
    want = _load(spark, rows=100, partitions=2).orderBy("ts").collect()
    assert got == want


def test_push_filters_narrow_generated_range(spark):
    from datetime import datetime, timezone

    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from iot_data_pipeline_spark.sources.custom import _SensorBatchReader

    r = _SensorBatchReader({"rows": "1000", "partitions": "4"})
    remaining = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(
                    ("ts",), datetime(2026, 1, 1, 0, 10, tzinfo=timezone.utc)
                ),  # row 60
                LessThan(
                    ("ts",), datetime(2026, 1, 1, 0, 20, tzinfo=timezone.utc)
                ),  # row 120
            ]
        )
    )
    assert len(remaining) == 2  # all re-evaluated by Spark post-scan
    assert r.lo == 60 and r.hi <= 122
    spans = [(p.start, p.end) for p in r.partitions()]
    assert spans[0][0] == 60 and spans[-1][1] <= 122


def test_pushdown_query_results_exact(spark):
    register_sensor_source(spark)
    import pyspark.sql.functions as F

    df = _load(spark, rows=2000, partitions=4)
    t1, t2 = "2026-01-01 00:10:00", "2026-01-01 00:20:00"
    pushed = df.filter(
        (F.col("ts") >= t1) & (F.col("ts") < t2)
    ).orderBy("ts")
    # oracle: full scan filtered purely by Spark (collect first, slice)
    want = [
        r
        for r in _load(spark, rows=2000, partitions=1).orderBy("ts").collect()
        if t1 <= str(r["ts"]) < t2
    ]
    assert pushed.collect() == want
    assert len(want) == 60
