"""Reader/sink unit behavior: nanos-timestamp normalization, corrupt-record
split, CSV with declared schema, JSONL round trip."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_events_ts_is_timestamp(spark, sf_dir):
    from iot_data_pipeline_spark.sources.readers import read_table

    events = read_table(spark, sf_dir, "events")
    assert dict(events.dtypes)["ts"] == "timestamp"
    # nanos conversion must preserve ordering and land in the 2024 range
    row = events.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    assert row.lo.year >= 2020 and row.hi.year <= 2030


def test_split_corrupt_blank_lines(spark, tmp_path):
    from iot_data_pipeline_spark.sources.readers import read_jsonl, split_corrupt

    p = tmp_path / "x.jsonl"
    p.write_text('{"device_id": "a", "temperature": 1.0}\n\n[1,2]\n')
    good, bad = split_corrupt(read_jsonl(spark, str(p)))
    assert good.count() == 1
    assert [r.raw_line for r in bad.collect()] == ["[1,2]"]


def test_csv_reader_declared_schema(spark, tmp_path):
    from iot_data_pipeline_spark.sources.readers import read_csv

    p = tmp_path / "x.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    schema = T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
    )
    rows = read_csv(spark, str(p), schema).orderBy("a").collect()
    assert [(r.a, r.b) for r in rows] == [(1, "x"), (2, "y")]


def test_parquet_sink_partitioned(spark, tmp_path):
    from iot_data_pipeline_spark.sources.sinks import write_parquet

    df = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "part"])
    out = tmp_path / "pq"
    write_parquet(df, str(out), partition_by=["part"])
    back = spark.read.parquet(str(out))
    assert {(r.id, r.part) for r in back.collect()} == {(1, "x"), (2, "y")}
    assert (out / "part=x").exists()
