"""The Engine facade: the one-object surface a reference user switches to."""

from __future__ import annotations

import json

import pytest

from iot_data_pipeline_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return Engine(spark, sf_dir)


def test_table_and_sql_agree(eng):
    n_api = eng.table("orders").count()
    n_sql = eng.sql("SELECT COUNT(*) AS n FROM orders").collect()[0]["n"]
    assert n_api == n_sql > 0


def test_run_declared_query(eng):
    rows = eng.run("q05_revenue_per_nation").collect()
    assert len(rows) == 25
    assert rows[0]["revenue"] >= rows[-1]["revenue"]


def test_unknown_names_raise(eng):
    with pytest.raises(KeyError):
        eng.table("nope")
    with pytest.raises(KeyError):
        eng.run("q999")


def test_query_names_match_entry_contract(eng):
    import __spark_entry__ as entry

    assert set(eng.query_names()) == set(entry.queries())


def test_process_jsonl_roundtrip(eng, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "a.jsonl").write_text(
        "\n".join(
            [
                json.dumps({"device_id": "d1", "temperature": 20.0}),
                "this is a bad line",
                json.dumps({"device_id": "d2"}),
            ]
        )
    )
    out = tmp_path / "out"
    dlq = tmp_path / "dlq"
    eng.process_jsonl(
        str(raw),
        str(out),
        fixed_clock="2026-01-01 00:00:00",
        dead_letter_path=str(dlq),
    )
    good = eng.spark.read.json(str(out))
    assert good.count() == 2
    assert eng.spark.read.parquet(str(dlq)).count() == 1


def test_engine_validate_and_connectors(spark, sf_dir):
    from pyspark.sql import functions as F

    from iot_data_pipeline_spark.engine import Engine
    from iot_data_pipeline_spark.operators.quality import Expectation

    eng = Engine(spark, sf_dir)
    clean, bad = eng.validate(
        eng.table("events"),
        [Expectation("value_nonneg", F.col("value") >= 0)],
    )
    assert clean.count() + bad.count() == eng.table("events").count()

    eng.register_connectors()
    n = (
        spark.read.format("sensor_synthetic")
        .option("rows", 50)
        .load()
        .count()
    )
    assert n == 50


def test_facade_materialized_view_roundtrip(spark, sf_dir, tmp_path):
    from iot_data_pipeline_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    agg = eng.table("orders").groupBy("o_orderstatus").count()
    v = eng.refresh_view(str(tmp_path), "status_counts", agg)
    assert v == 0
    got = eng.read_view(str(tmp_path), "status_counts")
    assert got.count() == agg.count()


def test_facade_snapshot_lifecycle(spark, sf_dir, tmp_path):
    """Round 14: the facade exposes the atomic-zone lifecycle ops a
    reference user operating a refreshed zone needs -- retention
    (expire_snapshots) and crash remediation (release_claim)."""
    from iot_data_pipeline_spark.engine import Engine
    from iot_data_pipeline_spark.sources.matview import (
        _claim_slot,
        snapshot_versions,
    )
    from iot_data_pipeline_spark.sources.sinks import write_parquet

    eng = Engine(spark, sf_dir)
    zone = str(tmp_path / "zone.parquet")
    for i in range(3):
        write_parquet(
            spark.createDataFrame([(i,)], "id long"), zone, atomic=True
        )
    assert eng.expire_snapshots(zone, keep_last=1, keep_age_s=0) == [0, 1]
    assert snapshot_versions(spark, zone) == [2]
    _claim_slot(spark, zone, 3)  # a "crashed publisher's" residue
    assert eng.release_claim(zone) == [3]


def test_env_extra_conf_parsing():
    """SPARK_GRAFT_EXTRA_CONF drives the determinism sweeps (AQE off,
    shuffle.partitions=1, local[5]); the parser must take well-formed
    items and drop garbage instead of killing the harness."""
    from iot_data_pipeline_spark.session import _env_extra_conf

    assert _env_extra_conf("") == {}
    assert _env_extra_conf("a=b") == {"a": "b"}
    assert _env_extra_conf(
        " spark.sql.adaptive.enabled = false ; spark.sql.shuffle.partitions=1 "
    ) == {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "1",
    }
    # items without '=' or without a key are ignored, not raised
    assert _env_extra_conf("noequals;=v;;k=v2") == {"k": "v2"}
    # value may itself contain '=' (only the first splits)
    assert _env_extra_conf("k=a=b") == {"k": "a=b"}
