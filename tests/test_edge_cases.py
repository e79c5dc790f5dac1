"""Empty/degenerate-input behavior of the reusable operator layer: a
100 TB pipeline hits empty partitions, empty match sets, and all-NULL
batches constantly -- operators must return empty/identity results, not
raise."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_connected_components_empty_edges(spark):
    from iot_data_pipeline_spark.operators.graph import connected_components

    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges).count() == 0


def test_expect_split_no_rules_and_empty_frame(spark):
    from iot_data_pipeline_spark.operators.quality import (
        Expectation,
        expect_split,
    )

    df = spark.createDataFrame([(1,), (2,)], "id long")
    clean, bad = expect_split(df, [])
    assert clean.count() == 2 and bad.count() == 0

    empty = spark.createDataFrame([], "id long")
    clean, bad = expect_split(
        empty, [Expectation("pos", F.col("id") > 0)]
    )
    assert clean.count() == 0 and bad.count() == 0


def test_rollup_empty_batch_write_and_read(spark, tmp_path):
    from iot_data_pipeline_spark.streaming.rollup import (
        read_rollup,
        write_batch_partials,
    )

    zone = str(tmp_path / "zone")
    full = spark.createDataFrame(
        [("a", 1.0), ("b", None)], "k string, v double"
    )
    write_batch_partials(full, 0, zone, ["k"], ["v"])
    empty = spark.createDataFrame([], "k string, v double")
    write_batch_partials(empty, 1, zone, ["k"], ["v"])  # must not fail
    got = {r["k"]: r for r in read_rollup(spark, zone, ["k"], ["v"]).collect()}
    assert got["a"]["v_count"] == 1 and got["a"]["v_sum"] == 1.0
    # all-NULL group: count 0, sum NULL -- mergeable identity survives
    assert got["b"]["v_count"] == 0 and got["b"]["v_sum"] is None


def test_exact_dedup_empty_and_all_null(spark):
    from iot_data_pipeline_spark.operators.dedup import exact_dedup

    empty = spark.createDataFrame([], "id long, a string")
    assert exact_dedup(empty, ["a"], "id").count() == 0
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "id long, a string"
    )
    kept = exact_dedup(nulls, ["a"], "id").collect()
    assert [r["id"] for r in kept] == [1]  # NULL == NULL for dedup


def test_pipeline_empty_input_writes_empty_output(spark, tmp_path):
    from iot_data_pipeline_spark.pipeline import (
        PipelineConfig,
        run_batch_pipeline,
    )

    raw = tmp_path / "empty.jsonl"
    raw.write_text("")
    out = str(tmp_path / "out")
    n_good, n_bad = run_batch_pipeline(
        spark,
        str(raw),
        out,
        PipelineConfig(fixed_clock="2026-01-01T00:00:00Z"),
    )
    # empty output is legal (reference app/app.py:69-70): zero records,
    # zero dead letters, no exception.
    assert (n_good, n_bad) == (0, 0)


def test_cosine_topk_empty_queries(spark, sf_dir):
    from iot_data_pipeline_spark.operators.similarity import cosine_topk
    from iot_data_pipeline_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    none = emb.filter(F.col("vec_id") < 0)
    assert cosine_topk(none, emb, k=5).count() == 0
