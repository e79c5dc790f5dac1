"""Bucketed tables: pre-shuffled storage for co-located joins (SURVEY.md
section 4.2 "minimize shuffles" -- the storage-layout complement to
broadcast and salting).

A join between two tables bucketed by the join key into the same bucket
count needs NO Exchange at query time: every bucket pair is co-located by
construction, so the sort-merge join reads both sides straight off disk.
At 100 TB this converts the single most expensive repeated cost -- the
fact-fact shuffle -- into a one-time cost paid at write. The classic use:
bucket ``orders`` and ``lineitem`` by orderkey once, then every
order-lineitem join in every downstream query is shuffle-free.

Spark implements this via the catalog (``bucketBy`` + ``saveAsTable``;
plain ``parquet(path)`` writes cannot record bucket metadata), so these
helpers are catalog-table-shaped rather than path-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet catalog table bucketed by ``bucket_cols``.

    ``sort_cols`` (defaulting to the bucket columns) sorts within each
    bucket file so a downstream sort-merge join can also skip its Sort.
    ``n_buckets`` is a contract: both sides of a co-located join must use
    the same count. Size it so one bucket of the *larger* table fits an
    executor's memory at target scale (e.g. 100 TB / 4096 buckets ≈ 25 GB
    per bucket before column pruning).
    """
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With both sides bucketed into the same ``n_buckets`` on ``on``,
    Catalyst plans a sort-merge join with zero Exchange nodes (assert via
    ``plans.inspect.exchange_count``). Broadcast is suppressed by the
    caller when measuring; in production leave Catalyst free to broadcast
    if one side is small enough -- bucketing only needs to win when both
    sides are big.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
