"""Q32-Q33: map-typed columns (B36) and the pandas-UDF surface (B50) as
oracle-checked queries.

Q32 exercises the MAP type end to end on the Spark side (map_from_entries,
map_keys, element_at, map_values folding); the DuckDB oracle states the
same facts with conditional aggregation -- maps are engine-internal, the
*values* are the contract.

Q33 puts an Arrow-batched pandas UDF in a declared query: exact integer
token counts, so vectorized Python and SQL agree bit-for-bit. This is the
one sanctioned UDF-in-oracle pattern -- integer results only; float UDF
paths stay bench-only (summation-order drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_data_pipeline_spark.functions.udfs import token_count_arrow
from iot_data_pipeline_spark.queries.registry import declared
from iot_data_pipeline_spark.sources.readers import read_table


@declared(
    "q32_map_funcs",
    oracle="""
    WITH per AS (
      SELECT user_id, event_type, COUNT(*) AS n,
             ROUND(SUM(value), 2) AS sum_v
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           COUNT(*) AS n_types,
           MAX(CASE WHEN event_type = 'click' THEN n END) AS n_clicks,
           MAX(CASE WHEN event_type = 'error' THEN n END) AS n_errors,
           SUM(n) AS n_total,
           ROUND(SUM(sum_v), 2) AS sum_values
    FROM per GROUP BY user_id ORDER BY user_id
    """,
)
def q32_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns (B36): per-user map event_type -> (count, sum),
    then map_keys/element_at/map_values folds. The map is built with
    map_from_entries over a sorted collect_list (deterministic key order);
    the fold over map_values is a higher-order aggregate. All map
    operations happen after the groupBy, on one row per user -- map
    construction never inflates the shuffle."""
    ev = read_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_v")
    )
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(F.struct("event_type", F.struct("n", "sum_v")))
            )
        ).alias("m")
    )
    values = F.map_values(F.col("m"))
    return m.select(
        "user_id",
        F.size(F.map_keys(F.col("m"))).cast("long").alias("n_types"),
        F.element_at(F.col("m"), "click")["n"].alias("n_clicks"),
        F.element_at(F.col("m"), "error")["n"].alias("n_errors"),
        F.aggregate(
            values, F.lit(0).cast("long"), lambda acc, v: acc + v["n"]
        ).alias("n_total"),
        F.round(
            F.aggregate(
                values, F.lit(0.0), lambda acc, v: acc + v["sum_v"]
            ),
            2,
        ).alias("sum_values"),
    ).orderBy("user_id")


@declared(
    "q33_pandas_token_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           SUM(n_tokens) AS total_tokens,
           MIN(n_tokens) AS min_tokens,
           MAX(n_tokens) AS max_tokens
    FROM t GROUP BY lang ORDER BY lang
    """,
)
def q33_pandas_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF surface in the oracle gate (B50): token counting runs in
    an Arrow-batched vectorized UDF, then aggregates per lang. Integer
    domain -> no float drift; proves the Python-worker path (Arrow
    round-trip, batch iteration) preserves exactness."""
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select("lang", token_count_arrow("text").alias("n_tokens"))
    return (
        t.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("lang")
    )
