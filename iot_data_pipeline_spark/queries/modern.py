"""q84-q85: Spark 4 surface -- VARIANT semi-structured access and a
Python UDTF (token-window chunking for LLM context preparation).

The reference stores semi-structured payloads only as raw JSON strings
probed per-record (reference app/app.py:40,51); VARIANT is the
engine-native generalization: parse once into a binary-encoded tree,
then path-extract without re-parsing per access. The chunker is a
north-star training-data op: split each document into fixed token
windows, the unit LLM pipelines feed to tokenizers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_data_pipeline_spark.queries.registry import declared
from iot_data_pipeline_spark.sources.readers import read_table

CHUNK_TOKENS = 32


@declared(
    "q84_variant_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 2)
             AS avg_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS sum_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q84_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion of events.props: ``parse_json`` once, then typed
    path access with ``variant_get`` (Spark 4; q19 is the legacy
    string-probing twin via get_json_object).

    At scale VARIANT wins over per-access get_json_object because the
    parse cost is paid once per row, not once per extracted path, and
    the binary encoding is shredded columnar in Parquet writes.
    """
    ev = read_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(k), 2).alias("avg_k"),
            F.sum(k).alias("sum_k"),
        )
        .orderBy("event_type")
    )


@declared(
    "q85_udtf_chunks",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    e AS (SELECT doc_id, toks,
                 unnest(range(CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS BIGINT)))
                   AS chunk_idx
          FROM t)
    SELECT doc_id,
           CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(len(toks[chunk_idx * {CHUNK_TOKENS} + 1
                         : (chunk_idx + 1) * {CHUNK_TOKENS}]) AS INTEGER)
             AS n_tokens,
           array_to_string(toks[chunk_idx * {CHUNK_TOKENS} + 1
                                : (chunk_idx + 1) * {CHUNK_TOKENS}], ' ')
             AS chunk
    FROM e
    ORDER BY doc_id, chunk_idx
    """,
)
def q85_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking of documents via a Python UDTF called as a
    correlated LATERAL table function in SQL (Spark 4 UDTF surface).

    One input row fans out to ceil(n_tokens/32) chunk rows -- the
    canonical context-window preparation step of an LLM training
    pipeline. The UDTF is the declared *surface*; its row-at-a-time
    Python cost is acceptable because fan-out work is O(output), and a
    mapInPandas rewrite is mechanical if the chunker ever dominates a
    profile (the hot loop is a list slice either way).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int, chunk string")
    class ChunkText:
        def eval(self, text: str):
            if text is None:
                return
            toks = text.split(" ")
            for i in range(0, len(toks), CHUNK_TOKENS):
                window = toks[i : i + CHUNK_TOKENS]
                yield i // CHUNK_TOKENS, len(window), " ".join(window)

    spark.udtf.register("chunk_text", ChunkText)
    read_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk
        FROM documents_v d, LATERAL chunk_text(d.text) c
        ORDER BY d.doc_id, c.chunk_idx
        """
    )
