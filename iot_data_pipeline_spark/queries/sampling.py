"""Deterministic sampling / dataset-splitting operators for training-data
pipelines (north-star mandate, alongside SURVEY.md section 2.2 tier B).

A training corpus at 100 TB needs reproducible splits and samples: the
same record must land in the same split on every run, on any cluster
layout, with no shared state. Both operators therefore key off the
portable content hash (functions/hashing.py) instead of ``rand()`` --
hash-based sampling is a narrow deterministic filter that pushes down,
repartitions nothing, and is auditable in any engine (the DuckDB oracle
recomputes the identical assignment).

The reference has no sampling surface (its loop processes every record,
reference app/app.py:33-65); these generalize its "process a subset"
event filtering (reference lambda/s3_event_handler.py:35-36) to
content-addressed subsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iot_data_pipeline_spark.functions.hashing import ORACLE_HASH, portable_hash
from iot_data_pipeline_spark.queries.registry import declared
from iot_data_pipeline_spark.sources.readers import read_table

#: split assignment: H(doc_id) % 100 -> 0..79 train, 80..89 valid, 90..99 test
_SPLIT_HASH = ORACLE_HASH.format("CAST(doc_id AS VARCHAR)")


@declared(
    "q48_hash_split",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, n_chars, lang,
             CASE WHEN {_SPLIT_HASH} % 100 < 80 THEN 'train'
                  WHEN {_SPLIT_HASH} % 100 < 90 THEN 'valid'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 2) AS avg_chars,
           COUNT(DISTINCT lang) AS n_langs
    FROM assigned GROUP BY split ORDER BY split
    """,
)
def q48_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split by content hash.

    Scale plan: the assignment is a pure row-local projection -- no
    shuffle, no state, no seed to coordinate across 1000 executors. A
    record's split never changes when the corpus is re-partitioned or
    grows, which is the property ``rand(seed)`` sampling cannot give
    (rand is per-task-attempt, not per-record).
    """
    docs = read_table(spark, sf_dir, "documents")
    bucket = portable_hash(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


_SAMPLE_HASH = ORACLE_HASH.format("'smp:' || CAST(doc_id AS VARCHAR)")


@declared(
    "q49_stratified_sample",
    oracle=f"""
    WITH sampled AS (
      SELECT lang, source, n_chars
      FROM documents
      WHERE {_SAMPLE_HASH} % 1000 <
            CASE WHEN lang = 'en' THEN 100 ELSE 300 END
    )
    SELECT lang, COUNT(*) AS n_sampled,
           ROUND(AVG(n_chars), 2) AS avg_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM sampled GROUP BY lang ORDER BY lang
    """,
)
def q49_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: 10% of 'en' docs, 30% of every
    other language -- the down-weight-the-majority-stratum move every
    corpus-balancing pipeline needs.

    Scale plan: like q48 this is a row-local predicate (no sampleBy(), no
    seed coordination); the per-stratum rate is a CASE over the stratum
    column, so adding strata costs nothing. The hash is salted ('smp:')
    so this sample is independent of the q48 split assignment.
    """
    docs = read_table(spark, sf_dir, "documents")
    h = portable_hash(F.concat(F.lit("smp:"), F.col("doc_id").cast("string")))
    rate = F.when(F.col("lang") == "en", 100).otherwise(300)
    return (
        docs.filter(h % 1000 < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )


@declared(
    "q50_vocab_coverage",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    counts AS (
      SELECT token, COUNT(*) AS cnt FROM toks
      WHERE token <> '' GROUP BY token
    ),
    ranked AS (
      SELECT token, cnt,
             SUM(cnt) OVER (ORDER BY cnt DESC, token
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER () AS total,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rk
      FROM counts
    )
    SELECT rk, token, cnt, ROUND(CAST(cum AS DOUBLE) / total, 4) AS cum_share
    FROM ranked
    WHERE CAST(cum - cnt AS DOUBLE) / total < 0.9
    ORDER BY rk
    """,
)
def q50_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the smallest frequency-ranked token
    prefix covering 90% of the corpus token mass (tokenizer-budget
    sizing for training pipelines).

    Scale plan: the token count is a map-side-combined groupBy over
    hashed strings; rank + cumulative mass over the ordered vocabulary
    both come from ONE distributed two-phase scan
    (operators/prefix.global_scan) -- a single range shuffle, no
    single-partition window even when the vocabulary itself is huge
    (web-scale corpora: 1e9+ distinct tokens). The total is a scalar
    aggregate broadcast via cross join. The prefix predicate uses
    (cum - cnt)/total < 0.9 so the first token crossing the threshold is
    included, mirroring "smallest covering prefix" exactly in both
    engines.
    """
    from iot_data_pipeline_spark.operators.prefix import global_scan

    docs = read_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # the grand total rides out of the scan's own P-row offsets frame as
    # a broadcast constant -- re-aggregating `counts` here would
    # re-explode the whole corpus a second time (measured 2x the query
    # cost at sf0.01).
    ranked = global_scan(
        counts,
        ["cnt", "token"],
        ascending=[False, True],
        sum_cols={"cum": "cnt"},
        ranks=True,
        total_cols={"total": "cum"},
    )
    return (
        ranked.filter(
            (F.col("cum") - F.col("cnt")).cast("double") / F.col("total") < 0.9
        )
        .select(
            F.col("row_number").alias("rk"),
            "token",
            "cnt",
            F.round(F.col("cum").cast("double") / F.col("total"), 4).alias(
                "cum_share"
            ),
        )
        .orderBy("rk")
    )


_WEIGHT_HASH = ORACLE_HASH.format("'wsmp:' || CAST(o_orderkey AS VARCHAR)")


@declared(
    "q94_weighted_sample",
    oracle=f"""
    WITH mx AS (SELECT MAX(o_totalprice) AS max_p FROM orders),
    sampled AS (
      SELECT o.* FROM orders o CROSS JOIN mx
      WHERE CAST({_WEIGHT_HASH} AS DOUBLE) / 1000000007
              < o.o_totalprice / mx.max_p
    )
    SELECT o_orderpriority, COUNT(*) AS n_sampled,
           ROUND(SUM(o_totalprice), 2) AS sampled_value,
           MIN(o_orderkey) AS min_key
    FROM sampled GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q94_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Bernoulli sampling: each order kept with probability
    proportional to its value (price/max-price), decided by the portable
    content hash -- so the sample is reproducible on any cluster layout
    AND importance-weighted, the combination value-weighted corpus
    sampling needs (high-value records over-represented, deterministic
    audit trail).

    Determinism across engines: the hash is integer arithmetic, max() is
    exact selection, and both divisions are single IEEE ops on identical
    operands -- the comparison operands are bit-identical in Spark and
    DuckDB, so the kept set matches exactly. Row-local decision, no
    shuffle; the max is a one-row broadcast.
    """
    orders = read_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_totalprice").alias("max_p"))
    u = (
        portable_hash(
            F.concat(F.lit("wsmp:"), F.col("o_orderkey").cast("string"))
        ).cast("double")
        / 1000000007
    )
    return (
        orders.join(F.broadcast(mx))
        .filter(u < F.col("o_totalprice") / F.col("max_p"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum("o_totalprice"), 2).alias("sampled_value"),
            F.min("o_orderkey").alias("min_key"),
        )
        .orderBy("o_orderpriority")
    )


@declared(
    "q173_exact_stratified_split",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('split:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS n_lang
      FROM documents
    ),
    assigned AS (
      SELECT doc_id, lang,
             CASE WHEN rk * 10 <= n_lang * 8 THEN 'train'
                  WHEN rk * 10 <= n_lang * 9 THEN 'val'
                  ELSE 'test' END AS split
      FROM ranked
    )
    SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM assigned GROUP BY lang, split ORDER BY lang, split
    """,
)
def q173_exact_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-proportion stratified split (the counted counterpart of
    q48/q49's hash-Bernoulli splits, whose per-stratum fractions only
    hold in expectation): within each language stratum, docs are ranked
    by a salted content hash (deterministic shuffle order -- no RNG, no
    seed coordination) and the rank decides train/val/test at exactly
    floor-8/1/1 per 10, so every stratum's proportions are guaranteed,
    not probabilistic. The integer comparison ``rk*10 <= n*8`` avoids
    float boundary drift between engines.

    Scale notes: one window per stratum over (hash, doc_id) -- strata
    are the partition keys, so no global sort; the count-over window
    shares the same shuffle. Hash-ranked order also makes the split
    STABLE under corpus append-with-resplit ONLY for unchanged strata
    -- the docstring-level contract a leakage-safe pipeline needs to
    know (contrast q123, which splits by near-dup cluster to prevent
    leakage ACROSS the boundary).
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    wc = Window.partitionBy("lang")
    ranked = docs.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wc).alias("n_lang"),
    )
    assigned = ranked.select(
        "doc_id",
        "lang",
        F.when(F.col("rk") * 10 <= F.col("n_lang") * 8, "train")
        .when(F.col("rk") * 10 <= F.col("n_lang") * 9, "val")
        .otherwise("test")
        .alias("split"),
    )
    return (
        assigned.groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .orderBy("lang", "split")
    )
