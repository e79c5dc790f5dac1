"""q84-q92: modern-surface queries -- Spark 4 features (VARIANT, Python
UDTF, recursive CTE, XML, try_* arithmetic) and user-analytics shapes
(TF-IDF, quality quarantine, funnel stages, cohort retention).

The reference stores semi-structured payloads only as raw JSON strings
probed per-record (reference app/app.py:40,51); VARIANT is the
engine-native generalization: parse once into a binary-encoded tree,
then path-extract without re-parsing per access. The chunker is a
north-star training-data op: split each document into fixed token
windows, the unit LLM pipelines feed to tokenizers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iot_data_pipeline_spark.queries.registry import declared
from iot_data_pipeline_spark.sources.readers import read_table

CHUNK_TOKENS = 32


@declared(
    "q84_variant_json",
    oracle="""
    WITH p AS (
      SELECT event_type,
             CASE WHEN json_valid(props)
                  THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
             END AS k
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(AVG(k), 2) AS avg_k,
           CAST(SUM(k) AS BIGINT) AS sum_k
    FROM p GROUP BY event_type ORDER BY event_type
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
    # try_parse_json: strict parse_json RAISES on a malformed props row,
    # killing the whole job -- NULL variant (-> NULL path reads) is the
    # ingestion-tolerant contract (degenerate-events fixture finding)
    k = F.variant_get(F.try_parse_json("props"), "$.k", "int")
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


@declared(
    "q86_tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
    ),
    idf AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / idf.df), 4) AS tfidf
      FROM tf JOIN idf USING (token) CROSS JOIN n
    )
    SELECT doc_id, token AS top_term, tfidf FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
      FROM scored) t
    WHERE rn = 1
    ORDER BY doc_id
    """,
)
def q86_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document most-distinctive term by TF-IDF (text-analysis
    north-star op): tf from a token explode, document frequency from a
    distinct-count, idf = ln(N/df), ranked per doc on the ROUNDED score
    with a token tie-break (SURVEY.md section 2.3 rule 1).

    Scale plan: two aggregations over the token stream (both partial-agg
    friendly) + a broadcast of the tiny idf table joined back by token;
    N is a one-row broadcast. No cross joins, no UDFs -- the whole score
    is whole-stage-codegen arithmetic.
    """
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    idf = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(idf), "token")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("token").alias("top_term"), "tfidf")
        .orderBy("doc_id")
    )


@declared(
    "q87_xml_roundtrip",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q87_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink surface (native in Spark 4; the third interchange
    format beside JSONL q01 and ORC q74). Orders round-trip through XML
    with an explicit read schema -- the oracle reads the original
    parquet, so writer and reader must preserve every value exactly
    (doubles survive because the writer emits shortest-round-trip
    decimal strings).

    XML is a row-tag text format: splittable per row at read (each task
    parses its own row elements), so scans parallelize like JSONL; it is
    strictly an interchange surface -- the processed zone stays parquet.
    """
    from iot_data_pipeline_spark.queries.staging import staged_fixture

    orders = read_table(spark, sf_dir, "orders")
    zone = staged_fixture(
        "q87_orders_xml",
        sf_dir,
        lambda d: orders.write.format("xml")
        .option("rowTag", "order")
        .mode("overwrite")
        .save(d),
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "order")
        .schema(orders.schema)
        .load(zone)
    )
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .orderBy("o_orderpriority")
    )


@declared(
    "q88_recursive_cte",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '2001-08-01'
    )
    SELECT strftime(m, '%Y-%m-%d %H:%M:%S') AS month,
           COUNT(o_orderkey) AS n_orders
    FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
    GROUP BY m ORDER BY m
    """,
)
def q88_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new in Spark 4): a month spine generated by
    recursion, left-joined to orders so empty months surface as zero --
    the DuckDB oracle runs the *same* recursive SQL, so this checks the
    two engines' recursion semantics against each other.

    The recursion is driver-cheap (one row per step, ~80 steps); the
    join against orders is one broadcast of the spine. The iterative
    DataFrame twin for unbounded recursion depth remains
    operators/graph.connected_components (q52).
    """
    from iot_data_pipeline_spark.sources.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1995-01-01'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months
          WHERE m < TIMESTAMP '2001-08-01'
        )
        SELECT date_format(m, 'yyyy-MM-dd HH:mm:ss') AS month,
               COUNT(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders ON date_trunc('MONTH', o_orderdate) = m
        GROUP BY m ORDER BY m
        """
    )


@declared(
    "q89_ansi_safe_arith",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE value > 400) AS n_hi,
           COUNT(*) FILTER (WHERE value < 0) AS n_neg,
           CAST(COUNT(*) FILTER (WHERE value > 400) AS DOUBLE)
             / NULLIF(COUNT(*) FILTER (WHERE value < 0), 0) AS hi_per_neg,
           ROUND(CAST(COUNT(*) FILTER (WHERE value > 400) AS DOUBLE)
                 / NULLIF(COUNT(*), 0), 4) AS hi_rate
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q89_ansi_safe_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic surface: ``try_divide`` yields NULL on a zero
    denominator instead of failing the job (the engine runs with ANSI
    mode defaults in Spark 4, so the try_* family is the production
    posture for dirty-data arithmetic -- same drop-don't-fail stance as
    the corrupt-record channel, reference app/app.py:62-65).

    events has no negative values, so ``n_neg`` is 0 for every group and
    the division exercises the NULL path on every row. The DuckDB
    formulation is NULLIF (per-engine contract, SURVEY.md section 2.3
    rule 5).
    """
    ev = read_table(spark, sf_dir, "events")
    n_hi = F.count_if(F.col("value") > 400)
    n_neg = F.count_if(F.col("value") < 0)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            n_hi.alias("n_hi"),
            n_neg.alias("n_neg"),
            F.try_divide(n_hi.cast("double"), n_neg).alias("hi_per_neg"),
            F.round(
                F.try_divide(n_hi.cast("double"), F.count(F.lit(1))), 4
            ).alias("hi_rate"),
        )
        .orderBy("event_type")
    )


@declared(
    "q90_quality_quarantine",
    oracle="""
    WITH checked AS (
      SELECT event_type,
             (value >= 0 AND value <= 500) AS ok_range,
             (TRY_CAST(CASE WHEN json_valid(props)
                            THEN json_extract_string(props, '$.k') END
                       AS INTEGER)
                BETWEEN 0 AND 99) AS ok_props,
             (user_id IS NOT NULL) AS ok_user
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE NOT COALESCE(ok_range, FALSE)) AS viol_value_range,
           COUNT(*) FILTER (WHERE NOT COALESCE(ok_props, FALSE)) AS viol_props_k,
           COUNT(*) FILTER (WHERE NOT COALESCE(ok_user, FALSE)) AS viol_user_present,
           COUNT(*) FILTER (WHERE COALESCE(ok_range, FALSE)
                              AND COALESCE(ok_props, FALSE)
                              AND COALESCE(ok_user, FALSE)) AS n_clean
    FROM checked GROUP BY event_type ORDER BY event_type
    """,
)
def q90_quality_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations over events (operators/quality.py,
    generalizing the reference's A20 critical-field validation): three
    named rules evaluated in one codegen pass; per-type violation counts
    plus the clean-row count the quarantine split would keep.

    Oracle note: DuckDB's json functions RAISE on malformed JSON where
    Spark's get_json_object returns NULL, so the oracle routes props
    through json_valid + TRY_CAST (the q19/q63 guard pattern; a
    malformed-props event simply fails the props_k expectation, which is
    exactly what a quality gate should do).
    """
    from iot_data_pipeline_spark.operators.quality import (
        VIOLATIONS_COL,
        Expectation,
        with_violations,
    )

    ev = read_table(spark, sf_dir, "events")
    rules = [
        Expectation("value_range", F.col("value").between(0, 500)),
        Expectation(
            "props_k",
            F.get_json_object("props", "$.k").try_cast("int").between(0, 99),
        ),
        Expectation("user_present", F.col("user_id").isNotNull()),
    ]
    marked = with_violations(ev, rules)
    return (
        marked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.count_if(
                    F.array_contains(VIOLATIONS_COL, r.name)
                ).alias(f"viol_{r.name}")
                for r in rules
            ],
            F.count_if(F.size(VIOLATIONS_COL) == 0).alias("n_clean"),
        )
        .orderBy("event_type")
    )


@declared(
    "q91_funnel_stages",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t_buy
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY e.user_id),
    stages AS (
      SELECT u.user_id,
             CASE WHEN p.user_id IS NOT NULL THEN 3
                  WHEN c.user_id IS NOT NULL THEN 2
                  WHEN v.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS stage
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN v ON u.user_id = v.user_id
      LEFT JOIN c ON u.user_id = c.user_id
      LEFT JOIN p ON u.user_id = p.user_id)
    SELECT stage, COUNT(*) AS n_users
    FROM stages GROUP BY stage ORDER BY stage
    """,
)
def q91_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view -> later click -> later purchase):
    how far each user progresses through a strictly time-ordered event
    sequence, as a stage histogram. Sequence analytics is a capability
    class of its own -- each stage's qualifier depends on the PREVIOUS
    stage's timestamp, not just event presence.

    Scale plan: every stage is one filtered aggregate joined on user_id;
    all four joins share the same key, so one hash partitioning on
    user_id serves the whole chain (AQE reuses the exchange). No windows
    over the full event stream, no cross-stage state.
    """
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.join(v, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.join(c, "user_id")
        .filter(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    users = ev.select("user_id").distinct()
    stage = (
        F.when(F.col("t_buy").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("stage")
    )


@declared(
    "q92_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS cohort
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
      FROM events
    )
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cohort, a.wk) / 7 AS INTEGER) AS week_no,
           COUNT(*) AS n_active
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q92_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted in
    each subsequent activity week -- the standard retention triangle.

    Scale plan: both CTEs aggregate the event stream on user_id (shared
    partitioning), the cohort join is per-user (one row each side per
    user/week), and the final agg groups a few hundred (cohort, week)
    cells. COUNT(*) over the deduped activity equals COUNT(DISTINCT
    user) without a second distinct shuffle.
    """
    ev = read_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cohort") / 7).cast("int").alias("week_no"),
        )
        .groupBy("cohort_week", "week_no")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_week", "week_no")
    )


@declared(
    "q93_event_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM ordered WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    ORDER BY prev_type, next_type
    """,
)
def q93_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition matrix (first-order Markov counts): per-user
    event streams ordered by (ts, event_id), adjacent pairs counted by
    (prev, next) type -- the "what happens after X" analytics shape.

    Scale plan: one window shuffle on user_id (per-user streams sort
    within partitions), then a partial-agg-friendly groupBy over a
    5x5 key space. The event_id tiebreak makes adjacency deterministic
    under equal timestamps.
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("prev_type", "next_type")
    )


@declared(
    "q95_collated_grouping",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN c_custkey % 2 = 0
                  THEN upper(substr(c_mktsegment, 1, 1))
                         || lower(substr(c_mktsegment, 2))
                  ELSE lower(c_mktsegment) END AS seg_mixed,
             c_acctbal
      FROM customer
    )
    SELECT upper(min(seg_mixed)) AS segment,
           COUNT(*) AS n,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM mixed
    GROUP BY lower(seg_mixed)
    ORDER BY segment
    """,
)
def q95_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via a COLLATION (Spark 4 collated string
    types) rather than a lower() rewrite: the segment values are first
    deterministically case-mangled (initcap on even keys, lower on odd),
    then grouped under UTF8_LCASE -- engine-level collation semantics the
    DuckDB oracle reproduces with explicit lower() grouping.

    The output key normalizes through upper(min(...)) so the grouped
    representative is deterministic (a collated group's member casings
    are all equal under the collation -- either engine may keep any).
    """
    cust = read_table(spark, sf_dir, "customer")
    mangled = F.when(
        F.col("c_custkey") % 2 == 0, F.initcap(F.lower("c_mktsegment"))
    ).otherwise(F.lower("c_mktsegment"))
    return (
        cust.select(mangled.alias("seg_mixed"), "c_acctbal")
        .groupBy(F.collate(F.col("seg_mixed"), "UTF8_LCASE"))
        .agg(
            F.upper(F.min(F.collate(F.col("seg_mixed"), "UTF8_BINARY"))).alias(
                "segment"
            ),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .select("segment", "n", "total_bal")
        .orderBy("segment")
    )


@declared(
    "q96_listagg_bitagg",
    oracle="""
    SELECT n.n_name,
           string_agg(s.s_name, ',' ORDER BY s.s_name) AS suppliers,
           CAST(bit_or(s.s_suppkey) AS BIGINT) AS key_bits_or,
           CAST(bit_and(s.s_suppkey) AS BIGINT) AS key_bits_and
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def q96_listagg_bitagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG ... WITHIN GROUP, new SQL
    surface in Spark 4) plus bitwise aggregates. The WITHIN GROUP
    ordering is what makes string concatenation deterministic under
    distributed aggregation -- bare listagg concatenates in partition
    arrival order and can never be oracle-checked.
    """
    from iot_data_pipeline_spark.sources.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name,
               listagg(s.s_name, ',') WITHIN GROUP (ORDER BY s.s_name)
                 AS suppliers,
               bit_or(s.s_suppkey) AS key_bits_or,
               bit_and(s.s_suppkey) AS key_bits_and
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n.n_name
        """
    )


@declared(
    "q106_referential_audit",
    oracle="""
    SELECT fk, n_rows, n_orphans FROM (
      SELECT 'customer->nation' AS fk, COUNT(*) AS n_rows,
             COUNT(*) FILTER (WHERE n.n_nationkey IS NULL) AS n_orphans
      FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      UNION ALL
      SELECT 'lineitem->orders', COUNT(*),
             COUNT(*) FILTER (WHERE o.o_orderkey IS NULL)
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'lineitem->part', COUNT(*),
             COUNT(*) FILTER (WHERE p.p_partkey IS NULL)
      FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      UNION ALL
      SELECT 'lineitem->supplier', COUNT(*),
             COUNT(*) FILTER (WHERE s.s_suppkey IS NULL)
      FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      UNION ALL
      SELECT 'orders->customer', COUNT(*),
             COUNT(*) FILTER (WHERE c.c_custkey IS NULL)
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ) audit ORDER BY fk
    """,
)
def q106_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity sweep over every foreign key in the star
    schema (the nightly data-quality audit a lake runs before publishing
    a snapshot): per-FK row count and orphan count via left joins.

    Scale plan: each probe is one left join; only constant-size PK
    sides (nation) are force-broadcast -- part/supplier/customer/orders
    grow with SF, so those probes carry no hint (planner broadcasts
    while they fit, shuffles on the key once when they don't) and
    aggregate to two numbers map-side. The five probes are independent
    Spark jobs unioned at the end -- they parallelize across the cluster
    rather than serializing in one stage chain.
    """

    def probe(name, child, child_key, parent, parent_key, broadcast_parent):
        c = read_table(spark, sf_dir, child)
        p = read_table(spark, sf_dir, parent).select(parent_key)
        if broadcast_parent:
            p = F.broadcast(p)
        return (
            c.join(p, F.col(child_key) == F.col(parent_key), "left")
            .agg(
                F.lit(name).alias("fk"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count_if(F.col(parent_key).isNull()).alias("n_orphans"),
            )
        )

    probes = [
        probe("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey", True),
        probe("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", False),
        probe("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey", False),
        probe("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", False),
        probe("orders->customer", "orders", "o_custkey", "customer", "c_custkey", False),
    ]
    out = probes[0]
    for pr in probes[1:]:
        out = out.unionByName(pr)
    return out.orderBy("fk")


@declared(
    "q180_nested_reshape",
    oracle="""
    WITH items AS (
      SELECT l_orderkey,
             list(struct_pack(qty := l_quantity, price := l_extendedprice,
                              flag := l_returnflag)
                  ORDER BY l_linenumber) AS its
      FROM lineitem WHERE l_orderkey < 1000
      GROUP BY l_orderkey
    ),
    reshaped AS (
      SELECT l_orderkey,
             len(its) AS n_items,
             len(list_filter(its, x -> x.flag = 'R')) AS n_returned,
             ROUND(list_sum(list_transform(
               list_filter(its, x -> x.qty > 10),
               x -> x.qty * x.price)), 2) AS big_item_value
      FROM items
    )
    SELECT l_orderkey,
           CAST(n_items AS BIGINT) AS n_items,
           CAST(n_returned AS BIGINT) AS n_returned,
           COALESCE(big_item_value, 0.0) AS big_item_value
    FROM reshaped
    WHERE n_returned > 0 ORDER BY l_orderkey
    """,
)
def q180_nested_reshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep nested-data idioms (the document-model counterpart of B35's
    flat array HOFs): line items NEST into an array-of-structs per order
    (sorted by line number so the nested layout is deterministic), the
    inner structs are filtered/projected/folded WITHOUT re-exploding --
    lambda field access, struct-predicate filters, transform-then-
    aggregate -- and orders with returned items emerge flattened. This
    is the shape JSON-lake pipelines live in: build the nested document
    once, run the per-document logic as array expressions instead of a
    second shuffle.

    Scale notes: one shuffle builds the nested frame (sort_array makes
    collect_list order-independent of partitioning -- SURVEY section 2.3
    rule 1 applied to nesting); everything after is row-local codegen'd
    array work. The fold is arithmetic on qty*price inside the array --
    no explode, no join back. COALESCE pins the empty-filter sum (Spark
    aggregate over empty -> 0.0 by seed; DuckDB list_sum -> NULL).
    """
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    items = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("ln"),
                    F.col("l_quantity").alias("qty"),
                    F.col("l_extendedprice").alias("price"),
                    F.col("l_returnflag").alias("flag"),
                )
            )
        ).alias("its")
    )
    big_val = F.round(
        F.aggregate(
            F.filter(F.col("its"), lambda x: x["qty"] > 10),
            F.lit(0.0),
            lambda acc, x: acc + x["qty"] * x["price"],
        ),
        2,
    )
    return (
        items.select(
            "l_orderkey",
            F.size("its").cast("bigint").alias("n_items"),
            F.size(F.filter(F.col("its"), lambda x: x["flag"] == "R"))
            .cast("bigint")
            .alias("n_returned"),
            F.coalesce(big_val, F.lit(0.0)).alias("big_item_value"),
        )
        .filter(F.col("n_returned") > 0)
        .orderBy("l_orderkey")
    )
