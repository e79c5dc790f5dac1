"""Dual-entry equivalence (SURVEY.md section 2.3 closing rule): the same
query through ``spark.sql`` on registered views must equal the df-chain
implementation the oracle gate runs. One SQL twin per operator area."""

from __future__ import annotations

import pytest

from iot_data_pipeline_spark.queries import REGISTRY
from iot_data_pipeline_spark.sources.readers import register_views

SQL_TWINS = {
    "q02_threshold_filter": """
        WITH sensor AS (
          SELECT concat('device-', CAST(user_id % 25 AS STRING)) AS device_id,
                 CASE WHEN event_id % 17 = 0 THEN NULL ELSE value / 10 - 5 END
                   AS temperature
          FROM events
        )
        SELECT device_id, temperature FROM sensor
        WHERE temperature > 10.0 ORDER BY device_id, temperature
    """,
    "q05_revenue_per_nation": """
        SELECT n.n_name AS n_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               COUNT(*) AS n_lineitems
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY n.n_name
        HAVING SUM(l.l_extendedprice * (1 - l.l_discount)) > 0
        ORDER BY revenue DESC, n_name
    """,
    "q07_anti_join": """
        SELECT c.c_custkey, c.c_mktsegment FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c.c_custkey
    """,
    "q09_lineitem_agg": """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               COUNT(DISTINCT l_partkey) AS n_parts,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(AVG(l_extendedprice), 2) AS avg_price,
               ROUND(MIN(l_discount), 2) AS min_disc,
               ROUND(MAX(l_discount), 2) AS max_disc,
               ROUND(STDDEV_SAMP(l_discount), 4) AS sd_disc,
               ROUND(VAR_SAMP(l_tax), 4) AS var_tax,
               ROUND(PERCENTILE(l_quantity, 0.5), 2) AS med_qty,
               date_format(MIN(l_shipdate), 'yyyy-MM-dd HH:mm:ss') AS min_ship,
               date_format(MAX(l_shipdate), 'yyyy-MM-dd HH:mm:ss') AS max_ship
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q11_distinct": """
        SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment
    """,
    "q15_topk_per_group": """
        SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 3
        ORDER BY o_orderpriority, rn
    """,
    "q18_hourly_counts": """
        SELECT date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss') AS hour,
               event_type, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY date_trunc('hour', ts), event_type
        ORDER BY hour, event_type
    """,
    "q19_json_extract": """
        SELECT event_type,
               COUNT(*) AS n,
               ROUND(AVG(try_cast(get_json_object(props, '$.k') AS INT)), 2) AS avg_k,
               MIN(try_cast(get_json_object(props, '$.k') AS INT)) AS min_k,
               MAX(try_cast(get_json_object(props, '$.k') AS INT)) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q35_math_funcs": """
        SELECT event_id,
               ROUND(value, 1) AS v_round,
               FLOOR(value) AS v_floor,
               CEIL(value) AS v_ceil,
               ROUND(ABS(value - 250.0), 2) AS v_absdev,
               ROUND(SQRT(value), 4) AS v_sqrt,
               ROUND(LN(value + 1), 4) AS v_ln,
               ROUND(LOG10(value + 1), 4) AS v_log10,
               ROUND(POW(value / 100, 2), 4) AS v_pow,
               PMOD(event_id, 7) AS v_pmod,
               SIGNUM(value - 250.0) AS v_sign
        FROM events WHERE event_id % 25 = 0 ORDER BY event_id
    """,
    "q36_array_funcs": """
        SELECT vec_id,
               size(embedding) AS n_dims,
               size(filter(embedding, x -> x > 0)) AS n_pos,
               CAST(array_position(embedding, array_max(embedding)) AS INT)
                 AS argmax_pos,
               ROUND(CAST(array_max(embedding) AS DOUBLE), 4) AS max_val,
               ROUND(CAST(element_at(sort_array(slice(embedding, 1, 8)), 1)
                     AS DOUBLE), 4) AS min_of_first8,
               ROUND(AGGREGATE(TRANSFORM(embedding, x -> CAST(x AS DOUBLE)),
                     CAST(0.0 AS DOUBLE), (s, x) -> s + x), 4) AS sum_all
        FROM embeddings ORDER BY vec_id
    """,
    "q39_bpe_tokens": """
        WITH tok AS (
          SELECT doc_id,
                 explode(regexp_extract_all(lower(text),
                         ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+', 0)) AS piece
          FROM documents
        ),
        per_doc AS (
          SELECT piece, doc_id, COUNT(*) AS cnt FROM tok GROUP BY piece, doc_id
        )
        SELECT piece, SUM(cnt) AS n, COUNT(*) AS n_docs
        FROM per_doc GROUP BY piece
        ORDER BY n DESC, piece LIMIT 30
    """,
    "q40_curation_pipeline": """
        WITH corpus AS (
          SELECT doc_id, text, lang FROM documents
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text, lang
          FROM documents WHERE doc_id % 10 = 0
        ),
        scored AS (
          SELECT doc_id, text, lang,
                 0.5 * (CAST(size(array_distinct(split(text, ' '))) AS DOUBLE)
                        / size(split(text, ' ')))
                 + 0.3 * least(CAST(size(split(text, ' ')) AS DOUBLE) / 100, 1.0)
                 + 0.2 * least((CAST(length(text) - size(split(text, ' ')) + 1
                                AS DOUBLE) / size(split(text, ' '))) / 8, 1.0)
                   AS quality
          FROM corpus
        ),
        kept AS (SELECT * FROM scored WHERE quality >= 0.51),
        dedup AS (
          SELECT MIN(doc_id) AS rep_doc, COUNT(*) AS n_copies,
                 MIN(lang) AS lang, MIN(quality) AS quality
          FROM kept GROUP BY sha2(text, 256)
        )
        SELECT lang, COUNT(*) AS n_unique_docs,
               SUM(n_copies - 1) AS n_dups_removed,
               ROUND(AVG(quality), 4) AS avg_quality
        FROM dedup GROUP BY lang ORDER BY lang
    """,
    "q46_shipping_priority": """
        SELECT l.l_orderkey,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               date_format(o.o_orderdate, 'yyyy-MM-dd') AS orderdate,
               o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """,
    "q47_large_orders": """
        WITH big AS (
          SELECT l_orderkey, SUM(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
        )
        SELECT c.c_custkey, o.o_orderkey,
               date_format(o.o_orderdate, 'yyyy-MM-dd') AS orderdate,
               ROUND(o.o_totalprice, 2) AS totalprice,
               ROUND(b.sum_qty, 2) AS sum_qty
        FROM big b
        JOIN orders o ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY totalprice DESC, o.o_orderkey
    """,
    "q48_hash_split": """
        WITH assigned AS (
          SELECT n_chars, lang,
                 CASE WHEN h < 80 THEN 'train'
                      WHEN h < 90 THEN 'valid' ELSE 'test' END AS split
          FROM (
            SELECT n_chars, lang,
                   (CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15),
                              16, 10) AS BIGINT) % 1000000007) % 100 AS h
            FROM documents)
        )
        SELECT split, COUNT(*) AS n_docs,
               ROUND(AVG(n_chars), 2) AS avg_chars,
               COUNT(DISTINCT lang) AS n_langs
        FROM assigned GROUP BY split ORDER BY split
    """,
    "q64_upsert_merge": """
        WITH base AS (
          SELECT user_id, ROUND(SUM(value), 2) AS balance
          FROM events WHERE ts < TIMESTAMP '2024-06-01' GROUP BY user_id
        ),
        changes AS (
          SELECT user_id, ROUND(SUM(value), 2) AS delta
          FROM events WHERE ts >= TIMESTAMP '2024-06-01' GROUP BY user_id
        )
        SELECT COALESCE(b.user_id, c.user_id) AS user_id,
               ROUND(COALESCE(b.balance, 0) + COALESCE(c.delta, 0), 2)
                   AS new_balance,
               CASE WHEN b.user_id IS NULL THEN 'insert'
                    WHEN c.user_id IS NULL THEN 'unchanged'
                    ELSE 'update' END AS action
        FROM base b FULL OUTER JOIN changes c ON b.user_id = c.user_id
        ORDER BY user_id
    """,
    "q83_lateral_topn": """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation n,
             LATERAL (SELECT c.c_custkey, c.c_acctbal
                      FROM customer c
                      WHERE c.c_nationkey = n.n_nationkey
                      ORDER BY c.c_acctbal DESC, c.c_custkey
                      LIMIT 2) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey
    """,
    "q77_customer_distribution": """
        SELECT n_orders, COUNT(*) AS n_customers
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY ALL
        ) per_cust
        GROUP BY ALL
        ORDER BY n_customers DESC, n_orders DESC
    """,
    "q76_priority_exists": """
        SELECT o.o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    "q66_arg_extremes": """
        SELECT event_type,
               MAX_BY(user_id, event_id) AS latest_user,
               MIN_BY(user_id, event_id) AS first_user,
               MAX(event_id) AS max_event_id,
               MIN(event_id) AS min_event_id
        FROM events GROUP BY event_type ORDER BY event_type
    """,
}


@pytest.mark.parametrize("name", sorted(SQL_TWINS))
def test_sql_twin_matches_df_chain(spark, sf_dir, name):
    register_views(spark, sf_dir)
    via_sql = spark.sql(SQL_TWINS[name])
    via_df = REGISTRY[name].fn(spark, sf_dir)
    sql_rows = [tuple(r) for r in via_sql.collect()]
    df_rows = [tuple(r) for r in via_df.collect()]
    assert via_sql.columns == via_df.columns
    assert sql_rows == df_rows
