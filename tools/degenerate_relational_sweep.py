"""One-shot audit: run every relational-table query against an adversarial
customer/orders/lineitem fixture and report divergences.

Round-6's degenerate documents/events/embeddings fixtures found 9 real bug
classes; this applies the same method to the relational band (54 queries
whose oracles read customer/orders/lineitem). Adversities a real data lake
serves routinely but the driver's generator never does:

- a customer with zero orders, and an order with zero lineitems
- lineitems referencing a MISSING order (orphans)
- exact ties in every ranking dimension (totalprice, revenue, acctbal,
  dates) -- top-k picks must not depend on engine-internal row order
- boundary dates exactly ON the queries' filter constants (1996-01-01,
  1996-10-01, 1997-01-01, 1998-01-01) and just outside them
- zero quantity, zero price, 100% discount (zero revenue), exact
  duplicate line content, empty-string categorical values

Usage: python -m tools.degenerate_relational_sweep
           [--nulls|--dims|--skew|--tiny] [query ...]
(--nulls adds NULL-bearing rows; --dims additionally replaces
part/supplier with adversarial dimension tables, implying --nulls;
--skew replaces customer/orders/lineitem with a volumetric hot-key
fixture -- 90% of orders on one customer, 85% of lineitems on one
part/supplier, one 5k-line order, massive tie groups -- probing
order-dependent logic under skewed partials and AQE skew splits;
--tiny shrinks customer/orders/lineitem to ONE row each, probing
single-element aggregate/window edge semantics)
"""

from __future__ import annotations

import shutil
import sys
import tempfile

import duckdb

RELATIONAL_QUERIES = [
    "q05_revenue_per_nation", "q06_left_join_counts", "q07_anti_join",
    "q07b_semi_join", "q09_lineitem_agg", "q10_rollup",
    "q10b_grouping_sets", "q10c_cube", "q11_distinct", "q11b_set_ops",
    "q15_topk_per_group", "q15b_rank_ntile", "q18b_date_parts",
    "q37_correlated_subquery", "q41_pivot", "q42_unpivot",
    "q43_percent_rank", "q46_shipping_priority", "q47_large_orders",
    "q56_stats_agg", "q57_filtered_agg", "q60_value_windows",
    "q62_union_by_name", "q72_decimal_exact", "q73_predicate_aggs",
    "q74_orc_roundtrip", "q76_priority_exists",
    "q77_customer_distribution", "q78_promo_revenue",
    "q79_disjunctive_filter", "q80_rich_idle_customers",
    "q81_top_suppliers", "q82_small_quantity_parts", "q83_lateral_topn",
    "q87_xml_roundtrip", "q88_recursive_cte", "q94_weighted_sample",
    "q95_collated_grouping", "q101_volume_shipping", "q102_market_share",
    "q103_returned_items", "q104_shipping_lateness",
    "q105_waiting_suppliers", "q106_referential_audit",
    "q107_forecast_revenue", "q108_product_profit",
    "q111_dominant_suppliers", "q125_min_cost_supplier",
    "q126_important_parts", "q127_supplier_part_counts",
    "q164_ivm_join_view", "q165_spatial_radius_join",
    "q180_nested_reshape", "q181_contribution_shares",
]

SIDE_TABLES = (
    "region", "nation", "part", "supplier",
    "events", "documents", "embeddings",
)


def _build_degenerate_dims(d: str) -> None:
    """Replace part/supplier with adversarial rows: exact ties in every
    ranking dimension (retailprice, acctbal), duplicate content under
    distinct keys, NULL size/brand/price/acctbal/nationkey, empty-string
    names/types, zero price, and orphan rows no lineitem references.
    Keys 1-9 (part) / 1-6 (supplier) stay resolvable so the lineitem FK
    paths still join; nationkeys 3/8/13 keep q125's EUROPE path
    populated."""
    duckdb.sql(f"""
    COPY (
      SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name, p_brand,
             p_type, CAST(p_size AS INTEGER) AS p_size,
             CAST(p_retailprice AS DOUBLE) AS p_retailprice
      FROM (VALUES
        (1,   'alpha widget', 'Brand#1', 'ECONOMY',  15, 100.0),
        (2,   'alpha widget', 'Brand#1', 'ECONOMY',  15, 100.0),
        (3,   'beta bolt',    'Brand#2', 'PROMO',  NULL, 200.0),
        (4,   'gamma bolt',   NULL,      '',         15, 200.0),
        (5,   '',             'Brand#3', 'STANDARD',  7, NULL),
        (6,   'delta nut',    'Brand#3', 'STANDARD',  7,   0.0),
        (7,   'epsilon nut',  'Brand#4', 'PROMO',    15, 300.0),
        (8,   'zeta gear',    'Brand#4', 'PROMO',    15, 300.0),
        (9,   'eta gear',     'Brand#5', 'ECONOMY',   1,  50.0),
        (100, 'orphan part',  'Brand#9', 'ECONOMY',  15, 999.0)
      ) t(p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
    ) TO '{d}/part.parquet' (FORMAT PARQUET)
    """)
    duckdb.sql(f"""
    COPY (
      SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
             CAST(s_nationkey AS INTEGER) AS s_nationkey,
             CAST(s_acctbal AS DOUBLE) AS s_acctbal
      FROM (VALUES
        (1,  'supp-eu-a',        3,  100.0),
        (2,  'supp-eu-b',        8,  100.0),
        (3,  'supp-null-bal',   13,   NULL),
        (4,  'supp-non-eu',      0,  500.0),
        (5,  '',                 1,  -10.0),
        (6,  'supp-null-nation', NULL, 50.0),
        (50, 'supp-orphan',     18,   25.0)
      ) t(s_suppkey, s_name, s_nationkey, s_acctbal)
    ) TO '{d}/supplier.parquet' (FORMAT PARQUET)
    """)


def _append_nan_money(d: str) -> None:
    """Append a NaN-priced lineitem and an Infinity-priced order: dirty
    upstream compute lands non-finite doubles in money columns too. The
    round-7 probe found DuckDB's moment aggregates RAISE on NaN input
    (q56) and both engines' DECIMAL casts raise on Inf (q72/q164)."""
    import os

    duckdb.sql(f"""
    COPY (SELECT * FROM '{d}/lineitem.parquet' UNION ALL
      SELECT 108, 9, 3, 9, 2.0, 'nan'::DOUBLE, 0.0, 0.0, 'N', 'O',
             TIMESTAMP '1996-06-01')
    TO '{d}/lineitem2.parquet' (FORMAT PARQUET)""")
    os.replace(f"{d}/lineitem2.parquet", f"{d}/lineitem.parquet")
    duckdb.sql(f"""
    COPY (SELECT * FROM '{d}/orders.parquet' UNION ALL
      SELECT 112, 6, 'O', 'inf'::DOUBLE, TIMESTAMP '1996-09-09', '2-HIGH')
    TO '{d}/orders2.parquet' (FORMAT PARQUET)""")
    os.replace(f"{d}/orders2.parquet", f"{d}/orders.parquet")


def build_skew_fixture(d: str, src: str = "/root/testdata/sf0.001") -> None:
    """Volumetric hot-key fixture: the shape AQE's skew handling and
    partial-aggregation reordering actually engage on, at a size (20k
    orders / 80k lineitems) comparable to the sf0.01 harness data.

    - custkey 6 owns 90% of orders (hot group-by key AND hot join key);
    - partkey/suppkey 1 carry 85% of lineitems (hot dimension FK);
    - orderkey 1 has ~5,000 lineitems (hot order for per-order windows);
    - o_totalprice/l_quantity land on tiny value grids, so every ranking
      dimension has tie groups thousands of rows deep.

    All money values are exact binary fractions (multiples of 0.25/0.5)
    and totals stay far below 2^53, so double SUMs are order-invariant
    EXACTLY: any divergence this sweep reports is a logic/tie/skew-path
    bug, never ulp noise (that hazard class is mechanized separately in
    tests/oracle_harness.ROUND_SUM_CERTIFIED)."""
    for t in SIDE_TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{d}/{t}.parquet")
    duckdb.sql(f"""
    COPY (
      SELECT CAST(i AS BIGINT) AS c_custkey,
             'cust-' || i AS c_name,
             CAST(i % 25 AS INTEGER) AS c_nationkey,
             CAST((i % 5) * 100 AS DOUBLE) AS c_acctbal,
             ['BUILDING','MACHINERY','AUTOMOBILE','HOUSEHOLD','FURNITURE']
               [1 + i % 5] AS c_mktsegment
      FROM range(1, 21) t(i)
    ) TO '{d}/customer.parquet' (FORMAT PARQUET)
    """)
    duckdb.sql(f"""
    COPY (
      SELECT CAST(i AS BIGINT) AS o_orderkey,
             CAST(CASE WHEN i % 10 < 9 THEN 6 ELSE 1 + i % 20 END
                  AS BIGINT) AS o_custkey,
             ['O','F','P'][1 + i % 3] AS o_orderstatus,
             CAST((i % 97) * 0.5 AS DOUBLE) AS o_totalprice,
             TIMESTAMP '1995-01-01' + INTERVAL (i % 1460) DAY
               AS o_orderdate,
             ['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW']
               [1 + i % 5] AS o_orderpriority
      FROM range(1, 20001) t(i)
    ) TO '{d}/orders.parquet' (FORMAT PARQUET)
    """)
    duckdb.sql(f"""
    COPY (
      SELECT CAST(CASE WHEN i % 16 = 0 THEN 1 ELSE 1 + i % 20000 END
                  AS BIGINT) AS l_orderkey,
             CAST(CASE WHEN i % 20 < 17 THEN 1 ELSE i % 200 END
                  AS BIGINT) AS l_partkey,
             CAST(CASE WHEN i % 20 < 17 THEN 1 ELSE i % 10 END
                  AS BIGINT) AS l_suppkey,
             CAST(1 + i % 7 AS INTEGER) AS l_linenumber,
             CAST(1 + i % 50 AS DOUBLE) AS l_quantity,
             CAST((1 + i % 1000) * 0.25 AS DOUBLE) AS l_extendedprice,
             CAST((i % 5) * 0.25 AS DOUBLE) AS l_discount,
             CAST((i % 3) * 0.5 AS DOUBLE) AS l_tax,
             ['N','R','A'][1 + i % 3] AS l_returnflag,
             ['O','F'][1 + i % 2] AS l_linestatus,
             TIMESTAMP '1995-01-02' + INTERVAL (i % 1450) DAY
               AS l_shipdate
      FROM range(1, 80001) t(i)
    ) TO '{d}/lineitem.parquet' (FORMAT PARQUET)
    """)


def build_tiny_fixture(d: str, src: str = "/root/testdata/sf0.001") -> None:
    """ONE row per fact table: single-element corr/stddev/percent_rank/
    median/ntile and single-group windows are where engines' degenerate
    conventions (NULL vs NaN vs 0) diverge."""
    for t in SIDE_TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{d}/{t}.parquet")
    duckdb.sql(f"""
    COPY (SELECT CAST(1 AS BIGINT) AS c_custkey, 'only-cust' AS c_name,
                 CAST(1 AS INTEGER) AS c_nationkey,
                 CAST(100.0 AS DOUBLE) AS c_acctbal,
                 'BUILDING' AS c_mktsegment)
    TO '{d}/customer.parquet' (FORMAT PARQUET)""")
    duckdb.sql(f"""
    COPY (SELECT CAST(1 AS BIGINT) AS o_orderkey,
                 CAST(1 AS BIGINT) AS o_custkey, 'O' AS o_orderstatus,
                 CAST(100.0 AS DOUBLE) AS o_totalprice,
                 TIMESTAMP '1996-06-15' AS o_orderdate,
                 '1-URGENT' AS o_orderpriority)
    TO '{d}/orders.parquet' (FORMAT PARQUET)""")
    duckdb.sql(f"""
    COPY (SELECT CAST(1 AS BIGINT) AS l_orderkey,
                 CAST(1 AS BIGINT) AS l_partkey,
                 CAST(1 AS BIGINT) AS l_suppkey,
                 CAST(1 AS INTEGER) AS l_linenumber,
                 CAST(5.0 AS DOUBLE) AS l_quantity,
                 CAST(100.0 AS DOUBLE) AS l_extendedprice,
                 CAST(0.05 AS DOUBLE) AS l_discount,
                 CAST(0.02 AS DOUBLE) AS l_tax,
                 'N' AS l_returnflag, 'O' AS l_linestatus,
                 TIMESTAMP '1996-07-01' AS l_shipdate)
    TO '{d}/lineitem.parquet' (FORMAT PARQUET)""")


def build_fixture(
    d: str,
    src: str = "/root/testdata/sf0.001",
    with_nulls: bool = False,
    with_degenerate_dims: bool = False,
    with_nan_money: bool = False,
) -> None:
    """Write the adversarial customer/orders/lineitem into ``d``; copy the
    untouched side tables from ``src`` so multi-table queries still run.
    All doubles CAST explicitly (DuckDB VALUES literals infer DECIMAL,
    which diverges from the engine's double arithmetic).

    ``with_nulls`` appends rows carrying NULLs in the value columns
    (totalprice, orderdate, quantity, price, discount, tax, returnflag,
    shipdate, acctbal, mktsegment) -- dirty-lake reality the TPC-H spec
    forbids but a 100 TB ingest will serve. The divergence class this
    hunts: Spark's ASC window order defaults to NULLS FIRST while
    DuckDB's defaults to NULLS LAST, so any ranking/framing over a
    nullable key silently assigns different ranks."""
    for t in SIDE_TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{d}/{t}.parquet")
    if with_degenerate_dims:
        _build_degenerate_dims(d)  # overwrites the part/supplier copies

    cust_nulls = """,
        (7, 'cust-null-bal', 5, NULL, 'HOUSEHOLD'),
        (8, 'cust-null-seg', 6, 10.0, NULL)""" if with_nulls else ""
    ord_nulls = """,
        (110, 7, 'O', NULL, TIMESTAMP '1996-07-01', '2-HIGH'),
        (111, 8, 'O', 55.0, NULL, '3-MEDIUM')""" if with_nulls else ""
    li_nulls = """,
        (110, 7, 4, 1, NULL, 90.0, 0.05, 0.02, 'N', 'O', TIMESTAMP '1996-08-01'),
        (110, 8, 5, 2,  2.0, NULL, NULL, 0.00, 'N', 'O', TIMESTAMP '1996-08-01'),
        (111, 9, 6, 1,  1.0, 30.0, 0.00, NULL, NULL, 'O', NULL)""" if with_nulls else ""

    duckdb.sql(f"""
    COPY (
      SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
             CAST(c_nationkey AS INTEGER) AS c_nationkey,
             CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment
      FROM (VALUES
        (1, 'cust-no-orders', 1, 9999.0, 'BUILDING'),
        (2, 'cust-tie-a',     1,  100.0, 'BUILDING'),
        (3, 'cust-tie-b',     2,  100.0, 'BUILDING'),
        (4, 'cust-negative',  3,  -50.0, 'MACHINERY'),
        (5, '',               4,    0.0, ''),
        (6, 'cust-heavy',     0,  500.0, 'AUTOMOBILE'){cust_nulls}
      ) t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
    ) TO '{d}/customer.parquet' (FORMAT PARQUET)
    """)

    duckdb.sql(f"""
    COPY (
      SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
             CAST(o_custkey AS BIGINT) AS o_custkey, o_orderstatus,
             CAST(o_totalprice AS DOUBLE) AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM (VALUES
        (100, 2, 'O', 100.0, TIMESTAMP '1996-01-01', '1-URGENT'),
        (101, 3, 'O', 100.0, TIMESTAMP '1996-01-01', '1-URGENT'),
        (102, 6, 'F', 300.0, TIMESTAMP '1996-06-15', '2-HIGH'),
        (103, 6, 'F', 300.0, TIMESTAMP '1996-06-15', '2-HIGH'),
        (104, 6, 'O',   0.0, TIMESTAMP '1997-01-01', '3-MEDIUM'),
        (105, 4, 'P', 251.0, TIMESTAMP '1996-10-01', '5-LOW'),
        (106, 5, 'O', 250.0, TIMESTAMP '1997-12-31', '4-NOT SPECIFIED'),
        (107, 6, 'O',  42.0, TIMESTAMP '1995-12-31', '1-URGENT'),
        (108, 6, 'O',  42.0, TIMESTAMP '1998-01-01', '1-URGENT'),
        (109, 2, 'O',  77.0, TIMESTAMP '1996-03-03', ''){ord_nulls}
      ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
          o_orderdate, o_orderpriority)
    ) TO '{d}/orders.parquet' (FORMAT PARQUET)
    """)

    # orders 104 and 109 have NO lineitems; orderkey 999 does not exist
    duckdb.sql(f"""
    COPY (
      SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
             CAST(l_partkey AS BIGINT) AS l_partkey,
             CAST(l_suppkey AS BIGINT) AS l_suppkey,
             CAST(l_linenumber AS INTEGER) AS l_linenumber,
             CAST(l_quantity AS DOUBLE) AS l_quantity,
             CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
             CAST(l_discount AS DOUBLE) AS l_discount,
             CAST(l_tax AS DOUBLE) AS l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM (VALUES
        (999, 1, 1, 1,  5.0, 100.0, 0.00, 0.00, 'N', 'O', TIMESTAMP '1996-05-05'),
        (100, 1, 1, 1, 10.0,  50.0, 0.10, 0.05, 'N', 'O', TIMESTAMP '1996-02-01'),
        (100, 2, 2, 2, 10.0,  50.0, 0.10, 0.05, 'N', 'O', TIMESTAMP '1996-02-01'),
        (101, 1, 2, 1,  0.0,   0.0, 0.00, 0.00, 'R', 'F', TIMESTAMP '1996-02-01'),
        (102, 3, 3, 1,  1.0, 100.0, 1.00, 0.00, 'R', 'F', TIMESTAMP '1996-10-01'),
        (102, 3, 3, 2,  1.0, 100.0, 1.00, 0.00, 'R', 'F', TIMESTAMP '1996-10-01'),
        (103, 4, 1, 1,  2.0, 150.0, 0.05, 0.08, 'A', 'F', TIMESTAMP '1997-06-30'),
        (103, 4, 1, 2,  2.0, 150.0, 0.05, 0.08, 'A', 'F', TIMESTAMP '1997-06-30'),
        (105, 5, 2, 1,  3.0,  80.0, 0.02, 0.01, 'N', 'O', TIMESTAMP '1997-06-01'),
        (107, 6, 3, 1,  4.0,  60.0, 0.04, 0.03, 'N', 'O', TIMESTAMP '1995-12-31'),
        (108, 6, 3, 1,  4.0,  60.0, 0.04, 0.03, 'N', 'F', TIMESTAMP '1998-01-01'){li_nulls}
      ) t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
          l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
          l_shipdate)
    ) TO '{d}/lineitem.parquet' (FORMAT PARQUET)
    """)
    if with_nan_money:
        _append_nan_money(d)


def main() -> int:
    from iot_data_pipeline_spark.session import build_session
    from tests.oracle_harness import compare_query, duck_connection

    argv = sys.argv[1:]
    with_nulls = "--nulls" in argv or "--dims" in argv
    with_dims = "--dims" in argv
    with_skew = "--skew" in argv
    with_tiny = "--tiny" in argv
    names = [
        a for a in argv if a not in ("--nulls", "--dims", "--skew", "--tiny")
    ] or RELATIONAL_QUERIES
    d = tempfile.mkdtemp(prefix="degenerate_rel_")
    if with_skew:
        build_skew_fixture(d)
    elif with_tiny:
        build_tiny_fixture(d)
    else:
        build_fixture(d, with_nulls=with_nulls, with_degenerate_dims=with_dims)
    spark = build_session("degenerate-relational-sweep")
    con = duck_connection(d)
    failed = 0
    for name in names:
        try:
            problems = compare_query(spark, con, name, d)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {str(e)[:400]}"]
        status = "PASS" if not problems else "FAIL"
        if problems:
            failed += 1
        print(f"[{status}] {name}")
        for p in problems:
            print(f"    {p}")
    print(f"{len(names) - failed}/{len(names)} passed  (fixture: {d})")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
