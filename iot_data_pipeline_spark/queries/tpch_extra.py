"""q76-q82: remaining classic TPC-H query shapes, adapted to the driver
star schema (SURVEY.md section 2.2 B10-B22 coverage widening).

The reference computes none of these (its engine is the ~110-LoC per-record
loop, reference app/app.py:33-65); they exist because the north-star mandate
is "batch aggregations" breadth and each shape stresses a distinct Catalyst
path: correlated EXISTS with an inequality (Q4), agg-of-agg (Q13),
conditional aggregation over a join (Q14), disjunctive pushdown (Q19),
scalar subquery + anti join (Q22), having-max via window (Q15), and a
correlated per-key average (Q17).

Scale notes: every query here shuffles only on its natural keys.
Broadcast discipline (the q181 lesson): only nation/region are
force-broadcast -- they are CONSTANT-size (25/5 rows at every SF).
`part`, `supplier`, `customer` all grow linearly with SF (SF x 200k/10k/
150k rows -- billions at the 100 TB design point), so their joins carry
no hint: Catalyst's size estimate elects a broadcast while they fit the
threshold and AQE re-elects at runtime, but nothing pins a plan that
OOMs at scale. Lineitem-side predicates are plain column comparisons,
so they push to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iot_data_pipeline_spark.queries.base import ORACLE_FINITE, fmt_ts, finite_or_null
from iot_data_pipeline_spark.queries.registry import declared
from iot_data_pipeline_spark.sources.readers import read_table


@declared(
    "q76_priority_exists",
    oracle="""
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
)
def q76_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: date-sliced orders that have at least one lineitem
    shipped after the order date (correlated EXISTS with an inequality
    conjunct -> left-semi join with a mixed equi + theta condition).

    Catalyst plans the semi join as a shuffled hash/sort-merge on
    l_orderkey with the inequality as a join residual -- linear, not a
    nested loop; the date slice prunes the orders scan first.
    """
    orders = read_table(
        spark,
        sf_dir,
        "orders",
        bounds={"o_orderdate": ("1996-01-01", "1996-07-01")},
    )
    lineitem = read_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            lineitem,
            (orders.o_orderkey == lineitem.l_orderkey)
            & (lineitem.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@declared(
    "q77_customer_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    ) per_cust
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
)
def q77_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation (orders per customer, then
    customers per order-count), keeping zero-order customers via the
    left outer join.

    The second groupBy re-shuffles on a low-cardinality key (order
    count); partial aggregation collapses it to a few rows per task
    before the exchange, so the second shuffle is tiny at any SF.
    """
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


@declared(
    "q78_promo_revenue",
    oracle=f"""
    SELECT strftime(date_trunc('month', l.l_shipdate), '%Y-%m-%d %H:%M:%S')
             AS ship_month,
           ROUND(CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                          THEN {ORACLE_FINITE.format('l.l_extendedprice * (1 - l.l_discount)')}
                          ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE), 2)
             AS promo_revenue,
           ROUND(CAST(SUM(CAST({ORACLE_FINITE.format('l.l_extendedprice * (1 - l.l_discount)')}
                          AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def q78_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (promo vs total revenue)
    over the lineitem-part join, bucketed by ship month.

    `part` joins without a hint (it grows with SF; the planner elects a
    broadcast while it fits, nothing pins it at scale); the CASE folds
    into the aggregate so one pass computes both sums.

    Exact DECIMAL summation (the q164 rule): the round-8 multi-file
    layout sweep caught this query's plain double SUM flipping a cent
    when the lineitem table is split across part files -- file-boundary
    partials merge in a different order than the single-file scan, the
    same hazard class partition-count perturbation probes. Month groups
    are the largest aggregation groups in the registry (~10k rows each
    at sf0.1), so this query sits closest to the ulp/rounding boundary.
    Non-finite money has no DECIMAL representation -> NULL measurement
    both sides (finite_or_null, round-7 posture)."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    rev = finite_or_null(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy(
            fmt_ts(F.date_trunc("month", F.col("l_shipdate"))).alias("ship_month")
        )
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("p_type") == "PROMO", rev)
                    .otherwise(F.lit(0.0))
                    .cast("decimal(18,6)")
                ).cast("double"),
                2,
            ).alias("promo_revenue"),
            F.round(
                F.sum(rev.cast("decimal(18,6)")).cast("double"), 2
            ).alias("total_revenue"),
        )
        .orderBy("ship_month")
    )


@declared(
    "q79_disjunctive_filter",
    oracle="""
    SELECT p.p_brand,
           COUNT(*) AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def q79_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.

    Catalyst derives the implied single-side filters (brand IN (...),
    quantity BETWEEN overall bounds) and pushes them below the join, so
    the scans shrink before the broadcast join evaluates the residual
    disjunction. On a DECIMAL-written corpus the derived quantity
    envelope sits above the read-boundary double cast and loses
    PushedFilters, so the envelope [1, 40] -- implied by the disjunction,
    therefore a no-op on results -- is ALSO declared explicitly via
    ``bounds`` in the source domain (round-10 sweep,
    tools/pushdown_sweep.py); p_size/p_brand keep their native types on
    every layout and push as derived.
    """
    lineitem = read_table(
        spark, sf_dir, "lineitem",
        bounds={"l_quantity": ((">=", 1.0), ("<=", 40.0))},
    )
    part = read_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    brand = F.col("p_brand")
    cond = (
        ((brand == "Brand#12") & size.between(1, 15) & (qty >= 1) & (qty <= 21))
        | ((brand == "Brand#23") & size.between(1, 30) & (qty >= 10) & (qty <= 30))
        | ((brand == "Brand#34") & size.between(1, 50) & (qty >= 20) & (qty <= 40))
    )
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .filter(cond)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("p_brand")
    )


@declared(
    "q80_rich_idle_customers",
    oracle="""
    SELECT c.c_nationkey,
           COUNT(*) AS n_cust,
           ROUND(SUM(c.c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
)
def q80_rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no orders,
    grouped by nation (scalar subquery threshold + anti join + agg).

    The scalar average is a one-row broadcast; the anti join shuffles on
    custkey. Determinism: c_acctbal sums are order-sensitive only at
    ~1e-13 relative error, far below the > comparison's resolution on
    this data (balances are cents-valued).
    """
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    avg_bal = (
        # source-domain bound: pushes to the scan on a DECIMAL-money corpus
        read_table(
            spark, sf_dir, "customer",
            bounds={"c_acctbal": ((">", 0.0),)},
        )
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


@declared(
    "q81_top_suppliers",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    ORDER BY r.total_rev DESC, s.s_suppkey
    LIMIT 5
    """,
)
def q81_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue per supplier, top suppliers. The classic
    formulation's `= (SELECT MAX(...))` float equality is replaced by a
    deterministic top-k over the ROUNDED revenue with suppkey
    tie-breaks (SURVEY.md section 2.3 rule 1/2).

    The agg shuffles lineitem once on l_suppkey; the supplier join is a
    broadcast; top-k plans as TakeOrderedAndProject (no global sort).
    """
    lineitem = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    rev = (
        lineitem.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_rev")
        )
    )
    return (
        rev.join(supplier, rev.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy(F.desc("total_rev"), "s_suppkey")
        .limit(5)
    )


@declared(
    "q82_small_quantity_parts",
    oracle="""
    SELECT p.p_brand,
           COUNT(*) AS n_small,
           ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, AVG(l_quantity) AS avg_qty
          FROM lineitem GROUP BY l_partkey) pa
      ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.5 * pa.avg_qty
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def q82_small_quantity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems whose quantity is below half the
    per-part average (correlated scalar average, decorrelated into a
    self-join aggregate on both sides).

    Determinism: l_quantity is integer-valued (1..50) so per-part sums
    are EXACT in double regardless of summation order -> AVG is
    bit-identical across engines and the `<` comparison cannot flip.
    Scale: one shuffle on l_partkey serves both the average and the
    join back; part joins unhinted (planner-elected broadcast while it
    fits; part grows with SF).
    """
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    per_part = lineitem.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    pa = per_part.withColumnRenamed("l_partkey", "pa_partkey")
    return (
        lineitem.join(pa, lineitem.l_partkey == pa.pa_partkey)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        )
        .orderBy("p_brand")
    )


@declared(
    "q83_lateral_topn",
    oracle="""
    SELECT n.n_name, t.c_custkey, t.c_acctbal
    FROM nation n,
         LATERAL (SELECT c.c_custkey, c.c_acctbal
                  FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey
                  ORDER BY c.c_acctbal DESC, c.c_custkey
                  LIMIT 2) t
    ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey
    """,
)
def q83_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-N as a LATERAL correlated subquery (SQL entry; the
    DataFrame twin is the row_number window, asserted equivalent in
    tests/test_sql_entry).

    At scale the window form wins (one shuffle on the partition key, no
    per-outer-row re-evaluation), so the window IS the implementation;
    the lateral text documents the SQL surface both engines accept.
    """
    nation = read_table(spark, sf_dir, "nation")
    customer = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    top2 = (
        customer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .drop("rn")
    )
    return (
        top2.join(F.broadcast(nation), top2.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey", "c_acctbal")
        .orderBy("n_name", F.desc("c_acctbal"), "c_custkey")
    )


@declared(
    "q101_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_0' AND n2.n_name = 'NATION_1')
          OR (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_0'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q101_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue between a nation pair, both directions, by
    ship year. Two nation joins with different roles (supplier side vs
    customer side) plus a disjunctive pair filter -- the nation dims
    broadcast, the pair predicate survives as a join residual, and the
    date slice pushes to the lineitem scan."""
    li = read_table(
        spark,
        sf_dir,
        "lineitem",
        bounds={"l_shipdate": ("1996-01-01", "1998-01-01")},
    )
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_0") & (F.col("cust_nation") == "NATION_1")
    ) | ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_0"))
    return (
        li.join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@declared(
    "q102_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year ORDER BY o_year
    """,
)
def q102_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue sold into
    EUROPE customers, per order year -- conditional-sum over a 7-table
    star join. nation/region force-broadcast (constant-size);
    part/supplier/customer join unhinted -- the planner broadcasts them
    while they fit and shuffle-joins at SFs where they no longer do."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(
        spark,
        sf_dir,
        "orders",
        bounds={"o_orderdate": ("1996-01-01", "1998-01-01")},
    )
    part = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = read_table(spark, sf_dir, "supplier")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_2", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@declared(
    "q103_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q103_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue from returned
    items in one quarter. The returnflag and date predicates push into
    the two fact scans; the top-20 is a TakeOrderedAndProject, never a
    global sort."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(
        spark,
        sf_dir,
        "orders",
        bounds={"o_orderdate": ("1996-10-01", "1997-01-01")},
    )
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = read_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@declared(
    "q104_shipping_lateness",
    oracle="""
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90 THEN 'late'
                WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 30 THEN 'slow'
                ELSE 'fast' END AS delay_bucket,
           COUNT(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS n_high_priority,
           COUNT(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS n_low_priority
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1 ORDER BY 1
    """,
)
def q104_shipping_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: the synthetic lineitem has no
    shipmode/commitdate, so the buckets come from orderdate->shipdate
    delay): high- vs low-priority line counts per delay bucket --
    conditional counts over a fact-fact join, one shuffle on orderkey."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.when(delay > 90, "late")
            .when(delay > 30, "slow")
            .otherwise("fast")
            .alias("delay_bucket")
        )
        .agg(
            F.count_if(high).alias("n_high_priority"),
            F.count_if(~high).alias("n_low_priority"),
        )
        .orderBy("delay_bucket")
    )


@declared(
    "q105_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name LIMIT 20
    """,
)
def q105_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted to shipdate-vs-orderdate lateness): line
    items shipped >60 days after order placement, in multi-supplier
    orders where NO other supplier was also late -- the sole-blocker.
    EXISTS + NOT EXISTS chain = left-semi then left-anti join, both on
    l_orderkey with a supplier-inequality residual; the late set is
    computed once and reused for the anti side."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    supp = read_table(spark, sf_dir, "supplier")
    late = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    ).localCheckpoint(eager=True)  # feeds l1, the semi probe, and the anti probe
    # No .distinct() on either probe side (round-15): semi/anti join
    # results are duplicate-insensitive by definition, and the distinct
    # hashed on (l_orderkey, l_suppkey) while the joins partition on
    # l_orderkey alone -- so each distinct was a full extra exchange
    # that bought nothing (measured 1.7s -> 1.4s, results identical).
    others = li.select("l_orderkey", "l_suppkey")
    with_other = late.alias("l1").join(
        others.alias("l2"),
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    sole_late = with_other.alias("l1").join(
        late.alias("l3"),
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        sole_late.join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@declared(
    "q107_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q107_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-aggregate with three conjunctive range
    predicates and no join or grouping -- the canonical predicate-pushdown
    probe (SURVEY.md B8/B17).

    Every predicate is a plain column-vs-literal comparison; all three go
    through ``read_table(bounds=...)`` so they compare against the RAW
    scan columns below the read-boundary normalization and reach the
    parquet reader as PushedFilters on EVERY physical layout (date and
    money columns alike -- on a DECIMAL-written corpus a post-read filter
    would sit above the cast and lose row-group pruning); what survives
    is a single partial+final agg with no shuffle beyond the final
    single-row exchange. At 100 TB this is the shape that most rewards
    date partitioning of the fact table (partition pruning replaces the
    row-group skip). Plan-pinned over the hostile layouts in
    tests/test_plan_shapes.py."""
    li = read_table(
        spark,
        sf_dir,
        "lineitem",
        bounds={
            "l_shipdate": ("1996-01-01", "1997-01-01"),
            "l_discount": ((">=", 0.03), ("<=", 0.07)),
            "l_quantity": (("<", 24),),
        },
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


@declared(
    "q108_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q108_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp table in the driver schema, so profit is
    revenue-only): per supplier-nation x order-year profit on parts whose
    name matches a pattern.

    Join strategy at scale: `part` is filtered by the LIKE first and
    broadcast -- the filter is not sargable for parquet stats but cuts the
    build side before the exchange; `supplier`+`nation` fold into one
    broadcast dim; the only big-big join is lineitem><orders on orderkey
    (shuffle on the natural key). Grouping key (nation, year) is
    low-cardinality, so partial aggregation collapses almost everything
    map-side. Profit is summed as exact DECIMAL (the q72 idiom): at
    sf0.01 a double SUM here lands a group on a half-cent rounding
    boundary where partial-agg order flips the last ulp -- decimals are
    order-independent, so the result is stable at any partitioning."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders")
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            supp.join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
            )
            .cast("double")
            .alias("profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


@declared(
    "q111_dominant_suppliers",
    oracle="""
    WITH part_supp AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    part_tot AS (
      SELECT l_partkey, SUM(qty) AS tot FROM part_supp GROUP BY l_partkey
    )
    SELECT s.s_name, COUNT(*) AS n_dominant_parts
    FROM part_supp ps
    JOIN part_tot pt ON pt.l_partkey = ps.l_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE ps.qty > 0.5 * pt.tot
    GROUP BY s.s_name
    ORDER BY n_dominant_parts DESC, s.s_name
    """,
)
def q111_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: the driver schema has no partsupp, so the
    'available quantity' threshold becomes a share-of-part threshold):
    suppliers who shipped more than half of a part's total 1996 quantity,
    counted per supplier.

    The aggregate-then-rejoin is expressed as one shuffle on l_partkey: a
    partial-sum window over the (l_partkey, l_suppkey) aggregate would
    re-shuffle, so instead the part totals reuse the part_supp frame --
    Catalyst plans groupBy(l_partkey) directly on the already
    partkey-clustered exchange output, and the threshold join is
    partkey-to-partkey on co-partitioned data (AQE keeps it a local
    shuffle-reuse at scale). Quantities are whole-number doubles, so the
    0.5*tot comparison is IEEE-exact in both engines."""
    li = read_table(
        spark,
        sf_dir,
        "lineitem",
        bounds={"l_shipdate": ("1996-01-01", "1997-01-01")},
    )
    part_supp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    part_tot = part_supp.groupBy("l_partkey").agg(F.sum("qty").alias("tot"))
    supp = read_table(spark, sf_dir, "supplier")
    return (
        part_supp.join(part_tot, "l_partkey")
        .filter(F.col("qty") > 0.5 * F.col("tot"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_dominant_parts"))
        .orderBy(F.desc("n_dominant_parts"), "s_name")
    )


@declared(
    "q125_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS supplycost
      FROM lineitem GROUP BY 1, 2
    ),
    eur AS (
      SELECT ps.l_partkey, ps.l_suppkey, ps.supplycost,
             s.s_name, s.s_acctbal, n.n_name,
             MIN(ps.supplycost) OVER (PARTITION BY ps.l_partkey) AS min_cost
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type,
           ROUND(e.supplycost, 4) AS min_supplycost
    FROM eur e JOIN part p ON p.p_partkey = e.l_partkey
    WHERE e.supplycost = e.min_cost AND p.p_size = 15
    ORDER BY e.s_acctbal DESC, e.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q125_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: the driver schema has no partsupp, so
    supply cost is the minimum observed unit price per (part, supplier)
    from lineitem): for size-15 parts, the EUROPE supplier(s) whose cost
    equals the per-part regional minimum, top 100 by account balance.

    The spec's correlated scalar-MIN subquery is decorrelated into a
    window MIN over l_partkey -- one shuffle on the part key instead of a
    re-join of the whole subquery, the classic distributed plan.
    nation/region force-broadcast (constant-size); supplier/part join
    unhinted (they grow with SF -- planner-elected broadcast while they
    fit, shuffle join beyond). The equality
    compares the identical IEEE division both engines computed, so it is
    exact. (s_name, p_partkey) is unique per surviving row, making the
    LIMIT cutoff a total order.
    """
    li = read_table(spark, sf_dir, "lineitem")
    # try_divide, not /: a zero-quantity line (routine dirty data) has no
    # unit price. DuckDB's double division yields NULL there and its MIN
    # skips it; Spark's ANSI `/` raises DIVIDE_BY_ZERO. try_divide gives
    # the same NULL-and-skip semantics without touching the oracle.
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.try_divide(F.col("l_extendedprice"), F.col("l_quantity"))
        ).alias("supplycost")
    )
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    eur = (
        ps.join(supp, ps.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn(
            "min_cost", F.min("supplycost").over(Window.partitionBy("l_partkey"))
        )
        .filter(F.col("supplycost") == F.col("min_cost"))
    )
    return (
        eur.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round("supplycost", 4).alias("min_supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


@declared(
    "q126_important_parts",
    oracle="""
    WITH nat AS (
      SELECT l.l_partkey, CAST(l.l_extendedprice AS DECIMAL(18,2)) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
    ),
    tot AS (SELECT SUM(val) * CAST(0.001 AS DECIMAL(4,3)) AS threshold FROM nat)
    SELECT l_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
    FROM nat, tot
    GROUP BY l_partkey, tot.threshold
    HAVING SUM(val) > tot.threshold
    ORDER BY part_value DESC, l_partkey
    """,
)
def q126_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted to the lineitem-derived part-supplier
    relation): parts whose shipped value from NATION_7's suppliers
    exceeds 0.1% of that nation's total -- a grouped aggregate gated by a
    global-scalar subquery.

    Sums run on DECIMAL(18,2), not DOUBLE: the HAVING compares a
    per-part sum against a global sum, and float summation order differs
    between engines, which could flip boundary parts; decimal arithmetic
    is exact and order-independent, so the gate is deterministic. The
    per-part aggregate is localCheckpointed so BOTH its consumers (the
    global total and the gated output) read the materialized frame -- the
    plan-shape test pins that lineitem is scanned exactly once.
    """
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    nat = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "l_partkey", F.col("l_extendedprice").cast("decimal(18,2)").alias("val")
        )
    )
    per_part = (
        nat.groupBy("l_partkey")
        .agg(F.sum("val").alias("part_val"))
        .localCheckpoint(eager=False)
    )
    threshold = per_part.agg(
        (F.sum("part_val") * F.expr("CAST(0.001 AS DECIMAL(4,3))")).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_val") > F.col("threshold"))
        .select(
            "l_partkey", F.col("part_val").cast("double").alias("part_value")
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@declared(
    "q127_supplier_part_counts",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    kept AS (
      SELECT p.p_brand, p.p_type, p.p_size, ps.l_suppkey
      FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
      WHERE p.p_brand <> 'Brand#5'
        AND p.p_type NOT LIKE 'ECO%'
        AND p.p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
        AND ps.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
    )
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM kept
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q127_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    over the observed part-supplier relation, excluding one brand, a type
    prefix, and a complained-about supplier list (NOT IN -> broadcast
    anti join).

    The DISTINCT pair projection collapses lineitem map-side before any
    join; part and the supplier blocklist join unhinted (both grow with
    SF -- planner-elected broadcast while they fit), so the only extra
    shuffle is the final count-distinct on the (brand, type, size) keys.
    """
    li = read_table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("ECO%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49))
    )
    bad_supp = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("%7")
    )
    return (
        ps.join(
            bad_supp,
            ps.l_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )
