"""Relational coverage queries over the TPC-H-ish tables.

Exercises the reference's SQL-job operator classes (SURVEY.md §2.3/2.4) on
the star schema: multi-way joins, semi/anti joins, broadcast dims, grouped
aggregation. Monetary math uses integer cents (fixed-point) — the reference
itself validates with fixed-point decimals (transform/invalid_values.py:27-44)
— which also makes Spark/DuckDB sums bit-identical regardless of
partition-order float addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col: str):
    return F.round(F.col(col) * 100).cast("long")


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation with pushed-down
    date filter; all money in integer cents."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    disc_pct = _cents("l_discount")  # discount in percent points (0..10)
    tax_pct = _cents("l_tax")
    price_c = _cents("l_extendedprice")
    qty = F.col("l_quantity").cast("long")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(price_c).alias("sum_base_price_c"),
            F.sum(price_c * (100 - disc_pct)).alias("sum_disc_price_e2"),
            F.sum(price_c * (100 - disc_pct) * (100 + tax_pct)).alias(
                "sum_charge_e4"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


O_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)           AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_base_price_c,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS sum_disc_price_e2,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
                * (100 + CAST(round(l_tax * 100) AS BIGINT)))
            AS BIGINT) AS sum_charge_e4,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (broadcast dim) + grouped revenue."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("revenue_e2"))
        .where(F.col("revenue_e2") > F.lit(200_000_0000))
    )


O_ORDER_REVENUE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_e2
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
HAVING sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)))
       > 2000000000
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (J8 LEFT JOIN ... IS NULL recast as left_anti)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1998-01-01")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(_cents("c_acctbal")).alias("sum_acctbal_c"),
        )
    )


O_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS sum_acctbal_c
FROM customer ANTI JOIN (
    SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
) o ON c_custkey = o.o_custkey
GROUP BY c_mktsegment
"""


def q_suppliers_of_shipped_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (P4 ssvid IN (subquery) recast as left_semi) + broadcast
    dim chain supplier -> nation -> region."""
    sup = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45)
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    return (
        sup.join(li, sup.s_suppkey == li.l_suppkey, "left_semi")
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("suppliers"))
    )


O_SUPPLIERS_OF_SHIPPED_PARTS = """
SELECT r_name, CAST(count(*) AS BIGINT) AS suppliers
FROM supplier
SEMI JOIN (SELECT l_suppkey FROM lineitem WHERE l_quantity >= 45) li
     ON s_suppkey = li.l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_left_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer + IFNULL coalesce (J9, segment_vessel_daily.sql.j2:153-159):
    every part with its max shipped quantity, 0 when never shipped."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").groupBy("l_partkey").agg(
        F.max(F.col("l_quantity").cast("long")).alias("max_qty")
    )
    return part.join(li, part.p_partkey == li.l_partkey, "left").select(
        "p_partkey",
        "p_brand",
        F.coalesce("max_qty", F.lit(0)).alias("max_qty"),
    )


O_LEFT_JOIN_COALESCE = """
SELECT p_partkey, p_brand,
       CAST(coalesce(max_qty, 0) AS BIGINT) AS max_qty
FROM part LEFT JOIN (
    SELECT l_partkey, max(CAST(l_quantity AS BIGINT)) AS max_qty
    FROM lineitem GROUP BY l_partkey
) li ON p_partkey = l_partkey
"""


def q_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 ROW_NUMBER rank-to-pick-1 (segment_info.sql.j2:77-88): latest
    order per customer with deterministic tiebreak."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus")
    )


O_TOP1_PER_GROUP = """
SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus
FROM (
    SELECT *, row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
    FROM orders
) WHERE rn = 1
"""


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "order_revenue": q_order_revenue,
    "customers_without_orders": q_customers_without_orders,
    "suppliers_of_shipped_parts": q_suppliers_of_shipped_parts,
    "left_join_coalesce": q_left_join_coalesce,
    "top1_per_group": q_top1_per_group,
}

ORACLES = {
    "pricing_summary": O_PRICING_SUMMARY,
    "order_revenue": O_ORDER_REVENUE,
    "customers_without_orders": O_CUSTOMERS_WITHOUT_ORDERS,
    "suppliers_of_shipped_parts": O_SUPPLIERS_OF_SHIPPED_PARTS,
    "left_join_coalesce": O_LEFT_JOIN_COALESCE,
    "top1_per_group": O_TOP1_PER_GROUP,
}
