"""Subquery & decorrelation queries (TPC-H Q4/Q5/Q14/Q15/Q17/Q22 shapes).

The reference has no joins or subqueries (SURVEY §2.5 — verified absence),
but the north-star capability bar requires the full relational surface.
These six cover the subquery patterns Catalyst must decorrelate:

- EXISTS / NOT EXISTS predicate subqueries → RewritePredicateSubquery
  turns them into left-semi / left-anti joins;
- correlated scalar aggregate subqueries → decorrelated into an
  aggregate-then-join;
- uncorrelated scalar subqueries (global avg / max) → one-row broadcast.

Half are written against `spark.sql` so Catalyst itself performs the
rewrite; half are hand-decorrelated DataFrame plans that make the
100 TB join strategy explicit (brand-filtered broadcast before the
per-key aggregate, dimension broadcasts on the multi-join). Both forms
compile to the same physical shapes; keeping both documents the
equivalence and pins it with the DuckDB oracle.

Scale notes (100 TB):
- Q17 shape: the correlated avg is computed ONLY over lineitems of the
  brand-filtered parts (broadcast semi-filter first), not the full
  table — at scale this is the difference between shuffling 100 TB
  and shuffling ~0.1% of it.
- Q5 shape: nation/region/supplier are broadcast; the only shuffles
  are lineitem⋈orders⋈customer on their natural keys, and AQE
  handles the post-filter size collapse.
- EXISTS semi-joins never materialize the probe side's payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_tables, read_table
from . import QuerySpec

# Spark's o_orderdate / l_shipdate read as TIMESTAMP_NTZ (Spark 4 parquet
# inference); literals must be NTZ on the Spark side, plain TIMESTAMP in
# DuckDB. Session TZ is pinned UTC either way.
def _ntz(lit: str):
    return F.to_timestamp_ntz(F.lit(lit))


def q_exists_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape — EXISTS predicate subquery, hand-decorrelated: left-semi
    join on (orderkey, shipdate > orderdate). The semi join carries no
    lineitem payload and duplicates no orders rows."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate)
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORACLE_EXISTS_ORDERS = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


def q_avg_qty_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape — correlated scalar-aggregate subquery, hand-decorrelated.

    avg(l_quantity) per part is computed only for the brand's parts:
    broadcast the filtered part keys, semi-restrict lineitem, THEN
    aggregate — the per-key avg join input is ~|brand| of the data.
    """
    part_b = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_b = li.join(F.broadcast(part_b), li.l_partkey == part_b.p_partkey).drop(
        "p_partkey"
    )
    thresholds = li_b.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("qty_threshold")
    )
    return (
        li_b.join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


ORACLE_AVG_QTY = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.5 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


SPARK_TOP_SUPPLIER = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01'
    AND l_shipdate <  TIMESTAMP_NTZ '1997-01-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape — uncorrelated scalar subquery (max over an aggregate
    CTE) via spark.sql: Catalyst plans the one-row max as a subquery
    broadcast, and the revenue CTE is computed once (reused subtree)."""
    load_tables(spark, sf_dir, ("supplier", "lineitem"))
    return spark.sql(SPARK_TOP_SUPPLIER)


ORACLE_TOP_SUPPLIER = SPARK_TOP_SUPPLIER.replace("TIMESTAMP_NTZ", "TIMESTAMP")


SPARK_INACTIVE_CUSTOMERS = """
SELECT c_mktsegment, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP_NTZ '2000-01-01')
GROUP BY c_mktsegment
"""


def q_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape — scalar subquery threshold + correlated NOT EXISTS via
    spark.sql: RewritePredicateSubquery emits a left-anti join on
    (custkey, date-filtered orders); the global avg is a one-row
    broadcast, not a per-row recompute."""
    load_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(SPARK_INACTIVE_CUSTOMERS)


ORACLE_INACTIVE_CUSTOMERS = SPARK_INACTIVE_CUSTOMERS.replace(
    "TIMESTAMP_NTZ", "TIMESTAMP"
)


def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape — six-table join with the customer-nation = supplier-nation
    equality. DataFrame form with explicit broadcasts for every
    dimension; the fact-side shuffles are lineitem⋈orders (orderkey)
    and ⋈customer (custkey) only."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = (
        read_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ntz("1996-01-01"))
            & (F.col("o_orderdate") < _ntz("1998-01-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


ORACLE_NATION_VOLUME = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape — conditional aggregate ratio over a broadcast dim join;
    one shuffle-free partial+final aggregate after the scan filter."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ntz("1997-01-01"))
            & (F.col("l_shipdate") < _ntz("1997-07-01"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                4,
            ).alias("promo_pct")
        )
    )


ORACLE_PROMO_REVENUE = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
        / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1997-07-01'
"""


QUERIES: dict[str, QuerySpec] = {
    "sub_exists_orders": QuerySpec(
        q_exists_orders,
        ORACLE_EXISTS_ORDERS,
        "Q4 shape: EXISTS → left-semi with non-equi condition",
    ),
    "sub_avg_qty_threshold": QuerySpec(
        q_avg_qty_threshold,
        ORACLE_AVG_QTY,
        "Q17 shape: correlated scalar avg, brand-broadcast decorrelation",
    ),
    "sub_top_supplier": QuerySpec(
        q_top_supplier,
        ORACLE_TOP_SUPPLIER,
        "Q15 shape: scalar max subquery over aggregate CTE (spark.sql)",
    ),
    "sub_inactive_customers": QuerySpec(
        q_inactive_customers,
        ORACLE_INACTIVE_CUSTOMERS,
        "Q22 shape: scalar threshold + NOT EXISTS anti-join (spark.sql)",
    ),
    "join_nation_volume": QuerySpec(
        q_nation_volume,
        ORACLE_NATION_VOLUME,
        "Q5 shape: 6-table join, broadcast dims, two-key supplier join",
    ),
    "sub_promo_revenue": QuerySpec(
        q_promo_revenue,
        ORACLE_PROMO_REVENUE,
        "Q14 shape: conditional aggregate ratio",
    ),
}
