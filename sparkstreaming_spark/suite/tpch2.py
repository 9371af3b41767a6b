"""Remaining TPC-H query shapes (Q2/Q6-Q13/Q16/Q18-Q21), adapted to the
driver's reduced schema (no partsupp, no commit/receipt dates, no
shipmode — see TESTDATA.md).

The reference engine has no relational surface beyond single-table KPI
aggregates (SURVEY §2.4-2.5); together with `tpch.py` this module
completes the full 22-shape TPC-H relational surface as the capability
bar. Adaptations where the schema lacks a column:

- partsupp-based shapes (Q2/Q11/Q16/Q20) use lineitem as the
  part↔supplier association: unit cost = min(l_extendedprice /
  l_quantity) per (part, supplier); "stock value" = sum(price × qty).
- Q4/Q12/Q21 date-lag predicates use l_shipdate vs o_orderdate.
- Q12's shipmode becomes l_linestatus; Q19's container becomes p_size
  ranges.

Execution-strategy notes (100 TB):
- Dimension tables (part-filtered, supplier, nation, region) are
  explicitly broadcast in the DataFrame forms; the only shuffles left
  are the fact-fact joins/aggregates on their natural keys.
- Q13 is the two-level aggregate: the first groupBy(c_custkey) is the
  big shuffle; the second (on the count) is tiny — Spark's partial
  aggregation makes the second stage near-free.
- Q18's IN-over-HAVING is a semi join against an aggregated, heavily
  filtered key set — at scale AQE collapses it to a broadcast semi.
- Q19's OR-of-ANDs stays a single scan: the disjunction references
  only scan columns + the broadcast part row, so Catalyst keeps it in
  one WholeStageCodegen filter (no union-of-three-scans blowup).
- Q21 is the decorrelation stress test: two correlated self-"joins" on
  lineitem(orderkey) become one re-shuffled aggregate join, not two
  extra scans of a 100 TB table per row.

spark.sql is used for the subquery-bearing shapes (Catalyst performs
the decorrelation); DataFrame forms are used where the join strategy
should be explicit. Both halves pin to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_tables, read_table
from . import QuerySpec


def _ntz(lit: str):
    return F.to_timestamp_ntz(F.lit(lit))


def _sql(spark: SparkSession, sf_dir: str, tables: tuple[str, ...], sql: str) -> DataFrame:
    load_tables(spark, sf_dir, tables)
    return spark.sql(sql)


# --- Q6: forecast revenue (pure scan filter + global agg; no join) ----------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 — all three predicates must reach the parquet scan as
    PushedFilters; the aggregate is one partial+final pass, zero joins,
    zero shuffles beyond the 1-row final combine."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ntz("1997-01-01"))
            & (F.col("l_shipdate") < _ntz("1998-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


ORACLE_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --- Q7: volume shipping between two nations --------------------------------

SPARK_Q7 = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP_NTZ '1996-01-01'
    AND l_shipdate <  TIMESTAMP_NTZ '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 — nation-pair disjunction over a 4-fact join; nation broadcasts
    land pre-shuffle so the pair filter prunes before the big joins."""
    return _sql(
        spark, sf_dir,
        ("supplier", "lineitem", "orders", "customer", "nation"),
        SPARK_Q7,
    )


ORACLE_Q7 = SPARK_Q7.replace("TIMESTAMP_NTZ", "TIMESTAMP")


# --- Q8: market share of one nation within a region's customers -------------

SPARK_Q8 = """
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
    AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 — conditional-share aggregate over an 8-table join; the two
    nation roles (customer region gate, supplier attribution) are
    separate broadcast joins of the same dimension."""
    return _sql(
        spark, sf_dir,
        ("part", "supplier", "lineitem", "orders", "customer", "nation", "region"),
        SPARK_Q8,
    )


ORACLE_Q8 = SPARK_Q8


# --- Q9: product-type profit by nation and year -----------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape — profit per (nation, year). No partsupp: cost is proxied
    as 0.6 × p_retailprice × l_quantity. part is name-filtered then
    broadcast; supplier→nation broadcast; the only shuffle joins are
    lineitem⋈orders and the final group."""
    p = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


ORACLE_Q9 = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity), 2) AS sum_profit
FROM lineitem, part, supplier, orders, nation
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
  AND p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""


# --- Q10: returned-item revenue, top 20 customers ---------------------------

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 — quarter-windowed revenue of returned lineitems per customer,
    top 20. Deterministic tie-break: (rounded revenue desc, c_custkey)."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    o = (
        read_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ntz("1997-01-01"))
            & (F.col("o_orderdate") < _ntz("1997-04-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


ORACLE_Q10 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem, orders, customer, nation
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- Q12: priority counts by line status (shipmode adapted) -----------------

def q12_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape — conditional counts after a fact-fact join. The CASE
    folds into codegen (no UDF); sum-of-flag stays a long."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ntz("1997-01-01"))
            & (F.col("l_shipdate") < _ntz("1998-01-01"))
        )
        .select("l_orderkey", "l_linestatus")
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
    )


ORACLE_Q12 = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem, orders
WHERE l_orderkey = o_orderkey
  AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


# --- Q13: customer order-count distribution ---------------------------------

def q13_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 — two-level aggregate: per-customer order count (outer join
    keeps zero-order customers), then the histogram of counts. The first
    groupBy is the real shuffle; the second is tiny after partial agg."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .select("o_orderkey", "o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


ORACLE_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


# --- Q19: disjunctive predicate pushdown ------------------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 — OR-of-ANDs spanning both join sides. Stays one broadcast
    join + one codegen filter; Catalyst also extracts the common
    l_quantity <= 30 / p_size >= 1 conjuncts for scan pushdown."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


ORACLE_Q19 = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 20 AND 30))
"""


# --- Q18: large-volume orders (IN over grouped HAVING) ----------------------

SPARK_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(sum(l_quantity), 2) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 — IN over an aggregated HAVING key set → left-semi against a
    tiny post-aggregate side; AQE turns it into a broadcast semi."""
    return _sql(spark, sf_dir, ("customer", "orders", "lineitem"), SPARK_Q18)


ORACLE_Q18 = SPARK_Q18


# --- Q21: waiting-supplier decorrelation stress (EXISTS + NOT EXISTS) -------

SPARK_Q21 = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
  AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
GROUP BY s_name
"""


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape — the last supplier to ship in multi-supplier orders
    (shipdate stands in for the missing receipt/commit dates). Two
    correlated self-subqueries on lineitem(orderkey): Catalyst plans a
    left-semi and a left-anti join co-shuffled on l_orderkey instead of
    rescanning lineitem per row."""
    return _sql(
        spark, sf_dir, ("supplier", "lineitem", "orders", "nation"), SPARK_Q21
    )


ORACLE_Q21 = SPARK_Q21


# --- Q2: min-cost supplier per part (partsupp adapted) ----------------------

SPARK_Q2 = """
WITH cost AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, round(unit_cost, 4) AS supply_cost
FROM part, supplier, cost, nation, region
WHERE p_partkey = cost.l_partkey AND s_suppkey = cost.l_suppkey
  AND p_size <= 10 AND p_type = 'LARGE'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND unit_cost = (SELECT min(c2.unit_cost)
                   FROM cost c2, supplier s2, nation n2, region r2
                   WHERE p_partkey = c2.l_partkey
                     AND s2.s_suppkey = c2.l_suppkey
                     AND s2.s_nationkey = n2.n_nationkey
                     AND n2.n_regionkey = r2.r_regionkey
                     AND r2.r_name = 'EUROPE')
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape — correlated scalar min over a derived part↔supplier cost
    table (lineitem stands in for partsupp). The CTE is computed once;
    the correlated min decorrelates into an aggregate re-joined on
    partkey. Exact-double equality is safe: both engines compute the
    identical division and an order-insensitive exact min."""
    return _sql(
        spark, sf_dir,
        ("lineitem", "part", "supplier", "nation", "region"),
        SPARK_Q2,
    )


ORACLE_Q2 = SPARK_Q2


# --- Q11: important stock value (partsupp adapted; HAVING vs global) --------

SPARK_Q11 = """
SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS part_value
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_0'
GROUP BY l_partkey
HAVING sum(l_extendedprice * l_quantity) >
       (SELECT sum(l_extendedprice * l_quantity) * 0.005
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_0')
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape — group HAVING against an uncorrelated global scalar:
    the threshold subquery is one broadcast row, and Spark reuses the
    nation-filtered join subtree for both branches (ReuseExchange)."""
    return _sql(spark, sf_dir, ("lineitem", "supplier", "nation"), SPARK_Q11)


ORACLE_Q11 = SPARK_Q11


# --- Q16: supplier count by part attributes (NOT IN) ------------------------

SPARK_Q16 = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
"""


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape — distinct-count with a NOT IN exclusion subquery
    (null-aware anti join against the bad-supplier set; the set is tiny
    so it broadcasts). lineitem stands in for partsupp."""
    return _sql(spark, sf_dir, ("lineitem", "part", "supplier"), SPARK_Q16)


ORACLE_Q16 = SPARK_Q16


# --- Q20: suppliers with excess shipped volume (nested IN) ------------------

SPARK_Q20 = """
SELECT s_name, s_suppkey
FROM supplier, nation
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem, part
    WHERE l_partkey = p_partkey AND p_name LIKE '%blue%'
      AND l_shipdate >= TIMESTAMP_NTZ '1997-01-01'
      AND l_shipdate <  TIMESTAMP_NTZ '1998-01-01'
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > 250)
  AND s_nationkey = n_nationkey
  AND n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
"""


def q20_excess_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape — IN over a filtered-join-aggregate-HAVING pipeline:
    the inner side collapses to ≤|suppliers| rows before the semi join,
    so the outer probe is a broadcast left-semi at any scale."""
    return _sql(spark, sf_dir, ("supplier", "nation", "lineitem", "part"), SPARK_Q20)


ORACLE_Q20 = SPARK_Q20.replace("TIMESTAMP_NTZ", "TIMESTAMP")


QUERIES: dict[str, QuerySpec] = {
    "tpch_q6_forecast_revenue": QuerySpec(
        q6_forecast_revenue, ORACLE_Q6,
        "Q6: scan-filter + global agg, full predicate pushdown, no join",
    ),
    "tpch_q7_volume_shipping": QuerySpec(
        q7_volume_shipping, ORACLE_Q7,
        "Q7: nation-pair disjunction over 4-fact join, year extract group",
    ),
    "tpch_q8_market_share": QuerySpec(
        q8_market_share, ORACLE_Q8,
        "Q8: conditional share over 8-table join, dual nation roles",
    ),
    "tpch_q9_product_profit": QuerySpec(
        q9_product_profit, ORACLE_Q9,
        "Q9 shape: profit by nation-year, retailprice cost proxy",
    ),
    "tpch_q10_returned_items": QuerySpec(
        q10_returned_items, ORACLE_Q10,
        "Q10: top-20 customers by returned revenue, deterministic tiebreak",
    ),
    "tpch_q12_priority_counts": QuerySpec(
        q12_priority_counts, ORACLE_Q12,
        "Q12 shape: conditional counts post-join (linestatus adapted)",
    ),
    "tpch_q13_count_distribution": QuerySpec(
        q13_count_distribution, ORACLE_Q13,
        "Q13: two-level aggregate (outer-join count, then histogram)",
    ),
    "tpch_q19_disjunctive_revenue": QuerySpec(
        q19_disjunctive_revenue, ORACLE_Q19,
        "Q19: OR-of-ANDs disjunctive predicate, single scan + broadcast",
    ),
    "tpch_q18_large_orders": QuerySpec(
        q18_large_orders, ORACLE_Q18,
        "Q18: IN over grouped-HAVING key set → broadcast semi",
    ),
    "tpch_q21_waiting_supplier": QuerySpec(
        q21_waiting_supplier, ORACLE_Q21,
        "Q21 shape: EXISTS + NOT EXISTS correlated self-subqueries",
    ),
    "tpch_q2_min_cost_supplier": QuerySpec(
        q2_min_cost_supplier, ORACLE_Q2,
        "Q2 shape: correlated scalar min over derived cost (partsupp adapted)",
    ),
    "tpch_q11_important_stock": QuerySpec(
        q11_important_stock, ORACLE_Q11,
        "Q11 shape: HAVING vs uncorrelated global scalar threshold",
    ),
    "tpch_q16_supplier_count": QuerySpec(
        q16_supplier_count, ORACLE_Q16,
        "Q16 shape: distinct-count + NOT IN null-aware anti join",
    ),
    "tpch_q20_excess_volume": QuerySpec(
        q20_excess_volume, ORACLE_Q20,
        "Q20 shape: nested IN over filtered aggregate HAVING",
    ),
}
