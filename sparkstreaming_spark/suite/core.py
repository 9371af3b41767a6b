"""Core KPI-shaped aggregations — the reference's own query semantics
(SURVEY §2.4 A1-A8) re-targeted at the driver's star schema, plus the
flagship pricing-summary query.

All are single-shuffle hash aggregations: Spark plans partial (map-side)
aggregation before the exchange, so at 100 TB the shuffle carries one row
per (partition × group), not per input row. Group keys here are
low-cardinality, so no skew handling is needed; AQE coalesces the
post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import count_by, melt_feature_means, sum_flag_split
from ..sources.batch import read_table
from . import QuerySpec


def q_flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary on lineitem.

    Exercises in one plan: filter pushdown, when-free arithmetic
    expressions, multi-aggregate with sum/avg/count, cast, alias —
    the A6 pattern (Consumer.scala:139-145) generalized.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") >= 1)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_FLAGSHIP = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4)                                           AS sum_qty,
       round(sum(l_extendedprice), 2)                                      AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                   AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)     AS sum_charge,
       round(avg(l_quantity), 6)                                           AS avg_qty,
       round(avg(l_discount), 6)                                           AS avg_disc,
       count(*)                                                            AS count_order
FROM lineitem
WHERE l_quantity >= 1
GROUP BY l_returnflag, l_linestatus
"""


def q_count_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — single-key streaming-style count (Consumer.scala:129
    `groupBy("Gender").count`) on orders.o_orderstatus."""
    return count_by(read_table(spark, sf_dir, "orders"), "o_orderstatus", name="cnt")


def q_count_two_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — two-key count (Consumer.scala:133 `groupBy(Class, satisfaction)`)
    on lineitem returnflag × linestatus."""
    return count_by(
        read_table(spark, sf_dir, "lineitem"), "l_returnflag", "l_linestatus", name="cnt"
    )


def q_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — distribution count over a numeric key (Consumer.scala:137
    `groupBy("Age").count`) on part.p_size."""
    return count_by(read_table(spark, sf_dir, "part"), "p_size", name="cnt")


def q_loyalty_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — the loyalty KPI shape (Consumer.scala:139-145): per nation,
    sum of a when/otherwise flag + count-minus-sum, both cast int.
    Flag: customer is in the BUILDING market segment."""
    return sum_flag_split(
        read_table(spark, sf_dir, "customer"),
        key="c_nationkey",
        flag_col="c_mktsegment",
        match_value="BUILDING",
        pos_name="building_cnt",
        neg_name="other_cnt",
    )


def q_feature_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — satisfaction-by-feature melt (Consumer.scala:368-401): mean of a
    binary measure per (feature_name, feature_value), one shuffle via
    stack() instead of the reference's N-scan union loop."""
    li = read_table(spark, sf_dir, "lineitem")
    measure = F.when(F.col("l_discount") > 0.05, 1).otherwise(0)
    out = melt_feature_means(
        li,
        feature_cols=["l_returnflag", "l_linestatus"],
        measure=measure,
        mean_col="mean_hi_discount",
    )
    return out.withColumn("mean_hi_discount", F.round("mean_hi_discount", 6))


ORACLE_FEATURE_MEANS = """
WITH melted AS (
    SELECT 'l_returnflag' AS feature_name, l_returnflag AS feature_value,
           CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS m
    FROM lineitem
    UNION ALL
    SELECT 'l_linestatus', l_linestatus,
           CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END
    FROM lineitem
)
SELECT feature_name, feature_value, round(avg(m), 6) AS mean_hi_discount
FROM melted GROUP BY feature_name, feature_value
"""


def q_global_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — global scalar count (Producer.scala:23 `inputDF.count`)."""
    return read_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


QUERIES: dict[str, QuerySpec] = {
    "flagship_pricing_summary": QuerySpec(
        q_flagship_pricing_summary, ORACLE_FLAGSHIP, "TPC-H Q1 shape; A6 generalized"
    ),
    "kpi_count_by_status": QuerySpec(
        q_count_by_status,
        "SELECT o_orderstatus, count(*) AS cnt FROM orders GROUP BY o_orderstatus",
        "A1 single-key count",
    ),
    "kpi_count_two_keys": QuerySpec(
        q_count_two_keys,
        "SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem "
        "GROUP BY l_returnflag, l_linestatus",
        "A3 two-key count",
    ),
    "kpi_value_distribution": QuerySpec(
        q_value_distribution,
        "SELECT p_size, count(*) AS cnt FROM part GROUP BY p_size",
        "A5 numeric-key distribution",
    ),
    "kpi_loyalty_split": QuerySpec(
        q_loyalty_split,
        "SELECT c_nationkey, "
        "cast(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS int) AS building_cnt, "
        "cast(count(c_mktsegment) - sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS int) AS other_cnt "
        "FROM customer GROUP BY c_nationkey",
        "A6 sum-of-flag + count-minus-sum",
    ),
    "kpi_feature_means": QuerySpec(
        q_feature_means, ORACLE_FEATURE_MEANS, "A7 melt + single-shuffle means"
    ),
    "kpi_global_count": QuerySpec(
        q_global_count,
        "SELECT count(*) AS n_rows FROM lineitem",
        "A8 global count",
    ),
}
