"""Scale-pattern tests: salting, bucketed co-located joins, partition
pruning, custom stateful streaming — the 100 TB design features whose
value only shows in plans/behavior, not in result values."""

from __future__ import annotations

import os
import sqlite3
import tempfile

import pytest
from pyspark.sql import functions as F

from sparkstreaming_spark.operators.skew import salted_join
from sparkstreaming_spark.sources.batch import read_table
from tests.conftest import SF_DIR_SMOKE


def test_salted_join_matches_plain_join(spark):
    """Salting must not change join semantics: same result as the plain
    equi-join on a synthetic skewed input (90% of rows share one key)."""
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .cast("bigint").alias("k"),
        F.col("id").alias("row_id"),
    )
    right = spark.range(100).select(
        F.col("id").cast("bigint").alias("k"),
        (F.col("id") * 2).alias("payload"),
    )
    plain = left.join(right, "k").select("row_id", "payload")
    salted = salted_join(left, right, "k", salt=8, left_unique_col="row_id").select(
        "row_id", "payload"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key pre-co-locates them: the join
    plan must contain NO Exchange (shuffle) on the bucketed scans."""
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    orders = read_table(spark, SF_DIR_SMOKE, "orders")
    cust = read_table(spark, SF_DIR_SMOKE, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("b_orders")
    )
    (
        cust.withColumn("c_custkey", F.col("c_custkey"))
        .write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("b_customer")
    )
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_partition_pruning(spark, tmp_path):
    """A filter on the partition column must prune partitions at scan
    time (partition count visible in the executed plan), and predicate
    pushdown must reach the parquet reader."""
    out = str(tmp_path / "orders_by_status")
    orders = read_table(spark, SF_DIR_SMOKE, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    df = spark.read.parquet(out).filter(F.col("o_orderstatus") == "O")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan, plan[:2000]
    n_all = spark.read.parquet(out).count()
    n_open = df.count()
    assert 0 < n_open < n_all


def test_pushed_filters_reach_scan(spark):
    """Row-group predicate pushdown: the parquet scan must advertise
    PushedFilters for a plain comparison predicate."""
    li = read_table(spark, SF_DIR_SMOKE, "lineitem").filter(F.col("l_quantity") > 40)
    plan = li._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]" in plan


def test_stateful_running_distinct(spark, tmp_path):
    """applyInPandasWithState custom operator: streaming exact distinct
    count per key equals the batch distinct count after the stream
    drains (update mode; last emitted row per key is the final state)."""
    from sparkstreaming_spark.streaming.stateful import running_distinct_count

    src = str(tmp_path / "src")
    orders = read_table(spark, SF_DIR_SMOKE, "orders").select(
        "o_orderstatus", "o_custkey"
    )
    orders.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("o_orderstatus string, o_custkey bigint").parquet(src)
    out = running_distinct_count(stream, "o_orderstatus", "o_custkey")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("rdc")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # last row per key wins (update stream into memory sink appends)
    got = {}
    for r in spark.table("rdc").collect():
        got[r.key] = (r.n_distinct, r.n_events)
    want = {
        r.o_orderstatus: (r.nd, r.ne)
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("nd"),
            F.count(F.lit(1)).alias("ne"),
        )
        .collect()
    }
    assert got == want
