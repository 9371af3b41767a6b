"""Physical-layout maintenance: bucketed join co-location and small-file
compaction (operators/maintenance.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the same key/count must join with ZERO
    Exchange operators — the pay-the-shuffle-once-at-write contract."""
    from sparkstreaming_spark.operators.maintenance import write_bucketed

    orders = spark.read.parquet(f"{SF_DIR_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR_SMOKE}/lineitem.parquet")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        n_buckets=8,
    )
    try:
        # disable broadcast so the join genuinely exercises co-location
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = _plan(j)
        assert "SortMergeJoin" in plan, plan[:3000]
        assert "Exchange" not in plan, plan[:3000]
        assert "SelectedBucketsCount" in plan, plan[:3000]
        # and the answer is right
        expected = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert j.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_aggregate_has_no_exchange(spark):
    """A groupBy on the bucket key of a bucketed table must aggregate
    without any Exchange (partials ARE finals per bucket)."""
    from sparkstreaming_spark.operators.maintenance import write_bucketed

    orders = spark.read.parquet(f"{SF_DIR_SMOKE}/orders.parquet")
    write_bucketed(orders, "b_orders_agg", "o_custkey", n_buckets=8)
    try:
        agg = (
            spark.table("b_orders_agg")
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(agg)
        assert "Exchange" not in plan, plan[:3000]
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders_agg")


def test_compact_parquet(spark, tmp_path):
    """A 32-file directory compacts to the computed file count with all
    rows intact; the coalesce path must not shuffle."""
    from sparkstreaming_spark.operators.maintenance import compact_parquet

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    ev = spark.read.parquet(f"{SF_DIR_SMOKE}/events.parquet")
    ev.repartition(32).write.parquet(src)
    n_in = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_in == 32
    # ~3 MB of data, 1 MB target → a handful of output files
    n_out = compact_parquet(spark, src, dst, target_file_mb=1)
    files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
    assert len(files) == n_out
    assert n_out < n_in
    assert spark.read.parquet(dst).count() == ev.count()


def test_dynamic_partition_overwrite(spark, tmp_path):
    """Rewriting one event_type partition must leave the others
    byte-for-byte (row-for-row) intact and fully replace the target."""
    from pyspark.sql import functions as F

    from sparkstreaming_spark.operators.maintenance import (
        overwrite_partitions,
    )

    out = str(tmp_path / "t")
    ev = spark.read.parquet(f"{SF_DIR_SMOKE}/events.parquet")
    ev.write.partitionBy("event_type").parquet(out)
    before = {
        r.event_type: r.n
        for r in spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # reload 'click' only, halved
    reload_df = ev.filter(F.col("event_type") == "click").limit(
        before["click"] // 2
    )
    overwrite_partitions(reload_df, out, ["event_type"])
    after = {
        r.event_type: r.n
        for r in spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert after["click"] == before["click"] // 2
    for k in before:
        if k != "click":
            assert after[k] == before[k], k
    # conf restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode").upper()
        == "STATIC"
    )
