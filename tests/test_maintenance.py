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


def test_surgical_delete_rewrites_only_affected_files(spark, tmp_path):
    """Deleting two users must rewrite exactly the files holding them —
    every other file keeps identical bytes — and the surviving rows must
    equal the original minus the targets."""
    import os

    from pyspark.sql import functions as F

    from sparkstreaming_spark.operators.maintenance import surgical_delete

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    table = str(tmp_path / "events_sharded")
    # user-clustered layout: repartitionByRange puts each user in few files
    src.repartitionByRange(8, "user_id").write.parquet(table)

    files = sorted(
        f for f in os.listdir(table) if f.endswith(".parquet")
    )
    before = {f: open(os.path.join(table, f), "rb").read() for f in files}
    targets = [3, 7]
    expect = src.filter(~F.col("user_id").isin(targets))
    n_expect = expect.count()
    n_target = src.count() - n_expect
    assert n_target > 0

    stats = surgical_delete(spark, table, "user_id", targets)
    assert stats["rows_deleted"] == n_target
    assert 0 < stats["files_rewritten"] < stats["files_total"]

    changed = 0
    for f in files:
        after = open(os.path.join(table, f), "rb").read()
        if after != before[f]:
            changed += 1
    assert changed == stats["files_rewritten"]

    got = spark.read.parquet(table)
    assert got.count() == n_expect
    assert got.filter(F.col("user_id").isin(targets)).count() == 0
    assert (
        got.exceptAll(expect.select(*got.columns)).count() == 0
    )


def test_file_stats_match_parquet_footer(spark, tmp_path):
    """The _metadata-derived per-file min/max (src_file_skipping_stats
    shape) must equal the ACTUAL parquet footer statistics — proving the
    skipping report reflects what a pruning scan would see."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    table = str(tmp_path / "events_multi")
    src.repartitionByRange(4, "user_id").write.parquet(table)

    derived = {
        r.file: r
        for r in spark.read.parquet(table)
        .select(
            "user_id",
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("file"),
        )
        .groupBy("file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("user_id").alias("min_user"),
            F.max("user_id").alias("max_user"),
        )
        .collect()
    }
    checked = 0
    for f in os.listdir(table):
        if not f.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(table, f)).metadata
        idx = next(
            i
            for i in range(len(meta.schema))
            if meta.schema.column(i).name == "user_id"
        )
        fmin = min(
            meta.row_group(g).column(idx).statistics.min
            for g in range(meta.num_row_groups)
        )
        fmax = max(
            meta.row_group(g).column(idx).statistics.max
            for g in range(meta.num_row_groups)
        )
        n = sum(meta.row_group(g).num_rows for g in range(meta.num_row_groups))
        assert derived[f].min_user == fmin
        assert derived[f].max_user == fmax
        assert derived[f].n_rows == n
        checked += 1
    assert checked >= 2


def test_surgical_delete_handles_fully_deleted_file(spark, tmp_path):
    """A file whose every row matches the delete set must be REMOVED
    (an empty rewrite emits no part file), and the table must stay
    readable with only the other files' rows."""
    import os

    from pyspark.sql import functions as F

    from sparkstreaming_spark.operators.maintenance import surgical_delete

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    users = sorted(r.user_id for r in src.select("user_id").distinct().collect())
    table = str(tmp_path / "events_by_user")
    # one file per user-range: deleting every user in the first range
    # empties that file completely
    src.repartitionByRange(4, "user_id").write.parquet(table)
    per_file = (
        spark.read.parquet(table)
        .select("user_id", F.col("_metadata.file_path").alias("f"))
        .groupBy("f")
        .agg(F.collect_set("user_id").alias("us"))
        .collect()
    )
    victim = min(per_file, key=lambda r: min(r.us))
    targets = list(victim.us)
    n_before = src.count()
    n_files_before = len(per_file)

    stats = surgical_delete(spark, table, "user_id", targets)
    assert stats["files_rewritten"] >= 1
    got = spark.read.parquet(table)
    assert got.filter(F.col("user_id").isin(targets)).count() == 0
    assert got.count() == n_before - src.filter(
        F.col("user_id").isin(targets)
    ).count()
    n_files_after = len(
        [f for f in os.listdir(table) if f.endswith(".parquet")]
    )
    assert n_files_after == n_files_before - 1
