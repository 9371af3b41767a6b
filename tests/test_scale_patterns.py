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
from tests.conftest import SF_DIR_CORRECT, SF_DIR_SMOKE


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


def test_zorder_layout_enables_two_dim_skipping(spark, tmp_path):
    """Z-order clustering must make file-level min/max stats selective on
    BOTH dimensions, where a one-column sort is selective on one only —
    the property parquet row-group skipping feeds on."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from sparkstreaming_spark.operators.layout import write_zordered
    from sparkstreaming_spark.sources.batch import read_table

    ev = read_table(spark, SF_DIR_CORRECT, "events").select("user_id", "value")
    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]

    z_path = str(tmp_path / "zorder")
    s_path = str(tmp_path / "usersort")
    write_zordered(
        ev, z_path, [("user_id", lo_u, hi_u), ("value", lo_v, hi_v)], n_files=8
    )
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(s_path)
    )

    def avg_ranges(path):
        spans = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins = {"user_id": [], "value": []}
            maxs = {"user_id": [], "value": []}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    mins[name].append(col.statistics.min)
                    maxs[name].append(col.statistics.max)
            u = (max(maxs["user_id"]) - min(mins["user_id"])) / (hi_u - lo_u)
            v = (max(maxs["value"]) - min(mins["value"])) / (hi_v - lo_v)
            spans.append((u, v))
        nf = len(spans)
        return sum(s[0] for s in spans) / nf, sum(s[1] for s in spans) / nf

    zu, zv = avg_ranges(z_path)
    su, sv = avg_ranges(s_path)
    # one-column sort: near-perfect on user_id, unselective on value
    assert su < 0.35
    assert sv > 0.6
    # z-order: selective on BOTH (each file covers a compact rectangle);
    # measured ~0.41/0.35 at sf0.01 vs 0.12/0.74 for the one-column sort
    assert zu < 0.6 and zv < 0.6, f"zorder spans too wide: {zu:.2f}, {zv:.2f}"
    assert zv < sv - 0.1  # strictly better on the non-sorted dimension


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join must split a hot-key partition at runtime — the
    no-code-change answer to join skew (salting, operators/skew.py, is
    the fallback for aggregations and pre-AQE engines). Thresholds are
    lowered so test-sized data exhibits 'skew' the same way a hot key
    does at production scale."""
    from pyspark.sql import functions as F

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = (
            spark.range(500_000)
            .select((F.col("id") * 0).alias("k"), F.col("id").alias("v"))
            .union(
                spark.range(1000).select(
                    (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v")
                )
            )
        )
        right = spark.range(51).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
        j = left.join(right, "k").select(F.sum("v").alias("s"))
        [row] = j.collect()
        # correctness unaffected by the split
        assert row.s == sum(range(500_000)) + sum(range(1000))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_join_strategy_hints_are_honored(spark):
    """Join hints steer the physical strategy when the caller knows
    better than the statistics: MERGE forces sort-merge where broadcast
    would win by size; BROADCAST forces broadcast of a side the stats
    would shuffle."""
    from pyspark.sql import functions as F

    big = spark.range(10_000).select(F.col("id").alias("k"), F.col("id").alias("v"))
    small = spark.range(100).select(F.col("id").alias("k"), F.lit("d").alias("tag"))

    merged = big.join(small.hint("merge"), "k")
    assert "SortMergeJoin" in merged._jdf.queryExecution().executedPlan().toString()

    bcast = big.join(small.hint("broadcast"), "k")
    assert "BroadcastHashJoin" in bcast._jdf.queryExecution().executedPlan().toString()


def test_capped_sessionize_gap_and_cap(spark, tmp_path):
    """Custom stateful sessionization: a quiet gap closes a session; a
    steady event stream (which session_window would merge into ONE
    ever-growing session) is split by the max-duration cap. Only closed
    sessions are emitted; the in-flight one stays in state."""
    import datetime as dt

    from sparkstreaming_spark.streaming.stateful import capped_sessionize

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user a: events at 0s,60s,120s then a 10-min gap, then 2 more
    for s in (0, 60, 120, 900, 960):
        rows.append(("a", t0 + dt.timedelta(seconds=s)))
    # user b: steady every 60s for 40 min -> cap at 600s splits it
    for i in range(40):
        rows.append(("b", t0 + dt.timedelta(seconds=60 * i)))
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "k string, ts timestamp").write.parquet(src)

    stream = spark.readStream.schema("k string, ts timestamp").parquet(src)
    out = capped_sessionize(stream, "k", "ts", gap_sec=300, max_len_sec=600)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        (r.key, r.session_start.second + r.session_start.minute * 60,
         r.n_events, r.closed_by)
        for r in spark.table("sessions").collect()
    )
    # a: [0,60,120] closed by the 13-min gap; trailing [900,960] still open
    assert ("a", 0, 3, "gap") in got
    assert not any(k == "a" and s >= 900 for k, s, _, _ in got)
    # b: steady stream split by the 600s cap into 10-11-event chunks
    b_sessions = [g for g in got if g[0] == "b"]
    assert len(b_sessions) >= 3
    assert all(c == "cap" for _, _, _, c in b_sessions)
    assert all(n <= 11 for _, _, n, _ in b_sessions)


def test_merge_schema_reads_evolved_layout(spark, tmp_path):
    """Schema evolution on a file table: old files lack a column newer
    files carry; mergeSchema reconciles the scan schema and old rows read
    NULL for the added column — the append-only evolution contract a
    long-lived 100 TB table relies on."""
    out = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, name string"
    ).write.parquet(out + "/batch=0")
    spark.createDataFrame(
        [(3, "c", 9.5)], "id bigint, name string, score double"
    ).write.parquet(out + "/batch=1")

    df = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(df.columns) == {"id", "name", "score", "batch"}
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 9.5)}


def test_parquet_bloom_filter_option_writes_filters(spark, tmp_path):
    """Point-lookup skipping on non-sorted columns: parquet bloom filters
    per column via writer options. This pyarrow build doesn't expose
    bloom offsets, so the check is the filter's footprint — the
    bloom-enabled file must carry the extra filter bytes (~190 KB for
    ndv=100k at default fpp) over the identical data without it."""
    import glob
    import os

    plain = str(tmp_path / "plain")
    bloomed = str(tmp_path / "bloomed")
    df = spark.range(100_000).selectExpr("id AS user_id", "id * 2 AS v")
    df.coalesce(1).write.mode("overwrite").parquet(plain)
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#user_id", "true")
        .option("parquet.bloom.filter.expected.ndv#user_id", "100000")
        .parquet(bloomed)
    )

    def data_bytes(path):
        return sum(
            os.path.getsize(f) for f in glob.glob(path + "/*.parquet")
        )

    delta = data_bytes(bloomed) - data_bytes(plain)
    assert delta > 50_000, f"bloom filter bytes missing (delta={delta})"
    # and the bloomed file reads back identically
    assert spark.read.parquet(bloomed).count() == 100_000


def test_zorder_high_dims_stay_positive(spark):
    """4+ dims must not interleave into the bigint sign bit: max-coordinate
    rows keep non-negative zvals (per-dim bits shrink to 63 // n_dims)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from sparkstreaming_spark.operators.layout import zorder_value

    df = spark.range(1).select(
        F.lit(100.0).alias("a"), F.lit(100.0).alias("b"),
        F.lit(100.0).alias("c"), F.lit(100.0).alias("d"),
    )
    dims4 = [(c, 0.0, 100.0) for c in ("a", "b", "c", "d")]
    val = df.select(zorder_value(dims4).alias("z")).first()["z"]
    assert val > 0, f"sign-bit overflow: {val}"
    assert val < (1 << 60)  # 4 dims x 15 bits
    with _pytest.raises(ValueError):
        zorder_value([])


def test_weighted_sample_excludes_nonpositive_weights(spark):
    """NULL/zero/negative weights must never be sampled: pow(u, 1/0) is
    NaN/Inf and Spark sorts NaN above real keys — the guard filters them
    out before keying so the top-k only contains w > 0 rows."""
    from pyspark.sql import functions as F

    from sparkstreaming_spark.operators.sampling import weighted_hash_sample

    rows = [(1, 0.0), (2, -5.0), (3, None), (4, 10.0), (5, 1.0), (6, 2.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = {r.id for r in weighted_hash_sample(df, "id", F.col("w"), 4).collect()}
    assert got == {4, 5, 6}


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Runtime row-level filtering: a selective build side must inject a
    bloom_filter_might_contain predicate into the probe-side scan — at
    100 TB this is the difference between shuffling the whole fact table
    and shuffling only rows that can possibly join. Size thresholds are
    lowered so test-sized tables qualify the same way a selective dim
    does at production scale."""
    from pyspark.sql import functions as F

    keys = (
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    old = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        # force a shuffle join: bloom pruning only applies off-broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            fact_p = os.path.join(d, "fact")
            dim_p = os.path.join(d, "dim")
            spark.range(200_000).select(
                F.col("id").alias("k"), (F.col("id") % 97).alias("v")
            ).write.parquet(fact_p)
            spark.range(200_000).select(
                F.col("id").alias("k"), (F.col("id") % 1000).alias("sel")
            ).write.parquet(dim_p)
            fact = spark.read.parquet(fact_p)
            # the injection rule wants a LIKELY-SELECTIVE filter on the
            # creation side in the query plan itself (not pre-filtered data)
            dim = spark.read.parquet(dim_p).filter(F.col("sel") == 0)
            joined = fact.join(dim, "k").agg(F.sum("v").alias("s"))
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "bloom_filter" in plan.lower() or "BloomFilter" in plan, plan[:3000]
            joined.collect()  # and it still computes
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_hilbert_value_matches_python_reference(spark):
    """The expression-fold Hilbert index must equal the classic xy2d
    reference on random and corner points (16-bit resolution)."""
    import random

    from pyspark.sql import functions as F

    from sparkstreaming_spark.operators.layout import (
        BITS,
        hilbert_value,
        hilbert_xy2d_py,
    )

    random.seed(11)
    hi = (1 << BITS) - 1
    pts = [(random.randint(0, hi), random.randint(0, hi)) for _ in range(300)]
    pts += [(0, 0), (hi, hi), (0, hi), (hi, 0), (1, 0), (0, 1)]
    df = spark.createDataFrame(pts, ["x", "y"])
    out = df.select(
        "x", "y", hilbert_value([("x", 0, hi), ("y", 0, hi)]).alias("h")
    ).collect()
    for r in out:
        assert r.h == hilbert_xy2d_py(BITS, r.x, r.y), (r.x, r.y)
    # adjacent curve positions are adjacent grid cells (|dx|+|dy| == 1):
    # the locality property Z-order lacks
    by_h = {hilbert_xy2d_py(BITS, x, y): (x, y) for x, y in pts}
    ds = sorted(by_h)
    for a, b in zip(ds, ds[1:]):
        if b == a + 1:
            (xa, ya), (xb, yb) = by_h[a], by_h[b]
            assert abs(xa - xb) + abs(ya - yb) == 1


def test_hilbert_layout_two_dim_skipping(spark, tmp_path):
    """Hilbert-clustered files must be selective on BOTH dimensions, like
    Z-order (same file-stats measurement as the zorder test)."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from sparkstreaming_spark.operators.layout import write_hilbert
    from sparkstreaming_spark.sources.batch import read_table

    ev = read_table(spark, SF_DIR_CORRECT, "events").select("user_id", "value")
    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]
    h_path = str(tmp_path / "hilbert")
    write_hilbert(
        ev, h_path, [("user_id", lo_u, hi_u), ("value", lo_v, hi_v)], n_files=8
    )
    spans = []
    for f in glob.glob(h_path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins = {"user_id": [], "value": []}
        maxs = {"user_id": [], "value": []}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                mins[col.path_in_schema].append(col.statistics.min)
                maxs[col.path_in_schema].append(col.statistics.max)
        spans.append(
            (
                (max(maxs["user_id"]) - min(mins["user_id"])) / (hi_u - lo_u),
                (max(maxs["value"]) - min(mins["value"])) / (hi_v - lo_v),
            )
        )
    hu = sum(s[0] for s in spans) / len(spans)
    hv = sum(s[1] for s in spans) / len(spans)
    assert hu < 0.6 and hv < 0.6, f"hilbert spans too wide: {hu:.2f}, {hv:.2f}"


def test_auto_broadcast_below_threshold(spark):
    """A dim table under spark.sql.autoBroadcastJoinThreshold must
    broadcast WITHOUT an explicit hint — the planner-side half of the
    broadcast-star pattern the suite otherwise pins via F.broadcast."""
    from tests.conftest import SF_DIR_SMOKE

    orders = spark.read.parquet(f"{SF_DIR_SMOKE}/orders.parquet")
    nation = spark.read.parquet(f"{SF_DIR_SMOKE}/nation.parquet")
    cust = spark.read.parquet(f"{SF_DIR_SMOKE}/customer.parquet")
    j = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_dpp_plan_prunes_fact_partitions(spark):
    """src_partition_pruned_join must compile with a dynamicpruning
    subquery on the partitioned fact scan (the literal-threshold dim
    filter is what qualifies as isLikelySelective — see the query
    docstring); losing it silently reverts to a full fact read."""
    from sparkstreaming_spark.suite.extensions import q_partition_pruned_join
    from tests.conftest import SF_DIR_SMOKE

    df = q_partition_pruned_join(spark, SF_DIR_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_bucketed_join_no_exchange(spark):
    """layout_bucketed_join's SortMergeJoin must consume the bucketed
    scans directly: the ONLY Exchange in the plan is the final
    aggregation's (on o_orderpriority) — zero shuffles feed the join."""
    import re

    from sparkstreaming_spark.suite.platform_ops import q_bucketed_join
    from tests.conftest import SF_DIR_SMOKE

    df = q_bucketed_join(spark, SF_DIR_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:1500]
    exchanges = [
        ln for ln in plan.splitlines() if re.search(r"\bExchange\b", ln)
    ]
    assert len(exchanges) == 1 and "o_orderpriority" in exchanges[0], exchanges
