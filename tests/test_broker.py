"""Partitioned-topic broker source (sources/broker.py): keyed publish,
dense offsets, append continuation, partition pruning, and incremental
checkpointed consumption."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from sparkstreaming_spark.sources.broker import (
    publish_topic,
    read_topic_batch,
    read_topic_stream,
)

SCHEMA = "k bigint, v string, offset bigint"


def _batch(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )


def test_publish_assigns_dense_offsets_per_partition(spark):
    topic = os.path.join(tempfile.mkdtemp(prefix="broker_"), "t")
    publish_topic(_batch(spark, 0, 100), topic, key_col="k", n_partitions=4)
    got = (
        read_topic_batch(spark, topic)
        .groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("offset").alias("lo"),
            F.max("offset").alias("hi"),
            F.sum("offset").alias("s"),
        )
        .collect()
    )
    assert len(got) == 4
    for r in got:
        assert r.lo == 0 and r.hi == r.n - 1
        assert r.s == r.n * (r.n - 1) // 2  # dense 0..n-1
    # keyed placement: same key -> same partition (pmod)
    rows = read_topic_batch(spark, topic).select("k", "part_id").collect()
    assert all(r.k % 4 == r.part_id for r in rows)


def test_append_continues_the_log(spark):
    topic = os.path.join(tempfile.mkdtemp(prefix="broker_"), "t")
    publish_topic(_batch(spark, 0, 40), topic, key_col="k", n_partitions=2)
    publish_topic(
        _batch(spark, 40, 60), topic, key_col="k", n_partitions=2, append=True
    )
    got = (
        read_topic_batch(spark, topic)
        .groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("offset").alias("hi"),
            F.count_distinct("offset").alias("n_off"),
        )
        .collect()
    )
    for r in got:
        assert r.n == 30
        assert r.hi == 29 and r.n_off == 30  # still dense after append


def test_batch_read_prunes_partitions(spark):
    topic = os.path.join(tempfile.mkdtemp(prefix="broker_"), "t")
    publish_topic(_batch(spark, 0, 50), topic, key_col="k", n_partitions=4)
    df = read_topic_batch(spark, topic).filter(F.col("part_id") == 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "part_id" in plan and "PartitionFilters: [" in plan
    assert df.count() == len([k for k in range(50) if k % 4 == 3])


def test_stream_consumes_appended_segments_exactly_once(spark):
    """The consumer-group contract: a checkpointed stream drains the
    initial log, then a later run with the SAME checkpoint consumes only
    the appended segments."""
    from pyspark.sql.streaming import StreamingQuery  # noqa: F401

    root = tempfile.mkdtemp(prefix="broker_stream_")
    topic = os.path.join(root, "t")
    ckpt = os.path.join(root, "ckpt")
    out = os.path.join(root, "out")
    publish_topic(_batch(spark, 0, 30), topic, key_col="k", n_partitions=2)

    def drain():
        q = (
            read_topic_stream(spark, topic, SCHEMA)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if q.isActive:  # pragma: no cover
            q.stop()
            pytest.fail("stream did not drain")

    drain()
    assert spark.read.parquet(out).count() == 30
    publish_topic(
        _batch(spark, 30, 45), topic, key_col="k", n_partitions=2, append=True
    )
    drain()
    sunk = spark.read.parquet(out)
    assert sunk.count() == 45  # appended 15 consumed once, old 30 not re-read
    assert sunk.select("k").distinct().count() == 45


def test_quota_gate_state_survives_micro_batches(spark):
    """The admission counter must persist across micro-batches: feeding
    a user's day in two separate segment files (maxFilesPerTrigger=1 →
    two micro-batches) admits exactly `quota` in total, not per batch."""
    import pandas as pd

    from sparkstreaming_spark.streaming.stateful import quota_gate

    root = tempfile.mkdtemp(prefix="quota_")
    src, out, ckpt = (os.path.join(root, d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)

    def write_slice(name, ids):
        pdf = pd.DataFrame(
            {
                "event_id": ids,
                "user_id": [7] * len(ids),
                "ts": pd.to_datetime(
                    ["2024-01-01 00:00:%02d" % i for i in ids]
                ),
            }
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, name))

    write_slice("a", [1, 2])
    write_slice("b", [3, 4, 5])
    st = (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, ts timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        quota_gate(st, "user_id", "ts", "event_id", quota=3)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas().sort_values("event_id")
    assert len(got) == 5
    # exactly 3 admitted across BOTH batches, and they are the earliest 3
    admitted = got[got["admitted"]]["event_id"].tolist()
    assert admitted == [1, 2, 3], admitted


def test_quota_gate_sorts_across_arrow_chunks(spark):
    """A (user, day) group bigger than arrow maxRecordsPerBatch arrives
    as SEVERAL chunks of the group iterator; admission must still
    follow global (ts, id) order, not per-chunk arrival order. Events
    are written in reverse-ts order with maxRecordsPerBatch=2, so a
    per-chunk sort would admit the latest events first."""
    import pandas as pd

    from sparkstreaming_spark.streaming.stateful import quota_gate

    root = tempfile.mkdtemp(prefix="quotachunk_")
    src, out, ckpt = (os.path.join(root, d) for d in ("src", "out", "ckpt"))
    ids = [7, 6, 5, 4, 3, 2, 1]  # reverse (ts, id) order on disk
    pdf = pd.DataFrame(
        {
            "event_id": ids,
            "user_id": [9] * len(ids),
            "ts": pd.to_datetime(["2024-01-01 00:00:%02d" % i for i in ids]),
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        st = spark.readStream.schema(
            "event_id bigint, user_id bigint, ts timestamp"
        ).parquet(src)
        q = (
            quota_gate(st, "user_id", "ts", "event_id", quota=3)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", prev
            )
    got = spark.read.parquet(out).toPandas()
    admitted = sorted(got[got["admitted"]]["event_id"].tolist())
    assert admitted == [1, 2, 3], admitted


def test_quota_gate_prunes_stale_days(spark):
    """Per-user state must stay bounded: update() keeps only the newest
    retention_days DISTINCT day entries (GroupState TTL can't — it
    expires whole keys, and an active user's key never expires).
    Observable contract, both directions:
    - a day displaced by retention_days genuinely newer distinct days
      restarts its counter at 0, so with quota=1 the same old-day event
      is admitted again after displacement;
    - ONE far-future day must NOT evict live counters (the forged-
      timestamp hazard of a date-window prune keyed to the max day), so
      an old-day recurrence after a single future event stays rejected."""
    import pandas as pd

    from sparkstreaming_spark.streaming.stateful import quota_gate

    root = tempfile.mkdtemp(prefix="quotaprune_")
    src, out, ckpt = (os.path.join(root, d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)

    def write_slice(name, ids, days):
        pdf = pd.DataFrame(
            {
                "event_id": ids,
                "user_id": [7] * len(ids),
                "ts": pd.to_datetime([f"{d} 00:00:00" for d in days]),
            }
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, name))

    # batch 1: day D fills its quota of 1
    write_slice("a", [1], ["2024-01-01"])
    # batch 2: ONE far-future day — must NOT evict D (map has 2 entries,
    # retention 2 keeps both)
    write_slice("b", [2], ["2099-03-01"])
    # batch 3: day D recurs — counter survived, so it is REJECTED
    write_slice("c", [3], ["2024-01-01"])
    # batch 4: two genuinely newer days displace D (map > retention 2)
    write_slice("d", [4, 5], ["2024-01-02", "2024-01-03"])
    # batch 5: day D recurs after displacement — restarted, admitted
    write_slice("e", [6], ["2024-01-01"])
    st = (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, ts timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        quota_gate(st, "user_id", "ts", "event_id", quota=1,
                   retention_days=2)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas().sort_values("event_id")
    assert len(got) == 6
    assert got["admitted"].tolist() == [True, True, False, True, True, True]
