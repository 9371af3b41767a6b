"""Unbounded rate-source harness — throughput/latency measurement.

The reference's streams are all file-backed (Consumer.scala:49-52,
FileReconstitution.scala:53); real deployments also need an UNBOUNDED
source to size triggers and state stores. Spark ships two synthetic
ones: `rate` (wall-clock rows/sec) and `rate-micro-batch` (exactly
rowsPerBatch rows per trigger, virtual event time — deterministic, the
one tests should use). This harness drives a pipeline over
rate-micro-batch for a fixed number of micro-batches and reports
rows/sec + per-batch latency from the query's progress metrics — the
numbers that decide trigger interval and shuffle-partition sizing on a
real cluster.

Scale note: the measured pipeline below is the suite's KPI aggregation
shape (groupBy running counts, update mode) — state rows = |keys|, so
throughput here is the state-store update path, not just source speed.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rate_stream(
    spark: SparkSession,
    rows_per_batch: int = 10_000,
    num_partitions: int = 4,
) -> DataFrame:
    """Deterministic unbounded stream: (timestamp, value) with exactly
    rows_per_batch rows per trigger."""
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", num_partitions)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 1000)
        .load()
    )


def measure_rate_throughput(
    spark: SparkSession,
    rows_per_batch: int = 10_000,
    n_batches: int = 5,
    timeout_sec: float = 120.0,
) -> dict:
    """Run the KPI-shaped aggregation over `n_batches` micro-batches of
    the rate source; return rows/sec and per-batch latency stats."""
    stream = rate_stream(spark, rows_per_batch)
    agg = (
        stream.withColumn("bucket", F.pmod("value", F.lit(50)))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total"))
    )
    name = f"rate_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="0 seconds")
        .start()
    )
    t0 = time.perf_counter()
    try:
        deadline = t0 + timeout_sec
        while time.perf_counter() < deadline:
            lp = q.lastProgress
            if lp is not None and lp["batchId"] >= n_batches:
                break
            time.sleep(0.1)
        progresses = [
            p
            for p in q.recentProgress
            if p["batchId"] < n_batches and p["numInputRows"] > 0
        ]
    finally:
        q.stop()
    elapsed = time.perf_counter() - t0
    rows = sum(p["numInputRows"] for p in progresses)
    durations = [p["durationMs"]["triggerExecution"] for p in progresses]
    return {
        "rows": rows,
        "batches": len(progresses),
        "elapsed_sec": round(elapsed, 3),
        "rows_per_sec": round(rows / elapsed, 1) if elapsed > 0 else 0.0,
        "batch_ms_max": max(durations) if durations else 0,
        "batch_ms_mean": (sum(durations) / len(durations)) if durations else 0,
        "result_keys": spark.table(name).select("bucket").distinct().count(),
    }
