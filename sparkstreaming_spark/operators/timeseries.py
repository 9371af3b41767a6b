"""Time-series regularization: bucket, densify, and forward-fill a
sparse event series — the standard hypertable "gap fill" operator
(reference has no time-series surface; SURVEY §2.9 extension).

Spark-first design: the bucket grid is generated DISTRIBUTED, per key,
with `sequence()` + `explode()` — never a driver-side date loop — so a
100 TB / 100 M-key input densifies in one shuffle-free pass after the
per-(key, bucket) aggregate:

  agg(key, bucket)           one shuffle (the aggregate itself)
  ranges(key)                map-side combine into |keys| rows
  grid = explode(sequence)   no shuffle: ranges already per-key
  grid ⟕ agg                 co-partitioned join on (key, bucket)
  last(ignorenulls) window   one sort per key partition

The join and the window both hash on the key, so AQE coalesces them
into the same exchange; skewed keys (one key with a years-long range)
are bounded by range length, not input row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    bucket: str = "15 minutes",
    agg: Column | None = None,
) -> DataFrame:
    """Bucket `ts` into `bucket`-sized windows per `key`, aggregate
    `value` (default avg), densify each key's [min, max] bucket range,
    and forward-fill missing buckets with the last observed aggregate.

    Returns (key, bucket_start timestamp, value_ffill, was_gap).
    The first bucket of every key is an observed one by construction,
    so the forward fill is total (no leading nulls).
    """
    agg_expr = (agg if agg is not None else F.avg(F.col(value))).alias("v")
    bucketed = df.groupBy(
        F.col(key), F.window(ts, bucket)["start"].alias("bucket_start")
    ).agg(agg_expr)
    ranges = bucketed.groupBy(key).agg(
        F.min("bucket_start").alias("b0"), F.max("bucket_start").alias("b1")
    )
    step = F.expr(f"INTERVAL {bucket}")
    grid = ranges.select(
        key, F.explode(F.sequence("b0", "b1", step)).alias("bucket_start")
    )
    joined = grid.join(bucketed, [key, "bucket_start"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key,
        "bucket_start",
        F.last("v", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("v").isNull().alias("was_gap"),
    )
