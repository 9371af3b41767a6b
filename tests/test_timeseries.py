"""gap_fill semantics on a hand-built series: grid completeness,
forward-fill values, gap flags, and no leading nulls."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sparkstreaming_spark.operators.timeseries import gap_fill


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_gap_fill_dense_grid_and_ffill(spark):
    # key "a": buckets 0 and 45 observed -> 15 and 30 are gaps, filled
    # with bucket-0 avg; key "b": single bucket, no gaps.
    rows = [
        ("a", _ts(1), 10.0),
        ("a", _ts(14), 20.0),   # same bucket as _ts(1): avg 15.0
        ("a", _ts(46), 40.0),
        ("b", _ts(31), 7.0),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = gap_fill(df, key="key", ts="ts", value="value").orderBy("key", "bucket_start")
    got = [
        (r.key, r.bucket_start.minute, r.value_ffill, r.was_gap)
        for r in out.collect()
    ]
    assert got == [
        ("a", 0, 15.0, False),
        ("a", 15, 15.0, True),
        ("a", 30, 15.0, True),
        ("a", 45, 40.0, False),
        ("b", 30, 7.0, False),
    ]
    assert out.filter(F.col("value_ffill").isNull()).count() == 0


def test_gap_fill_custom_agg(spark):
    rows = [("a", _ts(0), 1.0), ("a", _ts(5), 9.0), ("a", _ts(40), 2.0)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = gap_fill(
        df, key="key", ts="ts", value="value", agg=F.max(F.col("value"))
    ).orderBy("bucket_start")
    vals = [r.value_ffill for r in out.collect()]
    assert vals == [9.0, 9.0, 2.0]
