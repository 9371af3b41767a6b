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


def test_ivm_merge_semantics(spark):
    """Merged state must equal full recompute on planted data, including
    groups present on only one side and min/max folding across sides."""
    from sparkstreaming_spark.operators.ivm import (
        aggregate_state,
        merge_states,
        read_view,
    )

    base = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0)], ["k", "v"]
    )
    delta = spark.createDataFrame(
        [("a", -2.0), ("c", 7.0)], ["k", "v"]
    )
    merged = read_view(
        merge_states(
            aggregate_state(base, ["k"], "v"),
            aggregate_state(delta, ["k"], "v"),
            ["k"],
        )
    )
    full = read_view(aggregate_state(base.unionByName(delta), ["k"], "v"))
    m = {r.k: (r.n, r.sum_v, r.avg_v, r.min_v, r.max_v) for r in merged.collect()}
    f = {r.k: (r.n, r.sum_v, r.avg_v, r.min_v, r.max_v) for r in full.collect()}
    assert m == f
    assert m["a"] == (3, 2.0, 0.666667, -2.0, 3.0)
    assert m["c"] == (1, 7.0, 7.0, 7.0, 7.0)


def test_asof_forward_direction_and_tolerance(spark):
    """Forward as-of: earliest right at-or-after left; equal timestamps
    match; tolerance nulls matches farther than the bound."""
    import datetime as dt

    from sparkstreaming_spark.operators.asof import asof_join

    t = lambda m: dt.datetime(2026, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, t(10)), (1, t(30)), (2, t(5))], ["k", "ts"]
    )
    right = spark.createDataFrame(
        [(1, t(10), "a"), (1, t(25), "b"), (1, t(50), "c")],
        ["k", "rts", "v"],
    )
    out = {
        (r.k, r.ts.minute): r.asof_v
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts",
            right_cols=["v"], direction="forward",
        ).collect()
    }
    assert out[(1, 10)] == "a"   # equal ts matches
    assert out[(1, 30)] == "c"   # next future row
    assert out[(2, 5)] is None   # no right rows for key
    tol = {
        (r.k, r.ts.minute): r.asof_v
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts",
            right_cols=["v"], direction="forward",
            tolerance_us=10 * 60 * 1_000_000,
        ).collect()
    }
    assert tol[(1, 10)] == "a"
    assert tol[(1, 30)] is None  # 20 min away > 10 min tolerance
