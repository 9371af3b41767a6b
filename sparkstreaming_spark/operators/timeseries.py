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

from collections.abc import Sequence

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


def truncated_ewma(
    value: str,
    window: Window,
    alpha: float = 0.2,
    taps: int = 24,
):
    """Exponentially-weighted moving average as a fixed-tap FIR filter:

        ewma_n = Σ_{j<taps} (1-α)^j · x_{n-j}  /  Σ_{j<taps, x_{n-j} exists} (1-α)^j

    The textbook recursive EWMA is a sequential scan (unbounded IIR state
    — hostile to distributed evaluation), and its closed prefix-sum form
    needs (1-α)^(-i) factors that overflow doubles within a few hundred
    rows. Truncating to `taps` lags loses only (1-α)^taps of the mass
    (0.8²⁴ ≈ 0.5 %) and becomes a pure expression over `taps` lag()
    columns sharing ONE window sort — whole-stage-codegen'd, shuffle =
    the window partitioning and nothing else, and exactly reproducible
    on any engine with lag() (the oracle spells the same taps out).

    `window` must be an ORDERED window spec (partitionBy + orderBy).
    Returns the EWMA column expression.
    """
    decay = 1.0 - alpha
    num = None
    den = None
    for j in range(taps):
        x_j = F.lag(F.col(value), j).over(window) if j else F.col(value)
        w_j = F.lit(decay**j)
        t = F.when(x_j.isNotNull(), w_j * x_j).otherwise(F.lit(0.0))
        d = F.when(x_j.isNotNull(), w_j).otherwise(F.lit(0.0))
        num = t if num is None else num + t
        den = d if den is None else den + d
    return num / den


def ewma_oracle_terms(value: str, alpha: float = 0.2, taps: int = 24) -> tuple[str, str]:
    """(numerator, denominator) SQL fragments matching truncated_ewma,
    for composing the DuckDB oracle with an identical formula."""
    decay = 1.0 - alpha
    nums, dens = [], []
    for j in range(taps):
        x = value if j == 0 else f"lag({value}, {j}) OVER w"
        w = repr(decay**j)
        nums.append(f"CASE WHEN {x} IS NOT NULL THEN {w} * {x} ELSE 0.0 END")
        dens.append(f"CASE WHEN {x} IS NOT NULL THEN {w} ELSE 0.0 END")
    return " + ".join(nums), " + ".join(dens)


def ohlc(
    df: DataFrame,
    ts: str,
    value: str,
    tiebreak: str,
    keys: Sequence[str] = (),
    bucket: str = "hour",
) -> DataFrame:
    """OHLC (open/high/low/close) downsampling — the standard financial /
    metrics resample: per (keys, time bucket), the first, max, min, and
    last `value` in event-time order, plus count and volume.

    Open/close are first_value/last_value over ONE window ordering
    (ts, tiebreak — a total order, so the result is deterministic and
    engine-portable) with an unbounded frame; high/low/count/volume come
    from the follow-up hash aggregate. One shuffle on (keys, bucket) +
    one local sort — the same cost as any windowed rollup. At 100 TB the
    partition key includes the bucket, so state is bounded by bucket
    width, never by stream length; partial aggregation handles the
    max/min/sum side map-side.
    """
    b = F.date_trunc(bucket, F.col(ts)).alias("__bucket")
    part = [*keys, "__bucket"]
    w = (
        Window.partitionBy(*part)
        .orderBy(ts, tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        df.withColumn("__bucket", b)
        .withColumn("__open", F.first(value).over(w))
        .withColumn("__close", F.last(value).over(w))
        .groupBy(*part)
        .agg(
            F.max("__open").alias("open"),
            F.max(value).alias("high"),
            F.min(value).alias("low"),
            F.max("__close").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value), 2).alias("volume"),
        )
        .withColumnRenamed("__bucket", "bucket")
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Batch sessionization: assign a per-key session number that
    increments whenever the gap to the previous event exceeds
    `gap_seconds` — the classic lag-flag-cumsum formulation, and the
    batch twin of the streaming `session_window` aggregation.

    One shuffle on the key + one local sort serves BOTH windows (lag and
    the running sum share ordering, so Catalyst plans a single exchange
    and sort). Gap detection compares epoch seconds, not intervals, so
    the DuckDB oracle is expression-identical. Events sharing a
    timestamp land in the same session regardless of tie order (the lag
    difference is 0), so the tie-break only has to make row order total,
    not session assignment — determinism holds even on ties.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    epoch = F.col(ts).cast("long")
    new_sess = F.when(
        epoch - F.lag(epoch).over(w) > gap_seconds, F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(key).orderBy(ts, tiebreak).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(
        "session_num", (F.sum(new_sess).over(running) + 1).cast("int")
    )


def linear_interpolate(
    grid_df: DataFrame,
    key: str,
    bucket: str,
    value: str,
    round_scale: int = 6,
) -> DataFrame:
    """Linear interpolation of NULL values in a densified per-key series
    — the standard hypertable `interpolate()` companion to gap_fill's
    forward fill (locf).

    Input: one row per (key, bucket) with `value` NULL on gap buckets
    (the shape gap_fill's grid join produces). Each gap takes

        v = v_prev + (v_next - v_prev) * (t - t_prev) / (t_next - t_prev)

    where prev/next are the nearest non-NULL neighbors in bucket order.
    Leading/trailing gaps (no anchor on one side) fall back to the one
    available anchor (locf / next-observation-carried-backward).

    Spark shape: four IGNORE NULLS window expressions — last/first of the
    value and of the anchor timestamp — over ONE partition key with two
    frame directions. Both frames hash on `key`, so the plan is a single
    exchange plus one sort per direction; no joins, no driver state. At
    100 TB a key's cost is its own bucket range, embarrassingly parallel
    across keys — and the identical formula runs in any engine with
    IGNORE NULLS windows, which keeps the DuckDB oracle bit-exact.
    """
    t = F.col(bucket).cast("double")
    v = F.col(value)
    anchor_t = F.when(v.isNotNull(), t)
    back = (
        Window.partitionBy(key)
        .orderBy(bucket)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy(key)
        .orderBy(bucket)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    pv = F.last(v, ignorenulls=True).over(back)
    pt = F.last(anchor_t, ignorenulls=True).over(back)
    nv = F.first(v, ignorenulls=True).over(fwd)
    nt = F.first(anchor_t, ignorenulls=True).over(fwd)
    interp = (
        F.when(v.isNotNull(), v)
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(pv + (nv - pv) * (t - pt) / (nt - pt))
    )
    # floor-based half-up rounding, NOT round(): blends between k-dp
    # anchors land on exact decimal halves (frac = 1/2 gaps), where
    # engines' round() tie rules disagree. floor(x*s + 0.5) is a pure
    # IEEE expression — identical doubles in, identical doubles out on
    # every engine — so the oracle stays bit-exact.
    scale = float(10**round_scale)
    rounded = F.floor(interp * scale + F.lit(0.5)) / F.lit(scale)
    return grid_df.select(
        key,
        bucket,
        rounded.alias("value_interp"),
        v.isNull().alias("was_gap"),
    )
