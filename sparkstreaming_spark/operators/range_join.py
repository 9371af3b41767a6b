"""Bucketed range join — the scalable plan for time-interval joins.

Naive `a ⋈ b ON a.key = b.key AND b.ts ∈ [a.ts, a.ts + Δ]` hash-joins on
`key` alone, materializing every same-key pair before the interval
filter — O(events-per-key²) rows per key. With hot keys that explodes
(the profile that motivated this: 667 events/key → 66 M pre-filter pairs
for a 25-row result).

The bucketed form quantizes time into Δ-wide buckets and joins on
(key, bucket): a right row at bucket β can only match left rows in
buckets {β, β−1}, so the right side is duplicated twice (explode) and
the join key gains the bucket — pre-filter pairs shrink to the rows that
are actually within ~2Δ of each other. Equivalent semantics; the exact
interval predicate still applies post-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delta_us: int,
    extra_condition: Column | None = None,
) -> DataFrame:
    """Inner join of left/right rows with the same `key` and
    right_ts ∈ [left_ts, left_ts + max_delta_us]. Columns come out
    prefixed `a.`/`b.` via the returned aliases — callers select from
    aliases "a" (left) and "b" (right)."""
    bucket_l = F.floor(F.unix_micros(F.col(left_ts)) / F.lit(max_delta_us))
    bucket_r = F.floor(F.unix_micros(F.col(right_ts)) / F.lit(max_delta_us))
    l_b = left.withColumn("__bucket", bucket_l)
    r_b = right.withColumn(
        "__bucket", F.explode(F.array(bucket_r, bucket_r - F.lit(1)))
    )
    a, b = l_b.alias("a"), r_b.alias("b")
    cond = (
        (F.col(f"a.{key}") == F.col(f"b.{key}"))
        & (F.col("a.__bucket") == F.col("b.__bucket"))
        & (F.col(f"b.{right_ts}") >= F.col(f"a.{left_ts}"))
        & (
            F.unix_micros(F.col(f"b.{right_ts}"))
            - F.unix_micros(F.col(f"a.{left_ts}"))
            <= max_delta_us
        )
    )
    if extra_condition is not None:
        cond = cond & extra_condition
    return a.join(b, cond)
