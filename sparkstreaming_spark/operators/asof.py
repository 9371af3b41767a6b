"""As-of join — for each left row, the latest right row with
right_ts <= left_ts per key. Spark has no native ASOF; this is the
scalable composition:

    union(left ⊕ right) → window last(ignorenulls) → filter left

One shuffle on (key), one sort within partitions — O(n log n) per key —
versus the naive join-then-rank which materializes every (left row ×
earlier right row) pair before discarding all but one. At 100 TB the
naive form explodes by the average right-rows-per-key factor; the union
form's shuffle is exactly |left| + |right| rows.

Tie semantics: right rows sort BEFORE left rows at equal timestamps, so
an equal-timestamp right row matches (<= semantics, like DuckDB's
`ASOF JOIN ... ON l.ts >= r.ts`, which the oracle uses). Among right
rows sharing (key, ts) the LAST by the window's tiebreak wins — callers
needing cross-engine determinism should emit value columns that are
functionally dependent on (key, right_ts), as the suite query does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_us: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join; right_cols arrive prefixed `asof_` (null when no
    right row precedes — or, with direction='forward', follows — the
    left row).

    `direction='backward'` (default) matches the LATEST right row with
    right_ts <= left_ts; `'forward'` matches the EARLIEST right row with
    right_ts >= left_ts (pandas merge_asof directions). Forward is the
    same one-shuffle union-window plan with the sort reversed — no extra
    pass.

    `tolerance_us` bounds staleness: a match older (or, forward, farther
    in the future) than the tolerance is nulled out (pandas merge_asof's
    `tolerance` semantics). Implemented post-fill — the matched right
    timestamp rides along as one more filled column, so tolerance costs
    zero extra shuffles."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    l_tagged = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    r_tagged = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("__ts"),
            F.col(right_ts).alias("asof__matched_ts"),
            *[F.col(c).alias(f"asof_{c}") for c in right_cols],
        )
        .withColumn("__is_left", F.lit(0))
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    # right rows (__is_left=0) sort before left at equal __ts in BOTH
    # directions, so an equal-timestamp right row always matches
    w = (
        Window.partitionBy(key)
        .orderBy(ts_order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fill_cols = ["_matched_ts", *right_cols]
    filled = u.select(
        "*",
        *[
            F.last(f"asof_{c}", ignorenulls=True).over(w).alias(f"__filled_{c}")
            for c in fill_cols
        ],
    )
    if tolerance_us is None:
        in_tol = F.lit(True)
    else:
        gap = F.unix_micros(F.col(left_ts).cast("timestamp")) - F.unix_micros(
            F.col("__filled__matched_ts").cast("timestamp")
        )
        in_tol = (gap if direction == "backward" else -gap) <= tolerance_us
    return (
        filled.filter(F.col("__is_left") == 1)
        .select(
            *left.columns,
            *[
                F.when(in_tol, F.col(f"__filled_{c}")).alias(f"asof_{c}")
                for c in right_cols
            ],
        )
    )
