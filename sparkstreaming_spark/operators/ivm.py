"""Incremental view maintenance (IVM) — refresh a materialized aggregate
from a delta batch WITHOUT rescanning the base data, by merging mergeable
partial states (count/sum/min/max; avg derived at read time).

The streaming sibling is streaming/matview.py (update-mode merge per
micro-batch); this is the BATCH form every warehouse runs nightly: the
base aggregate is corpus-sized-divided-by-cardinality (small), the delta
is one day's data — so refresh cost is O(|delta| + |affected groups|),
not O(|base data|).

Scale design:
- both inputs are already aggregates (one partial-agg shuffle each at
  their own build time); the merge itself is a unionByName + one
  re-aggregate over (groups in base) + (groups in delta) — group-keyed,
  partial-aggregated, no raw-data scan;
- only MERGEABLE states are stored (count, sum, min, max): avg/ratios are
  derived in the read view, never stored, because stored averages cannot
  be merged;
- deletes/retractions would need count-per-key tombstones (the standard
  IVM extension); this operator covers the append-only case, which is
  what training-data accounting pipelines need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the mergeable state columns this operator maintains
STATE_COLS = ("n", "sum_v", "min_v", "max_v")


def aggregate_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Build the mergeable per-group state from raw rows."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_states(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two state tables: groups present in either survive; shared
    groups combine associatively (count/sum add, min/max fold)."""
    both = base.unionByName(delta)
    return both.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def read_view(state: DataFrame, round_dp: int = 2) -> DataFrame:
    """Derive the user-facing view (including the non-mergeable avg) from
    the stored mergeable state."""
    return state.select(
        *[c for c in state.columns if c not in STATE_COLS],
        "n",
        F.round("sum_v", round_dp).alias("sum_v"),
        F.round(F.col("sum_v") / F.col("n"), 6).alias("avg_v"),
        "min_v",
        "max_v",
    )
