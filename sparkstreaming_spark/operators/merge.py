"""Batch MERGE (SCD-1 upsert) — the batch analogue of the streaming
idempotent upsert sink (sinks/upsert.py, which re-expresses the
reference's 8 JDBC upsert functions, Consumer.scala:152-431).

Shape: `target ANTI-JOIN updates` + `UNION ALL updates` — updates win by
key, new keys insert, and with a delete flag the tombstoned keys drop.
This is the classic "merge without a transaction log": one shuffle join
keyed on the merge key (broadcast when updates are small, which is the
common CDC case), no per-column coalesce like a full-outer-join merge,
and the result is a plain DataFrame the caller writes wherever.

At 100 TB: the anti join is the only wide operation and it shuffles on
the merge key; when the update batch fits the broadcast threshold the
target never shuffles at all. Deletes ride the same join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    delete_col: str | None = None,
    broadcast_updates: bool = True,
) -> DataFrame:
    """Rows from `updates` replace target rows with matching keys; unmatched
    update rows insert. If `delete_col` names a boolean column on
    `updates`, rows flagged true tombstone their key instead (removed from
    the result, not inserted).

    `updates` must carry the target's columns (plus optionally
    `delete_col`); duplicate keys within `updates` are the caller's bug —
    enforce upstream (e.g. dropDuplicates) because silently picking one
    would mask a pipeline defect.
    """
    keys = list(key_cols)
    upd = F.broadcast(updates) if broadcast_updates else updates
    kept = target.join(upd.select(*keys), keys, "left_anti")
    if delete_col is not None:
        upserts = updates.filter(~F.col(delete_col)).drop(delete_col)
    else:
        upserts = updates
    return kept.unionByName(upserts.select(*target.columns))
