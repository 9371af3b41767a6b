"""Streaming materialized-view maintenance into a file-based table.

The reference maintains its KPI "views" by upserting update-mode
aggregate rows into MySQL (Consumer.scala:60-100 + kpi*); sinks/upsert.py
generalizes that to any DB-API store. This module is the same contract
aimed at a FILE-based warehouse: each micro-batch's changed aggregate
rows are merged (SCD-1, operators/merge.py) into a parquet snapshot.

Publication is genuinely atomic: snapshots are immutable versioned
directories (`snap_<batch_id>`) and readers resolve the live one through
a pointer file (`CURRENT`) that is swapped with a single `os.replace` —
POSIX-atomic, so a concurrent reader sees either the old pointer or the
new one, never a missing view (a rename-the-data-dir swap has a window
where NO directory exists, and a crash inside it loses the view until
manual recovery). The previous snapshot is retained one generation so a
reader that resolved the old pointer mid-swap can finish its scan;
older generations are garbage-collected.

Delivery semantics: update-mode rows are keyed running aggregates, so
the merge is idempotent per key — replay after failure converges
(at-least-once + idempotent merge = effectively-once, the same argument
as the reference's ON DUPLICATE KEY UPDATE pattern, SURVEY §2.9 T7).

Scale notes: the snapshot rewrite is O(view), not O(stream) — correct
for KPI views (small key domains) which is exactly the reference's use.
For views where the key domain itself is huge, partition the snapshot by
key range and rewrite only partitions containing changed keys (or use a
transactional table format); the merge operator is unchanged.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame

from ..operators.merge import merge_upsert

_POINTER = "CURRENT"


class ParquetViewSink:
    """foreachBatch callback maintaining a parquet snapshot of a keyed
    aggregate. Pass to `writeStream.outputMode("update").foreachBatch`."""

    def __init__(self, out_dir: str, key_cols: Sequence[str]):
        self.out_dir = out_dir
        self.key_cols = list(key_cols)

    def _pointer_path(self) -> str:
        return os.path.join(self.out_dir, _POINTER)

    def current_snapshot(self) -> str | None:
        """Resolve the live snapshot dir via the pointer file, or None."""
        try:
            with open(self._pointer_path()) as fh:
                name = fh.read().strip()
        except FileNotFoundError:
            return None
        return os.path.join(self.out_dir, name) if name else None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        live = self.current_snapshot()
        if live is not None:
            current = spark.read.parquet(live)
            merged = merge_upsert(current, batch_df, self.key_cols)
        else:
            merged = batch_df
        snap_name = f"snap_{batch_id}"
        snap_dir = os.path.join(self.out_dir, snap_name)
        # immutable new snapshot; the live dir is never touched
        merged.write.mode("overwrite").parquet(snap_dir)
        # atomic pointer swap: readers see old or new, never neither
        tmp = self._pointer_path() + ".tmp"
        os.makedirs(self.out_dir, exist_ok=True)
        with open(tmp, "w") as fh:
            fh.write(snap_name)
        os.replace(tmp, self._pointer_path())
        # GC all but the new and the immediately previous generation
        keep = {snap_name, os.path.basename(live) if live else ""}
        for entry in os.listdir(self.out_dir):
            if entry.startswith("snap_") and entry not in keep:
                shutil.rmtree(os.path.join(self.out_dir, entry), ignore_errors=True)

    def read(self, spark) -> DataFrame:
        live = self.current_snapshot()
        if live is None:
            raise FileNotFoundError(f"no published snapshot under {self.out_dir}")
        return spark.read.parquet(live)
