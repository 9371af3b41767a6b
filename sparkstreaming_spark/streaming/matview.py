"""Streaming materialized-view maintenance into a file-based table.

The reference maintains its KPI "views" by upserting update-mode
aggregate rows into MySQL (Consumer.scala:60-100 + kpi*); sinks/upsert.py
generalizes that to any DB-API store. This module is the same contract
aimed at a FILE-based warehouse: each micro-batch's changed aggregate
rows are merged (SCD-1, operators/merge.py) into a parquet snapshot,
published with an atomic directory swap — a poor-man's Delta MERGE that
keeps readers consistent (they see the old or the new snapshot, never a
half-written one).

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


class ParquetViewSink:
    """foreachBatch callback maintaining a parquet snapshot of a keyed
    aggregate. Pass to `writeStream.outputMode("update").foreachBatch`."""

    def __init__(self, out_dir: str, key_cols: Sequence[str]):
        self.out_dir = out_dir
        self.key_cols = list(key_cols)
        self.data_dir = os.path.join(out_dir, "data")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if os.path.exists(self.data_dir):
            current = spark.read.parquet(self.data_dir)
            merged = merge_upsert(current, batch_df, self.key_cols)
        else:
            merged = batch_df
        staged = os.path.join(self.out_dir, f"_stage_{batch_id}")
        # materialize BEFORE touching the live dir (merged reads from it)
        merged.write.mode("overwrite").parquet(staged)
        old = os.path.join(self.out_dir, f"_old_{batch_id}")
        if os.path.exists(self.data_dir):
            os.rename(self.data_dir, old)
        os.rename(staged, self.data_dir)
        if os.path.exists(old):
            shutil.rmtree(old)

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.data_dir)
