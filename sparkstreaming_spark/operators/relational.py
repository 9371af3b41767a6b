"""Row-level relational operators (SURVEY §2.3).

Each maps a reference usage to the idiomatic PySpark built-in. All are thin,
declarative wrappers — Catalyst sees plain expressions, so predicate
pushdown / column pruning / constant folding apply (SURVEY §4).

Reference citations:
- P1 drop:        Producer.scala:43   (`drop("_c0")`)
- P2 withColumn:  Consumer.scala:140  (`withColumn("LoyalNumeric", udf(col))`)
- P3 between:     Producer.scala:40   (`filter(col("_c0").between(lo, hi))`)
- P4 when:        Consumer.scala:369  (`when(col===..., 1).otherwise(0)`)
- P5 lit:         Consumer.scala:395
- P6 cast:        Consumer.scala:143-144,394
- P7 alias:       Consumer.scala:143-144,393-395

The reference's string→int UDFs (Consumer.scala:116-124) are deliberately
re-expressed as `when/otherwise` (see `flag`) so the expression stays inside
whole-stage codegen instead of a Python round-trip (SURVEY §2.8 policy).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Projection; reaches the parquet reader as ReadSchema pruning."""
    return df.select(*cols)


def drop_columns(df: DataFrame, *cols: str) -> DataFrame:
    """P1 — drop columns (reference drops its positional index `_c0`)."""
    return df.drop(*cols)


def derive(df: DataFrame, name: str, expr: Column) -> DataFrame:
    """P2 — extend projection with a derived column."""
    return df.withColumn(name, expr)


def between_filter(df: DataFrame, col: str | Column, lo, hi) -> DataFrame:
    """P3 — inclusive range predicate. Unlike Producer.scala:40 (string
    column compared to ints via implicit cast) callers pass typed bounds."""
    c = F.col(col) if isinstance(col, str) else col
    return df.filter(c.between(lo, hi))


def flag(col: str | Column, match_value, true_val=1, false_val=0) -> Column:
    """P4/D1/D2 — binary flag as `when/otherwise`, replacing the reference's
    `satisfactionToNumeric` / `loyalToNumeric` Python-opaque UDFs
    (Consumer.scala:116-124) with a codegen-friendly expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == match_value, F.lit(true_val)).otherwise(F.lit(false_val))


def tagged(df: DataFrame, name: str, value) -> DataFrame:
    """P5 — literal tag column (reference: `lit(feature)` Consumer.scala:395)."""
    return df.withColumn(name, F.lit(value))


def top_k(df: DataFrame, k: int, *order_cols: str | Column) -> DataFrame:
    """orderBy + limit — Spark plans this as TakeOrderedAndProject (a
    per-partition top-k + single merge, no global sort), which is the right
    physical shape at 100 TB."""
    return df.orderBy(*order_cols).limit(k)


def split_segments(df: DataFrame, order_col: str, rows_per_segment: int) -> DataFrame:
    """Re-specification of the reference producer's segment splitter.

    Producer.scala:29-47 loops on the driver, re-scanning the full CSV once
    per segment with `filter(between)` and an off-by-one at the 0/1 boundary
    (SURVEY §3 entry point 2). Here: ONE pass, `row_number()` over the order
    column, integer-divided into a `segment` column — writers then use
    `partitionBy("segment")` for a single job emitting every segment.

    Note the window is unpartitioned (global ordering is the semantics the
    reference wants); at 100 TB a global row_number is a single-reducer
    bottleneck, so scale callers should pre-aggregate per-partition counts
    (zipWithIndex-style) or accept a range-partitioned sort — documented
    trade-off rather than hidden.
    """
    from pyspark.sql import Window

    w = Window.orderBy(order_col)
    return df.withColumn(
        "segment",
        ((F.row_number().over(w) - F.lit(1)) / F.lit(rows_per_segment)).cast("bigint"),
    )


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """U1/U2 — union by name, replacing the reference's emptyDataFrame-seeded
    accumulator loop (Consumer.scala:389-397) with a reduce."""
    from functools import reduce

    if not dfs:
        raise ValueError("union_all of zero DataFrames")
    return reduce(lambda a, b: a.unionByName(b), dfs)
