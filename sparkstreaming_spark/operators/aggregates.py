"""Aggregation operators (SURVEY §2.4).

The reference's core semantics: hash aggregations grouped by low-cardinality
keys (A1-A8), all expressible as `groupBy().agg()` — Spark plans partial
(map-side) + final aggregation automatically, which is exactly the 100 TB
shape (shuffle only carries partial aggregates, not rows).

Reference citations:
- A1/A2/A4/A5 single-key count: Consumer.scala:129,131,135,137
- A3 two-key count:             Consumer.scala:133
- A6 multi-agg with arithmetic: Consumer.scala:139-145
- A7 per-feature melt + mean:   Consumer.scala:368-401 (commented-out)
- A8 global count:              Producer.scala:23
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .relational import flag


def count_by(df: DataFrame, *keys: str | Column, name: str = "cnt") -> DataFrame:
    """A1/A3 — keyed count. `groupBy(k).count()` with a stable alias so
    results line up with the SQL oracle (driver hash-compares by name)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(name))


def grouped_agg(df: DataFrame, keys: Sequence[str | Column], aggs: Sequence[Column]) -> DataFrame:
    """General keyed aggregation; every agg expression must carry an alias."""
    return df.groupBy(*keys).agg(*aggs)


def sum_flag_split(
    df: DataFrame,
    key: str,
    flag_col: str,
    match_value,
    pos_name: str,
    neg_name: str,
) -> DataFrame:
    """A6 — the reference's loyalty KPI shape (Consumer.scala:139-145):
    per key, `sum(flag)` and `count(col) - sum(flag)`, both cast to int.

    The reference derives the flag with a Scala UDF; here it's a
    `when/otherwise` expression so the whole plan stays in codegen.
    """
    fl = flag(flag_col, match_value)
    return df.groupBy(key).agg(
        F.sum(fl).cast("int").alias(pos_name),
        (F.count(F.col(flag_col)) - F.sum(fl)).cast("int").alias(neg_name),
    )


def melt_feature_means(
    df: DataFrame,
    feature_cols: Sequence[str],
    measure: Column,
    feature_name_col: str = "feature_name",
    feature_value_col: str = "feature_value",
    mean_col: str = "mean_measure",
) -> DataFrame:
    """A7 — mean of a binary measure per (feature, feature-value).

    The reference loops over 14 feature columns, running one groupBy each
    and unioning into an accumulator (Consumer.scala:368-401). Idiomatic
    rewrite: melt with `stack()` into (feature_name, feature_value) rows,
    then ONE groupBy — a single shuffle instead of N, and one pass over the
    input instead of N scans.
    """
    n = len(feature_cols)
    pairs = ", ".join(f"'{c}', cast(`{c}` as string)" for c in feature_cols)
    melted = df.select(
        F.expr(f"stack({n}, {pairs}) as ({feature_name_col}, {feature_value_col})"),
        measure.alias("__measure"),
    )
    return melted.groupBy(feature_name_col, feature_value_col).agg(
        F.avg("__measure").alias(mean_col)
    )
