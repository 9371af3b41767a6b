"""Declarative data-quality constraint checking (Deequ-style).

A 100 TB ingest pipeline gates every batch on assertions — completeness,
uniqueness, value bounds, set membership — before it reaches training.
The whole report is ONE aggregation pass over the table: every metric is
an aggregate expression computed in the same `agg()`, so the table is
scanned once regardless of how many constraints are attached (Deequ's
core trick, re-expressed as a plain Catalyst aggregate).  The one-row
result is then exploded into a (constraint, metric, passed) row per
check — driver never sees the data, only the report.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint: an aggregate metric and its allowed [lo, hi] range."""

    name: str
    metric: Column  # aggregate expression evaluated over the table
    lo: float
    hi: float


def completeness(col: str) -> Column:
    """Fraction of rows with a non-null value (Deequ Completeness)."""
    return F.avg(F.col(col).isNotNull().cast("double"))


def uniqueness(col: str) -> Column:
    """distinct/count ratio — 1.0 iff the column is a key (Deequ Uniqueness).

    Exact count-distinct: Spark plans this as the standard two-phase
    expand aggregate. For columns where approximate suffices at 100 TB,
    pass `F.approx_count_distinct` yourself — the report shape is the
    same."""
    return F.countDistinct(F.col(col)) / F.count(F.lit(1))


def membership(col: str, allowed: list[str]) -> Column:
    """Fraction of rows whose value is in the allowed set."""
    return F.avg(F.col(col).isin(allowed).cast("double"))


def constraint_report(df: DataFrame, checks: list[Check], round_scale: int = 6) -> DataFrame:
    """Evaluate all checks in one scan -> (check_name, metric, passed).

    `metric` is rounded to `round_scale` and the pass predicate is
    applied to the ROUNDED value, so the report is hash-comparable
    against a SQL oracle computing the same aggregates.
    """
    row = df.agg(*[c.metric.cast("double").alias(f"_m{i}") for i, c in enumerate(checks)])
    structs = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.round(F.col(f"_m{i}"), round_scale).alias("metric"),
                F.round(F.col(f"_m{i}"), round_scale)
                .between(c.lo, c.hi)
                .alias("passed"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return row.select(F.explode(structs).alias("c")).select("c.*")


def route_quarantine(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    reason_col: str = "quarantine_reason",
) -> DataFrame:
    """Row-level admission routing: tag every row with the FIRST failed
    rule's name (rules are (name, pass_predicate) pairs, priority
    order), NULL when all pass. Callers split with
    `filter(col(reason_col).isNull())` / `.isNotNull()` — both branches
    come from one codegen'd projection over one scan, no shuffle, so the
    good/bad split adds zero cost to a 100 TB ingest (the row-level
    complement of constraint_report's table-level gate)."""
    expr: Column = F.lit(None).cast("string")
    for name, pred in reversed(rules):
        expr = F.when(~F.coalesce(pred, F.lit(False)), F.lit(name)).otherwise(expr)
    return df.withColumn(reason_col, expr)
