"""Query suite registry.

Every implemented operator from SURVEY.md §2 (plus the north-star
extensions) registers here as a named `QuerySpec`:

- `fn(spark, sf_dir) -> DataFrame`  — the PySpark plan,
- `oracle` — equivalent ANSI SQL for the DuckDB differential oracle
  (None for genuinely non-SQL-expressible ops → driver runs a weaker
  rows-only check),
- `doc` — what it covers, with reference citations.

Conventions enforced suite-wide (driver contract, `__spark_entry__.py`):
- every computed/aggregate column is aliased IDENTICALLY in fn and oracle;
- double-typed aggregates are rounded to a fixed scale in BOTH engines so
  accumulation-order differences can't flip the value hash;
- deterministic ordering for top-k via unique tie-break columns.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


def all_queries() -> dict[str, QuerySpec]:
    from . import (
        analytics,
        behavior,
        cardinality,
        changefeed,
        core,
        enrich,
        events,
        extensions,
        relational_ops,
        llm,
        platform_ops,
        scale_ops,
        spatial,
        streaming_suite,
        streaming_twins,
        textmining,
        tpch,
        tpch2,
        vectors,
    )

    registry: dict[str, QuerySpec] = {}
    for mod in (
        analytics,
        behavior,
        cardinality,
        changefeed,
        core,
        enrich,
        events,
        extensions,
        relational_ops,
        llm,
        platform_ops,
        scale_ops,
        spatial,
        streaming_suite,
        streaming_twins,
        textmining,
        tpch,
        tpch2,
        vectors,
    ):
        for name, spec in mod.QUERIES.items():
            if name in registry:
                raise ValueError(f"duplicate query name: {name}")
            registry[name] = spec
    return registry
