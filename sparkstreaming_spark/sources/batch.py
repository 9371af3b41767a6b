"""Batch sources.

Covers SURVEY §2.1 S2 (batch CSV scan with header, Producer.scala:12) and
generalizes to the formats the new engine actually serves (parquet first —
columnar scans with predicate pushdown and column pruning are the 100 TB
path; CSV/JSON for ingestion compatibility).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan; Catalyst pushes filters/projections into the reader."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan (reference: Producer.scala:12 `spark.read.option("header",true).csv`).

    Unlike the reference, callers may pin an explicit schema — inference
    costs one extra pass and yields all-string columns in the reference's
    no-schema mode (SURVEY §1.3).
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated test table (TESTDATA.md) by name.

    `events.ts` has shipped as both TIMESTAMP(MICROS) (read natively) and
    TIMESTAMP(NANOS), which Spark's reader rejects; for the latter we read
    it as long (legacy conf, settable at runtime) and rebuild a timestamp
    at microsecond precision — truncation ≤ 999 ns, below every bucket/
    window granularity the suite uses.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    ts_cols = {"events": ["ts"], "orders": ["o_orderdate"], "lineitem": ["l_shipdate"]}
    if name in ts_cols:
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for c in ts_cols[name]:
            if isinstance(df.schema[c].dataType, LongType):
                df = df.withColumn(
                    c, F.timestamp_micros((F.col(c) / 1000).cast("long"))
                )
            elif c == "ts":
                # TIMESTAMP(MICROS) infers as timestamp_ntz; normalize ts
                # to session-TZ timestamp (UTC ⇒ same instant) so time
                # functions that require TIMESTAMP (unix_micros etc.) keep
                # working. o_orderdate/l_shipdate stay as read — the suite
                # casts them where needed, and changing their type when
                # the data is healthy would churn every consumer.
                df = df.withColumn(c, F.col(c).cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Load the star-schema tables and register each as a temp view so both
    the DataFrame API and spark.sql() entry points work over them."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same pushdown/pruning properties as parquet."""
    return spark.read.orc(path)
