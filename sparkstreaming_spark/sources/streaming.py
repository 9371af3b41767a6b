"""Streaming sources (Structured Streaming file sources).

Covers SURVEY §2.1:
- S1 streaming CSV directory scan (Consumer.scala:49-52): directory treated
  as an append-only unbounded table, explicit schema required.
- S3 DStream text-file scan (FileReconstitution.scala:53), modernized to
  `spark.readStream.text` — the engine exposes no RDD/DStream layer.

At scale the file source lists new files per micro-batch; `maxFilesPerTrigger`
bounds batch size, and checkpointing (see sinks) gives exactly-once file
tracking — both absent in the reference (SURVEY §2.9 T7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def stream_csv_dir(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded CSV table over a directory (reference: Consumer.scala:49-52).

    Structured Streaming file sources require an explicit schema; the
    reference hand-builds a 24-column StructType (Consumer.scala:22-46) and
    so do our callers.
    """
    reader = spark.readStream.option("header", str(header).lower()).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.csv(path)


def stream_text_dir(spark: SparkSession, path: str) -> DataFrame:
    """Unbounded text table: one `value: string` row per line
    (modernizes FileReconstitution.scala:53 `ssc.textFileStream`)."""
    return spark.readStream.text(path)


def stream_parquet(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded parquet table over a directory/glob — the scale-path
    streaming source (columnar, splittable; CSV is the compatibility path)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)
