"""File-backed partitioned-topic source — the Kafka-class ingestion
surface expressed in Spark-native primitives (no broker client library in
this container, and the reference itself only ever reads files:
Consumer.scala:49-52 tails a CSV directory).

A *topic* is a directory laid out like a commit log:

    topic_dir/part_id=K/<parquet segments>     (K = hash(key) % n)

with every record carrying a dense per-partition `offset` (0..n-1,
assigned at publish time from a deterministic total order). That gives the
three broker guarantees the streaming layer needs, each mapped onto a
Spark mechanism instead of a protocol:

- **keyed partitioning** (same key → same partition, so per-key order is
  per-partition order): the publisher's `pmod(key, n)` column + hive-style
  `partitionBy` layout;
- **ordered replayable offsets**: the `offset` column — consumers window
  or sort by it, never by file order (Spark file listing is unordered by
  design, so order lives in DATA, the only shape that survives
  distributed listing);
- **exactly-once incremental consumption**: the Structured Streaming file
  source's checkpointed file tracking (SURVEY §2.9 T7) — new segments
  appended to a partition dir are picked up per micro-batch,
  `maxFilesPerTrigger` bounds batch size.

At 100 TB: the topic dir is just a partitioned parquet dataset, so
consumers get partition pruning (`part_id = 3` reads one directory),
splittable columnar scans, and per-partition parallelism equal to the
topic's partition count — the same scaling story as a real broker, with
object-store economics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def publish_topic(
    df: DataFrame,
    topic_dir: str,
    key_col: str,
    n_partitions: int = 4,
    order_cols: list[str] | None = None,
    append: bool = False,
) -> None:
    """Publish a batch frame as a topic: assign `part_id = pmod(key, n)`
    and a dense per-partition `offset` from the deterministic
    (order_cols) total order, then write hive-partitioned parquet.

    `append=True` continues each partition's log: the new batch's offsets
    start at the current high-water mark (one tiny max-offset aggregate
    over the existing topic — n_partitions rows — joined broadcast onto
    the batch), and segments are ADDED, which the streaming file source
    picks up incrementally on its checkpoint.

    The offset window runs per part_id — n_partitions concurrent sorts
    of one partition's records each, never a global sort."""
    import os

    from pyspark.sql import Window

    spark = df.sparkSession
    order_cols = order_cols or [key_col]
    part = F.pmod(F.col(key_col).cast("bigint"), F.lit(n_partitions)).cast(
        "int"
    )
    w = Window.partitionBy("part_id").orderBy(*order_cols)
    out = (
        df.withColumn("part_id", part)
        .withColumn("offset", F.row_number().over(w).cast("bigint") - 1)
    )
    mode = "overwrite"
    if append and os.path.exists(os.path.join(topic_dir, "_SUCCESS")):
        base = (
            read_topic_batch(spark, topic_dir)
            .groupBy("part_id")
            .agg((F.max("offset") + 1).alias("__base"))
        )
        out = (
            out.join(F.broadcast(base), "part_id", "left")
            .withColumn(
                "offset",
                F.col("offset") + F.coalesce(F.col("__base"), F.lit(0)),
            )
            .drop("__base")
        )
        mode = "append"
    (
        out.repartition("part_id")
        .write.mode(mode)
        .partitionBy("part_id")
        .parquet(topic_dir)
    )


def read_topic_stream(
    spark: SparkSession,
    topic_dir: str,
    schema: StructType | str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded table over a topic directory. `schema` describes the
    record columns + `offset`; `part_id` comes back as the hive
    partition column. Checkpointed file tracking makes consumption
    exactly-once and resumable (the broker consumer-group contract)."""
    reader = spark.readStream.schema(schema).option("basePath", topic_dir)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(topic_dir + "/part_id=*")


def read_topic_batch(spark: SparkSession, topic_dir: str) -> DataFrame:
    """Batch view of the same topic (backfill / oracle twin); partition
    pruning applies to `part_id` filters."""
    return spark.read.parquet(topic_dir)
