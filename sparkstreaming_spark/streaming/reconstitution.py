"""Text-file reconstitution: watch a directory of text segments, clean
each line, append to a single output file in segment order — the
reference's FileReconstitution DStream job (FileReconstitution.scala:15-72)
re-expressed on Structured Streaming.

Deltas:
- `spark.readStream.text` replaces DStream/textFileStream (no RDD layer),
- cleaning is the built-in `lower(regexp_replace(...))` instead of a JVM
  helper closure (F5 → codegen),
- segment order is recovered declaratively: `input_file_name()` +
  `regexp_extract` → numeric sort INSIDE each micro-batch, replacing the
  reference's pre-pass-sorted-then-arrival-order hybrid (T8) — and the
  single-file append happens once per batch on the driver, replacing the
  reference's concurrent per-partition appends to one file (a race,
  FileReconstitution.scala:58-67).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.text import normalize_text
from ..sinks.files import append_text_file
from .pipeline import _checkpoint_dir


def cleaned_lines(stream_df: DataFrame, segment_pattern: str = r"segment_(\d+)") -> DataFrame:
    """value → cleaned line + numeric segment extracted from the file name."""
    return stream_df.select(
        normalize_text(F.col("value")).alias("line"),
        F.regexp_extract(F.input_file_name(), segment_pattern, 1)
        .cast("bigint")
        .alias("segment_no"),
    )


def reconstitute_text(
    spark: SparkSession,
    watch_dir: str,
    out_path: str,
    checkpoint_base: str | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    stream = spark.readStream.text(watch_dir)
    lines = cleaned_lines(stream)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        append_text_file(batch_df.select("line", "segment_no"), out_path, "segment_no")

    writer = (
        lines.writeStream.outputMode("append")
        .option("checkpointLocation", _checkpoint_dir(checkpoint_base, "reconstitution"))
        .foreachBatch(sink)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
