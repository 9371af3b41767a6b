"""File sinks.

- `write_csv_segments`: the producer's output side (reference K3,
  Producer.scala:47) — but ONE partitioned write instead of one job per
  segment (anti-pattern §4 'per-segment rescan').
- `append_text_file`: the reconstitution output (reference K4,
  FileReconstitution.scala:55-69). The reference appends from every
  partition concurrently — race-prone by design; here the batch is
  ordered and written once from the driver per micro-batch, which is
  correct because reconstitution output is a single logical file (a
  driver-bounded op by definition; documented, not hidden).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_csv_segments(df_with_segment: DataFrame, out_dir: str, header: bool = True) -> None:
    """Write one CSV directory per `segment` value in a single Spark job
    via partitionBy — every segment is emitted in one pass over the input."""
    (
        df_with_segment.write.mode("overwrite")
        .option("header", str(header).lower())
        .partitionBy("segment")
        .csv(out_dir)
    )


APPEND_TEXT_MAX_ROWS = 1_000_000


def append_text_file(
    batch_df: DataFrame,
    out_path: str,
    order_col: str | None = None,
    max_rows: int = APPEND_TEXT_MAX_ROWS,
) -> None:
    """Append a micro-batch of text lines to one local file, optionally
    ordered (reconstitution wants segment order, FileReconstitution.scala:34-36).

    CONTRACT — single-file, DRIVER-BOUND by design: the output is one
    logical text file with a global line order, which no distributed
    write can produce, so every batch is collected to the driver. That
    is the reference's K4 semantics, not an accident — and it means this
    sink is for reconstitution-sized batches only. Batches above
    `max_rows` fail loudly instead of silently OOMing the driver; for
    large ordered output use a partitioned sink (write_csv_segments /
    write_jsonl) and concatenate downstream."""
    if order_col is not None:
        batch_df = batch_df.orderBy(order_col)
    n = batch_df.count()
    if n > max_rows:
        raise ValueError(
            f"append_text_file is driver-bound by contract: batch has {n} rows "
            f"(> max_rows={max_rows}); use a partitioned sink for data this size"
        )
    lines = [r[0] for r in batch_df.select(batch_df.columns[0]).collect()]
    if not lines:
        return
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "a", encoding="utf-8") as fh:
        for line in lines:
            fh.write(line + "\n")


def write_jsonl(df: DataFrame, out_dir: str, compression: str | None = None) -> None:
    """Write a DataFrame as JSON-lines (the canonical LLM-corpus exchange
    format) — one object per line, one file per partition, so readers and
    writers both parallelize. Optional codec (e.g. 'gzip', 'zstd')."""
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(out_dir)


def write_orc(df: DataFrame, out_dir: str, compression: str = "zstd") -> None:
    """Columnar ORC write — the exchange format when the downstream is
    Hive/Trino-flavored; parquet stays the engine's native layout."""
    df.write.mode("overwrite").option("compression", compression).orc(out_dir)
