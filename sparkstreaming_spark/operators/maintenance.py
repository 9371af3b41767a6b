"""Physical-layout maintenance: bucketed table writes (co-located,
shuffle-free joins) and small-file compaction — the two table-ops levers
that matter most at 100 TB and exist in no query plan.

Bucketing: a fact table written with `bucketBy(key)` is hash-partitioned
ON DISK; any join/aggregate on that key then reads co-located buckets
and skips the Exchange entirely — the single biggest shuffle saving
available to a recurring 100 TB join (pay the shuffle once at write
time, never again at read time). Both sides must agree on key and
bucket count; `sortBy` additionally pre-sorts within buckets so the
sort-merge join skips its sort too.

Compaction: streaming sinks and incremental loads accrete small files;
at 100 TB scale a million 1 MB files turns every scan into a metadata
storm (task-per-file scheduling, open/close overhead, dead columnar
compression). `compact_parquet` rewrites a directory to ~target-sized
files with one distributed pass — `coalesce` (no shuffle) by default.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and optionally bucket-sorted) managed
    parquet table. Joins between tables bucketed on the same column with
    the same `n_buckets` plan WITHOUT an Exchange on either side (see
    tests/test_maintenance.py for the plan assertion)."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_file_mb: int = 512,
    shuffle: bool = False,
) -> int:
    """Rewrite a parquet directory into ~`target_file_mb`-sized files;
    returns the output file count.

    `coalesce` (default) merges partitions without a shuffle — each
    output task reads several input files sequentially, the right
    default for pure compaction. `shuffle=True` switches to
    `repartition` for when the input is skewed (a few huge files among
    thousands of tiny ones) and balanced outputs are worth one shuffle.
    Writes to a NEW directory: swapping it over the old one is the
    caller's (atomic-publish) concern, matview.py-style.

    Returns the ACTUAL written file count — it can be lower than the
    size-derived target because coalesce never increases the partition
    count of the input scan."""
    n_target = max(1, -(-_dir_bytes(in_dir) // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(in_dir)
    df = df.repartition(n_target) if shuffle else df.coalesce(n_target)
    df.write.mode("overwrite").parquet(out_dir)
    return sum(
        1
        for f in os.listdir(out_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def overwrite_partitions(
    df: DataFrame, out_dir: str, partition_cols: list[str]
) -> None:
    """Dynamic partition overwrite: replace ONLY the hive partitions
    present in `df`, leaving every other partition untouched — the
    idempotent daily-reload primitive (re-running a day's load rewrites
    that day, never truncates the table). Static overwrite mode (the
    default) would drop ALL partitions first; the dynamic conf scopes
    the delete to partitions the job actually emits. The conf is set
    per-call and restored, so other writers in the session keep the
    default semantics."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(out_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def surgical_delete(
    spark: SparkSession,
    table_dir: str,
    key_col: str,
    keys: list,
) -> dict:
    """GDPR-style targeted delete: rewrite ONLY the parquet files that
    contain the target keys; every other file is untouched (bytes and
    mtime identical).

    The 100 TB pattern: a naive DELETE rewrites the whole table; the
    surgical form first locates affected files via the hidden
    `_metadata.file_path` column (a filter+distinct whose result is
    bounded by the number of AFFECTED files, not rows), then rewrites
    each affected file in place with the targets filtered out. With
    key-clustered layout (write_zordered / bucketed), affected-file
    count ≈ keys × files-per-key — a vanishing fraction of the table.
    Each file swap is a single os.replace (atomic on POSIX); readers see
    the old or new file, never a partial one.

    Returns {"files_total", "files_rewritten", "rows_deleted"}.
    """
    import glob as _glob
    import shutil

    from pyspark.sql import functions as F

    df = spark.read.parquet(table_dir)
    all_files = [
        r.f
        for r in df.select(F.col("_metadata.file_path").alias("f"))
        .distinct()
        .collect()
    ]
    hit = (
        df.filter(F.col(key_col).isin(keys))
        .select(F.col("_metadata.file_path").alias("f"))
        .groupBy("f")
        .count()
        .collect()
    )
    rows_deleted = 0
    for r in hit:
        local = r.f.removeprefix("file:")
        rows_deleted += r["count"]
        kept = spark.read.parquet(local).filter(~F.col(key_col).isin(keys))
        tmp = local + ".rewrite"
        kept.coalesce(1).write.mode("overwrite").parquet(tmp)
        parts = _glob.glob(os.path.join(tmp, "part-*.parquet"))
        if not parts or kept.count() == 0:
            # every row in this file matched — drop the file rather than
            # leaving a 0-row parquet shard behind
            os.remove(local)
            stale = os.path.join(
                os.path.dirname(local), f".{os.path.basename(local)}.crc"
            )
            if os.path.exists(stale):
                os.remove(stale)
            shutil.rmtree(tmp, ignore_errors=True)
            continue
        part = parts[0]
        os.replace(part, local)
        # Hadoop's local FS writes .crc sidecars; swap the new one in (or
        # drop the stale one) or checksummed reads fail on length mismatch
        stale_crc = os.path.join(
            os.path.dirname(local), f".{os.path.basename(local)}.crc"
        )
        new_crc = os.path.join(tmp, f".{os.path.basename(part)}.crc")
        if os.path.exists(new_crc):
            os.replace(new_crc, stale_crc)
        elif os.path.exists(stale_crc):
            os.remove(stale_crc)
        shutil.rmtree(tmp, ignore_errors=True)
    # Spark caches file listings (size + mtime) per path; the in-place
    # swaps invalidate that cache or subsequent scans read stale lengths
    spark.catalog.refreshByPath(table_dir)
    return {
        "files_total": len(all_files),
        "files_rewritten": len(hit),
        "rows_deleted": rows_deleted,
    }
