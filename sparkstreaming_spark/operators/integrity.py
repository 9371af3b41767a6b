"""Table-integrity operators: bucketed content fingerprints and snapshot
diffs — the anti-entropy primitives behind "are these two copies of a
100 TB table identical, and if not, where?".

Fingerprinting at scale: hashing every row into ONE scalar detects a
difference but localizes nothing; keeping every row hash is the table
itself. The standard middle ground (Merkle-style, as in replicated-store
anti-entropy and data-reconciliation tools) is K buckets of XOR-combined
row hashes: any single-row difference flips exactly one bucket, the
comparison payload is K rows, and both sides compute it in one
partial-aggregate pass — the shuffle carries K×partitions tiny partials,
never rows. XOR (not sum) keeps the combine associative/commutative
WITHOUT overflow, so ANSI mode can't throw and the DuckDB twin is
bit-exact.

Row hashes use the engine-wide md5_64 convention (functions/text.py:81);
doubles are rendered as scaled bigints (cents) because float→string
formatting is NOT portable across engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_64

FP_BUCKETS = 64


NULL_SENTINEL = "<NULL>"


def row_fingerprint(cols: Sequence[Column]) -> Column:
    """60-bit md5 hash of the '|'-joined rendered columns.

    Callers must pre-render every column to a portable string
    (ints/strings/dates are portable; doubles must be scaled to
    integers first). NULLs are mapped to an explicit sentinel BEFORE
    joining — concat_ws silently skips NULL arguments, which would
    make (x, NULL, y) and (x, y, NULL) hash identically (an
    anti-entropy false negative). Remaining precondition: rendered
    strings must not contain the '|' delimiter or the sentinel (true
    for numeric/date/code renderings; free-text columns should be
    hashed individually first)."""
    guarded = [F.coalesce(c, F.lit(NULL_SENTINEL)) for c in cols]
    return md5_64(F.concat_ws("|", *guarded))


def table_fingerprint(
    df: DataFrame, key: Column, rendered: Sequence[Column], buckets: int = FP_BUCKETS
) -> DataFrame:
    """Bucketed table fingerprint: (bucket, n_rows, xor-of-row-hashes).

    Two tables are content-identical iff all `buckets` rows match; a
    difference narrows to its bucket(s), and re-running with a finer
    bucket count (or a bucket-filtered scan) bisects further.
    """
    h = row_fingerprint(rendered)
    return (
        df.select(
            F.pmod(md5_64(key.cast("string")), F.lit(buckets))
            .cast("int")
            .alias("bucket"),
            h.alias("__h"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor("__h").alias("xor_hash"),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    hash_col: str = "__h",
) -> DataFrame:
    """Classify rows across two snapshots of a keyed table as
    added / removed / changed, dropping the (overwhelmingly common)
    unchanged rows. Inputs must carry a `hash_col` row-content hash
    (row_fingerprint) so 'changed' is one bigint compare, not a
    column-by-column comparison that re-reads every attribute.

    Plan: full outer join on the key — co-partitioned single shuffle per
    side; at 100 TB both sides would be bucketed on the key so the join
    is shuffle-free. The unchanged filter runs join-side, so the output
    is proportional to the CHANGE VOLUME, not the table."""
    o = old.select(F.col(key).alias("k"), F.col(hash_col).alias("oh"))
    n = new.select(F.col(key).alias("k"), F.col(hash_col).alias("nh"))
    j = o.join(n, "k", "full_outer")
    return j.select(
        F.col("k").alias(key),
        F.when(F.col("oh").isNull(), F.lit("added"))
        .when(F.col("nh").isNull(), F.lit("removed"))
        .when(F.col("oh") != F.col("nh"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
    ).filter(F.col("change") != "unchanged")
